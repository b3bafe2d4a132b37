"""TPU-native flax text encoder vs a torch mean-pooling oracle.

Builds a tiny random BERT checkpoint on disk (no network), encodes with
``encoder_flax.flax_encode`` (the jitted Flax forward + masked mean pool +
L2 normalize), and checks it against the same recipe computed with the
torch model — i.e. exactly what ``SentenceTransformer('all-MiniLM-L6-v2')``
does (reference ``utils.py:109-112``).
"""

import os

import numpy as np
import pytest

transformers = pytest.importorskip('transformers')
torch = pytest.importorskip('torch')

SENTENCES = [
    'the cat sat on the mat',
    'a dog ran fast',
    'graph user item graph user item graph user item',
    'cat',
    'the the the the the the the the',
    'user item',
    '',
]


@pytest.fixture(scope='module')
def tiny_bert(tmp_path_factory):
    """Local-disk tiny BERT: torch weights + wordpiece tokenizer."""
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp('tiny_bert')
    vocab = (['[PAD]', '[UNK]', '[CLS]', '[SEP]', '[MASK]']
             + ['the', 'cat', 'sat', 'on', 'mat', 'a', 'dog', 'ran',
                'fast', 'graph', 'user', 'item'])
    vocab_file = d / 'vocab.txt'
    vocab_file.write_text('\n'.join(vocab) + '\n')
    tok = BertTokenizer(vocab_file=str(vocab_file))
    tok.save_pretrained(str(d))

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=64, max_position_embeddings=32)
    BertModel(cfg).save_pretrained(str(d))
    return str(d)


def _torch_oracle(sentences, model_dir):
    """Transformer -> masked token mean -> L2 normalize, in torch."""
    from transformers import AutoTokenizer, BertModel

    tok = AutoTokenizer.from_pretrained(model_dir)
    model = BertModel.from_pretrained(model_dir).eval()
    enc = tok(sentences, padding='longest', truncation=True, max_length=32,
              return_tensors='pt')
    with torch.no_grad():
        hidden = model(**enc).last_hidden_state
    w = enc['attention_mask'].unsqueeze(-1).float()
    emb = (hidden * w).sum(1) / w.sum(1).clamp(min=1e-9)
    emb = emb / emb.norm(dim=-1, keepdim=True).clamp(min=1e-9)
    return emb.numpy()


def test_flax_encode_matches_torch_recipe(tiny_bert):
    from textgcn_tpu.data.encoder_flax import flax_encode

    # batch_size 3 over 7 sentences: multiple chunks, row padding on the
    # last, and different padded-length buckets across chunks
    got = flax_encode(SENTENCES, tiny_bert, batch_size=3)
    want = _torch_oracle(SENTENCES, tiny_bert)
    assert got.shape == want.shape
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, atol=2e-4)
    # unit-norm outputs
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                               atol=1e-4)


def test_encode_sentences_flax_backend_routing(tiny_bert, monkeypatch):
    from textgcn_tpu.data.text import encode_sentences

    monkeypatch.setenv('TEXTGCN_TPU_TEXT_ENCODER', 'flax')
    got = encode_sentences(SENTENCES[:3], tiny_bert, batch_size=2)
    want = _torch_oracle(SENTENCES[:3], tiny_bert)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_auto_falls_back_to_stub_without_model(monkeypatch):
    """auto: st -> flax -> stub; an unloadable model name must land on the
    deterministic stub, not raise."""
    from textgcn_tpu.data.text import STUB_DIM, encode_sentences

    monkeypatch.setenv('TEXTGCN_TPU_TEXT_ENCODER', 'auto')
    monkeypatch.setenv('HF_HUB_OFFLINE', '1')
    got = encode_sentences(['a', 'b'], '/nonexistent/model-dir',
                           batch_size=2)
    assert got.shape == (2, STUB_DIM)


def test_flax_encode_matches_sentence_transformers(tiny_bert, monkeypatch):
    """Numerical parity with the ACTUAL `SentenceTransformer.encode`
    pipeline the reference calls (utils.py:109-112), assembled offline
    from the tiny local checkpoint: Transformer -> Pooling(mean) ->
    Normalize.  Guards every convention at once (special tokens in the
    mean, truncation, normalization order) against library drift."""
    st_mod = pytest.importorskip('sentence_transformers')

    monkeypatch.setenv('HF_HUB_OFFLINE', '1')
    from sentence_transformers import SentenceTransformer, models

    word = models.Transformer(tiny_bert, max_seq_length=32)
    pool = models.Pooling(word.get_word_embedding_dimension(),
                          pooling_mode='mean')
    st = SentenceTransformer(modules=[word, pool, models.Normalize()],
                             device='cpu')
    want = st.encode(SENTENCES, batch_size=3, convert_to_numpy=True,
                     normalize_embeddings=False, show_progress_bar=False)

    from textgcn_tpu.data.encoder_flax import flax_encode
    got = flax_encode(SENTENCES, tiny_bert, batch_size=3)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
    cos = (got * want).sum(-1)  # both unit-norm
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def test_flax_encode_matches_real_minilm(monkeypatch):
    """REAL-weights parity with the reference's exact encoder
    (``SentenceTransformer('all-MiniLM-L6-v2')``, reference
    ``utils.py:109-112``), gated on weight availability: loads
    cache-only (``HF_HUB_OFFLINE=1``, so it skips fast instead of
    hanging in a zero-egress image) and activates the moment the HF
    cache holds the model or ``TEXTGCN_TPU_MINILM_DIR`` points at a
    local copy.  Until then the tiny-checkpoint tests above pin the
    pipeline conventions and this stays an xfail-style skip."""
    pytest.importorskip('sentence_transformers')
    monkeypatch.setenv('HF_HUB_OFFLINE', '1')
    monkeypatch.setenv('TRANSFORMERS_OFFLINE', '1')
    from sentence_transformers import SentenceTransformer

    name = os.environ.get('TEXTGCN_TPU_MINILM_DIR',
                          'sentence-transformers/all-MiniLM-L6-v2')
    try:
        st = SentenceTransformer(name, device='cpu')
    except Exception as e:  # no cached weights, no local dir
        pytest.skip(f'real MiniLM weights unavailable offline: {e}')

    want = st.encode(SENTENCES, batch_size=3, convert_to_numpy=True,
                     normalize_embeddings=True, show_progress_bar=False)

    from textgcn_tpu.data.encoder_flax import flax_encode
    got = flax_encode(SENTENCES, name, batch_size=3)

    assert got.shape == want.shape
    cos = (got * want).sum(-1)  # both unit-norm
    assert cos.min() > 0.999, cos
