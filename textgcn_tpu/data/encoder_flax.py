"""TPU-native text encoder: Flax transformer + mean pooling on device.

The reference encodes text with ``SentenceTransformer.encode`` on a CUDA
device (reference ``utils.py:109-112``).  Its default model
(``all-MiniLM-L6-v2``) is the pipeline *transformer -> attention-masked
token mean -> L2 normalize*; this module reproduces that recipe with the
HuggingFace **Flax** model classes, so the encode pass runs on the TPU
through XLA instead of through torch on the host.

TPU shape discipline: XLA compiles one program per input shape, so padded
sequence lengths are bucketed to powers of two (capped at the model max)
and rows are processed in fixed-size batches — a handful of compiled
variants total, regardless of corpus size.  Callers sort sentences by
length (``embed_text`` already does), which keeps batches
length-homogeneous and the padding waste small.

Weights load from a local directory or the HF cache; PyTorch-only
checkpoints convert via ``from_pt=True``.  No network access is attempted
beyond what ``transformers.from_pretrained`` itself does.
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger('textgcn_tpu')

_MIN_BUCKET = 16


def _bucket_len(n: int, max_len: int) -> int:
    """Smallest power-of-two >= n, clamped to [_MIN_BUCKET, max_len]."""
    b = _MIN_BUCKET
    while b < n and b < max_len:
        b *= 2
    return min(b, max_len)


def _model_max_len(tokenizer, cap: int = 512) -> int:
    mml = getattr(tokenizer, 'model_max_length', None)
    if not mml or mml > 100_000:  # VERY_LARGE_INTEGER sentinel
        return cap
    return min(int(mml), cap)


def flax_encode(sentences: list[str], bert_model: str,
                batch_size: int) -> np.ndarray:
    """Encode sentences with a Flax transformer on the default device.

    Mean pooling over non-padding tokens + L2 normalization, matching the
    SentenceTransformer MiniLM pipeline (Transformer -> Pooling(mean) ->
    Normalize) the reference relies on.
    """
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer, FlaxAutoModel

    tokenizer = AutoTokenizer.from_pretrained(bert_model)
    try:
        model = FlaxAutoModel.from_pretrained(bert_model)
    except (OSError, EnvironmentError, ValueError):
        # torch-only checkpoint: convert weights once at load
        model = FlaxAutoModel.from_pretrained(bert_model, from_pt=True)
    params = model.params
    max_len = _model_max_len(tokenizer)
    # the tokenizer's limit can be a sentinel (locally-built tokenizers);
    # the position-embedding table is the hard ceiling
    max_len = min(max_len,
                  getattr(model.config, 'max_position_embeddings', max_len))

    def fwd(params, ids, mask):
        hidden = model(input_ids=ids, attention_mask=mask, params=params,
                       train=False).last_hidden_state
        w = mask[..., None].astype(hidden.dtype)
        emb = (hidden * w).sum(1) / jnp.maximum(w.sum(1), 1e-9)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb / jnp.maximum(norm, 1e-9)

    fwd_j = jax.jit(fwd)

    out: list[np.ndarray] = []
    for start in range(0, len(sentences), batch_size):
        chunk = sentences[start:start + batch_size]
        tok = tokenizer(chunk, padding='longest', truncation=True,
                        max_length=max_len, return_tensors='np')
        ids = tok['input_ids'].astype(np.int32)
        mask = tok['attention_mask'].astype(np.int32)
        # fixed-shape bucket: pad length to a power of two and rows to the
        # full batch so every chunk hits one of a few compiled programs
        blen = _bucket_len(ids.shape[1], max_len)
        pad_t = blen - ids.shape[1]
        pad_r = batch_size - ids.shape[0]
        ids = np.pad(ids, ((0, pad_r), (0, pad_t)))
        mask = np.pad(mask, ((0, pad_r), (0, pad_t)))
        emb = fwd_j(params, jnp.asarray(ids), jnp.asarray(mask))
        out.append(np.asarray(emb[:len(chunk)], dtype=np.float32))
    return np.concatenate(out, axis=0)
