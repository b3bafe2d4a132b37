"""Text feature pipeline: KG descriptions, review embeddings, popularity.

Capability match for the reference's text stack:

* ``embed_text`` — dedup -> sort-by-length -> encode -> remap, with an
  on-disk cache keyed by bert model + seed (reference ``utils.py:93-118``;
  cache file naming follows ``kg_models.py:24-31`` /
  ``reviews_models.py:37-41``, stored as ``.npy`` here, with read-through
  support for reference-produced ``.torch`` files).
* KG item descriptions — all ``meta_synced.tsv`` columns concatenated into
  one text per item with ``[SEP]`` separators (reference
  ``kg_models.py:33-41``).
* Review features — train-only reviews, per-user/per-item selection of the
  ``median(count)`` most recent reviews, mean-vector item/user
  representations (reference ``reviews_models.py:55-98``,
  ``ltr_models.py:19-35``).
* Popularity — normalized review counts.  NOTE: the reference's
  ``_calc_popularity`` (``reviews_models.py:100-113``) divides *user ids*
  (the reset-index column of a count-sorted frame) by the row count — a
  bug documented as SURVEY.md Q2.  Default here is the intended semantics
  (count / max count); ``popularity_mode='compat'`` reproduces the
  reference's literal values for parity experiments.

Encoding backends (select via ``TEXTGCN_TPU_TEXT_ENCODER``):

* ``flax`` — TPU-native: HF Flax transformer forward + masked mean pooling
  + L2 normalize jitted on the accelerator (``encoder_flax.py``) — the
  ``all-MiniLM-L6-v2`` SentenceTransformer recipe without torch.
* ``st`` — ``sentence-transformers`` on the host (the reference's path).
* ``stub`` — deterministic hash-seeded unit vectors for tests / zero-egress
  environments.
* ``auto`` (default) — st, then flax, then stub, first that works.
"""

from __future__ import annotations

import hashlib
import logging
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..config import Config
from .core import InteractionData, load_interactions

log = logging.getLogger('textgcn_tpu')

STUB_DIM = 384  # matches all-MiniLM-L6-v2 output dim


# ---------------------------------------------------------------------------
# encoders

def _stub_encode(sentences: list[str]) -> np.ndarray:
    """Deterministic offline encoder: hash-seeded unit-norm vectors.

    Used for tests and zero-egress environments; NOT semantically
    meaningful, but stable across runs/platforms.
    """
    out = np.empty((len(sentences), STUB_DIM), dtype=np.float32)
    for j, s in enumerate(sentences):
        h = hashlib.sha256(s.encode('utf-8', 'ignore')).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], 'little'))
        v = rng.standard_normal(STUB_DIM).astype(np.float32)
        out[j] = v / max(np.linalg.norm(v), 1e-8)
    return out


def _st_encode(sentences: list[str], bert_model: str,
               batch_size: int) -> np.ndarray:
    from sentence_transformers import SentenceTransformer
    model = SentenceTransformer(bert_model, device='cpu')
    return np.asarray(model.encode(sentences, batch_size=batch_size))


def _flax_encode(sentences: list[str], bert_model: str,
                 batch_size: int) -> np.ndarray:
    from .encoder_flax import flax_encode
    return flax_encode(sentences, bert_model, batch_size)


def encode_sentences(sentences: list[str], bert_model: str,
                     batch_size: int) -> np.ndarray:
    backend = os.environ.get('TEXTGCN_TPU_TEXT_ENCODER', 'auto')
    if backend == 'stub':
        return _stub_encode(sentences)
    if backend == 'st':
        return _st_encode(sentences, bert_model, batch_size)
    if backend == 'flax':
        return _flax_encode(sentences, bert_model, batch_size)
    for name, fn in (('sentence-transformers', _st_encode),
                     ('flax', _flax_encode)):
        try:
            return fn(sentences, bert_model, batch_size)
        except Exception as e:  # model not downloadable offline, etc.
            log.warning('%s encode failed (%s: %s); trying next backend',
                        name, type(e).__name__, e)
    log.warning('no encoder backend available for %r; using the '
                'deterministic stub encoder', bert_model)
    return _stub_encode(sentences)


# ---------------------------------------------------------------------------
# cached embed_text (reference utils.py:93-118 contract)

def _texts_fingerprint(texts: list[str]) -> str:
    """Content hash of the exact row sequence an embedding cache covers."""
    import hashlib
    h = hashlib.sha1()
    h.update(str(len(texts)).encode())
    for t in texts:
        h.update(t.encode('utf-8', 'ignore'))
        h.update(b'\x00')
    return h.hexdigest()


def embed_text(sentences: pd.Series, cache_path: str, bert_model: str,
               batch_size: int) -> np.ndarray:
    """Embed a text series with dedup + length-sorted batching + disk cache.

    Returns array aligned with ``sentences`` order.  Reads an existing
    ``.npy`` cache, or a reference-produced ``.torch`` file at the same
    stem for drop-in compatibility with existing caches.
    """
    texts = sentences.astype(str).tolist()
    fp = _texts_fingerprint(texts)
    npy_path = cache_path if cache_path.endswith('.npy') \
        else cache_path + '.npy'
    meta_path = npy_path + '.meta'
    if os.path.exists(npy_path):
        cached = np.load(npy_path)
        # the cache file name (model+seed) does not capture the row set;
        # a changed input (e.g. --reshuffle filtering different review
        # rows) would silently misalign row i with the wrong text.  Our
        # own caches carry a content fingerprint; reference-produced
        # caches have none, so they get the row-count check only.
        stale = False
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                stale = f.read().strip() != fp
        elif len(cached) != len(texts):
            stale = True
        if not stale:
            return cached
        log.warning('embedding cache %s does not match the current text '
                    'rows (%d cached vs %d); re-encoding', npy_path,
                    len(cached), len(texts))
    else:
        torch_path = cache_path if cache_path.endswith('.torch') \
            else cache_path.rsplit('.npy', 1)[0] + '.torch'
        if os.path.exists(torch_path):
            import torch
            cached = torch.load(torch_path, map_location='cpu',
                                weights_only=False).cpu().numpy()
            if len(cached) == len(texts):
                return cached
            log.warning('reference embedding cache %s has %d rows but the '
                        'current text has %d; re-encoding', torch_path,
                        len(cached), len(texts))

    unique = sorted(set(texts), key=lambda x: len(x.split(' ')),
                    reverse=True)
    embs = encode_sentences(unique, bert_model, batch_size)
    mapping = {t: e for t, e in zip(unique, embs)}
    result = np.stack([mapping[t] for t in texts]).astype(np.float32)
    os.makedirs(os.path.dirname(npy_path), exist_ok=True)
    np.save(npy_path, result)
    with open(meta_path, 'w') as f:
        f.write(fp)
    return result


# ---------------------------------------------------------------------------
# LTR dataset: interactions + text features

@dataclass
class LTRData(InteractionData):
    """InteractionData extended with dense text/popularity feature tensors."""
    items_as_desc: np.ndarray = None          # (n_items, D)
    items_as_avg_reviews: np.ndarray = None   # (n_items, D)
    users_as_avg_reviews: np.ndarray = None   # (n_users, D)
    users_as_avg_desc: np.ndarray = None      # (n_users, D)
    popularity_users: np.ndarray = None       # (n_users, 1)
    popularity_items: np.ndarray = None       # (n_items, 1)
    text_dim: int = 0
    # per-(item, user) review vectors for the pos='user' text
    # representation (reference reviews_models.py:60,139-142), stored as
    # int32-safe parallel arrays sorted lexicographically by (item, user)
    # with a per-item row pointer — no composite int64 key, so the lookup
    # cannot wrap however large n_items * n_users gets (JAX truncates
    # int64 to int32 when x64 is off).  Missing pairs -> zeros.
    review_pair_items: np.ndarray = None      # (n_reviews,) int32 sorted
    review_pair_users: np.ndarray = None      # (n_reviews,) int32
    review_pair_item_ptr: np.ndarray = None   # (n_items + 1,) int32
    review_pair_vectors: np.ndarray = None    # (n_reviews, D)


def _load_kg_descriptions(base: InteractionData, cfg: Config) -> np.ndarray:
    """Item descriptions from meta_synced.tsv -> embedded (n_items, D)."""
    cache = os.path.join(
        cfg.data, 'embeddings',
        f'item_kg_repr_{cfg.bert_model.split("/")[-1]}_{cfg.seed}-seed')
    meta_path = os.path.join(cfg.data, 'meta_synced.tsv')
    kg = pd.read_table(meta_path).set_index('asin')
    cols = list(kg.columns)
    text = kg[cols[0]].astype(str)
    for c in cols[1:]:
        text = text + f' {cfg.sep} ' + kg[c].astype(str)
    item_text = base.item_mapping['org_id'].map(text.to_dict()).fillna('')
    return embed_text(item_text, cache, cfg.bert_model, cfg.emb_batch_size)


def _load_reviews(base: InteractionData, cfg: Config) -> pd.DataFrame:
    """reviews_text.tsv with remapped ids; rows outside the graph dropped
    (reference ``reviews_models.py:21-29``)."""
    df = pd.read_table(os.path.join(cfg.data, 'reviews_text.tsv'),
                       dtype=str)
    if 'time' not in df.columns:
        df['time'] = 0
    df = df[['asin', 'user_id', 'review', 'time']].sort_values(
        ['asin', 'user_id'])
    u_map = dict(zip(base.user_mapping.org_id, base.user_mapping.remap_id))
    i_map = dict(zip(base.item_mapping.org_id, base.item_mapping.remap_id))
    df = df.assign(user_id=df.user_id.map(u_map), asin=df.asin.map(i_map))
    df = df.dropna()
    df = df.astype({'asin': int, 'user_id': int})
    df['time'] = pd.to_numeric(df['time'], errors='coerce').fillna(0)
    return df


def _mean_by_group(df: pd.DataFrame, group_col: str, vectors: np.ndarray,
                   n_groups: int, dim: int) -> np.ndarray:
    """Mean of ``vectors`` rows per group id; absent groups get zeros."""
    out = np.zeros((n_groups, dim), dtype=np.float32)
    ids = df[group_col].to_numpy()
    np.add.at(out, ids, vectors)
    counts = np.bincount(ids, minlength=n_groups).astype(np.float32)
    nz = counts > 0
    out[nz] /= counts[nz, None]
    return out


def load_ltr_data(cfg: Config,
                  popularity_mode: str | None = None) -> LTRData:
    """Full LTR feature bundle (reference LTRDataset,
    ``ltr_models.py:11-35`` + its KG/Reviews parents).

    ``popularity_mode`` defaults to ``cfg.popularity_mode``
    (``--popularity_mode fixed|compat``, SURVEY.md Q2)."""
    if popularity_mode is None:
        popularity_mode = getattr(cfg, 'popularity_mode', 'fixed')
    base = load_interactions(cfg.data, reshuffle=cfg.reshuffle,
                             seed=cfg.seed)
    items_as_desc = _load_kg_descriptions(base, cfg)
    dim = items_as_desc.shape[1]

    reviews = _load_reviews(base, cfg)
    cache = os.path.join(
        cfg.data, 'embeddings',
        f'item_full_reviews_loss_repr_{cfg.bert_model.split("/")[-1]}'
        f'_{cfg.seed}-seed')
    vectors = embed_text(reviews['review'], cache, cfg.bert_model,
                         cfg.emb_batch_size)

    # retain train-only reviews (reference reviews_models.py:55-60)
    train_pairs = set(zip(base.train_df.asin, base.train_df.user_id))
    keep = np.fromiter(
        (pair in train_pairs
         for pair in zip(reviews.asin, reviews.user_id)),
        dtype=bool, count=len(reviews))
    reviews = reviews[keep].reset_index(drop=True)
    vectors = vectors[keep]

    # median review count over users and items -> num_reviews
    # (reference reviews_models.py:62-69)
    item_counts = reviews.groupby('asin').size()
    user_counts = reviews.groupby('user_id').size()
    num_reviews = int(pd.concat([item_counts, user_counts]).median())

    # per-user and per-item most-recent `num_reviews` reviews, deduped
    # (reference reviews_models.py:71-92)
    reviews = reviews.assign(_vec_row=np.arange(len(reviews)))
    by_user = (reviews.sort_values('time', ascending=False)
               .groupby('user_id').head(num_reviews))
    by_item = (reviews.sort_values('time', ascending=False)
               .groupby('asin').head(num_reviews))
    top_med = (pd.concat([by_user, by_item])
               .drop_duplicates(subset=['asin', 'user_id'])
               .sort_values(['asin', 'user_id'])
               .reset_index(drop=True))
    top_vecs = vectors[top_med['_vec_row'].to_numpy()]

    items_as_avg_reviews = _mean_by_group(
        top_med, 'asin', top_vecs, base.n_items, dim)
    users_as_avg_reviews = _mean_by_group(
        top_med, 'user_id', top_vecs, base.n_users, dim)
    # users as mean of descriptions of items they reviewed
    # (reference ltr_models.py:28-35)
    users_as_avg_desc = _mean_by_group(
        top_med, 'user_id', items_as_desc[top_med['asin'].to_numpy()],
        base.n_users, dim)

    pop_u = _popularity(reviews, 'user_id', base.n_users, popularity_mode)
    pop_i = _popularity(reviews, 'asin', base.n_items, popularity_mode)

    # (item, user) -> review-vector lookup over the train-retained reviews
    pair_items = reviews['asin'].to_numpy(np.int32)
    pair_users = reviews['user_id'].to_numpy(np.int32)
    order = np.lexsort((pair_users, pair_items))
    pair_items = pair_items[order]
    pair_users = pair_users[order]
    pair_item_ptr = np.searchsorted(
        pair_items, np.arange(base.n_items + 1)).astype(np.int32)
    pair_vectors = vectors[reviews['_vec_row'].to_numpy()[order]] \
        .astype(np.float32)

    return LTRData(
        **{f.name: getattr(base, f.name)
           for f in base.__dataclass_fields__.values()},
        items_as_desc=items_as_desc.astype(np.float32),
        items_as_avg_reviews=items_as_avg_reviews,
        users_as_avg_reviews=users_as_avg_reviews,
        users_as_avg_desc=users_as_avg_desc,
        popularity_users=pop_u, popularity_items=pop_i, text_dim=dim,
        review_pair_items=pair_items, review_pair_users=pair_users,
        review_pair_item_ptr=pair_item_ptr,
        review_pair_vectors=pair_vectors,
    )


def _popularity(reviews: pd.DataFrame, col: str, n: int,
                mode: str) -> np.ndarray:
    """Popularity feature per entity, shape (n, 1) float32.

    ``fixed`` (default): review count / max count — the intended semantics.
    ``compat``: the reference's literal (buggy) formula — entity ids in
    count-descending order divided by the number of entities
    (``reviews_models.py:100-113``, SURVEY.md Q2).
    """
    counts = np.zeros(n, dtype=np.float64)
    vc = reviews.groupby(col).size()
    counts[vc.index.to_numpy()] = vc.to_numpy()
    if mode == 'compat':
        order = vc.sort_values(ascending=False).index.to_numpy()
        vals = np.zeros(n)
        vals[:len(order)] = order / max(len(vc), 1)
        return vals.astype(np.float32).reshape(-1, 1)
    denom = max(counts.max(), 1.0)
    return (counts / denom).astype(np.float32).reshape(-1, 1)
