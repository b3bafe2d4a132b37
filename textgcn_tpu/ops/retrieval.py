"""Full-catalog scoring + train-mask + top-k retrieval.

TPU-native replacement for the reference eval hot loop
(``base_model.py:235-266``): per batch of users it computes the
(B, n_items) score matrix (one MXU matmul), sets train items to -inf via
the padded per-user positive matrix (replacing the pandas ``explode`` fancy
indexing at ``base_model.py:257-258``), and takes ``lax.top_k``.  Everything
is jitted with static shapes; the catalog axis can additionally be sharded
(see ``textgcn_tpu/parallel/sharded.py`` for the multi-chip merge).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalar on purpose: a jnp constant here would initialize the JAX
# backend at import time, before callers can pick a platform
NEG_INF = np.float32(-np.inf)

# two-stage blocked top-k: per-block top-k then top-k over the G*k
# candidates — EXACT for k <= block size.  Measured on v5e it LOSES to
# one monolithic ``lax.top_k`` (112 vs 27.6 ms for (2048, 81920) top-40):
# XLA's top-k is already a partial sort, so the extra stage only adds
# work.  OFF by default; TEXTGCN_TPU_BLOCKED_TOPK=1 opts in (useful if a
# future XLA regresses the monolithic path, or on catalog shards where
# the second stage can ride an all-gather).
TOPK_BLOCK = 8192


def _use_blocked(n: int) -> bool:
    import os
    return os.environ.get('TEXTGCN_TPU_BLOCKED_TOPK', '') == '1'


def exact_top_k(scores, k: int):
    """Exact top-k over the last axis, blocked for large catalogs.

    Stage 1 takes top-k within each TOPK_BLOCK-wide block (small parallel
    sorts); stage 2 re-top-ks the G*k survivors.  Any global top-k element
    is also in its own block's top-k, so the result equals
    ``lax.top_k(scores, k)`` (modulo tie order across blocks).
    """
    n = scores.shape[-1]
    if not _use_blocked(n) or k > TOPK_BLOCK:
        return jax.lax.top_k(scores, k)
    g = -(-n // TOPK_BLOCK)
    pad = g * TOPK_BLOCK - n
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((*scores.shape[:-1], pad), NEG_INF,
                              scores.dtype)], axis=-1)
    blocked = scores.reshape(*scores.shape[:-1], g, TOPK_BLOCK)
    vals, local = jax.lax.top_k(blocked, k)              # (..., G, k)
    base = (jnp.arange(g, dtype=jnp.int32)
            * TOPK_BLOCK)[..., :, None]                  # (G, 1)
    idx = local + base
    flat_v = vals.reshape(*scores.shape[:-1], g * k)
    flat_i = idx.reshape(*scores.shape[:-1], g * k)
    top_v, pos = jax.lax.top_k(flat_v, k)
    return top_v, jnp.take_along_axis(flat_i, pos, axis=-1)


def env_recall() -> float:
    """The ``TEXTGCN_TPU_APPROX_TOPK`` serving opt-in, parsed to a recall
    target (0 = exact).  Read at trace time — callers mixing modes in one
    process should pass ``approx`` explicitly instead."""
    import os
    env = os.environ.get('TEXTGCN_TPU_APPROX_TOPK', '')
    try:
        return float(env)
    except ValueError:
        return 0.0


def catalog_top_k(scores, k: int, approx: float | None = None):
    """Top-k over the catalog axis: exact by default, or TPU-native
    approximate MIPS retrieval at a recall target in (0, 1) (e.g.
    ``0.95``) — pass ``approx`` explicitly (serving API) or set the
    ``TEXTGCN_TPU_APPROX_TOPK`` env var (CLI opt-in; read at trace time,
    so the explicit argument wins for callers that mix modes in one
    process).

    ``jax.lax.approx_max_k`` is the hardware-accelerated partial
    reduction TPUs provide for exactly this serving pattern; at
    recall_target 0.95 it skips the full sort the exact op needs
    (measured 8-10x on v5e at an 80k catalog).  Eval metrics move by at
    most (1 - recall) of the relevant items, so this is an opt-in for
    large-catalog serving/benchmarks, never the default.
    """
    if approx is None:
        approx = env_recall()
    if 0.0 < approx < 1.0:
        return jax.lax.approx_max_k(scores, k, recall_target=approx)
    return exact_top_k(scores, k)


def mining_top_k(scores, k: int):
    """Top-k for hard-negative mining (AdvSampl).

    Unlike eval retrieval, negative *mining* needs no exactness — the
    candidate set is already a Bernoulli draw, so swapping ~5% of the
    hardest negatives for slightly-less-hard ones is within the sampling
    noise.  Large catalogs therefore use the TPU-native
    ``lax.approx_max_k`` partial reduction (measured 10x faster than the
    exact ``lax.top_k`` at a 25k catalog on v5e: 1.0 vs 10.6 ms for a
    (2048, 25600) top-40, ~22% of the AdvSampl step).  Small catalogs
    (< 4096) keep the exact op — nothing to save.

    ``TEXTGCN_TPU_ADV_TOPK`` overrides: ``exact`` forces ``lax.top_k``,
    a float in (0, 1) sets the recall target (default 0.95).
    """
    import os
    env = os.environ.get('TEXTGCN_TPU_ADV_TOPK', '')
    if env == 'exact' or scores.shape[-1] < 4096:
        return jax.lax.top_k(scores, k)
    try:
        recall = float(env)
    except ValueError:
        recall = 0.95
    if not 0.0 < recall < 1.0:
        recall = 0.95
    return jax.lax.approx_max_k(scores, k, recall_target=recall)


def mask_train_items(scores, batch_pos_padded, n_items: int):
    """Set scores of already-interacted items to -inf.

    ``scores``: (B, >= n_items) — phantom columns past ``n_items`` (table
    padding) are sliced off.  ``batch_pos_padded``: (B, max_deg) padded
    with ids >= ``n_items``.

    Formulated as one scatter-``min`` over the (already sliced) matrix:
    valid positions contribute -inf, padding slots clamp to column
    ``n_items - 1`` with a +inf no-op fill (``min`` is order-insensitive,
    so a padding slot colliding with a real masked position cannot
    un-mask it).  The previous concat(+1 col) -> scatter -> slice did
    three full passes over the (B, n_items) matrix in HBM; this does one
    — at serving scale (2048 x 80k, 671 MB) that traffic dominates the
    batch once ``approx_max_k`` makes the top-k itself cheap.
    """
    b = scores.shape[0]
    if scores.shape[1] > n_items:
        scores = scores[:, :n_items]
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    valid = batch_pos_padded < n_items
    cols = jnp.where(valid, batch_pos_padded, n_items - 1)
    fill = jnp.where(valid, NEG_INF,
                     jnp.inf).astype(scores.dtype)
    return scores.at[rows, cols].min(fill)


@partial(jax.jit, static_argnames=('k', 'n_items', 'approx'))
def score_and_topk(users_emb, items_emb, batch_pos_padded, *, k: int,
                   n_items: int, approx: float | None = None):
    """Dot-product scores for a user batch against the full catalog,
    train-masked, and the top-k (values, indices).

    ``users_emb``: (B, d) propagated user reprs; ``items_emb``: (n_items, d).
    Matches reference ``score_batchwise`` (``base_model.py:173-179``) +
    masking + ``torch.topk`` (``base_model.py:254-261``).  ``approx``:
    serving-mode recall target (see ``catalog_top_k``).
    """
    if approx is None:
        approx = env_recall()
    serving = 0.0 < approx < 1.0
    # slice phantom table-padding rows off the small operand so the
    # (B, catalog) matrix is never computed/written wider than n_items.
    # Serving mode emits bf16 scores: the batch is HBM-bound on the
    # (B, n_items) matrix once approx_max_k makes the reduction cheap, so
    # halving it is 1.66x (9.45 -> 5.68 ms at 2048 x 80k on v5e); measured
    # recall vs the exact f32 path 0.978 at a 0.95 target (inputs are
    # rounded to bf16 by DEFAULT matmul precision even in f32 mode — only
    # the output rounding is new, and serving is approximate by contract).
    out_t = jnp.bfloat16 if serving else jnp.float32
    scores = jnp.dot(users_emb, items_emb[:n_items].T,
                     preferred_element_type=out_t)
    scores = mask_train_items(scores, batch_pos_padded, n_items)
    vals, idx = catalog_top_k(scores, k, approx)
    return vals.astype(jnp.float32), idx


@partial(jax.jit, static_argnames=('k', 'n_items', 'approx'))
def topk_from_scores(scores, batch_pos_padded, *, k: int, n_items: int,
                     approx: float | None = None):
    """Train-mask precomputed scores and take top-k (LTR heads compute their
    own score tensors before retrieval)."""
    scores = mask_train_items(scores, batch_pos_padded, n_items)
    return catalog_top_k(scores, k, approx)


def merge_topk(values, indices, k: int):
    """Merge per-shard top-k results along a shard axis.

    ``values``/``indices``: (n_shards, B, k) where indices are global item
    ids.  Used by the catalog-sharded eval path: each shard computes its
    local top-k, shards are all-gathered, and this picks the global top-k.
    """
    n_shards, b, _ = values.shape
    flat_v = jnp.transpose(values, (1, 0, 2)).reshape(b, n_shards * k)
    flat_i = jnp.transpose(indices, (1, 0, 2)).reshape(b, n_shards * k)
    top_v, pos = jax.lax.top_k(flat_v, k)
    return top_v, jnp.take_along_axis(flat_i, pos, axis=1)
