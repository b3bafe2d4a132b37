"""Vectorized on-device BPR sampling.

Replaces the reference's per-user Python rejection sampler
(``dataset.py:167-193``: per-epoch cached ``random.choice`` positives +
set-based rejection-sampled negatives, served through a torch DataLoader)
with a single jitted function that draws an **entire epoch** of
``(user, pos, neg*neg_samples)`` triples with ``jax.random``.

Semantics preserved (SURVEY.md quirk Q7): uniform-user buckets — every user
contributes exactly ``bucket_len = n_train // n_users`` triples per epoch,
positives drawn uniformly with replacement from the user's positive list,
negatives drawn uniformly from the catalog excluding the user's positives.
The triples are then globally permuted, mirroring the reference DataLoader's
``shuffle=True`` over the flat index space (``main.py:35``).

Deliberate deviation: the reference draws *distinct* negatives per user
bucket via a python set; we draw independently with a fixed number of
rejection rounds (static shapes for XLA).  For real catalogs the collision
probability is ~deg/n_items per draw, so after ``REJECTION_ROUNDS`` redraws
the residual positive-collision probability is negligible; any survivor is
resolved by an **exact uniform draw from the user's complement set** via
rank bisection (see ``sample_epoch``), so a returned "negative" is never a
positive regardless of the user's degree or id layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

REJECTION_ROUNDS = 8


def _is_positive(pos_padded_row, candidates):
    """Membership of candidates in one user's sorted padded positive row."""
    idx = jnp.searchsorted(pos_padded_row, candidates)
    idx = jnp.clip(idx, 0, pos_padded_row.shape[0] - 1)
    return pos_padded_row[idx] == candidates


@partial(jax.jit, static_argnames=('bucket_len', 'neg_samples', 'n_items'))
def sample_epoch(key, pos_padded, pos_degree, *, bucket_len: int,
                 neg_samples: int, n_items: int):
    """Draw one epoch of training triples.

    Returns ``(users, pos, negs)`` with shapes ``(N,)``, ``(N,)``,
    ``(N, neg_samples)`` where ``N = n_users * bucket_len``, already
    globally shuffled.
    """
    n_users = pos_padded.shape[0]
    n = n_users * bucket_len
    k_pos, k_neg, k_fix, k_perm = jax.random.split(key, 4)

    users = jnp.repeat(jnp.arange(n_users, dtype=jnp.int32), bucket_len)

    # positives: uniform index into each user's true degree
    pos_idx = jax.random.randint(k_pos, (n,), 0, 1 << 30)
    deg = jnp.maximum(pos_degree[users], 1)
    pos = pos_padded[users, (pos_idx % deg).astype(jnp.int32)]

    # negatives: fixed-round rejection sampling against the positive set
    def body(carry, k):
        cand, bad = carry
        fresh = jax.random.randint(k, cand.shape, 0, n_items,
                                   dtype=jnp.int32)
        cand = jnp.where(bad, fresh, cand)
        bad = jax.vmap(_is_positive)(pos_padded[users], cand)
        return (cand, bad), None

    cand0 = jnp.zeros((n, neg_samples), dtype=jnp.int32)
    bad0 = jnp.ones((n, neg_samples), dtype=bool)
    keys = jax.random.split(k_neg, REJECTION_ROUNDS)
    (cand, bad), _ = jax.lax.scan(body, (cand0, bad0), keys)

    # exact fallback for the (vanishingly rare) survivors: draw the r-th
    # item of the user's complement set directly.  g(x) = (x + 1) -
    # |positives <= x| counts non-positives in [0, x] and is nondecreasing,
    # so the smallest x with g(x) = r + 1 is the r-th non-positive item —
    # found by bisection in ceil(log2(n_items)) vectorized steps.  (A
    # capped linear walk was used before; it could emit a positive for a
    # user owning a long contiguous run of item ids.)
    pp = pos_padded[users]
    n_free = jnp.maximum(n_items - pos_degree[users], 1)
    r = (jax.random.randint(k_fix, cand.shape, 0, 1 << 30)
         % n_free[:, None]).astype(jnp.int32)

    def bis_body(carry, _):
        lo, hi = carry
        mid = (lo + hi) // 2
        n_pos_le = jax.vmap(
            lambda row, x: jnp.searchsorted(row, x, side='right'))(pp, mid)
        right = (mid + 1 - n_pos_le.astype(jnp.int32)) < r + 1
        return (jnp.where(right, mid + 1, lo),
                jnp.where(right, hi, mid)), None

    lo0 = jnp.zeros_like(cand)
    hi0 = jnp.full_like(cand, n_items - 1)
    n_bis = max(1, int(n_items - 1).bit_length())
    (complement, _), _ = jax.lax.scan(bis_body, (lo0, hi0), None,
                                      length=n_bis)
    cand = jnp.where(bad, complement, cand)

    perm = jax.random.permutation(k_perm, n)
    return users[perm], pos[perm], cand[perm]


def pad_to_batches(n: int, batch_size: int) -> tuple[int, int]:
    """Return (n_batches, padded_n) for a fixed-shape batched epoch."""
    n_batches = max(1, -(-n // batch_size))
    return n_batches, n_batches * batch_size


@partial(jax.jit, static_argnames=('batch_size',))
def batch_epoch(users, pos, negs, *, batch_size: int):
    """Reshape a shuffled epoch into fixed-size batches with a validity mask.

    The tail batch is padded (mask=False) so every batch has a static shape;
    loss functions take the mask and compute masked means, preserving the
    reference's exact per-batch mean semantics for the ragged final batch.
    """
    n = users.shape[0]
    n_batches, padded = pad_to_batches(n, batch_size)
    pad = padded - n
    mask = jnp.arange(padded) < n
    users = jnp.pad(users, (0, pad))
    pos = jnp.pad(pos, (0, pad))
    negs = jnp.pad(negs, ((0, pad), (0, 0)))
    return (users.reshape(n_batches, batch_size),
            pos.reshape(n_batches, batch_size),
            negs.reshape(n_batches, batch_size, -1),
            mask.reshape(n_batches, batch_size))
