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
resolved deterministically by stepping to the next non-positive item.
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

    # deterministic fallback for the (vanishingly rare) survivors: walk
    # forward modulo n_items until off the positive set.  max_degree steps
    # suffice because positives are sorted and < n_items.
    def fix_body(carry, _):
        cand, bad = carry
        cand = jnp.where(bad, (cand + 1) % n_items, cand)
        bad = bad & jax.vmap(_is_positive)(pos_padded[users], cand)
        return (cand, bad), None

    max_fix = pos_padded.shape[1]
    (cand, bad), _ = jax.lax.scan(fix_body, (cand, bad),
                                  None, length=min(max_fix, 64))

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
