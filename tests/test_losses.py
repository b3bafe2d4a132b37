"""BPR + reg losses vs hand-computed values (reference base_model.py:186-210)."""

import jax.numpy as jnp
import numpy as np
import pytest

from textgcn_tpu.models.losses import bpr_loss, masked_mean, reg_loss


def selu(x):
    alpha = 1.6732632423543772
    scale = 1.0507009873554805
    return np.where(x > 0, scale * x, scale * alpha * (np.exp(x) - 1))


def test_bpr_hand_computed():
    pos = np.array([1.0, 2.0, 0.5], dtype=np.float32)
    neg = np.array([[0.5, 1.5], [1.0, 2.5], [0.0, 0.2]], dtype=np.float32)
    mask = np.array([True, True, True])
    # reference: mean over neg columns of mean(selu(neg - pos))
    want = np.mean([selu(neg[:, j] - pos).mean() for j in range(2)])
    got = bpr_loss(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(mask))
    assert float(got) == pytest.approx(float(want), rel=1e-5)


def test_bpr_masked_tail():
    """Masked padding must reproduce the ragged-batch mean exactly."""
    pos = np.array([1.0, 2.0, 0.5, 9.9], dtype=np.float32)
    neg = np.array([[0.5], [1.0], [0.0], [123.0]], dtype=np.float32)
    mask = np.array([True, True, True, False])
    want = selu(neg[:3, 0] - pos[:3]).mean()
    got = bpr_loss(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(mask))
    assert float(got) == pytest.approx(float(want), rel=1e-5)


def test_reg_hand_computed(rng):
    n_u, n_i, d = 5, 7, 4
    ue = rng.randn(n_u, d).astype(np.float32)
    ie = rng.randn(n_i, d).astype(np.float32)
    users = np.array([0, 1, 2], dtype=np.int32)
    pos = np.array([1, 2, 3], dtype=np.int32)
    negs = np.array([[0, 4], [5, 6], [2, 0]], dtype=np.int32)
    mask = np.array([True, True, True])
    lam = 1e-3
    # reference: lam * (sum_sq(u rows) + sum_sq(pos rows) + sum_sq(all neg
    # rows)) / len(users) / 2 — the .mean() on the stacked neg Frobenius
    # norm is a no-op (base_model.py:200-210)
    want = lam * (np.sum(ue[users] ** 2) + np.sum(ie[pos] ** 2)
                  + np.sum(ie[negs] ** 2)) / 3 / 2
    got = reg_loss(jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(users),
                   jnp.asarray(pos), jnp.asarray(negs), jnp.asarray(mask),
                   lam)
    assert float(got) == pytest.approx(float(want), rel=1e-5)


def test_reg_mask_excludes_padding(rng):
    ue = rng.randn(4, 3).astype(np.float32)
    ie = rng.randn(4, 3).astype(np.float32)
    users = np.array([0, 1], dtype=np.int32)
    pos = np.array([1, 0], dtype=np.int32)
    negs = np.array([[2], [3]], dtype=np.int32)
    full = reg_loss(jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(users),
                    jnp.asarray(pos), jnp.asarray(negs),
                    jnp.asarray(np.array([True, True])), 1.0)
    # pad with a junk row, mask it out: per-sample sums differ but the
    # masked count in the denominator must too
    users_p = np.array([0, 1, 3], dtype=np.int32)
    pos_p = np.array([1, 0, 3], dtype=np.int32)
    negs_p = np.array([[2], [3], [0]], dtype=np.int32)
    padded = reg_loss(jnp.asarray(ue), jnp.asarray(ie),
                      jnp.asarray(users_p), jnp.asarray(pos_p),
                      jnp.asarray(negs_p),
                      jnp.asarray(np.array([True, True, False])), 1.0)
    assert float(full) == pytest.approx(float(padded), rel=1e-6)


def test_masked_mean():
    x = jnp.asarray(np.array([1.0, 2.0, 100.0]))
    m = jnp.asarray(np.array([True, True, False]))
    assert float(masked_mean(x, m)) == pytest.approx(1.5)
