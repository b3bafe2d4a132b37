"""Block-sparse attention kernels (ops/pallas_gat) — multi-split path.

The conv-model equivalence tests (tests/test_conv.py) run at dummy scale
where every layout is a single source-range split.  These tests force
MULTIPLE splits (tiny ``vmem_budget``) and check ``gat_direction`` /
``gatv2_direction`` against the oracle-tested segment formulation —
forward and gradients, with dropout — covering the per-split hash-offset
reconstruction, the cross-split max combine, and the summed backward
partials.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textgcn_tpu.models.conv import _attention_direction, _leaky
from textgcn_tpu.ops.pallas_spmm import PallasGraphOp, edge_dropout_scale


@pytest.fixture(autouse=True)
def _f32_kernel(monkeypatch):
    monkeypatch.setenv('TEXTGCN_TPU_PALLAS_XDTYPE', 'f32')


def _setup(rng, d=8, e=4000, nu=8192, ni=8192):
    eu = rng.randint(0, nu // 4, e).astype(np.int32)   # real rows low
    ei = rng.randint(0, ni // 4, e).astype(np.int32)
    pairs = np.unique(np.stack([eu, ei], 1), axis=0)
    eu, ei = pairs[:, 0], pairs[:, 1]
    ones = np.ones(len(eu), np.float32)
    # budget sized so each 8192-row f32 table takes 2 splits
    op = PallasGraphOp(eu, ei, ones, nu, ni, d, interpret=True,
                       vmem_budget=4096 * d * 4)
    assert len(op.l_i2u.splits) >= 2, 'test must exercise >1 split'
    assert len(op.l_u2i.splits) >= 2
    h_u = jnp.asarray(rng.randn(nu, d).astype(np.float32))
    h_i = jnp.asarray(rng.randn(ni, d).astype(np.float32))
    return op, jnp.asarray(eu), jnp.asarray(ei), h_u, h_i


def _masks(eu, ei, key, p):
    salts = jax.random.bits(key, (2,), jnp.uint32)
    keep = jnp.float32(1.0 - p)
    m_u = (edge_dropout_scale(eu, ei, salts[0], keep)
           > 0).astype(jnp.float32)
    return salts, keep, m_u


def test_gat_direction_multisplit_matches_segment(rng):
    op, eu, ei, h_u, h_i = _setup(rng)
    nu = h_u.shape[0]
    key = jax.random.PRNGKey(11)
    salts, keep, m_u = _masks(eu, ei, key, 0.3)
    a_src = jnp.asarray(rng.randn(h_u.shape[1]).astype(np.float32))
    a_dst = jnp.asarray(rng.randn(h_u.shape[1]).astype(np.float32))

    def kernel_out(h_u, h_i):
        from textgcn_tpu.ops.pallas_gat import gat_direction
        s_u, d_u = h_u @ a_src, h_u @ a_dst
        s_i = h_i @ a_src
        return gat_direction(op, 'to_user', h_i, h_u, s_i, s_u, d_u,
                             salts[0], keep, interpret=True)

    def segment_out(h_u, h_i):
        s_u, d_u = h_u @ a_src, h_u @ a_dst
        s_i = h_i @ a_src
        return _attention_direction(
            h_i, _leaky(s_i[ei] + d_u[eu]), _leaky(s_u + d_u), h_u,
            ei, eu, m_u, nu)

    def loss(f):
        return lambda hu, hi: (f(hu, hi) ** 2).sum()

    got, (g_hu, g_hi) = jax.value_and_grad(loss(kernel_out),
                                           argnums=(0, 1))(h_u, h_i)
    want, (w_hu, w_hi) = jax.value_and_grad(loss(segment_out),
                                            argnums=(0, 1))(h_u, h_i)
    # atol covers summation-order noise in the summed per-split partials
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_hu), np.asarray(w_hu),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_hi), np.asarray(w_hi),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('d', [8, 96])
def test_gatv2_direction_multisplit_matches_segment(rng, d):
    """d=8 -> the dhd output packs 16 table rows per 128-lane row;
    d=96 -> 128 % d != 0, the pack=1 (unpacked) branch."""
    op, eu, ei, h_u, h_i = _setup(rng, d=d)
    nu = h_u.shape[0]
    key = jax.random.PRNGKey(12)
    salts, keep, m_u = _masks(eu, ei, key, 0.3)
    a = jnp.asarray(rng.randn(h_u.shape[1]).astype(np.float32))

    def kernel_out(hs_u, hs_i, hd_u, a):
        from textgcn_tpu.ops.pallas_gat import gatv2_direction
        return gatv2_direction(op, 'to_user', hs_i, hs_u, hd_u, a,
                               salts[0], keep, interpret=True)

    def segment_out(hs_u, hs_i, hd_u, a):
        return _attention_direction(
            hs_i, _leaky(hs_i[ei] + hd_u[eu]) @ a,
            _leaky(hs_u + hd_u) @ a, hs_u, ei, eu, m_u, nu)

    hd_u = jnp.asarray(rng.randn(*h_u.shape).astype(np.float32))

    def loss(f):
        return lambda a1, a2, a3, a4: (f(a1, a2, a3, a4) ** 2).sum()

    # a is differentiated too: covers the fused in-kernel da reduction
    got, gk = jax.value_and_grad(loss(kernel_out),
                                 argnums=(0, 1, 2, 3))(h_u, h_i, hd_u, a)
    want, gs = jax.value_and_grad(loss(segment_out),
                                  argnums=(0, 1, 2, 3))(h_u, h_i, hd_u, a)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for a_, b_ in zip(gk, gs):
        b_ = np.asarray(b_)
        # atol scales with the gradient's magnitude: d_a is a global
        # reduction over every edge (|d_a| ~ 1e3 at d=96 on this loss),
        # where a fixed 1e-4 would demand 1e-7 relative agreement —
        # below f32 summation-order noise
        np.testing.assert_allclose(np.asarray(a_), b_, rtol=1e-4,
                                   atol=1e-4 * (1.0 + np.abs(b_).max()))


def test_masked_logit_sentinel_is_bf16_exact():
    """The NEG sentinel travels through one-hot gather MATMULS that run
    bf16 at DEFAULT precision; a non-representable sentinel rounds, and
    sentinel-minus-sentinel then lands at +-1e27 instead of 0 — exp of
    which is inf, and 0*inf NaN'd every real-chip attention fit at 50k
    (round 5).  Pin exact bf16 representability."""
    from textgcn_tpu.ops.pallas_gat import NEG
    assert float(jnp.asarray(NEG, jnp.bfloat16)) == NEG
    assert float(jnp.asarray(NEG, jnp.float32)) == NEG
    # and sentinel arithmetic behaves: exp(0) after an exact round trip
    m_rounded = float(jnp.asarray(NEG, jnp.bfloat16))
    assert float(jnp.exp(jnp.float32(NEG - m_rounded))) == 1.0
