"""Pallas tiled one-hot SpMM: correctness vs dense oracle (interpret mode).

The compiled kernel runs on TPU only; these tests exercise the same code
through the Pallas interpreter on the CPU mesh, including the custom-VJP
backward, source splitting, and hash-dropout mask agreement between a
direction and its transpose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textgcn_tpu.ops.pallas_spmm import (SRC_BLOCK, PallasDirection,
                                         PallasGraphOp, TiledSpMM,
                                         edge_dropout_scale)


def _rand_graph(rng, e=3000, ni=700, nu=1300):
    src = rng.randint(0, ni, e).astype(np.int32)
    dst = rng.randint(0, nu, e).astype(np.int32)
    w = rng.rand(e).astype(np.float32)
    return src, dst, w, ni, nu


def test_direction_matches_oracle(rng):
    src, dst, w, ni, nu = _rand_graph(rng)
    op = PallasDirection(src, dst, w, ni, nu)
    x = np.zeros((op.n_src_padded, 64), np.float32)
    x[:ni] = rng.randn(ni, 64)
    out = np.asarray(op(jnp.asarray(x), interpret=True))
    want = np.zeros((nu, 64), np.float32)
    np.add.at(want, dst, x[src] * w[:, None])
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_graph_op_matches_xla_backend(rng, dummy_data):
    """PallasGraphOp (interpret) == BipartiteGraphOp on the dummy graph."""
    from textgcn_tpu.ops.propagate import representation
    from textgcn_tpu.ops.spmm import BipartiteGraphOp

    g = dummy_data.graph
    nu_t = -(-g.n_users // SRC_BLOCK) * SRC_BLOCK
    ni_t = -(-g.n_items // SRC_BLOCK) * SRC_BLOCK
    d = 16
    params = {
        'user_emb': jnp.asarray(
            np.pad(rng.randn(g.n_users, d), ((0, nu_t - g.n_users), (0, 0))
                   ).astype(np.float32)),
        'item_emb': jnp.asarray(
            np.pad(rng.randn(g.n_items, d), ((0, ni_t - g.n_items), (0, 0))
                   ).astype(np.float32)),
    }
    xla_op = BipartiteGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                              nu_t, ni_t)
    pl_op = PallasGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                          nu_t, ni_t, d, interpret=True,
                          x_dtype=jnp.float32)
    u1, i1 = representation(params, xla_op, 3, single=False)
    u2, i2 = representation(params, pl_op, 3, single=False)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-4)


def test_custom_vjp_grad_matches_xla(rng, dummy_data):
    from textgcn_tpu.ops.propagate import representation
    from textgcn_tpu.ops.spmm import BipartiteGraphOp

    g = dummy_data.graph
    nu_t = -(-g.n_users // SRC_BLOCK) * SRC_BLOCK
    ni_t = -(-g.n_items // SRC_BLOCK) * SRC_BLOCK
    d = 8
    params = {
        'user_emb': jnp.asarray(
            np.pad(rng.randn(g.n_users, d), ((0, nu_t - g.n_users), (0, 0))
                   ).astype(np.float32)),
        'item_emb': jnp.asarray(
            np.pad(rng.randn(g.n_items, d), ((0, ni_t - g.n_items), (0, 0))
                   ).astype(np.float32)),
    }
    xla_op = BipartiteGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                              nu_t, ni_t)
    pl_op = PallasGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                          nu_t, ni_t, d, interpret=True,
                          x_dtype=jnp.float32)

    def loss(p, op):
        u, i = representation(p, op, 2, single=False)
        return (u * u).sum() + i.sum()

    g1 = jax.grad(lambda p: loss(p, pl_op))(params)
    g2 = jax.grad(lambda p: loss(p, xla_op))(params)
    np.testing.assert_allclose(np.asarray(g1['user_emb']),
                               np.asarray(g2['user_emb']), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1['item_emb']),
                               np.asarray(g2['item_emb']), atol=1e-4)


def test_source_split_matches_unsplit(rng):
    src, dst, w, ni, nu = _rand_graph(rng, e=4000, ni=1400, nu=900)
    d = 64
    full = TiledSpMM(src, dst, w, -(-ni // SRC_BLOCK) * SRC_BLOCK, nu, d,
                     user_axis='dst', interpret=True)
    split = TiledSpMM(src, dst, w, -(-ni // SRC_BLOCK) * SRC_BLOCK, nu, d,
                      user_axis='dst', interpret=True)
    split.VMEM_X_BUDGET = SRC_BLOCK * d * 4  # force one split per block
    split.__init__(src, dst, w, -(-ni // SRC_BLOCK) * SRC_BLOCK, nu, d,
                   user_axis='dst', interpret=True)
    assert len(split.splits) > 1
    x = jnp.asarray(rng.randn(full.splits[0][2].n_src_padded, d)
                    .astype(np.float32))
    salt = jnp.uint32(7)
    keep = jnp.float32(0.6)
    a = np.asarray(full(x, salt, keep))
    b = np.asarray(split(x, salt, keep))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_hash_dropout_properties():
    users = jnp.arange(200_000, dtype=jnp.int32) % 5000
    items = jnp.arange(200_000, dtype=jnp.int32) * 7 % 3000
    keep = jnp.float32(0.6)
    s1 = edge_dropout_scale(users, items, jnp.uint32(1), keep)
    s1b = edge_dropout_scale(users, items, jnp.uint32(1), keep)
    s2 = edge_dropout_scale(users, items, jnp.uint32(2), keep)
    # deterministic per salt, different across salts
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))
    # keep rate within 1% of target; survivors scaled 1/keep
    frac = float((s1 > 0).mean())
    assert abs(frac - 0.6) < 0.01
    assert np.allclose(np.asarray(s1)[np.asarray(s1) > 0], 1.0 / 0.6,
                       atol=1e-6)
    # keep=1 is the identity
    ones = edge_dropout_scale(users, items, jnp.uint32(0), jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(ones), np.ones(len(users),
                                                            np.float32))


def test_dropout_masks_agree_across_transpose(rng, dummy_data):
    """Forward and backward layouts must drop the same physical edges."""
    g = dummy_data.graph
    nu_t = ni_t = SRC_BLOCK
    op = PallasGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                       nu_t, ni_t, 8, interpret=True)
    salt = jnp.uint32(5)
    keep = jnp.float32(0.5)
    wa = op.l_i2u._dir_weights(op.l_i2u.splits[0][2], salt, keep, 0)
    wb = op.l_u2i._dir_weights(op.l_u2i.splits[0][2], salt, keep, 0)
    # compare per physical edge: collect (u, i) -> weight maps
    def collect(layout, w):
        d = {}
        dirn = layout.splits[0][2]
        dst = np.asarray(dirn.dst_ids).reshape(-1)
        src = np.asarray(dirn.src_ids).reshape(-1)
        wf = np.asarray(w).reshape(-1)
        for a, b, v in zip(dst, src, wf):
            if a >= 0:
                d[(a, b) if layout.user_axis == 'dst' else (b, a)] = v
        return d
    ma = collect(op.l_i2u, wa)
    mb = collect(op.l_u2i, wb)
    assert ma.keys() == mb.keys()
    for k in ma:
        assert ma[k] == pytest.approx(mb[k])


def test_split_shapes_unified_one_kernel_variant(rng):
    """All source splits share identical static/array shapes (one compiled
    kernel variant), including a rebased final split that does not divide
    evenly."""
    src, dst, w, ni, nu = _rand_graph(rng, e=4000, ni=1400, nu=900)
    d = 64
    ni_t = -(-ni // SRC_BLOCK) * SRC_BLOCK   # 1536 rows
    full = TiledSpMM(src, dst, w, ni_t, nu, d, user_axis='dst',
                     interpret=True)
    split = TiledSpMM.__new__(TiledSpMM)
    split.VMEM_X_BUDGET = 2 * SRC_BLOCK * d * 2  # 1024-row windows (bf16)
    split.__init__(src, dst, w, ni_t, nu, d, user_axis='dst',
                   interpret=True)
    assert len(split.splits) == 2
    offs = [off for off, *_ in split.splits]
    lengths = [length for _, length, *_ in split.splits]
    # final split rebased to a full-width window ending at the table edge
    assert lengths == [1024, 1024]
    assert offs == [0, ni_t - 1024]
    shapes = {(d_.packed.shape, d_.max_groups, d_.n_src_padded)
              for _, _, d_ in split.splits}
    assert len(shapes) == 1, shapes

    x = jnp.asarray(rng.randn(ni_t, d).astype(np.float32))
    salt, keep = jnp.uint32(3), jnp.float32(0.5)
    np.testing.assert_allclose(np.asarray(full(x, salt, keep)),
                               np.asarray(split(x, salt, keep)),
                               atol=1e-4)


def test_default_bf16_x_within_tolerance(rng, dummy_data):
    """The production default feeds the kernel a bf16 x (numerically free
    at DEFAULT matmul precision on TPU); outputs stay within bf16
    rounding of the exact f32 path."""
    g = dummy_data.graph
    nu_t = ni_t = SRC_BLOCK
    d = 16
    exact = PallasGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                          nu_t, ni_t, d, interpret=True,
                          x_dtype=jnp.float32)
    dflt = PallasGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                         nu_t, ni_t, d, interpret=True)
    assert dflt.l_i2u.x_dtype == jnp.bfloat16
    x = jnp.asarray(rng.randn(ni_t, d).astype(np.float32))
    wp = dflt.weights()
    a = np.asarray(exact.to_user(x, wp[0]))
    b = np.asarray(dflt.to_user(x, wp[0]))
    scale = np.abs(a).max()
    np.testing.assert_allclose(a, b, atol=0.01 * scale)


def test_xdtype_env_override(rng, monkeypatch):
    """TEXTGCN_TPU_PALLAS_XDTYPE forces the kernel x dtype independently
    of the precision flag (the measurement knob behind the SCALE.md
    x-dtype experiments)."""
    src, dst, w, ni, nu = _rand_graph(rng, e=500, ni=600, nu=400)
    ni_t = -(-ni // SRC_BLOCK) * SRC_BLOCK
    for env, want in (('f32', jnp.float32), ('bf16', jnp.bfloat16)):
        monkeypatch.setenv('TEXTGCN_TPU_PALLAS_XDTYPE', env)
        op = TiledSpMM(src, dst, w, ni_t, nu, 16, user_axis='dst',
                       interpret=True)
        assert op.x_dtype == jnp.dtype(want), (env, op.x_dtype)
