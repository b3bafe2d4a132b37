"""Edge-partitioned Pallas SpMM under shard_map (interpret mode, CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textgcn_tpu.ops.propagate import representation
from textgcn_tpu.ops.spmm import BipartiteGraphOp
from textgcn_tpu.parallel.mesh import make_mesh
from textgcn_tpu.parallel.pallas_sharded import MeshPallasGraphOp

SRC_BLOCK = 512


@pytest.fixture(scope='module')
def mesh():
    return make_mesh((4, 2))


def _padded_tables(g, rng, d=8):
    nu_t = -(-g.n_users // SRC_BLOCK) * SRC_BLOCK
    ni_t = -(-g.n_items // SRC_BLOCK) * SRC_BLOCK
    params = {
        'user_emb': jnp.asarray(
            np.pad(rng.randn(g.n_users, d),
                   ((0, nu_t - g.n_users), (0, 0))).astype(np.float32)),
        'item_emb': jnp.asarray(
            np.pad(rng.randn(g.n_items, d),
                   ((0, ni_t - g.n_items), (0, 0))).astype(np.float32)),
    }
    return params, nu_t, ni_t


def test_mesh_pallas_matches_xla(mesh, dummy_data, rng):
    g = dummy_data.graph
    params, nu_t, ni_t = _padded_tables(g, rng)
    xla_op = BipartiteGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                              nu_t, ni_t)
    mesh_op = MeshPallasGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                                nu_t, ni_t, 8, mesh, interpret=True,
                                x_dtype=jnp.float32)
    u1, i1 = representation(params, xla_op, 3, single=False)
    u2, i2 = representation(params, mesh_op, 3, single=False)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(i1), atol=1e-4)


def test_mesh_pallas_grads_match(mesh, dummy_data, rng):
    g = dummy_data.graph
    params, nu_t, ni_t = _padded_tables(g, rng)
    xla_op = BipartiteGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                              nu_t, ni_t)
    mesh_op = MeshPallasGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                                nu_t, ni_t, 8, mesh, interpret=True,
                                x_dtype=jnp.float32)

    def loss(p, op):
        u, i = representation(p, op, 2, single=False)
        return (u * u).sum() + i.sum()

    g1 = jax.grad(lambda p: loss(p, xla_op))(params)
    g2 = jax.grad(lambda p: loss(p, mesh_op))(params)
    np.testing.assert_allclose(np.asarray(g2['user_emb']),
                               np.asarray(g1['user_emb']), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2['item_emb']),
                               np.asarray(g1['item_emb']), atol=1e-4)


def test_mesh_pallas_dropout_deterministic_and_nontrivial(mesh, dummy_data,
                                                          rng):
    """Same key -> identical dropped propagation; dropout changes values.

    (Mask statistics are covered cheaply in test_pallas_spmm; interpret
    mode under shard_map is too slow for an expectation sweep.)"""
    g = dummy_data.graph
    params, nu_t, ni_t = _padded_tables(g, rng)
    mesh_op = MeshPallasGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                                nu_t, ni_t, 8, mesh, interpret=True)
    base_u, _ = representation(params, mesh_op, 1, single=True)
    u1, _ = representation(params, mesh_op, 1, single=True, dropout=0.3,
                           dropout_key=jax.random.key(7))
    u2, _ = representation(params, mesh_op, 1, single=True, dropout=0.3,
                           dropout_key=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    assert not np.allclose(np.asarray(u1), np.asarray(base_u))


def test_supports_tables_beyond_single_chip_vmem():
    """The flagship scaling scenario (VERDICT r1): tables too big for one
    chip's VMEM budget still take the pallas path, because each device
    holds only its 1/n_devices source slice."""
    d = 64
    budget = MeshPallasGraphOp.VMEM_X_BUDGET
    n = 8 * 4096 * 2  # 65536 rows x 64 x 4B = 16 MB >> 6 MB budget
    assert n * d * 4 > budget
    assert MeshPallasGraphOp.supports(n, n, d, 8)
    # per-device slice must still fit: 8x the budget per chip does not
    assert not MeshPallasGraphOp.supports(8 * n * 8, n, d, 8)
    # indivisible or misaligned row counts fall back
    assert not MeshPallasGraphOp.supports(4096 + 512, 4096, d, 8)
    assert not MeshPallasGraphOp.supports(8 * 320, 4096, d, 8)


def test_mesh_default_bf16_x_within_tolerance(mesh, dummy_data, rng):
    """The mesh path inherits TiledSpMM's default: a bf16 source slice
    (numerically free at DEFAULT matmul precision, halves per-chip VMEM
    so the mesh serves tables 2x larger); outputs stay within bf16
    rounding of the exact f32 path."""
    g = dummy_data.graph
    params, nu_t, ni_t = _padded_tables(g, rng)
    exact = MeshPallasGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                              nu_t, ni_t, 8, mesh, interpret=True,
                              x_dtype=jnp.float32)
    dflt = MeshPallasGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                             nu_t, ni_t, 8, mesh, interpret=True)
    assert dflt.x_dtype == jnp.bfloat16
    wp = dflt.weights()
    a = np.asarray(exact.to_user(params['item_emb'], wp[0]))
    b = np.asarray(dflt.to_user(params['item_emb'], wp[0]))
    scale = np.abs(a).max()
    np.testing.assert_allclose(a, b, atol=0.01 * scale)
    # bf16 slices double the table size the mesh path admits
    d = 64
    budget = MeshPallasGraphOp.VMEM_X_BUDGET
    rows = budget // (d * 4) // 128 * 128 * 2       # 2x the f32 limit
    assert MeshPallasGraphOp.supports(rows * 8, rows * 8, d, 8)
    assert not MeshPallasGraphOp.supports(rows * 8, rows * 8, d, 8,
                                          x_dtype=jnp.float32)


def test_mesh_pallas_sharded_source_larger_graph(mesh, rng):
    """Source-sharded partitioning on a graph spanning several source
    blocks per device, with skewed edge distribution: fwd + grad match the
    XLA path."""
    n_users, n_items, n_edges = 900, 1400, 4000
    nu_t = -(-n_users // SRC_BLOCK) * SRC_BLOCK      # 1024
    ni_t = -(-n_items // SRC_BLOCK) * SRC_BLOCK      # 1536
    # skew: half the edges land on the first 5% of items
    eu = rng.randint(0, n_users, n_edges).astype(np.int32)
    hot = rng.randint(0, n_items // 20, n_edges // 2)
    cold = rng.randint(0, n_items, n_edges - n_edges // 2)
    ei = np.concatenate([hot, cold]).astype(np.int32)
    pairs = np.unique(np.stack([eu, ei], 1), axis=0)
    eu, ei = pairs[:, 0], pairs[:, 1]
    w = rng.rand(len(eu)).astype(np.float32)

    params = {
        'user_emb': jnp.asarray(
            np.pad(rng.randn(n_users, 8),
                   ((0, nu_t - n_users), (0, 0))).astype(np.float32)),
        'item_emb': jnp.asarray(
            np.pad(rng.randn(n_items, 8),
                   ((0, ni_t - n_items), (0, 0))).astype(np.float32)),
    }
    xla_op = BipartiteGraphOp(eu, ei, w, nu_t, ni_t)
    mesh_op = MeshPallasGraphOp(eu, ei, w, nu_t, ni_t, 8, mesh,
                                interpret=True, x_dtype=jnp.float32)
    # every device holds only its slice of the source rows
    assert mesh_op.l_u2i.rows_per_dev == nu_t // 8
    assert mesh_op.l_i2u.rows_per_dev == ni_t // 8

    u1, i1 = representation(params, xla_op, 2, single=False)
    u2, i2 = representation(params, mesh_op, 2, single=False)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(i1), atol=1e-4)

    def loss(p, op):
        u, i = representation(p, op, 2, single=False)
        return (u * u).sum() + (i * i).sum()

    g1 = jax.grad(lambda p: loss(p, xla_op))(params)
    g2 = jax.grad(lambda p: loss(p, mesh_op))(params)
    np.testing.assert_allclose(np.asarray(g2['user_emb']),
                               np.asarray(g1['user_emb']), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2['item_emb']),
                               np.asarray(g1['item_emb']), atol=1e-4)
