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
                                nu_t, ni_t, 8, mesh, interpret=True)
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
                                nu_t, ni_t, 8, mesh, interpret=True)

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
