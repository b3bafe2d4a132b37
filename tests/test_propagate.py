"""Propagation vs dense-matmul oracle (reference base_model.py:93-106)."""

import jax
import jax.numpy as jnp
import numpy as np

from textgcn_tpu.data.core import dense_normalized_adjacency
from textgcn_tpu.ops.propagate import (dropout_edge_weights, propagate,
                                       representation)


def _dense_reference(dense_adj, user_emb, item_emb, n_layers, single):
    """Straightforward numpy re-implementation of the reference loop."""
    e = np.concatenate([user_emb, item_emb])
    cache = [e]
    for _ in range(n_layers):
        e = dense_adj @ e
        cache.append(e)
    out = cache[-1] if single else np.mean(np.stack(cache), axis=0)
    n_users = user_emb.shape[0]
    return out[:n_users], out[n_users:]


def test_propagation_matches_dense(dummy_data, rng):
    g = dummy_data.graph
    d = 16
    user_emb = rng.randn(g.n_users, d).astype(np.float32)
    item_emb = rng.randn(g.n_items, d).astype(np.float32)
    dense = dense_normalized_adjacency(g)

    for n_layers in (1, 2, 3):
        for single in (False, True):
            want_u, want_i = _dense_reference(
                dense, user_emb, item_emb, n_layers, single)
            got_u, got_i = propagate(
                jnp.asarray(user_emb), jnp.asarray(item_emb),
                jnp.asarray(g.edge_user), jnp.asarray(g.edge_item),
                jnp.asarray(g.edge_weight), jnp.asarray(g.edge_weight),
                n_layers, single=single)
            np.testing.assert_allclose(got_u, want_u, atol=1e-4)
            np.testing.assert_allclose(got_i, want_i, atol=1e-4)


def test_dropout_rescale_preserves_expectation(dummy_data):
    g = dummy_data.graph
    ew = jnp.asarray(g.edge_weight)
    p = 0.4
    keys = jax.random.split(jax.random.key(0), 200)
    acc = np.zeros_like(g.edge_weight)
    for k in keys:
        w1, _ = dropout_edge_weights(k, ew, p)
        acc += np.asarray(w1)
    acc /= len(keys)
    np.testing.assert_allclose(acc, g.edge_weight, atol=0.05)


def test_dropout_zero_is_identity(dummy_data):
    g = dummy_data.graph
    ew = jnp.asarray(g.edge_weight)
    w1, w2 = dropout_edge_weights(jax.random.key(0), ew, 0.0)
    np.testing.assert_array_equal(np.asarray(w1), g.edge_weight)
    np.testing.assert_array_equal(np.asarray(w2), g.edge_weight)


def _make_op(g, pad_multiple=1):
    from textgcn_tpu.ops.spmm import BipartiteGraphOp
    return BipartiteGraphOp(g.edge_user, g.edge_item, g.edge_weight,
                            g.n_users, g.n_items, pad_multiple=pad_multiple)


def test_representation_eval_deterministic(dummy_data, rng):
    g = dummy_data.graph
    params = {
        'user_emb': jnp.asarray(rng.randn(g.n_users, 8).astype(np.float32)),
        'item_emb': jnp.asarray(rng.randn(g.n_items, 8).astype(np.float32)),
    }
    op = _make_op(g)
    u1, i1 = representation(params, op, 3, single=False)
    u2, i2 = representation(params, op, 3, single=False)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_spmm_op_matches_dense(dummy_data, rng):
    """BipartiteGraphOp representation == dense oracle, incl. padded edges
    and the custom-VJP gradient vs jax-native autodiff."""
    import jax as _jax

    g = dummy_data.graph
    d = 8
    ue = rng.randn(g.n_users, d).astype(np.float32)
    ie = rng.randn(g.n_items, d).astype(np.float32)
    params = {'user_emb': jnp.asarray(ue), 'item_emb': jnp.asarray(ie)}
    dense = dense_normalized_adjacency(g)
    want_u, want_i = _dense_reference(dense, ue, ie, 3, False)

    for pad in (1, 8):
        op = _make_op(g, pad_multiple=pad)
        got_u, got_i = representation(params, op, 3, single=False)
        np.testing.assert_allclose(np.asarray(got_u), want_u, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_i), want_i, atol=1e-4)

    # gradient parity: custom VJP vs differentiating the plain formulation
    op = _make_op(g)

    def loss_op(p):
        u, i = representation(p, op, 2, single=False)
        return (u.sum() + (i * i).sum())

    def loss_plain(p):
        u, i = propagate(
            p['user_emb'], p['item_emb'],
            jnp.asarray(g.edge_user), jnp.asarray(g.edge_item),
            jnp.asarray(g.edge_weight), jnp.asarray(g.edge_weight),
            2, single=False)
        return (u.sum() + (i * i).sum())

    g1 = _jax.grad(loss_op)(params)
    g2 = _jax.grad(loss_plain)(params)
    np.testing.assert_allclose(np.asarray(g1['user_emb']),
                               np.asarray(g2['user_emb']), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1['item_emb']),
                               np.asarray(g2['item_emb']), atol=1e-4)


def test_ops_are_pytree_jit_arguments_not_constants(rng):
    """Graph ops pass through jit as arguments: the lowered program must
    NOT embed the edge/layout arrays as constants (embedding broke remote
    compilation at multi-million-edge scale with HTTP 413)."""
    import jax
    import jax.numpy as jnp

    from textgcn_tpu.ops.pallas_spmm import SRC_BLOCK, PallasGraphOp
    from textgcn_tpu.ops.spmm import BipartiteGraphOp

    n_users, n_items, e = 2000, 1500, 40_000
    eu = rng.randint(0, n_users, e).astype(np.int32)
    ei = rng.randint(0, n_items, e).astype(np.int32)
    w = rng.rand(e).astype(np.float32)
    nu_t = -(-n_users // SRC_BLOCK) * SRC_BLOCK
    ni_t = -(-n_items // SRC_BLOCK) * SRC_BLOCK

    for op in (BipartiteGraphOp(eu, ei, w, nu_t, ni_t),
               PallasGraphOp(eu, ei, w, nu_t, ni_t, 8, interpret=True)):
        def f(x, op):
            pairs = op.weights(None, 0.0)
            return op.to_user(x, pairs[0]).sum()

        x = jnp.zeros((ni_t, 8), jnp.float32)
        txt = jax.jit(f).lower(x, op).as_text()
        # 40k-edge metadata is ~1 MB as text; the program must stay small
        assert len(txt) < 300_000, \
            f'{type(op).__name__}: HLO {len(txt)} bytes — arrays embedded'
        # gradient path too
        gtxt = jax.jit(jax.grad(lambda x, op: f(x, op))).lower(
            x, op).as_text()
        assert len(gtxt) < 400_000, \
            f'{type(op).__name__}: grad HLO {len(gtxt)} bytes'
