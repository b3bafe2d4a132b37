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


def test_representation_eval_deterministic(dummy_data, rng):
    g = dummy_data.graph
    params = {
        'user_emb': jnp.asarray(rng.randn(g.n_users, 8).astype(np.float32)),
        'item_emb': jnp.asarray(rng.randn(g.n_items, 8).astype(np.float32)),
    }
    arrays = {'edge_user': jnp.asarray(g.edge_user),
              'edge_item': jnp.asarray(g.edge_item),
              'edge_weight': jnp.asarray(g.edge_weight)}
    u1, i1 = representation(params, arrays, 3, single=False)
    u2, i2 = representation(params, arrays, 3, single=False)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
