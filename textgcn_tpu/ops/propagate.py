"""K-hop LightGCN propagation over the normalized bipartite graph.

TPU-native reformulation of the reference's square sparse matmul
(``torch.sparse.mm(norm_matrix, emb)`` at reference ``base_model.py:148``).
Because the adjacency is bipartite,

    A_hat = [[0, R], [R^T, 0]],  R[u,i] = 1/sqrt(deg_u * deg_i)

one square SpMM per layer is equivalent to a pair of rectangular ones:

    users_{l+1} = R   @ items_l   (segment-sum over edges into users)
    items_{l+1} = R^T @ users_l   (segment-sum over edges into items)

which is what ``propagate`` computes with ``jax.ops.segment_sum`` over the
edge arrays — static shapes, fully jittable, and XLA fuses the gather /
scale / scatter-add chain.  Edge dropout (reference ``base_model.py:77-86``)
becomes a multiplicative Bernoulli mask on the edge weights with 1/(1-p)
rescale; the two directions get independent masks, matching the reference's
independent dropout of the (u,i) and (i,u) COO entries of the symmetrized
matrix.  Layer combination (mean-of-layers, or last layer under
``--single``) mirrors reference ``base_model.py:150-164``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('n_users', 'n_items'))
def _one_hop(user_emb, item_emb, edge_user, edge_item, w_u2i, w_i2u,
             n_users: int, n_items: int):
    """One propagation hop: returns (new_user_emb, new_item_emb)."""
    # messages flowing item -> user (row block R of A_hat)
    msg_to_user = item_emb[edge_item] * w_i2u[:, None]
    new_user = jax.ops.segment_sum(msg_to_user, edge_user,
                                   num_segments=n_users)
    msg_to_item = user_emb[edge_user] * w_u2i[:, None]
    new_item = jax.ops.segment_sum(msg_to_item, edge_item,
                                   num_segments=n_items)
    return new_user, new_item


def dropout_edge_weights(key, edge_weight, dropout: float):
    """Independent Bernoulli keep-masks for the two edge directions.

    Returns ``(w_u2i, w_i2u)``, each the edge weights with dropped entries
    zeroed and survivors scaled by ``1/(1-p)`` (reference
    ``base_model.py:82-84``).  ``dropout == 0`` returns the weights as-is.
    """
    if dropout <= 0.0:
        return edge_weight, edge_weight
    keep = 1.0 - dropout
    k1, k2 = jax.random.split(key)
    m1 = jax.random.bernoulli(k1, keep, edge_weight.shape)
    m2 = jax.random.bernoulli(k2, keep, edge_weight.shape)
    scale = 1.0 / keep
    return (edge_weight * m1 * scale, edge_weight * m2 * scale)


def propagate(user_emb, item_emb, edge_user, edge_item, w_u2i, w_i2u,
              n_layers: int, *, single: bool = False):
    """K-layer propagation + layer combination.

    Matches reference ``base_model.py:93-106``: keeps the layer-0 embedding
    in the cache, runs ``n_layers`` hops, then combines by the mean over
    layers (or takes the last layer when ``single``).
    """
    n_users = user_emb.shape[0]
    n_items = item_emb.shape[0]
    if single:
        u, i = user_emb, item_emb
        for _ in range(n_layers):
            u, i = _one_hop(u, i, edge_user, edge_item, w_u2i, w_i2u,
                            n_users, n_items)
        return u, i
    acc_u, acc_i = user_emb, item_emb
    u, i = user_emb, item_emb
    for _ in range(n_layers):
        u, i = _one_hop(u, i, edge_user, edge_item, w_u2i, w_i2u,
                        n_users, n_items)
        acc_u = acc_u + u
        acc_i = acc_i + i
    inv = 1.0 / (n_layers + 1)
    return acc_u * inv, acc_i * inv


def propagate_rest(params, graph_op, n_layers: int, *,
                   dropout: float = 0.0, dropout_key=None):
    """The cacheable non-ego part of the layer-mean representation.

    Returns ``(rest_u, rest_i) = (Σ_{l=1..L} u_l, Σ_{l=1..L} i_l)`` — the
    propagated layers WITHOUT the layer-0 (ego) term, so

        representation == ((user_emb + rest_u), (item_emb + rest_i)) / (L+1).

    Cached-propagation training (``--refresh_every N``) recomputes this
    every N steps and keeps the ego term fresh in between: gradients then
    flow through the layer-0 tables only (decoupled propagation, in the
    propagate-then-predict spirit of APPNP/PPRGo), trading the per-step
    SpMM — ~95-99% of the train step at production scale (SCALE.md) — for
    an amortized refresh.  Exact semantics (the reference's, every step
    backpropagates through propagation) remain the default.
    """
    key = dropout_key if dropout > 0.0 else None
    w_to_user, w_to_item = graph_op.weights(key, dropout)
    u, i = params['user_emb'], params['item_emb']
    acc_u = jnp.zeros_like(u)
    acc_i = jnp.zeros_like(i)
    for _ in range(n_layers):
        u, i = (graph_op.to_user(i, w_to_user),
                graph_op.to_item(u, w_to_item))
        acc_u = acc_u + u
        acc_i = acc_i + i
    return acc_u, acc_i


def representation(params, graph_op, n_layers: int, *, single: bool,
                   dropout: float = 0.0, dropout_key=None):
    """Full model representation: propagate embedding tables over the graph.

    ``params``: dict with ``user_emb`` (n_users, d), ``item_emb``
    (n_items, d).  ``graph_op``: a ``spmm.BipartiteGraphOp``.  With
    ``dropout > 0`` and a key, applies edge dropout (training mode,
    reference ``base_model.py:99``).  Layer combination as in
    ``propagate``.
    """
    if single:
        key = dropout_key if dropout > 0.0 else None
        w_to_user, w_to_item = graph_op.weights(key, dropout)
        u, i = params['user_emb'], params['item_emb']
        for _ in range(n_layers):
            u, i = (graph_op.to_user(i, w_to_user),
                    graph_op.to_item(u, w_to_item))
        return u, i
    # expressed as ego + propagate_rest so the cached-propagation identity
    # cached_reprs(params, propagate_rest(params)) == representation holds
    # by construction (no duplicated hop loop to drift apart)
    rest_u, rest_i = propagate_rest(params, graph_op, n_layers,
                                    dropout=dropout,
                                    dropout_key=dropout_key)
    inv = 1.0 / (n_layers + 1)
    return ((params['user_emb'] + rest_u) * inv,
            (params['item_emb'] + rest_i) * inv)
