"""Graph-conv layer variants (reference ``rejected_models.py:7-42``).

The reference's ``TorchGeometric`` class swaps the LightGCN propagation
layer for torch_geometric convs — ``{'gat': GATConv, 'gatv2': GATv2Conv,
'gcn': GCNConv, 'graphsage': SAGEConv, 'lightgcn': LGConv}`` — applied to
the stacked ``[users; items]`` node matrix over the symmetrized edge index,
with mean-of-layers combination and the standard BPR runtime.  The module
is dead code there (torch_geometric is not in its requirements and nothing
imports it); here the same model family is implemented TPU-natively for
inventory completeness.

TPU-first design: no stacked ``(n_users+n_items, d)`` matrix and no
per-edge gather/scatter library — each conv layer is expressed directly on
the bipartite split as two segment-sum/-max passes (items→users and
users→items) over the static edge arrays, which XLA fuses into the same
gather/scale/scatter chains as the LightGCN path.  Attention (GAT/GATv2)
uses a numerically-stable segment softmax: ``segment_max`` for the
per-destination max (self-loop logit included), then masked ``exp`` +
``segment_sum`` — all static shapes, fully jittable.  Because the
reference applies ONE conv (one weight set) to the stacked matrix, user
and item rows share the layer parameters here too.

Edge dropout during training mirrors the reference's
``_dropout_norm_matrix`` (``rejected_models.py:29``): an independent
Bernoulli keep-mask per direction removes edges from the layer — dropped
edges leave GCN/SAGE degree sums and GAT softmax support entirely
(degrees are recomputed in-trace from the mask), and self loops are never
dropped (torch_geometric adds them after dropout).

Parameter shapes follow the torch_geometric layers at one attention head,
``d → d``: GCN = {W, b}; SAGE = {W_nbr, b, W_root} with mean/sum/max
``--aggr``; GAT = {W, a_src, a_dst, b}; GATv2 = {W_src, W_dst, a, b}.
``lightgcn`` (LGConv) is parameter-free and coincides with the existing
``lgcn`` propagation — kept as an equivalence anchor in tests rather than
a registry alias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lightgcn import LightGCN

CONV_TYPES = ('gcn', 'graphsage', 'gat', 'gatv2', 'lightgcn')
NEG_SLOPE = 0.2  # torch_geometric LeakyReLU default for GAT/GATv2


def _glorot(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _leaky(x):
    return jax.nn.leaky_relu(x, NEG_SLOPE)


def init_conv_layer(key, conv: str, d: int) -> dict:
    """One layer's parameters (glorot weights, zero bias)."""
    ks = jax.random.split(key, 4)
    if conv == 'lightgcn':
        return {}
    if conv == 'gcn':
        return {'w': _glorot(ks[0], (d, d)), 'b': jnp.zeros((d,))}
    if conv == 'graphsage':
        return {'w_nbr': _glorot(ks[0], (d, d)),
                'w_root': _glorot(ks[1], (d, d)), 'b': jnp.zeros((d,))}
    if conv == 'gat':
        return {'w': _glorot(ks[0], (d, d)),
                'a_src': _glorot(ks[1], (d, 1))[:, 0],
                'a_dst': _glorot(ks[2], (d, 1))[:, 0],
                'b': jnp.zeros((d,))}
    if conv == 'gatv2':
        return {'w_src': _glorot(ks[0], (d, d)),
                'w_dst': _glorot(ks[1], (d, d)),
                'a': _glorot(ks[2], (d, 1))[:, 0], 'b': jnp.zeros((d,))}
    raise ValueError(f'unknown conv {conv!r}')


def _degrees(mask, seg, num_segments):
    return jax.ops.segment_sum(mask, seg, num_segments=num_segments)


def _gcn_direction(h_src, h_dst, src, dst, mask, deg_src, deg_dst):
    """GCN-normalized aggregation into ``dst`` incl. the self loop:
    ``out_i = sum_j x_j W / sqrt(d̂_i d̂_j) + x_i W / d̂_i`` with
    ``d̂ = surviving in-degree + 1`` (gcn_norm with add_self_loops)."""
    n_dst = h_dst.shape[0]
    d_hat_src = deg_src + 1.0
    d_hat_dst = deg_dst + 1.0
    norm = mask / jnp.sqrt(d_hat_src[src] * d_hat_dst[dst])
    agg = jax.ops.segment_sum(h_src[src] * norm[:, None], dst,
                              num_segments=n_dst)
    return agg + h_dst / d_hat_dst[:, None]


def _sage_direction(x_src, src, dst, mask, deg_dst, n_dst, aggr: str):
    if aggr == 'max':
        msg = jnp.where(mask[:, None] > 0, x_src[src], -jnp.inf)
        agg = jax.ops.segment_max(msg, dst, num_segments=n_dst)
        return jnp.where(jnp.isfinite(agg), agg, 0.0)
    agg = jax.ops.segment_sum(x_src[src] * mask[:, None], dst,
                              num_segments=n_dst)
    if aggr == 'mean':
        agg = agg / jnp.maximum(deg_dst, 1.0)[:, None]
    return agg


def _attention_direction(msg_src, logit_edge, logit_self, msg_self,
                         src, dst, mask, n_dst):
    """Segment softmax over each destination's surviving incoming edges
    plus its (never-dropped) self loop, then weighted aggregation."""
    neg = jnp.float32(-1e30)
    logit_edge = jnp.where(mask > 0, logit_edge, neg)
    m_edge = jax.ops.segment_max(logit_edge, dst, num_segments=n_dst)
    m = jnp.maximum(jnp.where(jnp.isfinite(m_edge), m_edge, neg),
                    logit_self)
    e = jnp.where(mask > 0, jnp.exp(logit_edge - m[dst]), 0.0)
    e_self = jnp.exp(logit_self - m)
    denom = jax.ops.segment_sum(e, dst, num_segments=n_dst) + e_self
    num = jax.ops.segment_sum(msg_src[src] * e[:, None], dst,
                              num_segments=n_dst)
    return (num + msg_self * e_self[:, None]) / denom[:, None]


def conv_layer(layer_params, conv: str, aggr: str, user_x, item_x,
               edge_user, edge_item, mask_to_user, mask_to_item,
               edge_weight):
    """Apply one conv layer in both bipartite directions.

    ``mask_to_user``/``mask_to_item`` are {0,1} edge keep-masks (all ones
    at eval).  Returns (new_user_x, new_item_x).
    """
    n_users, n_items = user_x.shape[0], item_x.shape[0]
    if conv == 'lightgcn':
        # LGConv: symmetric-normalized weighted sum, no self loops — the
        # precomputed 1/sqrt(deg_u deg_i) edge weights, rescaled by
        # 1/(1-p) is NOT applied here (the reference drops edges from the
        # conv's edge_index without rescale), so the mask multiplies raw
        # weights.
        w_u = edge_weight * mask_to_user
        w_i = edge_weight * mask_to_item
        new_u = jax.ops.segment_sum(item_x[edge_item] * w_u[:, None],
                                    edge_user, num_segments=n_users)
        new_i = jax.ops.segment_sum(user_x[edge_user] * w_i[:, None],
                                    edge_item, num_segments=n_items)
        return new_u, new_i

    if conv == 'gcn':
        h_u = user_x @ layer_params['w']
        h_i = item_x @ layer_params['w']
        deg_u = _degrees(mask_to_user, edge_user, n_users)
        deg_i = _degrees(mask_to_item, edge_item, n_items)
        new_u = _gcn_direction(h_i, h_u, edge_item, edge_user,
                               mask_to_user, deg_i, deg_u)
        new_i = _gcn_direction(h_u, h_i, edge_user, edge_item,
                               mask_to_item, deg_u, deg_i)
        return new_u + layer_params['b'], new_i + layer_params['b']

    if conv == 'graphsage':
        deg_u = _degrees(mask_to_user, edge_user, n_users)
        deg_i = _degrees(mask_to_item, edge_item, n_items)
        nbr_u = _sage_direction(item_x, edge_item, edge_user,
                                mask_to_user, deg_u, n_users, aggr)
        nbr_i = _sage_direction(user_x, edge_user, edge_item,
                                mask_to_item, deg_i, n_items, aggr)
        new_u = (nbr_u @ layer_params['w_nbr'] + layer_params['b']
                 + user_x @ layer_params['w_root'])
        new_i = (nbr_i @ layer_params['w_nbr'] + layer_params['b']
                 + item_x @ layer_params['w_root'])
        return new_u, new_i

    if conv == 'gat':
        h_u = user_x @ layer_params['w']
        h_i = item_x @ layer_params['w']
        s_u, d_u = h_u @ layer_params['a_src'], h_u @ layer_params['a_dst']
        s_i, d_i = h_i @ layer_params['a_src'], h_i @ layer_params['a_dst']
        new_u = _attention_direction(
            h_i, _leaky(s_i[edge_item] + d_u[edge_user]),
            _leaky(s_u + d_u), h_u, edge_item, edge_user, mask_to_user,
            n_users)
        new_i = _attention_direction(
            h_u, _leaky(s_u[edge_user] + d_i[edge_item]),
            _leaky(s_i + d_i), h_i, edge_user, edge_item, mask_to_item,
            n_items)
        return new_u + layer_params['b'], new_i + layer_params['b']

    if conv == 'gatv2':
        a = layer_params['a']
        hs_u = user_x @ layer_params['w_src']
        hs_i = item_x @ layer_params['w_src']
        hd_u = user_x @ layer_params['w_dst']
        hd_i = item_x @ layer_params['w_dst']
        new_u = _attention_direction(
            hs_i, _leaky(hs_i[edge_item] + hd_u[edge_user]) @ a,
            _leaky(hs_u + hd_u) @ a, hs_u, edge_item, edge_user,
            mask_to_user, n_users)
        new_i = _attention_direction(
            hs_u, _leaky(hs_u[edge_user] + hd_i[edge_item]) @ a,
            _leaky(hs_i + hd_i) @ a, hs_i, edge_user, edge_item,
            mask_to_item, n_items)
        return new_u + layer_params['b'], new_i + layer_params['b']

    raise ValueError(f'unknown conv {conv!r}')


class ConvModel(LightGCN):
    """LightGCN runtime (BPR loss, eval, checkpointing) with the
    propagation layer swapped for a learnable graph conv
    (reference ``TorchGeometric.representation``,
    ``rejected_models.py:27-39``)."""

    # the cached-propagation decomposition (fresh ego + stale propagated
    # rest) assumes the parameter-free layer-mean combination; conv layers
    # transform the ego term, so the mode is disabled for this family
    supports_cached_propagation = False

    # conv propagation runs on the raw edge arrays, not the SpMM graph op
    # — 'graph_op' is dropped from the captured set so the (expensive)
    # Pallas tile layout is never built for this family
    captured_attrs = ('pos_padded', 'pos_degree', 'conv_edges')

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.conv = cfg.model if cfg.model in CONV_TYPES else 'gcn'
        # explicit aggregator required — no silent default (the reference
        # hard-asserts this at parse time, parser.py:196-197; so does
        # Config.validate, this guards direct construction)
        assert cfg.aggr in ('mean', 'sum', 'max'), \
            f'conv models require an explicit aggregator ' \
            f'(--aggr mean|sum|max), got {cfg.aggr!r}'
        self.aggr = cfg.aggr
        g = data.graph
        self.conv_edges = {
            'edge_user': jnp.asarray(g.edge_user),
            'edge_item': jnp.asarray(g.edge_item),
            'edge_weight': jnp.asarray(g.edge_weight, jnp.float32),
        }

    def init_params(self, key):
        k_tab, k_conv = jax.random.split(key)
        params = super().init_params(k_tab)
        keys = jax.random.split(k_conv, self.n_layers)
        params['convs'] = [init_conv_layer(k, self.conv, self.cfg.emb_size)
                           for k in keys]
        return params

    def representation(self, params, *, training: bool = False,
                       dropout_key=None):
        e = self.conv_edges
        n_edges = e['edge_user'].shape[0]
        ones = jnp.ones((n_edges,), jnp.float32)
        if training and self.dropout > 0.0 and dropout_key is not None:
            keep = 1.0 - self.dropout
            k1, k2 = jax.random.split(dropout_key)
            m_u = jax.random.bernoulli(k1, keep, (n_edges,)).astype(
                jnp.float32)
            m_i = jax.random.bernoulli(k2, keep, (n_edges,)).astype(
                jnp.float32)
        else:
            m_u = m_i = ones
        u, i = params['user_emb'], params['item_emb']
        acc_u, acc_i = u, i
        for layer_params in params['convs']:
            u, i = conv_layer(layer_params, self.conv, self.aggr, u, i,
                              e['edge_user'], e['edge_item'], m_u, m_i,
                              e['edge_weight'])
            acc_u = acc_u + u
            acc_i = acc_i + i
        if self.single:
            return u, i
        inv = 1.0 / (self.n_layers + 1)
        return acc_u * inv, acc_i * inv

    def propagate_rest(self, params, dropout_key=None):  # pragma: no cover
        raise NotImplementedError(
            'cached propagation is unsupported for conv variants')
