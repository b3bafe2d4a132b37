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

On TPU the GCN/GraphSAGE(mean|sum) aggregations ride the same tiled
one-hot MXU kernel as the flagship propagation (``ops/pallas_spmm``):
their degree normalizations are separable — ``D̂_dst^{-1/2} A D̂_src^{-1/2}``
is two table-row scalings around an *unweighted* masked SpMM — so one
unit-weight ``PallasGraphOp`` serves every layer, with edge dropout as the
kernel's fused (user, item, salt) hash mask and the mask-dependent degrees
as sorted scalar segment-sums over precomputed edge orderings.
GAT/GATv2 run the block-sparse softmax-attention pipeline over the same
tile layout (``ops/pallas_gat``: fused online-softmax forward +
hand-derived one-pass VJP; measured 4.3-4.4x the segment path at the
bench shape).  The segment-op formulation above remains the
oracle-tested fallback (CPU, ``aggr='max'``, and the mesh path).

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

import os

import jax
import jax.numpy as jnp
import numpy as np

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

    # cached propagation is OFF for this family as a measured decision
    # (SCALE.md "Cached propagation and the conv family"): fresh-ego +
    # stale-rest gives every conv parameter exactly zero gradient
    # (test_cached_propagation.py pins it), and the stale-attention
    # alternative's Amdahl ceiling is ~3x for an E-sized alpha carry +
    # attention vectors training on 1/N of steps — vs 10-12x for lgcn
    supports_cached_propagation = False

    # conv propagation runs on the raw edge arrays (or its own unit-weight
    # kernel op on TPU), not the lgcn SpMM graph op — 'graph_op' is dropped
    # from the captured set so that tile layout is never built for this
    # family; 'conv_op' is the family's own kernel layout (None on the
    # segment-op path)
    captured_attrs = ('pos_padded', 'pos_degree', 'conv_edges', 'conv_op')

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
        self._conv_op = None
        if self.backend != 'xla':
            # item-sorted (user, item) copy for the mask-dependent item
            # degrees: scalar segment-sums take XLA's fast sorted path
            # (edge_user order is already user-sorted from the data layer,
            # data/core.py:233)
            order_i = np.lexsort((g.edge_user, g.edge_item))
            self.conv_edges['eu_by_i'] = jnp.asarray(g.edge_user[order_i])
            self.conv_edges['ei_by_i'] = jnp.asarray(g.edge_item[order_i])

    def _use_kernel(self) -> bool:
        """GCN / GraphSAGE(mean|sum) aggregate through the tiled one-hot
        MXU kernel; GAT and GATv2 run the block-sparse softmax-attention
        kernels (``ops/pallas_gat``: fused online-softmax forward +
        hand-derived one-pass VJP).  Max-aggregation SAGE (not a matmul)
        keeps the segment-op path."""
        return (self.backend in ('pallas', 'pallas_interpret')
                and (self.conv in ('gcn', 'gat', 'gatv2')
                     or (self.conv == 'graphsage' and self.aggr != 'max')))

    @property
    def conv_op(self):
        """Unit-weight kernel layout over the padded tables (lazy — the
        host tile pack is skipped entirely on the segment-op path)."""
        if self._conv_op is None and self._use_kernel():
            with jax.ensure_compile_time_eval():
                from ..ops.pallas_spmm import PallasGraphOp
                eu, ei, _ = self._edges
                ones = np.ones(len(np.asarray(eu)), np.float32)
                # the attention kernels hold up to two full-slice d-dim
                # tables per split (hd + g_num in GATv2's backward), so
                # they budget less VMEM per split than the SpMM's 6 MB:
                # GAT 3 MB, GATv2 2 MB (its bwd_src ran 844 KB over the
                # 16 MB scoped-VMEM limit at 3 MB on the planner's
                # sparse-regime S2 blocks).  Planner tile blocks are kept:
                # capping them at (512, 512) fits VMEM too but costs 1.7x
                # at S2, where the bigger blocks halve tile padding
                # (tools/conv_scale_lab.py, SCALE.md "Conv family").
                attention = self.conv in ('gat', 'gatv2')
                budget = None
                block = os.environ.get('TEXTGCN_TPU_ATT_BLOCK')
                block = int(block) if block else None
                if attention:
                    default = (2 if self.conv == 'gatv2' else 3) * 2**20
                    budget = int(os.environ.get('TEXTGCN_TPU_ATT_BUDGET',
                                                default))
                self._conv_op = PallasGraphOp(
                    eu, ei, ones, self.n_users_t, self.n_items_t,
                    self.cfg.emb_size,
                    interpret=self.backend == 'pallas_interpret',
                    vmem_budget=budget, src_block=block, dst_block=block)
        return self._conv_op

    @conv_op.setter
    def conv_op(self, op):
        self._conv_op = op

    def init_params(self, key):
        k_tab, k_conv = jax.random.split(key)
        params = super().init_params(k_tab)
        keys = jax.random.split(k_conv, self.n_layers)
        params['convs'] = [init_conv_layer(k, self.conv, self.cfg.emb_size)
                           for k in keys]
        return params

    def _layer_combine(self, params, step):
        """Run ``step(lp, u, i) -> (u, i)`` per conv layer and apply the
        shared combination (mean of layers, or last layer with
        ``--single``) — ONE implementation for the segment, SpMM-kernel
        and attention-kernel paths so the rule can never diverge between
        them."""
        u, i = params['user_emb'], params['item_emb']
        acc_u, acc_i = u, i
        for lp in params['convs']:
            u, i = step(lp, u, i)
            acc_u = acc_u + u
            acc_i = acc_i + i
        if self.single:
            return u, i
        inv = 1.0 / (self.n_layers + 1)
        return acc_u * inv, acc_i * inv

    def representation(self, params, *, training: bool = False,
                       dropout_key=None):
        if self._use_kernel():
            return self._kernel_representation(params, training,
                                               dropout_key)
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

        def step(lp, u, i):
            return conv_layer(lp, self.conv, self.aggr, u, i,
                              e['edge_user'], e['edge_item'], m_u, m_i,
                              e['edge_weight'])

        return self._layer_combine(params, step)

    def _kernel_representation(self, params, training, dropout_key):
        """GCN / GraphSAGE(mean|sum) propagation on the tiled one-hot MXU
        kernel (``ops/pallas_spmm``), exploiting that both convs'
        normalizations are separable row scalings around an unweighted
        masked sum:

        * GCN:  ``agg_dst = D̂_dst^{-1/2} ⊙ Σ_mask(D̂_src^{-1/2} ⊙ h_src)``
          with ``D̂ = surviving degree + 1`` and the self loop added as a
          table term — exactly ``_gcn_direction`` refactored so the sum is
          a unit-weight SpMM.
        * SAGE: neighbor sums, divided by surviving degree for 'mean'.

        Edge dropout is the kernel's fused (user, item, salt) hash mask —
        the same Bernoulli(keep) law as the segment path's explicit masks,
        just a different (order-independent) stream.  The kernel applies
        ``mask/keep`` per edge; conv semantics drop edges WITHOUT the
        1/keep rescale (torch_geometric drops entries from edge_index), so
        kernel outputs are scaled back by ``keep``.  Degrees are computed
        from the identical hash on sorted edge copies (sorted scalar
        segment-sums), so they count exactly the kernel's surviving edges.
        """
        e = self.conv_edges
        op = self.conv_op
        p = self.dropout if (training and dropout_key is not None) else 0.0
        (salt_u, keep), (salt_i, _) = op.weights(
            dropout_key if p > 0.0 else None, p)
        from ..ops.pallas_spmm import edge_dropout_scale

        def mask01(eu, ei, salt):
            return (edge_dropout_scale(eu, ei, salt, keep)
                    > 0.0).astype(jnp.float32)

        interpret = self.backend == 'pallas_interpret'
        if self.conv in ('gat', 'gatv2'):
            from ..ops.pallas_gat import gat_direction, gatv2_direction

            def step(lp, u, i):
                if self.conv == 'gat':
                    h_u, h_i = u @ lp['w'], i @ lp['w']
                    s_u, d_u = h_u @ lp['a_src'], h_u @ lp['a_dst']
                    s_i, d_i = h_i @ lp['a_src'], h_i @ lp['a_dst']
                    return (gat_direction(op, 'to_user', h_i, h_u, s_i,
                                          s_u, d_u, salt_u, keep,
                                          interpret=interpret) + lp['b'],
                            gat_direction(op, 'to_item', h_u, h_i, s_u,
                                          s_i, d_i, salt_i, keep,
                                          interpret=interpret) + lp['b'])
                hs_u, hs_i = u @ lp['w_src'], i @ lp['w_src']
                hd_u, hd_i = u @ lp['w_dst'], i @ lp['w_dst']
                return (gatv2_direction(op, 'to_user', hs_i, hs_u, hd_u,
                                        lp['a'], salt_u, keep,
                                        interpret=interpret) + lp['b'],
                        gatv2_direction(op, 'to_item', hs_u, hs_i, hd_i,
                                        lp['a'], salt_i, keep,
                                        interpret=interpret) + lp['b'])

            return self._layer_combine(params, step)

        # surviving degrees under each direction's mask (user-sorted
        # canonical order for users, item-sorted copy for items)
        deg_u = jax.ops.segment_sum(
            mask01(e['edge_user'], e['edge_item'], salt_u),
            e['edge_user'], num_segments=self.n_users_t,
            indices_are_sorted=True)
        deg_i = jax.ops.segment_sum(
            mask01(e['eu_by_i'], e['ei_by_i'], salt_i),
            e['ei_by_i'], num_segments=self.n_items_t,
            indices_are_sorted=True)

        def ksum_to_user(x):   # Σ over surviving edges, no 1/keep rescale
            return op.to_user(x, (salt_u, keep)) * keep

        def ksum_to_item(x):
            return op.to_item(x, (salt_i, keep)) * keep

        if self.conv == 'gcn':
            dhu, dhi = deg_u + 1.0, deg_i + 1.0
            ru = jax.lax.rsqrt(dhu)[:, None]
            ri = jax.lax.rsqrt(dhi)[:, None]

            def step(lp, u, i):
                h_u, h_i = u @ lp['w'], i @ lp['w']
                return (ru * ksum_to_user(h_i * ri) + h_u * (ru * ru)
                        + lp['b'],
                        ri * ksum_to_item(h_u * ru) + h_i * (ri * ri)
                        + lp['b'])
        else:   # graphsage mean|sum
            du = jnp.maximum(deg_u, 1.0)[:, None]
            di = jnp.maximum(deg_i, 1.0)[:, None]

            def step(lp, u, i):
                nbr_u = ksum_to_user(i)
                nbr_i = ksum_to_item(u)
                if self.aggr == 'mean':
                    nbr_u = nbr_u / du
                    nbr_i = nbr_i / di
                return (nbr_u @ lp['w_nbr'] + lp['b'] + u @ lp['w_root'],
                        nbr_i @ lp['w_nbr'] + lp['b'] + i @ lp['w_root'])

        return self._layer_combine(params, step)

    def propagate_rest(self, params, dropout_key=None):  # pragma: no cover
        raise NotImplementedError(
            'cached propagation is unsupported for conv variants — '
            'measured decision, SCALE.md "Cached propagation and the '
            'conv family"')
