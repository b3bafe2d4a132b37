"""Explicit-collective mesh propagation: segment-sum + reduce-scatter.

This is SCALING.md lever 1 made real.  Under pure GSPMD, the
edge-partitioned SpMM's partial sums come back as full-table
**all-reduces** (2x transfer) even though every consumer — the next
propagation layer's source slice, and ultimately the row-sharded Adam
update — only needs each device's own row range.  GSPMD *can* split
AR into reduce-scatter + all-gather, but the pass is backend-dependent
and unauditable; here the collective is written down explicitly:

* edges are partitioned by **source row range** over the flattened mesh
  in model-major order (device ``(di, mi)`` owns range index
  ``mi * n_data + di``), so a table sharded ``P('model')`` or
  ``P(('model','data'))`` reshards into the kernel as a **local slice**
  — zero communication;
* each device runs one sorted ``segment_sum`` over its edge shard
  against its local source rows (the single-chip formulation of
  ``ops/spmm.py``);
* the partial ``(n_dst, d)`` outputs combine with one
  ``jax.lax.psum_scatter`` (HLO ``reduce-scatter``, 1x transfer) —
  leaving the result **row-sharded exactly like its consumers want**:
  the next layer reads source slices, and the backward chain feeds the
  row-sharded table gradient straight into the sharded optimizer.

Per 3-layer train step the propagation collectives drop from
6 full-table all-reduces + 4 full-table all-gathers (GSPMD) to
6 reduce-scatters and nothing else — measured in
``tools/collective_audit.py`` and regression-guarded in
``tests/test_collective_audit.py``.

Forward/backward use transpose partitions via ``jax.custom_vjp`` like
the single-chip op; edge dropout is the order-independent (user, item,
salt) hash of ``ops/pallas_spmm.edge_dropout_scale`` so both directions
see one mask without permutation gathers.  Replaces the reference's
single-device ``torch.sparse.mm`` (``base_model.py:148``) at mesh scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.pallas_spmm import _zeros_ct, edge_dropout_scale
from .mesh import DATA_AXIS, MODEL_AXIS


class _SegPartition:
    """One direction's edges, partitioned by source row range and stacked
    on a leading device axis (model-major flat order).

    Per device: source ids rebased to the local ``[0, R)`` range,
    destination-sorted for the fast ``indices_are_sorted`` segment-sum,
    padded to the largest shard with zero-weight self-edges (dst id
    ``n_dst - 1`` keeps the sort order).  Global (user, item) ids ride
    along for the dropout hash.
    """

    def __init__(self, src, dst, w, users, items, n_src: int, n_dst: int,
                 n_dev: int):
        assert n_src % n_dev == 0 and n_dst % n_dev == 0, \
            (n_src, n_dst, n_dev)
        self.n_src = int(n_src)
        self.n_dst = int(n_dst)
        rows = n_src // n_dev
        shards = []
        for k in range(n_dev):
            lo = k * rows
            sel = (src >= lo) & (src < lo + rows)
            order = np.argsort(dst[sel], kind='stable')
            shards.append((src[sel][order] - lo, dst[sel][order],
                           w[sel][order], users[sel][order],
                           items[sel][order]))
        cap = max(max(len(s[0]) for s in shards), 1)

        def stack(idx, pad):
            cols = []
            for s in shards:
                a = np.asarray(s[idx])
                fill = np.full(cap - len(a), pad, a.dtype)
                cols.append(np.concatenate([a, fill]))
            return jnp.asarray(np.stack(cols))

        self.src_loc = stack(0, 0).astype(jnp.int32)
        self.dst = stack(1, n_dst - 1).astype(jnp.int32)
        self.w = stack(2, 0.0).astype(jnp.float32)
        self.users = stack(3, 0).astype(jnp.int32)
        self.items = stack(4, 0).astype(jnp.int32)

    def arrays(self):
        return (self.src_loc, self.dst, self.w, self.users, self.items)

    def tree_flatten(self):
        return self.arrays(), (self.n_src, self.n_dst)

    @classmethod
    def tree_unflatten(cls, aux, children):
        p = object.__new__(cls)
        p.n_src, p.n_dst = aux
        (p.src_loc, p.dst, p.w, p.users, p.items) = children
        return p


jax.tree_util.register_pytree_node_class(_SegPartition)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def mesh_seg_spmm(direction: str, op, x, salt, keep):
    part = op.p_i2u if direction == 'to_user' else op.p_u2i
    return op._apply(part, x, salt, keep)


def _mss_fwd(direction, op, x, salt, keep):
    return mesh_seg_spmm(direction, op, x, salt, keep), (op, salt, keep)


def _mss_bwd(direction, res, g):
    op, salt, keep = res
    # transpose product: the other direction's partition — whose source
    # sharding is exactly the row-sharding the forward just scattered g
    # into, so the backward chain moves only its own reduce-scatters
    part = op.p_u2i if direction == 'to_user' else op.p_i2u
    dx = op._apply(part, g, salt, keep)
    return (_zeros_ct(op), dx, _zeros_ct(salt), jnp.zeros_like(keep))


mesh_seg_spmm.defvjp(_mss_fwd, _mss_bwd)


class MeshXlaGraphOp:
    """Drop-in for ``BipartiteGraphOp`` on a mesh with explicit
    collectives (reduce-scatter instead of GSPMD's all-reduce).  Same
    ``weights``/``to_user``/``to_item`` interface."""

    @staticmethod
    def supports(n_users_t: int, n_items_t: int, n_dev: int) -> bool:
        return n_users_t % n_dev == 0 and n_items_t % n_dev == 0

    def __init__(self, edge_user, edge_item, edge_weight,
                 n_users_t: int, n_items_t: int, mesh):
        from .mesh import collective_dtype
        self.mesh = mesh
        self.rs_dtype = collective_dtype()
        # model-major flat order: a P(('model','data')) or P('model')
        # sharded operand reshards into the kernel as a local slice
        self.axes = (MODEL_AXIS, DATA_AXIS)
        eu = np.asarray(edge_user)
        ei = np.asarray(edge_item)
        w = np.asarray(edge_weight, np.float32)
        n_dev = mesh.size
        self.p_i2u = _SegPartition(ei, eu, w, eu, ei, n_items_t,
                                   n_users_t, n_dev)
        self.p_u2i = _SegPartition(eu, ei, w, eu, ei, n_users_t,
                                   n_items_t, n_dev)

    def _apply(self, part, x, salt, keep):
        axes = self.axes
        n_dst = part.n_dst
        rs_dtype = self.rs_dtype

        def local(src_loc, dst, w, users, items, x, salt, keep):
            src_loc, dst, w = src_loc[0], dst[0], w[0]
            users, items = users[0], items[0]
            scale = edge_dropout_scale(users, items, salt, keep)
            vals = x[src_loc] * (w * scale)[:, None]
            partial = jax.ops.segment_sum(vals, dst, num_segments=n_dst,
                                          indices_are_sorted=True)
            # bf16 payload by default (parallel.mesh.collective_dtype):
            # halves wire bytes; local partial sums stay f32
            out = jax.lax.psum_scatter(partial.astype(rs_dtype), axes,
                                       scatter_dimension=0, tiled=True)
            return out.astype(jnp.float32)

        fn = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(axes), P(axes), P(axes), P(axes), P(axes),
                      P(axes), P(), P()),
            out_specs=P(axes),
            check_vma=False)
        return fn(*part.arrays(), x, salt, keep)

    def weights(self, mask_key=None, dropout: float = 0.0):
        """(salt, keep) per direction — shared draw
        (``pallas_spmm.hash_dropout_salts``) so every backend's mask
        stream is identical."""
        from ..ops.pallas_spmm import hash_dropout_salts
        return hash_dropout_salts(mask_key, dropout)

    def to_user(self, item_emb, w_pair):
        salt, keep = w_pair
        return mesh_seg_spmm('to_user', self, item_emb, salt, keep)

    def to_item(self, user_emb, w_pair):
        salt, keep = w_pair
        return mesh_seg_spmm('to_item', self, user_emb, salt, keep)

    def tree_flatten(self):
        return (self.p_i2u, self.p_u2i), (self.mesh, self.axes,
                                          self.rs_dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        op = object.__new__(cls)
        op.mesh, op.axes, op.rs_dtype = aux
        op.p_i2u, op.p_u2i = children
        return op


jax.tree_util.register_pytree_node_class(MeshXlaGraphOp)
