"""Source-sharded, edge-partitioned Pallas SpMM over a device mesh.

The multi-chip propagation path the single-chip kernel scales into — and
the regime that motivates model parallelism: **tables that do not fit one
chip's VMEM budget**.  Source-table rows are sharded over the flattened
mesh; every device owns the contiguous row range
``[k*R, (k+1)*R)`` (``R = n_src / n_devices``) plus exactly the edges whose
source endpoint falls in that range.  Each device runs the tiled one-hot
SpMM kernel (``ops/pallas_spmm.py``) on its edge shard against its local
``R``-row table slice and the partial ``(n_dst, d)`` outputs combine with
one ``psum`` over the mesh (the SpMM "halo exchange" of SURVEY.md §2.3
reduces to an all-reduce because LightGCN layers read the full frontier
anyway).  Per-chip VMEM holds only ``R`` source rows, so the fast kernel
serves tables ``n_devices`` times larger than the single-chip budget.

Implementation: per-device kernel layouts are built host-side from the
source-range edge partition (local source ids are ``src - k*R``), padded
to identical shapes, stacked on a leading device axis, and sharded over
the mesh; ``jax.shard_map`` removes the device axis so each chip sees
exactly the single-chip kernel call on its slice.  The stacked
``src_ids``/``dst_ids`` metadata keeps **global** ids so the in-kernel
hash dropout draws identical per-edge masks in the forward and transpose
directions.  Forward and backward use transpose-layout stacks via
``jax.custom_vjp`` like the single-chip op.

Source-range partitioning can be edge-imbalanced (popular rows); layouts
are padded to the largest shard's group count, so skewed graphs idle the
lighter devices rather than failing.  Requires the table row counts to be
divisible by ``n_devices`` with a per-device range that is a multiple of
128 (the mesh path pads tables to 4096, so any power-of-two mesh up to 32
devices qualifies); ``parallel.mesh.shard_model`` gates on this and falls
back to the GSPMD segment-sum path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops import pallas_spmm as K


class _StackedLayout:
    """Per-device PallasDirection layouts stacked on a device axis.

    Edges are partitioned by **source row range**: device ``k`` gets the
    edges with ``src in [k*R, (k+1)*R)``, with source ids rebased to the
    device-local range.  ``src_ids``/``dst_ids`` stay global for the
    order-independent dropout hash.
    """

    def __init__(self, src, dst, w, n_src: int, n_dst: int, n_dev: int,
                 user_axis: str, src_block: int, dst_block: int):
        self.user_axis = user_axis
        self.n_dst = int(n_dst)
        self.src_block = src_block
        self.dst_block = dst_block
        assert n_src % n_dev == 0, (n_src, n_dev)
        rows_per_dev = n_src // n_dev
        assert rows_per_dev % src_block == 0, (rows_per_dev, src_block)
        self.rows_per_dev = rows_per_dev
        dirs = []
        for i in range(n_dev):
            lo = i * rows_per_dev
            sel = (src >= lo) & (src < lo + rows_per_dev)
            dirs.append(K.PallasDirection(
                src[sel] - lo, dst[sel], w[sel], rows_per_dev, n_dst,
                src_block=src_block, dst_block=dst_block))
        self.n_src_padded = dirs[0].n_src_padded
        self.n_dst_blocks = dirs[0].n_dst_blocks
        self.max_groups = max(d.max_groups for d in dirs)
        max_g = max(d.n_groups for d in dirs)

        def stack(attr, pad_value=0, offsets=None):
            outs = []
            for i, d in enumerate(dirs):
                a = np.asarray(getattr(d, attr))
                if offsets is not None:
                    a = np.where(a >= 0, a + offsets[i], a)
                pad = max_g - a.shape[0]
                if pad:
                    a = np.concatenate(
                        [a, np.full((pad, *a.shape[1:]), pad_value,
                                    a.dtype)])
                outs.append(a)
            return jnp.asarray(np.stack(outs))

        self.packed = stack('packed')
        self.w = stack('w')
        self.dst_ids = stack('dst_ids', -1)
        # rebase device-local source ids back to global for the hash
        self.src_ids = stack(
            'src_ids', -1,
            offsets=[i * rows_per_dev for i in range(n_dev)])
        # chunk_sb is (n_groups*GROUP,); group_ptr is (n_blocks+1,)
        sbs, ptrs = [], []
        for d in dirs:
            sb = np.asarray(d.chunk_sb)
            sbs.append(np.concatenate(
                [sb, np.zeros(max_g * K.GROUP - len(sb), sb.dtype)]))
            ptrs.append(np.asarray(d.group_ptr))
        self.chunk_sb = jnp.asarray(np.stack(sbs))
        self.group_ptr = jnp.asarray(np.stack(ptrs))

    def arrays(self):
        return (self.group_ptr, self.chunk_sb, self.packed, self.w,
                self.dst_ids, self.src_ids)

    # pytree protocol (see ops/spmm.py): layouts pass through jit as
    # arguments, not embedded constants
    def tree_flatten(self):
        return self.arrays(), (self.user_axis, self.n_dst, self.src_block,
                               self.dst_block, self.rows_per_dev,
                               self.n_src_padded, self.n_dst_blocks,
                               self.max_groups)

    @classmethod
    def tree_unflatten(cls, aux, children):
        la = object.__new__(cls)
        (la.user_axis, la.n_dst, la.src_block, la.dst_block,
         la.rows_per_dev, la.n_src_padded, la.n_dst_blocks,
         la.max_groups) = aux
        (la.group_ptr, la.chunk_sb, la.packed, la.w, la.dst_ids,
         la.src_ids) = children
        return la


jax.tree_util.register_pytree_node_class(_StackedLayout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def mesh_graph_spmm(direction: str, op, x, salt, keep):
    """One mesh-sharded propagation direction; op is a pytree argument."""
    layout = op.l_i2u if direction == 'to_user' else op.l_u2i
    return op._apply(layout, x, salt, keep)


def _mgs_fwd(direction, op, x, salt, keep):
    return mesh_graph_spmm(direction, op, x, salt, keep), (op, salt, keep)


def _mgs_bwd(direction, res, g):
    from ..ops.pallas_spmm import _zeros_ct
    op, salt, keep = res
    layout = op.l_u2i if direction == 'to_user' else op.l_i2u
    dx = op._apply(layout, g, salt, keep)
    return (_zeros_ct(op), dx, _zeros_ct(salt), jnp.zeros_like(keep))


mesh_graph_spmm.defvjp(_mgs_fwd, _mgs_bwd)


class MeshPallasGraphOp:
    """Drop-in for ``PallasGraphOp`` running the kernel on source-sharded
    table slices under shard_map with a psum combine.  Same ``weights``/
    ``to_user``/``to_item`` interface."""

    # per-chip VMEM budget for the double-buffered source slice
    VMEM_X_BUDGET = K.TiledSpMM.VMEM_X_BUDGET

    @staticmethod
    def _default_x_dtype():
        # same reasoning as TiledSpMM: DEFAULT matmul precision rounds
        # the table to bf16 inside the kernel anyway, so a bf16 slice is
        # numerically free and doubles the table size the mesh path serves
        return (jnp.bfloat16
                if K.PRECISION == jax.lax.Precision.DEFAULT
                else jnp.float32)

    @classmethod
    def supports(cls, n_users_t: int, n_items_t: int, d: int,
                 n_dev: int, x_dtype=None) -> bool:
        """True when both tables row-shard evenly over ``n_dev`` with a
        per-device slice that is 128-aligned and fits the VMEM budget."""
        itemsize = jnp.dtype(x_dtype or cls._default_x_dtype()).itemsize
        for n in (n_users_t, n_items_t):
            if n % n_dev:
                return False
            rows = n // n_dev
            if rows % 128 or rows * d * itemsize > cls.VMEM_X_BUDGET:
                return False
        return True

    def __init__(self, edge_user, edge_item, edge_weight,
                 n_users_t: int, n_items_t: int, d: int, mesh,
                 interpret: bool = False, x_dtype=None):
        from .mesh import collective_dtype
        self.mesh = mesh
        self.interpret = interpret
        self.x_dtype = jnp.dtype(x_dtype or self._default_x_dtype())
        self.rs_dtype = collective_dtype()
        # model-major flat device order: a P('model')- or
        # P(('model','data'))-sharded table reshards into the kernel's
        # source slice locally, with zero communication (SCALING.md
        # lever 1; mesh axis_names order is (data, model))
        self.axes = tuple(reversed(mesh.axis_names))
        n_dev = mesh.size
        eu = np.asarray(edge_user)
        ei = np.asarray(edge_item)
        w = np.asarray(edge_weight, np.float32)

        rows_i = n_items_t // n_dev
        rows_u = n_users_t // n_dev
        sb_i, db_i = K.plan_tile_blocks(
            max(len(eu) // n_dev, 1), rows_i, n_users_t)
        sb_u, db_u = K.plan_tile_blocks(
            max(len(eu) // n_dev, 1), rows_u, n_items_t)
        while rows_i % sb_i:
            sb_i //= 2
        while rows_u % sb_u:
            sb_u //= 2
        self.l_i2u = _StackedLayout(ei, eu, w, n_items_t, n_users_t,
                                    n_dev, 'dst', sb_i, db_i)
        self.l_u2i = _StackedLayout(eu, ei, w, n_users_t, n_items_t,
                                    n_dev, 'src', sb_u, db_u)

    # one shard_map'd partial-SpMM over the local source slice + psum
    def _apply(self, layout, x, salt, keep):
        axes = self.axes
        interpret = self.interpret
        rs_dtype = self.rs_dtype
        x = x.astype(self.x_dtype)

        def local(ptr, sb, packed, w_base, dst_ids, src_ids, x, salt,
                  keep):
            ptr, sb, packed = ptr[0], sb[0], packed[0]
            w_base, dst_ids, src_ids = w_base[0], dst_ids[0], src_ids[0]
            if layout.user_axis == 'dst':
                users, items = dst_ids, src_ids
            else:
                users, items = src_ids, dst_ids
            scale = K.edge_dropout_scale(users, items, salt, keep)
            w = w_base * scale.reshape(w_base.shape)
            out = K.pallas_spmm(
                ptr, sb, packed, w, x,
                n_dst_blocks=layout.n_dst_blocks,
                max_groups=layout.max_groups,
                src_block=layout.src_block, dst_block=layout.dst_block,
                interpret=interpret)
            # reduce-scatter, not all-reduce: every consumer of the
            # combined output is row-sharded in exactly this layout —
            # the next layer's source slice, the transpose (backward)
            # kernel's input, and the table-gradient's Adam update
            # (SCALING.md lever 1: 1x transfer instead of 2x, and the
            # full-table re-gathers disappear).  bf16 payload by default
            # (parallel.mesh.collective_dtype): halves wire bytes
            res = jax.lax.psum_scatter(
                out[:layout.n_dst].astype(rs_dtype), axes,
                scatter_dimension=0, tiled=True)
            return res.astype(jnp.float32)

        fn = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(self.axes), P(self.axes), P(self.axes),
                      P(self.axes), P(self.axes), P(self.axes),
                      P(self.axes), P(), P()),
            out_specs=P(self.axes),
            check_vma=False)
        return fn(*layout.arrays()[:4], layout.dst_ids, layout.src_ids,
                  x, salt, keep)

    def weights(self, mask_key=None, dropout: float = 0.0):
        """(salt, keep) per direction — shared draw
        (``pallas_spmm.hash_dropout_salts``) so every backend's mask
        stream is identical."""
        from ..ops.pallas_spmm import hash_dropout_salts
        return hash_dropout_salts(mask_key, dropout)

    def to_user(self, item_emb, w_pair):
        salt, keep = w_pair
        return mesh_graph_spmm('to_user', self, item_emb, salt, keep)

    def to_item(self, user_emb, w_pair):
        salt, keep = w_pair
        return mesh_graph_spmm('to_item', self, user_emb, salt, keep)

    def tree_flatten(self):
        return (self.l_i2u, self.l_u2i), (self.mesh, self.interpret,
                                          self.axes, self.x_dtype,
                                          self.rs_dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        op = object.__new__(cls)
        (op.mesh, op.interpret, op.axes, op.x_dtype,
         op.rs_dtype) = aux
        op.l_i2u, op.l_u2i = children
        return op


jax.tree_util.register_pytree_node_class(MeshPallasGraphOp)
