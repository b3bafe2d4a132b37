"""Edge-partitioned Pallas SpMM over a device mesh.

The multi-chip propagation path the single-chip kernel scales into: the
edge set is partitioned across all mesh devices, every device runs the
tiled one-hot SpMM kernel (``ops/pallas_spmm.py``) on its shard against a
replicated source table, and partial outputs combine with one ``psum``
over the mesh (the SpMM "halo exchange" of SURVEY.md §2.3 reduces to an
all-reduce because LightGCN layers read the full frontier anyway).

Implementation: per-device kernel layouts are built host-side from the
edge partition, padded to identical shapes, stacked on a leading device
axis, and sharded over the mesh; ``jax.shard_map`` removes the device axis
so each chip sees exactly the single-chip kernel call.  Forward and
backward use transpose-layout stacks via ``jax.custom_vjp`` like the
single-chip op.  Source-table splitting is not supported here (tables must
fit the per-chip VMEM budget); larger tables use the GSPMD segment-sum
path selected by ``parallel.mesh.shard_model``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops import pallas_spmm as K


class _StackedLayout:
    """Per-device PallasDirection layouts stacked on a device axis."""

    def __init__(self, src, dst, w, n_src: int, n_dst: int, n_dev: int,
                 user_axis: str, src_block: int, dst_block: int):
        self.user_axis = user_axis
        self.n_dst = int(n_dst)
        self.src_block = src_block
        self.dst_block = dst_block
        # contiguous edge partition (edges are in canonical order; any
        # partition works — partials psum)
        bounds = np.linspace(0, len(src), n_dev + 1).astype(np.int64)
        dirs = []
        for i in range(n_dev):
            lo, hi = bounds[i], bounds[i + 1]
            dirs.append(K.PallasDirection(
                src[lo:hi], dst[lo:hi], w[lo:hi], n_src, n_dst,
                src_block=src_block, dst_block=dst_block))
        self.n_src_padded = dirs[0].n_src_padded
        self.n_dst_blocks = dirs[0].n_dst_blocks
        self.max_groups = max(d.max_groups for d in dirs)
        max_g = max(d.n_groups for d in dirs)

        def stack(attr, pad_value=0):
            outs = []
            for d in dirs:
                a = np.asarray(getattr(d, attr))
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
        self.src_ids = stack('src_ids', -1)
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


class MeshPallasGraphOp:
    """Drop-in for ``PallasGraphOp`` running the kernel per edge shard
    under shard_map with a psum combine.  Same ``weights``/``to_user``/
    ``to_item`` interface."""

    def __init__(self, edge_user, edge_item, edge_weight,
                 n_users_t: int, n_items_t: int, d: int, mesh,
                 interpret: bool = False):
        self.mesh = mesh
        self.interpret = interpret
        self.axes = tuple(mesh.axis_names)
        n_dev = mesh.size
        eu = np.asarray(edge_user)
        ei = np.asarray(edge_item)
        w = np.asarray(edge_weight, np.float32)

        sb_i, db_i = K.plan_tile_blocks(len(eu), n_items_t, n_users_t)
        sb_u, db_u = K.plan_tile_blocks(len(eu), n_users_t, n_items_t)
        while n_items_t % sb_i:
            sb_i //= 2
        while n_users_t % sb_u:
            sb_u //= 2
        self.l_i2u = _StackedLayout(ei, eu, w, n_items_t, n_users_t,
                                    n_dev, 'dst', sb_i, db_i)
        self.l_u2i = _StackedLayout(eu, ei, w, n_users_t, n_items_t,
                                    n_dev, 'src', sb_u, db_u)

        self._to_user = self._make_fn(self.l_i2u, self.l_u2i)
        self._to_item = self._make_fn(self.l_u2i, self.l_i2u)

    # one shard_map'd partial-SpMM + psum
    def _apply(self, layout, x, salt, keep):
        axes = self.axes
        interpret = self.interpret

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
            return jax.lax.psum(out[:layout.n_dst], axes)

        fn = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(self.axes), P(self.axes), P(self.axes),
                      P(self.axes), P(self.axes), P(self.axes),
                      P(), P(), P()),
            out_specs=P(),
            check_vma=False)
        return fn(*layout.arrays()[:4], layout.dst_ids, layout.src_ids,
                  x, salt, keep)

    def _make_fn(self, fwd_layout, bwd_layout):
        apply = self._apply

        @jax.custom_vjp
        def f(x, salt, keep):
            return apply(fwd_layout, x, salt, keep)

        def fwd(x, salt, keep):
            return f(x, salt, keep), (salt, keep)

        def bwd(res, g):
            salt, keep = res
            return (apply(bwd_layout, g, salt, keep), None, None)

        f.defvjp(fwd, bwd)
        return f

    def weights(self, mask_key=None, dropout: float = 0.0):
        if dropout <= 0.0 or mask_key is None:
            zero = jnp.uint32(0)
            one = jnp.float32(1.0)
            return (zero, one), (zero, one)
        salts = jax.random.bits(mask_key, (2,), jnp.uint32)
        keep = jnp.float32(1.0 - dropout)
        return (salts[0], keep), (salts[1], keep)

    def to_user(self, item_emb, w_pair):
        salt, keep = w_pair
        return self._to_user(item_emb, salt, keep)

    def to_item(self, user_emb, w_pair):
        salt, keep = w_pair
        return self._to_item(user_emb, salt, keep)
