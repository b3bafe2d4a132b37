"""Pallas TPU kernel for the bipartite SpMM (LightGCN propagation).

Why a kernel: XLA lowers the gather/scatter pair of the segment-sum
formulation to latency-bound per-row HBM accesses (~6-10 ms per direction
for 600k x 64 edges on v5e — a few % of HBM peak; measured).  Mosaic also
cannot vectorize per-edge dynamic indexing.  This kernel reformulates SpMM
as **dense one-hot matmuls on the MXU** over sparse tiles:

1. Host-side, edges are sorted into (dst_block x src_block) tiles
   (512 x 512), padded per tile to chunks of 128 edges, and chunks are
   padded per dst block into groups of 8 (one (8, 128) metadata tile per
   DMA — per-chunk 512-byte DMAs were the first bottleneck).
2. Per chunk, a (128 x 512) one-hot of the source-local ids *gathers* the
   chunk's source rows as an MXU matmul ``C = S_src @ X_block``; the whole
   group is then *scattered* by ONE merged (512 x 1024) one-hot matmul
   ``out += S_dst @ concat(C_j * w_j)`` (fewer, larger MXU ops).
3. The grid is (dst_block, group_slot); ragged group counts per dst block
   are handled with scalar-prefetched group pointers driving the
   index_maps (the canonical block-sparse Pallas pattern), and the output
   tile accumulates in VMEM across the group_slot grid dimension.

Per-edge cost is (SRC_BLOCK + DST_BLOCK) * d * 2 FLOPs of dense MXU work —
~130 kFLOP at d=64 — turning a latency-bound scatter into ~100 GFLOP of
matmul per 600k-edge direction: measured ~1.2 ms vs 7-10 ms for the XLA
segment-sum path on v5e.  At the default (bf16-pass) precision the one-hot
selection rounds table values to bf16 (~1e-3 relative);
``TEXTGCN_TPU_PALLAS_PRECISION=highest`` gives exact f32 at ~4x the cost.

The source table must be padded to a multiple of SRC_BLOCK rows; tables
larger than ``TiledSpMM.VMEM_X_BUDGET`` are processed in source-range
splits (sliced tables, summed partial outputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DST_BLOCK = 512
SRC_BLOCK = 512
CHUNK = 128
GROUP = 8   # chunks fetched per grid step: one (8, 128) metadata tile per
            # DMA instead of eight 512-byte DMAs (the kernel is DMA-issue
            # bound otherwise — measured 8.5 -> ~2 ms per 600k-edge call)
# DEFAULT runs the one-hot matmuls as single-pass bf16 (~4x faster than
# HIGHEST's multi-pass f32 on v5e: 1.9 vs 8.1 ms per 600k-edge call) at
# ~1e-3 relative error from bf16-rounding the table values — fine for
# training.  Set TEXTGCN_TPU_PALLAS_PRECISION=highest for exact f32
# (bit-parity runs, numeric debugging).
import os as _os
PRECISION = (jax.lax.Precision.HIGHEST
             if _os.environ.get('TEXTGCN_TPU_PALLAS_PRECISION', '')
             .lower() == 'highest' else jax.lax.Precision.DEFAULT)


def _make_kernel(src_block: int, dst_block: int):
    def _kernel(ptr_ref, sb_ref, packed_ref, w_ref, x_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        g = ptr_ref[b] + t

        @pl.when(g < ptr_ref[b + 1])
        def _():
            # per chunk: one-hot gather matmul; then ONE merged scatter
            # matmul for the whole group (fewer, larger MXU ops — measured
            # faster than per-chunk scatters)
            rows_all = []
            for j in range(GROUP):                    # static unroll
                sb = sb_ref[g * GROUP + j]
                packed = packed_ref[0, j, :]          # (CHUNK,) int32
                src_local = packed & 0xFFFF
                start = pl.multiple_of(sb * src_block, src_block)
                xb = x_ref[pl.ds(start, src_block), :]

                s_gather = (src_local[:, None]
                            == jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, src_block), 1)).astype(xb.dtype)
                rows = jnp.dot(s_gather, xb, precision=PRECISION,
                               preferred_element_type=jnp.float32)
                rows_all.append(rows * w_ref[0, j, :][:, None])

            rows_cat = jnp.concatenate(rows_all, axis=0)
            dst_all = packed_ref[0].reshape(-1) >> 16
            s_scatter = (jax.lax.broadcasted_iota(
                jnp.int32, (dst_block, GROUP * CHUNK), 0)
                == dst_all[None, :]).astype(jnp.float32)
            out_ref[:] += jnp.dot(s_scatter, rows_cat, precision=PRECISION,
                                  preferred_element_type=jnp.float32)

    return _kernel


def _make_dropout_kernel(src_block: int, dst_block: int, user_axis: str):
    """Kernel variant with the hash-dropout mask fused in: the per-edge
    scale is computed on the VPU from (user, item, salt) inside the kernel,
    overlapping the MXU matmuls — saves the separate XLA mask pass and the
    scaled-weight array round-trip (~25% of the train step).

    The global (user, item) ids feeding the hash are **reconstructed
    in-kernel** from the packed locals + block indices
    (``src = sb*src_block + src_local + split_off``,
    ``dst = b*dst_block + dst_local``) instead of being carried as two
    extra (n_groups, GROUP, CHUNK) metadata arrays — half the per-group
    metadata DMA and a third less host->device layout transfer.
    ``user_axis`` says which endpoint is the user slot so a direction and
    its transpose hash identical (user, item) pairs.
    """

    def _kernel(ptr_ref, sb_ref, salt_ref, keep_ref, off_ref, packed_ref,
                w_ref, x_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        g = ptr_ref[b] + t

        @pl.when(g < ptr_ref[b + 1])
        def _():
            salt = salt_ref[0]
            keep = keep_ref[0]
            off = off_ref[0]
            inv_keep = 1.0 / keep
            rows_all = []
            for j in range(GROUP):                    # static unroll
                sb = sb_ref[g * GROUP + j]
                packed = packed_ref[0, j, :]          # (CHUNK,) int32
                src_local = packed & 0xFFFF
                dst_local = packed >> 16
                start = pl.multiple_of(sb * src_block, src_block)
                xb = x_ref[pl.ds(start, src_block), :]

                s_gather = (src_local[:, None]
                            == jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, src_block), 1)).astype(xb.dtype)
                rows = jnp.dot(s_gather, xb, precision=PRECISION,
                               preferred_element_type=jnp.float32)

                # reconstruct global endpoint ids for the hash
                src_g = (sb * src_block + src_local
                         + off.astype(jnp.int32)).astype(jnp.uint32)
                dst_g = (b * dst_block + dst_local).astype(jnp.uint32)
                if user_axis == 'dst':
                    uid, iid = dst_g, src_g
                else:
                    uid, iid = src_g, dst_g
                # in-kernel murmur-style hash mask (edge_dropout_scale)
                h = uid * _M1 ^ iid * _M2 ^ salt.astype(jnp.uint32)
                h = h ^ (h >> 16)
                h = h * _F1
                h = h ^ (h >> 15)
                h = h * _F2
                h = h ^ (h >> 16)
                # top 23 bits -> exact f32 uniform in [0, 1) (Mosaic has
                # no uint32->f32 cast; int32 of h>>9 is exact in f32)
                unif = (h >> 9).astype(jnp.int32).astype(jnp.float32) \
                    * jnp.float32(1 / 8388608)
                keep_mask = (unif < keep) | (keep >= 1.0)
                w = jnp.where(keep_mask, w_ref[0, j, :] * inv_keep, 0.0)
                rows_all.append(rows * w[:, None])

            rows_cat = jnp.concatenate(rows_all, axis=0)
            dst_all = packed_ref[0].reshape(-1) >> 16
            s_scatter = (jax.lax.broadcasted_iota(
                jnp.int32, (dst_block, GROUP * CHUNK), 0)
                == dst_all[None, :]).astype(jnp.float32)
            out_ref[:] += jnp.dot(s_scatter, rows_cat, precision=PRECISION,
                                  preferred_element_type=jnp.float32)

    return _kernel


@functools.partial(jax.jit, static_argnames=('n_dst_blocks', 'max_groups',
                                             'src_block', 'dst_block',
                                             'user_axis', 'interpret'))
def pallas_spmm_dropout(group_ptr, chunk_sb, salt, keep, off, packed, w,
                        x, *, n_dst_blocks: int, max_groups: int,
                        src_block: int = SRC_BLOCK,
                        dst_block: int = DST_BLOCK,
                        user_axis: str = 'dst',
                        interpret: bool = False):
    """Blocked one-hot SpMM with fused hash dropout.

    ``salt`` (uint32 (1,)) / ``keep`` (f32 (1,)) / ``off`` (uint32 (1,),
    the source-split global row offset) are scalar-prefetched; the global
    (user, item) ids feeding the hash are reconstructed in-kernel from
    the packed locals + block indices, so no per-edge id metadata arrays
    are carried.
    """
    d = x.shape[1]
    n_groups = packed.shape[0]

    def group_map(b, t, ptr, sb, s_, k_, o_):
        return (jnp.minimum(ptr[b] + t, n_groups - 1), 0, 0)

    meta = pl.BlockSpec((1, GROUP, CHUNK), group_map,
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_dropout_kernel(src_block, dst_block, user_axis),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_dst_blocks, max_groups),
            in_specs=[meta, meta,
                      pl.BlockSpec(x.shape, lambda b, t, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((dst_block, d), lambda b, t, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_dst_blocks * dst_block, d),
                                       jnp.float32),
        interpret=interpret,
    )(group_ptr, chunk_sb, salt, keep, off, packed, w, x)


def plan_tile_blocks(n_edges: int, n_src: int, n_dst: int):
    """Pick (src_block, dst_block) for the graph's density.

    Sweep-calibrated rule (tools/block_sweep.py on a 200k x 80k / 2M-edge
    graph, v5e): padding inflation per tile is ~1 + CHUNK/(2*lambda) with
    lambda = S*D*density expected edges per tile.  Grow blocks from
    (512, 512) until lambda >= 48 (pad <= ~2.3), doubling the block on the
    axis with MORE ROWS first — the bigger axis has more, sparser blocks,
    so widening it both raises lambda and cuts per-block grid overhead.
    Stop as soon as lambda clears the bar: larger tiles past that point
    cost more one-hot VPU/MXU work per edge than the padding they save
    (measured: at the sweep density, (1024, 512)/(512, 1024) per
    direction beat both (512, 512) — 2.8x on the long-dst direction —
    and (2048, *) / (*, 2048)).  Blocks cap at 4096 (dst_local must fit
    15 bits in the packed int32; and a 4096-row one-hot is already
    ~30 us of pure iota-compare per chunk).
    """
    density = n_edges / max(n_src * n_dst, 1)
    s, dblk = 512, 512

    def lam():
        return s * dblk * density

    # blocks may exceed 1024 only in the ultra-sparse regime (lambda still
    # < 24 after both axes reach 1024): the sweep measured (2048, *) and
    # (*, 2048) strictly worse at moderate sparsity even at equal lambda.
    def can_grow(blk):
        return blk < 1024 or (blk < 4096 and lam() < 24.0)

    while lam() < 48.0 and (can_grow(s) or can_grow(dblk)):
        grow_src = n_src / s >= n_dst / dblk
        if can_grow(s) and (grow_src or not can_grow(dblk)):
            s *= 2
        else:
            dblk *= 2
    return s, dblk


@functools.partial(jax.jit, static_argnames=('n_dst_blocks', 'max_groups',
                                             'src_block', 'dst_block',
                                             'interpret'))
def pallas_spmm(group_ptr, chunk_sb, packed, w, x, *, n_dst_blocks: int,
                max_groups: int, src_block: int = SRC_BLOCK,
                dst_block: int = DST_BLOCK, interpret: bool = False):
    """Blocked one-hot SpMM.  ``x`` rows must be padded to ``src_block``.

    ``packed``/``w`` have shape (n_groups, GROUP, CHUNK); ``group_ptr``
    delimits each destination block's group range; ``chunk_sb`` maps every
    chunk to its source block.
    """
    d = x.shape[1]
    n_groups = packed.shape[0]

    def group_map(b, t, ptr, sb):
        return (jnp.minimum(ptr[b] + t, n_groups - 1), 0, 0)

    return pl.pallas_call(
        _make_kernel(src_block, dst_block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_dst_blocks, max_groups),
            in_specs=[
                pl.BlockSpec((1, GROUP, CHUNK), group_map,
                             memory_space=pltpu.VMEM),     # packed locals
                pl.BlockSpec((1, GROUP, CHUNK), group_map,
                             memory_space=pltpu.VMEM),     # weights
                pl.BlockSpec(x.shape, lambda b, t, *_: (0, 0),
                             memory_space=pltpu.VMEM),     # source table
            ],
            out_specs=pl.BlockSpec((dst_block, d), lambda b, t, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_dst_blocks * dst_block, d),
                                       jnp.float32),
        interpret=interpret,
    )(group_ptr, chunk_sb, packed, w, x)


class PallasDirection:
    """Host-precomputed tiled layout for one propagation direction.

    Call with a (n_src_padded, d) table; returns (n_dst, d).  ``w`` may be
    overridden per call (dropout); it must be in this direction's padded
    edge order — use ``edge_endpoints`` to compute order-independent
    per-edge masks (e.g. hash-based dropout).
    """

    def __init__(self, src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                 n_src: int, n_dst: int, src_block: int = SRC_BLOCK,
                 dst_block: int = DST_BLOCK):
        src = np.asarray(src, np.int64)
        dst = np.asarray(dst, np.int64)
        w = np.asarray(w, np.float32)
        self.src_block = int(src_block)
        self.dst_block = int(dst_block)
        SRC_B, DST_B = self.src_block, self.dst_block
        self.n_dst = int(n_dst)
        self.n_src_padded = -(-int(n_src) // SRC_B) * SRC_B
        self.n_dst_blocks = max(1, -(-int(n_dst) // DST_B))
        n_src_blocks = self.n_src_padded // SRC_B

        # native C++ layout builder when available (textgcn_tpu/native.py;
        # same output as the numpy construction below, much faster on
        # multi-million-edge graphs)
        from .. import native
        if native.available():
            (packed, w_arr, sb, gptr, max_groups, dst_ids,
             src_ids) = native.tile_layout(
                src, dst, w, self.n_src_padded, self.n_dst,
                DST_B, SRC_B, CHUNK, GROUP)
            n_chunks = len(sb)
            self.n_chunks = n_chunks
            self.n_groups = max(n_chunks // GROUP, 1)
            self.packed = jnp.asarray(
                packed.reshape(self.n_groups, GROUP, CHUNK))
            self.w = jnp.asarray(
                w_arr.reshape(self.n_groups, GROUP, CHUNK))
            self.chunk_sb = jnp.asarray(sb)
            self.group_ptr = jnp.asarray(gptr)
            self.max_groups = max_groups
            # endpoint ids stay host-side numpy: the dropout kernel
            # reconstructs them in-kernel; only the mesh op / tests
            # consume these (and convert as needed)
            self.dst_ids = np.asarray(dst_ids).astype(np.int32) \
                .reshape(self.n_groups, GROUP, CHUNK)
            self.src_ids = np.asarray(src_ids).astype(np.int32) \
                .reshape(self.n_groups, GROUP, CHUNK)
            return

        tile = (dst // DST_B) * n_src_blocks + (src // SRC_B)
        order = np.argsort(tile, kind='stable')
        src, dst, w, tile = src[order], dst[order], w[order], tile[order]

        # pad each tile's edge run to a CHUNK multiple
        uniq, counts = np.unique(tile, return_counts=True)
        padded_counts = -(-counts // CHUNK) * CHUNK
        total = int(padded_counts.sum())
        src_p = np.zeros(total, np.int64)
        dst_p = np.zeros(total, np.int64)
        w_p = np.zeros(total, np.float32)
        # padding edges carry w=0 and point at local row 0 of their own tile
        tile_p = np.repeat(uniq, padded_counts)
        out_pos = (np.cumsum(padded_counts) - padded_counts)
        in_pos = np.cumsum(counts) - counts
        idx = np.concatenate([
            np.arange(c) + o for c, o in zip(counts, out_pos)])
        src_p[idx] = src
        dst_p[idx] = dst
        w_p[idx] = w
        # padding entries: src_local=0/dst_local=0 within their tile
        pad_mask = np.ones(total, bool)
        pad_mask[idx] = False
        pad_tiles = tile_p[pad_mask]
        src_p[pad_mask] = (pad_tiles % n_src_blocks) * SRC_B
        dst_p[pad_mask] = (pad_tiles // n_src_blocks) * DST_B

        n_chunks0 = total // CHUNK
        packed0 = (((dst_p % DST_B).astype(np.int32) << 16)
                   | (src_p % SRC_B).astype(np.int32)
                   ).reshape(n_chunks0, CHUNK)
        w0 = w_p.reshape(n_chunks0, CHUNK)
        sb0 = (tile_p.reshape(-1, CHUNK)[:, 0] % n_src_blocks) \
            .astype(np.int32)
        db0 = (tile_p.reshape(-1, CHUNK)[:, 0] // n_src_blocks) \
            .astype(np.int64)
        dst_ids0 = np.full(total, -1, np.int64)
        src_ids0 = np.full(total, -1, np.int64)
        dst_ids0[idx], src_ids0[idx] = (dst, src)
        dst_ids0 = dst_ids0.reshape(n_chunks0, CHUNK)
        src_ids0 = src_ids0.reshape(n_chunks0, CHUNK)

        # pad each dst block's chunk list to a GROUP multiple so the kernel
        # fetches GROUP chunks per (8, 128)-tile DMA
        cptr = np.searchsorted(db0, np.arange(self.n_dst_blocks + 1))
        counts_b = np.diff(cptr)
        padded_b = -(-counts_b // GROUP) * GROUP
        n_chunks = int(padded_b.sum())
        sel = np.concatenate([
            np.arange(c) + o for c, o in zip(counts_b, cptr[:-1])]) \
            if n_chunks0 else np.zeros(0, np.int64)
        pos = np.concatenate([
            np.arange(c) + o
            for c, o in zip(counts_b, np.cumsum(padded_b) - padded_b)]) \
            if n_chunks0 else np.zeros(0, np.int64)
        packed = np.zeros((n_chunks, CHUNK), np.int32)
        w_arr = np.zeros((n_chunks, CHUNK), np.float32)
        sb = np.zeros(n_chunks, np.int32)
        dst_ids = np.full((n_chunks, CHUNK), -1, np.int64)
        src_ids = np.full((n_chunks, CHUNK), -1, np.int64)
        packed[pos] = packed0[sel]
        w_arr[pos] = w0[sel]
        sb[pos] = sb0[sel]
        dst_ids[pos] = dst_ids0[sel]
        src_ids[pos] = src_ids0[sel]

        self.n_chunks = n_chunks
        self.n_groups = max(n_chunks // GROUP, 1)
        self.packed = jnp.asarray(
            np.resize(packed, (self.n_groups * GROUP, CHUNK))
            .reshape(self.n_groups, GROUP, CHUNK))
        self.w = jnp.asarray(
            np.resize(w_arr, (self.n_groups * GROUP, CHUNK))
            .reshape(self.n_groups, GROUP, CHUNK))
        self.chunk_sb = jnp.asarray(
            np.resize(sb, (self.n_groups * GROUP,)))
        gptr = (np.cumsum(np.concatenate([[0], padded_b])) // GROUP) \
            .astype(np.int32)
        self.group_ptr = jnp.asarray(gptr)
        self.max_groups = max(int(np.diff(gptr).max()), 1)
        self.dst_ids = np.resize(dst_ids, (self.n_groups * GROUP, CHUNK)) \
            .astype(np.int32).reshape(self.n_groups, GROUP, CHUNK)
        self.src_ids = np.resize(src_ids, (self.n_groups * GROUP, CHUNK)) \
            .astype(np.int32).reshape(self.n_groups, GROUP, CHUNK)

    def __call__(self, x, w=None, interpret: bool = False):
        assert x.shape[0] == self.n_src_padded, \
            f'table must be padded to {self.n_src_padded}, got {x.shape}'
        out = pallas_spmm(
            self.group_ptr, self.chunk_sb, self.packed,
            self.w if w is None else w, x,
            n_dst_blocks=self.n_dst_blocks, max_groups=self.max_groups,
            src_block=self.src_block, dst_block=self.dst_block,
            interpret=interpret)
        return out[:self.n_dst]

    # pytree protocol: see ops/spmm.py — ops pass through jit as ARGUMENTS
    # so their arrays are not embedded as compiled-program constants.
    # Host-only numpy ids are excluded (never read in traced code).
    def tree_flatten(self):
        children = (self.group_ptr, self.chunk_sb, self.packed, self.w)
        aux = (self.src_block, self.dst_block, self.n_dst,
               self.n_src_padded, self.n_dst_blocks, self.n_groups,
               self.n_chunks, self.max_groups)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        d = object.__new__(cls)
        (d.src_block, d.dst_block, d.n_dst, d.n_src_padded,
         d.n_dst_blocks, d.n_groups, d.n_chunks, d.max_groups) = aux
        d.dst_ids = d.src_ids = None  # host-only
        d.group_ptr, d.chunk_sb, d.packed, d.w = children
        return d


jax.tree_util.register_pytree_node_class(PallasDirection)


# ---------------------------------------------------------------------------
# hash-based edge dropout (order-independent)

_M1 = np.uint32(2654435761)
_M2 = np.uint32(2246822519)
_F1 = np.uint32(0x7FEB352D)
_F2 = np.uint32(0x846CA68B)


def hash_dropout_salts(mask_key=None, dropout: float = 0.0):
    """Per-direction (salt, keep) pairs for the hash dropout mask — the
    single implementation behind every backend's ``weights()`` (single-
    chip Pallas, mesh Pallas, mesh segment-sum), so the mask stream can
    never diverge between them."""
    if dropout <= 0.0 or mask_key is None:
        zero = jnp.uint32(0)
        one = jnp.float32(1.0)
        return (zero, one), (zero, one)
    salts = jax.random.bits(mask_key, (2,), jnp.uint32)
    keep = jnp.float32(1.0 - dropout)
    return (salts[0], keep), (salts[1], keep)


def edge_dropout_scale(user_ids, item_ids, salt, keep):
    """Per-edge keep/(1-p) scale as a pure function of (user, item, salt).

    Because the mask depends only on edge identity, the SAME mask can be
    evaluated in any edge ordering — forward and transpose layouts agree
    without any permutation gathers (which cost ~7 ms per 600k elements on
    v5e; this is pure aligned VPU work).  Murmur3-style finalizer; keep is
    a traced f32 so one compiled kernel serves train (keep<1) and eval
    (keep=1 -> scale exactly 1).
    """
    h = (user_ids.astype(jnp.uint32) * _M1
         ^ item_ids.astype(jnp.uint32) * _M2
         ^ salt.astype(jnp.uint32))
    h = h ^ (h >> 16)
    h = h * _F1
    h = h ^ (h >> 15)
    h = h * _F2
    h = h ^ (h >> 16)
    # top 23 bits -> exact f32 uniform in [0, 1) (matches the in-kernel
    # formulation, which cannot cast uint32->f32 on Mosaic)
    u = (h >> 9).astype(jnp.int32).astype(jnp.float32) \
        * jnp.float32(1.0 / 8388608.0)
    return jnp.where((u < keep) | (keep >= 1.0), 1.0 / keep,
                     0.0).astype(jnp.float32)


class TiledSpMM:
    """One propagation direction, split over source ranges when the source
    table exceeds the VMEM budget.

    ``__call__(x, salt, keep)`` computes ``A_drop @ x`` where A's weights
    are scaled by the hash-dropout mask of (user, item, salt).
    ``user_axis``: 'dst' if the destination axis of this direction is the
    user axis (determines which endpoint feeds the user slot of the mask
    hash, so that a direction and its transpose draw identical masks).
    """

    VMEM_X_BUDGET = 6 * 1024 * 1024  # pallas double-buffers the x input

    def __init__(self, src, dst, w, n_src: int, n_dst: int, d: int,
                 user_axis: str, interpret: bool = False,
                 src_block: int | None = None,
                 dst_block: int | None = None,
                 x_dtype=None, vmem_budget: int | None = None):
        self.n_src = int(n_src)
        self.n_dst = int(n_dst)
        self.user_axis = user_axis
        self.interpret = interpret
        # At DEFAULT precision the one-hot matmul rounds table values to
        # bf16 anyway, so feeding the kernel a bf16 x is numerically free
        # — and it halves the per-split VMEM slice (half the source
        # splits, half the x HBM->VMEM traffic).  HIGHEST keeps f32.
        if x_dtype is None:
            env_dt = _os.environ.get('TEXTGCN_TPU_PALLAS_XDTYPE', '')
            if env_dt in ('f32', 'float32'):        # measurement override
                x_dtype = jnp.float32
            elif env_dt in ('bf16', 'bfloat16'):
                x_dtype = jnp.bfloat16
            else:
                x_dtype = (jnp.bfloat16
                           if PRECISION == jax.lax.Precision.DEFAULT
                           else jnp.float32)
        self.x_dtype = jnp.dtype(x_dtype)
        if src_block is None or dst_block is None:
            sb_auto, db_auto = plan_tile_blocks(len(np.asarray(src)),
                                                n_src, n_dst)
            src_block = src_block or sb_auto
            dst_block = dst_block or db_auto
        # the table rows must divide the source block
        while int(n_src) % src_block:
            src_block //= 2
        self.src_block, self.dst_block = src_block, dst_block
        # smaller budgets -> more source splits: the GAT attention kernels
        # (ops/pallas_gat.py) hold up to two full-slice d-dim tables in
        # VMEM per split, so they build their layouts with a halved budget
        bytes_per_split = vmem_budget or self.VMEM_X_BUDGET
        rows_per_split = max(src_block,
                             (bytes_per_split // (d * self.x_dtype.itemsize))
                             // src_block * src_block)
        self.splits = []
        src = np.asarray(src)
        for off in range(0, max(int(n_src), 1), rows_per_split):
            hi = min(off + rows_per_split, n_src)
            sel = (src >= off) & (src < hi)
            # a short final split is rebased to a full-width window ending
            # at the table edge so every split slices identical x shapes
            # (one compiled kernel variant instead of two); the overlap
            # rows carry no edges of this split, so they contribute
            # nothing to the one-hot matmuls
            if hi - off < rows_per_split and n_src >= rows_per_split:
                off = n_src - rows_per_split
                hi = n_src
            direction = PallasDirection(
                src[sel] - off, np.asarray(dst)[sel],
                np.asarray(w)[sel], hi - off, n_dst,
                src_block=src_block, dst_block=dst_block)
            # no per-edge id metadata: the kernel reconstructs global
            # (user, item) ids from packed locals + block indices + the
            # split offset (passed as a prefetched scalar)
            self.splits.append((off, hi - off, direction))
        self._unify_split_shapes()

    def _unify_split_shapes(self):
        """Pad every split's layout arrays to common (n_groups,
        max_groups) so all splits share ONE compiled kernel variant.

        The kernel's static args are (n_dst_blocks, max_groups, blocks) and
        its array shapes are (n_groups, GROUP, CHUNK); without
        unification a 21-split table costs 21 separate ~45-300 s remote
        Pallas compiles.  Padding groups are never executed: ``group_ptr``
        still delimits each block's real group range, so the extra grid
        steps fail the ``g < ptr[b+1]`` guard and are skipped.
        """
        if len(self.splits) <= 1:
            return
        n_groups = max(d.packed.shape[0] for _, _, d in self.splits)
        max_groups = max(d.max_groups for _, _, d in self.splits)

        def pad_groups(a, fill, as_np=False):
            a = np.asarray(a)
            extra = n_groups - a.shape[0]
            if extra > 0:
                a = np.concatenate(
                    [a, np.full((extra, *a.shape[1:]), fill, a.dtype)])
            return a if as_np else jnp.asarray(a)

        for off, length, d in self.splits:
            d.packed = pad_groups(d.packed, 0)
            d.w = pad_groups(d.w, 0.0)
            d.dst_ids = pad_groups(d.dst_ids, -1, as_np=True)
            d.src_ids = pad_groups(d.src_ids, -1, as_np=True)
            sb = np.asarray(d.chunk_sb)
            d.chunk_sb = jnp.asarray(np.concatenate(
                [sb, np.zeros(n_groups * GROUP - len(sb), sb.dtype)]))
            d.max_groups = max_groups

    def _dir_weights(self, direction, salt, keep, off):
        """XLA-side mask (used by tests and the mesh op; the single-chip
        path fuses this into the kernel)."""
        if self.user_axis == 'dst':
            uids, iids = direction.dst_ids, direction.src_ids + off
        else:
            uids, iids = direction.src_ids + off, direction.dst_ids
        scale = edge_dropout_scale(jnp.asarray(uids), jnp.asarray(iids),
                                   salt, keep)
        return direction.w * scale.reshape(direction.w.shape)

    def __call__(self, x, salt, keep):
        salt_arr = jnp.asarray(salt, jnp.uint32).reshape(1)
        keep_arr = jnp.asarray(keep, jnp.float32).reshape(1)
        x = x.astype(self.x_dtype)
        out = None
        for off, length, direction in self.splits:
            xs = jax.lax.dynamic_slice_in_dim(x, off, length, axis=0) \
                if len(self.splits) > 1 else x
            off_arr = jnp.asarray([off], jnp.uint32)
            part = pallas_spmm_dropout(
                direction.group_ptr, direction.chunk_sb, salt_arr,
                keep_arr, off_arr, direction.packed, direction.w, xs,
                n_dst_blocks=direction.n_dst_blocks,
                max_groups=direction.max_groups,
                src_block=direction.src_block,
                dst_block=direction.dst_block,
                user_axis=self.user_axis,
                interpret=self.interpret)[:direction.n_dst]
            out = part if out is None else out + part
        return out

    # pytree protocol (see ops/spmm.py)
    def tree_flatten(self):
        children = tuple(d for _, _, d in self.splits)
        aux = (self.n_src, self.n_dst, self.user_axis, self.interpret,
               self.src_block, self.dst_block, self.x_dtype,
               tuple(off for off, _, _ in self.splits),
               tuple(length for _, length, _ in self.splits))
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        op = object.__new__(cls)
        (op.n_src, op.n_dst, op.user_axis, op.interpret, op.src_block,
         op.dst_block, op.x_dtype, offs, lengths) = aux
        op.splits = list(zip(offs, lengths, children))
        return op


jax.tree_util.register_pytree_node_class(TiledSpMM)


def _zeros_ct(tree):
    """Zero cotangents for a non-differentiable array pytree: float0 for
    integer leaves, zeros (DCE'd) for float leaves."""
    return jax.tree.map(
        lambda a: jnp.zeros_like(a)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.inexact)
        else np.zeros(jnp.shape(a), jax.dtypes.float0), tree)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_graph_spmm(direction: str, op, x, salt, keep):
    """One propagation direction through a ``PallasGraphOp`` pytree.

    Forward runs the direction's tiled layout; backward runs the
    transpose layout on the cotangent (both layouts are all-sorted).  The
    op passes through as a pytree ARGUMENT so its layout arrays are jit
    parameters, not embedded constants.
    """
    layout = op.l_i2u if direction == 'to_user' else op.l_u2i
    return layout(x, salt, keep)


def _pgs_fwd(direction, op, x, salt, keep):
    return pallas_graph_spmm(direction, op, x, salt, keep), \
        (op, salt, keep)


def _pgs_bwd(direction, res, g):
    op, salt, keep = res
    layout = op.l_u2i if direction == 'to_user' else op.l_i2u
    dx = layout(g, salt, keep)
    return (_zeros_ct(op), dx, _zeros_ct(salt), jnp.zeros_like(keep))


pallas_graph_spmm.defvjp(_pgs_fwd, _pgs_bwd)


class PallasGraphOp:
    """Drop-in propagation backend using the tiled one-hot SpMM kernel.

    Same interface as ``spmm.BipartiteGraphOp``: ``weights(key, dropout)``
    then ``to_user`` / ``to_item``.  Forward and backward of each direction
    run the kernel on transpose layouts (both all-sorted), wired through
    the module-level ``pallas_graph_spmm`` custom VJP.  Tables must be
    padded to SRC_BLOCK multiples.
    """

    def __init__(self, edge_user, edge_item, edge_weight,
                 n_users_t: int, n_items_t: int, d: int,
                 interpret: bool = False, x_dtype=None,
                 vmem_budget: int | None = None,
                 src_block: int | None = None,
                 dst_block: int | None = None):
        assert n_users_t % SRC_BLOCK == 0 and n_items_t % SRC_BLOCK == 0, \
            'tables must be padded to SRC_BLOCK for the pallas backend'
        eu = np.asarray(edge_user)
        ei = np.asarray(edge_item)
        w = np.asarray(edge_weight)
        # src/dst_block=None -> the sweep-calibrated planner; explicit caps
        # serve the attention kernels (ops/pallas_gat.py), whose in-kernel
        # one-hot scratch scales with block area and overflows the 16 MB
        # scoped-VMEM limit at the planner's sparse-regime 1024 blocks
        self.l_i2u = TiledSpMM(ei, eu, w, n_items_t, n_users_t, d,
                               user_axis='dst', interpret=interpret,
                               x_dtype=x_dtype, vmem_budget=vmem_budget,
                               src_block=src_block, dst_block=dst_block)
        self.l_u2i = TiledSpMM(eu, ei, w, n_users_t, n_items_t, d,
                               user_axis='src', interpret=interpret,
                               x_dtype=x_dtype, vmem_budget=vmem_budget,
                               src_block=src_block, dst_block=dst_block)

    def weights(self, mask_key=None, dropout: float = 0.0):
        """Returns ((salt, keep) for i->u, (salt, keep) for u->i)."""
        return hash_dropout_salts(mask_key, dropout)

    def to_user(self, item_emb, w_pair):
        salt, keep = w_pair
        return pallas_graph_spmm('to_user', self, item_emb, salt, keep)

    def to_item(self, user_emb, w_pair):
        salt, keep = w_pair
        return pallas_graph_spmm('to_item', self, user_emb, salt, keep)

    def tree_flatten(self):
        return (self.l_i2u, self.l_u2i), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        op = object.__new__(cls)
        op.l_i2u, op.l_u2i = children
        return op


jax.tree_util.register_pytree_node_class(PallasGraphOp)
