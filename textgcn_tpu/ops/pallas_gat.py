"""Pallas TPU kernels for GAT attention propagation (block-sparse softmax).

The GAT/GATv2 convs (reference ``rejected_models.py:7-42`` via
torch_geometric) need a per-destination softmax over incoming edges:

    out_j = ( Σ_i e_ij h_i + e_self h_j ) / ( Σ_i e_ij + e_self ),
    e_ij  = exp(leaky(s_i + d_j) − m_j) · mask_ij

Per-edge logits are NOT separable (the leaky-ReLU couples the endpoints),
so this cannot ride the plain SpMM kernel's static weights.  Instead the
attention runs as its own block-sparse pipeline over the SAME tiled
layout as ``ops/pallas_spmm`` (packed locals, group metadata,
scalar-prefetched group pointers):

* **fused forward** (`_agg_online_kernel`): ONE online-softmax pass
  (flash-attention style) computes the per-dst max shift AND the
  (numerator, denominator) accumulators together, rescaling by
  ``exp(m_old - m_new)`` as the max advances — the chunk decode (hash
  mask + one-hot construction, the dominant per-edge cost) runs once
  instead of twice.  Scalars gather via tiny one-hot matmuls
  (``onehot(src_local) @ s_block``); the merged one-hot MXU scatter
  accumulates BOTH the weighted-message numerator (dst_block, d) and
  the denominator column (dst_block, 1) in one grid.  Splits CARRY the
  (num, den, m) accumulators through the kernel (copy-in at each
  block's first visit) — the online recurrence continues across splits,
  so no full-table per-split combine exists in XLA (at S3's 31-split
  tables a combine tree held several (n_dst_pad, d) buffers live and
  exceeded HBM).  A third output returns the edge max for the
  self-loop fold and the backward recompute.
* **backward** is hand-derived (softmax VJP with the shift m
  stop-gradded — exact, by shift invariance) and runs as ONE more pass:
  `_bwd_src_kernel` over the TRANSPOSE tiles computes
  ``dh_i = Σ_j e_ij g_j`` and ``ds_i = Σ_j dz_ij`` (dz = e·(g·h + g_den)·
  leaky'(z)), recomputing e in the transpose order — the hash mask is
  order-independent, so zero permutation traffic, exactly like the SpMM
  custom VJP — AND scatters ``dd_j = Σ_i dz_ij`` onto this layout's
  SOURCE axis (forward dst j) into a lane-packed constant-index output
  block, eliminating the old third full decode pass over the forward
  tiles (dz was already materialized here; the scatter is one extra
  (rows, CHUNK)x(CHUNK, 128) one-hot matmul per chunk).  The per-edge
  SDDMM dot ``g_j·h_i`` is two one-hot MXU gathers + a VPU row dot.

Self-loop terms, the combination, and all parameter matmuls stay in
plain JAX outside the custom-VJP boundary (autodiff handles them).
Source-range splits follow ``TiledSpMM``: every output is a sum (or max)
over splits, so big tables work unchanged.

Used by ``models/conv.py`` for the 'gat' variant on TPU; the segment-op
formulation remains the oracle-tested fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spmm import CHUNK, GROUP, PRECISION, _F1, _F2, _M1, _M2, \
    _zeros_ct

# Masked-logit sentinel.  MUST be a power of two: the per-dst max
# travels through one-hot gather MATMULS (``_dot(oh_dst, m_cur)``,
# ``_gather_with(m_ref, ...)``) which at DEFAULT precision multiply in
# bf16 — a non-representable sentinel (the old -1e30) rounds ~0.4%, so
# for a destination whose max IS the sentinel, ``z - m_e`` came back as
# +4e27 instead of 0 and ``exp`` overflowed to inf, making the masked
# slot's ``0 * inf`` a NaN that the scatter spread over the whole dst
# row.  -2^100 is exactly representable in bf16 (and f32), so every
# sentinel-minus-sentinel is exactly 0 and every sentinel-minus-finite
# underflows exp to 0.  Caught by the round-5 50k quality runs (every
# real-chip attention fit NaN'd at epoch 1); invisible to interpret
# mode, which runs DEFAULT precision as exact f32.
NEG = -2.0 ** 100   # python literals: inlined into kernels, not captured
SLOPE = 0.2   # torch_geometric LeakyReLU default

# the attention kernels sit near Mosaic's default 16 MB scoped-VMEM cap
# at the planner's sparse-regime 1024 tile blocks (in-kernel one-hot
# scratch scales with block area; the split-carry inputs add ~0.5 MB) —
# raise the cap to 32 MB, comfortably under the 128 MB physical VMEM
# shared with the pipeline's double-buffered windows
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)
# the fused GATv2 backward additionally holds a per-split packed dhd
# block resident (split_rows * d * 4 bytes, ~6 MB at d=64) — give it
# extra scoped-VMEM headroom; still well under the 128 MB physical VMEM
_COMPILER_PARAMS_BWD2 = pltpu.CompilerParams(
    vmem_limit_bytes=48 * 1024 * 1024)


def _hash_keep(uid, iid, salt, keep):
    """In-kernel murmur hash mask {0., 1.} — identical stream to
    ``pallas_spmm.edge_dropout_scale`` (order-independent)."""
    h = uid * _M1 ^ iid * _M2 ^ salt.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * _F1
    h = h ^ (h >> 15)
    h = h * _F2
    h = h ^ (h >> 16)
    unif = (h >> 9).astype(jnp.int32).astype(jnp.float32) \
        * jnp.float32(1 / 8388608)
    return jnp.where((unif < keep) | (keep >= 1.0), 1.0, 0.0)


def _leaky(z):
    return jnp.where(z >= 0, z, SLOPE * z)


def _dleaky(z):
    # matches jax.nn.leaky_relu's subgradient convention (1 at z == 0)
    return jnp.where(z >= 0, 1.0, SLOPE)


def _chunk_scalars(b, j, g, sb_ref, packed_ref, w_ref, salt, keep, off,
                   src_block, dst_block, user_axis):
    """Shared per-chunk decode: local ids, one-hots, masked unit weight.

    Returns (src_local, dst_local, onehot_src (CHUNK, src_block),
    onehot_dst (CHUNK, dst_block), wmask (CHUNK,)) where wmask is the
    layout weight (0 on padding slots) times the hash dropout mask.
    ``b`` is the dst-block grid index, read once at kernel top (the HLO
    interpreter substitutes program_id only there).
    """
    sb = sb_ref[g * GROUP + j]
    packed = packed_ref[0, j, :]
    src_local = packed & 0xFFFF
    dst_local = packed >> 16
    oh_src = (src_local[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, src_block), 1)).astype(jnp.float32)
    oh_dst = (dst_local[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, dst_block), 1)).astype(jnp.float32)
    src_g = (sb * src_block + src_local
             + off.astype(jnp.int32)).astype(jnp.uint32)
    dst_g = (b * dst_block + dst_local).astype(jnp.uint32)
    uid, iid = (dst_g, src_g) if user_axis == 'dst' else (src_g, dst_g)
    wmask = w_ref[0, j, :] * _hash_keep(uid, iid, salt, keep)
    return sb, src_local, oh_src, oh_dst, wmask


def _dot(a, b):
    return jnp.dot(a, b, precision=PRECISION,
                   preferred_element_type=jnp.float32)


def _gather_src_scalar(ref, sb, src_local, src_block):
    """Per-edge scalar from a LANE-PACKED (n_rows/128, 128) vector.

    Full-slice (N, 1) VMEM operands pad their lane dim to 128 (a 25 MB
    allocation for a 49k-row f32 vector — over the 16 MB scoped-vmem
    limit), so full-table scalars travel packed: value idx lives at
    [idx // 128, idx % 128].  The gather is a tiny row-select matmul
    plus a lane-select mask-reduce.
    """
    rows_per = src_block // 128
    start = pl.multiple_of(sb * rows_per, rows_per)
    blk = ref[pl.ds(start, rows_per), :]                # (rows_per, 128)
    rowsel = ((src_local // 128)[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, rows_per), 1)).astype(jnp.float32)
    rows = _dot(rowsel, blk)                            # (CHUNK, 128)
    lanesel = (src_local % 128)[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, 128), 1)
    return jnp.sum(jnp.where(lanesel, rows, 0.0), axis=1)


def _packed_sel(src_local, src_block):
    """Row/lane selectors into the lane-packed (rows, 128) scalar layout,
    built ONCE per chunk and shared by every packed gather and the
    source-axis scatter (``_gather_src_scalar`` rebuilds them per call —
    fine for the forward's single gather, wasteful for the backward's
    three)."""
    rows_per = src_block // 128
    rowsel = ((src_local // 128)[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, rows_per), 1)).astype(jnp.float32)
    lanesel = (src_local % 128)[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, 128), 1)
    return rowsel, lanesel


def _gather_with(ref, sb, rowsel, lanesel, src_block):
    """Packed-scalar gather using prebuilt selectors (see
    ``_gather_src_scalar`` for the layout)."""
    rows_per = src_block // 128
    start = pl.multiple_of(sb * rows_per, rows_per)
    rows = _dot(rowsel, ref[pl.ds(start, rows_per), :])
    return jnp.sum(jnp.where(lanesel, rows, 0.0), axis=1)


def _scatter_packed(ref, base_row, sb, rowsel, lanesel, vals, src_block):
    """Accumulate per-edge scalars onto the lane-packed SOURCE axis:
    ``ref[row(i), lane(i)] += vals_e`` for every edge e with source local
    i — one (rows, CHUNK)x(CHUNK, 128) one-hot matmul.  ``base_row`` is
    the split's global packed-row offset (the output is global-size, so
    the XLA-side 'add' split combine stays exact)."""
    rows_per = src_block // 128
    start = pl.multiple_of(base_row + sb * rows_per, rows_per)
    contrib = _dot(rowsel.T, jnp.where(lanesel, vals[:, None], 0.0))
    ref[pl.ds(start, rows_per), :] += contrib


def _make_agg_online_kernel(src_block, dst_block, user_axis):
    """Fused forward: online-softmax aggregation (flash-attention style).

    One pass over the tiles computes the per-dst running max AND the
    (numerator, denominator) accumulators, rescaling the accumulators by
    ``exp(m_old - m_new)`` whenever the max advances.  The chunk decode
    (hash mask + one-hot construction) and the scalar gathers run once
    instead of twice; measured 5-8% on the full train step vs the
    separate max pass, plus the split-carry memory win (docs/KERNEL.md).
    """
    def _kernel(ptr_ref, sb_ref, salt_ref, keep_ref, off_ref,
                packed_ref, w_ref, s_ref, d_ref, x_ref,
                num_in_ref, den_in_ref, m_in_ref,
                num_ref, den_ref, m_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        # splits CARRY the accumulators through the kernel (copy-in at
        # the block's first visit) instead of combining full-table
        # per-split outputs in XLA — at S3's 31-split tables the combine
        # tree held several (n_dst_pad, d) buffers live at once and blew
        # HBM (16.5 G / 15.75 G at compile), and the carry also halves
        # the split-boundary HBM traffic
        @pl.when(t == 0)
        def _():
            num_ref[:] = num_in_ref[:]
            den_ref[:] = den_in_ref[:]
            m_ref[:] = m_in_ref[:]

        g = ptr_ref[b] + t

        @pl.when(g < ptr_ref[b + 1])
        def _():
            salt, keep, off = salt_ref[0], keep_ref[0], off_ref[0]
            # phase A: decode each chunk ONCE, settle the group's max
            rows_l, z_l, w_l = [], [], []
            m_cur = m_ref[:]
            for j in range(GROUP):                    # static unroll
                sb, src_local, oh_src, oh_dst, wmask = _chunk_scalars(
                    b, j, g, sb_ref, packed_ref, w_ref, salt, keep, off,
                    src_block, dst_block, user_axis)
                start = pl.multiple_of(sb * src_block, src_block)
                xb = x_ref[pl.ds(start, src_block), :]
                rows = _dot(oh_src.astype(xb.dtype), xb)
                s_e = _gather_src_scalar(s_ref, sb, src_local,
                                         src_block)
                d_e = _dot(oh_dst, d_ref[:, :])[:, 0]
                # masked logits carry NEG so the exp below is exact even
                # for a dst whose edges are ALL masked (m stays NEG)
                z = jnp.where(wmask > 0, _leaky(s_e + d_e), NEG)
                # per-dst max over this chunk (VPU select + max)
                m_cur = jnp.maximum(m_cur, jnp.max(
                    jnp.where(oh_dst.T > 0, z[None, :], NEG),
                    axis=1, keepdims=True))
                rows_l.append(rows)
                z_l.append(z)
                w_l.append(wmask)
            # rescale prior accumulators to the advanced shift
            r = jnp.exp(m_ref[:] - m_cur)
            num_ref[:] = num_ref[:] * r
            den_ref[:] = den_ref[:] * r
            m_ref[:] = m_cur
            # phase B: e against the settled max; ONE merged scatter.
            # oh_dst rebuilds from the metadata tile (one iota compare)
            # instead of staying live across phases — keeps the scratch
            # at the two-pass kernel's level.
            rows_all, e_all = [], []
            for j in range(GROUP):
                dst_local = packed_ref[0, j, :] >> 16
                oh_dst = (dst_local[:, None] == jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, dst_block), 1)) \
                    .astype(jnp.float32)
                m_e = _dot(oh_dst, m_cur)[:, 0]
                e = w_l[j] * jnp.exp(z_l[j] - m_e)
                rows_all.append(rows_l[j] * e[:, None])
                e_all.append(e[:, None])

            # 2-D concats only (Mosaic cannot concat 1-D vectors past the
            # first tile); dst ids come from the whole metadata tile like
            # the SpMM kernel
            rows_cat = jnp.concatenate(rows_all, axis=0)
            e_cat = jnp.concatenate(e_all, axis=0)
            dst_cat = packed_ref[0].reshape(-1) >> 16
            s_scatter = (jax.lax.broadcasted_iota(
                jnp.int32, (dst_block, GROUP * CHUNK), 0)
                == dst_cat[None, :]).astype(jnp.float32)
            num_ref[:] += _dot(s_scatter, rows_cat)
            den_ref[:] += _dot(s_scatter, e_cat)

    return _kernel


def _make_bwd_src_kernel(src_block, dst_block, user_axis):
    """Over the TRANSPOSE tiles: this layout's src = forward dst (j),
    dst = forward src (i).  Computes dh_i = Σ_j e_ij g_j and
    ds_i = Σ_j dz_ij — AND, fused, dd_j = Σ_i dz_ij scattered onto this
    layout's SOURCE axis into a lane-packed global-size constant-index
    output (dz is already materialized here; the old ``_bwd_dst`` pass
    re-decoded every forward tile just to rebuild it).  s lives on this
    layout's DST side; d/m/g_num/g_den on its SRC side."""

    def _kernel(ptr_ref, sb_ref, salt_ref, keep_ref, off_ref,
                packed_ref, w_ref, s_ref, d_ref, m_ref, gnum_ref,
                gden_ref, h_ref, dh_ref, ds_ref, dd_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            dh_ref[:] = jnp.zeros_like(dh_ref)
            ds_ref[:] = jnp.zeros_like(ds_ref)

        # dd is ONE global block (constant index map): zero once, then
        # accumulate across the whole sequential grid; written back to
        # HBM at kernel end (same pattern as the GATv2 da reduction)
        @pl.when((b == 0) & (t == 0))
        def _():
            dd_ref[:] = jnp.zeros_like(dd_ref)

        g = ptr_ref[b] + t

        @pl.when(g < ptr_ref[b + 1])
        def _():
            salt, keep, off = salt_ref[0], keep_ref[0], off_ref[0]
            # split's global packed-row base (off is a multiple of
            # src_block, so base is a multiple of rows_per)
            base = (off // 128).astype(jnp.int32)
            grows_all, dz_all = [], []
            for j in range(GROUP):
                sb, src_local, oh_src, oh_dst, wmask = _chunk_scalars(
                    b, j, g, sb_ref, packed_ref, w_ref, salt, keep, off,
                    src_block, dst_block, user_axis)
                start = pl.multiple_of(sb * src_block, src_block)
                gb = gnum_ref[pl.ds(start, src_block), :]
                g_rows = _dot(oh_src.astype(gb.dtype), gb)
                rowsel, lanesel = _packed_sel(src_local, src_block)
                gden_e = _gather_with(gden_ref, sb, rowsel, lanesel,
                                      src_block)
                d_e = _gather_with(d_ref, sb, rowsel, lanesel, src_block)
                m_e = _gather_with(m_ref, sb, rowsel, lanesel, src_block)
                s_e = _dot(oh_dst, s_ref[:, :])[:, 0]
                h_rows = _dot(oh_dst, h_ref[:, :])
                z = s_e + d_e
                # masked logits -> NEG before the shift: with the fused
                # forward, m is the EDGE max and stays NEG for a dst
                # whose incident edges are all dropout-masked — a bare
                # exp(leaky(z) - NEG) would be inf (0*inf = NaN)
                zm = jnp.where(wmask > 0, _leaky(z), NEG)
                e = wmask * jnp.exp(zm - m_e)
                de = jnp.sum(g_rows * h_rows, axis=1) + gden_e
                dz = e * de * _dleaky(z)
                # fused dd: padding/overlap slots carry wmask=0 -> dz=0,
                # so they scatter exact zeros
                _scatter_packed(dd_ref, base, sb, rowsel, lanesel, dz,
                                src_block)
                grows_all.append(g_rows * e[:, None])
                dz_all.append(dz[:, None])

            grows_cat = jnp.concatenate(grows_all, axis=0)
            dz_cat = jnp.concatenate(dz_all, axis=0)
            dst_cat = packed_ref[0].reshape(-1) >> 16
            s_scatter = (jax.lax.broadcasted_iota(
                jnp.int32, (dst_block, GROUP * CHUNK), 0)
                == dst_cat[None, :]).astype(jnp.float32)
            dh_ref[:] += _dot(s_scatter, grows_cat)
            ds_ref[:] += _dot(s_scatter, dz_cat)

    return _kernel


# --- pallas_call wrappers (one split of one direction's layout) -------------

def _meta_specs(n_groups):
    def group_map(b, t, ptr, sb, s_, k_, o_):
        return (jnp.minimum(ptr[b] + t, n_groups - 1), 0, 0)

    return pl.BlockSpec((1, GROUP, CHUNK), group_map,
                        memory_space=pltpu.VMEM)


def _full(shape):
    return pl.BlockSpec(shape, lambda b, t, *_: (0, 0),
                        memory_space=pltpu.VMEM)


def _by_dst(width):
    return pl.BlockSpec(width, lambda b, t, *_: (b, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=(
    'n_dst_blocks', 'max_groups', 'src_block', 'dst_block', 'user_axis',
    'interpret'))
def gat_agg_online(group_ptr, chunk_sb, salt, keep, off, packed, w, s, d,
                   x, num_in, den_in, m_in, *, n_dst_blocks, max_groups,
                   src_block, dst_block, user_axis, interpret=False):
    """Fused forward: (num, den, m) in one pass over the tiles, carrying
    the previous split's accumulators in."""
    meta = _meta_specs(packed.shape[0])
    dcol = x.shape[1]
    return pl.pallas_call(
        _make_agg_online_kernel(src_block, dst_block, user_axis),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_dst_blocks, max_groups),
            in_specs=[meta, meta, _full(s.shape),
                      _by_dst((dst_block, 1)), _full(x.shape),
                      _by_dst((dst_block, dcol)),
                      _by_dst((dst_block, 1)),
                      _by_dst((dst_block, 1))],
            out_specs=[_by_dst((dst_block, dcol)),
                       _by_dst((dst_block, 1)),
                       _by_dst((dst_block, 1))],
        ),
        out_shape=[jax.ShapeDtypeStruct((n_dst_blocks * dst_block, dcol),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_dst_blocks * dst_block, 1),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_dst_blocks * dst_block, 1),
                                        jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(group_ptr, chunk_sb, salt, keep, off, packed, w, s, d, x,
      num_in, den_in, m_in)


@functools.partial(jax.jit, static_argnames=(
    'n_dst_blocks', 'max_groups', 'src_block', 'dst_block', 'user_axis',
    'n_src_rows', 'interpret'))
def gat_bwd_src(group_ptr, chunk_sb, salt, keep, off, packed, w, s, d, m,
                gnum, gden, h, *, n_dst_blocks, max_groups, src_block,
                dst_block, user_axis, n_src_rows, interpret=False):
    """Fused backward pass: (dh, ds) by dst block + the lane-packed
    GLOBAL dd over this layout's source axis (``n_src_rows`` = total
    source rows across ALL splits; each split scatters only its own rows,
    so the XLA-side 'add' combine is exact)."""
    assert n_src_rows % 128 == 0, n_src_rows
    meta = _meta_specs(packed.shape[0])
    dcol = gnum.shape[1]
    return pl.pallas_call(
        _make_bwd_src_kernel(src_block, dst_block, user_axis),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_dst_blocks, max_groups),
            in_specs=[meta, meta,
                      _by_dst((dst_block, 1)),     # s   (this dst side)
                      _full(d.shape),              # d   (this src side)
                      _full(m.shape),
                      _full(gnum.shape),
                      _full(gden.shape),
                      _by_dst((dst_block, dcol))],  # h  (this dst side)
            out_specs=[_by_dst((dst_block, dcol)),
                       _by_dst((dst_block, 1)),
                       _full((n_src_rows // 128, 128))],
        ),
        out_shape=[jax.ShapeDtypeStruct((n_dst_blocks * dst_block, dcol),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_dst_blocks * dst_block, 1),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_src_rows // 128, 128),
                                        jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(group_ptr, chunk_sb, salt, keep, off, packed, w, s, d, m, gnum,
      gden, h)


# --- split orchestration ------------------------------------------------------

def _pad_rows(a, rows):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, 0)))


def _pack(a):
    """(N, 1) scalar column -> lane-packed (N//128, 128) (see
    ``_gather_src_scalar``); split lengths and table paddings are all
    multiples of 128."""
    return a.reshape(-1, 128)


def _init_acc(n_pad, dcol):
    """First-split carry for the online-softmax kernels: empty
    accumulators and a NEG max."""
    return (jnp.zeros((n_pad, dcol), jnp.float32),
            jnp.zeros((n_pad, 1), jnp.float32),
            jnp.full((n_pad, 1), NEG, jnp.float32))


def _run_fwd_splits(tiled, fn, dst_arrays, src_arrays, salt, keep,
                    combine, interpret):
    """Run ``fn`` over a TiledSpMM's source-range splits.

    ``dst_arrays``: (n_dst-padded, c) inputs sliced per dst block inside
    the kernel; ``src_arrays``: (n_src, c) inputs sliced per split here.
    ``combine``: 'add' (element-wise sum) | 'carry' (``fn`` takes the
    previous split's output tuple as extra dst-shaped inputs and
    continues the accumulation IN the kernel — the online-softmax
    forwards use this: an XLA-side combine of full-table per-split
    outputs holds several (n_dst_pad, d) buffers live and blew HBM at
    S3's 31-split tables).
    """
    salt_arr = jnp.asarray(salt, jnp.uint32).reshape(1)
    keep_arr = jnp.asarray(keep, jnp.float32).reshape(1)
    out = None
    for off, length, d in tiled.splits:
        srcs = [jax.lax.dynamic_slice_in_dim(a, off, length, axis=0)
                if len(tiled.splits) > 1 else a for a in src_arrays]
        if combine == 'carry':
            out = fn(d, salt_arr, keep_arr,
                     jnp.asarray([off], jnp.uint32),
                     dst_arrays, srcs, interpret, out)
            continue
        part = fn(d, salt_arr, keep_arr,
                  jnp.asarray([off], jnp.uint32), dst_arrays, srcs,
                  interpret)
        out = part if out is None else jax.tree.map(jnp.add, out, part)
    return out


class _DirSpec:
    """Static kernel parameters of one direction's tiled layout."""

    def __init__(self, tiled):
        self.src_block = tiled.splits[0][2].src_block
        self.dst_block = tiled.splits[0][2].dst_block
        self.user_axis = tiled.user_axis
        self.n_dst_pad = (tiled.splits[0][2].n_dst_blocks
                          * tiled.splits[0][2].dst_block)


def _kw(direction_layout, spec, interpret):
    d = direction_layout
    return dict(n_dst_blocks=d.n_dst_blocks, max_groups=d.max_groups,
                src_block=spec.src_block, dst_block=spec.dst_block,
                user_axis=spec.user_axis, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def gat_att_fused(direction, interpret, op, h_src, s_src, d_dst, salt,
                  keep):
    """(num, den, m_edge) of the masked edge softmax, fused forward.

    ``direction``: 'to_user' | 'to_item' over a unit-weight
    ``PallasGraphOp`` (``op``).  One online-softmax kernel pass per
    split; ``m_edge`` is the per-dst max over SURVIVING edge logits
    (NEG when a dst has none) and carries no gradient (shift
    invariance) — the caller folds the self-loop shift outside.
    """
    fwd = op.l_i2u if direction == 'to_user' else op.l_u2i
    spec = _DirSpec(fwd)
    d_pad = _pad_rows(d_dst, spec.n_dst_pad)

    def fn(layout, salt_a, keep_a, off_a, dsts, srcs, interp, carry):
        if carry is None:
            carry = _init_acc(spec.n_dst_pad, h_src.shape[1])
        return tuple(gat_agg_online(
            layout.group_ptr, layout.chunk_sb, salt_a, keep_a, off_a,
            layout.packed, layout.w, _pack(srcs[0]), dsts[0],
            srcs[1].astype(fwd.x_dtype), *carry,
            **_kw(layout, spec, interp)))

    num, den, m = _run_fwd_splits(fwd, fn, [d_pad], [s_src, h_src],
                                  salt, keep, 'carry', interpret)
    return num[:fwd.n_dst], den[:fwd.n_dst], m[:fwd.n_dst]


def _gas_fwd(direction, interpret, op, h_src, s_src, d_dst, salt, keep):
    out = gat_att_fused(direction, interpret, op, h_src, s_src, d_dst,
                        salt, keep)
    m_dst = out[2]
    return out, (op, h_src, s_src, d_dst, m_dst, salt, keep)


def _gas_bwd(direction, interpret, res, g):
    # backward vs the EDGE shift m (residual): e recomputes per pass
    # exactly as the forward aggregated it, so (g_num, g_den) chain
    # through unchanged; g_m is dropped (the shift is gradient-free by
    # softmax shift invariance).
    op, h_src, s_src, d_dst, m_dst, salt, keep = res
    g_num, g_den, _ = g
    bwd = op.l_u2i if direction == 'to_user' else op.l_i2u

    # --- ONE pass over the transpose tiles: dh_i, ds_i AND dd_j ---------
    # bwd layout: src = forward dst (j), dst = forward src (i); dd_j
    # rides a lane-packed global output scattered onto the source axis
    # (the old second pass re-decoded every forward tile to rebuild dz)
    spec_b = _DirSpec(bwd)
    s_pad = _pad_rows(s_src, spec_b.n_dst_pad)
    h_pad = _pad_rows(h_src, spec_b.n_dst_pad)
    n_src_rows = bwd.splits[-1][0] + bwd.splits[-1][1]

    def fn_src(layout, salt_a, keep_a, off_a, dsts, srcs, interp):
        return tuple(gat_bwd_src(
            layout.group_ptr, layout.chunk_sb, salt_a, keep_a, off_a,
            layout.packed, layout.w, dsts[0], _pack(srcs[0]),
            _pack(srcs[1]), srcs[2].astype(bwd.x_dtype), _pack(srcs[3]),
            dsts[1], n_src_rows=n_src_rows,
            **_kw(layout, spec_b, interp)))

    dh, ds, dd = _run_fwd_splits(
        bwd, fn_src, [s_pad, h_pad],
        [d_dst, m_dst, g_num, g_den], salt, keep, 'add',
        interpret)
    dh = dh[:h_src.shape[0]]
    ds = ds[:s_src.shape[0]]
    dd = dd.reshape(-1, 1)[:d_dst.shape[0]]

    return (_zeros_ct(op), dh, ds, dd, _zeros_ct(salt),
            jnp.zeros_like(keep))


gat_att_fused.defvjp(_gas_fwd, _gas_bwd)


def gat_direction(op, direction, h_src, h_dst, s_src, s_dst, d_dst,
                  salt, keep, interpret=False):
    """One full GAT attention direction with the (never-dropped) self
    loop: returns the softmax-aggregated (n_dst, d) output.

    Semantics match ``models/conv._attention_direction`` exactly:
    per-dst softmax over surviving incoming edges plus the self loop
    (self logit = leaky(s_dst + d_dst), self message = h_dst).  The
    kernel's (num, den) are w.r.t. the edge max; folding in the
    self-loop shift is one row-wise rescale here — values AND gradients
    match the two-shift formulation exactly (both shifts are
    stop-gradded constants by shift invariance).
    """
    s_col = s_src[:, None]
    d_col = d_dst[:, None]
    num, den, m_edge = gat_att_fused(direction, interpret, op, h_src,
                                     s_col, d_col, salt, keep)
    m_edge = jax.lax.stop_gradient(m_edge)
    z_self = _leaky(s_dst + d_dst)[:, None]
    m = jnp.maximum(m_edge, jax.lax.stop_gradient(z_self))
    r = jnp.exp(m_edge - m)   # 0 when a dst has no surviving edges
    e_self = jnp.exp(z_self - m)
    return (num * r + e_self * h_dst) / (den * r + e_self)


# ===========================================================================
# GATv2: logit = a · leaky(hs_i + hd_j) — the leaky is per-edge and d-dim,
# so both endpoint rows gather per chunk (two one-hot MXU matmuls); the
# message is hs_i, already gathered for the logit.  Backward adds da (a
# global (1, d) reduction accumulated in a constant-index output block)
# and d-dim dhd.

def _make_agg2_online_kernel(src_block, dst_block, user_axis):
    """Fused GATv2 forward: online-softmax aggregation (see the GAT
    variant above).  The per-edge d-dim leaky logit and the message rows
    share one ``oh_src`` gather, computed once per chunk."""
    def _kernel(ptr_ref, sb_ref, salt_ref, keep_ref, off_ref,
                packed_ref, w_ref, hs_ref, hd_ref, a_ref,
                num_in_ref, den_in_ref, m_in_ref,
                num_ref, den_ref, m_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        # split carry copy-in (see the GAT kernel above)
        @pl.when(t == 0)
        def _():
            num_ref[:] = num_in_ref[:]
            den_ref[:] = den_in_ref[:]
            m_ref[:] = m_in_ref[:]

        g = ptr_ref[b] + t

        @pl.when(g < ptr_ref[b + 1])
        def _():
            salt, keep, off = salt_ref[0], keep_ref[0], off_ref[0]
            rows_l, z_l, w_l = [], [], []
            m_cur = m_ref[:]
            for j in range(GROUP):
                sb, src_local, oh_src, oh_dst, wmask = _chunk_scalars(
                    b, j, g, sb_ref, packed_ref, w_ref, salt, keep, off,
                    src_block, dst_block, user_axis)
                start = pl.multiple_of(sb * src_block, src_block)
                hsb = hs_ref[pl.ds(start, src_block), :]
                rows_s = _dot(oh_src.astype(hsb.dtype), hsb)
                u = rows_s + _dot(oh_dst, hd_ref[:, :])
                logit = _dot(_leaky(u), a_ref[:, :])[:, 0]
                z = jnp.where(wmask > 0, logit, NEG)
                m_cur = jnp.maximum(m_cur, jnp.max(
                    jnp.where(oh_dst.T > 0, z[None, :], NEG),
                    axis=1, keepdims=True))
                rows_l.append(rows_s)
                z_l.append(z)
                w_l.append(wmask)
            r = jnp.exp(m_ref[:] - m_cur)
            num_ref[:] = num_ref[:] * r
            den_ref[:] = den_ref[:] * r
            m_ref[:] = m_cur
            rows_all, e_all = [], []
            for j in range(GROUP):
                dst_local = packed_ref[0, j, :] >> 16
                oh_dst = (dst_local[:, None] == jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, dst_block), 1)) \
                    .astype(jnp.float32)
                m_e = _dot(oh_dst, m_cur)[:, 0]
                e = w_l[j] * jnp.exp(z_l[j] - m_e)
                rows_all.append(rows_l[j] * e[:, None])
                e_all.append(e[:, None])

            rows_cat = jnp.concatenate(rows_all, axis=0)
            e_cat = jnp.concatenate(e_all, axis=0)
            dst_cat = packed_ref[0].reshape(-1) >> 16
            s_scatter = (jax.lax.broadcasted_iota(
                jnp.int32, (dst_block, GROUP * CHUNK), 0)
                == dst_cat[None, :]).astype(jnp.float32)
            num_ref[:] += _dot(s_scatter, rows_cat)
            den_ref[:] += _dot(s_scatter, e_cat)

    return _kernel


def _make_bwd2_src_kernel(src_block, dst_block, user_axis, pack):
    """Transpose tiles (src = fwd dst j, dst = fwd src i):
    dhs_i = Σ_j [ e_ij g_j + dz_ij (a ⊙ λvec_ij) ],  dz = e·(g_j·hs_i
    + g_den_j) — FUSED with the source-axis outputs the old
    ``_bwd2_dst`` pass re-decoded every forward tile for:
    dhd_j = Σ_i dz_ij (a ⊙ λvec_ij) (same per-edge ``lam·dz`` vector as
    the dhs term, since u is symmetric in hs_i and hd_j) scattered onto
    this layout's SOURCE axis, and the global da = Σ_ij dz_ij leaky(u).

    ``pack`` packs ``pack`` d-wide table rows per 128-lane VMEM row of
    the dhd output (pack = 128//d when d divides 128) so the
    constant-index resident block wastes no lanes; the scatter builds
    one (CHUNK, src_block/pack) one-hot per parity class — same total
    MXU flops as one unpacked scatter."""

    def _kernel(ptr_ref, sb_ref, salt_ref, keep_ref, off_ref,
                packed_ref, w_ref, hs_ref, hd_ref, a_ref, m_ref,
                gnum_ref, gden_ref, dhs_ref, dhd_ref, da_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            dhs_ref[:] = jnp.zeros_like(dhs_ref)

        # dhd/da are constant-index blocks: zero once, accumulate across
        # the sequential grid (dhd is PER-SPLIT sized — d-dim rows are
        # too big for a global block — so the Python side combines split
        # parts at their row offsets)
        @pl.when((b == 0) & (t == 0))
        def _():
            dhd_ref[:] = jnp.zeros_like(dhd_ref)
            da_ref[:] = jnp.zeros_like(da_ref)

        g = ptr_ref[b] + t

        @pl.when(g < ptr_ref[b + 1])
        def _():
            salt, keep, off = salt_ref[0], keep_ref[0], off_ref[0]
            rows_all = []
            da_acc = jnp.zeros_like(da_ref)
            sub = src_block // pack
            for j in range(GROUP):
                sb, src_local, oh_src, oh_dst, wmask = _chunk_scalars(
                    b, j, g, sb_ref, packed_ref, w_ref, salt, keep, off,
                    src_block, dst_block, user_axis)
                start = pl.multiple_of(sb * src_block, src_block)
                # this layout: hs on DST side (by b), hd/m/g on SRC side
                rows_s = _dot(oh_dst, hs_ref[:, :])
                hdb = hd_ref[pl.ds(start, src_block), :]
                u = rows_s + _dot(oh_src.astype(hdb.dtype), hdb)
                lk = _leaky(u)
                logit = _dot(lk, a_ref[:, :])[:, 0]
                rowsel, lanesel = _packed_sel(src_local, src_block)
                m_e = _gather_with(m_ref, sb, rowsel, lanesel, src_block)
                # masked -> NEG before the shift (see gat bwd_src)
                e = wmask * jnp.exp(
                    jnp.where(wmask > 0, logit, NEG) - m_e)
                gb = gnum_ref[pl.ds(start, src_block), :]
                g_rows = _dot(oh_src.astype(gb.dtype), gb)
                gden_e = _gather_with(gden_ref, sb, rowsel, lanesel,
                                      src_block)
                de = jnp.sum(g_rows * rows_s, axis=1) + gden_e
                dz = e * de
                lam = _dleaky(u) * a_ref[:, :].T          # (CHUNK, d)
                lamdz = lam * dz[:, None]
                rows_all.append(g_rows * e[:, None] + lamdz)
                # fused dhd: scatter the SAME lam·dz rows onto the
                # source axis, pack rows per 128-lane output row;
                # padding/overlap slots have dz=0 and scatter zeros
                parts = []
                for par in range(pack):
                    # one 2-D i32 compare (src_local == r*pack + par):
                    # Mosaic cannot insert a minor dim on an i1 vector,
                    # so the parity test must not be a separate 1-D mask
                    ohp = (src_local[:, None] == jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, sub), 1) * pack + par) \
                        .astype(jnp.float32)
                    parts.append(_dot(ohp.T, lamdz))
                contrib = (parts[0] if pack == 1
                           else jnp.concatenate(parts, axis=1))
                pstart = pl.multiple_of(sb * sub, sub)
                dhd_ref[pl.ds(pstart, sub), :] += contrib
                da_acc += jnp.sum(lk * dz[:, None], axis=0,
                                  keepdims=True)

            rows_cat = jnp.concatenate(rows_all, axis=0)
            dst_cat = packed_ref[0].reshape(-1) >> 16
            s_scatter = (jax.lax.broadcasted_iota(
                jnp.int32, (dst_block, GROUP * CHUNK), 0)
                == dst_cat[None, :]).astype(jnp.float32)
            dhs_ref[:] += _dot(s_scatter, rows_cat)
            da_ref[:] += da_acc

    return _kernel


@functools.partial(jax.jit, static_argnames=(
    'n_dst_blocks', 'max_groups', 'src_block', 'dst_block', 'user_axis',
    'interpret'))
def gatv2_agg_online(group_ptr, chunk_sb, salt, keep, off, packed, w, hs,
                     hd, a, num_in, den_in, m_in, *, n_dst_blocks,
                     max_groups, src_block, dst_block, user_axis,
                     interpret=False):
    """Fused GATv2 forward: (num, den, m) in one pass over the tiles,
    carrying the previous split's accumulators in."""
    meta = _meta_specs(packed.shape[0])
    dcol = hs.shape[1]
    return pl.pallas_call(
        _make_agg2_online_kernel(src_block, dst_block, user_axis),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_dst_blocks, max_groups),
            in_specs=[meta, meta, _full(hs.shape),
                      _by_dst((dst_block, dcol)), _full(a.shape),
                      _by_dst((dst_block, dcol)),
                      _by_dst((dst_block, 1)),
                      _by_dst((dst_block, 1))],
            out_specs=[_by_dst((dst_block, dcol)),
                       _by_dst((dst_block, 1)),
                       _by_dst((dst_block, 1))],
        ),
        out_shape=[jax.ShapeDtypeStruct((n_dst_blocks * dst_block, dcol),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_dst_blocks * dst_block, 1),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_dst_blocks * dst_block, 1),
                                        jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(group_ptr, chunk_sb, salt, keep, off, packed, w, hs, hd, a,
      num_in, den_in, m_in)


def _dhd_pack(dcol):
    """Table rows per 128-lane row of the packed dhd output."""
    return 128 // dcol if (dcol <= 128 and 128 % dcol == 0) else 1


@functools.partial(jax.jit, static_argnames=(
    'n_dst_blocks', 'max_groups', 'src_block', 'dst_block', 'user_axis',
    'interpret'))
def gatv2_bwd_src(group_ptr, chunk_sb, salt, keep, off, packed, w, hs,
                  hd, a, m, gnum, gden, *, n_dst_blocks, max_groups,
                  src_block, dst_block, user_axis, interpret=False):
    """Fused backward pass: dhs by dst block + this split's packed dhd
    over the source axis + the global (1, d) da reduction."""
    meta = _meta_specs(packed.shape[0])
    dcol = hd.shape[1]
    pack = _dhd_pack(dcol)
    n_rows = hd.shape[0]
    da_spec = pl.BlockSpec((1, dcol), lambda b, t, *_: (0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_bwd2_src_kernel(src_block, dst_block, user_axis, pack),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_dst_blocks, max_groups),
            in_specs=[meta, meta,
                      _by_dst((dst_block, dcol)),   # hs (this dst side)
                      _full(hd.shape),              # hd (this src side)
                      _full(a.shape),
                      _full(m.shape),
                      _full(gnum.shape),
                      _full(gden.shape)],
            out_specs=[_by_dst((dst_block, dcol)),
                       _full((n_rows // pack, pack * dcol)),
                       da_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct((n_dst_blocks * dst_block, dcol),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_rows // pack, pack * dcol),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((1, dcol), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS_BWD2,
    )(group_ptr, chunk_sb, salt, keep, off, packed, w, hs, hd, a, m,
      gnum, gden)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def gatv2_att_fused(direction, interpret, op, hs_src, hd_dst, a_col,
                    salt, keep):
    """(num, den, m_edge) of the GATv2 masked edge softmax, fused
    forward (see ``gat_att_fused``)."""
    fwd = op.l_i2u if direction == 'to_user' else op.l_u2i
    spec = _DirSpec(fwd)
    hd_pad = _pad_rows(hd_dst, spec.n_dst_pad)

    def fn(layout, salt_a, keep_a, off_a, dsts, srcs, interp, carry):
        if carry is None:
            carry = _init_acc(spec.n_dst_pad, hs_src.shape[1])
        return tuple(gatv2_agg_online(
            layout.group_ptr, layout.chunk_sb, salt_a, keep_a, off_a,
            layout.packed, layout.w, srcs[0].astype(fwd.x_dtype),
            dsts[0], a_col, *carry, **_kw(layout, spec, interp)))

    num, den, m = _run_fwd_splits(fwd, fn, [hd_pad], [hs_src],
                                  salt, keep, 'carry', interpret)
    return num[:fwd.n_dst], den[:fwd.n_dst], m[:fwd.n_dst]


def _g2s_fwd(direction, interpret, op, hs_src, hd_dst, a_col, salt,
             keep):
    out = gatv2_att_fused(direction, interpret, op, hs_src, hd_dst,
                          a_col, salt, keep)
    m_dst = out[2]
    return out, (op, hs_src, hd_dst, a_col, m_dst, salt, keep)


def _g2s_bwd(direction, interpret, res, g):
    # backward vs the EDGE shift (see _gas_bwd)
    op, hs_src, hd_dst, a_col, m_dst, salt, keep = res
    g_num, g_den, _ = g
    bwd = op.l_u2i if direction == 'to_user' else op.l_i2u

    # ONE pass over the transpose tiles: dhs (by dst block), this
    # split's packed dhd slab (source axis), and the global da — the
    # old second pass re-decoded every forward tile for dhd/da.  dhd
    # parts are per-split sized (a global d-dim block would not fit
    # VMEM), so they combine HERE at their split row offsets; the
    # rebased final split's overlap rows carry no edges -> zero parts,
    # so offset-ADD (not overwrite) is exact.
    spec_b = _DirSpec(bwd)
    hs_pad = _pad_rows(hs_src, spec_b.n_dst_pad)
    dcol = hs_src.shape[1]
    salt_arr = jnp.asarray(salt, jnp.uint32).reshape(1)
    keep_arr = jnp.asarray(keep, jnp.float32).reshape(1)
    multi = len(bwd.splits) > 1
    dhs = da = None
    dhd = jnp.zeros((hd_dst.shape[0], dcol), jnp.float32)
    for off, length, layout in bwd.splits:
        srcs = [jax.lax.dynamic_slice_in_dim(arr, off, length, axis=0)
                if multi else arr
                for arr in (hd_dst, m_dst, g_num, g_den)]
        p_dhs, p_dhd, p_da = gatv2_bwd_src(
            layout.group_ptr, layout.chunk_sb, salt_arr, keep_arr,
            jnp.asarray([off], jnp.uint32), layout.packed, layout.w,
            hs_pad, srcs[0].astype(bwd.x_dtype), a_col, _pack(srcs[1]),
            srcs[2].astype(bwd.x_dtype), _pack(srcs[3]),
            **_kw(layout, spec_b, interpret))
        dhs = p_dhs if dhs is None else dhs + p_dhs
        da = p_da if da is None else da + p_da
        part = p_dhd.reshape(-1, dcol)[:length]
        if multi:
            cur = jax.lax.dynamic_slice_in_dim(dhd, off, length, axis=0)
            dhd = jax.lax.dynamic_update_slice_in_dim(
                dhd, cur + part, off, axis=0)
        else:
            dhd = part[:hd_dst.shape[0]]
    dhs = dhs[:hs_src.shape[0]]

    return (_zeros_ct(op), dhs, dhd, da.T, _zeros_ct(salt),
            jnp.zeros_like(keep))


gatv2_att_fused.defvjp(_g2s_fwd, _g2s_bwd)


def gatv2_direction(op, direction, hs_src, hs_dst, hd_dst, a, salt, keep,
                    interpret=False):
    """One full GATv2 attention direction incl. the self loop (self
    logit = a·leaky(hs_dst + hd_dst), self message = hs_dst) — matches
    ``models/conv.conv_layer``'s 'gatv2' branch exactly."""
    a_col = a[:, None]
    num, den, m_edge = gatv2_att_fused(direction, interpret, op, hs_src,
                                       hd_dst, a_col, salt, keep)
    m_edge = jax.lax.stop_gradient(m_edge)
    z_self = (_leaky(hs_dst + hd_dst) @ a)[:, None]
    m = jnp.maximum(m_edge, jax.lax.stop_gradient(z_self))
    r = jnp.exp(m_edge - m)   # fold the self-loop shift (see GAT)
    e_self = jnp.exp(z_self - m)
    return (num * r + e_self * hs_dst) / (den * r + e_self)
