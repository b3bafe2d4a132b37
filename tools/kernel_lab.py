"""Kernel experiment lab: variant timing for the tiled one-hot SpMM.

Runs on the real TPU; measures with the chain-difference method (the only
reliable timing through the axon relay).  Not part of the library —
development tooling for picking kernel parameters.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import textgcn_tpu.ops.pallas_spmm as P

E, NI, NU, D = 600_000, 25_000, 60_000, 64
rng = np.random.RandomState(0)
SRC = rng.randint(0, NI, E).astype(np.int32)
DST = rng.randint(0, NU, E).astype(np.int32)
W = rng.rand(E).astype(np.float32)


def chain_time(call, x, n1=4, n2=14, reps=3):
    def chain(n):
        @jax.jit
        def f(x):
            dt = x.dtype  # keep every link at the INPUT dtype: the f32
            # `out` would otherwise promote x after link 1 and the
            # measured links would all run f32 regardless of the x fed in
            acc = jnp.float32(0)
            for _ in range(n):
                out = call(x)
                x = (x + out[:x.shape[0]].sum() * 1e-12).astype(dt)
                acc += out.sum()
            return acc
        return f
    fa, fb = chain(n1), chain(n2)
    float(fa(x)); float(fb(x))
    def t(f):
        t0 = time.perf_counter()
        for _ in range(reps):
            float(f(x))
        return (time.perf_counter() - t0) / reps * 1e3
    return (t(fb) - t(fa)) / (n2 - n1)


def make_variant(mode, precision):
    op = P.PallasDirection(SRC, DST, W, NI, NU)
    G, C, DB, SB = P.GROUP, P.CHUNK, P.DST_BLOCK, P.SRC_BLOCK

    def kern(ptr_ref, sb_ref, packed_ref, w_ref, x_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        g = ptr_ref[b] + t

        @pl.when(g < ptr_ref[b + 1])
        def _():
            if mode in ('merged_scatter', 'scat_bf16'):
                # scat_bf16: scatter one-hot + weighted rows in bf16 (the
                # gather side is already bf16 when x is bf16); the scatter
                # matmul accumulates f32 as before.  Halves the largest
                # VPU-materialized tensor per group (the (DB, G*C) one-hot).
                scat_t = jnp.bfloat16 if mode == 'scat_bf16' else jnp.float32
                rows_all = []
                for j in range(G):
                    sb = sb_ref[g * G + j]
                    packed = packed_ref[0, j, :]
                    src_local = packed & 0xFFFF
                    start = pl.multiple_of(sb * SB, SB)
                    xb = x_ref[pl.ds(start, SB), :]
                    s_g = (src_local[:, None] == jax.lax.broadcasted_iota(
                        jnp.int32, (C, SB), 1)).astype(xb.dtype)
                    rows = jnp.dot(s_g, xb, precision=precision,
                                   preferred_element_type=jnp.float32)
                    rows_all.append((rows * w_ref[0, j, :][:, None])
                                    .astype(scat_t))
                rows_cat = jnp.concatenate(rows_all, axis=0)   # (G*C, D)
                dst_all = (packed_ref[0].reshape(-1) >> 16)    # (G*C,)
                s_s = (jax.lax.broadcasted_iota(
                    jnp.int32, (DB, G * C), 0)
                    == dst_all[None, :]).astype(scat_t)
                out_ref[:] += jnp.dot(s_s, rows_cat, precision=precision,
                                      preferred_element_type=jnp.float32)
                return
            acc = jnp.zeros_like(out_ref)
            for j in range(G):
                sb = sb_ref[g * G + j]
                packed = packed_ref[0, j, :]
                src_local = packed & 0xFFFF
                dst_local = packed >> 16
                start = pl.multiple_of(sb * SB, SB)
                xb = x_ref[pl.ds(start, SB), :]
                if mode == 'no_gather':
                    rows = xb[:C, :] * w_ref[0, j, :][:, None]
                else:
                    # gather one-hot in x's dtype, matching production
                    # (ops/pallas_spmm.py) — f32 one-hots against bf16 x
                    # would time a mixed-precision dot production never runs
                    s_g = (src_local[:, None] == jax.lax.broadcasted_iota(
                        jnp.int32, (C, SB), 1)).astype(xb.dtype)
                    rows = jnp.dot(s_g, xb, precision=precision,
                                   preferred_element_type=jnp.float32)
                    rows = rows * w_ref[0, j, :][:, None]
                if mode == 'no_scatter':
                    acc = acc + jnp.concatenate(
                        [rows, jnp.zeros((DB - C, D), jnp.float32)], axis=0)
                else:
                    s_s = (jax.lax.broadcasted_iota(
                        jnp.int32, (DB, C), 0)
                        == dst_local[None, :]).astype(jnp.float32)
                    acc = acc + jnp.dot(s_s, rows, precision=precision,
                                        preferred_element_type=jnp.float32)
            out_ref[:] += acc

    @jax.jit
    def call(x):
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(op.n_dst_blocks, op.max_groups),
                in_specs=[
                    pl.BlockSpec((1, G, C),
                                 lambda b, t, ptr, sb: (
                                     jnp.minimum(ptr[b] + t,
                                                 op.n_groups - 1), 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, G, C),
                                 lambda b, t, ptr, sb: (
                                     jnp.minimum(ptr[b] + t,
                                                 op.n_groups - 1), 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(x.shape, lambda b, t, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((DB, D), lambda b, t, *_: (b, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (op.n_dst_blocks * DB, D), jnp.float32),
        )(op.group_ptr, op.chunk_sb, op.packed, op.w, x)
        return out

    x = np.zeros((op.n_src_padded, D), np.float32)
    x[:NI] = rng.randn(NI, D)
    xj = jnp.asarray(x)
    # x dtype is uniform across ALL modes so ablations vary exactly one
    # thing (kernel structure).  Production feeds the kernel bf16 x at
    # DEFAULT precision; override with TEXTGCN_TPU_LAB_XDTYPE=f32.
    if os.environ.get('TEXTGCN_TPU_LAB_XDTYPE', 'bf16') != 'f32':
        xj = xj.astype(jnp.bfloat16)
    return call, xj, op


def main():
    import sys
    # TEXTGCN_TPU_LAB_GROUP overrides the chunks-per-DMA group size for
    # the whole layout + kernel (module global, read at build time)
    lab_group = os.environ.get('TEXTGCN_TPU_LAB_GROUP', '')
    if lab_group:
        P.GROUP = int(lab_group)
    modes = sys.argv[1:] or ['full', 'no_gather', 'no_scatter',
                             'merged_scatter']
    for mode in modes:
        for prec in (jax.lax.Precision.DEFAULT,):
            call, x, op = make_variant(mode, prec)
            ms = chain_time(call, x)
            print(f'{mode:16s} {str(prec):10s} GROUP={P.GROUP:2d} '
                  f'x={x.dtype}: {ms:6.2f} ms/call')


if __name__ == '__main__':
    main()
