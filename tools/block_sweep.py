"""Kernel tile-parameter sweep on a sparse (S2-shaped) graph.

The S2/S3 scale results showed per-edge cost rising from ~34 ns (S1,
lambda~105 expected edges/tile) to ~90-100 ns at lower densities — chunk
padding inflation (pad ~ 1 + CHUNK/(2*lambda)).  This lab measures the
fused dropout kernel per direction across (src_block, dst_block)
variants (and optionally CHUNK via argv) to recalibrate
``plan_tile_blocks``.

Usage: python tools/block_sweep.py [CHUNK]
(CHUNK must be set before kernels build; run per-CHUNK in separate
processes — the jit cache does not key on the module constant.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK_OVERRIDE = int(sys.argv[1]) if len(sys.argv) > 1 else None

import textgcn_tpu.ops.pallas_spmm as P  # noqa: E402

if CHUNK_OVERRIDE:
    P.CHUNK = CHUNK_OVERRIDE

from textgcn_tpu.cli import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N_USERS, N_ITEMS, DEG, D = 200_000, 80_000, 10, 64
rng = np.random.RandomState(0)
EU = rng.randint(0, N_USERS, N_USERS * DEG).astype(np.int32)
EI = rng.randint(0, N_ITEMS, N_USERS * DEG).astype(np.int32)
pairs = np.unique(np.stack([EU, EI], 1), axis=0)
EU, EI = pairs[:, 0], pairs[:, 1]
W = rng.rand(len(EU)).astype(np.float32)
NU_T = -(-N_USERS // 4096) * 4096
NI_T = -(-N_ITEMS // 4096) * 4096
N_EDGES = len(EU)


def chain_time(op, x, n1=2, n2=8, reps=3):
    def chain(n):
        @jax.jit
        def f(x, op):
            acc = jnp.float32(0)
            for _ in range(n):
                out = op(x, jnp.uint32(3), jnp.float32(0.6))
                acc += out.sum()
                x = x + acc * 1e-18
            return acc
        return f
    fa, fb = chain(n1), chain(n2)
    float(fa(x, op))
    float(fb(x, op))

    def t(f):
        t0 = time.perf_counter()
        for _ in range(reps):
            float(f(x, op))
        return (time.perf_counter() - t0) / reps * 1e3
    return (t(fb) - t(fa)) / (n2 - n1)


def run(direction, variants):
    if direction == 'u2i':
        src, dst, n_src, n_dst, ua = EU, EI, NU_T, NI_T, 'src'
    else:
        src, dst, n_src, n_dst, ua = EI, EU, NI_T, NU_T, 'dst'
    x = jnp.asarray(rng.randn(n_src, D).astype(np.float32) * 0.1)
    for sb, db in variants:
        if n_src % sb:
            continue
        t0 = time.perf_counter()
        op = P.TiledSpMM(src, dst, W, n_src, n_dst, D, user_axis=ua,
                         src_block=sb, dst_block=db)
        build = time.perf_counter() - t0
        ms = chain_time(op, x)
        print(f'{direction} chunk={P.CHUNK} sb={sb} db={db} '
              f'splits={len(op.splits)} '
              f'{ms:8.2f} ms  {ms * 1e6 / N_EDGES:6.1f} ns/edge '
              f'(build {build:.0f}s)', flush=True)


VARIANTS = [(512, 512), (1024, 512), (512, 1024), (1024, 1024),
            (2048, 512), (512, 2048)]
if __name__ == '__main__':
    run('u2i', VARIANTS)
    run('i2u', VARIANTS)
