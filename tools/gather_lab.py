"""Gather-formulation experiment: per-row async-DMA gather vs one-hot.

VERDICT r2 asked for ONE measured gather-based variant beyond the
one-hot family (docs/KERNEL.md roofline: an ideal row-gather engine
would be HBM-bound at ~0.28 ms per 600k-edge direction vs the measured
1.43 ms).  This lab isolates the gather stage both ways:

* ``onehot`` — the production formulation's gather stage: per chunk,
  a (C, SRC_BLOCK) one-hot MXU matmul selects the chunk's rows from a
  VMEM-resident source block (x streamed HBM->VMEM by the pipeline).
* ``dma`` — per-edge row gather: x stays in HBM (memory_space=ANY) and
  the kernel issues one sliced async copy per edge row into VMEM
  scratch, C=128 DMAs in flight per grid step.

Both kernels consume the same ids and write the gathered rows out (so
nothing is DCE'd); the difference is purely the gather mechanism.
Rows/ms for the ``dma`` mode is the measured upper bound for ANY
per-edge-DMA SpMM on this hardware.

Measured (v5e, round 3): onehot 338k rows/ms (1.78 ms / 600k rows,
d=64) vs dma 43k rows/ms (3.03 ms / 131k rows, d=128 — its best case).
The DMA formulation loses ~8x on the gather stage alone; details in
SCALE.md ("Per-row async-DMA gather").

Run on the real TPU:  python tools/gather_lab.py [onehot dma]
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

from tools.kernel_lab import chain_time  # noqa: E402  (same harness)

N_ROWS = 600_064          # gathered rows per call (S1 edge count, /C)
N_SRC = 25_000            # source table rows (S1 item side)
D = 64
C = 128                   # ids per grid step (the kernel's chunk size)
SB = 512                  # source block rows (onehot mode)

rng = np.random.RandomState(0)


def make_onehot(ids_sorted: np.ndarray):
    """Gather stage as production runs it: ids sorted by source block so
    each grid step touches ONE (SB, D) x block; the (C, SB) one-hot
    matmul selects its rows.  x enters VMEM through the normal Pallas
    pipeline (block index map driven by the prefetched block ids)."""
    # group ids by source block and pad each block's run to a multiple of
    # C (repeating the block's first id, <1% extra slots) so no chunk
    # straddles a block boundary — every chunk's local ids really index
    # its own x block and the gathered rows are correct, not just
    # shape-correct
    blocks = ids_sorted // SB
    runs = []
    for b in np.unique(blocks):
        grp = ids_sorted[blocks == b]
        pad = (-len(grp)) % C
        runs.append(np.concatenate(
            [grp, np.full(pad, grp[0], grp.dtype)]))
    ids_sorted = np.concatenate(runs)
    n_chunks = len(ids_sorted) // C
    sb_of_chunk = (ids_sorted.reshape(n_chunks, C)[:, 0] // SB).astype(
        np.int32)
    local = (ids_sorted % SB).astype(np.int32)
    n_src_padded = -(-N_SRC // SB) * SB

    def kern(sb_ref, ids_ref, x_ref, out_ref):
        src_local = ids_ref[0, 0, :]
        oh = (src_local[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (C, SB), 1)).astype(x_ref.dtype)
        out_ref[:] = jnp.dot(oh, x_ref[:],
                             preferred_element_type=jnp.float32)

    @jax.jit
    def call(x):
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec((1, 1, C), lambda t, sb: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((SB, D), lambda t, sb: (sb[t], 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((C, D), lambda t, sb: (t, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((n_chunks * C, D), jnp.float32),
        )(jnp.asarray(sb_of_chunk), jnp.asarray(local).reshape(n_chunks, 1, C),
          x)
        return out

    return call, n_src_padded


def make_dma(ids: np.ndarray):
    """Per-row async-DMA gather: x lives in HBM; each grid step issues C
    sliced copies (one per id) into VMEM scratch, all in flight before
    the first wait.  This is the fastest per-edge-DMA schedule the
    hardware exposes from inside a kernel.

    Mosaic requires DMA slices 128-lane aligned, so this mode runs at
    d=128 (a d=64 row cannot be row-DMA'd at all — itself a finding);
    wider rows amortize per-DMA overhead better, i.e. this is the DMA
    formulation's BEST case."""
    # scalar-prefetched ids live in SMEM (~1 MB): cap the row count and
    # compare rows/ms (the per-row rate is the quantity under test)
    ids = ids[:131_072]
    n_chunks = len(ids) // C
    DP = 128

    def kern(ids_ref, x_hbm, out_ref, scratch, sems):
        t = pl.program_id(0)

        def start(i, _):
            row = ids_ref[t * C + i]
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(row, 1), :],
                scratch.at[pl.ds(i, 1), :],
                sems.at[i],
            ).start()
            return _

        def wait(i, _):
            row = ids_ref[t * C + i]
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(row, 1), :],
                scratch.at[pl.ds(i, 1), :],
                sems.at[i],
            ).wait()
            return _

        jax.lax.fori_loop(0, C, start, 0)
        jax.lax.fori_loop(0, C, wait, 0)
        out_ref[:] = scratch[:]

    @jax.jit
    def call(x):
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
                ],
                out_specs=pl.BlockSpec((C, DP), lambda t, ids: (t, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((C, DP), jnp.float32),
                    pltpu.SemaphoreType.DMA((C,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((n_chunks * C, DP), jnp.float32),
        )(jnp.asarray(ids), x)
        return out

    n_src_padded = -(-N_SRC // SB) * SB
    return call, n_src_padded


def main():
    modes = sys.argv[1:] or ['onehot', 'dma']
    ids = rng.randint(0, N_SRC, N_ROWS).astype(np.int32)
    for mode in modes:
        if mode == 'onehot':
            call, n_pad = make_onehot(np.sort(ids))
            d = D
        else:
            call, n_pad = make_dma(ids)
            d = 128  # DMA slices must be 128-lane aligned (see make_dma)
        n_rows = N_ROWS if mode == 'onehot' else 131_072
        x = np.zeros((n_pad, d), np.float32)
        x[:N_SRC] = rng.randn(N_SRC, d)
        # f32 for BOTH modes (one varying factor; DMA src/dst dtypes
        # must also match, and HBM row-DMAs of bf16 rows are not
        # expressible at d=64 anyway)
        xj = jnp.asarray(x)
        ms = chain_time(call, xj)
        print(f'{mode:8s}: {ms:8.2f} ms / {n_rows:,} rows '
              f'({n_rows / ms / 1e3:,.0f}k rows/ms)')


if __name__ == '__main__':
    main()
