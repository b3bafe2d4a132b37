"""Roofline accounting for the tiled one-hot SpMM kernel.

Builds the S1 lab layout (same graph as tools/kernel_lab.py: 600k random
edges, 25k -> 60k, d=64) on the host and derives the honest efficiency
numbers for KERNEL.md/SCALE.md:

* executed MXU FLOPs per call (the one-hot formulation burns
  (S + D) * d * 2 dense FLOPs per padded edge slot to deliver 2 * d
  useful FLOPs per real edge),
* useful-FLOP "MFU" (useful FLOPs / measured time / peak),
* the HBM roofline bound of the abstract SpMM: the no-reuse row-traffic
  model (every edge moves one d-row in and one d-row out of HBM) and the
  compulsory-traffic model (table + metadata + output, perfect reuse),

against the measured per-call time (chain-difference, tools/kernel_lab).

Pure host-side numpy — runs anywhere; pass --ms to use a fresh
measurement.  Peak numbers are v5e: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197e12
V5E_HBM_GBS = 819e9


def layout_stats(src, dst, w, n_src, n_dst, d):
    import textgcn_tpu.ops.pallas_spmm as P

    op = P.PallasDirection(src, dst, w, n_src, n_dst)
    C, G = P.CHUNK, P.GROUP
    S, D = op.src_block, op.dst_block
    n_edges = len(src)
    # executed chunks: group_ptr delimits each dst block's real groups
    gptr = np.asarray(op.group_ptr)
    n_exec_groups = int(np.diff(gptr).sum())
    slots = n_exec_groups * G * C               # padded edge slots executed

    gather_flops = n_exec_groups * G * C * S * d * 2
    scatter_flops = n_exec_groups * D * (G * C) * d * 2
    mxu_flops = gather_flops + scatter_flops
    useful_flops = 2 * n_edges * d

    # HBM models
    x_bytes = op.n_src_padded * d * 2           # bf16 table, read once
    meta_bytes = n_exec_groups * G * C * (4 + 4)  # packed + w
    out_bytes = op.n_dst_blocks * D * d * 4       # f32 result, written once
    compulsory = x_bytes + meta_bytes + out_bytes
    # no-reuse row-traffic: each edge moves its source row in (bf16) and
    # its destination row out (f32) — what an ideal latency-hiding
    # row-gather/scatter with zero caching would pay
    no_reuse = n_edges * d * (2 + 4)

    return {
        'n_edges': n_edges, 'slots': slots,
        'padding_x': slots / n_edges,
        'blocks': (S, D),
        'mxu_flops': mxu_flops, 'useful_flops': useful_flops,
        'compulsory_bytes': compulsory, 'no_reuse_bytes': no_reuse,
    }


def report(stats, measured_ms):
    t = measured_ms / 1e3
    ideal_mxu_ms = stats['mxu_flops'] / V5E_BF16_TFLOPS * 1e3
    ideal_noreuse_ms = stats['no_reuse_bytes'] / V5E_HBM_GBS * 1e3
    ideal_comp_ms = stats['compulsory_bytes'] / V5E_HBM_GBS * 1e3
    print(f"edges {stats['n_edges']:,} -> padded slots "
          f"{stats['slots']:,} ({stats['padding_x']:.2f}x), "
          f"blocks {stats['blocks']}")
    print(f"executed MXU FLOPs/call:  {stats['mxu_flops'] / 1e9:8.1f} "
          f"GFLOP -> {stats['mxu_flops'] / t / 1e12:5.1f} TFLOP/s "
          f"({stats['mxu_flops'] / t / V5E_BF16_TFLOPS * 100:4.1f}% of "
          f"bf16 peak; MXU-bound floor {ideal_mxu_ms:.2f} ms)")
    print(f"useful FLOPs/call:        {stats['useful_flops'] / 1e6:8.1f} "
          f"MFLOP -> useful-FLOP MFU "
          f"{stats['useful_flops'] / t / V5E_BF16_TFLOPS * 100:.4f}%")
    print(f"HBM no-reuse row model:   "
          f"{stats['no_reuse_bytes'] / 1e6:8.1f} MB -> "
          f"{ideal_noreuse_ms:.2f} ms bound "
          f"({measured_ms / ideal_noreuse_ms:.1f}x headroom vs measured "
          f"{measured_ms:.2f} ms)")
    print(f"HBM compulsory traffic:   "
          f"{stats['compulsory_bytes'] / 1e6:8.1f} MB -> "
          f"{ideal_comp_ms:.3f} ms bound")


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ms', type=float, default=1.43,
                   help='measured ms/call (kernel_lab chain difference, '
                        'production bf16 x)')
    p.add_argument('--edges', type=int, default=600_000)
    p.add_argument('--n_src', type=int, default=25_000)
    p.add_argument('--n_dst', type=int, default=60_000)
    p.add_argument('--d', type=int, default=64)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    src = rng.randint(0, args.n_src, args.edges).astype(np.int32)
    dst = rng.randint(0, args.n_dst, args.edges).astype(np.int32)
    w = rng.rand(args.edges).astype(np.float32)
    stats = layout_stats(src, dst, w, args.n_src, args.n_dst, args.d)
    report(stats, args.ms)


if __name__ == '__main__':
    main()
