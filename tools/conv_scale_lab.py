"""Conv-family production-scale sweep: kernel-path train steps at S2/S3.

Round 4 put the conv family on the MXU kernel paths (GCN/SAGE via the
tiled one-hot SpMM with separable D̂^-1/2 scalings, GAT/GATv2 via the
block-sparse attention pipeline in ops/pallas_gat.py) and measured them
at the S1 bench shape only.  This lab proves the paths hold — and keep
their advantage — at the production shapes of tools/scale_bench.py,
where the attention layouts take multiple source-range splits and the
backward holds two full tables per split.

Runs on the real TPU.  Reuses bench.py's real-model chain-difference
harness (`_bench_train_step`: sample epoch on device, scan
loss+grad+Adam, (3+n)-batch chain minus 3-batch chain) so numbers are
directly comparable with bench.py / BENCH_r*.json rows.

Usage:
  python tools/conv_scale_lab.py [--sizes S2,S3] [--models gcn,gat,gatv2]
                                 [--steps 12] [--out -]

One JSON row per (size, model) to stdout; results recorded in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_bench import SIZES  # noqa: E402  (shared shape table)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', default='S2,S3')
    ap.add_argument('--models', default='gcn,gat,gatv2')
    ap.add_argument('--steps', type=int, default=12)
    args = ap.parse_args()

    import bench
    from textgcn_tpu.cli import setup_compilation_cache
    from textgcn_tpu.models.conv import ConvModel
    from textgcn_tpu.models.lightgcn import LightGCN

    setup_compilation_cache()

    for size in args.sizes.split(','):
        nu, ni, deg = SIZES[size]
        data = bench.synth_interactions(n_users=nu, n_items=ni,
                                        avg_deg=deg)
        for name in args.models.split(','):
            t0 = time.perf_counter()
            if name == 'lgcn':
                model = LightGCN(bench._bench_cfg('lgcn'), data)
            else:
                model = ConvModel(bench._bench_cfg(name, aggr='mean'),
                                  data)
            build_s = time.perf_counter() - t0
            ms, eps = bench._bench_train_step(model, args.steps)
            row = {'size': size, 'model': name, 'n_users': nu,
                   'n_items': ni, 'n_edges': int(data.n_train),
                   'step_ms': round(ms, 2),
                   'examples_per_s': round(eps, 1),
                   'build_s': round(build_s, 1)}
            print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
