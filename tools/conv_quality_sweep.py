"""Conv-family quality at production scale on the sharp instrument.

Round 4 put gcn/graphsage/gat/gatv2 on MXU kernel paths and proved them
fast (SCALE.md) — but their quality above dummy scale was attested only
by dense numpy oracles and 120-user dryruns.  This sweep runs the
RESULTS.md model-separation protocol (reference models anchored at
``/root/reference/TextGCN/rejected_models.py:7-42``) for every
kernel-path conv at 50k x 20k on the real TPU:

* `lgcn` seed 0 as the in-sweep CONTROL — must reproduce the round-3
  base row (0.8000 +- 0.0003 recall@20) for the sweep to be comparable,
* `gcn` / `gat` at 3 model seeds (0/1/2) for sigma margins,
* `graphsage` / `gatv2` at 1 seed (their aggregation differs from
  gcn/gat only in the combination rule, so the seed spread transfers).

Each run is the real CLI path end-to-end (kernel backends on); best-eval
metrics are read back from the run's resume_state.pkl.  One JSON row per
run to stdout; results + sigma table land in RESULTS.md and the pinned
tolerance in tests/test_conv_quality_pin.py.

Usage:
  python tools/conv_quality_sweep.py [--data /tmp/sharp50k]
      [--models lgcn:0,gcn:0,gcn:1,...] [--epochs 60]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_RUNS = ('lgcn:0,gcn:0,gcn:1,gcn:2,gat:0,gat:1,gat:2,'
                'graphsage:0,gatv2:0')
CONVS = ('gcn', 'graphsage', 'gat', 'gatv2')


def best_metrics(run_dir: str) -> dict:
    """Best value per (metric, k) over the run's eval history."""
    with open(os.path.join(run_dir, 'resume_state.pkl'), 'rb') as f:
        state = pickle.load(f)
    hist = state['metrics']            # {name: (n_evals, n_k)}
    ks = (20, 40)
    out = {}
    for name, rows in hist.items():
        for j, k in enumerate(ks):
            out[f'{name}@{k}'] = float(rows[:, j].max()) \
                if len(rows) else float('nan')
    out['n_evals'] = int(len(hist['recall']))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='/tmp/sharp50k')
    ap.add_argument('--users', type=int, default=50_000)
    ap.add_argument('--items', type=int, default=20_000)
    ap.add_argument('--models', default=DEFAULT_RUNS,
                    help='comma list of model:seed pairs, run in order')
    ap.add_argument('--epochs', type=int, default=60)
    ap.add_argument('--evaluate_every', type=int, default=5)
    ap.add_argument('--lr', type=float, default=0.005)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.data, 'train.tsv')):
        print(f'# generating sharp dataset at {args.data}',
              file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(REPO, 'tools/make_synthetic.py'),
             args.data, str(args.users), str(args.items), '0', '--sharp'],
            check=True, cwd=REPO)

    base = os.path.basename(os.path.normpath(args.data))
    # the axon relay occasionally wedges a client's device RPCs
    # indefinitely (fresh processes recover it): make each run abort
    # instead of hanging, and retry in a new process
    env = dict(os.environ, TEXTGCN_TPU_DEVICE_TIMEOUT_S='600')
    for pair in args.models.split(','):
        model, seed = pair.split(':')
        uid = f'qsweep-{model}-s{seed}'
        cmd = [sys.executable, '-m', 'textgcn_tpu',
               '--model', model, '--data', args.data,
               '--epochs', str(args.epochs),
               '--evaluate_every', str(args.evaluate_every),
               '--lr', str(args.lr), '--steps_per_call', '64',
               '--seed', seed, '--uid', uid, '--quiet']
        if model in CONVS:
            cmd += ['--aggr', 'mean']
        t0 = time.perf_counter()
        for attempt in range(3):
            r = subprocess.run(cmd, cwd=REPO, capture_output=True,
                               text=True, env=env)
            if r.returncode == 0:
                break
            print(f'# {uid} attempt {attempt + 1} failed (rc='
                  f'{r.returncode}); tail: '
                  f'{(r.stderr or r.stdout)[-300:]!r}', file=sys.stderr,
                  flush=True)
            time.sleep(120)   # give the relay time to recover
        wall = time.perf_counter() - t0
        row = {'model': model, 'seed': int(seed), 'wall_s': round(wall, 1)}
        if r.returncode != 0:
            row['error'] = (r.stderr or r.stdout)[-2000:]
        else:
            row.update(best_metrics(os.path.join(REPO, 'runs', base, uid)))
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
