"""Render tools/conv_quality_sweep.py output as the RESULTS.md table.

Reads the sweep's JSONL (stdin or --in), groups by model, prints a
markdown table with mean +- std across seeds and the sigma margin vs
the lgcn control at recall@20 (sigma = the round-3 measured seed noise
3e-4 when a model has one seed, else the pooled std).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

SEED_NOISE = 3e-4   # round-3 lgcn seed noise at this shape (RESULTS.md)
METRICS = ('recall@20', 'recall@40', 'ndcg@20')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--in', dest='inp', default='-')
    args = ap.parse_args()
    fh = sys.stdin if args.inp == '-' else open(args.inp)
    rows = [json.loads(ln) for ln in fh
            if ln.strip().startswith('{')]
    by_model: dict[str, list[dict]] = {}
    for r in rows:
        if 'error' in r:
            print(f"# {r['model']}:{r['seed']} FAILED: "
                  f"{r['error'][:200]}", file=sys.stderr)
            continue
        by_model.setdefault(r['model'], []).append(r)

    base = np.mean([r['recall@20'] for r in by_model['lgcn']])
    print('| model | seeds | recall@20 | recall@40 | ndcg@20 | '
          'vs base (sigma units, r@20) |')
    print('|---|---|---|---|---|---|')
    for name, rs in by_model.items():
        cells = []
        for m in METRICS:
            v = np.array([r[m] for r in rs])
            cells.append(f'{v.mean():.4f} ± {v.std(ddof=0):.4f}'
                         if len(v) > 1 else f'{v.mean():.4f}')
        r20 = np.array([r['recall@20'] for r in rs])
        sigma = max(float(r20.std(ddof=0)), SEED_NOISE)
        margin = (r20.mean() - base) / sigma
        tag = '—' if name == 'lgcn' else f'{margin:+.0f}σ'
        print(f'| `{name}` | {len(rs)} | {cells[0]} | {cells[1]} | '
              f'{cells[2]} | {tag} |')


if __name__ == '__main__':
    main()
