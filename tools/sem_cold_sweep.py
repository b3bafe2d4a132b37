"""Semantic-loss knob sweep on the cold-start instrument.

Round 3 measured the text (semantic-loss) family HURTING cold items under
its default knobs (RESULTS.md: kg cold r@40 0.07 vs base 0.23, weight '1',
distance '|b-g|').  This sweep grids the now-functional
``--weight``/``--distance``/``--dist_fn`` tables (reference
``text_base_model.py:45-62``) on the cold instrument to either find a
configuration that helps cold items or pin the negative per-knob.

Mechanism hypothesis driving the grid: cold items receive semantic
gradient mostly through the NEGATIVE slot (a cold item is drawn as a
random negative ~B*steps/n_items times per epoch, vs ~1 appearance as a
positive), so the ``(g-b)``-direction distances — which PULL text-similar
(pos, neg) pairs together in GNN space when their GNN distance exceeds
their text distance — are the candidates that could place a cold item
near its cluster; the default ``|b-g|`` also pushes apart pairs the GNN
already ranks close, fighting exactly that placement.

Usage (CPU is fine at this scale; ~1-2 min per run):
    TEXTGCN_TPU_PLATFORM=cpu TEXTGCN_TPU_TEXT_ENCODER=stub \
        python tools/sem_cold_sweep.py [--data DIR] [--runs DIR]
        [--epochs 60] [--quick]

Protocol matches the round-3 cold table (RESULTS.md): 5k users x 2k
items ``--sharp --cold 0.2`` seed 0, lr 5e-3, 60 epochs from scratch,
scored at the warm-selected best checkpoint by tools/cold_report.py.
The lgcn base and the default-knob kg run are re-run as in-sweep
controls so every comparison is internally consistent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GRID = [
    # (weight, distance, dist_fn) — first row is the r3 default control
    ('1', '|b-g|', 'euclid'),
    ('1', 'max(g-b)', 'euclid'),
    ('1', 'selu(g-b)', 'euclid'),
    ('1', '(g-b)', 'euclid'),
    ('1', 'max(b-g)', 'euclid'),
    ('max(p-n)', 'max(g-b)', 'euclid'),
    ('max(p-n)', '|b-g|', 'euclid'),
    ('|p-n|', 'max(g-b)', 'euclid'),
    ('1', 'max(g-b)', 'cosine_minus'),
    ('1', '|b-g|', 'cosine_minus'),
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='/tmp/coldsweep_data')
    ap.add_argument('--runs', default='/tmp/coldsweep_runs')
    ap.add_argument('--users', type=int, default=5000)
    ap.add_argument('--items', type=int, default=2000)
    ap.add_argument('--epochs', type=int, default=60)
    ap.add_argument('--lr', type=float, default=5e-3)
    ap.add_argument('--quick', action='store_true',
                    help='tiny shapes + few epochs (smoke test)')
    ap.add_argument('--model', default='kg')
    args = ap.parse_args(argv)

    os.environ.setdefault('TEXTGCN_TPU_TEXT_ENCODER', 'stub')
    # resolved before the chdir below, so relative --data keeps working
    args.data = os.path.abspath(args.data)
    if args.quick:
        args.users, args.items, args.epochs = 400, 300, 6

    if not os.path.exists(os.path.join(args.data, 'train.tsv')):
        from make_synthetic import generate
        generate(args.data, n_users=args.users, n_items=args.items,
                 seed=0, sharp=True, cold=0.2)

    import cold_report
    from textgcn_tpu.cli import main as cli_main

    base_args = ['--data', args.data, '--batch_size', '2048',
                 '--emb_size', '64', '--n_layers', '3',
                 '-k', '20', '40', '--lr', str(args.lr),
                 '--evaluate_every', '10', '--quiet']

    # save_path is derived as runs/<dataset>/<uid> under the cwd
    os.makedirs(args.runs, exist_ok=True)
    os.chdir(args.runs)
    dataset = os.path.basename(os.path.normpath(args.data))

    def one(name, model, extra):
        run_dir = os.path.join('runs', dataset, name)
        if not os.path.exists(os.path.join(run_dir, 'best.pkl')):
            cli_main(base_args + ['--model', model, '--epochs',
                                  str(args.epochs), '--uid', name] + extra)
        res = cold_report.main(
            base_args + ['--model', model, '--load', run_dir,
                         '--uid', f'{name}_report'] + extra)
        row = {
            'name': name,
            'warm_r20': float(res['warm']['recall'][0]),
            'warm_r40': float(res['warm']['recall'][1]),
            'cold_r40': float(res['cold']['recall'][1]),
            'cold_ndcg40': float(res['cold']['ndcg'][1]),
        }
        print(json.dumps(row))
        return row

    rows = [one('base_lgcn', 'lgcn', [])]
    for weight, distance, dist_fn in GRID:
        name = f'{args.model}_w{weight}_d{distance}_f{dist_fn}' \
            .replace('|', 'A').replace('(', '').replace(')', '') \
            .replace('-', 'm').replace(' ', '')
        rows.append(one(name, args.model,
                        ['--weight', weight, '--distance', distance,
                         '--dist_fn', dist_fn]))

    rows.sort(key=lambda r: -r['cold_r40'])
    print('\n== ranked by cold recall@40 ==')
    for r in rows:
        print(f"{r['name']:42s} cold_r40={r['cold_r40']:.4f} "
              f"cold_ndcg40={r['cold_ndcg40']:.4f} "
              f"warm_r20={r['warm_r20']:.4f} warm_r40={r['warm_r40']:.4f}")
    print(json.dumps({'rows': rows}))
    return rows


if __name__ == '__main__':
    main()
