"""Cold-start split report over a trained checkpoint.

Evaluates one checkpoint on the warm-item and cold-item halves of a
``make_synthetic.py --sharp --cold`` dataset's held-out pairs (the item
split is read from ``<data>/cold_items.txt``).  One ranking pass over all
test users; metrics computed separately against the warm-only and
cold-only ground-truth lists — the instrument RESULTS.md's text-family
cold-start table is built from.

Usage (flags after ``--`` pass through to the normal CLI)::

    python tools/cold_report.py --model ltr_linear --data /tmp/cold20k \
        --load runs/cold20k/ltr --uid cold_report
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from textgcn_tpu.cli import main as cli_main           # noqa: E402
from textgcn_tpu.ops import metrics as metrics_mod     # noqa: E402


def split_eval(trainer, cold_remap: set[int]):
    """{'all'|'warm'|'cold': metrics dict} from ONE ranking pass."""
    data = trainer.data
    preds, _ = trainer._predict_users(trainer._test_users_padded)
    preds = preds[: trainer._n_test_users]
    out = {'all': metrics_mod.calculate_metrics(
        preds, data.true_test, trainer.k)}
    for name in ('warm', 'cold'):
        want_cold = name == 'cold'
        true_split = [[i for i in row if (i in cold_remap) == want_cold]
                      for row in data.true_test]
        mask = np.fromiter((len(t) > 0 for t in true_split), bool,
                           count=len(true_split))
        out[name] = metrics_mod.calculate_metrics(
            preds[mask], [t for t in true_split if t], trainer.k)
    return out


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    trainer = cli_main(argv + ['--no_train', '--no_save'])
    data = trainer.data
    cold_path = os.path.join(trainer.cfg.data, 'cold_items.txt')
    with open(cold_path) as f:
        cold_org = set(f.read().split())
    i_map = dict(zip(data.item_mapping.org_id, data.item_mapping.remap_id))
    cold_remap = {i_map[o] for o in cold_org if o in i_map}

    results = split_eval(trainer, cold_remap)
    ks = trainer.k
    print(f'# cold_report model={trainer.cfg.model} data={trainer.cfg.data} '
          f'load={trainer.cfg.load} cold_items={len(cold_remap)}')
    header = 'split      ' + ''.join(
        f'{m}@{k:<8}' for m in ('recall', 'ndcg') for k in ks)
    print(header)
    for split, res in results.items():
        row = ''.join(f'{v:<{10 + len(str(k))}.4f}'
                      for m in ('recall', 'ndcg')
                      for k, v in zip(ks, res[m]))
        print(f'{split:<11}{row}')
    return results


if __name__ == '__main__':
    main()
