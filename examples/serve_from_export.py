"""Serve recommendations from exported artifacts — no framework needed.

``--export_reprs`` writes plain ``.npy`` tensors so external systems (an
ANN index, a feature store, a different language runtime) can reproduce
the model's scores exactly:

* plain models: ``users_repr.npy`` / ``items_repr.npy`` with
  ``score = users_repr @ items_repr.T``
* LTR heads: additionally ``ltr_user_factors.npy`` /
  ``ltr_item_factors.npy`` / ``ltr_bias.npy`` with
  ``score = u_cat @ i_cat.T + bias`` equal to the fused collapsed-tower
  scoring.

This script trains a small model, exports, then serves top-k from the
exported files with NOTHING but numpy — and checks the ranked lists
match the framework's own ``predict`` output.

Run from the repo root:  python examples/serve_from_export.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault('TEXTGCN_TPU_TEXT_ENCODER', 'stub')

import jax

if os.environ.get('TEXTGCN_TPU_PLATFORM', 'cpu') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

import numpy as np


def serve_topk_numpy(run_dir, user_ids, k, train_positives):
    """Pure-numpy retrieval from the exported artifacts."""
    u = np.load(os.path.join(run_dir, 'users_repr.npy'))
    i = np.load(os.path.join(run_dir, 'items_repr.npy'))
    scores = u[user_ids] @ i.T                      # (B, n_items)
    for row, uid in enumerate(user_ids):            # mask seen items
        scores[row, train_positives[uid]] = -np.inf
    top = np.argsort(-scores, axis=1, kind='stable')[:, :k]  # stable: ties break by lowest index, like lax.top_k
    return top, np.take_along_axis(scores, top, axis=1)


def main():
    from textgcn_tpu.cli import main as cli_main

    data_dir = '/tmp/textgcn_serve_data'
    if not os.path.exists(os.path.join(data_dir, 'train.tsv')):
        import subprocess
        subprocess.run([sys.executable, 'tools/make_synthetic.py',
                        data_dir, '800', '400', '0'], check=True)

    trainer = cli_main([
        '--model', 'lgcn', '--data', data_dir, '--epochs', '30',
        '--evaluate_every', '15', '--lr', '5e-3', '--uid', 'serve_demo',
        '--export_reprs'])
    run_dir = trainer.cfg.save_path

    data = trainer.data
    users = list(range(5))
    k = 10
    train_pos = {u: data.pos_padded[u][:data.pos_degree[u]].tolist()
                 for u in users}
    top, scores = serve_topk_numpy(run_dir, users, k, train_pos)

    # the framework's own retrieval must agree
    preds, _ = trainer.predict(users, with_scores=True)
    for row, uid in enumerate(users):
        assert top[row].tolist() == list(preds[row][:k]), \
            f'user {uid}: exported-artifact serving diverged'
    print(f'numpy serving from {run_dir} matches framework predict() '
          f'for {len(users)} users @ k={k}')
    print('top items for user 0:', top[0].tolist())


if __name__ == '__main__':
    main()
