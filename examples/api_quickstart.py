"""Python API quickstart — the framework without the CLI.

Builds a dataset, a LightGCN model, and a Trainer directly; trains a few
epochs, evaluates, and reads the propagated representations off-device.

Run from the repo root:  python examples/api_quickstart.py
"""

import os
import sys

# allow running straight from a source checkout without installing
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault('TEXTGCN_TPU_TEXT_ENCODER', 'stub')

import jax

# local smoke run on CPU; drop this on a TPU host
if os.environ.get('TEXTGCN_TPU_PLATFORM', 'cpu') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

import numpy as np

from textgcn_tpu.config import Config
from textgcn_tpu.data.core import load_interactions
from textgcn_tpu.models.lightgcn import LightGCN
from textgcn_tpu.train.trainer import Trainer


def main(data_dir: str = 'data/dummy'):
    cfg = Config(
        model='lgcn', data=data_dir,
        epochs=40, evaluate_every=20, batch_size=256,
        emb_size=32, n_layers=2, lr=5e-3, k=(3, 5),
        save=False, save_path='/tmp/api_quickstart_run',
    ).finalize()

    data = load_interactions(cfg.data, seed=cfg.seed)
    print(f'{data.n_users} users x {data.n_items} items, '
          f'{data.graph.n_edges} edges')

    model = LightGCN(cfg, data)
    trainer = Trainer(cfg, model, data)
    trainer.fit()

    # final metrics: dict metric -> [value@k for k in cfg.k]
    metrics = trainer.evaluate()
    for name, per_k in metrics.items():
        print(f'  {name}: ' + '  '.join(
            f'@{k}={v:.4f}' for k, v in zip(cfg.k, per_k)))

    # propagated (post-GCN) representations, e.g. for an external ANN index
    users_emb, items_emb = model.representation(trainer.params)
    users_emb = np.asarray(users_emb)[:data.n_users]
    items_emb = np.asarray(items_emb)[:data.n_items]
    print('propagated tables:', users_emb.shape, items_emb.shape)

    # top-k retrieval for a few users (train items already masked out)
    preds, scores = trainer.predict(range(min(3, data.n_users)),
                                    with_scores=True)
    for u, (row, s) in enumerate(zip(preds, scores)):
        print(f'  user {u}: top items {row[:5]}  scores {s[:5]}')
    return metrics


if __name__ == '__main__':
    main(*sys.argv[1:])
