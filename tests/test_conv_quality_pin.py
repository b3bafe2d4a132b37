"""Pinned quality floors for the KERNEL-path conv family.

The round-4 verdict's top finding: a kernel-path numeric drift that
*degrades* (not breaks) learning would pass the dense oracles, the
VJP-equivalence tests, and the dummy fits.  This pins the other end:
each kernel-path conv must actually LEARN the sharp instrument
(own-cluster holdout, Zipf popularity — tools/make_synthetic.py
--sharp) through the real Trainer with the Pallas paths forced
(interpret mode on CPU, same kernel code as the chip), to a recall
floor set at ~0.8x the value measured when the floors were pinned
(round 5, 600x240 sharp, 12 epochs: gcn 0.8253, graphsage 0.7818,
gat 0.8587, gatv2 0.8863 recall@20).  The 50k x 20k sigma-margin rows
vs the lgcn base live in RESULTS.md (tools/conv_quality_sweep.py,
real TPU).
"""

import subprocess
import sys

import numpy as np
import pytest

# floor = ~0.8x the recall@20 measured at pin time (see module docstring)
FLOORS = {'gcn': 0.66, 'graphsage': 0.62, 'gat': 0.68, 'gatv2': 0.70}


@pytest.fixture(scope='module')
def sharp_dir(tmp_path_factory):
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path_factory.mktemp('sharp') / 'data')
    subprocess.run(
        [sys.executable, os.path.join(repo, 'tools/make_synthetic.py'),
         out, '600', '240', '0', '--sharp'], check=True, cwd=repo)
    return out


@pytest.mark.parametrize('name', ['gcn', 'graphsage', 'gat', 'gatv2'])
def test_kernel_conv_learns_sharp_instrument(sharp_dir, tmp_path, name,
                                             monkeypatch):
    from textgcn_tpu.config import Config
    from textgcn_tpu.data.core import load_interactions
    from textgcn_tpu.models.conv import ConvModel
    from textgcn_tpu.train.trainer import Trainer

    monkeypatch.setenv('TEXTGCN_TPU_PALLAS', 'interpret')
    cfg = Config(model=name, data=sharp_dir, aggr='mean', epochs=12,
                 evaluate_every=4, batch_size=256, emb_size=16,
                 n_layers=2, dropout=0.2, lr=5e-3, k=(20,), seed=0,
                 save=False, save_path=str(tmp_path / name)).finalize()
    data = load_interactions(cfg.data)
    model = ConvModel(cfg, data)
    assert model._use_kernel(), (name, model.backend)
    tr = Trainer(cfg, model, data)
    tr.fit()
    best = float(np.max(tr.metrics_logger['recall'][:, 0]))
    assert best >= FLOORS[name], \
        f'{name} kernel path recall@20 {best:.4f} under pinned floor ' \
        f'{FLOORS[name]} — kernel numeric drift is degrading learning'
