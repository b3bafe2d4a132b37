"""Profiling utilities + trainer early-stop integration."""

import numpy as np

from textgcn_tpu.utils.profiling import StepTimer, profile


def test_step_timer():
    t = StepTimer(window=5)
    t.start()
    for _ in range(8):
        t.tick()
    assert len(t._times) == 5  # rolling window
    assert t.mean_s >= 0
    s = t.summary()
    assert 'p50=' in s and 'p95=' in s


def test_profile_decorator(capsys):
    @profile
    def work():
        return sum(range(1000))

    assert work() == sum(range(1000))
    out = capsys.readouterr().out
    assert 'cumtime' in out


def test_trainer_early_stop(dummy_dir, tmp_path, monkeypatch):
    """Converged metrics across 3 evals trigger the early-stop break."""
    from textgcn_tpu.config import Config
    from textgcn_tpu.data.core import load_interactions
    from textgcn_tpu.models.lightgcn import LightGCN
    from textgcn_tpu.train.trainer import Trainer

    cfg = Config(model='lgcn', data=str(dummy_dir), epochs=100,
                 evaluate_every=1, batch_size=16, emb_size=8,
                 n_layers=1, dropout=0.0, lr=0.0,  # lr=0: frozen metrics
                 k=(3,), save=False,
                 save_path=str(tmp_path / 'es')).finalize()
    data = load_interactions(cfg.data)
    model = LightGCN(cfg, data)
    tr = Trainer(cfg, model, data)
    tr.fit()
    # identical metrics for 3 evals -> converged -> stopped at epoch 3
    assert len(tr.metrics_logger['recall']) == 3
