"""Text-loss family + boosted heads + probe, end-to-end on dummy."""

import numpy as np
import pytest

from textgcn_tpu.cli import main


def run_cli(args):
    return main(args + ['--no_save'])


def test_text_model_trains(dummy_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    tr = run_cli(['--model', 'text', '--data', str(dummy_dir),
                  '--epochs', '4', '--evaluate_every', '2',
                  '--batch_size', '16', '--emb_size', '16',
                  '-k', '3', '5', '--uid', 'text'])
    assert len(tr.metrics_logger['recall']) >= 1
    assert np.isfinite(tr.metrics_logger['recall']).all()


@pytest.mark.parametrize('name', ['kg', 'reviews'])
def test_kg_reviews_models_train(name, dummy_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    tr = run_cli(['--model', name, '--data', str(dummy_dir),
                  '--epochs', '2', '--evaluate_every', '2',
                  '--batch_size', '16', '--emb_size', '16',
                  '-k', '3', '--uid', name])
    assert np.isfinite(tr.metrics_logger['recall']).all()


def test_semantic_loss_weight_zero_equals_bpr(dummy_dir):
    """weight='0' must reduce the text loss to plain BPR + reg."""
    import jax

    from textgcn_tpu.config import Config
    from textgcn_tpu.data.text import load_ltr_data
    from textgcn_tpu.models.lightgcn import LightGCN
    from textgcn_tpu.models.text_loss import TextModel

    cfg = Config(model='text', data=str(dummy_dir), batch_size=16,
                 emb_size=16, n_layers=2, dropout=0.0, k=(3,),
                 save_path='/tmp/tl').finalize()
    data = load_ltr_data(cfg)
    base = LightGCN(cfg, data)
    text = TextModel(cfg, data, weight='0')
    params = base.init_params(jax.random.key(0))
    batch = jax.tree.map(lambda x: x[0],
                         base.sample_batches(jax.random.key(1), 16))
    l1, _ = base.loss(params, batch, jax.random.key(2))
    l2, _ = text.loss(params, batch, jax.random.key(2))
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)


def test_probe(dummy_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    tr = run_cli(['--model', 'text_probe', '--data', str(dummy_dir),
                  '--batch_size', '16', '--emb_size', '16',
                  '-k', '3', '--uid', 'probe'])
    # probe evaluated 4 combos
    assert len(tr.metrics_logger['recall']) == 4


def test_boosted_head(dummy_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    tr = run_cli(['--model', 'gbdt', '--data', str(dummy_dir),
                  '--batch_size', '16', '--emb_size', '16',
                  '-k', '3', '--uid', 'gbdt'])
    assert tr.model._tree_fitted
    assert len(tr.inner.metrics_logger['recall']) == 1
    assert np.isfinite(tr.inner.metrics_logger['recall']).all()


def test_boosted_pop_head(dummy_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    tr = run_cli(['--model', 'gbdt_pop', '--data', str(dummy_dir),
                  '--batch_size', '16', '--emb_size', '16',
                  '-k', '3', '--uid', 'gbdtp'])
    assert tr.model.n_features == 7
    assert np.isfinite(tr.inner.metrics_logger['recall']).all()
