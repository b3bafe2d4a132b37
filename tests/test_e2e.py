"""End-to-end: lgcn on the dummy fixture — train, eval, checkpoint, load.

The integration strategy SURVEY.md §4 calls for (the reference itself has
no tests): dummy-dataset train -> eval -> checkpoint -> resume per registry
entry.
"""

import os
import pickle

import numpy as np
import pytest

from textgcn_tpu.config import Config
from textgcn_tpu.data.core import load_interactions
from textgcn_tpu.models.lightgcn import LightGCN
from textgcn_tpu.train.trainer import Trainer


def make_cfg(tmp_path, dummy_dir, **kw):
    defaults = dict(model='lgcn', data=str(dummy_dir), epochs=30,
                    evaluate_every=10, batch_size=16, emb_size=16,
                    n_layers=2, dropout=0.2, k=(3, 5), seed=0,
                    save_path=str(tmp_path / 'run'))
    defaults.update(kw)
    cfg = Config(**defaults).finalize()
    cfg.validate()
    return cfg


@pytest.fixture(scope='module')
def trained(tmp_path_factory, dummy_dir):
    tmp = tmp_path_factory.mktemp('e2e')
    cfg = make_cfg(tmp, dummy_dir)
    data = load_interactions(cfg.data)
    model = LightGCN(cfg, data)
    trainer = Trainer(cfg, model, data)
    trainer.fit()
    return cfg, data, model, trainer


def test_training_improves_over_random(trained):
    cfg, data, model, trainer = trained
    hist = trainer.metrics_logger['recall']
    assert len(hist) >= 1
    # random recall@3 on 10 items ~ 0.3; trained model should beat random
    # at the last eval
    assert hist[-1][0] > 0.05


def test_loss_is_finite_and_decreasing(trained):
    cfg, data, model, trainer = trained
    # metrics history exists for every metric with one row per eval
    for m, h in trainer.metrics_logger.items():
        assert h.shape[1] == len(cfg.k)
        assert np.isfinite(h).all()


def test_checkpoint_contract(trained):
    cfg, *_ = trained
    latest = os.path.join(cfg.save_path, 'latest_checkpoint.pkl')
    best = os.path.join(cfg.save_path, 'best.pkl')
    assert os.path.exists(latest)
    assert os.path.exists(best)
    with open(latest, 'rb') as f:
        state = pickle.load(f)
    assert set(state['params']) == {'user_emb', 'item_emb'}
    assert state['params']['user_emb'].shape == (12, 16)


def test_load_roundtrip(trained, tmp_path, dummy_dir):
    cfg, data, model, trainer = trained
    cfg2 = make_cfg(tmp_path, dummy_dir, uid='reload')
    model2 = LightGCN(cfg2, data)
    trainer2 = Trainer(cfg2, model2, data)
    trainer2.load(cfg.save_path)  # dir -> best.pkl
    np.testing.assert_array_equal(
        np.asarray(trainer2.params['user_emb']),
        pickle.load(open(os.path.join(cfg.save_path, 'best.pkl'),
                         'rb'))['params']['user_emb'])
    # metrics logger reset after load (reference base_model.py:289)
    assert len(trainer2.metrics_logger['recall']) == 0


def test_predict_shapes_and_export(trained):
    cfg, data, model, trainer = trained
    preds, scores = trainer.predict(range(data.n_users), with_scores=True,
                                    save=True)
    assert len(preds) == data.n_users
    assert len(preds[0]) == max(cfg.k)
    # no train items recommended among finite-score slots (with a tiny
    # catalog the tail of top-k may hit -inf-masked items, exactly as the
    # reference's torch.topk does)
    for u, (row, srow) in enumerate(zip(preds, scores)):
        train_items = set(
            data.train_df[data.train_df.user_id == u].asin.tolist())
        finite = {i for i, s in zip(row, srow) if np.isfinite(s)}
        assert not (finite & train_items)
    assert os.path.exists(os.path.join(cfg.save_path, 'predictions.tsv'))


def test_single_layer_combination(tmp_path, dummy_dir):
    cfg = make_cfg(tmp_path, dummy_dir, single=True, epochs=2,
                   evaluate_every=2, uid='single')
    data = load_interactions(cfg.data)
    model = LightGCN(cfg, data)
    trainer = Trainer(cfg, model, data)
    trainer.fit()
    assert len(trainer.metrics_logger['recall']) >= 1


def test_load_across_table_paddings(trained, tmp_path, dummy_dir):
    """A checkpoint saved with unpadded tables loads into a model whose
    backend pads tables (and vice versa): common rows overlay, padding
    rows keep their init (regression: xla-trained -> pallas model)."""
    cfg, data, model, trainer = trained
    padded = data.padded_to(64)
    cfg2 = make_cfg(tmp_path, dummy_dir, uid='padload')
    model2 = LightGCN(cfg2, padded)
    trainer2 = Trainer(cfg2, model2, padded)
    before_pad_rows = np.asarray(trainer2.params['user_emb'])[data.n_users:]
    trainer2.load(cfg.save_path)
    got = np.asarray(trainer2.params['user_emb'])
    want = np.asarray(trainer.params['user_emb'])
    np.testing.assert_array_equal(got[:data.n_users],
                                  want[:data.n_users])
    np.testing.assert_array_equal(got[data.n_users:], before_pad_rows)


def test_nan_guard_fires_on_first_epoch(tmp_path, dummy_dir):
    """The NaN guard aborts within one epoch of a NaN loss (the reference
    asserts per batch, base_model.py:123; with whole-epoch jit the
    granularity is one epoch, checked every epoch — not every eval)."""
    import jax.numpy as jnp

    cfg = make_cfg(tmp_path, dummy_dir, epochs=50, evaluate_every=25,
                   save=False)
    data = load_interactions(cfg.data)
    model = LightGCN(cfg, data)
    trainer = Trainer(cfg, model, data)

    calls = []

    def poisoned_epoch(params, opt_state, key):
        calls.append(1)
        comps = {c: jnp.float32(0.0) for c in trainer.loss_components}
        return params, opt_state, {
            **comps, 'loss': jnp.float32(float('nan')),
            'nan': jnp.asarray(True)}

    trainer._epoch_fn = poisoned_epoch
    with pytest.raises(AssertionError, match='loss is NA at epoch 1'):
        trainer.fit()
    # pipelined one epoch deep: at most 2 epochs dispatched before abort
    assert len(calls) <= 2


def test_trainer_logs_all_loss_components(tmp_path, dummy_dir, caplog):
    """Text models report bpr / sem / reg as separate running sums
    (reference text_base_model.py:34-35)."""
    import logging as _logging

    from textgcn_tpu.data.text import load_ltr_data
    from textgcn_tpu.models.text_loss import TextModel

    cfg = make_cfg(tmp_path, dummy_dir, model='text', epochs=2,
                   evaluate_every=2, save=False)
    data = load_ltr_data(cfg)
    model = TextModel(cfg, data)
    trainer = Trainer(cfg, model, data)
    assert trainer.loss_components == ('bpr', 'sem', 'reg')
    with caplog.at_level(_logging.INFO, logger='textgcn_tpu'):
        trainer.fit()
    epoch_lines = [r.message for r in caplog.records
                   if r.message.startswith('Epoch ')]
    assert any('sem = ' in m and 'bpr = ' in m and 'reg = ' in m
               for m in epoch_lines)
    assert any('examples/s' in m for m in epoch_lines)


def test_cli_mesh_end_to_end(tmp_path, dummy_dir, monkeypatch):
    """The full CLI drive with --mesh on the virtual 8-device mesh:
    make_mesh -> padded_to -> shard_model -> sharded Trainer fit/eval/
    checkpoint (the path a real multi-chip launch takes)."""
    from textgcn_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    trainer = main(['--model', 'lgcn', '--data', str(dummy_dir),
                    '--epochs', '9', '--evaluate_every', '3',
                    '--batch_size', '16', '--emb_size', '16',
                    '--n_layers', '2', '-k', '3', '5',
                    '--mesh', '4x2', '--uid', 'cli-mesh'])
    assert len(trainer.metrics_logger['recall']) >= 2
    assert np.isfinite(trainer.metrics_logger['recall']).all()
    run_dir = tmp_path / 'runs' / 'dummy' / 'cli-mesh'
    assert (run_dir / 'latest_checkpoint.pkl').exists()
    assert (run_dir / 'best.pkl').exists()


def test_steps_per_call_chunked_epoch_equivalence(tmp_path, dummy_dir):
    """--steps_per_call splits the epoch scan across device calls with an
    identical sampling/dropout/optimizer sequence: params and metrics must
    match the whole-epoch-in-one-call default exactly (incl. a remainder
    chunk when steps_per_call doesn't divide n_batches)."""
    from textgcn_tpu.config import Config
    from textgcn_tpu.data.core import load_interactions
    from textgcn_tpu.models.lightgcn import LightGCN
    from textgcn_tpu.train.trainer import Trainer

    def run(m):
        cfg = Config(model='lgcn', data=str(dummy_dir), epochs=5,
                     evaluate_every=5, batch_size=16, emb_size=16,
                     n_layers=2, dropout=0.4, k=(3,), save=False,
                     steps_per_call=m,
                     save_path=str(tmp_path / f'spc{m}')).finalize()
        data = load_interactions(cfg.data)
        model = LightGCN(cfg, data)
        tr = Trainer(cfg, model, data)
        assert model.num_batches(cfg.batch_size) > 2  # exercises remainder
        tr.fit()
        return tr

    a, b = run(0), run(2)
    np.testing.assert_allclose(np.asarray(b.params['user_emb']),
                               np.asarray(a.params['user_emb']), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.params['item_emb']),
                               np.asarray(a.params['item_emb']), atol=1e-6)
    for m in a.metrics_logger:
        np.testing.assert_allclose(b.metrics_logger[m],
                                   a.metrics_logger[m], atol=1e-6)


def test_cli_approx_topk_flag(tmp_path, dummy_dir, monkeypatch):
    """--approx_topk exports the serving opt-in before any tracing and the
    run still trains/evaluates end-to-end (on CPU approx_max_k falls back
    to the exact reduction, so metrics stay finite and comparable)."""
    import os

    from textgcn_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    # setenv('') records the variable's (absent) prior state so teardown
    # removes whatever main() sets — delenv(raising=False) on an absent
    # var records nothing and would leak the serving mode into every
    # later test in the process ('' parses to 0.0 = exact meanwhile)
    monkeypatch.setenv('TEXTGCN_TPU_APPROX_TOPK', '')
    trainer = main(['--model', 'lgcn', '--data', str(dummy_dir),
                    '--epochs', '4', '--evaluate_every', '2',
                    '--batch_size', '16', '--emb_size', '16',
                    '--n_layers', '2', '-k', '3', '5',
                    '--approx_topk', '0.95', '--uid', 'cli-approx'])
    assert os.environ.get('TEXTGCN_TPU_APPROX_TOPK') == '0.95'
    assert np.isfinite(trainer.metrics_logger['recall']).all()


def test_final_checkpoint_does_not_clobber_best(tmp_path, dummy_dir):
    """A checkpoint taken between evals (end-of-fit on a non-eval epoch)
    must not promote unevaluated params over the checkpoint the best
    metric was actually measured on."""
    from textgcn_tpu.train.checkpoint import make_checkpointer

    cfg = make_cfg(tmp_path, dummy_dir, epochs=7, evaluate_every=5,
                   uid='bestguard', save=True,
                   save_path=str(tmp_path / 'bestguard'))
    data = load_interactions(cfg.data)
    model = LightGCN(cfg, data)
    tr = Trainer(cfg, model, data)
    tr.fit()

    ck = make_checkpointer('pickle')
    latest = ck.load(os.path.join(cfg.save_path, ck.latest_name))
    best = ck.load(os.path.join(cfg.save_path, ck.best_name))
    # latest is epoch-7 params (2 epochs past the last eval)
    assert latest['epoch'] == 7
    # best stayed at the last *evaluated* epoch's params
    assert best['epoch'] == 5
    final = np.asarray(tr.params['user_emb'])
    assert not np.allclose(np.asarray(best['params']['user_emb']), final)
    np.testing.assert_array_equal(
        np.asarray(latest['params']['user_emb']), final)
