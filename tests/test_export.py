"""--export_reprs / --trace: serving-export and ops-tracing CLI features."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from textgcn_tpu.config import Config
from textgcn_tpu.data.core import load_interactions
from textgcn_tpu.data.text import load_ltr_data
from textgcn_tpu.models.lightgcn import LightGCN
from textgcn_tpu.models.ltr import LTRLinearWPop
from textgcn_tpu.train.trainer import Trainer


def make_cfg(tmp_path, dummy_dir, **kw):
    defaults = dict(model='lgcn', data=str(dummy_dir), epochs=2,
                    evaluate_every=2, batch_size=16, emb_size=16,
                    n_layers=2, dropout=0.0, k=(3,), seed=0, save=False,
                    save_path=str(tmp_path / 'run'))
    defaults.update(kw)
    cfg = Config(**defaults).finalize()
    cfg.validate()
    return cfg


def test_export_reprs_lgcn(tmp_path, dummy_dir):
    cfg = make_cfg(tmp_path, dummy_dir)
    data = load_interactions(cfg.data)
    model = LightGCN(cfg, data)
    tr = Trainer(cfg, model, data)
    paths = tr.export_reprs()
    assert set(paths) == {'users_repr', 'items_repr'}
    u = np.load(paths['users_repr'])
    i = np.load(paths['items_repr'])
    assert u.shape == (data.n_users, cfg.emb_size)
    assert i.shape == (data.n_items, cfg.emb_size)
    # exported reprs reproduce the model's eval scores exactly
    reprs = model.representation(tr.params, training=False)
    np.testing.assert_allclose(
        u @ i.T,
        np.asarray(reprs[0][:data.n_users] @ reprs[1][:data.n_items].T),
        atol=1e-5)


def test_export_reprs_ltr_factors(tmp_path, dummy_dir):
    cfg = make_cfg(tmp_path, dummy_dir, model='ltr_pop')
    data = load_ltr_data(cfg)
    model = LTRLinearWPop(cfg, data)
    tr = Trainer(cfg, model, data)
    paths = tr.export_reprs()
    assert {'ltr_user_factors', 'ltr_item_factors',
            'ltr_bias'} <= set(paths)
    u_cat = np.load(paths['ltr_user_factors'])
    i_cat = np.load(paths['ltr_item_factors'])
    bias = np.load(paths['ltr_bias'])
    # external score = u_cat @ i_cat.T + bias must equal the head's
    # fused batchwise scores
    users = jnp.arange(data.n_users, dtype=jnp.int32)
    reprs = model.representation(tr.params, training=False)
    want = np.asarray(model.fused_batch_scores(tr.params, reprs, users))
    got = u_cat @ i_cat.T + bias
    np.testing.assert_allclose(got, want[:, :data.n_items], atol=1e-4)


def test_cli_export_and_trace(tmp_path, dummy_dir):
    from textgcn_tpu.cli import main

    os.makedirs(tmp_path / 'wd', exist_ok=True)
    cwd = os.getcwd()
    os.chdir(tmp_path / 'wd')
    try:
        tr = main(['--model', 'lgcn', '--data', str(dummy_dir),
                   '--epochs', '2', '--evaluate_every', '2',
                   '--batch_size', '16', '--emb_size', '16', '-k', '3',
                   '--uid', 'exp', '--no_save', '--export_reprs',
                   '--trace', str(tmp_path / 'trace')])
    finally:
        os.chdir(cwd)
    run_dir = tmp_path / 'wd' / tr.cfg.save_path
    assert os.path.exists(run_dir / 'users_repr.npy')
    assert os.path.exists(run_dir / 'items_repr.npy')
    # the profiler wrote a TensorBoard-readable trace
    found = []
    for root, _dirs, files in os.walk(tmp_path / 'trace'):
        found += files
    assert found, 'no profiler trace files written'


def test_device_healthcheck():
    """Healthy backend: probe returns quickly.  Wedged backend (a probe
    that never completes): raises after fail_after_s instead of hanging
    forever.  Probe errors surface on the caller's thread."""
    import time

    import pytest

    from textgcn_tpu.cli import device_healthcheck

    rtt = device_healthcheck(warn_after_s=60, fail_after_s=0)
    assert rtt < 60

    with pytest.raises(TimeoutError, match='unresponsive'):
        device_healthcheck(warn_after_s=0.05, fail_after_s=0.2,
                           _probe=lambda: time.sleep(3600))

    with pytest.raises(RuntimeError, match='boom'):
        device_healthcheck(
            _probe=lambda: (_ for _ in ()).throw(RuntimeError('boom')))


def test_parse_args_new_flags():
    """CLI surface round-trip for the session's new flags."""
    from textgcn_tpu.config import parse_args

    cfg = parse_args(['--model', 'lgcn', '--refresh_every', '8',
                      '--resume', 'runs/x/y', '--export_reprs',
                      '--trace', '/tmp/tr', '--no_resume_state',
                      '--steps_per_call', '64'])
    assert cfg.refresh_every == 8
    assert cfg.resume == 'runs/x/y'
    assert cfg.export_reprs is True
    assert cfg.trace == '/tmp/tr'
    assert cfg.resume_state is False
    assert cfg.steps_per_call == 64
