"""Text-concat scoring family (reference rejected_models.py:45-109)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textgcn_tpu.config import Config
from textgcn_tpu.data.text import load_ltr_data
from textgcn_tpu.models.ltr_concat import (LTRCosine, LTRSimple,
                                           probe_concat_scoring)
from textgcn_tpu.train.trainer import Trainer


def make_cfg(tmp_path, dummy_dir, **kw):
    defaults = dict(model='ltr_reviews', data=str(dummy_dir), epochs=4,
                    evaluate_every=2, batch_size=16, emb_size=16,
                    n_layers=2, dropout=0.0, k=(3, 5), seed=0,
                    save_path=str(tmp_path / 'run'))
    defaults.update(kw)
    cfg = Config(**defaults).finalize()
    cfg.validate()
    return cfg


@pytest.fixture(scope='module')
def concat_data(dummy_dir, tmp_path_factory):
    cfg = make_cfg(tmp_path_factory.mktemp('concat'), dummy_dir)
    return load_ltr_data(cfg)


def _naive_concat_scores(model, reprs, users):
    """Reference semantics: cat([gnn, text]) then one big matmul
    (rejected_models.py:73-76)."""
    users_repr, items_repr = reprs
    u = np.concatenate([np.asarray(users_repr)[users],
                        np.asarray(model.users_text)[users]], axis=1)
    i = np.concatenate([np.asarray(items_repr),
                        np.asarray(model.items_text)], axis=1)
    return u @ i.T


@pytest.mark.parametrize('name', ['ltr_reviews', 'ltr_kg'])
def test_concat_scoring_matches_naive(tmp_path, dummy_dir, concat_data,
                                      name):
    cfg = make_cfg(tmp_path, dummy_dir, model=name)
    model = LTRCosine(cfg, concat_data)
    params = model.init_params(jax.random.PRNGKey(0))
    reprs = model.representation(params)
    users = np.arange(concat_data.n_users)
    want = _naive_concat_scores(model, reprs, users)

    got = np.asarray(model.score_batchwise(params, reprs, users))
    np.testing.assert_allclose(got[:, :concat_data.n_items],
                               want[:, :concat_data.n_items],
                               rtol=1e-5, atol=1e-5)

    # pairwise agrees with the batchwise diagonal entries
    items = np.arange(concat_data.n_users) % concat_data.n_items
    pw = np.asarray(model.score_pairwise(
        params, None, reprs[0][users], reprs[1][items], users, items))
    np.testing.assert_allclose(pw, want[users, items], rtol=1e-5,
                               atol=1e-5)

    # fused catalog factors reproduce the same scores exactly
    u_cat, i_cat, bias = model.fused_catalog_inputs(params, reprs, users)
    fused = np.asarray(u_cat @ i_cat.T) + float(bias)
    np.testing.assert_allclose(fused[:, :concat_data.n_items],
                               want[:, :concat_data.n_items],
                               rtol=1e-5, atol=1e-5)

    # item-text mode actually differs between the two registry names
    assert model.items_text_mode == ('kg' if name == 'ltr_kg'
                                     else 'reviews')


def test_ltr_cosine_e2e_train(tmp_path, dummy_dir, concat_data):
    cfg = make_cfg(tmp_path, dummy_dir, model='ltr_reviews')
    model = LTRCosine(cfg, concat_data)
    trainer = Trainer(cfg, model, concat_data)
    trainer.fit()
    res = trainer.evaluate()
    for m in ('recall', 'ndcg', 'precision', 'hit', 'f1'):
        assert np.isfinite(res[m]).all()


def test_ltr_simple_probe(tmp_path, dummy_dir, concat_data):
    cfg = make_cfg(tmp_path, dummy_dir, model='ltr_simple')
    model = LTRSimple(cfg, concat_data)
    trainer = Trainer(cfg, model, concat_data)
    results = probe_concat_scoring(cfg, concat_data, trainer)
    assert set(results) == {'reviews', 'kg'}
    for res in results.values():
        assert np.isfinite(res['recall']).all()
    # probe restored the original mode and eval fn
    assert model.items_text_mode == 'reviews'


def test_ltr_concat_registry_and_cli(tmp_path, dummy_dir, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from textgcn_tpu.registry import get_class
    for name, cls in (('ltr_reviews', LTRCosine), ('ltr_kg', LTRCosine),
                      ('ltr_simple', LTRSimple)):
        loader, model_cls = get_class(name)
        assert model_cls is cls

    from textgcn_tpu import cli
    trainer = cli.main([
        '--model', 'ltr_reviews', '--data', str(dummy_dir),
        '--epochs', '2', '--evaluate_every', '2', '--batch_size', '8',
        '--emb_size', '8', '--n_layers', '1', '-k', '3',
        '--uid', 'cosine', '--no_save',
    ])
    assert trainer.metrics_logger['recall'].size >= 1


def test_concat_mesh_eval_matches_single(tmp_path, dummy_dir, concat_data):
    """Under a mesh the concat family rides the fused catalog-sharded
    top-k (u_cat = [gnn ++ text]); eval metrics must match the
    single-chip path bit-tolerantly with identical params."""
    from textgcn_tpu.parallel.mesh import make_mesh, shard_model

    mesh = make_mesh((4, 2))
    padded = concat_data.padded_to(mesh.size)
    cfg = make_cfg(tmp_path, dummy_dir, uid='meshcat')
    model = LTRCosine(cfg, padded)
    assert model.supports_fused_sharded_topk
    shard_model(mesh, model)
    tr_mesh = Trainer(cfg, model, padded, mesh=mesh)

    model_s = LTRCosine(cfg, concat_data)
    tr_single = Trainer(cfg, model_s, concat_data)
    # carry over the FULL single-chip param pytree (not just the tables),
    # pad table leaves to the mesh model's padded row counts, and place
    # with the trainer's real param shardings — stays correct if the
    # concat family ever gains head params or runs on a real mesh
    from textgcn_tpu.parallel.mesh import shard_params

    def pad_leaf(name, v):
        v = np.asarray(v)
        if v.ndim == 2 and v.shape[0] == model_s.n_users_t:
            return np.pad(v, ((0, model.n_users_t - v.shape[0]), (0, 0)))
        if v.ndim == 2 and v.shape[0] == model_s.n_items_t:
            return np.pad(v, ((0, model.n_items_t - v.shape[0]), (0, 0)))
        return v

    tr_mesh.params = shard_params(mesh, {
        k: jnp.asarray(pad_leaf(k, v))
        for k, v in tr_single.params.items()})
    r_mesh = tr_mesh.evaluate()
    r_single = tr_single.evaluate()
    for m in r_single:
        np.testing.assert_allclose(r_mesh[m], r_single[m], atol=1e-4)
