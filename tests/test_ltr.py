"""LTR heads: feature math, fused batchwise == naive featurewise, e2e."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textgcn_tpu.config import Config
from textgcn_tpu.data.text import load_ltr_data
from textgcn_tpu.models.ltr import LTRLinear, LTRLinearWPop, collapse_tower
from textgcn_tpu.train.trainer import Trainer


def make_cfg(tmp_path, dummy_dir, **kw):
    defaults = dict(model='ltr_linear', data=str(dummy_dir), epochs=4,
                    evaluate_every=2, batch_size=16, emb_size=16,
                    n_layers=2, dropout=0.2, k=(3, 5), seed=0,
                    save_path=str(tmp_path / 'run'))
    defaults.update(kw)
    cfg = Config(**defaults).finalize()
    cfg.validate()
    return cfg


@pytest.fixture(scope='module')
def ltr_data(dummy_dir, tmp_path_factory):
    cfg = make_cfg(tmp_path_factory.mktemp('ltr'), dummy_dir)
    return load_ltr_data(cfg)


def test_ltr_data_tensors(ltr_data):
    d = ltr_data
    assert d.items_as_desc.shape == (d.n_items, d.text_dim)
    assert d.items_as_avg_reviews.shape == (d.n_items, d.text_dim)
    assert d.users_as_avg_reviews.shape == (d.n_users, d.text_dim)
    assert d.users_as_avg_desc.shape == (d.n_users, d.text_dim)
    assert d.popularity_users.shape == (d.n_users, 1)
    assert d.popularity_items.shape == (d.n_items, 1)
    # every dummy item has a description and at least one train review
    assert (np.abs(d.items_as_desc).sum(axis=1) > 0).all()
    assert (np.abs(d.items_as_avg_reviews).sum(axis=1) > 0).all()
    # popularity normalized to (0, 1]
    assert d.popularity_users.max() == pytest.approx(1.0)
    assert d.popularity_items.min() >= 0.0


def test_collapse_tower_matches_apply(rng):
    tower = []
    sizes = [5, 3, 1]
    for i, j in zip(sizes, sizes[1:]):
        tower.append({'w': jnp.asarray(rng.randn(i, j).astype(np.float32)),
                      'b': jnp.asarray(rng.randn(j).astype(np.float32))})
    x = jnp.asarray(rng.randn(7, 5).astype(np.float32))
    full = x
    for layer in tower:
        full = full @ layer['w'] + layer['b']
    w, b = collapse_tower(tower)
    np.testing.assert_allclose(np.asarray(x @ w + b),
                               np.asarray(full[:, 0]), atol=1e-5)


@pytest.mark.parametrize('cls', [LTRLinear, LTRLinearWPop])
def test_fused_batchwise_matches_naive(cls, ltr_data, tmp_path, dummy_dir,
                                       rng):
    cfg = make_cfg(tmp_path, dummy_dir,
                   model='ltr_pop' if cls is LTRLinearWPop else 'ltr_linear')
    model = cls(cfg, ltr_data)
    params = model.init_params(jax.random.key(0))
    reprs = model.representation(params, training=False)
    users = jnp.asarray(np.arange(5, dtype=np.int32))

    fused = np.asarray(model.fused_batch_scores(params, reprs, users))

    # naive: per (user, item) pairwise features through the tower
    users_repr, items_repr = reprs
    all_items = jnp.arange(model.n_items, dtype=jnp.int32)
    naive = np.zeros_like(fused)
    for r, u in enumerate(np.asarray(users)):
        uu = jnp.full((model.n_items,), int(u), dtype=jnp.int32)
        scores = model.score_pairwise(
            params, None, users_repr[uu], items_repr[all_items], uu,
            all_items)
        naive[r] = np.asarray(scores)
    np.testing.assert_allclose(fused, naive, atol=1e-4)


def test_freeze_masks_embeddings(ltr_data, tmp_path, dummy_dir):
    cfg = make_cfg(tmp_path, dummy_dir, freeze=True)
    model = LTRLinear(cfg, ltr_data)
    params = model.init_params(jax.random.key(0))
    mask = model.trainable_mask(params)
    assert mask['user_emb'] is False and mask['item_emb'] is False

    trainer = Trainer(cfg, model, ltr_data)
    before = np.asarray(trainer.params['user_emb']).copy()
    trainer.fit()
    after = np.asarray(trainer.params['user_emb'])
    np.testing.assert_array_equal(before, after)  # frozen
    # tower did train
    assert len(trainer.metrics_logger['recall']) >= 1


def test_load_base_warm_start(ltr_data, tmp_path, dummy_dir):
    """Full reference recipe: train lgcn, then ltr_linear --load_base."""
    from textgcn_tpu.models.lightgcn import LightGCN

    base_cfg = make_cfg(tmp_path, dummy_dir, model='lgcn', uid='base',
                        epochs=6, evaluate_every=3,
                        save_path=str(tmp_path / 'base_run'))
    base_model = LightGCN(base_cfg, ltr_data)
    base_trainer = Trainer(base_cfg, base_model, ltr_data)
    base_trainer.fit()
    assert os.path.exists(os.path.join(base_cfg.save_path, 'best.pkl'))

    cfg = make_cfg(tmp_path, dummy_dir, freeze=True, uid='ltr')
    model = LTRLinear(cfg, ltr_data)
    trainer = Trainer(cfg, model, ltr_data)
    # base evaluated with plain GCN scoring (reference ltr_models.py:66-68)
    model.score_with_head = False
    trainer.load(base_cfg.save_path)
    model.score_with_head = True
    trainer._eval_fn = None

    with open(os.path.join(base_cfg.save_path, 'best.pkl'), 'rb') as f:
        base_params = pickle.load(f)['params']
    np.testing.assert_array_equal(
        np.asarray(trainer.params['user_emb']), base_params['user_emb'])
    assert 'tower' in trainer.params  # head kept its fresh init

    trainer.fit()
    assert len(trainer.metrics_logger['recall']) >= 1


def test_wpop_end_to_end(ltr_data, tmp_path, dummy_dir):
    cfg = make_cfg(tmp_path, dummy_dir, model='ltr_pop',
                   ltr_layers=(4,))
    model = LTRLinearWPop(cfg, ltr_data)
    assert model.n_features == 7
    trainer = Trainer(cfg, model, ltr_data)
    trainer.fit()
    assert np.isfinite(trainer.metrics_logger['recall']).all()


@pytest.mark.parametrize('cls', [LTRLinear, LTRLinearWPop])
def test_ltr_with_padded_tables(cls, ltr_data, tmp_path, dummy_dir):
    """Fused scoring must work when table rows are padded (mesh / pallas
    paths); phantom items never surface in top-k."""
    padded = ltr_data.padded_to(8)
    assert padded.n_items_padded > padded.n_items
    cfg = make_cfg(tmp_path, dummy_dir, uid='pad',
                   model='ltr_pop' if cls is LTRLinearWPop else
                   'ltr_linear')
    model = cls(cfg, padded)
    assert model.n_items_t == padded.n_items_padded
    trainer = Trainer(cfg, model, padded)
    trainer.fit()
    preds, _ = trainer.predict(range(padded.n_users), with_scores=True)
    for row in preds:
        assert all(i < padded.n_items for i in row), 'phantom item surfaced'


def test_mesh_eval_uses_ltr_head(ltr_data, tmp_path, dummy_dir):
    """Under a mesh, LTR evaluate must score through the trained head,
    not the plain dot product (regression for the sharded-topk bypass)."""
    from textgcn_tpu.parallel.mesh import make_mesh, shard_model

    mesh = make_mesh((4, 2))
    padded = ltr_data.padded_to(mesh.size)
    cfg = make_cfg(tmp_path, dummy_dir, uid='meshltr', dropout=0.0)
    model = LTRLinear(cfg, padded)
    assert model.supports_plain_sharded_topk is False
    shard_model(mesh, model)
    tr_mesh = Trainer(cfg, model, padded, mesh=mesh)

    model_s = LTRLinear(cfg, ltr_data)
    tr_single = Trainer(cfg, model_s, ltr_data)
    # force identical params (mesh tables are row-padded copies)
    import jax.numpy as _jnp
    pu = np.asarray(tr_single.params['user_emb'])
    pi = np.asarray(tr_single.params['item_emb'])
    tr_mesh.params = {
        'user_emb': _jnp.asarray(np.pad(
            pu, ((0, model.n_users_t - pu.shape[0]), (0, 0)))),
        'item_emb': _jnp.asarray(np.pad(
            pi, ((0, model.n_items_t - pi.shape[0]), (0, 0)))),
        'tower': tr_single.params['tower'],
    }
    r_mesh = tr_mesh.evaluate()
    r_single = tr_single.evaluate()
    for m in r_single:
        np.testing.assert_allclose(r_mesh[m], r_single[m], atol=1e-4)


def test_fused_sharded_topk_matches_single(ltr_data, tmp_path, dummy_dir):
    """The catalog-sharded LTR eval (fused_catalog_inputs + sharded_topk
    + bias) must return the same top-k values AND ids as the single-chip
    fused scoring, including the folded popularity columns (WPop)."""
    import jax.numpy as jnp
    from textgcn_tpu.parallel.mesh import make_mesh, shard_model
    from textgcn_tpu.parallel.sharded import sharded_topk

    mesh = make_mesh((4, 2))
    padded = ltr_data.padded_to(mesh.size)
    cfg = make_cfg(tmp_path, dummy_dir, uid='fusedsh', model='ltr_pop',
                   dropout=0.0)
    model = LTRLinearWPop(cfg, padded)
    assert model.supports_fused_sharded_topk
    shard_model(mesh, model)
    params = model.init_params(jax.random.key(0))
    reprs = model.representation(params, training=False)
    bu = jnp.arange(padded.n_users, dtype=jnp.int32)

    vals_s, idx_s = model.topk_for_users(params, reprs, bu, 5)

    u_cat, i_cat, bias = model.fused_catalog_inputs(params, reprs, bu)
    vals_m, idx_m = sharded_topk(mesh, u_cat, i_cat,
                                 model.pos_padded[bu], 5,
                                 n_valid=model.n_items)
    vals_m = vals_m + bias

    np.testing.assert_array_equal(np.asarray(idx_m), np.asarray(idx_s))
    np.testing.assert_allclose(np.asarray(vals_m), np.asarray(vals_s),
                               atol=1e-5)


def test_mesh_base_eval_uses_plain_scoring(ltr_data, tmp_path, dummy_dir):
    """--load_base evaluates the loaded base with PLAIN GCN scoring
    before the head takes over (reference ltr_models.py:66-68,175-179);
    under a mesh this must not fall through to the fused head path
    (which would score with the untrained random tower)."""
    import jax.numpy as jnp
    from textgcn_tpu.parallel.mesh import make_mesh, shard_model
    from textgcn_tpu.parallel.sharded import sharded_topk

    mesh = make_mesh((4, 2))
    padded = ltr_data.padded_to(mesh.size)
    cfg = make_cfg(tmp_path, dummy_dir, uid='baseeval', dropout=0.0)
    model = LTRLinear(cfg, padded)
    shard_model(mesh, model)
    tr = Trainer(cfg, model, padded, mesh=mesh)

    model.score_with_head = False
    tr._eval_fn = None
    r_base = tr.evaluate()
    model.score_with_head = True
    tr._eval_fn = None
    r_head = tr.evaluate()

    # plain-scoring oracle: distributed top-k over raw reprs
    reprs = model.representation(tr.params, training=False)
    bu = jnp.asarray(tr._test_users_padded.reshape(-1, cfg.batch_size))
    vals, idx = sharded_topk(mesh, reprs[0][bu[0]], reprs[1],
                             model.pos_padded[bu[0]], max(cfg.k),
                             n_valid=model.n_items)
    from textgcn_tpu.ops import metrics as metrics_mod
    preds = np.asarray(idx)[:tr._n_test_users]
    want = metrics_mod.calculate_metrics(preds, padded.true_test, cfg.k)
    np.testing.assert_allclose(r_base['recall'], want['recall'],
                               atol=1e-6)
    del r_head  # head-path eval exercised above; value differs by init


def test_fused_sharded_topk_approx_serving(ltr_data, tmp_path, dummy_dir,
                                           monkeypatch):
    """Serving mode on the fused catalog-sharded LTR path: per-shard
    approx_max_k + exact merge must retrieve (tiny catalog => recall 1)."""
    import jax.numpy as jnp
    from textgcn_tpu.parallel.mesh import make_mesh, shard_model
    from textgcn_tpu.parallel.sharded import sharded_topk

    mesh = make_mesh((4, 2))
    padded = ltr_data.padded_to(mesh.size)
    cfg = make_cfg(tmp_path, dummy_dir, uid='fsrv', model='ltr_pop',
                   dropout=0.0)
    model = LTRLinearWPop(cfg, padded)
    shard_model(mesh, model)
    params = model.init_params(jax.random.key(0))
    reprs = model.representation(params, training=False)
    bu = jnp.arange(padded.n_users, dtype=jnp.int32)
    u_cat, i_cat, bias = model.fused_catalog_inputs(params, reprs, bu)

    vals_e, idx_e = sharded_topk(mesh, u_cat, i_cat,
                                 model.pos_padded[bu], 5,
                                 n_valid=model.n_items)
    vals_a, idx_a = sharded_topk(mesh, u_cat, i_cat,
                                 model.pos_padded[bu], 5,
                                 n_valid=model.n_items, approx=0.95)
    # tiny per-shard catalogs: approx falls back to a full reduction, so
    # ids must match exactly; values within bf16 tolerance
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_e))
    np.testing.assert_allclose(np.asarray(vals_a), np.asarray(vals_e),
                               atol=0.05, rtol=0.02)
