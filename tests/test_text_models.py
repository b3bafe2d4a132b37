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


def test_reviews_pos_user_lookup(dummy_dir):
    """pos='user': the (item, user) pair vector matches the review's
    embedding; missing pairs give zeros."""
    import jax.numpy as jnp

    from textgcn_tpu.config import Config
    from textgcn_tpu.data.text import load_ltr_data
    from textgcn_tpu.models.text_loss import TextModelReviews

    cfg = Config(model='reviews', data=str(dummy_dir), batch_size=16,
                 emb_size=16, n_layers=2, k=(3,),
                 save_path='/tmp/tpu_rev').finalize()
    data = load_ltr_data(cfg)
    model = TextModelReviews(cfg, data, pos='user')

    # every known train review pair resolves to its own vector
    items = jnp.asarray(data.review_pair_items)
    users = jnp.asarray(data.review_pair_users)
    vecs = model._item_reviews_user(items, users)
    np.testing.assert_allclose(np.asarray(vecs),
                               data.review_pair_vectors, atol=1e-6)
    # an absent pair gives zeros
    vec0 = model._item_reviews_user(jnp.asarray([data.n_items - 1]),
                                    jnp.asarray([data.n_users - 1]))
    known = ((data.review_pair_items == data.n_items - 1)
             & (data.review_pair_users == data.n_users - 1)).any()
    if not known:
        assert np.abs(np.asarray(vec0)).sum() == 0.0

    # the model trains with the pair representation
    import jax
    params = model.init_params(jax.random.key(0))
    batch = jax.tree.map(lambda x: x[0],
                         model.sample_batches(jax.random.key(1), 16))
    loss, _ = model.loss(params, batch, jax.random.key(2))
    assert np.isfinite(float(loss))


def test_embed_text_reads_reference_torch_cache(tmp_path):
    """Drop-in compat: a reference-produced .torch cache file is read."""
    import pandas as pd
    import torch

    from textgcn_tpu.data.text import embed_text

    vecs = torch.arange(12.0).reshape(3, 4)
    cache = str(tmp_path / 'item_kg_repr_model_0-seed')
    torch.save(vecs, cache + '.torch')
    out = embed_text(pd.Series(['a', 'b', 'c']), cache, 'any', 8)
    np.testing.assert_array_equal(out, vecs.numpy())


def test_k_too_large_raises(dummy_dir):
    import pytest as _pytest

    from textgcn_tpu.config import Config
    from textgcn_tpu.data.core import load_interactions
    from textgcn_tpu.models.lightgcn import LightGCN
    from textgcn_tpu.train.trainer import Trainer

    cfg = Config(model='lgcn', data=str(dummy_dir), k=(50,),
                 save_path='/tmp/ktest').finalize()
    data = load_interactions(cfg.data)
    model = LightGCN(cfg, data)
    with _pytest.raises(AssertionError, match='less than number of items'):
        Trainer(cfg, model, data)


def test_boosted_checkpoint_roundtrip(dummy_dir, tmp_path, monkeypatch):
    """gbdt runs honor the latest/best contract: params + fitted tree are
    persisted and restored."""
    import os

    monkeypatch.chdir(tmp_path)
    tr = main(['--model', 'gbdt', '--data', str(dummy_dir),
               '--batch_size', '16', '--emb_size', '16',
               '-k', '3', '--uid', 'gbdt_save'])
    run_dir = tr.cfg.save_path
    assert os.path.exists(os.path.join(run_dir, 'latest_checkpoint.pkl'))
    assert os.path.exists(os.path.join(run_dir, 'best.pkl'))
    assert os.path.exists(os.path.join(run_dir, 'tree.pkl'))

    tr2 = main(['--model', 'gbdt', '--data', str(dummy_dir),
                '--batch_size', '16', '--emb_size', '16',
                '-k', '3', '--uid', 'gbdt_load', '--no_train',
                '--load', run_dir, '--no_save'])
    assert tr2.model._tree_fitted
    # the restored ensemble scores identically
    import numpy as np
    p1 = tr.predict(range(3))
    p2 = tr2.predict(range(3))
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    # ...and through the DEVICE path: the reloaded ensemble recompiles
    # to a Forest (ops/trees.py) whose arrays match the original's —
    # the predict equality above must not be riding the host fallback
    import jax

    from textgcn_tpu.ops.trees import compile_forest
    f1 = compile_forest(tr.model.tree, tr.model.n_features)
    f2 = compile_forest(tr2.model.tree, tr2.model.n_features)
    assert f1 is not None and f2 is not None
    l1, l2 = jax.tree.leaves(f1), jax.tree.leaves(f2)
    assert len(l1) == len(l2) > 0
    for a, b in zip(l1, l2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize('extra', [
    ['--pos', 'user'],
    ['--pos', 'kg'],
    ['--neg', 'kg'],
    ['--weight', 'max(p-n)', '--distance', 'selu(b-g)'],
    ['--weight', 'max(p-n)_|g-b|'],     # reference combined form
    ['--dist_fn', 'cosine_minus'],
    ['--popularity_mode', 'compat'],
])
def test_text_knobs_reach_model_from_cli(extra, dummy_dir, tmp_path,
                                         monkeypatch):
    """Every text-family knob is reachable from the CLI (the reference's
    flags are commented out of its parser, parser.py:146-159)."""
    monkeypatch.chdir(tmp_path)
    tr = run_cli(['--model', 'text', '--data', str(dummy_dir),
                  '--epochs', '2', '--evaluate_every', '2',
                  '--batch_size', '16', '--emb_size', '16',
                  '-k', '3', '--uid', 'knob'] + extra)
    assert np.isfinite(tr.metrics_logger['recall']).all()
    model = tr.model
    if extra[0] == '--pos':
        assert model.pos_mode == extra[1]
    if extra[0] == '--neg':
        assert model.neg_mode == extra[1]
    if extra[0] == '--dist_fn':
        from textgcn_tpu.models.text_loss import DIST_FNS
        assert model.dist_fn is DIST_FNS[extra[1]]
    if extra == ['--weight', 'max(p-n)_|g-b|']:
        from textgcn_tpu.models.text_loss import (DISTANCE_FORMULAS,
                                                  WEIGHT_FORMULAS)
        assert model.weight_formula is WEIGHT_FORMULAS['max(p-n)']
        assert model.distance_formula is DISTANCE_FORMULAS['|g-b|']


def test_popularity_compat_mode_reaches_data(dummy_dir, tmp_path,
                                             monkeypatch):
    """--popularity_mode compat yields the reference's literal (buggy)
    popularity values, different from the fixed ones."""
    from textgcn_tpu.config import parse_args
    from textgcn_tpu.data.text import load_ltr_data

    monkeypatch.chdir(tmp_path)
    base_args = ['--model', 'ltr_pop', '--data', str(dummy_dir),
                 '--no_save', '--uid', 'pop']
    fixed = load_ltr_data(parse_args(base_args))
    compat = load_ltr_data(parse_args(base_args
                                      + ['--popularity_mode', 'compat']))
    assert not np.array_equal(fixed.popularity_items,
                              compat.popularity_items)


def test_marcus_boosted_head(dummy_dir, tmp_path, monkeypatch):
    """Marcus variant: trees fit on positives + sampled negatives per
    positive (O(n_train*(1+neg)) rows), not the full catalog matrix."""
    monkeypatch.chdir(tmp_path)
    from textgcn_tpu.models.ltr_boosted import MarcusGradientBoosted

    seen = {}
    orig_fit = None

    def spy(self, x, y, **kw):
        seen['shape'] = x.shape
        seen['y_pos'] = float(np.asarray(y).sum())
        return orig_fit(self, x, y)

    import sklearn.ensemble
    orig_fit = sklearn.ensemble.GradientBoostingRegressor.fit
    monkeypatch.setattr(sklearn.ensemble.GradientBoostingRegressor,
                        'fit', spy)
    tr = run_cli(['--model', 'marcus', '--data', str(dummy_dir),
                  '--batch_size', '16', '--emb_size', '16',
                  '--neg_samples', '2', '-k', '3', '--uid', 'marcus'])
    assert tr.model._tree_fitted
    assert isinstance(tr.model, MarcusGradientBoosted)
    n_train = tr.data.n_train
    # one row per positive + neg_samples sampled negatives per positive
    assert seen['shape'] == (n_train * 3, tr.model.n_features)
    assert seen['y_pos'] == n_train
    assert np.isfinite(tr.inner.metrics_logger['recall']).all()


def test_text_model_under_mesh(dummy_dir, tmp_path, monkeypatch):
    """Text family on the (data x model) mesh end to end: semantic loss
    + plain sharded-topk eval over sharded tables."""
    monkeypatch.chdir(tmp_path)
    tr = run_cli(['--model', 'text', '--data', str(dummy_dir),
                  '--epochs', '2', '--evaluate_every', '2',
                  '--batch_size', '16', '--emb_size', '16',
                  '-k', '3', '--uid', 'text-mesh', '--mesh', '4x2'])
    assert np.isfinite(tr.metrics_logger['recall']).all()


def test_embed_text_cache_invalidates_on_changed_rows(tmp_path,
                                                      monkeypatch):
    """A cache written for one text row set must not be served for a
    different one (e.g. --reshuffle filtering different review rows):
    the fingerprint sidecar triggers a re-encode instead of silently
    misaligning rows."""
    import pandas as pd

    from textgcn_tpu.data.text import embed_text

    monkeypatch.setenv('TEXTGCN_TPU_TEXT_ENCODER', 'stub')
    cache = str(tmp_path / 'review_repr_model_0-seed')
    first = embed_text(pd.Series(['aa', 'bb', 'cc']), cache, 'any', 8)
    # same rows -> served from cache (bitwise)
    again = embed_text(pd.Series(['aa', 'bb', 'cc']), cache, 'any', 8)
    np.testing.assert_array_equal(first, again)
    # same length, different content -> re-encoded, not the stale matrix
    other = embed_text(pd.Series(['aa', 'bb', 'dd']), cache, 'any', 8)
    assert not np.array_equal(first, other)
    assert not np.array_equal(first[2], other[2])
    # different length -> re-encoded with the right shape
    longer = embed_text(pd.Series(['aa', 'bb', 'cc', 'dd']), cache,
                        'any', 8)
    assert longer.shape[0] == 4
