"""Device-side tree-ensemble inference (ops/trees.py) vs sklearn."""

import numpy as np
import pytest

from textgcn_tpu.ops.trees import compile_forest, forest_predict


def _data(n=4000, f=5, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, f).astype(np.float32)
    y = (x[:, 0] * 2 - x[:, 1] + 0.3 * x[:, 2] * x[:, 3]
         + 0.1 * rng.randn(n)).astype(np.float32)
    return x, y


def test_gbrt_matches_sklearn_predict():
    from sklearn.ensemble import GradientBoostingRegressor
    x, y = _data()
    tree = GradientBoostingRegressor(n_estimators=20, max_depth=3,
                                     random_state=0)
    tree.fit(x, y)
    forest = compile_forest(tree, x.shape[1])
    assert forest is not None
    xq, _ = _data(2000, seed=1)
    got = np.asarray(forest_predict(forest, xq))
    want = tree.predict(xq)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warm_started_gbrt():
    from sklearn.ensemble import GradientBoostingRegressor
    x, y = _data()
    tree = GradientBoostingRegressor(n_estimators=5, max_depth=3,
                                     warm_start=True, random_state=0)
    tree.fit(x[:2000], y[:2000])
    tree.set_params(n_estimators=10)
    tree.fit(x[2000:], y[2000:])
    forest = compile_forest(tree, x.shape[1])
    got = np.asarray(forest_predict(forest, x))
    np.testing.assert_allclose(got, tree.predict(x), rtol=1e-5, atol=1e-5)


def test_decision_tree_and_random_forest():
    from sklearn.ensemble import RandomForestRegressor
    from sklearn.tree import DecisionTreeRegressor
    x, y = _data(1000)
    for model in (DecisionTreeRegressor(max_depth=4, random_state=0),
                  RandomForestRegressor(n_estimators=7, max_depth=4,
                                        random_state=0)):
        model.fit(x, y)
        forest = compile_forest(model, x.shape[1])
        got = np.asarray(forest_predict(forest, x))
        np.testing.assert_allclose(got, model.predict(x),
                                   rtol=1e-5, atol=1e-5)


def test_threshold_edge_rows_match():
    """Rows that sit exactly ON split thresholds still route like sklearn
    (thresholds are rounded down to f32 so ``x <= t`` agrees bitwise)."""
    from sklearn.tree import DecisionTreeRegressor
    x, y = _data(500, f=4)
    model = DecisionTreeRegressor(max_depth=3, random_state=0)
    model.fit(x, y)
    t = model.tree_
    thr = t.threshold[t.children_left != -1]
    feat = t.feature[t.children_left != -1]
    # probe points exactly at each threshold (f32-rounded) in every slot
    probes = np.zeros((len(thr), x.shape[1]), np.float32)
    for i, (f, v) in enumerate(zip(feat, thr)):
        probes[i, :] = np.float32(v)
    forest = compile_forest(model, x.shape[1])
    got = np.asarray(forest_predict(forest, probes))
    np.testing.assert_allclose(got, model.predict(probes),
                               rtol=1e-6, atol=1e-6)


def test_single_leaf_tree():
    """A stump that never splits (constant target) still compiles."""
    from sklearn.tree import DecisionTreeRegressor
    x = np.random.RandomState(0).randn(50, 4).astype(np.float32)
    y = np.full(50, 3.25, np.float32)
    model = DecisionTreeRegressor(max_depth=2).fit(x, y)
    forest = compile_forest(model, 4)
    got = np.asarray(forest_predict(forest, x))
    np.testing.assert_allclose(got, model.predict(x), rtol=1e-6)


def test_unsupported_model_returns_none():
    class NotATree:
        pass

    assert compile_forest(NotATree(), 5) is None


def test_forest_is_jit_argument():
    """The Forest pytree passes through jit as an argument (repo
    convention: no constant-embedded device arrays)."""
    import jax

    from sklearn.ensemble import GradientBoostingRegressor
    x, y = _data(500)
    tree = GradientBoostingRegressor(n_estimators=3, max_depth=2,
                                     random_state=0).fit(x, y)
    forest = compile_forest(tree, x.shape[1])

    @jax.jit
    def f(forest, x):
        return forest_predict(forest, x)

    np.testing.assert_allclose(np.asarray(f(forest, x)), tree.predict(x),
                               rtol=1e-5, atol=1e-5)


def test_boosted_model_device_scorer_matches_host(dummy_model):
    """make_tree_scorer's device path equals the host tree_scores path."""
    import jax.numpy as jnp

    model, params = dummy_model
    reprs = model.representation(params, training=False)
    rng = np.random.RandomState(0)
    model.fit_trees(params, model.pos_padded, model.pos_degree,
                    batch_size=32)
    bu = jnp.asarray(rng.choice(model.n_users, min(model.n_users, 16),
                                replace=False).astype(np.int32))
    host = np.asarray(model.tree_scores(params, reprs, bu))
    dev = np.asarray(model.make_tree_scorer(params, reprs)(bu))
    real = slice(0, model.n_items)
    np.testing.assert_allclose(dev[:, real], host[:, real],
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.isneginf(dev[:, model.n_items:]))


@pytest.fixture()
def dummy_model(dummy_dir, tmp_path):
    import jax

    from textgcn_tpu.config import Config
    from textgcn_tpu.data.text import load_ltr_data
    from textgcn_tpu.models.ltr_boosted import LTRGradientBoosted

    cfg = Config(model='gbdt', data=str(dummy_dir), epochs=1,
                 batch_size=16, emb_size=16, n_layers=2, k=(3,),
                 seed=0, save_path=str(tmp_path / 'run')).finalize()
    data = load_ltr_data(cfg)
    model = LTRGradientBoosted(cfg, data)
    params = model.init_params(jax.random.key(0))
    return model, params


def test_xgboost_style_fit_continues_booster(dummy_model):
    """Trees exposing get_booster (xgboost API, no warm_start param) must
    receive the previous booster via xgb_model on every batch after the
    first — otherwise each fit() discards prior batches and the final
    ensemble reflects only the last one."""
    model, params = dummy_model

    class FakeRanker:
        """Duck-typed XGBRanker: records fit calls."""

        def __init__(self):
            self.fits = []
            self._fitted = False

        def get_params(self):
            return {'n_estimators': 75}  # no 'warm_start', like xgboost

        def set_params(self, **kw):
            raise AssertionError('set_params must not be used here')

        def get_booster(self):
            assert self._fitted
            return ('booster', len(self.fits))

        def fit(self, x, y, group=None, xgb_model=None):
            self.fits.append({'rows': len(y), 'group': group,
                              'xgb_model': xgb_model})
            self._fitted = True

    model.tree = FakeRanker()
    model.fit_trees(params, model.pos_padded, model.pos_degree,
                    batch_size=4)
    fits = model.tree.fits
    assert len(fits) > 1  # 12 dummy users / batch 4
    assert fits[0]['xgb_model'] is None
    for i, f in enumerate(fits[1:], 1):
        assert f['xgb_model'] == ('booster', i), \
            'batch %d did not continue from the previous booster' % i
        assert f['group'] is not None
