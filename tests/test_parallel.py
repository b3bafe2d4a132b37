"""Mesh layer: sharded training step + distributed top-k equivalence.

SURVEY.md §4 distributed strategy: fake an 8-device mesh on CPU
(conftest sets xla_force_host_platform_device_count=8) and assert
sharded-vs-single-device numerical equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from textgcn_tpu.config import Config
from textgcn_tpu.data.core import load_interactions
from textgcn_tpu.models.lightgcn import LightGCN
from textgcn_tpu.parallel.mesh import make_mesh, shard_model, shard_params
from textgcn_tpu.parallel.sharded import (make_sharded_train_step,
                                          sharded_topk)


@pytest.fixture(scope='module')
def mesh():
    return make_mesh((4, 2))


def test_mesh_shape(mesh):
    assert mesh.shape == {'data': 4, 'model': 2}
    assert mesh.size == 8


def test_sharded_topk_matches_local(mesh, rng):
    b, n_items, d, k = 8, 512, 16, 5
    users_emb = jnp.asarray(rng.randn(b, d).astype(np.float32))
    items_emb = jnp.asarray(rng.randn(n_items, d).astype(np.float32))
    pos = np.full((b, 3), n_items, dtype=np.int32)
    pos[0, :2] = [3, 100]
    pos[5, :1] = [499]
    pos_j = jnp.asarray(pos)

    from textgcn_tpu.ops.retrieval import score_and_topk
    want_v, want_i = score_and_topk(users_emb, items_emb, pos_j, k=k,
                                    n_items=n_items)
    got_v, got_i = sharded_topk(mesh, users_emb, items_emb, pos_j, k)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_sharded_topk_approx_serving(mesh, rng):
    """Serving mode on the mesh: per-shard approx_max_k + exact merge.
    Returned pairs must be genuine masked scores and recall vs the exact
    path must meet the per-shard target (the merge is exact, so global
    recall is bounded below by it; on CPU approx_max_k falls back to the
    exact reduction, making recall 1.0 here — the assertion still
    exercises the full routing + merge)."""
    b, n_items, d, k = 8, 4096, 16, 10
    users_emb = jnp.asarray(rng.randn(b, d).astype(np.float32))
    items_emb = jnp.asarray(rng.randn(n_items, d).astype(np.float32))
    pos = np.full((b, 3), n_items, dtype=np.int32)
    pos[0, :2] = [3, 100]
    pos_j = jnp.asarray(pos)

    from textgcn_tpu.ops.retrieval import score_and_topk
    want_v, want_i = score_and_topk(users_emb, items_emb, pos_j, k=k,
                                    n_items=n_items)
    got_v, got_i = sharded_topk(mesh, users_emb, items_emb, pos_j, k,
                                approx=0.95)
    # genuine (score, id) pairs, descending (serving mode emits bf16
    # local scores, so compare at bf16 tolerance)
    scores = np.asarray(users_emb) @ np.asarray(items_emb).T
    scores[0, [3, 100]] = -np.inf
    np.testing.assert_allclose(
        np.asarray(got_v),
        np.take_along_axis(scores, np.asarray(got_i), axis=1),
        rtol=1e-2, atol=1e-2)
    assert (np.diff(np.asarray(got_v), axis=1) <= 1e-6).all()
    # recall vs exact meets the per-shard target
    hits = sum(len(np.intersect1d(np.asarray(got_i)[r],
                                  np.asarray(want_i)[r]))
               for r in range(b))
    assert hits >= 0.95 * b * k


def _build(dummy_dir, mesh=None):
    cfg = Config(model='lgcn', data=str(dummy_dir), epochs=1,
                 batch_size=16, emb_size=16, n_layers=2, dropout=0.0,
                 k=(3,), save=False, save_path='/tmp/par_run').finalize()
    data = load_interactions(cfg.data)
    if mesh is not None:
        data = data.padded_to(mesh.size)
    model = LightGCN(cfg, data)
    return cfg, data, model


def test_sharded_step_matches_single(dummy_dir, mesh):
    """One Adam step on the mesh == the same step on one device (dropout
    off so the computation is deterministic)."""
    cfg_s, data_s, model_s = _build(dummy_dir)
    cfg_m, data_m, model_m = _build(dummy_dir, mesh)
    model_m = shard_model(mesh, model_m)

    params_s = model_s.init_params(jax.random.key(0))
    params_m = shard_params(mesh, model_m.init_params(jax.random.key(0)))
    # same init values (padding rows extra in mesh case)
    nu, ni = data_s.n_users, data_s.n_items

    optimizer = optax.adam(cfg_s.lr)
    opt_s = optimizer.init(params_s)
    opt_m = optimizer.init(params_m)

    batch = jax.tree.map(lambda x: x[0],
                         model_s.sample_batches(jax.random.key(1), 16))

    def single_step(params, opt_state, batch, key):
        (loss, _), grads = jax.value_and_grad(
            model_s.loss, has_aux=True)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step_m = make_sharded_train_step(mesh, model_m, optimizer)

    key = jax.random.key(2)
    p_s, _, loss_s = jax.jit(single_step)(params_s, opt_s, batch, key)
    p_m, _, loss_m = step_m(params_m, opt_m, tuple(batch), key)

    assert float(loss_s) == pytest.approx(float(loss_m), rel=1e-5)
    np.testing.assert_allclose(np.asarray(p_m['user_emb'])[:nu],
                               np.asarray(p_s['user_emb'])[:nu], atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_m['item_emb'])[:ni],
                               np.asarray(p_s['item_emb'])[:ni], atol=1e-5)


def test_sharded_ltr_step_trains_tower(dummy_dir, mesh):
    """One LTR Adam step on the mesh == single device, INCLUDING the
    replicated tower head.  The collective audit (tools/collective_audit)
    shows no tower-shaped all-reduce in the compiled step — GSPMD covers
    the tiny head via the existing batch gathers — so this test is the
    proof that tower gradients are still globally correct."""
    from textgcn_tpu.registry import get_class

    def build(mesh=None):
        cfg = Config(model='ltr_linear', data=str(dummy_dir), epochs=1,
                     batch_size=16, emb_size=16, n_layers=2, dropout=0.0,
                     k=(3,), save=False,
                     save_path='/tmp/par_ltr_run').finalize()
        loader, model_cls = get_class('ltr_linear')
        data = loader(cfg)
        if mesh is not None:
            data = data.padded_to(mesh.size)
        return cfg, data, model_cls(cfg, data)

    cfg_s, data_s, model_s = build()
    cfg_m, data_m, model_m = build(mesh)
    model_m = shard_model(mesh, model_m)

    params_s = model_s.init_params(jax.random.key(0))
    params_m = shard_params(mesh, model_m.init_params(jax.random.key(0)))
    optimizer = optax.adam(cfg_s.lr)

    batch = jax.tree.map(lambda x: x[0],
                         model_s.sample_batches(jax.random.key(1), 16))

    def single_step(params, opt_state, batch, key):
        (loss, _), grads = jax.value_and_grad(
            model_s.loss, has_aux=True)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step_m = make_sharded_train_step(mesh, model_m, optimizer)

    key = jax.random.key(2)
    p_s, _, loss_s = jax.jit(single_step)(
        params_s, optimizer.init(params_s), batch, key)
    p_m, _, loss_m = step_m(params_m, optimizer.init(params_m),
                            tuple(batch), key)

    assert float(loss_s) == pytest.approx(float(loss_m), rel=1e-5)
    # tower head must have moved AND match the single-device trajectory
    w0 = np.asarray(model_s.init_params(jax.random.key(0))['tower'][0]['w'])
    w_s = np.asarray(p_s['tower'][0]['w'])
    w_m = np.asarray(p_m['tower'][0]['w'])
    assert not np.allclose(w_s, w0)
    np.testing.assert_allclose(w_m, w_s, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_m['tower'][0]['b']),
                               np.asarray(p_s['tower'][0]['b']), atol=1e-5)
    nu, ni = data_s.n_users, data_s.n_items
    np.testing.assert_allclose(np.asarray(p_m['user_emb'])[:nu],
                               np.asarray(p_s['user_emb'])[:nu], atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_m['item_emb'])[:ni],
                               np.asarray(p_s['item_emb'])[:ni], atol=1e-5)


@pytest.mark.parametrize('name', ['adv_sampling', 'gat', 'kg'])
def test_sharded_family_step_matches_single(dummy_dir, mesh, name):
    """One Adam step on the mesh == single device for the families most
    likely to break under sharding: adv_sampling's (B, n_items) Bernoulli
    candidate mask + hard-negative mining, the attention conv's in-trace
    degree recompute + segment softmax, and the KG semantic loss's
    captured text-feature tables (VERDICT r3 weak #5)."""
    from textgcn_tpu.registry import get_class

    def build(mesh=None):
        kw = dict(model=name, data=str(dummy_dir), epochs=1,
                  batch_size=16, emb_size=16, n_layers=2, dropout=0.0,
                  k=(3,), save=False, save_path='/tmp/par_fam_run')
        if name == 'gat':
            kw['aggr'] = 'mean'
        cfg = Config(**kw).finalize()
        loader, model_cls = get_class(name)
        data = loader(cfg)
        if mesh is not None:
            data = data.padded_to(mesh.size)
        return cfg, data, model_cls(cfg, data)

    cfg_s, data_s, model_s = build()
    cfg_m, data_m, model_m = build(mesh)
    model_m = shard_model(mesh, model_m)

    params_s = model_s.init_params(jax.random.key(0))
    params_m = shard_params(mesh, model_m.init_params(jax.random.key(0)))
    optimizer = optax.adam(cfg_s.lr)

    batch = jax.tree.map(lambda x: x[0],
                         model_s.sample_batches(jax.random.key(1), 16))

    def single_step(params, opt_state, batch, key):
        (loss, _), grads = jax.value_and_grad(
            model_s.loss, has_aux=True)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step_m = make_sharded_train_step(mesh, model_m, optimizer)

    key = jax.random.key(2)
    p_s, _, loss_s = jax.jit(single_step)(
        params_s, optimizer.init(params_s), batch, key)
    p_m, _, loss_m = step_m(params_m, optimizer.init(params_m),
                            tuple(batch), key)

    assert float(loss_s) == pytest.approx(float(loss_m), rel=1e-5)
    nu, ni = data_s.n_users, data_s.n_items
    np.testing.assert_allclose(np.asarray(p_m['user_emb'])[:nu],
                               np.asarray(p_s['user_emb'])[:nu], atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_m['item_emb'])[:ni],
                               np.asarray(p_s['item_emb'])[:ni], atol=1e-5)
    if name == 'gat':   # replicated conv layer params follow the same
        for l_s, l_m in zip(p_s['convs'], p_m['convs']):
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=1e-5), l_s, l_m)


def test_mesh_trainer_end_to_end(dummy_dir, mesh, tmp_path):
    """Full fit + evaluate on the mesh == single device within tolerance
    (sampling/dropout are seeded identically; dropout off here)."""
    from textgcn_tpu.train.trainer import Trainer

    def run(use_mesh):
        # the mesh run also chunks its epoch scan (steps_per_call) so the
        # sharded-batch + donated-params interplay of the chunked path is
        # covered: results must still equal the single-device whole-epoch run
        cfg = Config(model='lgcn', data=str(dummy_dir), epochs=8,
                     evaluate_every=4, batch_size=16, emb_size=16,
                     n_layers=2, dropout=0.0, k=(3, 5), save=False,
                     steps_per_call=2 if use_mesh else 0,
                     save_path=str(tmp_path / f'm{use_mesh}')).finalize()
        data = load_interactions(cfg.data)
        m = None
        if use_mesh:
            m = mesh
            data = data.padded_to(m.size)
        model = LightGCN(cfg, data)
        if use_mesh:
            shard_model(m, model)
        tr = Trainer(cfg, model, data, mesh=m)
        tr.fit()
        return tr.metrics_logger

    single = run(False)
    meshed = run(True)
    for metric in single:
        np.testing.assert_allclose(meshed[metric], single[metric],
                                   atol=1e-4)


def test_sharded_representation_matches_single(dummy_dir, mesh, rng):
    cfg_s, data_s, model_s = _build(dummy_dir)
    cfg_m, data_m, model_m = _build(dummy_dir, mesh)
    model_m = shard_model(mesh, model_m)

    params = model_s.init_params(jax.random.key(0))
    params_m = shard_params(mesh, model_m.init_params(jax.random.key(0)))

    u_s, i_s = jax.jit(
        lambda p: model_s.representation(p, training=False))(params)
    u_m, i_m = jax.jit(
        lambda p: model_m.representation(p, training=False))(params_m)
    nu, ni = data_s.n_users, data_s.n_items
    np.testing.assert_allclose(np.asarray(u_m)[:nu], np.asarray(u_s)[:nu],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_m)[:ni], np.asarray(i_s)[:ni],
                               atol=1e-5)


def test_auto_shape_model_axis_is_power_of_two():
    """Auto mesh shapes keep the model axis a power of two so it always
    divides the pallas backend's power-of-two table padding."""
    from textgcn_tpu.parallel.mesh import _auto_shape

    for n in (1, 2, 3, 4, 6, 8, 9, 12, 16, 24, 32, 9 * 9):
        data, model = _auto_shape(n)
        assert data * model == n
        assert model & (model - 1) == 0, (n, model)
        assert model * model <= n
