"""Cached propagation (--refresh_every): throughput mode that refreshes
the propagated (non-ego) part every N steps instead of per step.

No reference counterpart (the reference backpropagates through a full
propagation every batch, ``base_model.py:148,181-184``); this is a
TPU-native production-training feature — at scale the train step is
~95-99% SpMM time (SCALE.md), so amortizing it is the one remaining
throughput lever.  Exact semantics stay the default (refresh_every=0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textgcn_tpu.config import Config
from textgcn_tpu.data.core import load_interactions
from textgcn_tpu.models.lightgcn import LightGCN
from textgcn_tpu.train.trainer import Trainer


def make_cfg(tmp_path, dummy_dir, **kw):
    defaults = dict(model='lgcn', data=str(dummy_dir), epochs=5,
                    evaluate_every=5, batch_size=16, emb_size=16,
                    n_layers=2, dropout=0.2, k=(3,), save=False, seed=0,
                    save_path=str(tmp_path / 'run'))
    defaults.update(kw)
    cfg = Config(**defaults).finalize()
    cfg.validate()
    return cfg


def _model(tmp_path, dummy_dir, **kw):
    cfg = make_cfg(tmp_path, dummy_dir, **kw)
    data = load_interactions(cfg.data)
    return cfg, data, LightGCN(cfg, data)


def test_rest_plus_ego_equals_representation(tmp_path, dummy_dir):
    """cached_reprs(params, propagate_rest(params)) must equal the exact
    layer-mean representation (no dropout)."""
    cfg, data, model = _model(tmp_path, dummy_dir, dropout=0.0)
    params = model.init_params(jax.random.key(1))
    rest = model.propagate_rest(params)
    cu, ci = model.cached_reprs(params, rest)
    e_u, e_i = model.representation(params, training=False)
    np.testing.assert_allclose(np.asarray(cu), np.asarray(e_u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(e_i), atol=1e-6)


def test_rest_identity_under_dropout_same_key(tmp_path, dummy_dir):
    """With an identical dropout key the cached decomposition reproduces
    the exact training-time representation bit-for-bit in structure."""
    cfg, data, model = _model(tmp_path, dummy_dir, dropout=0.4)
    params = model.init_params(jax.random.key(2))
    key = jax.random.key(7)
    exact_u, exact_i = model.representation(params, training=True,
                                            dropout_key=key)
    rest = model.propagate_rest(params, key)
    cu, ci = model.cached_reprs(params, rest)
    np.testing.assert_allclose(np.asarray(cu), np.asarray(exact_u),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(exact_i),
                               atol=1e-6)


def test_with_cached_rest_routes_training_representation(tmp_path,
                                                         dummy_dir):
    cfg, data, model = _model(tmp_path, dummy_dir, dropout=0.0)
    params = model.init_params(jax.random.key(3))
    rest = jax.tree.map(lambda a: a * 0 + 1.0,
                        (params['user_emb'], params['item_emb']))
    with model.with_cached_rest(rest):
        cu, ci = model.representation(params, training=True)
        # eval-time representation must IGNORE the cache
        eu, ei = model.representation(params, training=False)
    np.testing.assert_allclose(
        np.asarray(cu),
        np.asarray((params['user_emb'] + 1.0) / (cfg.n_layers + 1)),
        atol=1e-6)
    exact_u, _ = model.representation(params, training=False)
    np.testing.assert_allclose(np.asarray(eu), np.asarray(exact_u))
    assert model._cached_rest is None  # restored after the context


def test_zero_layer_cached_training_is_exact(tmp_path, dummy_dir):
    """With n_layers=0 the rest is identically zero, so cached training
    must produce bitwise-identical parameters to exact training (same
    seed) — validates the trainer's carry/refresh plumbing end to end."""
    def run(refresh):
        cfg = make_cfg(tmp_path, dummy_dir, n_layers=0, epochs=3,
                       evaluate_every=3, refresh_every=refresh,
                       uid=f'r{refresh}')
        data = load_interactions(cfg.data)
        model = LightGCN(cfg, data)
        tr = Trainer(cfg, model, data)
        tr.fit()
        return np.asarray(tr.params['user_emb'])

    np.testing.assert_array_equal(run(0), run(1))


def test_chunked_cached_epoch_equivalence(tmp_path, dummy_dir):
    """The (rest, age) carry must thread across steps_per_call chunk
    boundaries: chunked == whole-epoch cached training exactly."""
    def run(m):
        cfg = make_cfg(tmp_path, dummy_dir, refresh_every=3, epochs=4,
                       evaluate_every=4, dropout=0.4,
                       steps_per_call=m, uid=f'spc{m}')
        data = load_interactions(cfg.data)
        model = LightGCN(cfg, data)
        tr = Trainer(cfg, model, data)
        assert model.num_batches(cfg.batch_size) > 3
        tr.fit()
        return (np.asarray(tr.params['user_emb']),
                {k: v.copy() for k, v in tr.metrics_logger.items()})

    p_whole, m_whole = run(0)
    p_chunk, m_chunk = run(2)
    np.testing.assert_allclose(p_whole, p_chunk, atol=1e-6)
    for k in m_whole:
        np.testing.assert_allclose(m_whole[k], m_chunk[k], atol=1e-6)


def test_cached_training_learns(tmp_path, dummy_dir):
    """refresh_every=2 on the dummy fixture still trains a useful model
    (beats random recall@3 on 10 items ~ 0.3 scaled by test size)."""
    cfg = make_cfg(tmp_path, dummy_dir, epochs=30, evaluate_every=10,
                   refresh_every=2, uid='learn')
    data = load_interactions(cfg.data)
    model = LightGCN(cfg, data)
    tr = Trainer(cfg, model, data)
    tr.fit()
    hist = tr.metrics_logger['recall']
    assert np.isfinite(hist).all()
    assert hist[-1][0] > 0.05


def test_mesh_cached_training_runs(tmp_path, dummy_dir):
    """Cached propagation under the 8-device mesh: the refresh cond wraps
    the mesh graph op (shard_map/GSPMD inside a lax.cond branch)."""
    from textgcn_tpu.parallel.mesh import make_mesh, shard_model

    # steps_per_call chunks the scan too: mesh x chunked x cached in one
    cfg = make_cfg(tmp_path, dummy_dir, refresh_every=2, epochs=2,
                   evaluate_every=2, dropout=0.0, uid='mesh',
                   steps_per_call=2)
    mesh = make_mesh((4, 2))
    data = load_interactions(cfg.data).padded_to(mesh.size)
    model = LightGCN(cfg, data)
    shard_model(mesh, model)
    tr = Trainer(cfg, model, data, mesh=mesh)
    tr.fit()
    assert np.isfinite(tr.metrics_logger['recall']).all()


def test_single_rejected(tmp_path, dummy_dir):
    with pytest.raises(AssertionError):
        make_cfg(tmp_path, dummy_dir, refresh_every=2, single=True)


@pytest.mark.parametrize('model_name', ['adv_sampling', 'text', 'ltr_pop'])
def test_all_families_inherit_cached_mode(tmp_path, dummy_dir,
                                          model_name):
    """Every model family routes training reprs through
    representation(training=True), so --refresh_every works everywhere
    (AdvSampl's two propagation passes both use the cache)."""
    from textgcn_tpu.registry import get_class

    cfg = make_cfg(tmp_path, dummy_dir, model=model_name, epochs=4,
                   evaluate_every=4, refresh_every=2, uid=model_name)
    loader, model_cls = get_class(model_name)
    data = loader(cfg)
    model = model_cls(cfg, data)
    tr = Trainer(cfg, model, data)
    tr.fit()
    assert np.isfinite(tr.metrics_logger['recall']).all()


def test_cached_gradient_semantics_vs_torch(tmp_path, dummy_dir, rng):
    """Cached-mode gradients flow through the layer-0 tables only: one
    Adam-free gradient of the cached loss must equal a torch oracle where
    the propagated part is a DETACHED constant added to the ego term."""
    import torch
    import torch.nn.functional as F

    from textgcn_tpu.data.core import dense_normalized_adjacency

    cfg, data, model = _model(tmp_path, dummy_dir, dropout=0.0,
                              n_layers=2, uid='gradsem')
    params = model.init_params(jax.random.key(4))
    users = rng.randint(0, data.n_users, 8).astype(np.int32)
    pos = np.array([data.pos_padded[u][0] for u in users], np.int32)
    negs = rng.randint(0, data.n_items, (8, 1)).astype(np.int32)
    batch = (jnp.asarray(users), jnp.asarray(pos), jnp.asarray(negs),
             jnp.ones(8, bool))

    rest = model.propagate_rest(params)

    def cached_loss(p):
        with model.with_cached_rest(rest):
            l, _ = model.loss(p, batch, jax.random.key(0))
        return l

    grads = jax.grad(cached_loss)(params)

    # torch oracle: repr = (ego + detached_rest) / (L+1)
    ue = np.asarray(params['user_emb'])[:data.n_users]
    ie = np.asarray(params['item_emb'])[:data.n_items]
    user_emb = torch.nn.Parameter(torch.tensor(ue))
    item_emb = torch.nn.Parameter(torch.tensor(ie))
    adj = torch.tensor(dense_normalized_adjacency(data.graph))
    with torch.no_grad():
        e = torch.cat([user_emb, item_emb])
        acc = torch.zeros_like(e)
        for _ in range(cfg.n_layers):
            e = adj @ e
            acc = acc + e
    inv = 1.0 / (cfg.n_layers + 1)
    full = (torch.cat([user_emb, item_emb]) + acc.detach()) * inv
    u_repr, i_repr = full[:data.n_users], full[data.n_users:]
    uu = u_repr[torch.tensor(users)]
    pos_s = (uu * i_repr[torch.tensor(pos)]).sum(-1)
    neg_s = (uu * i_repr[torch.tensor(negs[:, 0])]).sum(-1)
    loss = F.selu(neg_s - pos_s).mean()
    reg = cfg.reg_lambda * (
        user_emb[torch.tensor(users)].pow(2).sum()
        + item_emb[torch.tensor(pos)].pow(2).sum()
        + item_emb[torch.tensor(negs)].pow(2).sum()) / len(users) / 2
    (loss + reg).backward()

    np.testing.assert_allclose(
        np.asarray(grads['user_emb'])[:data.n_users],
        user_emb.grad.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(grads['item_emb'])[:data.n_items],
        item_emb.grad.numpy(), atol=2e-5)


def test_cached_decomposition_starves_conv_params(tmp_path, dummy_dir):
    """WHY cached mode is guarded off for the conv family (models/conv.py
    ``supports_cached_propagation = False``; decision table in SCALE.md
    "Cached propagation and the conv family"): under ANY fresh-ego +
    stale-rest decomposition, the ego term is the raw tables — no conv
    parameter appears in it — and the stale rest is stop-gradded, so
    every conv parameter (projection matrices, attention vectors,
    biases) receives EXACTLY zero gradient between refreshes; refreshes
    recompute activations, not parameters.  The family would train its
    tables against frozen random convs.  This is structural, not a
    tuning artifact — pinned here as an executable fact."""
    from textgcn_tpu.models.conv import ConvModel
    from textgcn_tpu.models.losses import bpr_loss

    cfg = make_cfg(tmp_path, dummy_dir, model='gat', aggr='mean')
    data = load_interactions(cfg.data)
    model = ConvModel(cfg, data)
    params = model.init_params(jax.random.key(0))
    inv = 1.0 / (model.n_layers + 1)
    users = jnp.arange(4)
    pos = jnp.arange(4)
    neg = jnp.arange(4, 8)

    def cached_loss(p):
        # the hypothetical conv cached mode: exact reprs decomposed into
        # fresh ego + stop-gradded rest (what the scan would carry)
        u_full, i_full = model.representation(p, training=False)
        rest_u = jax.lax.stop_gradient(u_full / inv - p['user_emb'])
        rest_i = jax.lax.stop_gradient(i_full / inv - p['item_emb'])
        u = (p['user_emb'] + rest_u) * inv
        i = (p['item_emb'] + rest_i) * inv
        return bpr_loss(u[users], i[pos], i[neg])

    g = jax.grad(cached_loss)(params)
    for layer in g['convs']:
        for name, leaf in layer.items():
            assert float(jnp.abs(leaf).max()) == 0.0, \
                f'conv leaf {name} unexpectedly received gradient'
    # while the tables DO train (the decomposition itself is sound)
    assert float(jnp.abs(g['user_emb']).max()) > 0.0
    assert float(jnp.abs(g['item_emb']).max()) > 0.0
