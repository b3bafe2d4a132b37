"""Graph-conv layer variants (reference rejected_models.py:7-42).

Each conv's bipartite segment-op formulation is checked against a dense
numpy oracle on a tiny graph (self loops, degree recomputation under edge
masks, segment softmax), plus the LGConv == LightGCN propagation anchor
and end-to-end training per variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textgcn_tpu.config import Config
from textgcn_tpu.data.core import load_interactions
from textgcn_tpu.models.conv import (NEG_SLOPE, ConvModel, conv_layer,
                                     init_conv_layer)
from textgcn_tpu.models.lightgcn import LightGCN
from textgcn_tpu.train.trainer import Trainer


def make_cfg(tmp_path, dummy_dir, **kw):
    defaults = dict(model='gcn', data=str(dummy_dir), epochs=4,
                    evaluate_every=2, batch_size=16, emb_size=16,
                    n_layers=2, dropout=0.0, k=(3, 5), seed=0, aggr='mean',
                    save_path=str(tmp_path / 'run'))
    defaults.update(kw)
    cfg = Config(**defaults).finalize()
    cfg.validate()
    return cfg


# --- dense numpy oracle ------------------------------------------------------

def _leaky(x):
    return np.where(x > 0, x, NEG_SLOPE * x)


def _dense_oracle(conv, aggr, lp, ux, ix, eu, ei, mu, mi, w):
    """Dense adjacency formulation of one conv layer (both directions)."""
    n_u, n_i = ux.shape[0], ix.shape[0]
    A_ui = np.zeros((n_u, n_i))  # mask for messages item -> user
    A_iu = np.zeros((n_i, n_u))
    W_ui = np.zeros((n_u, n_i))  # lgcn normalized weights
    W_iu = np.zeros((n_i, n_u))
    for e, (u, i) in enumerate(zip(eu, ei)):
        A_ui[u, i] = mu[e]
        A_iu[i, u] = mi[e]
        W_ui[u, i] = w[e] * mu[e]
        W_iu[i, u] = w[e] * mi[e]

    if conv == 'lightgcn':
        return W_ui @ ix, W_iu @ ux

    if conv == 'gcn':
        h_u, h_i = ux @ lp['w'], ix @ lp['w']
        du, di = A_ui.sum(1) + 1, A_iu.sum(1) + 1
        norm_u = A_ui / np.sqrt(np.outer(du, di))
        norm_i = A_iu / np.sqrt(np.outer(di, du))
        new_u = norm_u @ h_i + h_u / du[:, None] + lp['b']
        new_i = norm_i @ h_u + h_i / di[:, None] + lp['b']
        return new_u, new_i

    if conv == 'graphsage':
        du, di = A_ui.sum(1), A_iu.sum(1)
        if aggr == 'mean':
            nbr_u = A_ui @ ix / np.maximum(du, 1)[:, None]
            nbr_i = A_iu @ ux / np.maximum(di, 1)[:, None]
        elif aggr == 'sum':
            nbr_u, nbr_i = A_ui @ ix, A_iu @ ux
        else:  # max
            nbr_u = np.array([
                ix[A_ui[r] > 0].max(0) if (A_ui[r] > 0).any()
                else np.zeros(ix.shape[1]) for r in range(n_u)])
            nbr_i = np.array([
                ux[A_iu[r] > 0].max(0) if (A_iu[r] > 0).any()
                else np.zeros(ux.shape[1]) for r in range(n_i)])
        new_u = nbr_u @ lp['w_nbr'] + lp['b'] + ux @ lp['w_root']
        new_i = nbr_i @ lp['w_nbr'] + lp['b'] + ix @ lp['w_root']
        return new_u, new_i

    def _att_dir(msg_src, logit, self_logit, msg_self, A):
        out = np.zeros_like(msg_self)
        for r in range(A.shape[0]):
            nbrs = np.nonzero(A[r] > 0)[0]
            logits = np.append(logit[r, nbrs], self_logit[r])
            alpha = np.exp(logits - logits.max())
            alpha = alpha / alpha.sum()
            msgs = np.vstack([msg_src[nbrs], msg_self[r]])
            out[r] = alpha @ msgs
        return out

    if conv == 'gat':
        h_u, h_i = ux @ lp['w'], ix @ lp['w']
        s_u, d_u = h_u @ lp['a_src'], h_u @ lp['a_dst']
        s_i, d_i = h_i @ lp['a_src'], h_i @ lp['a_dst']
        new_u = _att_dir(h_i, _leaky(s_i[None, :] + d_u[:, None]),
                         _leaky(s_u + d_u), h_u, A_ui) + lp['b']
        new_i = _att_dir(h_u, _leaky(s_u[None, :] + d_i[:, None]),
                         _leaky(s_i + d_i), h_i, A_iu) + lp['b']
        return new_u, new_i

    if conv == 'gatv2':
        hs_u, hs_i = ux @ lp['w_src'], ix @ lp['w_src']
        hd_u, hd_i = ux @ lp['w_dst'], ix @ lp['w_dst']
        a = lp['a']
        new_u = _att_dir(
            hs_i, _leaky(hs_i[None, :, :] + hd_u[:, None, :]) @ a,
            _leaky(hs_u + hd_u) @ a, hs_u, A_ui) + lp['b']
        new_i = _att_dir(
            hs_u, _leaky(hs_u[None, :, :] + hd_i[:, None, :]) @ a,
            _leaky(hs_i + hd_i) @ a, hs_i, A_iu) + lp['b']
        return new_u, new_i

    raise AssertionError(conv)


@pytest.mark.parametrize('conv', ['lightgcn', 'gcn', 'graphsage', 'gat',
                                  'gatv2'])
@pytest.mark.parametrize('masked', [False, True])
def test_conv_layer_matches_dense_oracle(conv, masked, rng):
    n_u, n_i, d, n_e = 7, 5, 4, 18
    eu = rng.randint(0, n_u, n_e).astype(np.int32)
    ei = rng.randint(0, n_i, n_e).astype(np.int32)
    # dedupe edges so the dense adjacency is well-defined
    pairs = np.unique(np.stack([eu, ei], 1), axis=0)
    eu, ei = pairs[:, 0], pairs[:, 1]
    n_e = eu.size
    w = rng.random_sample(n_e).astype(np.float32) + 0.1
    ux = rng.standard_normal((n_u, d)).astype(np.float32)
    ix = rng.standard_normal((n_i, d)).astype(np.float32)
    if masked:
        mu = (rng.random_sample(n_e) > 0.4).astype(np.float32)
        mi = (rng.random_sample(n_e) > 0.4).astype(np.float32)
    else:
        mu = mi = np.ones(n_e, np.float32)
    lp = init_conv_layer(jax.random.PRNGKey(3), conv, d)
    lp_np = jax.tree.map(np.asarray, lp)

    for aggr in (('mean', 'sum', 'max') if conv == 'graphsage'
                 else ('mean',)):
        got_u, got_i = conv_layer(
            lp, conv, aggr, jnp.asarray(ux), jnp.asarray(ix),
            jnp.asarray(eu), jnp.asarray(ei), jnp.asarray(mu),
            jnp.asarray(mi), jnp.asarray(w))
        want_u, want_i = _dense_oracle(conv, aggr, lp_np, ux, ix, eu, ei,
                                       mu, mi, w)
        np.testing.assert_allclose(np.asarray(got_u), want_u, rtol=2e-5,
                                   atol=2e-5, err_msg=f'{conv}/{aggr} u')
        np.testing.assert_allclose(np.asarray(got_i), want_i, rtol=2e-5,
                                   atol=2e-5, err_msg=f'{conv}/{aggr} i')


def test_lgconv_equals_lightgcn_propagation(tmp_path, dummy_dir):
    """Parameter-free 'lightgcn' conv reproduces the flagship propagation
    (same normalized weights, mean-of-layers) exactly."""
    cfg = make_cfg(tmp_path, dummy_dir, model='gcn', n_layers=3)
    data = load_interactions(cfg.data)
    base = LightGCN(cfg, data)
    model = ConvModel(cfg, data)
    model.conv = 'lightgcn'
    params = base.init_params(jax.random.PRNGKey(0))
    params_conv = dict(params, convs=[{} for _ in range(cfg.n_layers)])
    want_u, want_i = base.representation(params)
    got_u, got_i = model.representation(params_conv)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('name', ['gcn', 'graphsage', 'gat', 'gatv2'])
def test_conv_e2e_train(tmp_path, dummy_dir, name):
    cfg = make_cfg(tmp_path, dummy_dir, model=name, dropout=0.2,
                   epochs=4)
    data = load_interactions(cfg.data)
    model = ConvModel(cfg, data)
    trainer = Trainer(cfg, model, data)
    trainer.fit()
    res = trainer.evaluate()
    assert np.isfinite(res['recall']).all()
    # conv parameters actually trained (received gradient updates)
    init = model.init_params(jax.random.PRNGKey(cfg.seed))
    trained = trainer.params
    if name != 'graphsage':
        changed = np.abs(np.asarray(trained['convs'][0]['w' if name ==
                         'gcn' else ('w' if name == 'gat' else 'w_src')])
                         - np.asarray(init['convs'][0]['w' if name ==
                         'gcn' else ('w' if name == 'gat' else 'w_src')]))
        assert changed.max() > 0


@pytest.mark.parametrize('name,aggr', [('gcn', 'mean'),
                                       ('graphsage', 'mean'),
                                       ('graphsage', 'sum'),
                                       ('gat', 'mean'),
                                       ('gatv2', 'mean')])
def test_conv_kernel_path_matches_segment_path(tmp_path, dummy_dir, name,
                                               aggr, monkeypatch):
    """The tiled-MXU-kernel conv propagation (models/conv.py
    ``_kernel_representation``, interpret mode) reproduces the
    oracle-tested segment-op formulation — forward and gradients, with
    and without edge dropout (same hash masks)."""
    from textgcn_tpu.ops.pallas_spmm import edge_dropout_scale

    monkeypatch.setenv('TEXTGCN_TPU_PALLAS', 'interpret')
    # f32 kernel input for a tight tolerance (interpret mode runs DEFAULT
    # precision as exact f32 on CPU, but the default x_dtype is bf16)
    monkeypatch.setenv('TEXTGCN_TPU_PALLAS_XDTYPE', 'f32')

    cfg = make_cfg(tmp_path, dummy_dir, model=name, aggr=aggr, n_layers=2,
                   dropout=0.4)
    data = load_interactions(cfg.data)
    km = ConvModel(cfg, data)
    assert km._use_kernel()
    params = km.init_params(jax.random.PRNGKey(1))
    g = data.graph
    eu, ei = jnp.asarray(g.edge_user), jnp.asarray(g.edge_item)
    w = jnp.asarray(g.edge_weight, jnp.float32)

    def segment_repr(params, m_u, m_i):
        u, i = params['user_emb'], params['item_emb']
        acc_u, acc_i = u, i
        for lp in params['convs']:
            u, i = conv_layer(lp, name, aggr, u, i, eu, ei, m_u, m_i, w)
            acc_u, acc_i = acc_u + u, acc_i + i
        inv = 1.0 / (cfg.n_layers + 1)
        return acc_u * inv, acc_i * inv

    ones = jnp.ones(eu.shape, jnp.float32)
    for train in (False, True):
        key = jax.random.PRNGKey(7)
        if train:
            # masks the kernel path will draw (PallasGraphOp.weights)
            salts = jax.random.bits(key, (2,), jnp.uint32)
            keep = jnp.float32(1.0 - cfg.dropout)
            m_u = (edge_dropout_scale(eu, ei, salts[0], keep)
                   > 0).astype(jnp.float32)
            m_i = (edge_dropout_scale(eu, ei, salts[1], keep)
                   > 0).astype(jnp.float32)
            assert 0 < float(m_u.sum()) < eu.shape[0]  # mask is real
        else:
            m_u = m_i = ones

        def k_loss(p):
            u, i = km.representation(p, training=train, dropout_key=key)
            return (u * u).sum() + (i * 1.7).sum()

        def s_loss(p):
            u, i = segment_repr(p, m_u, m_i)
            return (u * u).sum() + (i * 1.7).sum()

        got, grads_k = jax.value_and_grad(k_loss)(params)
        want, grads_s = jax.value_and_grad(s_loss)(params)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            grads_k, grads_s)


def test_conv_cli_and_registry(tmp_path, dummy_dir, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from textgcn_tpu import cli
    tr = cli.main(['--model', 'graphsage', '--aggr', 'max', '--data',
                   str(dummy_dir), '--epochs', '2', '--evaluate_every',
                   '2', '--batch_size', '8', '--emb_size', '8',
                   '--n_layers', '1', '-k', '3', '--uid', 'sage',
                   '--no_save'])
    assert tr.model.aggr == 'max'
    assert np.isfinite(tr.metrics_logger['recall']).all()


def test_conv_under_mesh(tmp_path, dummy_dir):
    """Conv training step compiles and runs under the 8-device mesh
    (tables row-sharded, conv params replicated by param_shardings)."""
    from textgcn_tpu.parallel.mesh import make_mesh, shard_model

    cfg = make_cfg(tmp_path, dummy_dir, model='gat', epochs=2,
                   evaluate_every=2, dropout=0.1)
    mesh = make_mesh((4, 2))
    data = load_interactions(cfg.data).padded_to(mesh.size)
    model = ConvModel(cfg, data)
    model = shard_model(mesh, model)
    trainer = Trainer(cfg, model, data, mesh=mesh)
    trainer.fit()
    assert np.isfinite(trainer.metrics_logger['recall']).all()
