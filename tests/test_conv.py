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
