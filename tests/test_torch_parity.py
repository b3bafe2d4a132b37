"""Golden parity vs an independent torch implementation of the reference
math (SURVEY.md §4: reference behaviors re-derived, not imported).

Validates, to float tolerance, that one full training step of the JAX
framework — propagation, BPR + reg loss, Adam update — matches a
from-the-paper torch implementation of LightGCN on the dummy graph.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from textgcn_tpu.config import Config
from textgcn_tpu.models.lightgcn import LightGCN


def torch_reference_step(dense_adj, ue, ie, users, pos, negs, lr,
                         reg_lambda, n_layers):
    """One LightGCN BPR+reg Adam step in torch (independent oracle)."""
    n_users = ue.shape[0]
    user_emb = torch.nn.Parameter(torch.tensor(ue))
    item_emb = torch.nn.Parameter(torch.tensor(ie))
    opt = torch.optim.Adam([user_emb, item_emb], lr=lr)
    adj = torch.tensor(dense_adj)

    e = torch.cat([user_emb, item_emb])
    cache = [e]
    for _ in range(n_layers):
        e = adj @ e
        cache.append(e)
    out = torch.stack(cache).mean(0)
    u_repr, i_repr = out[:n_users], out[n_users:]

    u = u_repr[users]
    pos_s = (u * i_repr[pos]).sum(-1)
    loss = 0.0
    for j in range(negs.shape[1]):
        neg_s = (u * i_repr[negs[:, j]]).sum(-1)
        loss = loss + F.selu(neg_s - pos_s).mean()
    loss = loss / negs.shape[1]
    reg = reg_lambda * (user_emb[users].pow(2).sum()
                        + item_emb[pos].pow(2).sum()
                        + item_emb[torch.tensor(negs)].pow(2).sum()) \
        / len(users) / 2
    total = loss + reg
    opt.zero_grad()
    total.backward()
    opt.step()
    return (float(total), user_emb.detach().numpy(),
            item_emb.detach().numpy())


def test_one_step_parity(dummy_dir, rng):
    from textgcn_tpu.data.core import (dense_normalized_adjacency,
                                       load_interactions)

    cfg = Config(model='lgcn', data=str(dummy_dir), batch_size=8,
                 emb_size=16, n_layers=3, dropout=0.0, k=(3,), lr=1e-2,
                 reg_lambda=1e-3, save_path='/tmp/parity').finalize()
    data = load_interactions(cfg.data)
    model = LightGCN(cfg, data)

    ue = rng.randn(data.n_users, 16).astype(np.float32) * 0.1
    ie = rng.randn(data.n_items, 16).astype(np.float32) * 0.1
    users = rng.randint(0, data.n_users, 8).astype(np.int32)
    pos = np.array([data.pos_padded[u][0] for u in users], np.int32)
    negs = rng.randint(0, data.n_items, (8, 2)).astype(np.int32)

    # torch oracle
    dense = dense_normalized_adjacency(data.graph)
    t_loss, t_ue, t_ie = torch_reference_step(
        dense, ue, ie, users, pos, negs, cfg.lr, cfg.reg_lambda,
        cfg.n_layers)

    # jax step
    params = {'user_emb': jnp.asarray(ue), 'item_emb': jnp.asarray(ie)}
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    batch = (jnp.asarray(users), jnp.asarray(pos), jnp.asarray(negs),
             jnp.ones(8, bool))

    @jax.jit
    def step(params, opt_state):
        (loss, _), grads = jax.value_and_grad(
            model.loss, has_aux=True)(params, batch, jax.random.key(0))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    new_params, j_loss = step(params, opt_state)

    assert float(j_loss) == pytest.approx(t_loss, rel=1e-4)
    np.testing.assert_allclose(np.asarray(new_params['user_emb']), t_ue,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_params['item_emb']), t_ie,
                               atol=2e-5)
