"""AdvSampl: dynamic negative selection semantics + end-to-end training."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from textgcn_tpu.config import Config
from textgcn_tpu.data.core import load_interactions
from textgcn_tpu.models.adv_sampling import AdvSamplModel
from textgcn_tpu.train.trainer import Trainer


def make_cfg(tmp_path, dummy_dir, **kw):
    defaults = dict(model='adv_sampling', data=str(dummy_dir), epochs=6,
                    evaluate_every=3, batch_size=16, emb_size=16,
                    n_layers=2, dropout=0.2, k=(3, 5), seed=0,
                    save_path=str(tmp_path / 'run'))
    defaults.update(kw)
    cfg = Config(**defaults).finalize()
    cfg.validate()
    return cfg


def test_sample_batches_shapes(tmp_path, dummy_dir):
    cfg = make_cfg(tmp_path, dummy_dir)
    data = load_interactions(cfg.data)
    model = AdvSamplModel(cfg, data)
    users, mask = model.sample_batches(jax.random.key(0), 16)
    nb = model.num_batches(16)
    assert users.shape == (nb, 16)
    assert mask.shape == (nb, 16)
    # tiny catalog: candidates capped at n_items
    assert model.n_candidates == data.n_items


def test_loss_runs_and_is_finite(tmp_path, dummy_dir):
    cfg = make_cfg(tmp_path, dummy_dir)
    data = load_interactions(cfg.data)
    model = AdvSamplModel(cfg, data)
    params = model.init_params(jax.random.key(0))
    users, mask = model.sample_batches(jax.random.key(1), 16)
    loss, aux = model.loss(params, (users[0], mask[0]), jax.random.key(2))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux['bpr']))

    # gradients flow to both tables
    grads = jax.grad(lambda p: model.loss(p, (users[0], mask[0]),
                                          jax.random.key(2))[0])(params)
    assert float(jnp.abs(grads['user_emb']).sum()) > 0
    assert float(jnp.abs(grads['item_emb']).sum()) > 0


def test_adv_end_to_end(tmp_path, dummy_dir):
    cfg = make_cfg(tmp_path, dummy_dir)
    data = load_interactions(cfg.data)
    model = AdvSamplModel(cfg, data)
    trainer = Trainer(cfg, model, data)
    trainer.fit()
    assert len(trainer.metrics_logger['recall']) >= 1
    assert np.isfinite(trainer.metrics_logger['recall']).all()


def test_expanded_loss_matches_flat_expansion(tmp_path, dummy_dir, rng):
    """The broadcasted (B,P,K) loss == base losses on the flat expanded
    batch (the reference's construction)."""
    from textgcn_tpu.models.losses import bpr_loss, reg_loss

    cfg = make_cfg(tmp_path, dummy_dir)
    data = load_interactions(cfg.data)
    model = AdvSamplModel(cfg, data)
    params = model.init_params(jax.random.key(0))
    reprs = model.representation(params, training=False)
    users_repr, items_repr = reprs

    b, p, k = 6, 3, 4
    users = jnp.asarray(rng.randint(0, data.n_users, b).astype(np.int32))
    pos = jnp.asarray(rng.randint(0, data.n_items, (b, p)).astype(np.int32))
    negs = jnp.asarray(rng.randint(0, data.n_items, (b, k)).astype(np.int32))
    mask = jnp.asarray(np.array([1, 1, 1, 1, 1, 0], bool))
    neg_valid = jnp.asarray(rng.rand(b, k) > 0.3)

    l_bpr, l_reg = model._expanded_loss(
        params, users_repr, items_repr, users, pos, negs, mask, neg_valid)

    # flat expansion (reference-style)
    e_users = jnp.repeat(users, p * k)
    e_pos = jnp.repeat(pos, k, axis=1).reshape(-1)
    e_negs = jnp.tile(negs, (1, p)).reshape(-1, 1)
    e_mask = jnp.broadcast_to(
        mask[:, None, None] & neg_valid[:, None, :], (b, p, k)).reshape(-1)
    u_emb = users_repr[e_users]
    pos_scores = (u_emb * items_repr[e_pos]).sum(-1)
    neg_scores = (u_emb[:, None, :] * items_repr[e_negs]).sum(-1)
    want_bpr = bpr_loss(pos_scores, neg_scores, e_mask)
    want_reg = reg_loss(params['user_emb'], params['item_emb'],
                        e_users, e_pos, e_negs, e_mask, model.reg_lambda)
    assert float(l_bpr) == pytest.approx(float(want_bpr), rel=1e-5)
    assert float(l_reg) == pytest.approx(float(want_reg), rel=1e-5)
