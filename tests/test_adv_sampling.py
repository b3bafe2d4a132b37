"""AdvSampl: dynamic negative selection semantics + end-to-end training."""

import jax
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
