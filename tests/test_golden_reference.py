"""TRUE golden parity: the actual reference code, executed (SURVEY §4).

Earlier parity tests compare against re-derived torch oracles; these run
``/root/reference`` itself (via tools/golden_reference.py's scipy shim
for its one dgl call, dataset.py:142-149) and assert this framework
reproduces it on three levels:

1. deterministic eval parity — identical embedding tables injected into
   both, full evaluate(): all 5 metrics at every k must match;
2. deterministic loss parity — identical tables + identical batch:
   BPR+reg loss must match (base_model.py:186-210 semantics);
3. trained-quality parity — both train 50 epochs from seed 0 with their
   own samplers: converged metrics must agree within a small tolerance.

Note the reference cannot run on ``data/dummy``: its negative sampler
requires ``bucket_len`` *distinct* non-positive items per user
(dataset.py:173-177 builds a set) and dummy's users have 4 positives of
5 items — the while loop never terminates.  Parity therefore runs on a
sparse clustered synthetic (120 users x 200 items).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from textgcn_tpu.config import Config
from textgcn_tpu.data.core import load_interactions
from textgcn_tpu.models.lightgcn import LightGCN
from textgcn_tpu.train.trainer import Trainer

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
from golden_reference import (build_reference, reference_available,  # noqa: E402
                              run_reference)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason='/root/reference not mounted')

K = (10, 20)
SEED = 0


def _make_cfg(syn_dir, save_path, **kw):
    base = dict(model='lgcn', data=syn_dir, epochs=50, evaluate_every=50,
                batch_size=2048, emb_size=64, n_layers=3, dropout=0.4,
                k=K, seed=SEED, save_path=save_path)
    base.update(kw)
    return Config(**base).finalize()


@pytest.fixture(scope='module')
def syn_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp('golden_syn')
    import make_synthetic
    make_synthetic.generate(str(out), 120, 200, seed=SEED)
    return str(out)


@pytest.fixture(scope='module')
def ref(syn_dir, tmp_path_factory):
    """Reference dataset+model, constructed but untrained."""
    work = str(tmp_path_factory.mktemp('golden_ref'))
    args, dataset, loader, net = build_reference(
        syn_dir, work, model='lgcn', seed=SEED, k=K, epochs=50,
        evaluate_every=50)
    return args, dataset, loader, net


@pytest.fixture(scope='module')
def mine(syn_dir, tmp_path_factory):
    cfg = _make_cfg(syn_dir, str(tmp_path_factory.mktemp('golden_mine')))
    data = load_interactions(cfg.data)
    model = LightGCN(cfg, data)
    return cfg, data, model


def _inject(model, data, ref_net):
    """Reference torch tables -> this framework's (possibly row-padded)
    params pytree."""
    w_u = ref_net.embedding_user.weight.detach().cpu().numpy()
    w_i = ref_net.embedding_item.weight.detach().cpu().numpy()
    pu = np.zeros((model.n_users_t, w_u.shape[1]), np.float32)
    pi = np.zeros((model.n_items_t, w_i.shape[1]), np.float32)
    pu[:data.n_users] = w_u
    pi[:data.n_items] = w_i
    return {'user_emb': jnp.asarray(pu), 'item_emb': jnp.asarray(pi)}


def test_ids_line_up(ref, mine):
    """Weight injection is only meaningful if the dense id spaces agree."""
    _, dataset, _, _ = ref
    _, data, _ = mine
    assert dataset.n_users == data.n_users
    assert dataset.n_items == data.n_items
    ref_u = dict(dataset.user_mapping[['remap_id', 'org_id']].values)
    mine_u = dict(data.user_mapping[['remap_id', 'org_id']].values)
    assert ref_u == mine_u
    ref_i = dict(dataset.item_mapping[['remap_id', 'org_id']].values)
    mine_i = dict(data.item_mapping[['remap_id', 'org_id']].values)
    assert ref_i == mine_i


def test_eval_parity_identical_weights(ref, mine):
    """Propagation + scoring + train-mask + top-k + metric math, end to
    end against the executed reference (no training, no randomness)."""
    _, dataset, _, net = ref
    cfg, data, model = mine

    ref_metrics = net.evaluate()                      # reference executes
    params = _inject(model, data, net)
    trainer = Trainer(cfg, model, data, params=params)
    my_metrics = trainer.evaluate()

    for m, ref_vals in ref_metrics.items():
        np.testing.assert_allclose(
            np.asarray(my_metrics[m], np.float64),
            np.asarray(ref_vals, np.float64), atol=1e-4,
            err_msg=f'metric {m} diverges from the executed reference')


def test_loss_parity_identical_batch(ref, mine):
    """BPR(selu) + L2 reg on one fixed batch, same weights: the executed
    reference's loss value vs this framework's."""
    import torch
    _, dataset, _, net = ref
    cfg, data, model = mine

    rng = np.random.RandomState(7)
    B = 64
    users = rng.randint(0, data.n_users, B).astype(np.int64)
    pos = np.array([data.pos_padded[u][rng.randint(data.pos_degree[u])]
                    for u in users], np.int64)
    negs = rng.randint(0, data.n_items, (B, cfg.neg_samples)).astype(
        np.int64)

    net.training = False                 # no dropout inside representation
    from collections import defaultdict
    net._loss_values = defaultdict(float)   # fit() would create this
    batch_t = torch.tensor(np.column_stack([users, pos, negs]))
    ref_loss = float(net.get_loss(batch_t))

    cfg_nodrop = _make_cfg(cfg.data, cfg.save_path, dropout=0.0)
    model2 = LightGCN(cfg_nodrop, data)
    params = _inject(model2, data, net)
    import jax
    batch_j = (jnp.asarray(users, jnp.int32), jnp.asarray(pos, jnp.int32),
               jnp.asarray(negs, jnp.int32), jnp.ones(B, bool))
    my_loss, _ = model2.loss(params, batch_j, jax.random.key(0))
    assert float(my_loss) == pytest.approx(ref_loss, rel=1e-4, abs=1e-6)


# NB fixture mutation order: the eval/loss tests above must run before
# these trained fixtures (pytest runs tests in definition order), because
# ``ref_trained`` trains the module-scoped reference net in place.

@pytest.fixture(scope='module')
def ref_trained(ref):
    args, dataset, loader, net = ref
    net.fit(loader)            # checkpoints land in abs args.save_path
    return args, net


@pytest.fixture(scope='module')
def mine_trained(mine):
    cfg, data, model = mine
    trainer = Trainer(cfg, model, data)
    trainer.fit()
    return cfg, trainer


def test_trained_quality_parity(ref_trained, mine_trained):
    """Both frameworks train 50 epochs from seed 0 (independent samplers)
    and must converge to the same quality on every metric/k."""
    _, net = ref_trained
    _, trainer = mine_trained
    ref_metrics = {m: h[-1] for m, h in net.metrics_logger.items()}
    my_metrics = {m: h[-1] for m, h in trainer.metrics_logger.items()}

    for m, ref_vals in ref_metrics.items():
        np.testing.assert_allclose(
            np.asarray(my_metrics[m], np.float64),
            np.asarray(ref_vals, np.float64), atol=0.08,
            err_msg=f'converged {m} diverges from the executed reference')


def test_ltr_linear_golden_parity(syn_dir, ref_trained, mine_trained,
                                  tmp_path_factory, monkeypatch):
    """The headline TextGCN recipe (lgcn -> ltr_linear --load_base
    --freeze) on BOTH frameworks, sharing identical text vectors via the
    reference's own .torch cache files (seeded from this framework's
    deterministic stub encoder, so no network is needed)."""
    from golden_reference import seed_reference_text_caches
    from textgcn_tpu.cli import main as cli_main

    ref_args, _ = ref_trained
    my_cfg, _ = mine_trained

    seed_reference_text_caches(syn_dir, bert_model='all-MiniLM-L6-v2',
                               seed=SEED)

    # the reference's randomly-initialized head needs ~500 one-batch
    # epochs to converge on this dataset (measured: recall@10 climbs
    # 0.05 -> 0.60 over 100..500); this framework's head converges in
    # ~30.  Both sides train to convergence, then converged quality is
    # compared.
    work = str(tmp_path_factory.mktemp('golden_ltr_ref'))
    args, dataset, loader, net = build_reference(
        syn_dir, work, model='ltr_linear', seed=SEED, k=K, epochs=500,
        evaluate_every=100,
        extra=['--load_base', ref_args.save_path, '--freeze'])
    cwd = os.getcwd()
    os.chdir(work)
    try:
        net.fit(loader)
    finally:
        os.chdir(cwd)
    ref_metrics = {m: h[-1] for m, h in net.metrics_logger.items()}

    monkeypatch.chdir(str(tmp_path_factory.mktemp('golden_ltr_mine')))
    trainer = cli_main([
        '--model', 'ltr_linear', '--data', syn_dir, '--epochs', '30',
        '--evaluate_every', '30', '--batch_size', '2048', '--seed',
        str(SEED), '-k'] + [str(x) for x in K] + [
        '--load_base', my_cfg.save_path, '--freeze', '--uid',
        'golden-ltr'])
    my_metrics = {m: h[-1] for m, h in trainer.metrics_logger.items()}

    for m, ref_vals in ref_metrics.items():
        np.testing.assert_allclose(
            np.asarray(my_metrics[m], np.float64),
            np.asarray(ref_vals, np.float64), atol=0.08,
            err_msg=f'ltr_linear {m} diverges from the executed reference')


def test_adv_sampling_golden_parity(syn_dir, tmp_path_factory,
                                    monkeypatch):
    """Dynamic hard-negative sampling (advanced_sampling.py): both
    frameworks train 30 epochs from seed 0; converged quality must
    agree.  The reference's per-user Python selection loop and this
    framework's vectorized masked-top-k are different algorithms with
    the same contract (hardest non-positive candidates)."""
    work = str(tmp_path_factory.mktemp('golden_adv_ref'))
    args, dataset, loader, net = build_reference(
        syn_dir, work, model='adv_sampling', seed=SEED, k=K, epochs=30,
        evaluate_every=30)
    cwd = os.getcwd()
    os.chdir(work)
    try:
        net.fit(loader)
    finally:
        os.chdir(cwd)
    ref_metrics = {m: h[-1] for m, h in net.metrics_logger.items()}

    cfg = _make_cfg(syn_dir, str(tmp_path_factory.mktemp('golden_adv')),
                    model='adv_sampling', epochs=30, evaluate_every=30)
    from textgcn_tpu.models.adv_sampling import AdvSamplModel
    data = load_interactions(cfg.data)
    trainer = Trainer(cfg, AdvSamplModel(cfg, data), data)
    trainer.fit()
    my_metrics = {m: h[-1] for m, h in trainer.metrics_logger.items()}

    for m, ref_vals in ref_metrics.items():
        np.testing.assert_allclose(
            np.asarray(my_metrics[m], np.float64),
            np.asarray(ref_vals, np.float64), atol=0.08,
            err_msg=f'adv_sampling {m} diverges from the executed '
                    'reference')


def test_ltr_pop_golden_parity(syn_dir, ref_trained, mine_trained,
                               tmp_path_factory, monkeypatch):
    """ltr_pop against the executed reference — which exercises the
    reference's popularity quirk (Q2: `_calc_popularity` divides user
    ids, not counts, reviews_models.py:102-113) for real.  This
    framework runs with --popularity_mode compat to reproduce it."""
    from golden_reference import seed_reference_text_caches
    from textgcn_tpu.cli import main as cli_main

    ref_args, _ = ref_trained
    my_cfg, _ = mine_trained
    seed_reference_text_caches(syn_dir, bert_model='all-MiniLM-L6-v2',
                               seed=SEED)

    work = str(tmp_path_factory.mktemp('golden_pop_ref'))
    args, dataset, loader, net = build_reference(
        syn_dir, work, model='ltr_pop', seed=SEED, k=K, epochs=500,
        evaluate_every=100,
        extra=['--load_base', ref_args.save_path, '--freeze'])
    cwd = os.getcwd()
    os.chdir(work)
    try:
        net.fit(loader)
    finally:
        os.chdir(cwd)
    ref_metrics = {m: h[-1] for m, h in net.metrics_logger.items()}

    monkeypatch.chdir(str(tmp_path_factory.mktemp('golden_pop_mine')))
    trainer = cli_main([
        '--model', 'ltr_pop', '--data', syn_dir, '--epochs', '30',
        '--evaluate_every', '30', '--batch_size', '2048', '--seed',
        str(SEED), '-k'] + [str(x) for x in K] + [
        '--load_base', my_cfg.save_path, '--freeze',
        '--popularity_mode', 'compat', '--uid', 'golden-pop'])
    my_metrics = {m: h[-1] for m, h in trainer.metrics_logger.items()}

    for m, ref_vals in ref_metrics.items():
        np.testing.assert_allclose(
            np.asarray(my_metrics[m], np.float64),
            np.asarray(ref_vals, np.float64), atol=0.08,
            err_msg=f'ltr_pop {m} diverges from the executed reference')
