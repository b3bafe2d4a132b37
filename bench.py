"""Benchmark harness: BPR train-step throughput (examples/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Workload: LightGCN BPR training step at Amazon-Electronics-like scale
(default 60k users x 25k items, ~600k edges, batch 2048, emb 64, 3 layers,
edge dropout 0.4) — the reference's hot path (reference
``base_model.py:117-126``: full-graph propagation + BPR + Adam per batch).

Baseline = the reference's computational path (torch sparse COO mm
propagation + selu BPR + Adam, single device) executed on this host, since
the reference repo publishes no numbers (BASELINE.md).  The torch step is a
behavioral stand-in written from the reference's math, not its code.

``vs_baseline`` divides by the PINNED torch number recorded in
BASELINE.json (median of interleaved idle-host runs, with its
measurement date) — the live torch-CPU run swings ~2.5x with host load
(28.6x in r3 vs 19.7x in r4 at an unchanged TPU step), which made the
one number a regression tracker watches the least trustworthy in the
line.  The live ratio still rides along in ``extra.vs_baseline_live``.
Re-pin with ``python bench.py --pin_baseline`` (idle host).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

N_USERS = 60_000
N_ITEMS = 25_000
AVG_DEG = 10
EMB = 64
LAYERS = 3
BATCH = 2048
DROPOUT = 0.4


def synth_edges(seed=0, n_users=None, n_items=None, avg_deg=None):
    # single source of truth for the synthetic graph: the scale sweep's
    # generator, defaulting to this bench's fixed S1 shape (shape
    # overrides serve tools/conv_scale_lab.py's S2/S3 sweeps)
    from tools.scale_bench import synth_edges as _synth
    return _synth(n_users or N_USERS, n_items or N_ITEMS,
                  avg_deg or AVG_DEG, seed)


# ---------------------------------------------------------------------------
# JAX path (ours)

def bench_jax(steps=30, refresh=0):
    """``refresh`` > 0 benchmarks cached-propagation mode
    (--refresh_every): the propagated part refreshes every ``refresh``
    steps inside the scan, fresh ego term in between (the Trainer's
    cached epoch shape)."""
    import jax
    import jax.numpy as jnp
    import optax

    from textgcn_tpu.models.losses import bpr_loss, reg_loss
    from textgcn_tpu.ops.propagate import propagate_rest, representation
    from textgcn_tpu.ops.pallas_spmm import PallasGraphOp

    eu, ei, w = synth_edges()
    # table rows rounded like the LightGCN model (4096) so this bench and
    # the adv_sampling model bench share compiled kernel variants
    n_users_t = -(-N_USERS // 4096) * 4096
    n_items_t = -(-N_ITEMS // 4096) * 4096
    graph_op = PallasGraphOp(eu, ei, w, n_users_t, n_items_t, EMB)

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    params = {
        'user_emb': 0.1 * jax.random.normal(k1, (n_users_t, EMB)),
        'item_emb': 0.1 * jax.random.normal(k2, (n_items_t, EMB)),
    }
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def loss_fn(params, rest, graph_op, users, pos, negs, key):
        if refresh:
            inv = 1.0 / (LAYERS + 1)
            u_repr = (params['user_emb'] + rest[0]) * inv
            i_repr = (params['item_emb'] + rest[1]) * inv
        else:
            u_repr, i_repr = representation(
                params, graph_op, LAYERS, single=False, dropout=DROPOUT,
                dropout_key=key)
        ue = u_repr[users]
        pos_s = (ue * i_repr[pos]).sum(-1)
        neg_s = (ue[:, None, :] * i_repr[negs]).sum(-1)
        mask = jnp.ones(users.shape, bool)
        return (bpr_loss(pos_s, neg_s, mask)
                + reg_loss(params['user_emb'], params['item_emb'],
                           users, pos, negs, mask, 1e-4))

    # the real trainer scans whole epochs inside one jitted call
    # (trainer.py:_make_epoch_fn); benchmark the same shape.  The graph
    # op is a jit ARGUMENT (pytree), not a closed-over constant.
    @jax.jit
    def run(params, opt_state, key, graph_op):
        # extra carry only in cached mode, mirroring the trainer — the
        # exact-mode program stays identical to the recorded baselines
        extra0 = ()
        if refresh:
            extra0 = ((jnp.zeros_like(params['user_emb']),
                       jnp.zeros_like(params['item_emb'])),
                      jnp.int32(0))

        def step(carry, key):
            params, opt_state, extra = carry
            k_b, k_d = jax.random.split(key)
            ku, kp, kn = jax.random.split(k_b, 3)
            users = jax.random.randint(ku, (BATCH,), 0, N_USERS)
            pos = jax.random.randint(kp, (BATCH,), 0, N_ITEMS)
            negs = jax.random.randint(kn, (BATCH, 1), 0, N_ITEMS)
            rest = None
            if refresh:
                rest, age = extra
                k_r, k_d = jax.random.split(k_d)
                rest = jax.lax.cond(
                    jax.lax.rem(age, refresh) == 0,
                    lambda p: propagate_rest(
                        p, graph_op, LAYERS, dropout=DROPOUT,
                        dropout_key=k_r),
                    lambda p: rest, params)
                extra = (rest, age + 1)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, rest, graph_op, users, pos, negs, k_d)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, extra), loss

        keys = jax.random.split(key, steps)
        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, extra0), keys)
        return params, opt_state, losses

    # chain-difference timing with a scalar fetch per chain:
    # block_until_ready does not reliably sync through a remote relay
    # (CLAUDE.md), and the difference of a 3-call and a 1-call chain
    # cancels the constant fetch RTT out of the measurement.  Each chain
    # length is repeated and averaged — a single relay round trip has
    # multi-hundred-ms variance, enough to corrupt a one-shot difference.
    def chain(n, seed):
        nonlocal params, opt_state
        t0 = time.perf_counter()
        losses = None
        for i in range(n):
            params, opt_state, losses = run(
                params, opt_state, jax.random.key(seed + i), graph_op)
        float(losses[-1])  # full device sync
        return time.perf_counter() - t0

    def timed(n, seed0, reps):
        import statistics
        return statistics.median(
            chain(n, seed0 + 10 * r) for r in range(reps))

    chain(1, 1)  # warmup + compile
    t1 = timed(1, 100, reps=5)
    t3 = timed(3, 200, reps=3)
    dt = (t3 - t1) / 2
    return BATCH * steps / dt, dt / steps


# ---------------------------------------------------------------------------
# torch reference-path baseline

def bench_torch(steps=8, warmup=2):
    import torch
    import torch.nn.functional as F

    eu, ei, w = synth_edges()
    n = N_USERS + N_ITEMS
    rows = np.concatenate([eu, ei + N_USERS])
    cols = np.concatenate([ei + N_USERS, eu])
    vals = np.concatenate([w, w])
    adj = torch.sparse_coo_tensor(
        torch.tensor(np.stack([rows, cols])), torch.tensor(vals),
        (n, n)).coalesce()

    user_emb = torch.nn.Embedding(N_USERS, EMB)
    item_emb = torch.nn.Embedding(N_ITEMS, EMB)
    torch.nn.init.normal_(user_emb.weight, std=0.1)
    torch.nn.init.normal_(item_emb.weight, std=0.1)
    opt = torch.optim.Adam(list(user_emb.parameters())
                           + list(item_emb.parameters()), lr=1e-3)

    def dropout_adj():
        idx = adj._indices()
        v = adj._values()
        mask = torch.rand(len(v)) < (1 - DROPOUT)
        return torch.sparse_coo_tensor(
            idx[:, mask], v[mask] / (1 - DROPOUT), adj.size()).coalesce()

    def step():
        opt.zero_grad()
        m = dropout_adj()
        e = torch.cat([user_emb.weight, item_emb.weight])
        cache = [e]
        for _ in range(LAYERS):
            e = torch.sparse.mm(m, e)
            cache.append(e)
        out = torch.mean(torch.stack(cache), axis=0)
        u_repr, i_repr = torch.split(out, [N_USERS, N_ITEMS])
        users = torch.randint(0, N_USERS, (BATCH,))
        pos = torch.randint(0, N_ITEMS, (BATCH,))
        neg = torch.randint(0, N_ITEMS, (BATCH,))
        ue = u_repr[users]
        pos_s = (ue * i_repr[pos]).sum(-1)
        neg_s = (ue * i_repr[neg]).sum(-1)
        loss = torch.mean(F.selu(neg_s - pos_s))
        reg = 1e-4 * (user_emb(users).norm(2).pow(2)
                      + item_emb(pos).norm(2).pow(2)
                      + item_emb(neg).norm(2).pow(2)) / BATCH / 2
        (loss + reg).backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return BATCH * steps / dt, dt / steps


def _bound_repr(model, params, cap):
    with model.bound(cap):
        return model.representation(params, training=False)


def synth_interactions(n_users=None, n_items=None, avg_deg=None):
    """In-memory InteractionData over the synthetic graph (no TSV round
    trip) so model-level benches use the real model/sampler paths."""
    from textgcn_tpu.data.core import Graph, InteractionData

    n_users = n_users or N_USERS
    n_items = n_items or N_ITEMS
    eu, ei, w = synth_edges(n_users=n_users, n_items=n_items,
                            avg_deg=avg_deg)
    n_train = len(eu)
    user_degree = np.bincount(eu, minlength=n_users).astype(np.int32)
    item_degree = np.bincount(ei, minlength=n_items).astype(np.int32)
    graph = Graph(n_users, n_items, eu, ei, w, user_degree, item_degree)
    max_deg = max(int(user_degree.max()), 1)
    pos_padded = np.full((n_users, max_deg), n_items, np.int32)
    order = np.lexsort((ei, eu))
    su, si = eu[order], ei[order]
    row_starts = np.searchsorted(su, np.arange(n_users))
    col_idx = np.arange(n_train) - row_starts[su]
    pos_padded[su, col_idx] = si
    test_users = np.arange(min(2048, n_users), dtype=np.int32)
    return InteractionData(
        n_users=n_users, n_items=n_items, n_train=n_train, n_test=0,
        graph=graph, pos_padded=pos_padded, pos_degree=user_degree.copy(),
        test_users=test_users,
        true_test=[[0] for _ in test_users],
        user_id_map={}, item_id_map={}, train_df=None, test_df=None,
        user_mapping=None, item_mapping=None)


def _bench_cfg(model: str, **kw):
    from textgcn_tpu.config import Config
    return Config(model=model, epochs=1, batch_size=BATCH, emb_size=EMB,
                  n_layers=LAYERS, dropout=DROPOUT, k=(20, 40),
                  save=False, save_path='/tmp/bench_run', **kw).finalize()


def synth_text_data(dim=384):
    """LTRData over the synthetic graph with random unit-scale text
    features (the text/LTR families' input shape; stub-encoder scale)."""
    from textgcn_tpu.data.text import LTRData

    base = synth_interactions()
    rng = np.random.RandomState(1)

    def t_feats(n):
        return (rng.randn(n, dim) / np.sqrt(dim)).astype(np.float32)

    return LTRData(
        **{f: getattr(base, f) for f in (
            'n_users', 'n_items', 'n_train', 'n_test', 'graph',
            'pos_padded', 'pos_degree', 'test_users', 'true_test',
            'user_id_map', 'item_id_map', 'train_df', 'test_df',
            'user_mapping', 'item_mapping')},
        items_as_desc=t_feats(N_ITEMS),
        items_as_avg_reviews=t_feats(N_ITEMS),
        users_as_avg_reviews=t_feats(N_USERS),
        users_as_avg_desc=t_feats(N_USERS), text_dim=dim)


def _bench_train_step(model, steps=12):
    """Chain-difference timing of a real model's train step: sample one
    on-device epoch, scan loss+grad+Adam over the first n batches, time
    the (3+steps)-batch chain minus the 3-batch chain.  Returns
    (ms/step, examples/s)."""
    import jax
    import optax

    params = model.init_params(jax.random.key(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    cap = model.captured_state()

    def make_run(n):
        @jax.jit
        def run(params, opt_state, key, cap):
            with model.bound(cap):
                k_s, k_d = jax.random.split(key)
                batches = model.sample_batches(k_s, BATCH)
                n_batches = jax.tree.leaves(batches)[0].shape[0]
                dks = jax.random.split(k_d, n_batches)

                def step(carry, xs):
                    params, opt_state = carry
                    *batch, dk = xs
                    (loss, _), grads = jax.value_and_grad(
                        model.loss, has_aux=True)(params, tuple(batch), dk)
                    updates, opt_state = optimizer.update(
                        grads, opt_state, params)
                    return (optax.apply_updates(params, updates),
                            opt_state), loss

                xs = tuple(b[:n] for b in batches) + (dks[:n],)
                (params, opt_state), losses = jax.lax.scan(
                    step, (params, opt_state), xs)
            return losses.sum()
        return lambda p, o, k: run(p, o, k, cap)

    n1, n2 = 3, 3 + steps
    r1, r2 = make_run(n1), make_run(n2)
    key = jax.random.key(1)
    # a non-finite loss means the path being timed is BROKEN, not slow
    # — the round-5 attention-sentinel NaN hid behind benches that only
    # looked at the clock
    l1 = float(r1(params, opt_state, key))
    l2 = float(r2(params, opt_state, key))
    assert np.isfinite(l1) and np.isfinite(l2), \
        f'non-finite loss in benched train step: {l1}, {l2}'

    def t(run, reps=3):
        import statistics
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(run(params, opt_state, jax.random.key(5 + i)))
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    step_s = (t(r2) - t(r1)) / steps
    return step_s * 1e3, BATCH / step_s


def bench_adv_jax(steps=12):
    """AdvSampl hard-negative-selection training step (the reference's
    known bottleneck, ``advanced_sampling.py:46-69``), real model path."""
    from textgcn_tpu.models.adv_sampling import AdvSamplModel

    model = AdvSamplModel(_bench_cfg('adv_sampling'), synth_interactions())
    return _bench_train_step(model, steps)


def bench_conv_jax(steps=12, conv='gcn'):
    """Graph-conv family training step (reference
    ``rejected_models.py:27-42``), real model path.  On TPU, GCN/SAGE
    aggregation rides the tiled one-hot MXU kernel (models/conv.py
    ``_kernel_representation``): measured 30.5 ms/step at this shape vs
    113.1 on the round-3 segment-op path (1.6x the lgcn flagship step,
    down from 6.1x)."""
    from textgcn_tpu.models.conv import ConvModel

    cfg = _bench_cfg(conv, aggr='mean')
    model = ConvModel(cfg, synth_interactions())
    return _bench_train_step(model, steps)


def bench_text_jax(steps=12):
    """Text-family (KG semantic-loss) training step (reference
    ``kg_models.py:53-70`` + ``text_base_model.py:24-64``), real model
    path with synthetic 384-dim text features."""
    from textgcn_tpu.models.text_loss import TextModelKG

    model = TextModelKG(_bench_cfg('kg'), synth_text_data())
    return _bench_train_step(model, steps)


def bench_ltr_eval(n_eval_users=8192):
    """LTR fused-eval (collapsed-tower one-matmul scoring + masked top-k)
    users/s, real model path (reference materializes (B, n_items, F),
    ``ltr_models.py:200-204``)."""
    import jax
    import jax.numpy as jnp

    from textgcn_tpu.models.ltr import LTRLinear

    model = LTRLinear(_bench_cfg('ltr_linear'), synth_text_data())
    params = model.init_params(jax.random.key(0))
    cap = model.captured_state()
    reprs = jax.jit(lambda p, cap: _bound_repr(model, p, cap))(params,
                                                              cap)
    users = jnp.asarray(
        np.arange(n_eval_users, dtype=np.int32) % N_USERS)

    def run_n(n):
        @jax.jit
        def f(params, reprs, cap):
            with model.bound(cap):
                acc = jnp.float32(0)
                for _ in range(n):
                    def one(_, bu):
                        vals, _ = model.topk_for_users(params, reprs, bu,
                                                       40)
                        return None, vals.sum()
                    _, s = jax.lax.scan(one, None,
                                        users.reshape(-1, BATCH))
                    acc = acc + s.sum()
                    params = jax.tree.map(
                        lambda a: a + acc * 1e-20 if a.ndim == 2 else a,
                        params)
            return acc
        return f

    # wide chain spread + median reps (see tools/scale_bench.time_eval):
    # narrow one-shot chain differences are corrupted by relay jitter
    f1, f2 = run_n(1), run_n(6)
    float(f1(params, reprs, cap))
    float(f2(params, reprs, cap))

    def t(f, reps=5):
        import statistics
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(params, reprs, cap))
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    per_pass = (t(f2) - t(f1)) / 5
    return n_eval_users / per_pass


def bench_eval_jax(n_eval_users=8192, approx=None):
    """Full-catalog eval throughput: masked scoring + top-k, users/s.

    Delegates to the scale sweep's chain-difference harness (one
    implementation for both entry points).  ``approx``: recall target for
    the serving mode (approx_max_k); None = exact (the eval default)."""
    from tools.scale_bench import time_eval
    return time_eval(N_ITEMS, n_eval_users=n_eval_users, approx=approx)


def bench_eval_torch(n_eval_users=2048):
    import torch
    rng = np.random.RandomState(0)
    users_emb = torch.tensor(rng.randn(n_eval_users, EMB)
                             .astype(np.float32))
    items_emb = torch.tensor(rng.randn(N_ITEMS, EMB).astype(np.float32))
    t0 = time.perf_counter()
    for s in range(0, n_eval_users, BATCH):
        scores = users_emb[s:s + BATCH] @ items_emb.T
        torch.topk(scores, k=40)
    return n_eval_users / (time.perf_counter() - t0)


def _pinned_baseline() -> dict:
    """The recorded idle-host torch-CPU reference numbers
    (BASELINE.json ``pinned_baseline``); {} when never pinned."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'BASELINE.json')
    try:
        with open(path) as f:
            return json.load(f).get('pinned_baseline', {})
    except (OSError, json.JSONDecodeError):
        return {}


def pin_baseline(reps=5):
    """Measure and record the pinned torch-CPU baseline: the MEDIAN of
    ``reps`` interleaved train/eval runs (run on an idle host), stored
    in BASELINE.json with its measurement date so every future bench
    divides by the same constant."""
    import datetime
    import os
    train, evalr = [], []
    for i in range(reps):
        eps, _ = bench_torch()
        train.append(eps)
        evalr.append(bench_eval_torch())
        print(f'# rep {i + 1}/{reps}: train {eps:.1f} ex/s, '
              f'eval {evalr[-1]:.1f} users/s', flush=True)
    pinned = {
        'train_examples_per_s': round(float(np.median(train)), 1),
        'eval_users_per_s': round(float(np.median(evalr)), 1),
        'spread': [round(min(train), 1), round(max(train), 1)],
        'reps': reps,
        'measured': datetime.date.today().isoformat(),
        'protocol': 'median of interleaved bench_torch/bench_eval_torch '
                    'runs on an idle host',
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'BASELINE.json')
    with open(path) as f:
        doc = json.load(f)
    doc['pinned_baseline'] = pinned
    with open(path, 'w') as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({'pinned_baseline': pinned}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--skip_baseline', action='store_true')
    ap.add_argument('--skip_extras', action='store_true',
                    help='skip the adv_sampling / LTR-eval extra metrics')
    ap.add_argument('--pin_baseline', action='store_true',
                    help='(idle host) re-measure and record the pinned '
                         'torch baseline in BASELINE.json, then exit')
    args = ap.parse_args()

    if args.pin_baseline:
        pin_baseline()
        return

    from textgcn_tpu.cli import setup_compilation_cache
    setup_compilation_cache()

    jax_eps, jax_step = bench_jax(steps=args.steps)
    eval_ups = bench_eval_jax()
    adv_ms = adv_eps = ltr_ups = serving_ups = cached_eps = None
    conv_ms = conv_eps = gat_ms = text_ms = text_eps = None
    gatv2_ms = sage_ms = None
    if not args.skip_extras:
        adv_ms, adv_eps = bench_adv_jax()
        ltr_ups = bench_ltr_eval()
        serving_ups = bench_eval_jax(approx=0.95)
        cached_eps, _ = bench_jax(steps=args.steps, refresh=8)
        conv_ms, conv_eps = bench_conv_jax()
        gat_ms, _ = bench_conv_jax(conv='gat')
        # regression keys for every attention/SAGE kernel variant: the
        # gatv2 VMEM overflow (commit ef77903) was invisible to a bench
        # that only ran gcn/gat
        gatv2_ms, _ = bench_conv_jax(conv='gatv2')
        sage_ms, _ = bench_conv_jax(conv='graphsage')
        text_ms, text_eps = bench_text_jax()
    if args.skip_baseline:
        torch_eps = eval_ups_t = None
    else:
        torch_eps, torch_step = bench_torch()
        eval_ups_t = bench_eval_torch()

    # regression ratio against the PINNED constant; the live host ratio
    # rides along (host load swings it ~2.5x, BASELINE.md)
    pinned = _pinned_baseline().get('train_examples_per_s')
    vs_pinned = round(jax_eps / pinned, 2) if pinned else None
    vs_live = round(jax_eps / torch_eps, 2) if torch_eps else None

    import jax
    result = {
        'metric': 'bpr_train_examples_per_s_per_chip',
        'value': round(jax_eps, 1),
        'unit': 'examples/s',
        'vs_baseline': vs_pinned if vs_pinned else vs_live,
        'extra': {
            'step_ms': round(jax_step * 1e3, 2),
            'vs_baseline_pinned': vs_pinned,
            'vs_baseline_live': vs_live,
            'pinned_baseline_examples_per_s': pinned,
            'baseline_examples_per_s': round(torch_eps, 1)
            if torch_eps else None,
            'eval_users_per_s': round(eval_ups, 1),
            'eval_users_per_s_baseline': round(eval_ups_t, 1)
            if eval_ups_t else None,
            'adv_sampling_step_ms': round(adv_ms, 2) if adv_ms else None,
            'adv_sampling_examples_per_s': round(adv_eps, 1)
            if adv_eps else None,
            'ltr_eval_users_per_s': round(ltr_ups, 1) if ltr_ups else None,
            'serving_eval_users_per_s_approx95': round(serving_ups, 1)
            if serving_ups else None,
            'cached_train_examples_per_s_r8': round(cached_eps, 1)
            if cached_eps else None,
            'conv_gcn_step_ms': round(conv_ms, 2) if conv_ms else None,
            'conv_gcn_examples_per_s': round(conv_eps, 1)
            if conv_eps else None,
            'conv_gat_step_ms': round(gat_ms, 2) if gat_ms else None,
            'conv_gatv2_step_ms': round(gatv2_ms, 2) if gatv2_ms else None,
            'conv_graphsage_step_ms': round(sage_ms, 2)
            if sage_ms else None,
            'text_kg_step_ms': round(text_ms, 2) if text_ms else None,
            'text_kg_examples_per_s': round(text_eps, 1)
            if text_eps else None,
            'device': str(jax.devices()[0]),
            'n_users': N_USERS, 'n_items': N_ITEMS,
            'batch': BATCH, 'emb': EMB, 'layers': LAYERS,
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
