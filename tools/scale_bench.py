"""Production-scale sweep: BPR train step + eval at growing graph sizes.

Runs on the real TPU.  For each size it measures, with chain-difference
timing (the only reliable method through the axon relay — see
tools/kernel_lab.py), the full jitted train step (propagation + BPR + reg
+ Adam inside a lax.scan, exactly the Trainer's epoch shape) for the
pallas and xla propagation backends, plus full-catalog eval throughput
and the host-side layout-build cost (native C++ vs numpy).

Sizes include a shape whose source table forces multiple ``TiledSpMM``
source-range splits (>6 MB VMEM budget per table), exercising the split
machinery at scale on hardware.

Writes one JSON record per (size, backend) to stdout and the whole sweep
to ``BENCH_SCALE.json``.

Usage: python tools/scale_bench.py [--sizes S1,S2,S3] [--out BENCH_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = {
    # name: (n_users, n_items, avg_degree)
    'S1': (60_000, 25_000, 10),      # Amazon-Electronics-like (bench.py)
    'S2': (200_000, 80_000, 10),     # 2M edges
    'S3': (500_000, 200_000, 15),    # 7.5M edges; >=3 source splits
}
EMB = 64
LAYERS = 3
BATCH = 2048
DROPOUT = 0.4


def synth_edges(n_users, n_items, avg_deg, seed=0):
    rng = np.random.RandomState(seed)
    n_edges = n_users * avg_deg
    eu = rng.randint(0, n_users, n_edges).astype(np.int32)
    ei = rng.randint(0, n_items, n_edges).astype(np.int32)
    pairs = np.unique(np.stack([eu, ei], 1), axis=0)
    eu, ei = pairs[:, 0], pairs[:, 1]
    du = np.bincount(eu, minlength=n_users)
    di = np.bincount(ei, minlength=n_items)
    with np.errstate(divide='ignore'):
        w = 1.0 / np.sqrt(du[eu].astype(np.float64) * di[ei])
    w[~np.isfinite(w)] = 0
    return eu, ei, w.astype(np.float32)


def build_step(graph_op, n_users_t, n_items_t, n_users, n_items):
    import jax
    import jax.numpy as jnp
    import optax

    from textgcn_tpu.models.losses import bpr_loss, reg_loss
    from textgcn_tpu.ops.propagate import representation

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    params = {
        'user_emb': 0.1 * jax.random.normal(k1, (n_users_t, EMB)),
        'item_emb': 0.1 * jax.random.normal(k2, (n_items_t, EMB)),
    }
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def loss_fn(params, graph_op, users, pos, negs, key):
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

    def make_run(n_steps):
        # the graph op is a jit ARGUMENT (pytree): its layout arrays stay
        # out of the compiled program (the remote compile service rejects
        # multi-hundred-MB constant-embedded HLO with HTTP 413)
        @jax.jit
        def run(params, opt_state, key, graph_op):
            def step(carry, key):
                params, opt_state = carry
                k_b, k_d = jax.random.split(key)
                ku, kp, kn = jax.random.split(k_b, 3)
                users = jax.random.randint(ku, (BATCH,), 0, n_users)
                pos = jax.random.randint(kp, (BATCH,), 0, n_items)
                negs = jax.random.randint(kn, (BATCH, 1), 0, n_items)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, graph_op, users, pos, negs, k_d)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            keys = jax.random.split(key, n_steps)
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), keys)
            return losses.sum()
        return lambda p, o, k: run(p, o, k, graph_op)

    return params, opt_state, make_run


def time_steps(params, opt_state, make_run, n1=4, n2=12, reps=3):
    """Chain-difference step time in ms: slope between an n1-step and an
    n2-step scan, each synced by a real scalar fetch."""
    import jax
    r1, r2 = make_run(n1), make_run(n2)
    key = jax.random.key(3)
    float(r1(params, opt_state, key))   # compile + warm
    float(r2(params, opt_state, key))

    def t(run):
        t0 = time.perf_counter()
        for i in range(reps):
            float(run(params, opt_state, jax.random.key(10 + i)))
        return (time.perf_counter() - t0) / reps

    return (t(r2) - t(r1)) / (n2 - n1) * 1e3


def time_eval(n_items, n_eval_users=4096, max_deg=32, approx=None):
    """Full-catalog masked top-k users/s (chain-difference).

    ``approx``: serving-mode recall target (lax.approx_max_k); None =
    exact (the eval default)."""
    import jax
    import jax.numpy as jnp

    from textgcn_tpu.ops.retrieval import score_and_topk

    rng = np.random.RandomState(0)
    users_emb = jnp.asarray(rng.randn(n_eval_users, EMB).astype(np.float32))
    items_emb = jnp.asarray(rng.randn(n_items, EMB).astype(np.float32))
    pos = jnp.asarray(rng.randint(0, n_items, (n_eval_users, max_deg))
                      .astype(np.int32))

    def run_n(n):
        @jax.jit
        def f(users_emb, items_emb, pos):
            acc = jnp.float32(0)
            for _ in range(n):
                u = users_emb.reshape(-1, BATCH, EMB)

                def one(_, xs):
                    bu, bp = xs
                    vals, _ = score_and_topk(bu, items_emb, bp, k=40,
                                             n_items=n_items,
                                             approx=approx)
                    return None, vals.sum()

                _, s = jax.lax.scan(
                    one, None, (u, pos.reshape(-1, BATCH, max_deg)))
                acc = acc + s.sum()
                users_emb = users_emb + acc * 1e-20
            return acc
        return f

    # wide chain spread (1 vs 6 passes) + median-of-reps: the per-pass
    # time in serving mode can be a few ms, far below a single relay
    # round trip's variance — a narrow one-shot difference can even go
    # negative
    f1, f2 = run_n(1), run_n(6)
    float(f1(users_emb, items_emb, pos))
    float(f2(users_emb, items_emb, pos))

    def t(f, reps=5):
        import statistics
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(users_emb, items_emb, pos))
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    per_pass = (t(f2) - t(f1)) / 5
    return n_eval_users / per_pass


def bench_size(name, n_users, n_items, avg_deg, backends):
    import jax

    from textgcn_tpu.ops.pallas_spmm import PallasGraphOp
    from textgcn_tpu.ops.spmm import BipartiteGraphOp

    eu, ei, w = synth_edges(n_users, n_items, avg_deg)
    n_edges = len(eu)
    records = []
    for backend in backends:
        if backend == 'pallas':
            # table rows rounded to 4096 exactly like the LightGCN model
            # (lightgcn.py table_round) and bench.py — the sweep must
            # measure the same table shapes (and hence the same compiled
            # kernel variants) the trainer actually runs
            nu_t = -(-n_users // 4096) * 4096
            ni_t = -(-n_items // 4096) * 4096
            t0 = time.perf_counter()
            graph_op = PallasGraphOp(eu, ei, w, nu_t, ni_t, EMB)
            build_s = time.perf_counter() - t0
            splits = (len(graph_op.l_u2i.splits),
                      len(graph_op.l_i2u.splits))
        else:
            nu_t, ni_t = n_users, n_items
            t0 = time.perf_counter()
            graph_op = BipartiteGraphOp(eu, ei, w, nu_t, ni_t)
            build_s = time.perf_counter() - t0
            splits = (1, 1)

        params, opt_state, make_run = build_step(
            graph_op, nu_t, ni_t, n_users, n_items)
        step_ms = time_steps(params, opt_state, make_run)
        rec = {
            'size': name, 'backend': backend,
            'n_users': n_users, 'n_items': n_items, 'n_edges': n_edges,
            'emb': EMB, 'layers': LAYERS, 'batch': BATCH,
            'step_ms': round(step_ms, 2),
            'examples_per_s': round(BATCH / (step_ms / 1e3), 1),
            'layout_build_s': round(build_s, 2),
            'splits_u2i': splits[0], 'splits_i2u': splits[1],
            'device': str(jax.devices()[0]),
        }
        print(json.dumps(rec), flush=True)
        records.append(rec)
        del params, opt_state, graph_op

    ups = time_eval(n_items)
    rec = {'size': name, 'metric': 'eval_users_per_s',
           'n_items': n_items, 'value': round(ups, 1)}
    print(json.dumps(rec), flush=True)
    records.append(rec)
    rec = {'size': name, 'metric': 'serving_eval_users_per_s',
           'n_items': n_items, 'approx': 0.95,
           'value': round(time_eval(n_items, approx=0.95), 1)}
    print(json.dumps(rec), flush=True)
    records.append(rec)
    return records


def bench_native_layout(n_users, n_items, avg_deg):
    """Host layout-build cost: native C++ vs numpy, biggest size."""
    from textgcn_tpu import native
    from textgcn_tpu.ops.pallas_spmm import PallasDirection

    eu, ei, w = synth_edges(n_users, n_items, avg_deg)
    ni_t = -(-n_items // 4096) * 4096
    out = {'metric': 'tile_layout_build_s', 'n_edges': len(eu)}
    for label, env in (('native', ''), ('numpy', '0')):
        os.environ['TEXTGCN_TPU_NATIVE'] = env
        if label == 'native' and not native.available():
            out[label] = None
            continue
        t0 = time.perf_counter()
        PallasDirection(ei, eu, w, ni_t, n_users)
        out[label] = round(time.perf_counter() - t0, 2)
    os.environ.pop('TEXTGCN_TPU_NATIVE', None)
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', default='S1,S2,S3')
    ap.add_argument('--backends', default='pallas,xla')
    ap.add_argument('--out', default='BENCH_SCALE.json')
    ap.add_argument('--skip_native_compare', action='store_true')
    args = ap.parse_args()

    from textgcn_tpu.cli import setup_compilation_cache
    setup_compilation_cache()

    all_records = []
    for name in args.sizes.split(','):
        n_users, n_items, avg_deg = SIZES[name]
        all_records += bench_size(name, n_users, n_items, avg_deg,
                                  args.backends.split(','))
    if not args.skip_native_compare:
        biggest = args.sizes.split(',')[-1]
        all_records.append(bench_native_layout(*SIZES[biggest]))
    with open(args.out, 'w') as f:
        json.dump(all_records, f, indent=1)
    print(f'wrote {args.out}', file=sys.stderr)


if __name__ == '__main__':
    main()
