"""Cached-propagation (--refresh_every) step-time sweep on the real TPU.

Measures the Trainer-shaped train step (lax.scan with the (rest, age)
carry and the lax.cond refresh, exactly trainer._make_epoch_fn's cached
mode) at refresh_every in {0 (exact), 1, 4, 8, 16} for the SCALE.md sizes.
Chain-difference timing (tools/kernel_lab.py; block_until_ready does not
sync through the axon relay).

Usage: python tools/cached_prop_lab.py [--sizes S1,S2] [--refresh 0,1,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_bench import EMB, LAYERS, BATCH, DROPOUT, SIZES, synth_edges  # noqa: E402


def build_cached_step(graph_op, n_users_t, n_items_t, n_users, n_items,
                      refresh: int):
    import jax
    import jax.numpy as jnp
    import optax

    from textgcn_tpu.models.losses import bpr_loss, reg_loss
    from textgcn_tpu.ops.propagate import propagate_rest, representation

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    params = {
        'user_emb': 0.1 * jax.random.normal(k1, (n_users_t, EMB)),
        'item_emb': 0.1 * jax.random.normal(k2, (n_items_t, EMB)),
    }
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    inv = 1.0 / (LAYERS + 1)

    def loss_fn(params, rest, graph_op, users, pos, negs, key):
        if refresh:
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

    def make_run(n_steps):
        @jax.jit
        def run(params, opt_state, key, graph_op):
            # extra carry only in cached mode (like bench.py/trainer):
            # the refresh=0 baseline program must be the exact step, not
            # an exact step dragging a dead (rest, age) carry
            rest0 = None
            if refresh:
                rest0 = (jnp.zeros_like(params['user_emb']),
                         jnp.zeros_like(params['item_emb']))

            def step(carry, key):
                params, opt_state, rest, age = carry
                k_b, k_d = jax.random.split(key)
                ku, kp, kn = jax.random.split(k_b, 3)
                users = jax.random.randint(ku, (BATCH,), 0, n_users)
                pos = jax.random.randint(kp, (BATCH,), 0, n_items)
                negs = jax.random.randint(kn, (BATCH, 1), 0, n_items)
                if refresh:
                    k_r, k_d = jax.random.split(k_d)
                    rest = jax.lax.cond(
                        jax.lax.rem(age, refresh) == 0,
                        lambda p: propagate_rest(
                            p, graph_op, LAYERS, dropout=DROPOUT,
                            dropout_key=k_r),
                        lambda p: rest, params)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, rest, graph_op, users, pos, negs, k_d)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rest, age + 1), loss

            keys = jax.random.split(key, n_steps)
            (params, opt_state, *_), losses = jax.lax.scan(
                step, (params, opt_state, rest0, jnp.int32(0)), keys)
            return losses.sum()
        return lambda p, o, k: run(p, o, k, graph_op)

    return params, opt_state, make_run


def time_steps(params, opt_state, make_run, refresh, n1=None, n2=None,
               reps=3):
    """Chain-difference ms/step.  Scan lengths are multiples of the
    refresh period so both runs amortize the same refresh fraction."""
    import jax
    r = max(refresh, 1)
    if n1 is None:
        n1 = 2 * r if refresh else 4
    if n2 is None:
        n2 = n1 + max(8 * r if refresh else 8, 8)
    r1, r2 = make_run(n1), make_run(n2)
    key = jax.random.key(3)
    float(r1(params, opt_state, key))
    float(r2(params, opt_state, key))

    def t(run):
        t0 = time.perf_counter()
        for i in range(reps):
            float(run(params, opt_state, jax.random.key(10 + i)))
        return (time.perf_counter() - t0) / reps

    return (t(r2) - t(r1)) / (n2 - n1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', default='S1,S2')
    ap.add_argument('--refresh', default='0,1,4,8,16')
    ap.add_argument('--out', default='')
    args = ap.parse_args()

    from textgcn_tpu.cli import setup_compilation_cache
    setup_compilation_cache()
    import jax

    from textgcn_tpu.ops.pallas_spmm import PallasGraphOp

    records = []
    for name in args.sizes.split(','):
        n_users, n_items, avg_deg = SIZES[name]
        eu, ei, w = synth_edges(n_users, n_items, avg_deg)
        nu_t = -(-n_users // 4096) * 4096  # model's table rounding
        ni_t = -(-n_items // 4096) * 4096
        graph_op = PallasGraphOp(eu, ei, w, nu_t, ni_t, EMB)
        for refresh in [int(x) for x in args.refresh.split(',')]:
            params, opt_state, make_run = build_cached_step(
                graph_op, nu_t, ni_t, n_users, n_items, refresh)
            ms = time_steps(params, opt_state, make_run, refresh)
            rec = {'size': name, 'refresh_every': refresh,
                   'step_ms': round(ms, 2),
                   'examples_per_s': round(BATCH / (ms / 1e3), 1),
                   'n_edges': len(eu),
                   'device': str(jax.devices()[0])}
            print(json.dumps(rec), flush=True)
            records.append(rec)
            del params, opt_state
        del graph_op
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(records, f, indent=1)


if __name__ == '__main__':
    main()
