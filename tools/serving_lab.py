"""Serving-path experiment: score-matrix dtype vs approx_max_k cost.

With ``approx_max_k`` the top-k partial reduction is cheap, so the
serving eval batch is dominated by materializing the (B, n_items) score
matrix in HBM (f32 at (2048, 81920) = 671 MB round trip).  This lab
measures whether emitting bf16 scores (halving that traffic) pays, and
whether it perturbs the returned ranking enough to matter at a 0.95
recall target.  Development tooling, not part of the library.

Run on the real TPU: python tools/serving_lab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, D, K = 2048, 64, 40
MAX_DEG = 64


def chain_time(make_call, users, items, pos, n1=2, n2=8, reps=3):
    import jax
    import jax.numpy as jnp

    def chain(n):
        @jax.jit
        def f(users, items, pos):
            acc = jnp.float32(0)
            for _ in range(n):
                vals, _ = make_call(users, items, pos)
                acc += vals.astype(jnp.float32).sum()
                users = users + acc * 1e-20
            return acc
        return f

    fa, fb = chain(n1), chain(n2)
    float(fa(users, items, pos)); float(fb(users, items, pos))

    def t(f):
        t0 = time.perf_counter()
        for _ in range(reps):
            float(f(users, items, pos))
        return (time.perf_counter() - t0) / reps * 1e3

    return (t(fb) - t(fa)) / (n2 - n1)


def main(n_items=81_920):
    import jax
    import jax.numpy as jnp

    from textgcn_tpu.cli import setup_compilation_cache
    from textgcn_tpu.ops.retrieval import mask_train_items

    setup_compilation_cache()
    rng = np.random.RandomState(0)
    users = jnp.asarray(rng.randn(B, D).astype(np.float32))
    items = jnp.asarray(rng.randn(n_items, D).astype(np.float32))
    pos = jnp.asarray(rng.randint(0, n_items, (B, MAX_DEG)).astype(np.int32))

    def f32_exact(u, it, p):
        s = jnp.dot(u, it.T, preferred_element_type=jnp.float32)
        s = mask_train_items(s, p, n_items)
        return jax.lax.top_k(s, K)

    def f32_approx(u, it, p):
        s = jnp.dot(u, it.T, preferred_element_type=jnp.float32)
        s = mask_train_items(s, p, n_items)
        return jax.lax.approx_max_k(s, K, recall_target=0.95)

    def bf16_approx(u, it, p):
        s = jnp.dot(u, it.T, preferred_element_type=jnp.bfloat16)
        s = mask_train_items(s, p, n_items)
        return jax.lax.approx_max_k(s, K, recall_target=0.95)

    results = {}
    for name, fn in (('f32_exact', f32_exact), ('f32_approx', f32_approx),
                     ('bf16_approx', bf16_approx)):
        results[name] = chain_time(fn, users, items, pos)
        print(f'{name:12s} {results[name]:7.2f} ms/batch', flush=True)

    # ranking agreement: bf16 vs f32 score matrix under the same reduction
    vi_f = jax.jit(f32_approx)(users, items, pos)[1]
    vi_b = jax.jit(bf16_approx)(users, items, pos)[1]
    vi_e = jax.jit(f32_exact)(users, items, pos)[1]
    f, b, e = (np.asarray(v) for v in (vi_f, vi_b, vi_e))
    rec_f = np.mean([len(np.intersect1d(f[r], e[r])) / K for r in range(B)])
    rec_b = np.mean([len(np.intersect1d(b[r], e[r])) / K for r in range(B)])
    print(f'recall vs exact: f32_approx={rec_f:.4f} bf16_approx={rec_b:.4f}',
          flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 81_920)
