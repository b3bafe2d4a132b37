"""ON-CHIP kernel-vs-segment equivalence for the attention pipeline.

The interpret-mode tests (tests/test_pallas_gat.py, tests/test_conv.py)
prove the MATH in exact f32; this proves the MOSAIC COMPILATION on the
real TPU at a quality-run shape — forward values and every gradient,
kernels at production precision settings.  It is the check that would
have caught the bf16-sentinel NaN (round 5: a non-bf16-representable
masked-logit sentinel rounded through the one-hot gather matmuls and
NaN'd every real-chip attention fit; invisible to interpret mode).

Run each round after touching ops/pallas_gat.py:

    python tools/attention_gradcheck.py [--users 50000] [--items 20000]
        [--d 64] [--edges 511000] [--models gat,gatv2]

Exit code 0 = all gradients within tolerance and finite.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--users', type=int, default=50_000)
    ap.add_argument('--items', type=int, default=20_000)
    ap.add_argument('--d', type=int, default=64)
    ap.add_argument('--edges', type=int, default=511_000)
    ap.add_argument('--models', default='gat,gatv2')
    ap.add_argument('--rtol', type=float, default=2e-2,
                    help='relative-L2 gradient tolerance: the kernel '
                         'consumes bf16 tables at DEFAULT precision '
                         '(the segment oracle is f32), so ~0.5%% L2 is '
                         'expected input rounding; the check exists to '
                         'catch non-finites and gross miscompiles. '
                         'For an exact run: '
                         'TEXTGCN_TPU_PALLAS_XDTYPE=f32 '
                         'TEXTGCN_TPU_PALLAS_PRECISION=highest '
                         '--rtol 1e-4 (measured ~1e-6 at 50k).')
    ap.add_argument('--interpret', action='store_true',
                    help='interpret-mode kernels (CPU debugging); the '
                         'default is the real Mosaic compilation — the '
                         'whole point of this tool')
    args = ap.parse_args()

    import jax

    if os.environ.get('TEXTGCN_TPU_PLATFORM', '').lower() == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    import jax.numpy as jnp
    import numpy as np

    from textgcn_tpu.cli import setup_compilation_cache
    from textgcn_tpu.models.conv import _attention_direction, _leaky
    from textgcn_tpu.ops.pallas_spmm import (PallasGraphOp,
                                             edge_dropout_scale)

    setup_compilation_cache()
    nu = -(-args.users // 4096) * 4096
    ni = -(-args.items // 4096) * 4096
    rng = np.random.RandomState(0)
    eu = rng.randint(0, args.users, args.edges)
    ei = rng.randint(0, args.items, args.edges)
    pairs = np.unique(np.stack([eu, ei], 1), axis=0)
    eu, ei = pairs[:, 0].astype(np.int64), pairs[:, 1].astype(np.int64)
    print(f'# edges={len(eu)} tables={nu}x{ni} d={args.d}', flush=True)

    # same per-split budgets models/conv.py uses for attention layouts
    ops = {name: PallasGraphOp(
        eu, ei, np.ones(len(eu), np.float32), nu, ni, args.d,
        interpret=args.interpret,
        vmem_budget=(2 if name == 'gatv2' else 3) * 2**20)
        for name in args.models.split(',')}
    interp = args.interpret

    h_u = jnp.asarray(0.1 * rng.randn(nu, args.d).astype(np.float32))
    h_i = jnp.asarray(0.1 * rng.randn(ni, args.d).astype(np.float32))
    v1 = jnp.asarray(rng.randn(args.d).astype(np.float32))
    v2 = jnp.asarray(rng.randn(args.d).astype(np.float32))
    key = jax.random.PRNGKey(11)
    salts = jax.random.bits(key, (2,), jnp.uint32)
    keep = jnp.float32(0.6)
    m_u = (edge_dropout_scale(jnp.asarray(eu), jnp.asarray(ei), salts[0],
                              keep) > 0).astype(jnp.float32)
    eu_j, ei_j = jnp.asarray(eu), jnp.asarray(ei)

    failed = False
    for name, op in ops.items():
        if name == 'gat':
            from textgcn_tpu.ops.pallas_gat import gat_direction

            def kfn(h_u, h_i, a_src, a_dst):
                s_u, d_u = h_u @ a_src, h_u @ a_dst
                s_i = h_i @ a_src
                return gat_direction(op, 'to_user', h_i, h_u, s_i, s_u,
                                     d_u, salts[0], keep,
                                     interpret=interp)

            def sfn(h_u, h_i, a_src, a_dst):
                s_u, d_u = h_u @ a_src, h_u @ a_dst
                s_i = h_i @ a_src
                return _attention_direction(
                    h_i, _leaky(s_i[ei_j] + d_u[eu_j]),
                    _leaky(s_u + d_u), h_u, ei_j, eu_j, m_u, nu)
        else:
            from textgcn_tpu.ops.pallas_gat import gatv2_direction

            def kfn(hs_u, hs_i, hd_u, a):
                return gatv2_direction(op, 'to_user', hs_i, hs_u, hd_u,
                                       a, salts[0], keep,
                                       interpret=interp)

            def sfn(hs_u, hs_i, hd_u, a):
                return _attention_direction(
                    hs_i, _leaky(hs_i[ei_j] + hd_u[eu_j]) @ a,
                    _leaky(hs_u + hd_u) @ a, hs_u, ei_j, eu_j, m_u, nu)

        def loss(f):
            return lambda *ar: (f(*ar) ** 2).sum()

        # gat args: (h_u, h_i, a_src, a_dst); gatv2: (hs_u, hs_i, hd_u, a)
        argv = (h_u, h_i, 0.1 * h_u[:, ::-1], v1) if name == 'gatv2' \
            else (h_u, h_i, v1, v2)
        gk = jax.jit(jax.value_and_grad(loss(kfn), argnums=(0, 1, 2, 3)))
        gs = jax.jit(jax.value_and_grad(loss(sfn), argnums=(0, 1, 2, 3)))
        got, grads_k = gk(*argv)
        want, grads_s = gs(*argv)
        ok = np.isfinite(float(got)) \
            and abs(float(got) - float(want)) <= args.rtol * abs(
                float(want))
        print(f'{name}: loss kernel={float(got):.6g} '
              f'segment={float(want):.6g} {"OK" if ok else "FAIL"}',
              flush=True)
        failed |= not ok
        for i, (x, y) in enumerate(zip(grads_k, grads_s)):
            x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
            scale = np.abs(y).max() + 1e-9
            err = np.abs(x - y).max()
            # gate on relative L2: single elements with heavy
            # cancellation show large max-norm deviations under the
            # production bf16 table rounding (measured: gatv2 d_hd 26%
            # max-norm, 0.5% L2 at 50k; the f32 run is ~1e-6 on both)
            l2 = np.linalg.norm(x - y) / (np.linalg.norm(y) + 1e-9)
            ok = np.isfinite(x).all() and l2 <= args.rtol
            print(f'  grad[{i}]: maxabs={scale:.4g} maxerr={err:.4g} '
                  f'rel_max={err / scale:.3g} rel_l2={l2:.3g} '
                  f'{"OK" if ok else "FAIL"}', flush=True)
            failed |= not ok
    print('RESULT', 'FAIL' if failed else 'PASS')
    sys.exit(1 if failed else 0)


if __name__ == '__main__':
    main()
