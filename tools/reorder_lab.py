"""Graph-reordering experiment for the tiled one-hot SpMM kernel.

docs/KERNEL.md's roofline leaves the kernel ~5x above its HBM bound, with
tile PADDING (edges padded to CHUNK multiples per tile) and the per-edge
one-hot cost ((SRC+DST)*d FLOPs, i.e. proportional to BLOCK SIZE) as the
two inflation terms.  Both depend on how edges land in tiles: reordering
row ids to concentrate edges into fewer, denser tiles (a) cuts padding
directly and (b) makes SMALLER blocks viable, cutting the per-edge
one-hot work.  This lab measures that lever:

* graphs: ``uniform`` (the scale_bench synthetic — no latent structure,
  reordering CANNOT help; the control) and ``clustered`` (planted
  bipartite partition with shuffled ids — the structure real interaction
  data has and the arrival-order ids real loaders produce).
* orderings: ``identity``, ``degree`` (sort by degree), ``barycenter``
  (alternating mean-position sort, the classic bandwidth heuristic),
  ``rcm`` (scipy reverse Cuthill-McKee on the bipartite adjacency).
* per (ordering, block) config: host-side layout stats (padding factor,
  grid occupancy) and, with ``--time``, measured ms/call on the real TPU
  (chain-difference timing, tools/kernel_lab.py method).

Usage:
    python tools/reorder_lab.py --scale S1 --graph clustered \
        [--orderings identity,barycenter,rcm] [--blocks auto,256x256] \
        [--time] [--d 64]

Results land in SCALE.md ("graph reordering" section).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_bench import SIZES, synth_edges  # noqa: E402


# --- graph generators --------------------------------------------------------

def clustered_edges(n_users, n_items, avg_deg, n_clusters=64, p_in=0.9,
                    seed=0):
    """Planted bipartite partition: each user/item belongs to one of
    ``n_clusters`` clusters; ``p_in`` of edges stay in-cluster.  Ids are
    SHUFFLED afterwards — the baseline ordering is arrival-order, like a
    real loader's first-appearance remap (data/core.py:196-209)."""
    rng = np.random.RandomState(seed)
    cu = rng.randint(0, n_clusters, n_users)
    ci = rng.randint(0, n_clusters, n_items)
    sizes = np.bincount(ci, minlength=n_clusters)
    order = np.argsort(ci, kind='stable')
    starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]

    n_edges = n_users * avg_deg
    eu = rng.randint(0, n_users, n_edges)
    c = cu[eu]
    in_cluster = (rng.rand(n_edges) < p_in) & (sizes[c] > 0)
    r = rng.randint(0, 1 << 30, n_edges)
    # clamp: empty clusters have starts[c] == n_items (the branch is
    # discarded by the mask, but np.where evaluates it eagerly)
    ei_in = order[np.minimum(starts[c] + r % np.maximum(sizes[c], 1),
                             n_items - 1)]
    ei_out = rng.randint(0, n_items, n_edges)
    ei = np.where(in_cluster, ei_in, ei_out)

    # arrival-order shuffle
    pu = rng.permutation(n_users)
    pi = rng.permutation(n_items)
    eu, ei = pu[eu], pi[ei]

    pairs = np.unique(np.stack([eu, ei], 1), axis=0)
    eu, ei = pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)
    du = np.bincount(eu, minlength=n_users)
    di = np.bincount(ei, minlength=n_items)
    with np.errstate(divide='ignore'):
        w = 1.0 / np.sqrt(du[eu].astype(np.float64) * di[ei])
    w[~np.isfinite(w)] = 0
    return eu, ei, w.astype(np.float32)


# --- orderings ---------------------------------------------------------------
# each returns (map_u, map_i): old id -> new id

def order_identity(eu, ei, n_users, n_items):
    return np.arange(n_users), np.arange(n_items)


def order_degree(eu, ei, n_users, n_items):
    mu = np.empty(n_users, np.int64)
    mi = np.empty(n_items, np.int64)
    mu[np.argsort(-np.bincount(eu, minlength=n_users),
                  kind='stable')] = np.arange(n_users)
    mi[np.argsort(-np.bincount(ei, minlength=n_items),
                  kind='stable')] = np.arange(n_items)
    return mu, mi


def order_barycenter(eu, ei, n_users, n_items, iters=10):
    pos_u = np.arange(n_users, dtype=np.float64)
    mu = np.arange(n_users)
    mi = np.arange(n_items)
    for _ in range(iters):
        cnt_i = np.maximum(np.bincount(ei, minlength=n_items), 1)
        bi = np.bincount(ei, weights=pos_u[eu],
                         minlength=n_items) / cnt_i
        mi = np.empty(n_items, np.int64)
        mi[np.argsort(bi, kind='stable')] = np.arange(n_items)
        pos_i = mi.astype(np.float64)
        cnt_u = np.maximum(np.bincount(eu, minlength=n_users), 1)
        bu = np.bincount(eu, weights=pos_i[ei],
                         minlength=n_users) / cnt_u
        mu = np.empty(n_users, np.int64)
        mu[np.argsort(bu, kind='stable')] = np.arange(n_users)
        pos_u = mu.astype(np.float64)
    return mu, mi


def order_rcm(eu, ei, n_users, n_items):
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    n = n_users + n_items
    rows = np.concatenate([eu, ei + n_users])
    cols = np.concatenate([ei + n_users, eu])
    m = coo_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                   shape=(n, n)).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(m, symmetric_mode=True))
    pu = perm[perm < n_users]
    pi = perm[perm >= n_users] - n_users
    mu = np.empty(n_users, np.int64)
    mi = np.empty(n_items, np.int64)
    mu[pu] = np.arange(len(pu))
    mi[pi] = np.arange(len(pi))
    # isolated nodes may be absent from perm's component sweep order in
    # theory; RCM covers all vertices, so pu/pi are complete permutations
    return mu, mi


ORDERINGS = {
    'identity': order_identity,
    'degree': order_degree,
    'barycenter': order_barycenter,
    'rcm': order_rcm,
}


# --- layout stats + timing ---------------------------------------------------

def layout_stats(op):
    """Padding + grid stats for a built TiledSpMM (summed over splits)."""
    import textgcn_tpu.ops.pallas_spmm as P
    chunks = sum(d.n_chunks for _, _, d in op.splits)
    real_groups = sum(d.n_chunks // P.GROUP for _, _, d in op.splits)
    grid = sum(d.n_dst_blocks * d.max_groups for _, _, d in op.splits)
    return {
        'splits': len(op.splits),
        'blocks': (op.src_block, op.dst_block),
        'chunks': chunks,
        'grid_steps': grid,
        'grid_occupancy': round(real_groups / max(grid, 1), 3),
    }


def build_direction(src, dst, w, n_src, n_dst, d, blocks):
    import textgcn_tpu.ops.pallas_spmm as P
    n_src_t = -(-n_src // 4096) * 4096
    n_dst_t = -(-n_dst // 4096) * 4096
    sb, db = (None, None) if blocks == 'auto' else \
        tuple(int(x) for x in blocks.split('x'))
    return P.TiledSpMM(src, dst, w, n_src_t, n_dst_t, d,
                       user_axis='dst', src_block=sb, dst_block=db)


def chain_time(op, x, n1=4, n2=14, reps=3):
    import jax
    import jax.numpy as jnp

    salt = jnp.uint32(0)
    keep = jnp.float32(1.0)

    def chain(n):
        @jax.jit
        def f(x):
            dt = x.dtype
            acc = jnp.float32(0)
            for _ in range(n):
                out = op(x, salt, keep)
                x = (x + out[:x.shape[0]].sum() * 1e-12).astype(dt)
                acc += out.sum()
            return acc
        return f

    fa, fb = chain(n1), chain(n2)
    float(fa(x)), float(fb(x))

    def t(f):
        t0 = time.perf_counter()
        for _ in range(reps):
            float(f(x))
        return (time.perf_counter() - t0) / reps * 1e3

    return (t(fb) - t(fa)) / (n2 - n1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--scale', default='S1', choices=sorted(SIZES))
    ap.add_argument('--graph', default='clustered',
                    choices=('uniform', 'clustered'))
    ap.add_argument('--clusters', type=int, default=64)
    ap.add_argument('--p_in', type=float, default=0.9)
    ap.add_argument('--orderings', default='identity,degree,barycenter,rcm')
    ap.add_argument('--blocks', default='auto',
                    help='comma list: auto, 512x512, 256x256, ...')
    ap.add_argument('--d', type=int, default=64)
    ap.add_argument('--time', action='store_true',
                    help='device timing on the default JAX platform '
                         '(real TPU); omit for host-only layout stats')
    args = ap.parse_args(argv)

    if not args.time:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp
    from textgcn_tpu.cli import setup_compilation_cache
    setup_compilation_cache()

    n_users, n_items, avg_deg = SIZES[args.scale]
    if args.graph == 'uniform':
        eu, ei, w = synth_edges(n_users, n_items, avg_deg)
    else:
        eu, ei, w = clustered_edges(n_users, n_items, avg_deg,
                                    n_clusters=args.clusters,
                                    p_in=args.p_in)
    n_edges = len(eu)
    print(f'{args.scale} {args.graph}: {n_users}x{n_items}, '
          f'{n_edges} edges')

    results = []
    for name in args.orderings.split(','):
        mu, mi = ORDERINGS[name](eu, ei, n_users, n_items)
        reu, rei = mu[eu].astype(np.int32), mi[ei].astype(np.int32)
        for blocks in args.blocks.split(','):
            # the long direction (dst=users) dominates; its stats/timing
            # are the decision signal
            op = build_direction(rei, reu, w, n_items, n_users, args.d,
                                 blocks)
            st = layout_stats(op)
            st.update(ordering=name, block_cfg=blocks,
                      pad_factor=round(st['chunks'] * 128 / n_edges, 3))
            if args.time:
                # feed the full padded source table like production
                n_src_t = -(-n_items // 4096) * 4096
                x = jnp.asarray(np.random.RandomState(1).randn(
                    n_src_t, args.d).astype(np.float32))
                st['ms_per_call'] = round(chain_time(op, x), 3)
            results.append(st)
            print('  ', {k: st[k] for k in
                         ('ordering', 'block_cfg', 'blocks', 'pad_factor',
                          'grid_occupancy', 'splits')
                         } | ({'ms': st['ms_per_call']}
                              if args.time else {}))

    print(json.dumps({'scale': args.scale, 'graph': args.graph,
                      'n_edges': n_edges, 'results': results}))
    return results


if __name__ == '__main__':
    main()
