"""Generate a clustered synthetic dataset with text (meta + reviews).

Creates a structured bipartite graph (users prefer their cluster's items)
so ranking quality is learnable, plus ``meta_synced.tsv`` and
``reviews_text.tsv`` so the full lgcn -> ltr_linear warm-start recipe runs
without external data (this image has no network access to fetch the
Amazon datasets the reference uses).

Usage: python tools/make_synthetic.py <out_dir> [n_users] [n_items] [seed]
"""

import os
import sys

import numpy as np
import pandas as pd


def _generate_sharp(rng, n_users, n_items, k_clusters, ucl, items_by_cl,
                    ext_pool=None):
    """Vectorized high-signal generator: 95% own-cluster draws, Zipf
    (rank^-1) popularity within each cluster, 12-24 interactions per
    user, 2 own-cluster pairs per user held out.  ``ext_pool`` restricts
    the 5% uniform draws (cold mode keeps cold items out of them)."""
    n_inter = rng.randint(12, 25, n_users)
    n_own = np.maximum((n_inter * 0.95).astype(int), 3)
    n_ext = n_inter - n_own

    u_own = np.repeat(np.arange(n_users), n_own)
    i_own = np.empty(len(u_own), np.int64)
    cl_of_draw = ucl[u_own]
    for c in range(k_clusters):
        m = cl_of_draw == c
        pool = items_by_cl[c]
        if len(pool):
            w = 1.0 / np.arange(1, len(pool) + 1)  # Zipf over cluster rank
            i_own[m] = pool[rng.choice(len(pool), int(m.sum()),
                                       p=w / w.sum())]
        else:
            i_own[m] = rng.randint(0, n_items, int(m.sum()))
    u_ext = np.repeat(np.arange(n_users), n_ext)
    if ext_pool is None:
        i_ext = rng.randint(0, n_items, len(u_ext))
    else:
        i_ext = ext_pool[rng.randint(0, len(ext_pool), len(u_ext))]

    u_all = np.concatenate([u_own, u_ext])
    i_all = np.concatenate([i_own, i_ext])
    own = np.concatenate([np.ones(len(u_own), bool),
                          np.zeros(len(u_ext), bool)])
    # dedup (u, i), keeping the own tag if any duplicate was an own draw
    order = np.lexsort((~own, i_all, u_all))
    u_s, i_s, own_s = u_all[order], i_all[order], own[order]
    first = np.ones(len(u_s), bool)
    first[1:] = (u_s[1:] != u_s[:-1]) | (i_s[1:] != i_s[:-1])
    u_s, i_s, own_s = u_s[first], i_s[first], own_s[first]

    # hold out 2 OWN-cluster pairs per user (only when the user keeps
    # >= 2 own pairs in train, so the cluster stays identifiable):
    # shuffle, then stable-sort by user -> within-user order is random
    shuf = rng.permutation(len(u_s))
    srt = shuf[np.argsort(u_s[shuf], kind='stable')]
    u_p, i_p, own_p = u_s[srt], i_s[srt], own_s[srt]
    starts = np.searchsorted(u_p, np.arange(n_users))
    counts = np.diff(np.append(starts, len(u_p)))
    own_rank = _cumcount_where(u_p, own_p, starts)
    own_total = np.zeros(n_users, np.int64)
    np.add.at(own_total, u_p[own_p], 1)
    is_test = own_p & (own_rank < 2) & (own_total[u_p] >= 4) \
        & (counts[u_p] >= 5)

    def to_df(u, i):
        return pd.DataFrame({
            'user_id': 'u' + pd.Series(u).astype(str),
            'asin': 'i' + pd.Series(i).astype(str)})

    return to_df(u_p[~is_test], i_p[~is_test]), \
        to_df(u_p[is_test], i_p[is_test])


def _split_cold(rng, items_by_cl, cold: float):
    """Per cluster, mark a ``cold`` fraction of items as cold-start: they
    are removed from the Zipf interaction pools (so they receive almost no
    training signal) but keep ≥3 warm items per cluster so the cluster
    stays learnable.  Returns (warm pools, cold-item boolean mask)."""
    n_items = 1 + max((int(p.max()) for p in items_by_cl if len(p)),
                      default=0)
    cold_mask = np.zeros(n_items, bool)
    warm_by_cl = []
    for pool in items_by_cl:
        n_cold = min(int(round(len(pool) * cold)), max(len(pool) - 3, 0))
        if n_cold > 0:
            cold_c = rng.choice(pool, size=n_cold, replace=False)
            cold_mask[cold_c] = True
            warm_by_cl.append(np.setdiff1d(pool, cold_c))
        else:
            warm_by_cl.append(pool)
    return warm_by_cl, cold_mask


def _add_cold(rng, train, test, ucl, icl, cold_mask, k_clusters, n_users):
    """Cold-start holdout: every cold item gets exactly ONE train
    interaction (a random user of its own cluster — it must exist in the
    graph at all), and every test user gets one extra held-out
    (user, own-cluster cold item) pair.  Ranking those pairs from one
    seed interaction is the cold-start task text features exist for."""
    users_by_cl = [np.where(ucl == c)[0] for c in range(k_clusters)]
    cold_items = np.where(cold_mask)[0]
    seed_users = np.empty(len(cold_items), np.int64)
    cold_cl = icl[cold_items]
    for c in range(k_clusters):
        m = cold_cl == c
        if not m.any():
            continue
        pool = users_by_cl[c]
        if not len(pool):
            pool = np.arange(n_users)
        seed_users[m] = pool[rng.randint(0, len(pool), int(m.sum()))]

    test_users = np.unique(test.user_id.str[1:].astype(int).to_numpy())
    cold_by_cl = [cold_items[cold_cl == c] for c in range(k_clusters)]
    t_items = np.full(len(test_users), -1, np.int64)
    for c in range(k_clusters):
        m = ucl[test_users] == c
        pool = cold_by_cl[c]
        if len(pool) and m.any():
            t_items[m] = pool[rng.randint(0, len(pool), int(m.sum()))]
    keep = t_items >= 0
    tu, ti = test_users[keep], t_items[keep]
    # drop the rare collision where a user's held-out cold item is the
    # very item they seeded in train
    seeds = set(zip(seed_users.tolist(), cold_items.tolist()))
    coll = np.fromiter(((u, i) in seeds for u, i in zip(tu, ti)),
                       bool, count=len(tu))
    tu, ti = tu[~coll], ti[~coll]

    def to_df(u, i):
        return pd.DataFrame({
            'user_id': 'u' + pd.Series(u).astype(str),
            'asin': 'i' + pd.Series(i).astype(str)})

    train = pd.concat([train, to_df(seed_users, cold_items)],
                      ignore_index=True)
    test = pd.concat([test, to_df(tu, ti)], ignore_index=True)
    return train, test


def _cumcount_where(users_sorted, flag, starts):
    """Rank of each flagged row among its user's flagged rows (rows
    sorted by user; unflagged rows get a large rank)."""
    csum = np.cumsum(flag)
    base = np.zeros(len(flag), np.int64)
    base = csum - np.where(flag, 1, 0)
    per_user_base = csum[starts] - flag[starts]
    rank = base - per_user_base[users_sorted]
    return np.where(flag, rank, 1 << 30)


def generate(out_dir: str, n_users: int = 5000, n_items: int = 2000,
             k_clusters: int = 20, seed: int = 0, sharp: bool = False,
             cold: float = 0.0):
    """``sharp=True`` is the high-signal quality instrument (VERDICT r2):
    ~50-item clusters, 95% own-cluster interactions, Zipf popularity
    inside each cluster, and the held-out pairs drawn from the
    *own-cluster* interactions only — so the learnable ceiling is high
    and model separation (lgcn vs ltr vs cached) is measurable above
    seed noise.  Default (sharp=False) regenerates existing datasets
    byte-identically.

    ``cold > 0`` (sharp only) additionally builds a **cold-start text
    instrument**: that fraction of each cluster's items gets exactly one
    train interaction, every test user gets one held-out own-cluster cold
    pair, and item meta/review texts are drawn from small per-cluster
    template pools — so text embeddings carry cluster identity even under
    the hash-based stub encoder (real category text repeats phrasing the
    same way), while the cold items' graph signal is near zero.  This is
    the instrument on which text-feature models can beat the pure-graph
    base (the reference paper's cold-start story).  Cold item ids are
    written to ``cold_items.txt``."""
    rng = np.random.RandomState(seed)
    if sharp:
        k_clusters = max(20, n_items // 50)
    ucl = rng.randint(0, k_clusters, n_users)
    icl = rng.randint(0, k_clusters, n_items)
    items_by_cl = [np.where(icl == c)[0] for c in range(k_clusters)]
    all_items = np.arange(n_items)

    cold_mask = np.zeros(n_items, bool)
    if sharp and cold > 0:
        draw_pools, cold_mask = _split_cold(rng, items_by_cl, cold)
        if cold_mask.shape[0] < n_items:  # trailing clusters may be empty
            cold_mask = np.pad(cold_mask,
                               (0, n_items - cold_mask.shape[0]))
    else:
        draw_pools = items_by_cl

    if sharp:
        ext_pool = np.where(~cold_mask)[0] if cold_mask.any() else None
        train, test = _generate_sharp(rng, n_users, n_items, k_clusters,
                                      ucl, draw_pools, ext_pool=ext_pool)
        if cold > 0:
            train, test = _add_cold(rng, train, test, ucl, icl, cold_mask,
                                    k_clusters, n_users)
    elif n_users <= 100_000:
        # original per-user loop (kept so existing datasets regenerate
        # byte-identically under the same seed)
        rows = []
        for u in range(n_users):
            own = items_by_cl[ucl[u]]
            n_inter = rng.randint(8, 18)
            n_own = max(int(n_inter * 0.85), 1)
            chosen = list(rng.choice(own, size=min(n_own, len(own)),
                                     replace=False))
            extra = n_inter - len(chosen)
            if extra > 0:
                # clamp for tiny catalogs: choice(n_items, size>n_items,
                # replace=False) raises; unchanged for healthy sizes so
                # existing datasets still regenerate byte-identically
                chosen += list(rng.choice(all_items,
                                          size=min(extra, n_items),
                                          replace=False))
            for i in set(chosen):
                rows.append((f'u{u}', f'i{i}'))
        df = pd.DataFrame(rows, columns=['user_id', 'asin'])
        # users need >= 3 unique interactions to give 2 to test and keep
        # >= 1 in train (only trims users on degenerate tiny catalogs)
        df = df.groupby('user_id').filter(lambda g: len(g) >= 3)
        test = df.groupby('user_id').sample(n=2, random_state=rng)
        train = df.drop(test.index)
    else:
        # vectorized large-scale path: same distribution shape (85%
        # own-cluster / 15% uniform, 8-17 interactions per user) but
        # sampled with replacement + pair dedup — a Python loop over
        # hundreds of thousands of users takes tens of minutes
        n_inter = rng.randint(8, 18, n_users)
        n_own = np.maximum((n_inter * 0.85).astype(int), 1)
        n_ext = n_inter - n_own
        u_own = np.repeat(np.arange(n_users), n_own)
        # own-cluster draws, one vectorized randint per cluster
        i_own = np.empty(len(u_own), np.int64)
        cl_of_draw = ucl[u_own]
        for c in range(k_clusters):
            m = cl_of_draw == c
            pool = items_by_cl[c]
            if len(pool):
                i_own[m] = pool[rng.randint(0, len(pool), int(m.sum()))]
            else:
                i_own[m] = rng.randint(0, n_items, int(m.sum()))
        u_ext = np.repeat(np.arange(n_users), n_ext)
        i_ext = rng.randint(0, n_items, len(u_ext))
        pairs = np.unique(np.stack([np.concatenate([u_own, u_ext]),
                                    np.concatenate([i_own, i_ext])], 1),
                          axis=0)
        # held-out split, vectorized: 2 random pairs per user, but only
        # for users with >= 3 unique pairs (with-replacement + dedup can
        # leave tiny-catalog users with too few — groupby.sample(n=2)
        # would crash and a fully-held-out user would vanish from train)
        perm = rng.permutation(len(pairs))
        p = pairs[perm][np.argsort(pairs[perm][:, 0], kind='stable')]
        starts = np.searchsorted(p[:, 0], np.arange(n_users))
        counts = np.diff(np.append(starts, len(p)))
        rank = np.arange(len(p)) - starts[p[:, 0]]
        is_test = (rank < 2) & (counts[p[:, 0]] >= 3)

        def to_df(arr):
            # C-level string build — a 6M-element Python f-string loop
            # defeats the purpose of this path
            return pd.DataFrame({
                'user_id': 'u' + pd.Series(arr[:, 0]).astype(str),
                'asin': 'i' + pd.Series(arr[:, 1]).astype(str)})

        train = to_df(p[~is_test])
        test = to_df(p[is_test])
    test = test[test.asin.isin(train.asin.unique())
                & test.user_id.isin(train.user_id.unique())]

    os.makedirs(out_dir, exist_ok=True)
    train.to_csv(os.path.join(out_dir, 'train.tsv'), sep='\t', index=False)
    test.to_csv(os.path.join(out_dir, 'test.tsv'), sep='\t', index=False)

    if sharp and cold > 0:
        # per-cluster template pools (4 meta styles, 6 review variants):
        # items of one cluster share whole sentences, so even a sentence-
        # hash encoder maps them to a handful of shared vectors per
        # cluster — the text channel carries cluster identity the way
        # repeated category phrasing does in real catalogs
        style = rng.randint(0, 4, n_items)
        cat_s = pd.Series(icl.astype(str))
        sty_s = pd.Series(style.astype(str))
        meta = pd.DataFrame({
            'asin': 'i' + pd.Series(np.arange(n_items)).astype(str),
            'title': 'category ' + cat_s + ' product line ' + sty_s,
            'description': 'a category ' + cat_s + ' style ' + sty_s
                           + ' item for enthusiasts',
        })
        with open(os.path.join(out_dir, 'cold_items.txt'), 'w') as f:
            f.write('\n'.join(f'i{i}' for i in np.where(cold_mask)[0]))
    else:
        meta = pd.DataFrame({
            'asin': [f'i{i}' for i in range(n_items)],
            'title': [f'product {i} of category {icl[i]} series'
                      for i in range(n_items)],
            'description': [f'a category {icl[i]} item with features '
                            f'{i % 7} and {i % 13} for enthusiasts'
                            for i in range(n_items)],
        })
    meta.to_csv(os.path.join(out_dir, 'meta_synced.tsv'), sep='\t',
                index=False)

    reviews = train.copy()
    item_ids = reviews.asin.str[1:].astype(int)
    if sharp and cold > 0:
        cat = pd.Series(icl[item_ids.to_numpy()].astype(str),
                        index=reviews.index)
        v = pd.Series(rng.randint(0, 6, len(reviews)).astype(str),
                      index=reviews.index)
        reviews['review'] = ('review of a category ' + cat
                             + ' product variant ' + v)
    elif n_users <= 100_000:
        reviews['review'] = [
            f'user {u} review of category {icl[i]} product {i} quality '
            f'{rng.randint(1, 5)}'
            for u, i in zip(reviews.user_id, item_ids)]
    else:
        cat = pd.Series(icl[item_ids.to_numpy()].astype(str),
                        index=reviews.index)
        q = pd.Series(rng.randint(1, 5, len(reviews)).astype(str),
                      index=reviews.index)
        # same format as the loop path ({u} is the full 'u<N>' id)
        reviews['review'] = ('user ' + reviews.user_id
                             + ' review of category ' + cat
                             + ' product ' + item_ids.astype(str)
                             + ' quality ' + q)
    reviews['time'] = rng.randint(1.5e9, 1.6e9, len(reviews))
    reviews['rating'] = rng.randint(1, 6, len(reviews))
    reviews.to_csv(os.path.join(out_dir, 'reviews_text.tsv'), sep='\t',
                   index=False)
    cold_n = int(cold_mask.sum())
    print(f'{out_dir}: {len(train)} train, {len(test)} test, '
          f'{n_users} users, {n_items} items'
          + (f', {cold_n} cold items' if cold_n else ''))


if __name__ == '__main__':
    sharp, cold, argv = False, 0.0, []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == '--sharp':
            sharp = True
        elif a.startswith('--cold'):
            cold = float(a.split('=', 1)[1]) if '=' in a \
                else float(args[i + 1])
            i += 0 if '=' in a else 1
        else:
            argv.append(a)
        i += 1
    out = argv[0] if len(argv) > 0 else 'data/synthetic'
    n_users = int(argv[1]) if len(argv) > 1 else 5000
    n_items = int(argv[2]) if len(argv) > 2 else 2000
    seed = int(argv[3]) if len(argv) > 3 else 0
    generate(out, n_users, n_items, seed=seed, sharp=sharp, cold=cold)
