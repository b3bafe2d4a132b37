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


def _generate_sharp(rng, n_users, n_items, k_clusters, ucl, items_by_cl):
    """Vectorized high-signal generator: 95% own-cluster draws, Zipf
    (rank^-1) popularity within each cluster, 12-24 interactions per
    user, 2 own-cluster pairs per user held out."""
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
    i_ext = rng.randint(0, n_items, len(u_ext))

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
             k_clusters: int = 20, seed: int = 0, sharp: bool = False):
    """``sharp=True`` is the high-signal quality instrument (VERDICT r2):
    ~50-item clusters, 95% own-cluster interactions, Zipf popularity
    inside each cluster, and the held-out pairs drawn from the
    *own-cluster* interactions only — so the learnable ceiling is high
    and model separation (lgcn vs ltr vs cached) is measurable above
    seed noise.  Default (sharp=False) regenerates existing datasets
    byte-identically."""
    rng = np.random.RandomState(seed)
    if sharp:
        k_clusters = max(20, n_items // 50)
    ucl = rng.randint(0, k_clusters, n_users)
    icl = rng.randint(0, k_clusters, n_items)
    items_by_cl = [np.where(icl == c)[0] for c in range(k_clusters)]
    all_items = np.arange(n_items)

    if sharp:
        train, test = _generate_sharp(rng, n_users, n_items, k_clusters,
                                      ucl, items_by_cl)
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
    if n_users <= 100_000:
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
    print(f'{out_dir}: {len(train)} train, {len(test)} test, '
          f'{n_users} users, {n_items} items')


if __name__ == '__main__':
    argv = [a for a in sys.argv[1:] if a != '--sharp']
    sharp = '--sharp' in sys.argv[1:]
    out = argv[0] if len(argv) > 0 else 'data/synthetic'
    n_users = int(argv[1]) if len(argv) > 1 else 5000
    n_items = int(argv[2]) if len(argv) > 2 else 2000
    seed = int(argv[3]) if len(argv) > 3 else 0
    generate(out, n_users, n_items, seed=seed, sharp=sharp)
