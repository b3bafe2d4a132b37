"""Synthetic-data generator: legacy determinism + the sharp instrument.

The ``--sharp`` mode is the round-3 quality instrument (tighter
clusters, Zipf in-cluster popularity, own-cluster held-out pairs) used
for the RESULTS.md model-separation table; these tests pin its
contract.
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(repo, 'tools'))

from make_synthetic import generate  # noqa: E402


def _load(out):
    tr = pd.read_csv(os.path.join(out, 'train.tsv'), sep='\t')
    te = pd.read_csv(os.path.join(out, 'test.tsv'), sep='\t')
    meta = pd.read_csv(os.path.join(out, 'meta_synced.tsv'), sep='\t')
    return tr, te, meta


def _item_cluster(meta):
    """Recover each item's cluster from the generated meta text."""
    cl = meta.title.str.extract(r'category (\d+)')[0].astype(int)
    return dict(zip(meta.asin, cl))


def test_legacy_mode_deterministic(tmp_path):
    a, b = str(tmp_path / 'a'), str(tmp_path / 'b')
    generate(a, n_users=120, n_items=60, k_clusters=5, seed=3)
    generate(b, n_users=120, n_items=60, k_clusters=5, seed=3)
    for f in ('train.tsv', 'test.tsv', 'meta_synced.tsv'):
        assert (open(os.path.join(a, f)).read()
                == open(os.path.join(b, f)).read())


def test_sharp_holds_out_own_cluster_pairs(tmp_path):
    out = str(tmp_path / 'sharp')
    generate(out, n_users=400, n_items=500, seed=1, sharp=True)
    tr, te, meta = _load(out)
    icl = _item_cluster(meta)

    # 2 held-out pairs per test user (a small tail of users is filtered
    # when the holdout would leave their cluster unidentifiable or the
    # held item never appears in train), all users retained in train
    per_user = te.groupby('user_id').size()
    assert (per_user <= 2).all()
    assert (per_user == 2).mean() >= 0.9
    assert set(te.user_id) <= set(tr.user_id)
    assert set(te.asin) <= set(tr.asin)

    # the held-out pairs are own-cluster: they match the user's majority
    # train cluster (the learnable signal — not the 5% uniform noise)
    ucl = (tr.assign(cl=tr.asin.map(icl)).groupby('user_id').cl
           .agg(lambda s: s.mode().iloc[0]))
    te_cl = te.asin.map(icl)
    own = (te_cl.to_numpy() == ucl[te.user_id].to_numpy())
    assert own.mean() >= 0.95

    # each test user keeps >= 2 own-cluster pairs in train (cluster
    # stays identifiable after the holdout)
    tr_own = (tr.assign(cl=tr.asin.map(icl))
              .groupby('user_id')
              .apply(lambda g: (g.cl == g.cl.mode().iloc[0]).sum(),
                     include_groups=False))
    assert (tr_own[per_user.index] >= 2).all()


def test_sharp_zipf_popularity_skew(tmp_path):
    """In-cluster interaction counts must be skewed (Zipf), giving the
    popularity feature signal: the top item of a cluster should see many
    times the interactions of the median item."""
    out = str(tmp_path / 'sharp2')
    # realistic cluster size (~50 items, ~75 users per cluster): pair
    # dedup caps per-user contributions, so skew needs enough users
    generate(out, n_users=1500, n_items=1000, seed=2, sharp=True)
    tr, _, meta = _load(out)
    icl = _item_cluster(meta)
    counts = tr.groupby('asin').size()
    cl = pd.Series({a: icl[a] for a in counts.index})
    ratios = []
    for c, grp in counts.groupby(cl):
        if len(grp) >= 10:
            ratios.append(grp.max() / max(grp.median(), 1))
    assert np.median(ratios) > 2.0


def test_cold_mode_contract(tmp_path):
    """``--cold`` instrument: every cold item has exactly one train
    interaction, test users gain one own-cluster cold pair, no
    train/test pair overlap, and item/review texts come from small
    per-cluster template pools (shared sentences -> the hash stub
    encoder maps a cluster to a handful of shared vectors)."""
    out = str(tmp_path / 'cold')
    generate(out, n_users=800, n_items=400, seed=0, sharp=True, cold=0.15)
    tr, te, meta = _load(out)
    icl = _item_cluster(meta)
    with open(os.path.join(out, 'cold_items.txt')) as f:
        cold = set(f.read().split())
    assert len(cold) > 0

    # exactly one train interaction per cold item, none held fully out
    cold_counts = tr[tr.asin.isin(cold)].groupby('asin').size()
    assert set(cold_counts.index) == cold
    assert (cold_counts == 1).all()

    # no (user, item) pair appears in both train and test
    assert len(pd.merge(tr, te)) == 0

    # most test users carry exactly one cold held-out pair, own-cluster
    te_cold = te[te.asin.isin(cold)]
    per_user = te_cold.groupby('user_id').size()
    assert (per_user == 1).all()
    assert len(per_user) >= 0.9 * te.user_id.nunique()
    ucl = (tr.assign(cl=tr.asin.map(icl)).groupby('user_id').cl
           .agg(lambda s: s.mode().iloc[0]))
    assert (te_cold.asin.map(icl).to_numpy()
            == ucl[te_cold.user_id].to_numpy()).all()

    # pooled texts: each cluster's items use <= 4 distinct meta texts,
    # and reviews use <= 6 distinct texts per cluster
    meta_text = meta.title + ' ' + meta.description
    per_cl = meta_text.groupby(meta.asin.map(icl)).nunique()
    assert (per_cl <= 4).all()
    rv = pd.read_csv(os.path.join(out, 'reviews_text.tsv'), sep='\t')
    rv_cl = rv.asin.map(icl)
    assert (rv.review.groupby(rv_cl).nunique() <= 6).all()
