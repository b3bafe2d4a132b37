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
