"""Preprocessing pipeline on synthetic raw JSON (reference
data/process_data.py behaviors: cleaning, 5-core, sync, split)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from textgcn_tpu.data.preprocess import (clean_text, core_n, main,
                                         process_metadata, sync,
                                         train_test_split)


def test_clean_text():
    assert clean_text('<b>Hello &amp; world</b> test') == 'Hello & world test'
    assert clean_text('café crème dessert') == 'cafe creme dessert'
    assert clean_text('hi') == ''            # <= 5 chars dropped
    assert clean_text(None) == ''
    assert clean_text('...leading punct kept-clean') == \
        'leading punct kept-clean'
    # tabs are stripped by the non-printable filter BEFORE whitespace
    # collapse (same order as the reference, process_data.py:57-58)
    assert clean_text('multi   space\t\ttext_here') == 'multi spacetext here'


def test_core_n():
    df = pd.DataFrame({
        'user_id': ['u1'] * 3 + ['u2'] * 3 + ['u3'],
        'asin': ['a', 'b', 'c', 'a', 'b', 'c', 'a'],
    })
    out = core_n(df, n=2)
    assert 'u3' not in out.user_id.values
    # u1/u2 each have 3 >= 2; a,b,c each have >= 2 after u3 removed
    assert set(out.user_id) == {'u1', 'u2'}
    assert len(out) == 6


def _write_raw(tmp_path, n_users=40, n_items=20, seed=0):
    rng = np.random.RandomState(seed)
    domain = tmp_path / 'toys'
    domain.mkdir()
    with open(domain / 'meta_toys.json', 'w') as f:
        for i in range(n_items):
            f.write(json.dumps({
                'asin': f'A{i}',
                'title': f'toy number {i} with a name',
                'description': [f'a wonderful toy number {i}',
                                'extra details included'],
            }) + '\n')
    with open(domain / 'toys.json', 'w') as f:
        for u in range(n_users):
            # dense enough to survive the 13-core sync
            items = rng.choice(n_items, size=rng.randint(14, n_items),
                               replace=False)
            for i in items:
                f.write(json.dumps({
                    'reviewerID': f'U{u}',
                    'asin': f'A{i}',
                    'reviewText': f'review of toy {i} by user {u} is long',
                    'unixReviewTime': int(1.5e9 + rng.randint(0, 1e6)),
                    'overall': int(rng.randint(1, 6)),
                }) + '\n')
    return domain


def test_full_pipeline(tmp_path):
    domain = _write_raw(tmp_path)
    main([str(domain), '3'])
    for name in ('meta_synced.tsv', 'reviews_text.tsv', 'train.tsv',
                 'test.tsv'):
        assert (domain / name).exists(), name
    train = pd.read_table(domain / 'train.tsv')
    test = pd.read_table(domain / 'test.tsv')
    reviews = pd.read_table(domain / 'reviews_text.tsv')
    meta = pd.read_table(domain / 'meta_synced.tsv')
    # synced: same asin universe
    assert set(meta.asin) == set(reviews.asin)
    # every test user also in train
    assert set(test.user_id) <= set(train.user_id)
    # 13-core holds on the synced reviews
    assert reviews.groupby('user_id').size().min() >= 13 or len(reviews) == 0
    # split ratio roughly 80/20
    ratio = len(train) / (len(train) + len(test))
    assert 0.7 < ratio < 0.9
