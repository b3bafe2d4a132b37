"""Data layer: adjacency normalization vs dense oracle, id remap, positives."""

import numpy as np
import pytest

from textgcn_tpu.data.core import dense_normalized_adjacency, load_interactions


def test_counts(dummy_data):
    d = dummy_data
    assert d.n_users == 12
    assert d.n_items == 10
    assert d.n_train == len(d.train_df)
    assert d.graph.n_edges == d.n_train


def test_normalization_vs_dense_oracle(dummy_data):
    """Edge weights must equal the D^-1/2 (A+A^T) D^-1/2 entries
    (reference dataset.py:122-138 semantics)."""
    g = dummy_data.graph
    dense = dense_normalized_adjacency(g)
    # user->item block
    for e in range(g.n_edges):
        u, i, w = g.edge_user[e], g.edge_item[e], g.edge_weight[e]
        assert dense[u, g.n_users + i] == pytest.approx(w, rel=1e-6)
        assert dense[g.n_users + i, u] == pytest.approx(w, rel=1e-6)
    # weight formula
    expected = 1.0 / np.sqrt(
        g.user_degree[g.edge_user] * g.item_degree[g.edge_item])
    np.testing.assert_allclose(g.edge_weight, expected, rtol=1e-6)


def test_padded_positives(dummy_data):
    d = dummy_data
    for u in range(d.n_users):
        deg = d.pos_degree[u]
        row = d.pos_padded[u]
        true_items = sorted(
            d.train_df[d.train_df.user_id == u].asin.tolist())
        assert row[:deg].tolist() == true_items
        assert (row[deg:] == d.n_items).all()
        assert (np.diff(row) >= 0).all(), 'rows must be sorted'


def test_test_users_and_truth(dummy_data):
    d = dummy_data
    assert (np.diff(d.test_users) > 0).all()
    assert len(d.true_test) == len(d.test_users)
    for u, truth in zip(d.test_users, d.true_test):
        expected = sorted(d.test_df[d.test_df.user_id == u].asin.tolist())
        assert sorted(truth) == expected


def test_id_roundtrip(dummy_data):
    d = dummy_data
    assert d.user_id_map[0].startswith('user_')
    assert d.item_id_map[0].startswith('asin_')
    assert len(d.user_id_map) == d.n_users
    assert len(d.item_id_map) == d.n_items


def test_reshuffle(tmp_path, dummy_dir):
    import shutil
    work = tmp_path / 'dummy'
    shutil.copytree(dummy_dir, work)
    d = load_interactions(str(work), reshuffle=True, seed=3)
    assert (work / 'reshuffle_3' / 'train.tsv').exists()
    assert d.n_train > 0 and d.n_test > 0
    # deterministic: loading again gives identical split
    d2 = load_interactions(str(work), reshuffle=True, seed=3)
    assert d.n_train == d2.n_train and d.n_test == d2.n_test
