"""Metrics vs a brute-force per-user implementation (reference
utils.py:11-63 conventions, incl. IDCG = DCG of min(|true|, k) ones)."""

import numpy as np
import pytest

from textgcn_tpu.ops.metrics import calculate_metrics, early_stop


def brute_force(y_pred, y_true, k):
    """Direct transcription of the reference's per-user pandas math."""
    recalls, precisions, hits, ndcgs, f1s = [], [], [], [], []
    for pred, true in zip(y_pred, y_true):
        pred_k = list(pred[:k])
        true_set = set(true)
        inter = [p for p in pred_k if p in true_set]
        rec = len(inter) / len(true)
        prec = len(inter) / k
        recalls.append(rec)
        precisions.append(prec)
        hits.append(1.0 if inter else 0.0)
        rel = np.array([1.0 if p in true_set else 0.0 for p in pred_k])
        disc = 1.0 / np.log2(np.arange(2, k + 2))
        dcg = ((2 ** rel - 1) * disc).sum()
        ones = min(len(true), k)
        ideal = np.concatenate([np.ones(ones), np.zeros(k - ones)])
        idcg = ((2 ** ideal - 1) * disc).sum()
        ndcgs.append(dcg / idcg)
        denom = rec + prec
        f1s.append(0.0 if denom == 0 else 2 * rec * prec / denom)
    return {
        'recall': np.mean(recalls), 'precision': np.mean(precisions),
        'hit': np.mean(hits), 'ndcg': np.mean(ndcgs), 'f1': np.mean(f1s),
    }


def test_metrics_vs_brute_force(rng):
    n_users, n_items = 20, 50
    ks = (3, 5, 10)
    y_pred = np.stack([
        rng.permutation(n_items)[:max(ks)] for _ in range(n_users)])
    y_true = [list(rng.choice(n_items, size=rng.randint(1, 8),
                              replace=False)) for _ in range(n_users)]
    got = calculate_metrics(y_pred, y_true, ks)
    for j, k in enumerate(sorted(ks)):
        want = brute_force(y_pred, y_true, k)
        for m in ('recall', 'precision', 'hit', 'ndcg', 'f1'):
            assert got[m][j] == pytest.approx(want[m], rel=1e-9), (m, k)


def test_metrics_perfect_prediction():
    y_true = [[0, 1, 2], [3, 4]]
    y_pred = np.array([[0, 1, 2, 9, 8], [3, 4, 9, 8, 7]])
    got = calculate_metrics(y_pred, y_true, (5,))
    assert got['recall'][0] == pytest.approx(1.0)
    assert got['hit'][0] == pytest.approx(1.0)
    assert got['ndcg'][0] == pytest.approx(1.0)


def _hist(rows):
    arr = np.array(rows)
    return {m: arr for m in ('recall', 'precision', 'hit', 'ndcg', 'f1')}


def test_early_stop_truth_table():
    # <3 evals: never
    assert not early_stop(_hist([[0.1], [0.2]]))
    # improving: no stop
    assert not early_stop(_hist([[0.1], [0.2], [0.3]]))
    # converged within 1e-4 over last 3
    assert early_stop(_hist([[0.2], [0.2 + 5e-5], [0.2 + 2e-5]]))
    # strictly declining 3 evals
    assert early_stop(_hist([[0.3], [0.2], [0.1]]))
    # declining then rising: no stop
    assert not early_stop(_hist([[0.3], [0.1], [0.2]]))


def test_early_stop_mixed_metrics():
    # one metric declining, another improving -> no stop
    base = _hist([[0.3], [0.2], [0.1]])
    base['ndcg'] = np.array([[0.1], [0.2], [0.3]])
    assert not early_stop(base)


def test_membership_matches_bruteforce_random():
    """Vectorized composite-key membership == per-user brute force."""
    from textgcn_tpu.ops.metrics import _membership_matrix

    rng = np.random.RandomState(3)
    n, width, n_items = 200, 25, 500
    y_pred = np.stack([rng.choice(n_items, width, replace=False)
                       for _ in range(n)])
    y_true = [sorted(rng.choice(n_items, rng.randint(1, 30),
                                replace=False).tolist()) for _ in range(n)]
    rel = _membership_matrix(y_pred, y_true)
    brute = np.zeros_like(rel)
    for u in range(n):
        brute[u] = np.isin(y_pred[u], y_true[u])
    np.testing.assert_array_equal(rel, brute)


def test_metrics_fast_at_scale():
    """100k test users x 40 preds computes in well under 2 s (the old
    per-user loop was a host-side bottleneck at paper scale)."""
    import time

    from textgcn_tpu.ops.metrics import calculate_metrics

    rng = np.random.RandomState(0)
    n, n_items = 100_000, 50_000
    y_pred = rng.randint(0, n_items, (n, 40))
    degrees = rng.randint(1, 20, n)
    y_true = [rng.randint(0, n_items, d).tolist() for d in degrees]

    # this VM's effective CPU speed swings >10x (shared host); calibrate
    # the bound against a similar-magnitude vectorized numpy op so the
    # test measures the ALGORITHM (vectorized vs the old per-user Python
    # loop, which is ~50x slower at this size), not the machine
    t0 = time.perf_counter()
    np.sort((np.arange(4_000_000, dtype=np.int64) * 2654435761)
            % 1000003)
    cal = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = calculate_metrics(y_pred, y_true, (20, 40))
    dt = time.perf_counter() - t0
    assert dt < 2.0 + 60 * cal, \
        f'metrics took {dt:.2f}s (calibration {cal:.2f}s)'
    assert all(np.isfinite(v).all() for v in res.values())
