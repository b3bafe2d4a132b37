"""Masked full-catalog scoring + top-k (reference base_model.py:235-266)."""

import jax.numpy as jnp
import numpy as np

from textgcn_tpu.ops.retrieval import (mask_train_items, merge_topk,
                                       score_and_topk)


def test_mask_train_items(rng):
    b, n_items, max_deg = 4, 12, 3
    scores = rng.randn(b, n_items).astype(np.float32)
    pos = np.full((b, max_deg), n_items, dtype=np.int32)
    pos[0, :2] = [1, 5]
    pos[1, :1] = [0]
    pos[2, :3] = [2, 3, 4]
    masked = np.asarray(mask_train_items(
        jnp.asarray(scores), jnp.asarray(pos), n_items))
    assert np.isneginf(masked[0, 1]) and np.isneginf(masked[0, 5])
    assert np.isneginf(masked[1, 0])
    assert np.isneginf(masked[2, 2:5]).all()
    # row 3: nothing masked
    assert not np.isneginf(masked[3]).any()
    # unmasked entries untouched
    keep = ~np.isneginf(masked)
    np.testing.assert_array_equal(masked[keep], scores[keep])


def test_score_and_topk_vs_numpy(rng):
    b, n_items, d, k = 5, 20, 8, 4
    ue = rng.randn(b, d).astype(np.float32)
    ie = rng.randn(n_items, d).astype(np.float32)
    pos = np.full((b, 3), n_items, dtype=np.int32)
    pos[0, :2] = [0, 1]
    vals, idx = score_and_topk(jnp.asarray(ue), jnp.asarray(ie),
                               jnp.asarray(pos), k=k, n_items=n_items)
    vals, idx = np.asarray(vals), np.asarray(idx)
    scores = ue @ ie.T
    scores[0, [0, 1]] = -np.inf
    for r in range(b):
        want = np.argsort(-scores[r])[:k]
        np.testing.assert_array_equal(idx[r], want)
        np.testing.assert_allclose(vals[r], scores[r][want], rtol=1e-5)


def test_merge_topk(rng):
    n_shards, b, k = 4, 3, 5
    vals = rng.randn(n_shards, b, k).astype(np.float32)
    # simulate per-shard sorted descending
    vals = -np.sort(-vals, axis=2)
    idx = rng.randint(0, 1000, size=(n_shards, b, k)).astype(np.int32)
    mv, mi = merge_topk(jnp.asarray(vals), jnp.asarray(idx), k)
    mv, mi = np.asarray(mv), np.asarray(mi)
    for r in range(b):
        flat_v = vals[:, r, :].reshape(-1)
        flat_i = idx[:, r, :].reshape(-1)
        order = np.argsort(-flat_v)[:k]
        np.testing.assert_allclose(mv[r], flat_v[order], rtol=1e-6)
        np.testing.assert_array_equal(mi[r], flat_i[order])


def test_blocked_exact_topk_matches_monolithic(rng, monkeypatch):
    """Opt-in blocked top-k == lax.top_k exactly (distinct scores)."""
    import jax
    import jax.numpy as jnp

    from textgcn_tpu.ops import retrieval as R

    scores = jnp.asarray(
        rng.permutation(40_000 * 4).reshape(4, 40_000).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(scores, 40)
    monkeypatch.setenv('TEXTGCN_TPU_BLOCKED_TOPK', '1')
    v, i = R.exact_top_k(scores, 40)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    # non-multiple-of-block catalog width (exercises -inf padding)
    scores = jnp.asarray(rng.permutation(13_777 * 3).reshape(3, 13_777)
                         .astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(scores, 25)
    v, i = R.exact_top_k(scores, 25)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_approx_topk_env_optin(rng, monkeypatch):
    """TEXTGCN_TPU_APPROX_TOPK routes through lax.approx_max_k (exact on
    CPU, so results match; on TPU it trades recall for speed)."""
    import jax

    from textgcn_tpu.ops import retrieval as R

    scores = jnp.asarray(rng.randn(4, 5000).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(scores, 10)
    monkeypatch.setenv('TEXTGCN_TPU_APPROX_TOPK', '0.95')
    v, i = R.catalog_top_k(scores, 10)
    assert v.shape == (4, 10) and i.shape == (4, 10)
    # every returned item must be a genuine catalog item with its true score
    np.testing.assert_allclose(
        np.asarray(v),
        np.take_along_axis(np.asarray(scores), np.asarray(i), axis=1))
    # bad values of the env fall back to exact
    monkeypatch.setenv('TEXTGCN_TPU_APPROX_TOPK', 'nope')
    v2, i2 = R.catalog_top_k(scores, 10)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v_ref))


def test_mining_topk_small_catalog_exact_and_env(rng, monkeypatch):
    """mining_top_k: exact below the 4096 threshold and under
    TEXTGCN_TPU_ADV_TOPK=exact; approx path returns true (value, id)
    pairs sorted descending."""
    import jax

    from textgcn_tpu.ops import retrieval as R

    small = jnp.asarray(rng.randn(4, 512).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(small, 8)
    v, i = R.mining_top_k(small, 8)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    big = jnp.asarray(rng.randn(4, 8192).astype(np.float32))
    monkeypatch.setenv('TEXTGCN_TPU_ADV_TOPK', 'exact')
    v_ref, i_ref = jax.lax.top_k(big, 16)
    v, i = R.mining_top_k(big, 16)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    monkeypatch.delenv('TEXTGCN_TPU_ADV_TOPK')
    v, i = R.mining_top_k(big, 16)
    assert v.shape == (4, 16) and i.shape == (4, 16)
    vn, idx = np.asarray(v), np.asarray(i)
    # genuine (value, id) pairs, sorted descending
    np.testing.assert_allclose(
        vn, np.take_along_axis(np.asarray(big), idx, axis=1))
    assert (np.diff(vn, axis=1) <= 1e-6).all()


def test_explicit_approx_argument(rng):
    """The serving API accepts approx= explicitly (distinct jit cache
    entries per recall, no env dependence)."""
    from textgcn_tpu.ops import retrieval as R

    users = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    items = jnp.asarray(rng.randn(5000, 8).astype(np.float32))
    pos = jnp.asarray(rng.randint(0, 5000, (4, 3)).astype(np.int32))
    v_ex, i_ex = R.score_and_topk(users, items, pos, k=10, n_items=5000)
    v_ap, i_ap = R.score_and_topk(users, items, pos, k=10, n_items=5000,
                                  approx=0.95)
    assert v_ap.shape == v_ex.shape and i_ap.shape == i_ex.shape
    # returned pairs are genuine masked scores (serving mode emits bf16
    # scores, so compare at bf16 tolerance)
    scores = np.array(users @ items.T)
    rows = np.arange(4)[:, None]
    scores[rows, np.asarray(pos)] = -np.inf
    np.testing.assert_allclose(
        np.asarray(v_ap),
        np.take_along_axis(scores, np.asarray(i_ap), axis=1),
        rtol=1e-2, atol=1e-2)
