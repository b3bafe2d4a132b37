"""On-device epoch sampler (reference dataset.py:167-193 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from textgcn_tpu.ops.sampling import batch_epoch, sample_epoch


def _sets(dummy_data):
    d = dummy_data
    return [set(d.pos_padded[u][:d.pos_degree[u]].tolist())
            for u in range(d.n_users)]


def test_shapes_and_bucket_semantics(dummy_data):
    d = dummy_data
    users, pos, negs = sample_epoch(
        jax.random.key(0), jnp.asarray(d.pos_padded),
        jnp.asarray(d.pos_degree), bucket_len=d.bucket_len,
        neg_samples=2, n_items=d.n_items)
    n = d.bucket_len * d.n_users
    assert users.shape == (n,)
    assert pos.shape == (n,)
    assert negs.shape == (n, 2)
    # uniform-user buckets (SURVEY.md Q7): every user appears exactly
    # bucket_len times
    counts = np.bincount(np.asarray(users), minlength=d.n_users)
    assert (counts == d.bucket_len).all()


def test_positives_are_positives_negatives_are_not(dummy_data):
    d = dummy_data
    pos_sets = _sets(d)
    for seed in range(5):
        users, pos, negs = sample_epoch(
            jax.random.key(seed), jnp.asarray(d.pos_padded),
            jnp.asarray(d.pos_degree), bucket_len=d.bucket_len,
            neg_samples=3, n_items=d.n_items)
        users, pos, negs = map(np.asarray, (users, pos, negs))
        for j in range(len(users)):
            u = users[j]
            assert pos[j] in pos_sets[u]
            for ng in negs[j]:
                assert 0 <= ng < d.n_items
                assert ng not in pos_sets[u], \
                    f'negative {ng} is a positive of user {u}'


def test_batching_mask(dummy_data):
    d = dummy_data
    users, pos, negs = sample_epoch(
        jax.random.key(1), jnp.asarray(d.pos_padded),
        jnp.asarray(d.pos_degree), bucket_len=d.bucket_len,
        neg_samples=1, n_items=d.n_items)
    bs = 16
    bu, bp, bn, bm = batch_epoch(users, pos, negs, batch_size=bs)
    n = users.shape[0]
    assert bu.shape[1] == bs
    assert int(np.asarray(bm).sum()) == n
    # all true samples preserved
    flat_u = np.asarray(bu).reshape(-1)[np.asarray(bm).reshape(-1)]
    np.testing.assert_array_equal(np.sort(flat_u), np.sort(np.asarray(users)))


def test_sampling_is_seeded(dummy_data):
    d = dummy_data
    args = (jnp.asarray(d.pos_padded), jnp.asarray(d.pos_degree))
    kw = dict(bucket_len=d.bucket_len, neg_samples=1, n_items=d.n_items)
    a = sample_epoch(jax.random.key(5), *args, **kw)
    b = sample_epoch(jax.random.key(5), *args, **kw)
    c = sample_epoch(jax.random.key(6), *args, **kw)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, c))


def test_fallback_never_emits_positive_for_dense_user():
    """A user owning a long contiguous run of item ids (denser than the
    catalog minus one) forces the rejection fallback; the exact complement
    bisection must return the single valid negative, never a positive."""
    n_items = 100
    # user 0 owns items 0..98 (contiguous run); only valid negative is 99
    deg = n_items - 1
    pos_padded = np.full((2, deg), n_items, np.int32)
    pos_padded[0, :] = np.arange(deg)
    pos_padded[1, :3] = [1, 5, 7]
    pos_degree = np.asarray([deg, 3], np.int32)
    for seed in range(6):
        users, pos, negs = sample_epoch(
            jax.random.key(seed), jnp.asarray(pos_padded),
            jnp.asarray(pos_degree), bucket_len=8, neg_samples=2,
            n_items=n_items)
        users, negs = np.asarray(users), np.asarray(negs)
        assert (negs[users == 0] == deg).all(), \
            'dense user got a positive as negative'
        u1 = negs[users == 1].ravel()
        assert not np.isin(u1, [1, 5, 7]).any()
        assert ((negs >= 0) & (negs < n_items)).all()


def test_fallback_is_uniform_over_complement():
    """The bisection fallback draws uniformly from the complement set."""
    from textgcn_tpu.ops import sampling as S
    n_items = 64
    deg = 60  # positives 0..59 -> complement {60, 61, 62, 63}
    pos_padded = np.full((1, deg), n_items, np.int32)
    pos_padded[0, :] = np.arange(deg)
    pos_degree = np.asarray([deg], np.int32)
    draws = []
    for seed in range(30):
        _, _, negs = sample_epoch(
            jax.random.key(seed), jnp.asarray(pos_padded),
            jnp.asarray(pos_degree), bucket_len=16, neg_samples=1,
            n_items=n_items)
        draws.append(np.asarray(negs).ravel())
    draws = np.concatenate(draws)
    assert (draws >= deg).all()
    counts = np.bincount(draws - deg, minlength=4)
    # 480 draws over 4 items: each should be well-populated
    assert (counts > 60).all(), counts
