"""Native C++ graph-builder vs numpy/pandas reference implementations."""

import numpy as np
import pytest

from textgcn_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library not built')


def test_tsv_parse_matches_pandas(dummy_dir, dummy_data):
    eu, ei, uids, iids = native.parse_interactions_tsv(
        f'{dummy_dir}/train.tsv')
    d = dummy_data
    np.testing.assert_array_equal(eu, d.graph.edge_user)
    np.testing.assert_array_equal(ei, d.graph.edge_item)
    assert uids == [d.user_id_map[i] for i in range(d.n_users)]
    assert iids == [d.item_id_map[i] for i in range(d.n_items)]


def test_build_graph_matches(dummy_data):
    d = dummy_data
    du, di, w = native.build_graph(d.graph.edge_user, d.graph.edge_item,
                                   d.n_users, d.n_items)
    np.testing.assert_array_equal(du, d.graph.user_degree)
    np.testing.assert_array_equal(di, d.graph.item_degree)
    np.testing.assert_allclose(w, d.graph.edge_weight, rtol=1e-6)


def test_tile_layout_matches_numpy(rng, monkeypatch):
    """C++ layout must be byte-identical to the numpy construction."""
    from textgcn_tpu.ops import pallas_spmm as P

    e, ni, nu = 4000, 900, 2100
    src = rng.randint(0, ni, e).astype(np.int32)
    dst = rng.randint(0, nu, e).astype(np.int32)
    w = rng.rand(e).astype(np.float32)

    cpp = P.PallasDirection(src, dst, w, ni, nu)
    monkeypatch.setattr(native, 'available', lambda: False)
    ref = P.PallasDirection(src, dst, w, ni, nu)

    assert cpp.n_chunks == ref.n_chunks
    assert cpp.max_groups == ref.max_groups
    np.testing.assert_array_equal(np.asarray(cpp.group_ptr),
                                  np.asarray(ref.group_ptr))
    np.testing.assert_array_equal(np.asarray(cpp.packed),
                                  np.asarray(ref.packed))
    np.testing.assert_array_equal(np.asarray(cpp.w), np.asarray(ref.w))
    np.testing.assert_array_equal(np.asarray(cpp.chunk_sb),
                                  np.asarray(ref.chunk_sb))
    np.testing.assert_array_equal(np.asarray(cpp.dst_ids),
                                  np.asarray(ref.dst_ids))
    np.testing.assert_array_equal(np.asarray(cpp.src_ids),
                                  np.asarray(ref.src_ids))


def test_tile_layout_empty():
    from textgcn_tpu.ops import pallas_spmm as P
    d = P.PallasDirection(np.zeros(0, np.int32), np.zeros(0, np.int32),
                          np.zeros(0, np.float32), 512, 512)
    assert d.n_chunks >= 1  # one empty group, kernel runs no work


def test_load_interactions_native_equals_pandas(dummy_dir, monkeypatch):
    """The production load path through the C++ parser is byte-identical
    to the pandas path for every derived structure."""
    import numpy as np

    from textgcn_tpu import native
    from textgcn_tpu.data.core import load_interactions

    if not native.available():
        import pytest
        pytest.skip('native lib unavailable')

    d_nat = load_interactions(str(dummy_dir))
    monkeypatch.setenv('TEXTGCN_TPU_NATIVE', '0')
    d_pd = load_interactions(str(dummy_dir))

    assert (d_nat.n_users, d_nat.n_items, d_nat.n_train, d_nat.n_test) \
        == (d_pd.n_users, d_pd.n_items, d_pd.n_train, d_pd.n_test)
    np.testing.assert_array_equal(d_nat.graph.edge_user,
                                  d_pd.graph.edge_user)
    np.testing.assert_array_equal(d_nat.graph.edge_item,
                                  d_pd.graph.edge_item)
    np.testing.assert_array_equal(d_nat.graph.edge_weight,
                                  d_pd.graph.edge_weight)
    np.testing.assert_array_equal(d_nat.pos_padded, d_pd.pos_padded)
    np.testing.assert_array_equal(d_nat.test_users, d_pd.test_users)
    assert d_nat.true_test == d_pd.true_test
    assert d_nat.user_id_map == d_pd.user_id_map
    assert d_nat.item_id_map == d_pd.item_id_map
    assert d_nat.train_df.user_id.tolist() == d_pd.train_df.user_id.tolist()
    assert d_nat.train_df.asin.tolist() == d_pd.train_df.asin.tolist()
    assert d_nat.test_df.user_id.tolist() == d_pd.test_df.user_id.tolist()


def test_native_parser_rejects_malformed(tmp_path):
    """Malformed rows (no tab / extra column / empty field) return None
    instead of silently dropping or fusing rows; blank lines are fine."""
    from textgcn_tpu import native

    if not native.available():
        import pytest
        pytest.skip('native lib unavailable')

    def parse(content):
        p = tmp_path / 'x.tsv'
        p.write_text(content)
        return native.parse_interactions_tsv(str(p))

    ok = parse('user_id\tasin\nu1\ti1\n\nu2\ti2\n')  # blank line mid-file
    assert ok is not None and len(ok[0]) == 2
    assert parse('user_id\tasin\nu1\ti1\nnotabhere\n') is None
    assert parse('user_id\tasin\nu1\ti1\textra\n') is None
    assert parse('user_id\tasin\n\ti1\n') is None     # empty user
    assert parse('user_id\tasin\nu1\t\n') is None     # empty item
