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
