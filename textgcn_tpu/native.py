"""ctypes bindings for the native graph-builder (native/graphbuild.cpp).

Provides drop-in accelerated versions of the host-side hot paths:

* ``parse_interactions_tsv`` — TSV -> dense-id edge arrays + external id
  tables (reference ``dataset.py:45-98`` semantics);
* ``build_graph`` — degrees + symmetric-normalized edge weights;
* ``tile_layout`` — the Pallas SpMM chunk/group layout
  (``ops/pallas_spmm.PallasDirection``'s numpy construction).

Every entry point has a numpy fallback at its call site; ``available()``
reports whether the shared library loaded.  Build with ``make -C native``;
``ensure_built()`` attempts that automatically once.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger('textgcn_tpu')

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native')
_SO_PATH = os.path.join(_NATIVE_DIR, 'libgraphbuild.so')


def ensure_built() -> bool:
    """Build the shared library if missing; returns availability."""
    global _LIB, _TRIED
    if _LIB is not None:
        return True
    if _TRIED:
        return False
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            log.warning('native graphbuild unavailable (%s); using numpy '
                        'fallbacks', e)
            return False
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        log.warning('failed to load %s: %s', _SO_PATH, e)
        return False

    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    lib.tsv_parse_interactions.restype = ctypes.c_void_p
    lib.tsv_parse_interactions.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.parsed_n_rows.restype = ctypes.c_int64
    lib.parsed_n_rows.argtypes = [ctypes.c_void_p]
    lib.parsed_n_users.restype = ctypes.c_int64
    lib.parsed_n_users.argtypes = [ctypes.c_void_p]
    lib.parsed_n_items.restype = ctypes.c_int64
    lib.parsed_n_items.argtypes = [ctypes.c_void_p]
    lib.parsed_copy_edges.argtypes = [ctypes.c_void_p, c_i32p, c_i32p]
    lib.parsed_ids_size.restype = ctypes.c_int64
    lib.parsed_ids_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.parsed_copy_ids.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_char_p]
    lib.parsed_free.argtypes = [ctypes.c_void_p]
    lib.build_graph.argtypes = [c_i32p, c_i32p, ctypes.c_int64,
                                ctypes.c_int32, ctypes.c_int32,
                                c_i32p, c_i32p, c_f32p]
    lib.tile_layout_build.restype = ctypes.c_void_p
    lib.tile_layout_build.argtypes = [
        c_i32p, c_i32p, c_f32p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32]
    lib.layout_n_chunks.restype = ctypes.c_int64
    lib.layout_n_chunks.argtypes = [ctypes.c_void_p]
    lib.layout_max_groups.restype = ctypes.c_int32
    lib.layout_max_groups.argtypes = [ctypes.c_void_p]
    lib.layout_copy.argtypes = [ctypes.c_void_p, c_i32p, c_f32p, c_i32p,
                                c_i32p, c_i32p, c_i32p]
    lib.layout_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return True


def available() -> bool:
    if os.environ.get('TEXTGCN_TPU_NATIVE', '') == '0':
        return False
    return ensure_built()


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def parse_interactions_tsv(path: str):
    """Returns (edge_user, edge_item, user_ids, item_ids) with dense ids
    assigned in (string-sorted rows, first appearance) order, or ``None``
    when the file is malformed (missing/extra column or empty field on
    any row) — callers fall back to pandas, which raises a descriptive
    error of its own."""
    assert ensure_built()
    with open(path, 'rb') as f:
        buf = f.read()
    h = _LIB.tsv_parse_interactions(buf, len(buf))
    if not h:
        return None
    try:
        n = _LIB.parsed_n_rows(h)
        eu = np.empty(n, np.int32)
        ei = np.empty(n, np.int32)
        _LIB.parsed_copy_edges(h, _i32p(eu), _i32p(ei))
        ids = []
        for which in (0, 1):
            size = _LIB.parsed_ids_size(h, which)
            raw = ctypes.create_string_buffer(int(size))
            _LIB.parsed_copy_ids(h, which, raw)
            ids.append(raw.raw[:size].decode('utf-8').split('\n')[:-1])
        return eu, ei, ids[0], ids[1]
    finally:
        _LIB.parsed_free(h)


def build_graph(edge_user: np.ndarray, edge_item: np.ndarray,
                n_users: int, n_items: int):
    """Returns (user_degree, item_degree, edge_weight)."""
    assert ensure_built()
    eu = np.ascontiguousarray(edge_user, np.int32)
    ei = np.ascontiguousarray(edge_item, np.int32)
    du = np.empty(n_users, np.int32)
    di = np.empty(n_items, np.int32)
    w = np.empty(len(eu), np.float32)
    _LIB.build_graph(_i32p(eu), _i32p(ei), len(eu), n_users, n_items,
                     _i32p(du), _i32p(di), _f32p(w))
    return du, di, w


def tile_layout(src, dst, w, n_src_padded: int, n_dst: int,
                dst_block: int, src_block: int, chunk: int, group: int):
    """Returns (packed, w, sb, group_ptr, max_groups, dst_ids, src_ids)
    matching PallasDirection's numpy construction."""
    assert ensure_built()
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    w = np.ascontiguousarray(w, np.float32)
    n_dst_blocks = max(1, -(-int(n_dst) // dst_block))
    h = _LIB.tile_layout_build(_i32p(src), _i32p(dst), _f32p(w), len(src),
                               n_src_padded, n_dst, dst_block, src_block,
                               chunk, group)
    try:
        n_chunks = _LIB.layout_n_chunks(h)
        max_groups = _LIB.layout_max_groups(h)
        packed = np.empty(n_chunks * chunk, np.int32)
        w_out = np.empty(n_chunks * chunk, np.float32)
        sb = np.empty(n_chunks, np.int32)
        gptr = np.empty(n_dst_blocks + 1, np.int32)
        dst_ids = np.empty(n_chunks * chunk, np.int32)
        src_ids = np.empty(n_chunks * chunk, np.int32)
        _LIB.layout_copy(h, _i32p(packed), _f32p(w_out), _i32p(sb),
                         _i32p(gptr), _i32p(dst_ids), _i32p(src_ids))
        return (packed, w_out, sb, gptr, int(max_groups), dst_ids,
                src_ids)
    finally:
        _LIB.layout_free(h)
