"""Interaction dataset: TSV ingestion, id remap, bipartite graph build.

Reproduces the data semantics of the reference ``TextGCN/dataset.py:15-193``
with a TPU-first representation:

* the graph is kept as **edge arrays** ``(edge_user, edge_item, edge_weight)``
  with symmetric normalization ``w_ui = 1/sqrt(deg_u * deg_i)`` — equivalent
  to the reference's ``D^-1/2 (A + A^T) D^-1/2`` sparse COO tensor
  (reference ``dataset.py:122-138``) but exploiting the bipartite block
  structure: propagation is two rectangular SpMMs instead of one square one;
* the DGL heterograph detour (reference ``dataset.py:140-149``) is replaced
  by direct construction from the remapped train table;
* per-user positive lists are emitted as a **padded dense matrix** +
  degree vector (static shapes for jit) instead of python list/set/tensor
  triples (reference ``dataset.py:110-116``).

The reference's uniform-user "bucket" epoch semantics (every user
contributes exactly ``n_train // n_users`` samples per epoch, reference
``dataset.py:106-107,184-193`` — SURVEY.md quirk Q7) are preserved in
``sampling.py``, which consumes the padded positive matrix built here.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

log = logging.getLogger('textgcn_tpu')


@dataclass
class Graph:
    """Normalized bipartite interaction graph in edge-list form."""
    n_users: int
    n_items: int
    edge_user: np.ndarray    # (E,) int32 — user endpoint of each train edge
    edge_item: np.ndarray    # (E,) int32 — item endpoint
    edge_weight: np.ndarray  # (E,) float32 — 1/sqrt(deg_u * deg_i)
    user_degree: np.ndarray  # (n_users,) int32
    item_degree: np.ndarray  # (n_items,) int32

    @property
    def n_edges(self) -> int:
        return int(self.edge_user.shape[0])


@dataclass
class InteractionData:
    """Loaded + remapped train/test interactions and derived structures."""
    n_users: int
    n_items: int
    n_train: int
    n_test: int
    graph: Graph
    # padded positives: pos_padded[u, :deg_u] = sorted item ids, rest = n_items
    pos_padded: np.ndarray          # (n_users, max_degree) int32
    pos_degree: np.ndarray          # (n_users,) int32
    test_users: np.ndarray          # sorted unique users present in test
    true_test: list[list[int]]      # per test-user ground-truth item ids
    user_id_map: dict[int, str]     # internal -> external id
    item_id_map: dict[int, str]
    train_df: pd.DataFrame = field(repr=False)
    test_df: pd.DataFrame = field(repr=False)
    user_mapping: pd.DataFrame = field(repr=False)  # org_id <-> remap_id
    item_mapping: pd.DataFrame = field(repr=False)
    # table sizes rounded up for mesh sharding; phantom rows have no edges,
    # are never sampled, and are sliced out of retrieval (== real counts on
    # a single chip)
    n_users_padded: int = 0
    n_items_padded: int = 0

    def __post_init__(self):
        if not self.n_users_padded:
            self.n_users_padded = self.n_users
        if not self.n_items_padded:
            self.n_items_padded = self.n_items

    def padded_to(self, multiple: int) -> 'InteractionData':
        """Copy with table sizes rounded up to ``multiple`` (for row-sharded
        embedding tables over a device mesh)."""
        import dataclasses
        return dataclasses.replace(
            self,
            n_users_padded=-(-self.n_users // multiple) * multiple,
            n_items_padded=-(-self.n_items // multiple) * multiple)

    @property
    def bucket_len(self) -> int:
        """Samples per user per epoch (reference ``dataset.py:106``)."""
        return self.n_train // self.n_users

    @property
    def iterable_len(self) -> int:
        return self.bucket_len * self.n_users

    @property
    def max_degree(self) -> int:
        return int(self.pos_padded.shape[1])


def _read_interactions(path: str) -> pd.DataFrame:
    df = pd.read_table(path, dtype=str)
    return df.sort_values(by=['user_id', 'asin']).reset_index(drop=True)


def reshuffle_train_test(data_dir: str, seed: int,
                         train_size: float = 0.8) -> str:
    """Re-split train+test stratified by user, as reference
    ``dataset.py:63-87``: concat, keep users with >=3 interactions,
    stratified 80/20 split, drop test items unseen in train, write to
    ``<data>/reshuffle_<seed>/``.  Returns the folder with the new split."""
    from sklearn.model_selection import train_test_split as tts

    out = os.path.join(data_dir, f'reshuffle_{seed}')
    if os.path.exists(os.path.join(out, 'train.tsv')):
        return out
    os.makedirs(out, exist_ok=True)
    train_df = pd.read_table(os.path.join(data_dir, 'train.tsv'), dtype=str)
    test_df = pd.read_table(os.path.join(data_dir, 'test.tsv'), dtype=str)
    df = pd.concat([train_df, test_df])
    sizes = df.groupby('user_id')['user_id'].transform('size')
    filtered = df[sizes >= 3]
    tr, te = tts(filtered, stratify=filtered['user_id'],
                 train_size=train_size, random_state=seed)
    tr = tr.sort_values(by=['user_id', 'asin']).reset_index(drop=True)
    te = te.sort_values(by=['user_id', 'asin']).reset_index(drop=True)
    te = te[te['asin'].isin(tr['asin'].unique())]
    tr.to_csv(os.path.join(out, 'train.tsv'), sep='\t', index=False)
    te.to_csv(os.path.join(out, 'test.tsv'), sep='\t', index=False)
    return out


def load_interactions(data_dir: str, *, reshuffle: bool = False,
                      seed: int = 0) -> InteractionData:
    """Load train/test TSVs and build all derived structures.

    Sanity rules follow reference ``dataset.py:36-61``: users appearing only
    in test are an error; items appearing only in test are dropped with a
    warning.
    """
    folder = data_dir
    if reshuffle:
        folder = reshuffle_train_test(data_dir, seed)

    # the train file dominates load time at scale; the native C++ parser
    # (sort + first-appearance remap in one pass over the mmap'd bytes)
    # replaces pandas read_table + sort_values + map when available,
    # with identical output (tests/test_native.py, test_data.py).  A
    # malformed file makes it return None -> pandas raises its own error.
    parsed = None
    from .. import native
    if native.available():
        parsed = native.parse_interactions_tsv(
            os.path.join(folder, 'train.tsv'))
    if parsed is not None:
        eu_parsed, ei_parsed, user_ext, item_ext = parsed
        train_df = pd.DataFrame({
            'user_id': eu_parsed.astype(np.int64),
            'asin': ei_parsed.astype(np.int64)})
        user_mapping = pd.DataFrame(
            enumerate(user_ext), columns=['remap_id', 'org_id'])
        item_mapping = pd.DataFrame(
            enumerate(item_ext), columns=['remap_id', 'org_id'])
        test_df = _read_interactions(os.path.join(folder, 'test.tsv'))
        test_only_users = set(test_df.user_id) - set(user_ext)
        assert not test_only_users, \
            f"users {test_only_users} from test set don't appear in " \
            'train set'
        test_only_items = set(test_df.asin) - set(item_ext)
        if test_only_items:
            log.warning("items %s from test set don't appear in train "
                        'set, removing them', test_only_items)
            test_df = test_df[~test_df.asin.isin(test_only_items)]
        u_map = dict(zip(user_mapping.org_id, user_mapping.remap_id))
        i_map = dict(zip(item_mapping.org_id, item_mapping.remap_id))
        test_df = test_df.assign(user_id=test_df.user_id.map(u_map),
                                 asin=test_df.asin.map(i_map))
    else:
        train_df = _read_interactions(os.path.join(folder, 'train.tsv'))
        test_df = _read_interactions(os.path.join(folder, 'test.tsv'))

        test_only_users = set(test_df.user_id) - set(train_df.user_id)
        assert not test_only_users, \
            f"users {test_only_users} from test set don't appear in " \
            'train set'
        test_only_items = set(test_df.asin) - set(train_df.asin)
        if test_only_items:
            log.warning("items %s from test set don't appear in train "
                        'set, removing them', test_only_items)
            test_df = test_df[~test_df.asin.isin(test_only_items)]

        # dense internal ids, ordered by first appearance in the sorted
        # train table (reference dataset.py:89-98)
        user_mapping = pd.DataFrame(
            enumerate(train_df.user_id.unique()),
            columns=['remap_id', 'org_id'])
        item_mapping = pd.DataFrame(
            enumerate(train_df.asin.unique()),
            columns=['remap_id', 'org_id'])
        u_map = dict(zip(user_mapping.org_id, user_mapping.remap_id))
        i_map = dict(zip(item_mapping.org_id, item_mapping.remap_id))
        train_df = train_df.assign(user_id=train_df.user_id.map(u_map),
                                   asin=train_df.asin.map(i_map))
        test_df = test_df.assign(user_id=test_df.user_id.map(u_map),
                                 asin=test_df.asin.map(i_map))

    n_users = int(train_df.user_id.nunique())
    n_items = int(train_df.asin.nunique())
    n_train = len(train_df)
    n_test = len(test_df)

    edge_user = train_df.user_id.to_numpy(dtype=np.int32)
    edge_item = train_df.asin.to_numpy(dtype=np.int32)
    user_degree = np.bincount(edge_user, minlength=n_users).astype(np.int32)
    item_degree = np.bincount(edge_item, minlength=n_items).astype(np.int32)
    with np.errstate(divide='ignore'):
        du = 1.0 / np.sqrt(user_degree.astype(np.float64))
        di = 1.0 / np.sqrt(item_degree.astype(np.float64))
    du[~np.isfinite(du)] = 0.0
    di[~np.isfinite(di)] = 0.0
    edge_weight = (du[edge_user] * di[edge_item]).astype(np.float32)
    graph = Graph(n_users, n_items, edge_user, edge_item, edge_weight,
                  user_degree, item_degree)

    # padded per-user positives, sorted within each row so membership tests
    # can use searchsorted; padding value n_items sorts after all real items
    max_deg = max(int(user_degree.max()), 1)
    pos_padded = np.full((n_users, max_deg), n_items, dtype=np.int32)
    order = np.lexsort((edge_item, edge_user))
    sorted_u = edge_user[order]
    sorted_i = edge_item[order]
    row_starts = np.searchsorted(sorted_u, np.arange(n_users))
    col_idx = np.arange(n_train) - row_starts[sorted_u]
    pos_padded[sorted_u, col_idx] = sorted_i

    test_users = np.sort(test_df.user_id.unique()).astype(np.int32)
    true_test = (test_df.groupby('user_id')['asin'].agg(list)
                 .loc[test_users].tolist())

    data = InteractionData(
        n_users=n_users, n_items=n_items, n_train=n_train, n_test=n_test,
        graph=graph, pos_padded=pos_padded,
        pos_degree=user_degree.copy(), test_users=test_users,
        true_test=true_test,
        user_id_map=dict(zip(user_mapping.remap_id, user_mapping.org_id)),
        item_id_map=dict(zip(item_mapping.remap_id, item_mapping.org_id)),
        train_df=train_df, test_df=test_df,
        user_mapping=user_mapping, item_mapping=item_mapping,
    )
    log.info('n_train:    %7d', n_train)
    log.info('n_test:     %7d', n_test)
    log.info('n_users:    %7d', n_users)
    log.info('n_items:    %7d', n_items)
    return data


def dense_normalized_adjacency(graph: Graph) -> np.ndarray:
    """Dense (n_users+n_items)^2 normalized adjacency — test oracle only.

    Mirrors the construction at reference ``dataset.py:122-138`` so unit
    tests can check the edge-list formulation against an explicit
    ``D^-1/2 (A + A^T) D^-1/2``.
    """
    n = graph.n_users + graph.n_items
    a = np.zeros((n, n), dtype=np.float64)
    a[graph.edge_user, graph.n_users + graph.edge_item] = 1.0
    a = a + a.T
    rowsum = a.sum(axis=1)
    with np.errstate(divide='ignore'):
        d = 1.0 / np.sqrt(rowsum)
    d[~np.isfinite(d)] = 0.0
    return (d[:, None] * a * d[None, :]).astype(np.float32)
