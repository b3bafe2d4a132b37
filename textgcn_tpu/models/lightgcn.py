"""LightGCN model: embedding tables + K-hop propagation + BPR training.

Functional re-design of the reference ``BaseModel``
(``TextGCN/base_model.py:17-210``): parameters are a plain pytree
(``{'user_emb', 'item_emb'}``), the graph lives in device edge arrays, and
every model operation is a pure function suitable for ``jax.jit``/``pjit``.
The reference's five overridable hooks (layer_aggregation /
layer_combination / score_pairwise / score_batchwise / get_loss,
``base_model.py:141-184``) map to the methods below; subclasses (LTR heads,
adversarial sampling) override the same surface.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.core import InteractionData
from ..ops.propagate import propagate_rest as _propagate_rest
from ..ops.propagate import representation as _representation
from ..ops.retrieval import score_and_topk
from ..ops.sampling import batch_epoch, sample_epoch
from .losses import bpr_loss, reg_loss


class LightGCN:
    """Static model definition; holds config + device graph arrays."""

    # per-step loss components logged as separate running sums by the
    # Trainer (reference ``base_model.py:115,131``)
    loss_components = ('bpr', 'reg')

    # device-resident attributes that jitted drivers must pass as
    # ARGUMENTS rather than close over: closed-over device arrays are
    # embedded into the compiled program as constants (bloats/breaks
    # compilation at multi-million-edge scale; illegal for
    # multi-controller global arrays).  Subclasses extend this.
    captured_attrs = ('graph_op', 'pos_padded', 'pos_degree')

    def __init__(self, cfg: Config, data: InteractionData):
        self.cfg = cfg
        self.n_users = data.n_users
        self.n_items = data.n_items
        # propagation backend: the Pallas tiled one-hot SpMM kernel on TPU
        # (ops/pallas_spmm.py — ~25x faster than the XLA scatter path on
        # v5e), the XLA sorted-segment-sum op elsewhere.
        # TEXTGCN_TPU_PALLAS=0|1|interpret overrides.
        import os
        override = os.environ.get('TEXTGCN_TPU_PALLAS', '')
        platform = jax.devices()[0].platform.lower()
        on_tpu = 'tpu' in platform or platform == 'axon'
        # pallas wins at every measured size in steady state (5.7 vs 11.7
        # ms/step at 50k edges up to 24 vs 96 ms at 600k on v5e; cold
        # kernel compiles are absorbed by the persistent compilation
        # cache), so it is the default on TPU.  The env knob remains for
        # cache-less environments where compile latency matters.
        min_edges = int(os.environ.get('TEXTGCN_TPU_PALLAS_MIN_EDGES', '0'))
        big_enough = data.graph.n_edges >= min_edges
        if override == '0':
            self.backend = 'xla'
        elif override == 'interpret':
            self.backend = 'pallas_interpret'
        elif override == '1' or (cfg.use_pallas and on_tpu and big_enough):
            self.backend = 'pallas'
        else:
            self.backend = 'xla'
        # embedding-table row counts (>= real counts when mesh-sharded;
        # under pallas rounded to 4096 so any power-of-two source block the
        # density-adaptive tile planner picks divides the table — at most
        # ~1 MB of phantom rows)
        table_round = 1
        if self.backend != 'xla':
            table_round = 4096
        self.n_users_t = -(-data.n_users_padded // table_round) * table_round
        self.n_items_t = -(-data.n_items_padded // table_round) * table_round
        self.n_layers = cfg.n_layers
        self.single = cfg.single
        self.dropout = cfg.dropout
        self.reg_lambda = cfg.reg_lambda
        g = data.graph
        self._edges = (g.edge_user, g.edge_item, g.edge_weight)
        # built lazily on first use: mesh runs replace it with a
        # mesh-partitioned op (parallel/mesh.shard_model) before any
        # access, so the single-chip tile layout (an expensive host
        # sort/pack pass + device transfer at large edge counts) is never
        # built just to be discarded
        self._graph_op = None
        self.pos_padded = jnp.asarray(data.pos_padded)
        self.pos_degree = jnp.asarray(data.pos_degree)
        self.bucket_len = data.bucket_len
        self.iterable_len = data.iterable_len

    @property
    def graph_op(self):
        if self._graph_op is None:
            # the first access may happen inside a jit trace (e.g.
            # jit(lambda p: model.representation(p))): force concrete
            # (compile-time) evaluation so the cached op holds real
            # arrays, not tracers that would leak out of the trace
            import jax as _jax
            with _jax.ensure_compile_time_eval():
                eu, ei, w = self._edges
                if self.backend == 'xla':
                    from ..ops.spmm import BipartiteGraphOp
                    self._graph_op = BipartiteGraphOp(
                        eu, ei, w, self.n_users_t, self.n_items_t)
                else:
                    from ..ops.pallas_spmm import PallasGraphOp
                    self._graph_op = PallasGraphOp(
                        eu, ei, w, self.n_users_t, self.n_items_t,
                        self.cfg.emb_size,
                        interpret=self.backend == 'pallas_interpret')
        return self._graph_op

    @graph_op.setter
    def graph_op(self, op):
        self._graph_op = op

    # --- parameters --------------------------------------------------------

    def init_params(self, key) -> dict[str, Any]:
        """N(0, 0.1) init as reference ``base_model.py:64-69``."""
        ku, ki = jax.random.split(key)
        d = self.cfg.emb_size
        return {
            'user_emb': 0.1 * jax.random.normal(ku, (self.n_users_t, d),
                                                jnp.float32),
            'item_emb': 0.1 * jax.random.normal(ki, (self.n_items_t, d),
                                                jnp.float32),
        }

    # --- representation ----------------------------------------------------

    # cached-propagation support (--refresh_every): while a stale "rest" is
    # bound, training-time representations use fresh ego tables + the stale
    # propagated part — the loss methods of every model family route
    # through representation(training=True), so they all inherit it
    supports_cached_propagation = True
    _cached_rest = None

    def representation(self, params, *, training: bool = False,
                       dropout_key=None):
        """Propagated (users_repr, items_repr); edge dropout in training
        (reference ``base_model.py:93-106``).  Under ``with_cached_rest``
        the training-time representation is ``cached_reprs`` instead (eval
        always propagates exactly)."""
        if training and self._cached_rest is not None:
            return self.cached_reprs(params, self._cached_rest)
        return _representation(
            params, self.graph_op, self.n_layers, single=self.single,
            dropout=self.dropout if training else 0.0,
            dropout_key=dropout_key)

    def propagate_rest(self, params, dropout_key=None):
        """The cacheable Σ_{l>=1} propagated layers (training dropout);
        see ``ops.propagate.propagate_rest``."""
        return _propagate_rest(
            params, self.graph_op, self.n_layers,
            dropout=self.dropout, dropout_key=dropout_key)

    def cached_reprs(self, params, rest):
        """Layer-mean representation from fresh ego tables + a stale
        ``rest``: gradients flow through the layer-0 tables only."""
        assert not self.single, \
            'cached propagation requires the layer-mean combination ' \
            '(--single has no ego term to keep fresh)'
        inv = 1.0 / (self.n_layers + 1)
        return ((params['user_emb'] + rest[0]) * inv,
                (params['item_emb'] + rest[1]) * inv)

    @contextlib.contextmanager
    def with_cached_rest(self, rest):
        """Context manager binding a stale ``rest`` for the duration of a
        traced loss call (same pattern as ``bound``)."""
        old = self._cached_rest
        self._cached_rest = rest
        try:
            yield self
        finally:
            self._cached_rest = old

    # --- scoring -----------------------------------------------------------

    def score_pairwise(self, params, reprs, users_emb, items_emb, users,
                       items):
        """Dot product per (user, item) pair (reference
        ``base_model.py:166-171``).  ``users_emb``/``items_emb`` are already
        gathered propagated rows."""
        del params, reprs, users, items
        return (users_emb * items_emb).sum(axis=-1)

    def score_batchwise(self, params, reprs, users):
        """(B, n_items) all-catalog scores (reference
        ``base_model.py:173-179``)."""
        users_repr, items_repr = reprs
        return jnp.dot(users_repr[users], items_repr.T,
                       preferred_element_type=jnp.float32)

    # --- loss --------------------------------------------------------------

    def loss(self, params, batch, dropout_key):
        """Total loss for one batch; returns (loss, aux-dict).

        ``batch`` = (users, pos, negs, mask).  Reproduces reference
        ``get_loss`` (``base_model.py:181-184``): full-graph propagation per
        batch, BPR over selu(neg-pos), L2 reg on layer-0 rows.
        """
        users, pos, negs, mask = batch
        users_repr, items_repr = self.representation(
            params, training=True, dropout_key=dropout_key)
        u_emb = users_repr[users]
        pos_scores = self.score_pairwise(params, None, u_emb,
                                         items_repr[pos], users, pos)
        neg_scores = jax.vmap(
            lambda n: self.score_pairwise(params, None, u_emb,
                                          items_repr[n], users, n),
            in_axes=1, out_axes=1)(negs)
        l_bpr = bpr_loss(pos_scores, neg_scores, mask)
        l_reg = reg_loss(params['user_emb'], params['item_emb'],
                         users, pos, negs, mask, self.reg_lambda)
        return l_bpr + l_reg, {'bpr': l_bpr, 'reg': l_reg}

    # --- retrieval ---------------------------------------------------------

    def topk_for_users(self, params, reprs, batch_users, k: int):
        """Masked full-catalog top-k for a batch of users."""
        users_repr, items_repr = reprs
        return score_and_topk(
            users_repr[batch_users], items_repr,
            self.pos_padded[batch_users], k=k, n_items=self.n_items)

    # --- epoch sampling -----------------------------------------------------

    def num_batches(self, batch_size: int) -> int:
        return max(1, -(-self.iterable_len // batch_size))

    def sample_batches(self, key, batch_size: int):
        """One epoch of shuffled, fixed-shape training batches.

        Returns a tuple of arrays with leading dim ``num_batches``; consumed
        positionally by ``self.loss``.
        """
        users, pos, negs = sample_epoch(
            key, self.pos_padded, self.pos_degree,
            bucket_len=self.bucket_len, neg_samples=self.cfg.neg_samples,
            n_items=self.n_items)
        return batch_epoch(users, pos, negs, batch_size=batch_size)

    # --- captured device state (for jitted drivers) -------------------------

    def captured_state(self) -> dict:
        """Pytree of this model's device-resident arrays (graph op,
        positive tables, feature tensors).  Jitted drivers take it as an
        argument and rebind it with ``bound`` while tracing."""
        return {name: getattr(self, name) for name in self.captured_attrs
                if getattr(self, name, None) is not None}

    def bound(self, state: dict):
        """Context manager temporarily rebinding captured attributes (to
        tracers during jit tracing); restores the concrete arrays after."""
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            old = {k: getattr(self, k) for k in state}
            try:
                for k, v in state.items():
                    setattr(self, k, v)
                yield self
            finally:
                for k, v in old.items():
                    setattr(self, k, v)

        return _ctx()

    # --- trainable-leaf mask (for freeze support in subclasses) ------------

    def trainable_mask(self, params):
        return jax.tree.map(lambda _: True, params)

    # plain dot-product scoring: mesh eval may use the distributed-top-k
    # shortcut (LTR heads override this to False)
    supports_plain_sharded_topk = True
