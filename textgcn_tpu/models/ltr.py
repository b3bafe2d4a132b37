"""Learning-to-rank heads — the paper's "TextGCN" models.

Capability match for reference ``TextGCN/ltr_models.py:38-241``:
``LTRLinear`` trains a linear tower over 5 cross features between GCN /
review-text / description-text representations of users and items
(reference feature order at ``ltr_models.py:131-146``):

    [gnn.gnn, reviews.reviews, desc.desc, reviews_u.desc_i, desc_u.reviews_i]

``LTRLinearWPop`` appends user/item popularity features
(``ltr_models.py:213-241``).  The ``--load_base`` warm-start and
``--freeze`` flows (``ltr_models.py:57-68``) are supported via parameter
overlay + frozen-leaf optimizer masks.

TPU-first redesign of batchwise scoring: the reference materializes a
``(B, n_items, F)`` feature tensor and pushes it through the tower
(``ltr_models.py:200-204`` — the memory blow-up called out in SURVEY.md
§5).  The reference tower is a stack of ``nn.Linear`` with **no
nonlinearities**, so the whole tower collapses to an effective weight
vector ``w_eff`` and bias; batchwise scores then fuse into ONE MXU matmul

    score = [w0*u_gnn, w1*u_rev + w4*u_desc, w2*u_desc + w3*u_rev]
            @ [i_gnn; i_rev; i_desc]^T + b_eff (+ popularity terms)

so the per-chip memory is O(B*d + n_items*d) instead of O(B*n_items*F).
Training still differentiates through every tower layer via the pairwise
feature path (cheap: (B, F)).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.retrieval import topk_from_scores
from .lightgcn import LightGCN
from .losses import bpr_loss, reg_loss

log = logging.getLogger('textgcn_tpu')

FEATURE_NAMES = [
    'lightgcn score',
    'reviews',
    'desc',
    'reviews-description',
    'description-reviews',
]


def _pad_rows(a, n_rows: int):
    """Zero-pad a feature matrix to the (possibly padded) table row count."""
    a = np.asarray(a)
    return jnp.asarray(np.pad(a, ((0, n_rows - a.shape[0]), (0, 0))))


def _linear_init(key, fan_in: int, fan_out: int):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32,
                           -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {'w': w, 'b': b}


def collapse_tower(tower):
    """Collapse a stack of linear layers into (w_eff (F,), b_eff scalar).

    Valid because the reference tower has no activations
    (``ltr_models.py:181-190``).
    """
    a = tower[0]['w']
    b = tower[0]['b']
    for layer in tower[1:]:
        a = a @ layer['w']
        b = b @ layer['w'] + layer['b']
    return a[:, 0], b[0]


class LTRLinear(LightGCN):

    n_extra_features = 0
    captured_attrs = LightGCN.captured_attrs + (
        'items_as_desc', 'items_as_avg_reviews', 'users_as_avg_reviews',
        'users_as_avg_desc')

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.feature_names = list(FEATURE_NAMES)
        if self.n_extra_features:
            self.feature_names += ['user popularity', 'item popularity']
        self.n_features = len(self.feature_names)
        self.ltr_layers = tuple(cfg.ltr_layers)
        self.freeze = cfg.freeze

        # text feature tensors padded to the (possibly mesh/kernel-padded)
        # table row counts so fused batchwise scoring can concatenate them
        # with propagated reprs; phantom rows are zeros and get masked out
        # of retrieval
        self.items_as_desc = _pad_rows(data.items_as_desc, self.n_items_t)
        self.items_as_avg_reviews = _pad_rows(data.items_as_avg_reviews,
                                              self.n_items_t)
        self.users_as_avg_reviews = _pad_rows(data.users_as_avg_reviews,
                                              self.n_users_t)
        self.users_as_avg_desc = _pad_rows(data.users_as_avg_desc,
                                           self.n_users_t)
        # distributed top-k shortcuts score with a plain dot product; any
        # model with a scoring head must take the head-aware eval path
        # (Trainer._make_eval_fn checks this).  The linear head factors
        # into catalog-shardable (u_cat, i_cat) matrices, so under a mesh
        # eval uses the explicit catalog-sharded top-k instead of GSPMD
        # auto-partitioning the (B, n_items) score matrix.
        self.supports_plain_sharded_topk = False
        self.supports_fused_sharded_topk = True
        # evaluate the loaded base with plain GCN scoring before the head
        # takes over (reference ltr_models.py:66-68,175-179)
        self.score_with_head = True

    # --- params ------------------------------------------------------------

    def init_params(self, key):
        k_emb, k_tower = jax.random.split(key)
        params = super().init_params(k_emb)
        sizes = [self.n_features, *self.ltr_layers, 1]
        keys = jax.random.split(k_tower, len(sizes) - 1)
        params['tower'] = [
            _linear_init(k, i, j)
            for k, i, j in zip(keys, sizes, sizes[1:])]
        return params

    def trainable_mask(self, params):
        mask = jax.tree.map(lambda _: True, params)
        if self.freeze:  # reference ltr_models.py:57-61
            mask['user_emb'] = False
            mask['item_emb'] = False
        return mask

    # --- features -----------------------------------------------------------

    def _user_vecs(self, users_repr, users):
        return (users_repr[users], self.users_as_avg_reviews[users],
                self.users_as_avg_desc[users])

    def _item_vecs(self, items_repr, items):
        return (items_repr[items], self.items_as_avg_reviews[items],
                self.items_as_desc[items])

    def features_pairwise(self, u_vecs, i_vecs, users, items):
        """(B, 5) cross features, reference order
        (``ltr_models.py:148-166``)."""
        u_emb, u_rev, u_desc = u_vecs
        i_emb, i_rev, i_desc = i_vecs
        feats = [
            (u_emb * i_emb).sum(-1),
            (u_rev * i_rev).sum(-1),
            (u_desc * i_desc).sum(-1),
            (u_rev * i_desc).sum(-1),
            (u_desc * i_rev).sum(-1),
        ]
        return jnp.stack(feats, axis=-1)

    def apply_tower(self, params, features):
        x = features
        for layer in params['tower']:
            x = x @ layer['w'] + layer['b']
        return x[..., 0]

    # --- scoring -----------------------------------------------------------

    def score_pairwise(self, params, reprs, users_emb, items_emb, users,
                       items):
        if not self.score_with_head:
            return (users_emb * items_emb).sum(axis=-1)
        u_vecs = (users_emb, self.users_as_avg_reviews[users],
                  self.users_as_avg_desc[users])
        i_vecs = (items_emb, self.items_as_avg_reviews[items],
                  self.items_as_desc[items])
        features = self.features_pairwise(u_vecs, i_vecs, users, items)
        return self.apply_tower(params, features)

    def fused_catalog_inputs(self, params, reprs, batch_users):
        """Collapsed-tower factors ``(u_cat, i_cat, bias)`` such that the
        full-catalog scores are exactly ``u_cat @ i_cat.T + bias``.

        This factorization is what makes catalog-sharded distributed
        retrieval possible for the LTR heads: ``i_cat`` rows shard over the
        `model` mesh axis like a plain embedding table (the popularity
        features are rank-1 and fold in as two extra matmul columns), so
        eval never materializes the reference's ``(B, n_items, F)`` tensor
        (``ltr_models.py:200-204``) on any chip.
        """
        users_repr, items_repr = reprs
        w, b = collapse_tower(params['tower'])
        u_emb, u_rev, u_desc = self._user_vecs(users_repr, batch_users)
        u_cat = jnp.concatenate([
            w[0] * u_emb,
            w[1] * u_rev + w[4] * u_desc,
            w[2] * u_desc + w[3] * u_rev,
        ], axis=-1)
        i_cat = jnp.concatenate(
            [items_repr, self.items_as_avg_reviews, self.items_as_desc],
            axis=-1)
        u_cat, i_cat = self._popularity_factors(u_cat, i_cat, w,
                                                batch_users)
        return u_cat, i_cat, b

    def fused_batch_scores(self, params, reprs, batch_users):
        """(B, n_items) scores via the collapsed-tower fused matmul."""
        u_cat, i_cat, b = self.fused_catalog_inputs(params, reprs,
                                                    batch_users)
        return jnp.dot(u_cat, i_cat.T,
                       preferred_element_type=jnp.float32) + b

    def _popularity_factors(self, u_cat, i_cat, w, batch_users):
        return u_cat, i_cat  # WPop appends the rank-1 popularity columns

    def score_batchwise(self, params, reprs, users):
        if not self.score_with_head:
            return super().score_batchwise(params, reprs, users)
        return self.fused_batch_scores(params, reprs, users)

    def topk_for_users(self, params, reprs, batch_users, k: int):
        if not self.score_with_head:
            return super().topk_for_users(params, reprs, batch_users, k)
        scores = self.fused_batch_scores(params, reprs, batch_users)
        return topk_from_scores(scores, self.pos_padded[batch_users],
                                k=k, n_items=self.n_items)

    # --- loss ---------------------------------------------------------------

    def loss(self, params, batch, dropout_key):
        """BPR over head scores + L2 reg on layer-0 tables (reference
        routes ``bpr_loss`` through the rebound ``score_pairwise_ltr``,
        ``ltr_models.py:178,206-210``)."""
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

    # --- observability ------------------------------------------------------

    def on_evaluate(self, params):
        """Log feature weights for a single-layer tower (reference
        ``ltr_models.py:192-198``)."""
        if len(params['tower']) == 1:
            w = jax.device_get(params['tower'][0]['w'])[:, 0]
            log.info('Feature weights from the top layer:')
            for name, weight in zip(self.feature_names, w):
                log.info('%-20s %.4g', name, weight)


class LTRLinearWPop(LTRLinear):
    """LTRLinear + user/item popularity features (reference
    ``ltr_models.py:213-241``)."""

    n_extra_features = 2
    captured_attrs = LTRLinear.captured_attrs + (
        'popularity_users', 'popularity_items')

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.popularity_users = _pad_rows(data.popularity_users,
                                          self.n_users_t)
        self.popularity_items = _pad_rows(data.popularity_items,
                                          self.n_items_t)

    def features_pairwise(self, u_vecs, i_vecs, users, items):
        base = super().features_pairwise(u_vecs, i_vecs, users, items)
        return jnp.concatenate([
            base,
            self.popularity_users[users],
            self.popularity_items[items],
        ], axis=-1)

    def _popularity_factors(self, u_cat, i_cat, w, batch_users):
        """Popularity features are rank-1 additive under the collapsed
        tower (w5*pop_u over rows, w6*pop_i over columns), so they fold
        into the fused matmul as two extra columns — keeping the factors
        catalog-shardable."""
        ones_u = jnp.ones((u_cat.shape[0], 1), u_cat.dtype)
        ones_i = jnp.ones((i_cat.shape[0], 1), i_cat.dtype)
        u_cat = jnp.concatenate(
            [u_cat, w[5] * self.popularity_users[batch_users], ones_u],
            axis=-1)
        i_cat = jnp.concatenate(
            [i_cat, ones_i, w[6] * self.popularity_items], axis=-1)
        return u_cat, i_cat
