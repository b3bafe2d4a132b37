"""Text-loss model family: BPR + semantic regularizer over text embeddings.

Working re-implementation of the reference's (bit-rotted) text family:

* ``TextLossModel`` — reference ``text_base_model.py:9-80``: per negative
  sample the BPR term gets a semantic regularizer ``mean(weight * dist)``,
  where ``dist`` compares the text-embedding distance b of (pos, neg) with
  their GNN layer-0 embedding distance g through a configurable formula
  table, and ``weight`` is a function of the (pos, neg) score gap.
* ``TextModelKG`` (reference ``kg_models.py:53-70``): pos/neg items
  represented by their description embeddings.
* ``TextModelReviews`` (reference ``reviews_models.py:116-142``): pos/neg
  items represented by their mean-review embeddings.
* ``TextModel`` / ``TestModel`` (reference ``text_joint_model.py``):
  the joint diamond and the zero-training probe that evaluates the four
  (user-repr x item-repr) text combinations.

Bit-rot fixed relative to the reference (SURVEY.md Q3): the reference's
``--weight``/``--dist_fn``/``--pos``/``--neg`` flags are commented out of
its parser and its ``score_pairwise`` calls use the wrong arity, so the
family cannot run there.  Here the knobs are constructor arguments with
the reference's defaults (weight='1', distance='|b-g|', dist_fn='euclid')
and everything is functional/jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lightgcn import LightGCN
from .losses import reg_loss


def _euclid(x, y):
    return jnp.sqrt(jnp.sum(jnp.square(x - y), axis=-1) + 1e-12)


def _cosine_minus(x, y):
    xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-12)
    return -jnp.sum(xn * yn, axis=-1)

DIST_FNS = {'euclid': _euclid, 'cosine_minus': _cosine_minus}

DISTANCE_FORMULAS = {
    'max(b-g)': lambda b, g: jax.nn.relu(b - g),
    'max(g-b)': lambda b, g: jax.nn.relu(g - b),
    '(b-g)': lambda b, g: b - g,
    '(g-b)': lambda b, g: g - b,
    '|b-g|': lambda b, g: jnp.abs(b - g),
    '|g-b|': lambda b, g: jnp.abs(g - b),
    'selu(g-b)': lambda b, g: jax.nn.selu(g - b),
    'selu(b-g)': lambda b, g: jax.nn.selu(b - g),
}

WEIGHT_FORMULAS = {
    'max(p-n)': lambda p, n: jax.nn.relu(p - n),
    '|p-n|': lambda p, n: jnp.abs(p - n),
    '(p-n)': lambda p, n: p - n,
    '1': lambda p, n: 1.0,
    '0': lambda p, n: 0.0,
}


class TextLossModel(LightGCN):
    """Abstract: subclasses define pos/neg item text representations."""

    # semantic loss logged as its own running component (reference keeps a
    # separate `sem` sum, ``text_base_model.py:34-35``)
    loss_components = ('bpr', 'sem', 'reg')

    def __init__(self, cfg, data, *, weight: str | None = None,
                 distance: str | None = None,
                 dist_fn: str | None = None):
        """Knobs default to the config's flags (``--weight``,
        ``--distance``, ``--dist_fn`` — the reference consumes these at
        ``text_base_model.py:15,22`` but its parser comments them out);
        explicit constructor args win."""
        super().__init__(cfg, data)
        if weight is None:
            weight = getattr(cfg, 'weight', '1')
        if distance is None:
            distance = getattr(cfg, 'distance', '|b-g|')
        if dist_fn is None:
            dist_fn = getattr(cfg, 'dist_fn', 'euclid')
        self.weight_formula = WEIGHT_FORMULAS[weight]
        self.distance_formula = DISTANCE_FORMULAS[distance]
        self.dist_fn = DIST_FNS[dist_fn]

    # subclasses override (items text representation lookup)
    def pos_items_reprs(self, items, users):
        raise NotImplementedError

    def neg_items_reprs(self, items, users):
        raise NotImplementedError

    def semantic_loss(self, params, users, pos, neg, pos_scores,
                      neg_scores, mask):
        """(weight * distance).mean() over the batch (reference
        ``text_base_model.py:39-64``), masked for padded samples."""
        b = self.dist_fn(self.pos_items_reprs(pos, users),
                         self.neg_items_reprs(neg, users))
        g = self.dist_fn(params['item_emb'][pos], params['item_emb'][neg])
        dist = self.distance_formula(b, g)
        w = self.weight_formula(pos_scores, neg_scores)
        val = w * dist
        denom = jnp.maximum(mask.sum(), 1.0)
        return jnp.where(mask, val, 0.0).sum() / denom

    def loss(self, params, batch, dropout_key):
        """BPR + semantic per negative column + L2 reg (reference
        ``text_base_model.py:24-37`` + ``base_model.py:200-210``)."""
        users, pos, negs, mask = batch
        users_repr, items_repr = self.representation(
            params, training=True, dropout_key=dropout_key)
        u_emb = users_repr[users]
        pos_scores = (u_emb * items_repr[pos]).sum(axis=-1)
        n_negs = negs.shape[1]
        denom = jnp.maximum(mask.sum(), 1.0)
        l_bpr = 0.0
        l_sem = 0.0
        for j in range(n_negs):
            neg = negs[:, j]
            neg_scores = (u_emb * items_repr[neg]).sum(axis=-1)
            diff = jax.nn.selu(neg_scores - pos_scores)
            l_bpr = l_bpr + jnp.where(mask, diff, 0.0).sum() / denom / n_negs
            l_sem = l_sem + self.semantic_loss(
                params, users, pos, neg, pos_scores, neg_scores,
                mask) / n_negs
        l_reg = reg_loss(params['user_emb'], params['item_emb'],
                         users, pos, negs, mask, self.reg_lambda)
        return l_bpr + l_sem + l_reg, {'bpr': l_bpr, 'sem': l_sem,
                                       'reg': l_reg}


class TextModelKG(TextLossModel):
    """Items represented by description embeddings (reference
    ``kg_models.py:53-70``)."""

    captured_attrs = TextLossModel.captured_attrs + ('items_as_desc',)

    def __init__(self, cfg, data, **kw):
        super().__init__(cfg, data, **kw)
        self.items_as_desc = jnp.asarray(data.items_as_desc)

    def pos_items_reprs(self, items, users):
        return self.items_as_desc[items]

    neg_items_reprs = pos_items_reprs


class TextModelReviews(TextLossModel):
    """Items represented by mean-review embeddings, or — with
    ``pos='user'`` — by the review the sampled user wrote about the item
    (reference ``reviews_models.py:116-142``)."""

    captured_attrs = TextLossModel.captured_attrs + (
        'items_as_avg_reviews', '_pair_users', '_pair_item_ptr',
        '_pair_vectors')

    def __init__(self, cfg, data, pos: str | None = None, **kw):
        super().__init__(cfg, data, **kw)
        self.items_as_avg_reviews = jnp.asarray(data.items_as_avg_reviews)
        if pos is None:
            # reference: model 'reviews' always uses the mean repr; only
            # the joint 'text' model honors --pos
            # (reviews_models.py:121-124)
            pos = getattr(cfg, 'pos', 'avg') \
                if cfg.model != 'reviews' else 'avg'
        self.pos_mode = pos
        if pos == 'user':
            import numpy as np
            self._pair_users = jnp.asarray(data.review_pair_users)
            self._pair_item_ptr = jnp.asarray(data.review_pair_item_ptr)
            self._pair_vectors = jnp.asarray(data.review_pair_vectors)
            seg = np.diff(np.asarray(data.review_pair_item_ptr))
            longest = int(seg.max()) if seg.size else 0
            self._pair_bisect_iters = max(1, longest.bit_length())

    def _item_reviews_user(self, items, users):
        """Vector of the (item, user) review; zeros when the pair has no
        train review (reference indexes the pandas MultiIndex,
        ``reviews_models.py:139-142``).

        int32-safe lookup: the per-item row-pointer bounds the search to
        the item's user segment, then a fixed-depth bisection finds the
        user — no ``item * n_users + user`` composite key, which would
        silently wrap once ``n_items * n_users`` exceeds 2^31 (JAX
        truncates int64 to int32 when x64 is off).
        """
        lo = self._pair_item_ptr[items]
        hi = self._pair_item_ptr[items + 1]
        end = hi
        pu = self._pair_users
        last = pu.shape[0] - 1

        def step(carry, _):
            lo, hi = carry
            mid = (lo + hi) // 2
            v = pu[jnp.clip(mid, 0, last)]
            less = (v < users) & (lo < hi)
            new_lo = jnp.where(less, mid + 1, lo)
            new_hi = jnp.where((lo < hi) & ~less, mid, hi)
            return (new_lo, new_hi), None

        (lo, _), _ = jax.lax.scan(step, (lo, hi), None,
                                  length=self._pair_bisect_iters)
        idx = jnp.clip(lo, 0, last)
        found = ((lo < end) & (pu[idx] == users))[:, None]
        return jnp.where(found, self._pair_vectors[idx], 0.0)

    def pos_items_reprs(self, items, users):
        if self.pos_mode == 'user':
            return self._item_reviews_user(items, users)
        return self.items_as_avg_reviews[items]

    def neg_items_reprs(self, items, users):
        return self.items_as_avg_reviews[items]


class TextModel(TextModelReviews, TextModelKG):
    """Joint diamond (reference ``text_joint_model.py:9-10``): MRO picks
    the reviews representation by default; ``--pos kg`` / ``--neg kg``
    switch either side to the description reprs
    (reference ``reviews_models.py:121-128``)."""

    captured_attrs = TextModelReviews.captured_attrs + ('items_as_desc',)

    def __init__(self, cfg, data, pos: str | None = None,
                 neg: str | None = None, **kw):
        self.neg_mode = neg if neg is not None \
            else getattr(cfg, 'neg', 'avg')
        if pos is None and getattr(cfg, 'pos', 'avg') == 'kg':
            # handled locally; the reviews parent only knows avg/user
            super().__init__(cfg, data, pos='avg', **kw)
            self.pos_mode = 'kg'
        else:
            super().__init__(cfg, data, pos=pos, **kw)

    def pos_items_reprs(self, items, users):
        if self.pos_mode == 'kg':
            return self.items_as_desc[items]
        return super().pos_items_reprs(items, users)

    def neg_items_reprs(self, items, users):
        if self.neg_mode == 'kg':
            return self.items_as_desc[items]
        return self.items_as_avg_reviews[items]


def probe_text_representations(cfg, data, trainer) -> dict[str, dict]:
    """Zero-training probe (reference ``TestModel``,
    ``text_joint_model.py:13-29``): evaluate the four (user x item) text
    representation combinations by swapping the representation used for
    scoring.  Returns {combo: metrics} instead of printing-and-exit."""
    import numpy as np

    combos = {
        'rev_rev': ('users_as_avg_reviews', 'items_as_avg_reviews'),
        'kg_kg': ('users_as_avg_desc', 'items_as_desc'),
        'rev_kg': ('users_as_avg_reviews', 'items_as_desc'),
        'kg_rev': ('users_as_avg_desc', 'items_as_avg_reviews'),
    }
    model = trainer.model
    results = {}
    orig_repr = model.representation
    try:
        for name, (u_attr, i_attr) in combos.items():
            u = jnp.asarray(getattr(data, u_attr))
            i = jnp.asarray(getattr(data, i_attr))
            # pad to table shapes so downstream gathers stay in range
            u = jnp.pad(u, ((0, model.n_users_t - u.shape[0]), (0, 0)))
            i = jnp.pad(i, ((0, model.n_items_t - i.shape[0]), (0, 0)))
            model.representation = \
                lambda params, u=u, i=i, **kw: (u, i)
            trainer._eval_fn = None
            results[name] = trainer.evaluate()
    finally:
        model.representation = orig_repr
        trainer._eval_fn = None
    return results
