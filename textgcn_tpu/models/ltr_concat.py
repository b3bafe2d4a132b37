"""Text-concatenation scoring models (reference ``rejected_models.py:45-109``).

The reference marks these "rejected" (worse than the paper's LTR heads,
``README.md:53``) and never imports the module, but they are real
capabilities of the codebase, so they are implemented here for inventory
completeness:

* ``LTRCosine`` (reference ``rejected_models.py:45-77``; registry names
  ``ltr_reviews`` / ``ltr_kg``) — trains LightGCN from scratch, but every
  score is taken in the *concatenated* space ``[gnn ++ text]``:

      score(u, i) = gnn_u . gnn_i  +  text_u . text_i

  with ``text_u = users_as_avg_reviews`` and ``text_i`` either the
  mean-review vectors (``ltr_reviews``) or the KG description vectors
  (``ltr_kg``), exactly the reference's ``torch.cat`` + dot
  (``rejected_models.py:65-76``).  Because concat-space dot product
  decomposes into two dot products, batchwise scoring fuses into two MXU
  matmuls and distributed retrieval rides the existing catalog-sharded
  fused top-k path (``u_cat @ i_cat.T`` with ``u_cat = [gnn_u, text_u]``)
  — no new collective machinery.

* ``LTRSimple`` (reference ``rejected_models.py:80-109``; registry name
  ``ltr_simple``) — zero-training probe over a *pretrained* LightGCN:
  evaluates concat scoring with ``pos=avg`` (mean-review item text) and
  then ``pos=kg`` (description item text).  The reference's ``fit`` is
  two ``evaluate()`` calls; here the CLI runs ``probe_concat_scoring``
  which returns {mode: metrics} instead of printing-and-exit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.retrieval import score_and_topk
from .lightgcn import LightGCN


def _pad_rows(a, n_rows: int):
    a = np.asarray(a, np.float32)
    return jnp.asarray(np.pad(a, ((0, n_rows - a.shape[0]), (0, 0))))


class LTRCosine(LightGCN):
    """LightGCN trained from scratch, scored in ``[gnn ++ text]`` space."""

    #: which item-side text tensor scores use ('reviews' | 'kg')
    items_text_mode = 'reviews'

    captured_attrs = LightGCN.captured_attrs + ('users_text', 'items_text')

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        # registry name picks the item text repr, mirroring the reference's
        # {'ltr_reviews': items_as_avg_reviews, 'ltr_kg': items_as_desc}
        # table (rejected_models.py:55-58)
        if cfg.model == 'ltr_kg':
            self.items_text_mode = 'kg'
        self._items_as_avg_reviews = _pad_rows(data.items_as_avg_reviews,
                                               self.n_items_t)
        self._items_as_desc = _pad_rows(data.items_as_desc, self.n_items_t)
        self.users_text = _pad_rows(data.users_as_avg_reviews,
                                    self.n_users_t)
        self.items_text = (self._items_as_avg_reviews
                           if self.items_text_mode == 'reviews'
                           else self._items_as_desc)
        # scoring is a plain dot product in concat space, so catalog-
        # sharded retrieval uses the fused (u_cat @ i_cat.T) path
        self.supports_plain_sharded_topk = False
        self.supports_fused_sharded_topk = True
        self.score_with_head = True

    def set_items_text_mode(self, mode: str):
        """Swap the item-side text repr ('reviews' | 'kg'); callers must
        rebuild any jitted eval fn capturing ``captured_state()``."""
        assert mode in ('reviews', 'kg'), mode
        self.items_text_mode = mode
        self.items_text = (self._items_as_avg_reviews if mode == 'reviews'
                           else self._items_as_desc)

    # --- scoring (reference rejected_models.py:65-76) -----------------------

    def score_pairwise(self, params, reprs, users_emb, items_emb, users,
                       items):
        if not self.score_with_head:   # --load_base base evaluation
            return super().score_pairwise(params, reprs, users_emb,
                                          items_emb, users, items)
        gnn = (users_emb * items_emb).sum(axis=-1)
        txt = (self.users_text[users] * self.items_text[items]).sum(axis=-1)
        return gnn + txt

    def score_batchwise(self, params, reprs, users):
        users_repr, items_repr = reprs
        if not self.score_with_head:
            return super().score_batchwise(params, reprs, users)
        gnn = jnp.dot(users_repr[users], items_repr.T,
                      preferred_element_type=jnp.float32)
        txt = jnp.dot(self.users_text[users], self.items_text.T,
                      preferred_element_type=jnp.float32)
        return gnn + txt

    # --- retrieval ----------------------------------------------------------

    def fused_catalog_inputs(self, params, reprs, batch_users):
        """Concat-space factors: scores == ``u_cat @ i_cat.T`` exactly."""
        users_repr, items_repr = reprs
        u_cat = jnp.concatenate(
            [users_repr[batch_users], self.users_text[batch_users]],
            axis=-1)
        i_cat = jnp.concatenate([items_repr, self.items_text], axis=-1)
        return u_cat, i_cat, jnp.float32(0.0)

    def topk_for_users(self, params, reprs, batch_users, k: int):
        if not self.score_with_head:
            return super().topk_for_users(params, reprs, batch_users, k)
        u_cat, i_cat, _ = self.fused_catalog_inputs(params, reprs,
                                                    batch_users)
        return score_and_topk(u_cat, i_cat,
                              self.pos_padded[batch_users], k=k,
                              n_items=self.n_items)


class LTRSimple(LTRCosine):
    """Eval-only concat scoring over a pretrained base
    (reference ``rejected_models.py:80-109``): no training happens; the
    CLI probes both item-text modes via ``probe_concat_scoring``."""


def probe_concat_scoring(cfg, data, trainer) -> dict[str, dict]:
    """Reference ``LTRSimple.fit`` (``rejected_models.py:101-109``):
    evaluate concat scoring with ``pos=avg`` then ``pos=kg`` over the
    loaded base.  Returns {mode: metrics}."""
    model = trainer.model
    results = {}
    orig = model.items_text_mode
    try:
        for mode in ('reviews', 'kg'):
            model.set_items_text_mode(mode)
            trainer._eval_fn = None  # items_text is captured state
            results[mode] = trainer.evaluate()
    finally:
        model.set_items_text_mode(orig)
        trainer._eval_fn = None
    return results
