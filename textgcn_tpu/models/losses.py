"""BPR + L2 regularization losses.

Exact functional reproduction of reference ``base_model.py:181-210``:

* BPR: ``mean_over_neg_columns( mean_over_batch( selu(neg_score - pos_score) ) )``
  (reference loops neg columns and divides by ``len(negs)``,
  ``base_model.py:186-198``).
* Reg: ``reg_lambda * (Σ‖E_u[users]‖² + Σ‖E_i[pos]‖² + Σ‖E_i[negs]‖²)
  / len(users) / 2`` — note the reference's ``.norm(2).pow(2).mean()`` on
  the stacked negatives is a squared Frobenius norm (a scalar), so the
  ``.mean()`` is a no-op and all negative samples contribute their full sum
  of squares (``base_model.py:200-210``).  Regularization acts on the
  **layer-0** embedding tables, not the propagated representations.

Both take a per-sample validity mask so the padded tail batch produced by
``ops.sampling.batch_epoch`` reproduces the reference's ragged final batch
exactly (masked mean == mean over true samples).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x, mask):
    denom = jnp.maximum(mask.sum(), 1.0)
    return jnp.where(mask, x, 0.0).sum() / denom


def bpr_loss(pos_scores, neg_scores, mask):
    """``pos_scores``: (B,); ``neg_scores``: (B, n_neg); ``mask``: (B,)."""
    diff = jax.nn.selu(neg_scores - pos_scores[:, None])
    per_neg = jnp.where(mask[:, None], diff, 0.0).sum(axis=0)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (per_neg / denom).mean()


def reg_loss(user_emb0, item_emb0, users, pos, negs, mask, reg_lambda):
    """L2 regularization on the gathered layer-0 embedding rows."""
    m = mask.astype(user_emb0.dtype)
    u_sq = (jnp.square(user_emb0[users]).sum(axis=1) * m).sum()
    p_sq = (jnp.square(item_emb0[pos]).sum(axis=1) * m).sum()
    n_sq = (jnp.square(item_emb0[negs]).sum(axis=2).sum(axis=1) * m).sum()
    count = jnp.maximum(mask.sum(), 1.0)
    return reg_lambda * (u_sq + p_sq + n_sq) / count / 2.0
