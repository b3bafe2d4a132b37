"""Dynamic (adversarial) negative sampling — TPU-native AdvSampl.

Capability match for reference ``TextGCN/advanced_sampling.py:10-69``: per
training example, score ``min(n_items, 1000)`` random candidate items for
the user, discard candidates that are positives, keep the ``max(k)``
highest-scoring (hardest) negatives, pair them with ``pos_samples = 5``
random positives, and run the expanded (user, pos, neg) batch through the
standard BPR + reg loss.

The reference does the selection in a per-user Python loop with
sort/set-subtraction/cartesian_prod on the host
(``advanced_sampling.py:61-67`` — its known bottleneck).  Here selection is
one fused device computation: ONE full-catalog MXU matmul, a Bernoulli
candidate mask, train-positive masking to -inf, and a single
``lax.top_k`` — no host round-trips, no per-candidate row gathers, no
dynamic shapes.

Deliberate deviations (documented, behavior-neutral at real scale): the
candidate set is Bernoulli(p = 1000/n_items) per (user, item) — the same
expected 1000 uniform candidates as the reference's `random.sample`, with
binomial count variance; the 5 positives are drawn with replacement; the
(pos, neg) cartesian loss is computed broadcasted over a (B, P, K) grid
rather than a materialized expanded batch (numerically identical — see
test_expanded_loss_matches_flat_expansion); hard-negative selection on
catalogs >= 4096 uses ``lax.approx_max_k`` at recall 0.95 (exactness is
not part of the sampling contract — see ``ops/retrieval.mining_top_k``;
``TEXTGCN_TPU_ADV_TOPK=exact`` restores ``lax.top_k``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.retrieval import NEG_INF, mask_train_items, mining_top_k
from .lightgcn import LightGCN

POS_SAMPLES = 5          # reference advanced_sampling.py:12
MAX_NEG_CANDIDATES = 1000  # reference advanced_sampling.py:13


class AdvSamplModel(LightGCN):

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.n_candidates = min(self.n_items, MAX_NEG_CANDIDATES)
        self.pos_samples = POS_SAMPLES
        self.n_hard_negs = min(max(cfg.k), self.n_candidates)

    # --- epoch sampling: user rows only --------------------------------------
    # candidates are i.i.d. uniform (reference draws them per example,
    # advanced_sampling.py:21-22), so they are generated per batch inside
    # the loss instead of materializing an (epoch, 1000) candidate matrix
    # (which would be GBs at production scale)

    def sample_batches(self, key, batch_size: int):
        n_users = self.n_users
        n = self.iterable_len
        users = jnp.repeat(jnp.arange(n_users, dtype=jnp.int32),
                           self.bucket_len)
        perm = jax.random.permutation(key, n)
        users = users[perm]

        n_batches = self.num_batches(batch_size)
        padded = n_batches * batch_size
        pad = padded - n
        mask = jnp.arange(padded) < n
        users = jnp.pad(users, (0, pad)).reshape(n_batches, batch_size)
        return users, mask.reshape(n_batches, batch_size)

    # --- loss ---------------------------------------------------------------

    def loss(self, params, batch, dropout_key):
        """Rank candidates, select hard negatives, expanded BPR loss.

        Mirrors the two-propagation structure of the reference: the ranking
        pass (``advanced_sampling.py:55``) and the loss pass inside
        ``super().get_loss`` (``base_model.py:188``) each run their own
        dropout propagation; the ranking pass carries no gradient.
        """
        users, mask = batch
        k_rank, k_loss, k_pos, k_cand = jax.random.split(dropout_key, 4)
        keep = jax.random.bernoulli(
            k_cand, self.n_candidates / self.n_items,
            (users.shape[0], self.n_items))
        ridx = jax.random.randint(
            k_pos, (users.shape[0], self.pos_samples), 0, 1 << 30)
        return self._loss_given(params, users, mask, keep, ridx,
                                k_rank, k_loss)

    def _loss_given(self, params, users, mask, keep, ridx, k_rank, k_loss):
        """Selection + expanded loss with the random draws (candidate keep
        mask, positive indices) passed in — the seam the golden torch
        oracle drives with shared randomness (tests/test_torch_parity.py).
        """
        # ranking pass (no gradient, fresh dropout draw)
        rank_reprs = jax.tree.map(
            jax.lax.stop_gradient,
            self.representation(params, training=True, dropout_key=k_rank))
        users_r, items_r = rank_reprs

        # score the full catalog with ONE MXU matmul and restrict to a
        # random candidate subset with a Bernoulli mask.  The reference
        # gathers 1000 explicit random candidates per user
        # (advanced_sampling.py:21-22,58) — on TPU that is 2M latency-bound
        # row gathers per batch; masking E[candidates]=n_candidates items
        # out of a (B, catalog) score matrix is the same selection in
        # expectation with zero gathers.
        # bf16 scores: mining needs no exactness (the candidate set is a
        # Bernoulli draw) and the (B, catalog) matrix traffic dominates
        # once the reduction is approx — same rationale as the serving
        # path (ops/retrieval.score_and_topk); slicing items_r drops the
        # phantom table-padding columns before they are ever computed
        scores = jnp.dot(users_r[users], items_r[:self.n_items].T,
                         preferred_element_type=jnp.bfloat16)
        scores = mask_train_items(scores, self.pos_padded[users],
                                  self.n_items)      # positives
        scores = jnp.where(keep, scores, NEG_INF.astype(scores.dtype))

        # hardest negatives: top-K of masked scores (global item ids);
        # approx_max_k on large catalogs — mining needs no exactness
        # (ops/retrieval.mining_top_k)
        top_scores, negs = mining_top_k(scores, self.n_hard_negs)
        neg_valid = top_scores > NEG_INF                    # (B, K)

        # random positives (with replacement) per user
        deg = jnp.maximum(self.pos_degree[users], 1)
        pos = jnp.take_along_axis(
            self.pos_padded[users], (ridx % deg[:, None]).astype(jnp.int32),
            axis=1)                                         # (B, P)

        # loss pass (fresh dropout draw, carries the gradient) over every
        # (pos_j, neg_k) pairing per user — computed broadcasted instead of
        # materializing the B*P*K expanded index arrays the reference
        # builds (advanced_sampling.py:66-69): identical math, ~4x fewer
        # embedding-row gathers
        users_repr, items_repr = self.representation(
            params, training=True, dropout_key=k_loss)
        l_bpr, l_reg = self._expanded_loss(
            params, users_repr, items_repr, users, pos, negs, mask,
            neg_valid)
        return l_bpr + l_reg, {'bpr': l_bpr, 'reg': l_reg}

    def _expanded_loss(self, params, users_repr, items_repr, users, pos,
                       negs, mask, neg_valid):
        """BPR + reg over the (B, P, K) pairing grid, equal to running the
        base losses on the flat expanded batch."""
        p, k = pos.shape[1], negs.shape[1]
        u_emb = users_repr[users]                         # (B, d)
        pos_s = jnp.einsum('bd,bpd->bp', u_emb, items_repr[pos])
        neg_s = jnp.einsum('bd,bkd->bk', u_emb, items_repr[negs])
        diff = jax.nn.selu(neg_s[:, None, :] - pos_s[:, :, None])
        pair_mask = jnp.broadcast_to(
            mask[:, None, None] & neg_valid[:, None, :], diff.shape)
        denom = jnp.maximum(pair_mask.sum(), 1.0)
        l_bpr = jnp.where(pair_mask, diff, 0.0).sum() / denom

        # reg: each expanded row contributes its user/pos/neg layer-0
        # squared norms; per-user pair multiplicities replace the repeat
        m = mask.astype(jnp.float32)
        kv = neg_valid.sum(axis=1).astype(jnp.float32)    # valid negs/user
        u_sq = (jnp.square(params['user_emb'][users]).sum(1)
                * m * p * kv).sum()
        p_sq = (jnp.square(params['item_emb'][pos]).sum(2).sum(1)
                * m * kv).sum()
        n_sq = ((jnp.square(params['item_emb'][negs]).sum(2)
                 * neg_valid).sum(1) * m * p).sum()
        l_reg = self.reg_lambda * (u_sq + p_sq + n_sq) / denom / 2.0
        return l_bpr, l_reg
