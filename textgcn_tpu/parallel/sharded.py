"""Multi-chip training/eval steps over a (data, model) mesh.

The global-view program is identical to the single-chip path (same model
``loss``, same optimizer); parallelism comes from input placement:

* embedding tables row-sharded over ``model`` (mesh.py:param_shardings),
* edge arrays sharded over the whole mesh -> each device computes a partial
  segment-sum of its edge shard and XLA inserts the psum (the SpMM halo
  exchange of SURVEY.md §2.3),
* batches sharded over ``data`` -> gradient all-reduce inserted by GSPMD.

``make_sharded_train_step`` jits the step with explicit in/out shardings so
the compiled executable is a true SPMD program; ``sharded_topk`` does
catalog-sharded scoring with per-shard top-k + cross-shard merge via
``shard_map`` (the reference's single-device ``torch.topk`` has no
equivalent, reference ``base_model.py:261``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.retrieval import mask_train_items
from .mesh import DATA_AXIS, MODEL_AXIS, param_shardings


def make_sharded_train_step(mesh, model, optimizer):
    """One optimizer step, jitted over the mesh.

    Signature: ``step(params, opt_state, batch, key) ->
    (params, opt_state, loss)``.  Params/opt-state shardings are inferred
    from the committed inputs (see ``mesh.shard_params``); batch leaves are
    constrained onto `data` on their leading dim inside the step.

    The model's device arrays (graph op, positive tables) pass through
    jit as ARGUMENTS via ``captured_state``/``bound`` — closed-over
    global arrays would be illegal on multi-controller runs (see
    ops/spmm.py) and bloat single-host executables.
    """
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    def step(params, opt_state, batch, key, captured):
        batch = tuple(
            jax.lax.with_sharding_constraint(b, batch_sh) for b in batch)
        with model.bound(captured):
            (loss, aux), grads = jax.value_and_grad(
                model.loss, has_aux=True)(params, batch, key)
        # constrain grads to the params' row-sharding BEFORE the update:
        # the backward psum of the edge-partitioned propagation can then
        # reduce-scatter straight to each device's table rows instead of
        # materializing full-table all-reduces (docs/SCALING.md lever 1;
        # bytes halve for the dominant collective)
        grads = jax.lax.with_sharding_constraint(
            grads, param_shardings(mesh, grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, batch, key):
        return jitted(params, opt_state, batch, key,
                      model.captured_state())

    run.jitted = jitted  # exposed for HLO audits (tools/collective_audit)
    return run


def sharded_topk(mesh, users_emb, items_emb, batch_pos_padded, k: int,
                 n_valid: int | None = None,
                 approx: float | None = None):
    """Catalog-sharded scoring + distributed top-k.

    Items are sharded over `model`; each shard computes its local
    (B, n_items/shards) scores + local top-k with **global** item ids, then
    shards all-gather their k-candidates and merge.  ICI traffic is
    O(B * k * n_shards) instead of O(B * n_items).

    ``n_valid``: number of real items — global columns >= n_valid (the
    phantom rows added by table padding) are masked to -inf.

    ``approx``: serving-mode recall target in (0, 1) — the per-shard
    reduction uses the TPU-native ``lax.approx_max_k`` partial reduction
    instead of the exact sort (see ``ops.retrieval.catalog_top_k``); the
    cross-shard merge of the S*k survivors stays exact, so global recall
    is bounded below by the per-shard target.  ``None`` reads the
    ``TEXTGCN_TPU_APPROX_TOPK`` env opt-in (exact by default).
    """
    n_items = items_emb.shape[0]
    n_valid = n_items if n_valid is None else n_valid
    if approx is None:
        from ..ops.retrieval import env_recall
        approx = env_recall()
    use_approx = 0.0 < approx < 1.0

    # catalog over the FULL mesh when the row count divides it (matching
    # param_shardings' model-major table layout, so propagated item
    # tables feed in as local slices); `model`-only otherwise
    catalog_axes = ((MODEL_AXIS, DATA_AXIS)
                    if n_items % mesh.size == 0 else (MODEL_AXIS,))
    n_data = mesh.shape[DATA_AXIS]

    def local(users_emb, items_shard, pos_padded):
        shard_idx = jax.lax.axis_index(MODEL_AXIS)
        if len(catalog_axes) == 2:   # model-major flat shard index
            shard_idx = shard_idx * n_data + jax.lax.axis_index(DATA_AXIS)
        shard_size = items_shard.shape[0]
        offset = shard_idx * shard_size
        # serving mode emits bf16 local scores — the per-shard batch is
        # HBM-bound on the (B, shard) matrix (see ops.retrieval
        # score_and_topk); the cross-shard merge compares bf16 values
        out_t = jnp.bfloat16 if use_approx else jnp.float32
        scores = jnp.dot(users_emb, items_shard.T,
                         preferred_element_type=out_t)
        # mask phantom (padding) catalog columns
        global_col = offset + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1)
        scores = jnp.where(global_col < n_valid, scores, -jnp.inf)
        # mask train items that fall in this shard: translate global pos
        # ids into local coords, clamp others to the padding column
        local_pos = pos_padded - offset
        local_pos = jnp.where(
            (local_pos >= 0) & (local_pos < shard_size), local_pos,
            shard_size)
        scores = mask_train_items(scores, local_pos, shard_size)
        kk = min(k, shard_size)
        if use_approx:
            vals, idx = jax.lax.approx_max_k(scores, kk,
                                             recall_target=approx)
        else:
            vals, idx = jax.lax.top_k(scores, kk)
        idx = idx + offset
        # gather candidates from all shards and merge
        all_vals = jax.lax.all_gather(vals, catalog_axes)   # (S, B, k)
        all_idx = jax.lax.all_gather(idx, catalog_axes)
        s, b, kk = all_vals.shape
        flat_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(b, s * kk)
        flat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(b, s * kk)
        top_v, pos = jax.lax.top_k(flat_v, k)
        return (top_v.astype(jnp.float32),
                jnp.take_along_axis(flat_i, pos, axis=1))

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(catalog_axes, None), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return fn(users_emb, items_emb, batch_pos_padded)
