"""Device mesh + sharding conventions.

Net-new layer with no reference counterpart (the reference is single-device,
``parser.py:172-174``; SURVEY.md §2.3).  The framework uses a 2D
``(data, model)`` mesh:

* ``data`` — data parallelism: training batches and eval user batches are
  sharded on their batch dimension; gradient reduction happens via XLA
  collectives inserted by GSPMD.
* ``model`` — model parallelism: embedding tables are row-sharded, the
  graph edge list is sharded for partial segment-sums, and the item catalog
  is sharded for batchwise scoring / distributed top-k.

Design follows the "pick a mesh, annotate shardings, let XLA insert the
collectives" recipe: everything stays a single global-view jitted program;
placement is expressed by committing arrays with ``NamedSharding`` and XLA
chooses the all-gather/psum/all-to-all schedule over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def collective_dtype():
    """Payload dtype for the propagation reduce-scatters.

    The kernels already consume bf16 tables at DEFAULT matmul precision
    (``ops/pallas_spmm.TiledSpMM``), so moving the partial sums over the
    wire in bf16 halves collective bytes at no additional information
    loss in the values — only the cross-device combine itself runs in
    bf16 (≈log2(n_dev)/2 extra mantissa-bit noise on the sum).  Measured
    quality-neutral on the sharp 5k mesh-vs-single recipe and worth
    S2 78% → ~88% no-overlap scaling efficiency (docs/SCALING.md §4b).
    ``TEXTGCN_TPU_RS_DTYPE=f32`` opts out; HIGHEST matmul precision
    (TEXTGCN_TPU_PALLAS_PRECISION=highest) defaults out, matching the
    f32 table path.
    """
    import os

    import jax.numpy as jnp

    env = os.environ.get('TEXTGCN_TPU_RS_DTYPE', '')
    if env in ('f32', 'float32'):
        return jnp.float32
    if env in ('bf16', 'bfloat16'):
        return jnp.bfloat16
    from ..ops.pallas_spmm import PRECISION
    return (jnp.bfloat16 if PRECISION == jax.lax.Precision.DEFAULT
            else jnp.float32)


def _auto_shape(n: int) -> tuple[int, int]:
    """Split n devices into (data, model): model gets the largest
    power-of-two divisor <= sqrt(n); data gets the rest.

    Power-of-two only: the pallas backend pads tables to power-of-two
    multiples (4096), so a non-power-of-two model axis (e.g. 3 on a
    9-device mesh) would not divide the table padding evenly.
    """
    best = 1
    while n % (best * 2) == 0 and (best * 2) ** 2 <= n:
        best *= 2
    return (n // best, best)


def get_devices(min_count: int = 1):
    """Devices for mesh construction; falls back to the (virtual) CPU
    platform when the default platform has too few chips."""
    devs = jax.devices()
    if len(devs) >= min_count:
        return devs
    try:
        cpu = jax.devices('cpu')
        if len(cpu) >= min_count:
            return cpu
    except RuntimeError:
        pass
    return devs


def make_mesh(shape: tuple[int, int] | None = None,
              devices=None) -> Mesh:
    """Build the (data, model) mesh.  ``shape=(0,0)`` or None = auto."""
    if shape is not None and shape != (0, 0):
        n = shape[0] * shape[1]
        devices = devices if devices is not None else get_devices(n)
        assert len(devices) >= n, \
            f'need {n} devices for mesh {shape}, have {len(devices)}'
        arr = np.array(devices[:n]).reshape(shape)
    else:
        devices = devices if devices is not None else jax.devices()
        arr = np.array(devices).reshape(_auto_shape(len(devices)))
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# --- canonical shardings ----------------------------------------------------

def param_shardings(mesh: Mesh, params):
    """Embedding tables row-sharded over the FULL mesh (model-major);
    everything else (LTR tower etc.) replicated.

    Sharding tables over both axes (not just `model`) does two things:
    per-chip table memory drops by the data-axis size too, and — with
    the explicit reduce-scatter propagation (xla_sharded.py /
    pallas_sharded.py) — the backward's row-sharded table gradient is
    ALREADY in this sharding, so the Adam update adds zero collectives
    (SCALING.md lever 1).  Model-major order means a P('model')-sharded
    array reshards into this layout as a local slice."""
    table = NamedSharding(mesh, P((MODEL_AXIS, DATA_AXIS), None))
    repl = NamedSharding(mesh, P())

    def pick(path, _):
        name = path[0].key if path else ''
        return table if name in ('user_emb', 'item_emb') else repl

    return jax.tree_util.tree_map_with_path(pick, params)


def graph_shardings(mesh: Mesh, graph_arrays):
    """Edge arrays sharded over the full mesh (edge-partitioned SpMM)."""
    edge = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
    return {k: edge for k in graph_arrays}


def batch_sharding(mesh: Mesh):
    """Per-epoch batch arrays: (n_batches, batch, ...) — batch dim over
    `data`."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_model(mesh: Mesh, model, propagation: str = 'auto'):
    """Commit a model's device arrays to the mesh in-place.

    Propagation backend on the mesh:

    * ``pallas`` — source-sharded, edge-partitioned Pallas kernel per
      device under shard_map + psum (``parallel/pallas_sharded.py``);
      each chip holds only its 1/n_devices slice of the source table, so
      the fast kernel serves tables n_devices times the per-chip VMEM
      budget.
    * ``xla`` — GSPMD-partitioned sorted-segment-sum (edge arrays
      explicitly sharded over the whole mesh).
    * ``auto`` — pallas when the single-chip backend already chose pallas
      and the per-device table slices divide evenly and fit VMEM; xla
      otherwise.
    """
    from .pallas_sharded import MeshPallasGraphOp
    eu, ei, w = model._edges

    if 'graph_op' not in getattr(model, 'captured_attrs', ('graph_op',)):
        # edge-native family (conv): propagates on raw edge arrays, never
        # through the SpMM op — skip the layout build and pin the
        # GSPMD-partitioned segment formulation (the single-chip conv
        # kernel path is not mesh-aware)
        model.backend = 'xla'
        if hasattr(model, 'conv_op'):
            model.conv_op = None
        repl = replicated(mesh)
        model.pos_padded = jax.device_put(model.pos_padded, repl)
        model.pos_degree = jax.device_put(model.pos_degree, repl)
        model.conv_edges = jax.device_put(model.conv_edges, repl)
        return model

    fits = True
    if hasattr(model, 'cfg'):
        fits = MeshPallasGraphOp.supports(
            model.n_users_t, model.n_items_t, model.cfg.emb_size,
            mesh.size)
    use_pallas = propagation == 'pallas' or (
        propagation == 'auto' and model.backend == 'pallas' and fits)

    if use_pallas:
        model.graph_op = MeshPallasGraphOp(
            eu, ei, w, model.n_users_t, model.n_items_t,
            model.cfg.emb_size, mesh)
        model.backend = 'pallas_mesh'
    else:
        from .xla_sharded import MeshXlaGraphOp
        if MeshXlaGraphOp.supports(model.n_users_t, model.n_items_t,
                                   mesh.size):
            # explicit shard_map segment-sum: fwd/bwd partial sums
            # combine with reduce-scatter, not GSPMD all-reduce
            # (SCALING.md lever 1)
            model.backend = 'xla_mesh'
            model.graph_op = MeshXlaGraphOp(
                eu, ei, w, model.n_users_t, model.n_items_t, mesh)
        else:
            # tables don't divide the mesh evenly: GSPMD-partitioned
            # segment-sum fallback (edge arrays explicitly sharded)
            from ..ops.spmm import BipartiteGraphOp
            model.backend = 'xla'
            model.graph_op = BipartiteGraphOp(
                eu, ei, w, model.n_users_t, model.n_items_t,
                pad_multiple=mesh.size)
            edge_sh = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
            model.graph_op.put({k: edge_sh for k in model.graph_op.arrays})
    repl = replicated(mesh)
    model.pos_padded = jax.device_put(model.pos_padded, repl)
    model.pos_degree = jax.device_put(model.pos_degree, repl)
    for name in ('items_as_desc', 'items_as_avg_reviews',
                 'users_as_avg_reviews', 'users_as_avg_desc',
                 'popularity_users', 'popularity_items',
                 'users_text', 'items_text', 'conv_edges'):
        if hasattr(model, name):
            setattr(model, name,
                    jax.device_put(getattr(model, name), repl))
    return model


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, param_shardings(mesh, params))
