"""Multi-host runtime initialization.

Net-new layer (SURVEY.md §2.3: the reference is single-process).  On a
multi-host TPU slice, call ``maybe_initialize()`` before any other JAX use:
it runs ``jax.distributed.initialize`` when a coordinator is discoverable
(TPU pod metadata or explicit env vars) and is a no-op on a single host.

Conventions:
* mesh axes span all global devices; ``make_mesh`` in ``mesh.py`` already
  builds from ``jax.devices()`` (global after initialize);
* per-host data work (TSV ingest, text embedding) runs identically on each
  host — inputs are deterministic functions of the seed, so no broadcast
  is needed;
* checkpointing on a mesh should use the Orbax backend
  (``--ckpt_backend orbax``), which writes sharded arrays cooperatively;
* eval metrics are computed on host 0 from fully-replicated top-k outputs.

Failure recovery is restart-from-checkpoint: rerun the same command with
``--load runs/<...>`` after a host failure (reference has no counterpart).

Verified behavior (tests/test_multihost.py, real 2-process run against a
127.0.0.1 coordinator): env-var initialize, sharded step with the
framework's sharding conventions, cooperative Orbax save/restore, the
primary-only pickle/prediction guards, and the FULL mesh Trainer —
fit + evaluate + orbax checkpointing over the global device mesh with
identical losses/metrics on every process.  (Possible because every
jitted driver takes the model's device arrays as arguments — graph ops
are pytrees — instead of closing over them, which multi-controller JAX
forbids for global arrays.)
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger('textgcn_tpu')

_INITIALIZED = False


def maybe_initialize(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-host; returns whether
    a multi-process runtime is active.

    Resolution order: explicit args -> JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars -> TPU pod automatic
    discovery (argless initialize) when TPU env markers are present.
    """
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator = coordinator or os.environ.get('JAX_COORDINATOR_ADDRESS')
    num_processes = num_processes if num_processes is not None else \
        _int_env('JAX_NUM_PROCESSES')
    process_id = process_id if process_id is not None else \
        _int_env('JAX_PROCESS_ID')

    try:
        if coordinator and num_processes and process_id is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes, process_id=process_id)
            _INITIALIZED = True
        elif os.environ.get('TPU_WORKER_HOSTNAMES') and \
                _int_env('TPU_WORKER_ID') is not None and \
                ',' in os.environ.get('TPU_WORKER_HOSTNAMES', ''):
            jax.distributed.initialize()
            _INITIALIZED = True
    except Exception as e:
        log.warning('jax.distributed.initialize failed (%s); continuing '
                    'single-process', e)
    if _INITIALIZED:
        log.info('multi-host runtime: process %d/%d, %d global devices',
                 jax.process_index(), jax.process_count(),
                 len(jax.devices()))
    return _INITIALIZED and jax.process_count() > 1


def _int_env(name: str):
    v = os.environ.get(name)
    return int(v) if v is not None and v != '' else None


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0
