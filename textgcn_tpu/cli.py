"""CLI entry point — TPU-native equivalent of reference ``main.py``.

Usage mirrors the reference:

    python -m textgcn_tpu --model lgcn --data data/dummy --epochs 100
    python -m textgcn_tpu --model ltr_linear --load_base runs/dummy/<uid> \
        --freeze

Drives: config parse -> seeding -> dataset load -> model build ->
optional --load / --load_base -> fit -> optional predict-and-save
(reference ``main.py:27-43``).
"""

from __future__ import annotations

import os

import jax

from .config import get_logger, parse_args, warn_footguns
from .registry import get_class
from .train.trainer import Trainer


def setup_compilation_cache():
    """Persistent XLA compilation cache (Pallas kernels compile via a slow
    remote service on some TPU hosts — measured 300s cold vs 44s cached).
    Disable with TEXTGCN_TPU_COMPILE_CACHE=0."""
    d = os.environ.get('TEXTGCN_TPU_COMPILE_CACHE',
                       os.path.expanduser('~/.cache/textgcn_tpu_jax'))
    if d and d != '0':
        try:
            jax.config.update('jax_compilation_cache_dir', d)
        except Exception:
            pass


def device_healthcheck(warn_after_s: float | None = None,
                       fail_after_s: float | None = None,
                       _probe=None) -> float:
    """Round-trip a scalar through the backend before touching data.

    Remote-attached accelerators (e.g. a TPU behind a relay) can wedge
    silently — a dead backend otherwise manifests as an indefinite hang
    with zero feedback on the very first device op.  Runs the probe in a
    thread: logs an ERROR after ``warn_after_s`` (env
    ``TEXTGCN_TPU_DEVICE_WARN_S``, default 60) and raises after
    ``fail_after_s`` (env ``TEXTGCN_TPU_DEVICE_TIMEOUT_S``, default 0 =
    wait forever).  Returns the probe round-trip in seconds.
    """
    import threading
    import time
    import logging

    log = logging.getLogger('textgcn_tpu')
    if warn_after_s is None:
        warn_after_s = float(os.environ.get('TEXTGCN_TPU_DEVICE_WARN_S',
                                            '60'))
    if fail_after_s is None:
        fail_after_s = float(
            os.environ.get('TEXTGCN_TPU_DEVICE_TIMEOUT_S', '0'))

    t0 = time.perf_counter()
    done = threading.Event()
    err: list[BaseException] = []

    def default_probe():
        import jax.numpy as jnp
        float(jnp.zeros(()) + 1.0)  # real scalar fetch round trip

    def probe():
        try:
            (_probe or default_probe)()
        except BaseException as e:  # surfaced on the main thread
            err.append(e)
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    warned = False
    tick = 5.0
    if fail_after_s:
        tick = min(tick, max(fail_after_s / 4.0, 0.02))
    while not done.wait(timeout=tick):
        waited = time.perf_counter() - t0
        if not warned and waited >= warn_after_s:
            # NOTE: must not call anything that touches the backend here
            # (jax.devices()/default_backend() would block too)
            log.error(
                'device backend unresponsive after %.0f s — a remote '
                'accelerator relay may be down; still waiting (set '
                'TEXTGCN_TPU_DEVICE_TIMEOUT_S to abort instead)', waited)
            warned = True
        if fail_after_s and waited >= fail_after_s \
                and not done.is_set():  # probe may land within the tick
            raise TimeoutError(
                f'device backend unresponsive after {waited:.0f} s '
                f'(TEXTGCN_TPU_DEVICE_TIMEOUT_S={fail_after_s:g})')
    if err:
        raise err[0]
    return time.perf_counter() - t0


def main(argv: list[str] | None = None):
    setup_compilation_cache()
    # explicit backend override (e.g. TEXTGCN_TPU_PLATFORM=cpu for a local
    # smoke run).  Applied via jax.config because some hosts install a
    # sitecustomize that overrides the JAX_PLATFORMS environment variable.
    platform = os.environ.get('TEXTGCN_TPU_PLATFORM')
    if platform:
        jax.config.update('jax_platforms', platform)
    cfg = parse_args(argv)
    if cfg.approx_topk:
        # serving opt-in: all retrieval sinks (catalog_top_k, sharded_topk)
        # read this at trace time (ops/retrieval.env_recall)
        os.environ['TEXTGCN_TPU_APPROX_TOPK'] = str(cfg.approx_topk)
    logger = get_logger(cfg)
    warn_footguns(cfg, logger)  # LTR base-not-loaded / not-frozen warnings
    loader, model_cls = get_class(cfg.model)
    logger.info('Class: %s', model_cls.__name__)
    logger.info('%s', cfg)

    mesh = None
    if cfg.mesh:
        from .parallel.multihost import maybe_initialize
        maybe_initialize()  # must precede any backend use
    # fail loud (not hang silently) when a remote-attached accelerator
    # backend is wedged — probes BEFORE the expensive data/layout build
    rtt = device_healthcheck()
    logger.info('Device backend ready (%.2f s probe)', rtt)
    if cfg.mesh:
        from .parallel.mesh import make_mesh, shard_model
        mesh = make_mesh(cfg.mesh_shape)
        logger.info('Mesh: %s', dict(mesh.shape))

    data = loader(cfg)
    if mesh is not None:
        data = data.padded_to(mesh.size)
    model = model_cls(cfg, data)
    if mesh is not None:
        model = shard_model(mesh, model)

    from .registry import BOOSTED_MODELS
    if cfg.model in BOOSTED_MODELS:
        from .models.ltr_boosted import BoostedTrainer
        trainer = BoostedTrainer(cfg, model, data, mesh=mesh)
    else:
        trainer = Trainer(cfg, model, data, mesh=mesh)

    if cfg.model == 'text_probe':
        # zero-training probe of the 4 text representation combos
        # (reference TestModel, text_joint_model.py:13-29)
        from .models.text_loss import probe_text_representations
        results = probe_text_representations(cfg, data, trainer)
        for combo, res in results.items():
            logger.info('probe %s: %s', combo, res)
        return trainer
    logger.info('Created model %s (%d users x %d items, %d edges)',
                cfg.uid, data.n_users, data.n_items, data.graph.n_edges)

    if cfg.resume:
        trainer.resume(cfg.resume)
    elif cfg.load:
        trainer.load(cfg.load)
    elif cfg.load_base:
        # warm-start from a pretrained LightGCN; the loaded base is
        # evaluated with plain GCN scoring before the head takes over
        # (reference ltr_models.py:66-68,175-179)
        if hasattr(model, 'score_with_head'):
            model.score_with_head = False
            trainer._eval_fn = None
            trainer.load(cfg.load_base)
            model.score_with_head = True
            trainer._eval_fn = None
        else:
            trainer.load(cfg.load_base)

    if cfg.model == 'ltr_simple':
        # zero-training concat-scoring probe over the loaded base
        # (reference LTRSimple.fit, rejected_models.py:101-109)
        assert cfg.load or cfg.load_base, \
            'ltr_simple probes a pretrained base: pass --load/--load_base'
        from .models.ltr_concat import probe_concat_scoring
        results = probe_concat_scoring(cfg, data, trainer)
        for mode, res in results.items():
            logger.info('concat probe pos=%s: %s', mode, res)
        return trainer

    if not cfg.no_train:
        if cfg.trace:
            from .utils.profiling import trace
            with trace(cfg.trace):
                trainer.fit()
        else:
            trainer.fit()
    if cfg.predict:
        trainer.predict(range(data.n_users), with_scores=True, save=True)
    if cfg.export_reprs:
        trainer.export_reprs()
    return trainer


if __name__ == '__main__':
    main()
