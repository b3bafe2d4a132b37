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

from .config import get_logger, parse_args
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


def main(argv: list[str] | None = None):
    setup_compilation_cache()
    cfg = parse_args(argv)
    if cfg.approx_topk:
        # serving opt-in: all retrieval sinks (catalog_top_k, sharded_topk)
        # read this at trace time (ops/retrieval.env_recall)
        os.environ['TEXTGCN_TPU_APPROX_TOPK'] = str(cfg.approx_topk)
    logger = get_logger(cfg)
    loader, model_cls = get_class(cfg.model)
    logger.info('Class: %s', model_cls.__name__)
    logger.info('%s', cfg)

    mesh = None
    if cfg.mesh:
        from .parallel.mesh import make_mesh, shard_model
        from .parallel.multihost import maybe_initialize
        maybe_initialize()
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
