"""Typed configuration for the TPU-native TextGCN framework.

Reproduces the flag surface of the reference CLI (reference:
``TextGCN/parser.py:11-201``) as a frozen dataclass plus an argparse
front-end.  Flag names are part of the capability contract, so every
reference flag exists here with the same name and default, with two
deliberate fixes documented in SURVEY.md:

* ``--save`` in the reference is ``store_false`` (passing it *disables*
  saving, reference ``parser.py:60-62``).  We keep saving ON by default and
  expose ``--no_save`` to disable it; ``--save`` is accepted as a no-op for
  drop-in compatibility.
* device selection: the reference sets ``CUDA_VISIBLE_DEVICES`` and picks a
  single ``torch.device`` (``parser.py:172-174``).  Here the accelerator is
  owned by JAX; ``--mesh`` describes the (data, model) device mesh instead.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import time
from dataclasses import dataclass, field


MODEL_CHOICES = (
    'lgcn',          # LightGCN (BaseModel in the reference)
    'adv_sampling',  # dynamic negative sampling
    'ltr_linear',    # LTR linear head over GCN + text features
    'ltr_pop',       # LTR linear head + popularity features
    # text-loss family (bit-rotted in the reference — SURVEY.md Q3 —
    # implemented working here)
    'text',          # joint reviews+KG semantic-loss model
    'kg',            # semantic loss w/ description reprs
    'reviews',       # semantic loss w/ mean-review reprs
    'text_probe',    # zero-training eval of the 4 text repr combos
    # gradient-boosted heads (unreachable in the reference main.py;
    # runnable here, xgboost degrades to sklearn GBRT when absent)
    'xgboost', 'gbdt', 'xgboost_pop', 'gbdt_pop',
    'marcus',        # per-positive negative-sampling tree head
    # text-concat scoring family (reference rejected_models.py:45-109 —
    # dead code there, runnable here)
    'ltr_reviews',   # LightGCN from scratch, score in [gnn ++ review-text]
    'ltr_kg',        # ... score in [gnn ++ description-text]
    'ltr_simple',    # zero-training concat-scoring probe over a loaded base
    # graph-conv layer variants (reference rejected_models.py:7-42 —
    # torch_geometric there, segment-op convs here)
    'gcn', 'graphsage', 'gat', 'gatv2',
)

# conv variants require an explicit --aggr (reference parser.py:196-197)
CONV_MODELS = ('gcn', 'graphsage', 'gat', 'gatv2')

# LTR heads meant to run over a pretrained, frozen LightGCN base; training
# them from scratch / unfrozen is the foot-gun the reference warns about
# (parser.py:179-183).  The boosted heads share the same contract.
LTR_WARN_MODELS = ('ltr_linear', 'ltr_pop', 'ltr_simple',
                   'xgboost', 'gbdt', 'xgboost_pop', 'gbdt_pop', 'marcus')


@dataclass
class Config:
    # --- model / data ------------------------------------------------------
    model: str = 'lgcn'
    data: str = 'data/dummy/'
    uid: str | None = None

    # --- training regime (defaults mirror reference parser.py:31-118) ------
    epochs: int = 1000
    emb_size: int = 64
    neg_samples: int = 1
    batch_size: int = 2048
    evaluate_every: int = 25
    k: tuple[int, ...] = (20, 40)
    lr: float = 1e-3
    reg_lambda: float = 1e-4
    dropout: float = 0.4
    n_layers: int = 3
    single: bool = False          # use only last layer instead of layer mean

    # --- LTR ---------------------------------------------------------------
    ltr_layers: tuple[int, ...] = ()
    freeze: bool = False
    load_base: str | None = None

    # --- persistence -------------------------------------------------------
    save: bool = True
    load: str | None = None
    no_train: bool = False
    predict: bool = False
    resume: str | None = None     # crash-resume from a run dir: restores
                                  # params + optimizer state + RNG + epoch
                                  # + metrics — the continuation is
                                  # identical to an uninterrupted run
    resume_state: bool = True     # write resume_state alongside each
                                  # latest checkpoint (--no_resume_state
                                  # skips the extra ~2x-params write)

    # --- text pipeline (reference parser.py:126-145) ------------------------
    emb_batch_size: int = 256
    bert_model: str = 'all-MiniLM-L6-v2'
    sep: str = '[SEP]'

    # --- text-loss family knobs (reference consumes these via
    # ``text_base_model.py:15,22`` and ``reviews_models.py:121-128``; its
    # parser has them commented out, ``parser.py:146-159`` — here they are
    # first-class flags with the reference defaults) ---------------------------
    weight: str = '1'             # semantic-loss weight formula (or the
                                  # reference's combined '<weight>_<distance>')
    distance: str = '|b-g|'       # semantic-loss distance formula
    dist_fn: str = 'euclid'       # 'euclid' | 'cosine_minus'
    pos: str = 'avg'              # positive-item text repr: user|avg|kg
    neg: str = 'avg'              # negative-item text repr: avg|kg
    popularity_mode: str = 'fixed'  # 'fixed' (true normalized counts) or
                                    # 'compat' (reference's literal formula,
                                    # SURVEY.md Q2)
    aggr: str | None = None       # neighbor aggregation for the graphsage
                                  # conv variant: mean|sum|max (reference
                                  # --aggr, parser.py:123-125/:197)

    # --- serving / ops -------------------------------------------------------
    export_reprs: bool = False    # after training, write propagated
                                  # user/item representations (and LTR
                                  # catalog factors) as .npy for external
                                  # ANN/serving systems
    trace: str = ''               # capture a jax.profiler device trace of
                                  # training into this directory
                                  # (TensorBoard-readable)

    # --- misc --------------------------------------------------------------
    seed: int = 0
    reshuffle: bool = False
    quiet: bool = False
    logging_level: str = 'info'
    slurm: bool = False

    # --- TPU-native additions (no reference counterpart, SURVEY.md §2.3) ----
    mesh: str = ''                # "2x4" -> (data=2, model=4); 'auto' =
                                  # all devices, auto shape; '' = 1-chip
    data_axis: str = 'data'
    model_axis: str = 'model'
    param_dtype: str = 'float32'
    compute_dtype: str = 'float32'
    use_pallas: bool = True       # Pallas SpMM kernel on TPU; XLA segment-sum otherwise
    precompute_adjacency: bool = True
    ckpt_backend: str = 'pickle'  # 'pickle' (reference .pkl contract) or
                                  # 'orbax' (sharded arrays, mesh runs)
    approx_topk: float = 0.0      # serving mode: retrieval via the TPU
                                  # partial reduction (lax.approx_max_k) at
                                  # this recall target; 0 = exact (default)
    steps_per_call: int = 0       # split the jitted epoch scan into device
                                  # calls of at most this many steps (0 =
                                  # whole epoch in one call); identical
                                  # math/RNG — bounds device-call runtime
                                  # for preemption/relay robustness
    refresh_every: int = 0        # cached propagation: recompute the
                                  # propagated (non-ego) part every N train
                                  # steps, fresh ego term in between
                                  # (decoupled-propagation approximation);
                                  # 0 = exact per-step propagation (default,
                                  # reference semantics)

    # --- derived (filled by finalize()) -------------------------------------
    save_path: str = field(default='', compare=False)

    def finalize(self) -> 'Config':
        """Derive save_path / sort k / clamp eval cadence.

        Mirrors the post-parse enrichment at reference ``parser.py:161-192``
        (save_path = runs/<dataset-basename>/<uid>, sorted k,
        evaluate_every clamped to epochs).
        """
        cfg = dataclasses.replace(self)
        object.__setattr__(cfg, 'k', tuple(sorted(cfg.k)))
        data = os.path.join(cfg.data, '')
        object.__setattr__(cfg, 'data', data)
        uid = cfg.uid or time.strftime('%m-%d-%Hh%Mm%Ss')
        object.__setattr__(cfg, 'uid', uid)
        if not cfg.save_path:
            base = os.path.basename(os.path.dirname(data))
            object.__setattr__(cfg, 'save_path', os.path.join('runs', base, uid))
        if cfg.evaluate_every > cfg.epochs:
            object.__setattr__(cfg, 'evaluate_every', cfg.epochs)
        return cfg

    def validate(self) -> None:
        assert self.model in MODEL_CHOICES, f'unknown model {self.model!r}'
        assert self.load is None or self.load_base is None, \
            'cannot load both base and trained model'  # reference parser.py:201
        assert self.resume is None or (self.load is None
                                       and self.load_base is None), \
            '--resume restores full trainer state; it excludes ' \
            '--load/--load_base'
        assert 0.0 <= self.dropout < 1.0
        assert self.epochs >= 1 and self.batch_size >= 1
        assert self.evaluate_every >= 1, \
            'evaluate_every must be a positive epoch interval'
        assert 0.0 <= self.approx_topk < 1.0, \
            'approx_topk is a recall target in [0, 1); 0 disables'
        assert self.refresh_every >= 0
        assert not (self.refresh_every and self.single), \
            'cached propagation (--refresh_every) requires the layer-mean ' \
            'combination; --single has no ego term to keep fresh'
        if self.model in CONV_MODELS:
            # the reference demands an explicit aggregator for the conv
            # family (parser.py:196-197) rather than a silent default
            assert self.aggr is not None, \
                f'--aggr is required for conv model {self.model!r}: ' \
                f'pass one of mean|sum|max'

    @property
    def mesh_shape(self) -> tuple[int, int]:
        """Parse ``--mesh AxB`` into (data, model) sizes; (0, 0) = auto.

        ``--mesh auto`` enables the mesh path with an auto-derived shape
        over all visible devices (largest power-of-two divisor <= sqrt(n)
        on the model axis, see ``parallel.mesh._auto_shape``)."""
        if not self.mesh or self.mesh.lower() == 'auto':
            return (0, 0)
        a, b = self.mesh.lower().split('x')
        return (int(a), int(b))


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description='TPU-native TextGCN framework')
    d = Config()
    from . import __version__
    p.add_argument('--version', action='version',
                   version=f'textgcn-tpu {__version__}')
    p.add_argument('--model', required=True, choices=MODEL_CHOICES)
    p.add_argument('--data', '-d', default=d.data)
    p.add_argument('--uid', type=str, default=None)
    p.add_argument('--epochs', '-e', type=int, default=d.epochs)
    p.add_argument('--emb_size', type=int, default=d.emb_size)
    p.add_argument('--neg_samples', type=int, default=d.neg_samples)
    p.add_argument('--batch_size', type=int, default=d.batch_size)
    p.add_argument('--evaluate_every', '--eval_every', type=int,
                   default=d.evaluate_every)
    p.add_argument('-k', type=int, nargs='*', default=list(d.k))
    p.add_argument('--lr', type=float, default=d.lr)
    p.add_argument('--reg_lambda', type=float, default=d.reg_lambda)
    p.add_argument('--dropout', type=float, default=d.dropout)
    p.add_argument('--n_layers', type=int, default=d.n_layers)
    p.add_argument('--single', action='store_true')
    p.add_argument('--ltr_layers', type=int, nargs='*', default=[])
    p.add_argument('--freeze', action='store_true')
    p.add_argument('--load_base', type=str, default=None)
    p.add_argument('--no_save', action='store_true',
                   help='disable checkpointing (saving is on by default)')
    p.add_argument('--save', action='store_true',
                   help='accepted for reference CLI compatibility (no-op)')
    p.add_argument('--load', type=str, default=None)
    p.add_argument('--resume', type=str, default=None,
                   help='crash-resume from a run dir: restores params, '
                        'optimizer state, RNG, epoch, and metrics; the '
                        'continuation is identical to an uninterrupted '
                        'run (requires the same config)')
    p.add_argument('--no_resume_state', action='store_true',
                   help='skip writing resume_state alongside latest '
                        'checkpoints')
    p.add_argument('--no_train', action='store_true')
    p.add_argument('--predict', action='store_true')
    p.add_argument('--emb_batch_size', type=int, default=d.emb_batch_size)
    p.add_argument('--bert_model', type=str, default=d.bert_model)
    p.add_argument('--separator', '--sep', dest='sep', type=str, default=d.sep)
    p.add_argument('--weight', type=str, default=d.weight,
                   help="semantic-loss weight formula; accepts the "
                        "reference's combined '<weight>_<distance>' form")
    p.add_argument('--distance', type=str, default=d.distance,
                   help='semantic-loss distance formula, e.g. |b-g|')
    p.add_argument('--dist_fn', default=d.dist_fn,
                   choices=['euclid', 'cosine_minus'])
    p.add_argument('--pos', default=d.pos, choices=['user', 'avg', 'kg'],
                   help='text repr of positive items in sampled triplets')
    p.add_argument('--neg', default=d.neg, choices=['avg', 'kg'],
                   help='text repr of negative items in sampled triplets')
    p.add_argument('--popularity_mode', default=d.popularity_mode,
                   choices=['fixed', 'compat'])
    p.add_argument('--gpu', type=str, default='',
                   help='accepted for reference CLI compatibility; device '
                        'selection is owned by JAX (see --mesh)')
    p.add_argument('--seed', type=int, default=d.seed)
    p.add_argument('--reshuffle', action='store_true')
    p.add_argument('--quiet', '-q', action='store_true')
    p.add_argument('--logging_level', default=d.logging_level,
                   choices=['debug', 'info', 'warn', 'error'])
    p.add_argument('--slurm', action='store_true')
    p.add_argument('--mesh', type=str, default=d.mesh,
                   help="device mesh as 'DATAxMODEL' (e.g. 2x4) or 'auto' "
                        "for all visible devices with an auto-derived shape")
    p.add_argument('--no_pallas', action='store_true')
    p.add_argument('--ckpt_backend', default=d.ckpt_backend,
                   choices=['pickle', 'orbax'])
    p.add_argument('--approx_topk', type=float, default=d.approx_topk,
                   help='serving mode: retrieval top-k via the TPU-native '
                        'approx_max_k partial reduction at this recall '
                        'target (e.g. 0.95); 0 = exact (default)')
    p.add_argument('--steps_per_call', type=int, default=d.steps_per_call,
                   help='cap train steps per jitted device call (0 = whole '
                        'epoch in one call); identical math, bounds '
                        'device-call runtime')
    p.add_argument('--export_reprs', action='store_true',
                   help='write propagated user/item representations (and '
                        'LTR catalog factors) as .npy into the run dir '
                        'for external ANN/serving systems')
    p.add_argument('--trace', type=str, default=d.trace,
                   help='capture a jax.profiler device trace of training '
                        'into this directory')
    p.add_argument('--aggr', '--aggregator', dest='aggr', default=d.aggr,
                   choices=['mean', 'sum', 'max'],
                   help='neighbor aggregation for the graphsage conv '
                        'variant (reference parser.py:123-125)')
    p.add_argument('--refresh_every', type=int, default=d.refresh_every,
                   help='cached propagation: refresh the propagated part '
                        'every N steps instead of per step (throughput '
                        'mode, approximate gradients); 0 = exact (default)')
    return p


def parse_args(argv: list[str] | None = None) -> Config:
    ns = build_argparser().parse_args(argv)
    # reference compat: '--weight max(p-n)_|b-g|' combines weight and
    # distance in one flag, split on '_' (text_base_model.py:15)
    weight, distance = ns.weight, ns.distance
    if '_' in weight:
        weight, distance = weight.split('_', 1)
    cfg = Config(
        model=ns.model, data=ns.data, uid=ns.uid, epochs=ns.epochs,
        emb_size=ns.emb_size, neg_samples=ns.neg_samples,
        batch_size=ns.batch_size, evaluate_every=ns.evaluate_every,
        k=tuple(ns.k), lr=ns.lr, reg_lambda=ns.reg_lambda,
        dropout=ns.dropout, n_layers=ns.n_layers, single=ns.single,
        ltr_layers=tuple(ns.ltr_layers), freeze=ns.freeze,
        load_base=ns.load_base, save=not ns.no_save, load=ns.load,
        resume=ns.resume, resume_state=not ns.no_resume_state,
        no_train=ns.no_train, predict=ns.predict,
        emb_batch_size=ns.emb_batch_size, bert_model=ns.bert_model,
        sep=ns.sep, weight=weight, distance=distance, dist_fn=ns.dist_fn,
        pos=ns.pos, neg=ns.neg, popularity_mode=ns.popularity_mode,
        aggr=ns.aggr,
        seed=ns.seed, reshuffle=ns.reshuffle, quiet=ns.quiet,
        logging_level=ns.logging_level, slurm=ns.slurm, mesh=ns.mesh,
        use_pallas=not ns.no_pallas, ckpt_backend=ns.ckpt_backend,
        approx_topk=ns.approx_topk, steps_per_call=ns.steps_per_call,
        refresh_every=ns.refresh_every, export_reprs=ns.export_reprs,
        trace=ns.trace,
    ).finalize()
    cfg.validate()
    return cfg


def warn_footguns(cfg: Config,
                  logger: logging.Logger | None = None) -> list[str]:
    """Log the reference's LTR foot-gun warnings (``parser.py:179-183``).

    An LTR head trained without a pretrained base, or over unfrozen
    embeddings, silently degrades — the reference warns rather than
    asserts, and so do we.  Returns the warning strings (for tests).
    """
    logger = logger or logging.getLogger('textgcn_tpu')
    warnings: list[str] = []
    if cfg.model in LTR_WARN_MODELS:
        if cfg.load_base is None and cfg.load is None:
            warnings.append(
                'Base model not loaded for LTR model, training it from '
                'scratch.')
        if not cfg.freeze:
            warnings.append(
                'Base model not frozen for LTR model, this will degrade '
                'performance')
    for w in warnings:
        logger.warning(w)
    return warnings


def get_logger(cfg: Config) -> logging.Logger:
    """File + stream logger with the reference's format.

    Mirrors reference ``utils.py:66-76``: writes ``log.log`` (mode='w') into
    the run directory and mirrors to stderr; ``--quiet`` forces error level.
    """
    os.makedirs(cfg.save_path, exist_ok=True)
    level_map = {'debug': logging.DEBUG, 'info': logging.INFO,
                 'warn': logging.WARNING, 'error': logging.ERROR}
    level = logging.ERROR if cfg.quiet else level_map[cfg.logging_level]
    logger = logging.getLogger('textgcn_tpu')
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter('%(asctime)-10s - %(levelname)s: %(message)s',
                            datefmt='%d/%m/%y %H:%M')
    fh = logging.FileHandler(os.path.join(cfg.save_path, 'log.log'), mode='w')
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    logger.propagate = False
    return logger
