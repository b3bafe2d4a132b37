"""Training / evaluation runtime.

TPU-native equivalent of the reference's ``BaseModel.fit / evaluate /
predict / checkpoint / load_model`` (``base_model.py:108-299``) with the
same observable contract:

* ``fit``: epoch loop, loss-component running sums logged per eval epoch,
  evaluation every ``evaluate_every`` epochs, latest/best checkpointing,
  early stopping (reference ``utils.py:79-90``).
* ``evaluate``: full-catalog masked top-k over test users + the five
  metrics per k (reference ``base_model.py:212-233``).
* ``predict``: ranked item lists (+ scores rounded to 4 decimals) for any
  user list; optional ``predictions.tsv`` export with external ids
  (reference ``base_model.py:235-276``).
* ``checkpoint``: ``latest_checkpoint.pkl`` each eval epoch, copied to
  ``best.pkl`` when recall@smallest-k reaches a new max (reference
  ``base_model.py:291-299``).
* ``load``: accepts a file or a run dir (appends ``best.pkl``), immediately
  re-evaluates, then resets the metrics history (reference
  ``base_model.py:278-289``).

Unlike the reference's per-batch Python loop with host-side sampling, the
whole epoch — negative sampling, shuffling, every train step — runs in one
jitted call (``lax.scan`` over fixed-shape batches), so the Python/host
boundary is crossed once per epoch instead of once per batch.
"""

from __future__ import annotations

import contextlib
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.core import InteractionData
from ..ops import metrics as metrics_mod

import logging

log = logging.getLogger('textgcn_tpu')


# config fields that change the training trajectory: a resume with any of
# these differing would silently break the identical-continuation
# contract, so they are stamped into the resume payload and checked
RESUME_CONFIG_FIELDS = (
    'model', 'emb_size', 'batch_size', 'neg_samples', 'lr', 'reg_lambda',
    'dropout', 'n_layers', 'single', 'refresh_every', 'seed',
    'evaluate_every')


class Trainer:

    def __init__(self, cfg: Config, model, data: InteractionData,
                 params=None, seed_key=None, mesh=None):
        """``mesh``: optional jax Mesh — shards params/opt-state (tables
        row-sharded over `model`), constrains batches over `data`, and
        switches eval to catalog-sharded distributed top-k."""
        self.cfg = cfg
        self.model = model
        self.data = data
        self.mesh = mesh
        self.k = tuple(sorted(cfg.k))
        assert data.n_items > max(self.k), \
            f'all k must be less than number of items ({data.n_items}), ' \
            f'got k={list(self.k)}'  # reference dataset.py:25
        self.metrics_names = list(metrics_mod.METRICS)
        self.metrics_logger = {m: np.zeros((0, len(self.k)))
                               for m in self.metrics_names}

        key = seed_key if seed_key is not None else jax.random.key(cfg.seed)
        self.key, init_key = jax.random.split(key)
        self.params = params if params is not None \
            else model.init_params(init_key)
        if mesh is not None:
            from ..parallel.mesh import shard_params
            self.params = shard_params(mesh, self.params)

        self.optimizer = self._build_optimizer()
        # optax state is zeros_like(params): inherits table shardings
        self.opt_state = self.optimizer.init(self.params)

        self._epoch_fn = None
        self._eval_fn = None
        self._start_epoch = 1  # advanced by resume()
        # epoch whose metrics row describes self.params as they are NOW;
        # best-promotion is gated on it so checkpoints taken between
        # evals (end-of-fit, SIGTERM) can never overwrite best.pkl with
        # params the best metric was not measured on
        self._last_eval_epoch = None

        # static test-user batching (reference dataset.py:118-120 caches
        # test batches once at init)
        bs = cfg.batch_size
        tu = data.test_users
        pad = (-len(tu)) % bs
        self._test_users_padded = np.concatenate(
            [tu, np.zeros(pad, dtype=tu.dtype)])
        self._n_test_users = len(tu)

    # ------------------------------------------------------------------
    # optimizer

    def _build_optimizer(self):
        adam = optax.adam(self.cfg.lr)
        mask = self.model.trainable_mask(self.params)
        if jax.tree.all(jax.tree.map(lambda x: x, mask)):
            return adam
        # freeze support (reference ltr_models.py:57-61): frozen leaves get
        # zero updates
        return optax.multi_transform(
            {'train': adam, 'frozen': optax.set_to_zero()},
            jax.tree.map(lambda t: 'train' if t else 'frozen', mask))

    # ------------------------------------------------------------------
    # jitted epoch

    def _make_epoch_fn(self, n_batches: int):
        model, cfg = self.model, self.cfg
        comps = self.loss_components

        # cached propagation (--refresh_every N): the scan carries the
        # stale propagated "rest" plus a step age; the rest refreshes (one
        # full dropout propagation) every N steps and the loss runs against
        # fresh-ego + stale-rest representations in between
        refresh = getattr(cfg, 'refresh_every', 0)
        if refresh:
            if not getattr(model, 'supports_cached_propagation', False):
                raise ValueError(
                    f'--refresh_every is not supported by model '
                    f'{cfg.model!r} (no cached-propagation path)')
            if getattr(model, 'single', False):
                raise ValueError('--refresh_every requires the layer-mean '
                                 'combination (incompatible with --single)')

        batch_sh = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import DATA_AXIS
            batch_sh = NamedSharding(self.mesh,
                                     PartitionSpec(None, DATA_AXIS))

        def sample(key, captured):
            # model device arrays enter as jit ARGUMENTS (via `captured`)
            # and are rebound for the duration of the trace — closing
            # over them would embed them as compiled-program constants
            with model.bound(captured):
                k_sample, k_drop = jax.random.split(key)
                batches = model.sample_batches(k_sample, cfg.batch_size)
                if batch_sh is not None:
                    batches = tuple(
                        jax.lax.with_sharding_constraint(b, batch_sh)
                        for b in batches)
            return batches, jax.random.split(k_drop, n_batches)

        def init_extra(params):
            if not refresh:
                return ()
            rest0 = (jnp.zeros_like(params['user_emb']),
                     jnp.zeros_like(params['item_emb']))
            return (rest0, jnp.int32(0))

        def run_steps(params, opt_state, extra, xs, captured):
            with model.bound(captured):
                def step(carry, xs):
                    params, opt_state, extra = carry
                    *batch, dk = xs
                    if refresh:
                        rest, age = extra
                        k_ref, dk = jax.random.split(dk)
                        rest = jax.lax.cond(
                            jax.lax.rem(age, refresh) == 0,
                            lambda p: model.propagate_rest(p, k_ref),
                            lambda p: rest, params)
                        ctx = model.with_cached_rest(rest)
                        extra = (rest, age + 1)
                    else:
                        ctx = contextlib.nullcontext()
                    with ctx:
                        (loss, aux), grads = jax.value_and_grad(
                            model.loss, has_aux=True)(params, tuple(batch),
                                                      dk)
                    if self.mesh is not None:
                        # constrain grads to the params' row-sharding
                        # BEFORE the update so the backward psum can
                        # reduce-scatter straight to each device's table
                        # rows (docs/SCALING.md lever 1)
                        from ..parallel.mesh import param_shardings
                        grads = jax.lax.with_sharding_constraint(
                            grads, param_shardings(self.mesh, grads))
                    updates, opt_state = self.optimizer.update(
                        grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state, extra), (
                        loss, *(aux[c] for c in comps))

                (params, opt_state, extra), (losses, *comp_vals) = \
                    jax.lax.scan(step, (params, opt_state, extra), xs)
            sums = {c: v.sum() for c, v in zip(comps, comp_vals)}
            sums['loss'] = losses.sum()
            sums['nan'] = jnp.isnan(losses).any()
            return params, opt_state, extra, sums

        def epoch(params, opt_state, key, captured):
            batches, drop_keys = sample(key, captured)
            params, opt_state, _, sums = run_steps(
                params, opt_state, init_extra(params),
                (*batches, drop_keys), captured)
            return params, opt_state, sums

        captured = model.captured_state()
        m = getattr(cfg, 'steps_per_call', 0)
        if not (0 < m < n_batches):
            jitted = jax.jit(epoch, donate_argnums=(0, 1))
            return lambda params, opt_state, key: jitted(
                params, opt_state, key, captured)

        # chunked epoch: identical sampling/optimizer/RNG sequence, but the
        # scan is consumed ``m`` steps per device call so no single call
        # runs unboundedly long (relay/preemption robustness + progress
        # granularity; a 977-step whole-epoch program at production scale
        # is a single ~150 s device call).  Two compiled variants at most:
        # chunk size m and the final remainder.
        sample_j = jax.jit(sample)
        chunk_j = jax.jit(run_steps, donate_argnums=(0, 1, 2))
        init_extra_j = jax.jit(init_extra)
        # offset enters as an ARGUMENT so all full-size chunks share one
        # compiled slice program (b[i:i+m] would compile one tiny program
        # per distinct offset — expensive through a remote compile service)
        take = jax.jit(
            lambda b, i, size: jax.lax.dynamic_slice_in_dim(b, i, size, 0),
            static_argnames=('size',))

        # in-epoch progress (reference shows a per-batch tqdm bar honoring
        # --slurm, base_model.py:117-120; here a "batch" of progress is one
        # dispatched chunk — the finest host-visible granularity when the
        # epoch runs as jitted device calls)
        from ..parallel.multihost import is_primary
        show_batches = not (cfg.slurm or cfg.quiet) and is_primary()

        def chunked(params, opt_state, key):
            from tqdm import tqdm
            batches, drop_keys = sample_j(key, captured)
            extra = init_extra_j(params)
            sums = None
            bar = tqdm(total=n_batches, desc='train batches', leave=False,
                       dynamic_ncols=True, disable=not show_batches,
                       unit='batch')
            for i in range(0, n_batches, m):
                size = min(m, n_batches - i)
                xs = tuple(take(b, i, size) for b in (*batches, drop_keys))
                params, opt_state, extra, s = chunk_j(
                    params, opt_state, extra, xs, captured)
                if sums is None:
                    sums = s
                else:
                    sums = {k: (sums[k] | s[k]) if k == 'nan'
                            else sums[k] + s[k] for k in sums}
                bar.update(size)
            bar.close()
            return params, opt_state, sums

        return chunked

    def _make_eval_fn(self):
        model, mesh = self.model, self.mesh
        max_k = max(self.k)

        def eval_batches(params, users_matrix, captured):
            with model.bound(captured):
                reprs = model.representation(params, training=False)

                plain = getattr(model, 'supports_plain_sharded_topk',
                                True)
                # head-scoring models with a factorable head take the
                # fused catalog-sharded path — but only while the head is
                # active: the --load_base base evaluation toggles
                # score_with_head off to score with the plain dot product
                # (cli.py rebuilds _eval_fn around the toggle)
                head_on = getattr(model, 'score_with_head', True)
                fused = (getattr(model, 'supports_fused_sharded_topk',
                                 False) and head_on)
                if mesh is not None and not plain and not head_on:
                    plain = True  # base-eval of a head model: plain dot

                def one_batch(_, bu):
                    if mesh is not None and plain:
                        from ..parallel.sharded import sharded_topk
                        users_repr, items_repr = reprs
                        vals, idx = sharded_topk(
                            mesh, users_repr[bu], items_repr,
                            model.pos_padded[bu], max_k,
                            n_valid=model.n_items)
                    elif mesh is not None and fused:
                        # LTR heads factor into catalog-shardable
                        # (u_cat, i_cat, bias) matrices: explicit
                        # catalog-sharded top-k, per-shard scores +
                        # exact merge — ICI traffic O(B*k*shards), and
                        # no chip holds the full (B, n_items) matrix
                        from ..parallel.sharded import sharded_topk
                        u_cat, i_cat, bias = model.fused_catalog_inputs(
                            params, reprs, bu)
                        vals, idx = sharded_topk(
                            mesh, u_cat, i_cat, model.pos_padded[bu],
                            max_k, n_valid=model.n_items)
                        vals = vals + bias
                    else:
                        # head-aware path (tree heads; single-chip LTR)
                        vals, idx = model.topk_for_users(params, reprs,
                                                         bu, max_k)
                    return None, (vals, idx)

                _, (vals, idx) = jax.lax.scan(one_batch, None,
                                              users_matrix)
            return vals, idx

        jitted = jax.jit(eval_batches)
        captured = model.captured_state()
        return lambda params, users_matrix: jitted(params, users_matrix,
                                                   captured)

    # ------------------------------------------------------------------
    # public API

    @property
    def loss_components(self) -> tuple[str, ...]:
        """Loss components the model reports per step (reference logs each
        running sum separately — ``base_model.py:115,131``,
        ``text_base_model.py:34-35``)."""
        return tuple(getattr(self.model, 'loss_components', ('bpr', 'reg')))

    def _finish_epoch(self, epoch: int, sums) -> dict:
        """Fetch one epoch's loss sums, guard for NaN, and log progress.

        The reference asserts on NaN loss every batch
        (``base_model.py:123``); here the whole epoch runs in one jitted
        call, so the check is per epoch — ``fit`` pipelines the fetch one
        epoch deep so the sync overlaps the next epoch's device execution.
        """
        sums = jax.device_get(sums)
        assert not sums['nan'], f'loss is NA at epoch {epoch}'
        self._step_timer.tick()
        bar = getattr(self, '_epoch_bar', None)
        if bar is not None:
            bar.update(1)
            bar.set_postfix_str(self._format_components(sums),
                                refresh=False)
        if log.isEnabledFor(logging.DEBUG):
            log.debug('Epoch %d: %s (%.2fs/epoch)', epoch,
                      self._format_components(sums),
                      self._step_timer.mean_s)
        return sums

    def _format_components(self, sums) -> str:
        return ' '.join(f'{c} = {sums[c]:.4f}'
                        for c in self.loss_components)

    def _install_preemption_handler(self):
        """SIGTERM -> graceful stop: finish the in-flight epoch, write
        latest + resume state, and return from ``fit`` cleanly.

        TPU pools deliver SIGTERM ahead of preemption; without this the
        process dies losing up to ``evaluate_every`` epochs of work.  The
        stop lands on an epoch boundary so the saved state resumes
        bitwise-identically (``--resume``).  Returns a restore callback
        (no-op outside the main thread, where signals can't be bound).
        """
        import signal

        def handler(signum, frame):
            self._stop_requested = True
            log.warning('Received %s — checkpointing and stopping at the '
                        'next epoch boundary (resume with --resume)',
                        signal.Signals(signum).name)

        try:
            prev = signal.signal(signal.SIGTERM, handler)
        except ValueError:  # not the main thread
            return lambda: None
        return lambda: signal.signal(signal.SIGTERM, prev)

    def fit(self):
        """Train for cfg.epochs with periodic eval/checkpoint/early-stop
        (reference ``base_model.py:108-139``)."""
        cfg = self.cfg
        n_batches = self.model.num_batches(cfg.batch_size)
        if self._epoch_fn is None:
            self._epoch_fn = self._make_epoch_fn(n_batches)

        from ..utils.profiling import StepTimer
        self._step_timer = StepTimer(window=max(cfg.evaluate_every, 1))
        self._step_timer.start()
        epoch_examples = n_batches * cfg.batch_size
        t0 = time.time()
        pending = None  # (epoch, un-fetched device sums)
        stopped = False
        self._stop_requested = False
        restore_handler = self._install_preemption_handler()
        # epoch progress bar honoring --quiet (reference base_model.py:112)
        from tqdm import tqdm
        from ..parallel.multihost import is_primary
        self._epoch_bar = tqdm(
            total=cfg.epochs, initial=self._start_epoch - 1, desc='epochs',
            dynamic_ncols=True, disable=cfg.quiet or not is_primary())
        try:
            stopped = self._fit_loop(cfg, epoch_examples, t0, pending)
        finally:
            restore_handler()
            self._epoch_bar.close()
            self._epoch_bar = None
        if not stopped and cfg.epochs % cfg.evaluate_every:
            # final epoch was not an eval epoch: save latest (the eval-
            # epoch path checkpointed already otherwise)
            self.checkpoint(cfg.epochs)

    def _fit_loop(self, cfg, epoch_examples, t0, pending) -> bool:
        """Epoch loop body of ``fit``; returns True if it stopped early
        (early-stop or preemption) — those paths already checkpointed."""
        for epoch in range(self._start_epoch, cfg.epochs + 1):
            self.key, ek = jax.random.split(self.key)
            self.params, self.opt_state, sums = self._epoch_fn(
                self.params, self.opt_state, ek)
            # per-epoch NaN guard, pipelined: fetch epoch-1's sums while
            # this epoch runs on device
            if pending is not None:
                self._finish_epoch(*pending)
            pending = (epoch, sums)
            if self._stop_requested:
                self._finish_epoch(*pending)
                self.checkpoint(epoch)
                if cfg.save:
                    log.warning('Stopped by SIGTERM at epoch %d; state '
                                'saved to %s', epoch, cfg.save_path)
                else:
                    log.warning('Stopped by SIGTERM at epoch %d; nothing '
                                'saved (--no_save)', epoch)
                return True
            if epoch % cfg.evaluate_every:
                continue
            sums = self._finish_epoch(*pending)
            pending = None
            eps = (epoch_examples / self._step_timer.mean_s
                   if self._step_timer.mean_s else 0.0)
            log.info('Epoch %d: %s (%.0f examples/s, %.1fs)', epoch,
                     self._format_components(sums), eps, time.time() - t0)
            self.evaluate(epoch)
            self.checkpoint(epoch)
            if metrics_mod.early_stop(self.metrics_logger):
                log.warning('Early stopping triggerred at epoch %d', epoch)
                return True
        if pending is not None:
            self._finish_epoch(*pending)
        return False

    def evaluate(self, epoch: int | None = None) -> dict[str, list[float]]:
        self._last_eval_epoch = epoch
        on_eval = getattr(self.model, 'on_evaluate', None)
        if on_eval is not None:
            on_eval(self.params)
        preds, _ = self._predict_users(self._test_users_padded)
        preds = preds[: self._n_test_users]
        results = metrics_mod.calculate_metrics(
            preds, self.data.true_test, self.k)
        log.info(' ' * 11 + ''.join(f'@{i:<6}' for i in self.k))
        for m in self.metrics_names:
            self.metrics_logger[m] = np.append(
                self.metrics_logger[m], [results[m]], axis=0)
            log.info('%-11s' % m + ' '.join(f'{v:.4f}' for v in results[m]))
        return results

    def _predict_users(self, users_padded: np.ndarray):
        """Top-k over the catalog for padded user array; returns numpy
        (n, max_k) indices and values."""
        if self._eval_fn is None:
            self._eval_fn = self._make_eval_fn()
        bs = self.cfg.batch_size
        mat = jnp.asarray(users_padded.reshape(-1, bs))
        vals, idx = self._eval_fn(self.params, mat)
        vals = np.asarray(vals).reshape(-1, max(self.k))
        idx = np.asarray(idx).reshape(-1, max(self.k))
        return idx, vals

    def predict(self, users, save: bool = False,
                with_scores: bool = False):
        """Ranked items (+ scores) for a user id list; optional TSV export
        with external ids (reference ``base_model.py:235-276``)."""
        users = np.asarray(list(users), dtype=np.int32)
        pad = (-len(users)) % self.cfg.batch_size
        padded = np.concatenate([users, np.zeros(pad, dtype=users.dtype)])
        idx, vals = self._predict_users(padded)
        predictions = idx[:len(users)].tolist()
        scores = np.round(vals[:len(users)], 4).tolist()
        from ..parallel.multihost import is_primary
        if save and is_primary():
            import pandas as pd
            preds_ext = [[self.data.item_id_map[i] for i in row]
                         for row in predictions]
            users_ext = [self.data.user_id_map[u] for u in users.tolist()]
            out = os.path.join(self.cfg.save_path, 'predictions.tsv')
            pd.DataFrame({'user_id': users_ext, 'y_pred': preds_ext,
                          'scores': scores}).to_csv(out, sep='\t',
                                                    index=False)
            log.info('Predictions are saved in `%s`', out)
        if with_scores:
            return predictions, scores
        return predictions

    def export_reprs(self) -> dict[str, str]:
        """Write propagated representations as .npy for external serving.

        ``users_repr.npy`` / ``items_repr.npy``: the eval-mode propagated
        tables (real rows only — phantom padding sliced off), ready for an
        external ANN index (score = dot product).  LTR heads additionally
        export the collapsed-head factorization (``ltr_user_factors.npy``,
        ``ltr_item_factors.npy``, ``ltr_bias.npy``) so an external system
        reproduces head scores exactly as ``u_cat @ i_cat.T + bias``.
        Returns {name: path}.  No reference counterpart (its embeddings
        are only reachable through a full model checkpoint).
        """
        model, cfg = self.model, self.cfg
        from ..parallel.multihost import is_primary
        cap = model.captured_state()

        def compute(params, cap):
            with model.bound(cap):
                reprs = model.representation(params, training=False)
                out = {'users_repr': reprs[0][:model.n_users],
                       'items_repr': reprs[1][:model.n_items]}
                if getattr(model, 'supports_fused_sharded_topk', False):
                    users = jnp.arange(model.n_users_t, dtype=jnp.int32)
                    u_cat, i_cat, bias = model.fused_catalog_inputs(
                        params, reprs, users)
                    out.update(ltr_user_factors=u_cat[:model.n_users],
                               ltr_item_factors=i_cat[:model.n_items],
                               ltr_bias=bias)
                return out

        # replicate outputs over the mesh: device_get of a row-sharded
        # output would touch non-addressable devices on multi-process runs
        out_sh = None
        if self.mesh is not None:
            from ..parallel.mesh import replicated
            out_sh = replicated(self.mesh)
        arrays = jax.device_get(
            jax.jit(compute, out_shardings=out_sh)(self.params, cap))
        paths = {}
        if is_primary():
            os.makedirs(cfg.save_path, exist_ok=True)
            for name, arr in arrays.items():
                path = os.path.join(cfg.save_path, f'{name}.npy')
                np.save(path, np.asarray(arr))
                paths[name] = path
            log.info('Exported representations to %s: %s', cfg.save_path,
                     ', '.join(sorted(arrays)))
        return paths

    # ------------------------------------------------------------------
    # checkpointing (latest/best contract, reference base_model.py:291-299)

    @property
    def _checkpointer(self):
        from .checkpoint import make_checkpointer
        if not hasattr(self, '_ckptr'):
            self._ckptr = make_checkpointer(
                getattr(self.cfg, 'ckpt_backend', 'pickle'))
        return self._ckptr

    def checkpoint(self, epoch: int):
        if not self.cfg.save:
            return
        from ..parallel.multihost import is_primary
        primary = is_primary()
        # pickle is a whole-file write: only the primary host may touch it
        # (concurrent writers corrupt it).  Orbax saves are cooperative —
        # every process writes its own array shards — so those run on all
        # hosts; the best-promotion filesystem copy stays primary-only.
        if not getattr(self._checkpointer, 'cooperative', False) \
                and not primary:
            return
        state = {
            'params': self.params,
            'epoch': epoch,
            'model': self.cfg.model,
        }
        self._checkpointer.save_latest(self.cfg.save_path, state)
        if getattr(self.cfg, 'resume_state', True):
            # full trainer state for exact crash-resume (--resume): the
            # reference only reloads tables (base_model.py:278-289) —
            # restarting Adam moments/epoch/RNG from scratch perturbs the
            # trajectory; this payload makes the continuation identical
            # to an uninterrupted run (tests/test_resume.py)
            payload = {
                'epoch': np.int64(epoch),
                'key_data': np.asarray(jax.random.key_data(self.key)),
                'opt_leaves': {
                    str(i): leaf for i, leaf in
                    enumerate(jax.tree.leaves(self.opt_state))},
                'metrics': {m: self.metrics_logger[m]
                            for m in self.metrics_names},
                'config': {f: getattr(self.cfg, f)
                           for f in RESUME_CONFIG_FIELDS},
            }
            self._checkpointer.save_resume(self.cfg.save_path, payload)
        first = self.metrics_logger[self.metrics_names[0]]
        # promote only when the last metrics row was measured on exactly
        # these params (checkpoint right after evaluate at this epoch) —
        # a checkpoint between evals would otherwise copy unevaluated
        # params over the checkpoint that actually hit the best metric
        if len(first) and first[:, 0].max() == first[-1][0] and primary \
                and epoch == self._last_eval_epoch:
            log.info('Updating best model at epoch %d', epoch)
            self._checkpointer.promote_best(self.cfg.save_path)

    def resume(self, run_dir: str):
        """Exact crash-resume: restore params, optimizer state, RNG key,
        metrics history, and the epoch counter from a run directory, then
        continue ``fit`` from the next epoch with a trajectory identical
        to an uninterrupted run.

        Requires the same model/backend/mesh config as the saving run
        (optimizer-state shapes must match).  Contrast with ``load``
        (the reference contract, ``base_model.py:278-289``): tables only,
        fresh optimizer, metrics reset.
        """
        log.info('Resuming from %s', run_dir)
        ck = self._checkpointer
        if not os.path.isdir(run_dir) or run_dir.endswith('.orbax'):
            raise ValueError(
                f'--resume takes a run directory (got {run_dir!r}); '
                f'to warm-start from a single checkpoint file use --load')
        latest = os.path.join(run_dir, ck.latest_name)
        if not os.path.exists(os.path.join(run_dir, ck.resume_name)):
            raise FileNotFoundError(
                f'no {ck.resume_name} in {run_dir} — the run was '
                f'saved with --no_resume_state (or a different '
                f'--ckpt_backend); use --load for a tables-only '
                f'warm start')
        state = ck.load(latest)
        loaded = jax.tree.map(jnp.asarray, state['params'])
        self.params = self._merge_loaded_params(self.params, loaded)
        if self.mesh is not None:
            from ..parallel.mesh import shard_params
            self.params = shard_params(self.mesh, self.params)

        rs = ck.load_resume(run_dir)
        # latest_checkpoint and resume_state are two sequential writes; a
        # crash between them leaves params@N paired with opt-state@N-k —
        # resuming that silently breaks the identical-trajectory contract,
        # so fail loud on the epoch stamps instead
        if int(rs['epoch']) != int(state.get('epoch', -1)):
            raise ValueError(
                f'resume_state (epoch {int(rs["epoch"])}) does not match '
                f'{ck.latest_name} (epoch {state.get("epoch")}) — the '
                f'run was interrupted mid-checkpoint; use --load to '
                f'warm-start from the params instead')
        saved_cfg = rs.get('config')
        if saved_cfg is not None:
            diffs = {
                f: (v, getattr(self.cfg, f, None))
                for f, v in saved_cfg.items()
                if getattr(self.cfg, f, None) != v}
            if diffs:
                detail = ', '.join(f'{f}: saved={s!r} vs {c!r}'
                                   for f, (s, c) in sorted(diffs.items()))
                raise ValueError(
                    f'--resume requires the saving run\'s '
                    f'trajectory-relevant config; differing: {detail}. '
                    f'Use --load to warm-start with new hyperparameters.')
        target = self.optimizer.init(self.params)
        leaves, treedef = jax.tree.flatten(target)
        def place(host, cur):
            """Re-create a (possibly multi-process) sharded array from the
            host copy: every process donates its addressable shards
            (device_put cannot target non-addressable devices).  Leaves
            the fresh init left single-device (optimizer scalars like the
            Adam count) stay uncommitted so jit replicates them on use —
            committing them would pin process-local devices, which is
            invalid as a multi-process jit input."""
            sh = getattr(cur, 'sharding', None)
            if sh is None or isinstance(
                    sh, jax.sharding.SingleDeviceSharding):
                return jnp.asarray(host)
            return jax.make_array_from_callback(
                host.shape, sh, lambda idx: np.asarray(host[idx]))

        new_leaves = []
        for i, cur in enumerate(leaves):
            got = rs['opt_leaves'][str(i)]
            if tuple(got.shape) != tuple(cur.shape):
                raise ValueError(
                    f'--resume requires the same model/backend/mesh '
                    f'config as the saving run (optimizer leaf {i}: '
                    f'saved {tuple(got.shape)} vs current '
                    f'{tuple(cur.shape)})')
            if isinstance(got, jax.Array) and not got.is_fully_addressable:
                # a cooperative orbax restore hands back a globally-sharded
                # array; when each process holds a single chip no host copy
                # exists — reshard/cast on device instead of fetching
                sh = getattr(cur, 'sharding', None)
                if isinstance(sh, jax.sharding.SingleDeviceSharding):
                    sh = None
                new_leaves.append(jax.jit(
                    lambda x, d=cur.dtype: x.astype(d),
                    out_shardings=sh)(got))
                continue
            new_leaves.append(place(np.asarray(got).astype(cur.dtype), cur))
        self.opt_state = jax.tree.unflatten(treedef, new_leaves)
        self.key = jax.random.wrap_key_data(jnp.asarray(rs['key_data']))
        self.metrics_logger = {m: np.asarray(rs['metrics'][m])
                               for m in self.metrics_names}
        self._start_epoch = int(rs['epoch']) + 1
        log.info('Resumed at epoch %d', self._start_epoch - 1)

    def load(self, load_path: str):
        log.info('Loading model %s', load_path)
        state = self._checkpointer.load(load_path)
        loaded = jax.tree.map(jnp.asarray, state['params'])
        self.params = self._merge_loaded_params(self.params, loaded)
        self.opt_state = self.optimizer.init(self.params)
        log.info('Performance of the loaded model:')
        self.evaluate()
        self.metrics_logger = {m: np.zeros((0, len(self.k)))
                               for m in self.metrics_names}

    @staticmethod
    def _merge_loaded_params(current, loaded):
        """Overlay loaded leaves onto the current param tree.

        Supports the ``--load_base`` warm-start flow (reference
        ``ltr_models.py:66-68``): a plain LightGCN checkpoint loaded into an
        LTR model only carries the embedding tables; head params keep their
        fresh init.  Tables saved under a different row padding (backends
        pad to different multiples — mesh size, pallas 4096) overlay their
        common rows; the current padding rows are preserved.
        """
        merged = dict(current)
        for k, v in loaded.items():
            if k not in merged:
                continue
            cur = merged[k]
            if (hasattr(cur, 'ndim') and hasattr(v, 'ndim')
                    and cur.ndim == 2 and v.ndim == 2
                    and cur.shape != v.shape
                    and cur.shape[1] == v.shape[1]):
                n = min(cur.shape[0], v.shape[0])
                merged[k] = jnp.asarray(cur).at[:n].set(
                    jnp.asarray(v)[:n])
            else:
                merged[k] = v
        return merged
