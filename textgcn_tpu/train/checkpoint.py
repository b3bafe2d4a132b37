"""Checkpoint backends: pickle (single-host) and Orbax (sharded).

The latest/best contract mirrors the reference (``base_model.py:291-299``):
``latest_checkpoint.pkl`` written at every eval epoch, copied to
``best.pkl`` when recall@smallest-k reaches a new max.  The Orbax backend
adds multi-host/sharded-array safety for mesh runs: each checkpoint is an
Orbax step directory (``latest_checkpoint.orbax/``, ``best.orbax/``) whose
arrays restore with their original shardings.
"""

from __future__ import annotations

import logging
import os
import pickle
import shutil

import jax
import numpy as np

log = logging.getLogger('textgcn_tpu')


class PickleCheckpointer:
    """Single-host backend; matches the reference's .pkl artifacts.

    Not cooperative: on a multi-process runtime only the primary host may
    write (every host racing to the same .pkl corrupts it) — the Trainer
    guards on this flag.
    """

    latest_name = 'latest_checkpoint.pkl'
    best_name = 'best.pkl'
    resume_name = 'resume_state.pkl'
    cooperative = False

    @staticmethod
    def _atomic_dump(obj, path: str):
        """Write-to-temp + rename so a crash mid-dump never destroys the
        previous checkpoint — losing resumability to a crash is the exact
        failure mode these files exist to survive."""
        tmp = path + '.tmp'
        with open(tmp, 'wb') as f:
            pickle.dump(obj, f)
        os.replace(tmp, path)

    def save_latest(self, save_path: str, state: dict):
        os.makedirs(save_path, exist_ok=True)
        state = dict(state,
                     params=jax.tree.map(np.asarray, state['params']))
        self._atomic_dump(state, os.path.join(save_path, self.latest_name))

    def promote_best(self, save_path: str):
        shutil.copyfile(os.path.join(save_path, self.latest_name),
                        os.path.join(save_path, self.best_name))

    def load(self, path: str) -> dict:
        if os.path.isdir(path):
            path = os.path.join(path, self.best_name)
        with open(path, 'rb') as f:
            return pickle.load(f)

    def save_resume(self, save_path: str, payload: dict):
        """Trainer-side resume payload (flat opt-state leaves, RNG key
        data, epoch, metrics history) — see ``Trainer.resume``."""
        payload = jax.tree.map(np.asarray, payload)
        self._atomic_dump(payload,
                          os.path.join(save_path, self.resume_name))

    def load_resume(self, path: str) -> dict:
        if os.path.isdir(path):
            path = os.path.join(path, self.resume_name)
        with open(path, 'rb') as f:
            return pickle.load(f)


class OrbaxCheckpointer:
    """Sharded backend for mesh runs (Orbax PyTreeCheckpointer).

    Cooperative: every process must participate in ``save`` (each writes
    its own array shards), so the Trainer must NOT gate it on the primary.
    """

    latest_name = 'latest_checkpoint.orbax'
    best_name = 'best.orbax'
    resume_name = 'resume_state.orbax'
    cooperative = True

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._ckptr = ocp.PyTreeCheckpointer()

    @staticmethod
    def _clear(target: str):
        # clearing is a filesystem mutation on a shared path: primary-only,
        # with a barrier so no process starts a cooperative save into a
        # directory mid-deletion
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            if jax.process_index() == 0 and os.path.exists(target):
                shutil.rmtree(target)
            multihost_utils.sync_global_devices('textgcn_ckpt_clear')
        elif os.path.exists(target):
            shutil.rmtree(target)

    def _atomic_save(self, target: str, tree):
        """Cooperative save into a .tmp directory, then swap into place —
        the long shard-writing window never has the previous checkpoint
        deleted, so a crash mid-save keeps the old state restorable."""
        tmp = target + '.tmp'
        self._clear(tmp)
        self._ckptr.save(tmp, tree)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            # all shards written before the primary swaps
            multihost_utils.sync_global_devices('textgcn_ckpt_written')
            if jax.process_index() == 0:
                if os.path.exists(target):
                    shutil.rmtree(target)
                os.rename(tmp, target)
            multihost_utils.sync_global_devices('textgcn_ckpt_swapped')
        else:
            if os.path.exists(target):
                shutil.rmtree(target)
            os.rename(tmp, target)

    def save_latest(self, save_path: str, state: dict):
        os.makedirs(save_path, exist_ok=True)
        target = os.path.abspath(
            os.path.join(save_path, self.latest_name))
        meta = {k: v for k, v in state.items() if k != 'params'}
        self._atomic_save(target, {'params': state['params'],
                                   'meta': meta})

    def save_resume(self, save_path: str, payload: dict):
        target = os.path.abspath(os.path.join(save_path, self.resume_name))
        self._atomic_save(target, payload)

    def load_resume(self, path: str) -> dict:
        if os.path.isdir(path) and not path.endswith('.orbax'):
            path = os.path.join(path, self.resume_name)
        return self._ckptr.restore(os.path.abspath(path))

    def promote_best(self, save_path: str):
        src = os.path.abspath(os.path.join(save_path, self.latest_name))
        dst = os.path.abspath(os.path.join(save_path, self.best_name))
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)

    def load(self, path: str) -> dict:
        if os.path.isdir(path) and not path.endswith('.orbax'):
            best = os.path.join(path, self.best_name)
            path = best if os.path.exists(best) else \
                os.path.join(path, PickleCheckpointer.best_name)
        if path.endswith('.pkl'):
            return PickleCheckpointer().load(path)
        restored = self._ckptr.restore(os.path.abspath(path))
        out = dict(restored.get('meta', {}))
        out['params'] = restored['params']
        return out


def make_checkpointer(backend: str = 'pickle'):
    if backend == 'orbax':
        return OrbaxCheckpointer()
    return PickleCheckpointer()
