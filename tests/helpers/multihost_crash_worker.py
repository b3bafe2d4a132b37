"""Worker for the multi-process kill-and-resume test.

Run as: python multihost_crash_worker.py <pid> <port> <out_dir> <phase>

Phases (each phase is a separate 2-process jax.distributed launch; the
test drives them in sequence against the same shared out_dir):

* ``crash``  — mesh Trainer, cooperative Orbax checkpoints every epoch;
  trains 2 of 4 epochs, then dies HARD (``os._exit``) with no
  jax.distributed teardown, simulating a pool preemption right after a
  checkpoint landed.
* ``resume`` — fresh 2-process launch, ``Trainer.resume`` from the shared
  run dir, continues to epoch 4, prints the full recall history.
* ``full``   — uninterrupted 4-epoch oracle run in a separate dir, prints
  the same history.  The test asserts resume == full bit-for-bit: a
  kill-and-resume cycle must not perturb the trajectory.
"""

import os
import sys

pid, port, out_dir, phase = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                             sys.argv[4])
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
os.environ['TEXTGCN_TPU_TEXT_ENCODER'] = 'stub'
os.environ['JAX_COORDINATOR_ADDRESS'] = f'127.0.0.1:{port}'
os.environ['JAX_NUM_PROCESSES'] = '2'
os.environ['JAX_PROCESS_ID'] = str(pid)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

repo = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, repo)

import numpy as np  # noqa: E402

from textgcn_tpu.parallel.multihost import maybe_initialize  # noqa: E402

assert maybe_initialize(), 'multi-process runtime did not activate'

import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    'graft_entry', os.path.join(repo, '__graft_entry__.py'))
ge = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ge)

from textgcn_tpu.parallel.mesh import make_mesh, shard_model  # noqa: E402
from textgcn_tpu.train.trainer import Trainer  # noqa: E402

mesh = make_mesh((2, 2))
run_dir = os.path.join(out_dir, 'run_full' if phase == 'full' else 'run')
epochs = 2 if phase == 'crash' else 4
cfg, data, model = ge._build(
    dict(mesh='2x2', epochs=epochs, evaluate_every=1, save=True,
         ckpt_backend='orbax', save_path=run_dir), pad_multiple=4)
model = shard_model(mesh, model)
trainer = Trainer(cfg, model, data, mesh=mesh)

if phase == 'crash':
    trainer.fit()  # checkpoints (latest + resume state) land at epoch 2
    assert os.path.exists(os.path.join(run_dir, 'latest_checkpoint.orbax'))
    sys.stdout.flush()
    os._exit(77)   # hard death: no orbax/distributed cleanup, like SIGKILL

if phase == 'resume':
    trainer.resume(run_dir)
    assert trainer._start_epoch == 3, trainer._start_epoch

trainer.fit()
recalls = np.asarray(trainer.metrics_logger['recall'])
assert recalls.shape[0] == 4 and np.isfinite(recalls).all()
history = ','.join(f'{v:.9f}' for v in recalls[:, 0])
print(f'CRASH_{phase.upper()}_OK pid={pid} recalls={history}', flush=True)
