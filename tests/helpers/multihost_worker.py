"""Worker for the local 2-process jax.distributed test.

Run as: python multihost_worker.py <process_id> <port> <shared_out_dir>

Each process gets 2 virtual CPU devices (4 global), initializes through
``multihost.maybe_initialize`` (env-var resolution path), then exercises:

1. a sharded train step with the framework's real sharding conventions —
   row-sharded embedding tables (``shard_params``), data-sharded batch,
   GSPMD-inserted gradient psum;
2. a cooperative Orbax save of the global sharded params + restore +
   bit-equality;
3. the primary-only guards on pickle checkpointing and predictions.tsv
   export via a real (process-local) Trainer;
4. the FULL mesh Trainer (fit + evaluate over the global 4-device mesh):
   two epochs with eval each — possible because jitted drivers take all
   model device arrays as arguments (multi-controller JAX forbids
   closing over global arrays).

Prints one final line ``MULTIHOST_OK pid=<p> loss=<loss>`` on success.
"""

import os
import sys

pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
# process topology: <n_processes> <devices_per_process> (default 2x2 =
# 4 global devices; the 4-process case runs 4x1 — same global mesh)
n_procs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
local_dev = int(sys.argv[5]) if len(sys.argv) > 5 else 2
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = \
    f'--xla_force_host_platform_device_count={local_dev}'
os.environ['TEXTGCN_TPU_TEXT_ENCODER'] = 'stub'
os.environ['JAX_COORDINATOR_ADDRESS'] = f'127.0.0.1:{port}'
os.environ['JAX_NUM_PROCESSES'] = str(n_procs)
os.environ['JAX_PROCESS_ID'] = str(pid)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

repo = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, repo)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from textgcn_tpu.parallel.multihost import (is_primary,  # noqa: E402
                                            maybe_initialize)

active = maybe_initialize()
assert active, 'maybe_initialize did not activate the multi-process runtime'
assert jax.process_count() == n_procs
assert is_primary() == (pid == 0)

from textgcn_tpu.parallel.mesh import (DATA_AXIS, make_mesh,  # noqa: E402
                                       shard_params)

mesh = make_mesh((2, 2))

# --- 1. sharded step: row-sharded tables, data-sharded batch ---------------
rng = np.random.RandomState(0)
params = {'user_emb': jnp.asarray(rng.randn(64, 8).astype(np.float32)),
          'item_emb': jnp.asarray(rng.randn(32, 8).astype(np.float32))}
params = shard_params(mesh, params)
batch_sh = NamedSharding(mesh, P(DATA_AXIS))
users = jax.device_put(np.arange(16, dtype=np.int32) % 64, batch_sh)
pos = jax.device_put(np.arange(16, dtype=np.int32) % 32, batch_sh)
neg = jax.device_put((np.arange(16, dtype=np.int32) * 7 + 3) % 32, batch_sh)


@jax.jit
def step(params, users, pos, neg):
    def loss_fn(p):
        u = p['user_emb'][users]
        s_pos = (u * p['item_emb'][pos]).sum(-1)
        s_neg = (u * p['item_emb'][neg]).sum(-1)
        return jax.nn.selu(s_neg - s_pos).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return jax.tree.map(lambda a, g: a - 0.1 * g, params, grads), loss


params, loss = step(params, users, pos, neg)
loss = float(jax.device_get(loss))
assert np.isfinite(loss)

# --- 2. cooperative orbax save / restore -----------------------------------
from textgcn_tpu.train.checkpoint import OrbaxCheckpointer  # noqa: E402

ckptr = OrbaxCheckpointer()
assert ckptr.cooperative
ckpt_dir = os.path.join(out_dir, 'ckpt')
ckptr.save_latest(ckpt_dir, {'params': params, 'epoch': 1})
restored = ckptr.load(os.path.join(ckpt_dir, ckptr.latest_name))
assert restored['epoch'] == 1
for k in params:
    # compare on-device: the restored global array spans non-addressable
    # devices when each process holds one chip, so no host fetch of the
    # full value is possible — jit reshards and reduces instead
    diff = jax.jit(lambda a, b: jnp.abs(a - b).max())(
        params[k], restored['params'][k])
    assert float(jax.device_get(diff)) == 0.0, k

# --- 3. primary-only pickle / predictions guards on a real Trainer ---------
import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    'graft_entry', os.path.join(repo, '__graft_entry__.py'))
ge = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ge)

from textgcn_tpu.train.trainer import Trainer  # noqa: E402

my_dir = os.path.join(out_dir, f'trainer_p{pid}')
cfg, data, model = ge._build(dict(save=True, save_path=my_dir))
trainer = Trainer(cfg, model, data)
trainer.evaluate()
trainer.checkpoint(1)
trainer.predict(range(4), save=True)
wrote_ckpt = os.path.exists(os.path.join(my_dir, 'latest_checkpoint.pkl'))
wrote_preds = os.path.exists(os.path.join(my_dir, 'predictions.tsv'))
assert wrote_ckpt == (pid == 0), \
    f'pickle checkpoint guard broken: pid={pid} wrote={wrote_ckpt}'
assert wrote_preds == (pid == 0), \
    f'predictions guard broken: pid={pid} wrote={wrote_preds}'

# --- 4. full mesh Trainer across both processes ----------------------------
from textgcn_tpu.parallel.mesh import shard_model  # noqa: E402

shared_dir = os.path.join(out_dir, 'mesh_run')
cfg4, data4, model4 = ge._build(
    dict(mesh='2x2', epochs=2, evaluate_every=1, save=True,
         ckpt_backend='orbax', save_path=shared_dir), pad_multiple=4)
model4 = shard_model(mesh, model4)
trainer4 = Trainer(cfg4, model4, data4, mesh=mesh)
trainer4.fit()
recalls = trainer4.metrics_logger['recall']
assert len(recalls) == 2 and np.isfinite(recalls).all()
assert os.path.exists(os.path.join(shared_dir,
                                   'latest_checkpoint.orbax'))

# --- 5. crash-resume restores the full mesh trainer state ------------------
# (cooperative resume_state.orbax was written by trainer4's checkpoints;
# restoring re-creates globally-sharded opt-state arrays on every process)
cfg5, data5, model5 = ge._build(
    dict(mesh='2x2', epochs=3, evaluate_every=1, save=True,
         ckpt_backend='orbax', save_path=shared_dir), pad_multiple=4)
model5 = shard_model(mesh, model5)
trainer5 = Trainer(cfg5, model5, data5, mesh=mesh)
trainer5.resume(shared_dir)
assert trainer5._start_epoch == 3, trainer5._start_epoch
assert len(trainer5.metrics_logger['recall']) == 2
for a, b in zip(jax.tree.leaves(trainer5.opt_state),
                jax.tree.leaves(trainer4.opt_state)):
    d = jax.jit(lambda x, y: jnp.abs(x - y).max())(a, b)
    assert float(jax.device_get(d)) == 0.0, 'resumed opt state differs'
trainer5.fit()  # continue epoch 3 on the resumed global state
assert len(trainer5.metrics_logger['recall']) == 3
assert np.isfinite(trainer5.metrics_logger['recall']).all()

# --- 6. representation export from globally-sharded params ------------------
paths = trainer5.export_reprs()
if pid == 0:
    u = np.load(paths['users_repr'])
    assert u.shape[0] == model5.n_users and np.isfinite(u).all()
else:
    assert paths == {}, 'non-primary wrote export artifacts'

print(f'MULTIHOST_OK pid={pid} loss={loss:.8f} '
      f'recall={float(recalls[-1][0]):.6f}', flush=True)
