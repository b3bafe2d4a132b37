"""Local 2-process jax.distributed test (VERDICT r1 item 7).

Spawns two real processes against a 127.0.0.1 coordinator (2 virtual CPU
devices each, 4 global), exercising multihost init, a sharded step with
the framework's sharding conventions, cooperative orbax save/load, and
the primary-only pickle/prediction guards.  See helpers/multihost_worker.
"""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, 'helpers', 'multihost_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(p), str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for p in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{out[-4000:]}'
    lines = [line for out in outs for line in out.splitlines()
             if line.startswith('MULTIHOST_OK')]
    assert len(lines) == 2, outs
    losses = {line.split('loss=')[1].split()[0] for line in lines}
    assert len(losses) == 1, f'processes disagree on loss: {lines}'
    recalls = {line.split('recall=')[1] for line in lines}
    assert len(recalls) == 1, \
        f'processes disagree on trainer eval: {lines}'
    # the cooperative orbax checkpoint exists exactly once, shared
    assert os.path.exists(tmp_path / 'ckpt' / 'latest_checkpoint.orbax')
    # only the primary wrote pickle artifacts
    assert os.path.exists(tmp_path / 'trainer_p0' / 'latest_checkpoint.pkl')
    assert not os.path.exists(tmp_path / 'trainer_p1'
                              / 'latest_checkpoint.pkl')
