"""bf16 reduce-scatter payloads (the production default).

The suite runs with TEXTGCN_TPU_RS_DTYPE=f32 (conftest) so the 1e-5
mesh-vs-single equivalence tests stay exact; these tests cover the bf16
default directly: the propagated output must stay within bf16 rounding
of the f32-payload path (the kernels already consume bf16 tables, so the
payload cast adds no new information loss class), and the wire bytes of
every propagation reduce-scatter must halve — the measured basis of the
S2 scaling-efficiency claim in docs/SCALING.md §4b.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from textgcn_tpu.parallel.mesh import make_mesh  # noqa: E402


@pytest.fixture(scope='module')
def mesh():
    return make_mesh((4, 2))


@pytest.fixture()
def _restore_rs_env():
    saved = os.environ.get('TEXTGCN_TPU_RS_DTYPE')
    yield
    if saved is None:
        os.environ.pop('TEXTGCN_TPU_RS_DTYPE', None)
    else:
        os.environ['TEXTGCN_TPU_RS_DTYPE'] = saved


def _edges(rng, nu, ni, e=3000):
    eu = rng.randint(0, nu, e)
    ei = rng.randint(0, ni, e)
    pairs = np.unique(np.stack([eu, ei], 1), axis=0)
    return (pairs[:, 0].astype(np.int64), pairs[:, 1].astype(np.int64),
            np.ones(len(pairs), np.float32))


def _both(make_op):
    os.environ['TEXTGCN_TPU_RS_DTYPE'] = 'f32'
    op32 = make_op()
    os.environ['TEXTGCN_TPU_RS_DTYPE'] = 'bf16'
    op16 = make_op()
    assert op32.rs_dtype == jnp.float32
    assert op16.rs_dtype == jnp.bfloat16
    return op32, op16


@pytest.mark.parametrize('backend', ['xla', 'pallas'])
def test_bf16_propagation_close_to_f32(mesh, rng, _restore_rs_env,
                                       backend):
    nu, ni, d = 256, 512, 16
    eu, ei, w = _edges(rng, nu, ni)

    if backend == 'xla':
        from textgcn_tpu.parallel.xla_sharded import MeshXlaGraphOp

        def make_op():
            return MeshXlaGraphOp(eu, ei, w, nu, ni, mesh)
    else:
        from textgcn_tpu.parallel.pallas_sharded import MeshPallasGraphOp

        def make_op():
            return MeshPallasGraphOp(eu, ei, w, nu, ni, d, mesh,
                                     interpret=True)

    op32, op16 = _both(make_op)
    x = jnp.asarray(rng.randn(ni, d).astype(np.float32))
    out32 = np.asarray(op32.to_user(x, op32.weights()[0]))
    out16 = np.asarray(op16.to_user(x, op16.weights()[0]))
    # bf16 payload: ~2^-8 relative rounding on each of 8 partial sums
    np.testing.assert_allclose(out16, out32, rtol=2e-2, atol=5e-2)
    # and the cast genuinely happened (a silently-ignored env would
    # reproduce f32 bit-exactly)
    assert np.any(out16 != out32)


def test_bf16_reduce_scatter_payloads_emitted(mesh, dummy_dir,
                                              _restore_rs_env):
    """Regression guard on the wire dtype behind the S2 efficiency
    claim: the train step must EMIT its 12 propagation reduce-scatters
    (3 layers x 2 directions, fwd+bwd) with bf16 payloads under the
    default, f32 when opted out.  Asserted at the StableHLO level —
    that is the program the TPU compiler receives; the CPU test backend
    legalizes bf16 collectives by upcasting (observed: ``f32[..]
    reduce-scatter(wrapped_convert)`` even for a pure-bf16 program), so
    compiled-CPU byte counts cannot witness the halving.  TPU lowers
    bf16 collectives natively."""
    import re

    import jax
    import optax

    from textgcn_tpu.parallel.mesh import shard_params
    from textgcn_tpu.parallel.sharded import make_sharded_train_step
    from tools.collective_audit import _build

    types = {}
    for dt in ('f32', 'bf16'):
        os.environ['TEXTGCN_TPU_RS_DTYPE'] = dt
        cfg, data, model = _build('lgcn', str(dummy_dir), mesh,
                                  batch_size=32, emb_size=16, k=(3,))
        optimizer = optax.adam(cfg.lr)
        params = shard_params(mesh, model.init_params(jax.random.key(0)))
        opt_state = optimizer.init(params)
        run = make_sharded_train_step(mesh, model, optimizer)
        batch = jax.tree.map(
            lambda x: x[0],
            model.sample_batches(jax.random.key(1), cfg.batch_size))
        text = run.jitted.lower(params, opt_state, tuple(batch),
                                jax.random.key(2),
                                model.captured_state()).as_text()
        # the op's type signature follows its add-reduction region; the
        # region's scalar add signature has no dims, so the first
        # DIMENSIONED result type after each op is the payload
        types[dt] = re.findall(
            r'stablehlo\.reduce_scatter.*?-> tensor<[0-9]+x[0-9]+x'
            r'(bf16|f32)>', text, re.S)
    assert len(types['f32']) == len(types['bf16']) == 12, types
    assert set(types['bf16']) == {'bf16'}, types['bf16']
    assert set(types['f32']) == {'f32'}, types['f32']
