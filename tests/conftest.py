"""Test environment: force a virtual 8-device CPU mesh + stub text encoder.

Must set XLA flags before jax initializes its backends (SURVEY.md §4's
distributed-test strategy: ``--xla_force_host_platform_device_count=8``).
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('TEXTGCN_TPU_TEXT_ENCODER', 'stub')
# mesh-vs-single equivalence tests assert 1e-5 closeness: run the suite
# with f32 reduce-scatter payloads (production default is bf16; its
# closeness + byte halving are covered by tests/test_rs_bf16.py)
os.environ.setdefault('TEXTGCN_TPU_RS_DTYPE', 'f32')

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# this image's sitecustomize force-registers the remote 'axon' TPU backend
# in every process; pin the test session to the local 8-device CPU mesh
jax.config.update('jax_platforms', 'cpu')
# exact f32 matmuls so oracle comparisons are deterministic
jax.config.update('jax_default_matmul_precision', 'highest')

assert len(jax.devices()) == 8, jax.devices()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DUMMY = os.path.join(REPO, 'data', 'dummy')


@pytest.fixture(scope='session')
def dummy_dir():
    return DUMMY


@pytest.fixture(scope='session')
def dummy_data():
    from textgcn_tpu.data.core import load_interactions
    return load_interactions(DUMMY)


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _reset_package_logger():
    """``config.get_logger`` sets propagate=False and attaches handlers on
    the shared 'textgcn_tpu' logger; a test driving the CLI (or calling
    get_logger directly) must not silence caplog for later tests."""
    import logging
    logger = logging.getLogger('textgcn_tpu')
    yield
    for h in list(logger.handlers):
        h.close()
    logger.handlers.clear()
    logger.propagate = True
    logger.setLevel(logging.NOTSET)


@pytest.fixture(autouse=True)
def _isolate_retrieval_env():
    """Retrieval-mode env opt-ins are read at trace time; a test (or the
    CLI it drives) flipping one must never leak it into later tests."""
    keys = ('TEXTGCN_TPU_APPROX_TOPK', 'TEXTGCN_TPU_BLOCKED_TOPK',
            'TEXTGCN_TPU_ADV_TOPK')
    saved = {k: os.environ.get(k) for k in keys}
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
