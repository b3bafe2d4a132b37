"""Config parsing + import-hygiene regression tests."""

import subprocess
import sys

from textgcn_tpu.config import parse_args


def test_mesh_flag_shapes():
    base = ['--model', 'lgcn', '--data', 'data/dummy']
    assert parse_args(base).mesh_shape == (0, 0)
    assert not parse_args(base).mesh  # '' -> no mesh path

    cfg = parse_args(base + ['--mesh', '2x4'])
    assert cfg.mesh_shape == (2, 4)

    # 'auto': mesh path on, shape auto-derived over all visible devices
    cfg = parse_args(base + ['--mesh', 'auto'])
    assert cfg.mesh and cfg.mesh_shape == (0, 0)


def test_import_does_not_initialize_backend():
    """Importing the package (incl. cli/trainer) must not create device
    buffers: backend init at import time would lock the platform before
    callers can choose one (TEXTGCN_TPU_PLATFORM / jax.config).

    Regression for ops/retrieval.py's module-level jnp constant.
    """
    code = (
        'import jax\n'
        'import textgcn_tpu.cli, textgcn_tpu.train.trainer\n'
        'import textgcn_tpu.models.adv_sampling, textgcn_tpu.models.ltr\n'
        'import jax._src.xla_bridge as xb\n'
        'assert not xb.backends_are_initialized(), '
        '"import initialized the JAX backend"\n'
        'print("clean")\n'
    )
    out = subprocess.run([sys.executable, '-c', code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert 'clean' in out.stdout


def test_ltr_footgun_warnings():
    """Reference parser.py:179-183: LTR models warn when run without a
    base checkpoint or with unfrozen embeddings."""
    from textgcn_tpu.config import warn_footguns

    base = ['--model', 'ltr_linear', '--data', 'data/dummy']
    w = warn_footguns(parse_args(base))
    assert len(w) == 2
    assert any('not loaded' in s for s in w)
    assert any('not frozen' in s for s in w)

    # loaded + frozen -> silent
    w = warn_footguns(parse_args(base + ['--load_base', 'runs/x',
                                         '--freeze']))
    assert w == []

    # --load counts as a base too; unfrozen still warns
    w = warn_footguns(parse_args(base + ['--load', 'runs/x']))
    assert len(w) == 1 and 'not frozen' in w[0]

    # non-LTR models never warn
    assert warn_footguns(parse_args(['--model', 'lgcn'])) == []

    # boosted heads share the contract
    w = warn_footguns(parse_args(['--model', 'gbdt']))
    assert len(w) == 2


def test_conv_models_require_explicit_aggr():
    """Reference parser.py:196-197 hard-asserts --aggr for conv models."""
    import pytest

    for model in ('gcn', 'graphsage', 'gat', 'gatv2'):
        with pytest.raises(AssertionError, match='aggr'):
            parse_args(['--model', model, '--data', 'data/dummy'])
        cfg = parse_args(['--model', model, '--data', 'data/dummy',
                          '--aggr', 'sum'])
        assert cfg.aggr == 'sum'
