"""The checked-in examples stay runnable."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_quickstart_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'examples/api_quickstart.py')],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={**os.environ, 'TEXTGCN_TPU_TEXT_ENCODER': 'stub',
             'JAX_PLATFORMS': 'cpu'})
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'propagated tables' in out.stdout


@pytest.mark.parametrize('script', ['headline_recipe.sh',
                                    'production_training.sh'])
def test_shell_examples_parse(script):
    out = subprocess.run(['bash', '-n', os.path.join(REPO, 'examples',
                                                     script)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
