"""Structural guards over the compiled SPMD programs (docs/SCALING.md).

These don't pin exact byte counts (brittle across JAX versions) — they
pin the *shape* of the communication the audit measured in round 3, so a
sharding regression (e.g. GSPMD replicating the score matrix, or the
fused LTR eval starting to move its 13d-dim factors) fails loudly.
"""

import os
import sys

import pytest

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from tools.collective_audit import _build, audit_model  # noqa: E402


@pytest.fixture(scope='module')
def mesh():
    from textgcn_tpu.parallel.mesh import make_mesh
    return make_mesh((4, 2))


@pytest.fixture(scope='module')
def audits(mesh, dummy_dir):
    os.environ.setdefault('TEXTGCN_TPU_TEXT_ENCODER', 'stub')
    out = {}
    for name in ('lgcn', 'ltr_linear'):
        cfg, data, model = _build(name, str(dummy_dir), mesh,
                                  batch_size=32, emb_size=16, k=(3,))
        out[name] = audit_model(mesh, cfg, data, model)
    return out


def test_fused_eval_is_communication_free(audits):
    """The collapsed-tower fused factors are built locally from the
    replicated propagated tables: fused eval must stay collective-
    identical to plain dot-product eval (SCALING.md finding 2)."""
    a = audits['ltr_linear']
    assert a['eval_batch'] == a['eval_batch_plain']


def test_ltr_head_adds_no_collectives(audits):
    """The (F->1) tower's gradient must ride the existing gathers, not
    add table-scale traffic (SCALING.md finding 1; correctness of the
    tower gradient is proven in test_parallel)."""
    lg, ltr = audits['lgcn'], audits['ltr_linear']
    assert ltr['train_step']['count'] <= lg['train_step']['count'] + 2
    assert ltr['train_step']['bytes'] <= lg['train_step']['bytes'] * 1.01


def test_cached_ego_step_is_nearly_communication_free(audits):
    """Cached mode's measured structure (SCALING.md §4): the full
    propagation (and its table-shaped collectives) rides the refresh —
    once per N steps — while the ego-only step between refreshes moves
    only scalars.  Numerical mesh-vs-single equivalence of the ego step
    is covered by the trainer equivalence tests; this pins the BYTES."""
    a = audits['lgcn']
    assert 'cached_refresh' in a and 'cached_ego_step' in a
    assert a['cached_ego_step']['bytes'] <= 1024, a['cached_ego_step']
    # the refresh carries the propagation traffic (> the ego step)
    assert a['cached_refresh']['bytes'] > a['cached_ego_step']['bytes']


def test_collective_budget_is_table_shaped(audits, dummy_dir):
    """No single collective may exceed one full (padded) table pair, and
    the per-step total must stay within the SCALING.md byte model
    (~10x tables + edges) — a replicated (B, n_items) score matrix or an
    unsharded feature tensor would blow straight through this."""
    from textgcn_tpu.data.core import load_interactions
    data = load_interactions(str(dummy_dir))
    # padded table rows (mesh size 8), f32, emb 16 — as _build configures
    nu = -(-data.n_users // 8) * 8
    ni = -(-data.n_items // 8) * 8
    table_pair = (nu + ni) * 16 * 4
    edges = data.n_train * 4 * 4
    for name, a in audits.items():
        for phase in ('train_step', 'eval_batch'):
            s = a[phase]
            assert s['bytes'] <= 14 * table_pair + 4 * edges + 65536, \
                f'{name}.{phase} moved {s["bytes"]} bytes'
