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


# fixture build shape; the byte-bound assertions below derive from these
AUDIT_BATCH = 32
AUDIT_EMB = 16


@pytest.fixture(scope='module')
def audits(mesh, dummy_dir):
    os.environ.setdefault('TEXTGCN_TPU_TEXT_ENCODER', 'stub')
    out = {}
    for name in ('lgcn', 'ltr_linear'):
        cfg, data, model = _build(name, str(dummy_dir), mesh,
                                  batch_size=AUDIT_BATCH,
                                  emb_size=AUDIT_EMB, k=(3,))
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
    # batch-shaped only: with tables sharded over the full mesh the ego
    # lookups gather (B, d) rows cross-device — a few KB that do NOT
    # scale with the graph — plus the scalar loss all-reduce.  Table-
    # shaped traffic (rows x d x 4 per table) must stay out.
    batch_rows = AUDIT_BATCH * AUDIT_EMB * 4          # one (B, d) f32 gather
    assert a['cached_ego_step']['bytes'] <= 8 * batch_rows + 1024, \
        a['cached_ego_step']
    # the refresh carries ALL the propagation traffic (6 table-shaped
    # reduce-scatters: 3 layers x 2 directions); the ego step carries
    # none
    refresh_ops = a['cached_refresh']['by_op']
    assert refresh_ops.get('reduce-scatter', {}).get('count', 0) == 6, \
        refresh_ops
    ego_ops = a['cached_ego_step']['by_op']
    assert 'reduce-scatter' not in ego_ops, ego_ops


def test_propagation_reduces_via_reduce_scatter(audits, dummy_dir):
    """SCALING.md lever 1, regression-guarded: the explicit shard_map
    propagation (parallel/xla_sharded.py) must combine its partial sums
    with reduce-scatter, leaving NO table-shaped all-reduce in the train
    step.  (Measured at S1 this cut per-step collective volume 222.6 ->
    19.5 MB/device.)"""
    from textgcn_tpu.data.core import load_interactions
    data = load_interactions(str(dummy_dir))
    table_rows = min(-(-data.n_users // 8) * 8, -(-data.n_items // 8) * 8)
    table_bytes = table_rows * 16 * 4          # smaller padded table, f32
    for name in ('lgcn', 'ltr_linear'):
        step = audits[name]['train_step']['by_op']
        # 3 layers x 2 directions, forward + backward
        assert step.get('reduce-scatter', {}).get('count', 0) == 12, step
        # any surviving all-reduce must be scalar-shaped (loss/nan), not
        # table-shaped
        assert step.get('all-reduce', {}).get('bytes', 0) < table_bytes, \
            step
        # all-gathers are batch-shaped ego lookups (B x d rows), never a
        # full-table re-materialization
        b_times_d = AUDIT_BATCH * AUDIT_EMB * 4
        assert step.get('all-gather', {}).get('bytes', 0) <= \
            16 * b_times_d, step


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
