"""Compiled-HLO collective audit for the mesh (multi-chip) path.

Answers the question hardware alone can't here (one real chip): WHICH
collectives does GSPMD insert into the sharded train step and the
distributed top-k eval, and HOW MANY BYTES move per step?  The audit
lowers the exact jitted programs the Trainer runs (same sharding
annotations, same shapes), parses the compiled SPMD module for
collective ops, and reports per-op byte counts — the input to the
comm-vs-compute scaling model in docs/SCALING.md.

The ops being distributed are the reference's single-device propagation
and full-catalog top-k (``/root/reference/TextGCN/base_model.py:148,261``);
the reference has no multi-device story, so these numbers have no
reference counterpart to compare against — BASELINE.md's >=80% scaling
target is the bar instead.

One dtype caveat: the CPU backend legalizes bf16 collectives by
UPCASTING (a pure-bf16 reduce-scatter compiles to ``f32[..]
reduce-scatter(wrapped_convert)``), so these compiled-CPU byte counts
show the propagation reduce-scatters at f32 width even though the
emitted program carries bf16 payloads (the round-5 default — TPU lowers
them natively at half these bytes).  tests/test_rs_bf16.py pins the
emitted dtype at the StableHLO level; docs/SCALING.md §4c carries the
halved wire model.

Usage (virtual 8-device CPU mesh):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/collective_audit.py [--devices 8] [--scale small|prod]

Library: ``audit_model(mesh, cfg, data, model) -> dict`` (used by
``__graft_entry__.dryrun_multichip`` and docs/SCALING.md).
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {
    'pred': 1, 's8': 1, 'u8': 1, 's16': 2, 'u16': 2, 'f16': 2, 'bf16': 2,
    's32': 4, 'u32': 4, 'f32': 4, 's64': 8, 'u64': 8, 'f64': 8, 'c64': 8,
    'c128': 16,
}

COLLECTIVES = ('all-reduce', 'all-gather', 'reduce-scatter', 'all-to-all',
               'collective-permute', 'collective-broadcast')

# "%x = f32[64,16]{1,0} all-gather(...)" or tuple results
# "(f32[8], f32[8]) all-reduce-start(...)"; -done ops are skipped (their
# operand was already counted at -start)
_OP_RE = re.compile(
    r'=\s*(?P<shape>\([^=]*?\)|[a-z0-9]+\[[^\]]*\]\S*)\s+'
    r'(?P<op>' + '|'.join(COLLECTIVES) + r')(?P<suffix>-start|-done)?\(')

_SHAPE_RE = re.compile(r'([a-z0-9]+)\[([0-9,]*)\]')


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO result shape (tuples sum their elements)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in DTYPE_BYTES:
            continue  # token[] etc. — no payload
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def parse_collectives(hlo_text: str) -> list[dict]:
    """All collective ops in a compiled HLO module: op kind, result
    shape, and result bytes (per participating device).

    Async ``-start`` ops carry a tuple of (operand buffers, result
    buffers, context); summing the tuple would double-count relative to
    a sync op, so only the largest element (the gathered/reduced result)
    is charged.  ``-done`` ops are skipped entirely (charged at -start).
    """
    out = []
    for m in _OP_RE.finditer(hlo_text):
        if m.group('suffix') == '-done':
            continue
        shape = m.group('shape')
        if m.group('suffix') == '-start' and shape.startswith('('):
            nbytes = max((_shape_bytes(f'{d}[{dims}]')
                          for d, dims in _SHAPE_RE.findall(shape)),
                         default=0)
        else:
            nbytes = _shape_bytes(shape)
        out.append({'op': m.group('op'), 'shape': shape, 'bytes': nbytes})
    return out


def summarize(colls: list[dict]) -> dict:
    """{op: {count, bytes}} + totals."""
    by_op: dict = defaultdict(lambda: {'count': 0, 'bytes': 0})
    for c in colls:
        by_op[c['op']]['count'] += 1
        by_op[c['op']]['bytes'] += c['bytes']
    return {
        'by_op': dict(by_op),
        'count': sum(v['count'] for v in by_op.values()),
        'bytes': sum(v['bytes'] for v in by_op.values()),
    }


def _compiled_text(jitted, *args) -> str:
    return jitted.lower(*args).compile().as_text()


def audit_train_step(mesh, model, optimizer, batch_size: int) -> dict:
    """Lower ONE sharded train step (the body the Trainer scans over an
    epoch) and summarize its collectives."""
    import jax

    from textgcn_tpu.parallel.mesh import shard_params
    from textgcn_tpu.parallel.sharded import make_sharded_train_step

    params = shard_params(mesh, model.init_params(jax.random.key(0)))
    opt_state = optimizer.init(params)
    run = make_sharded_train_step(mesh, model, optimizer)
    batch = jax.tree.map(
        lambda x: x[0], model.sample_batches(jax.random.key(1), batch_size))
    text = _compiled_text(run.jitted, params, opt_state, tuple(batch),
                          jax.random.key(2), model.captured_state())
    return summarize(parse_collectives(text))


def audit_eval_batch(mesh, model, batch_size: int, k: int,
                     fused: bool = False) -> dict:
    """Lower one eval batch: propagation + catalog-sharded top-k (plain
    dot-product path, or the fused LTR factorization when ``fused``)."""
    import jax
    import jax.numpy as jnp

    from textgcn_tpu.parallel.mesh import shard_params
    from textgcn_tpu.parallel.sharded import sharded_topk

    params = shard_params(mesh, model.init_params(jax.random.key(0)))

    def eval_batch(params, bu, captured):
        with model.bound(captured):
            reprs = model.representation(params, training=False)
            if fused:
                u_cat, i_cat, bias = model.fused_catalog_inputs(
                    params, reprs, bu)
                vals, idx = sharded_topk(mesh, u_cat, i_cat,
                                         model.pos_padded[bu], k,
                                         n_valid=model.n_items)
                vals = vals + bias
            else:
                users_repr, items_repr = reprs
                vals, idx = sharded_topk(mesh, users_repr[bu], items_repr,
                                         model.pos_padded[bu], k,
                                         n_valid=model.n_items)
        return vals, idx

    jitted = jax.jit(eval_batch)
    bu = jnp.zeros((batch_size,), jnp.int32)
    text = _compiled_text(jitted, params, bu, model.captured_state())
    return summarize(parse_collectives(text))


def audit_cached(mesh, model, optimizer, batch_size: int) -> dict:
    """Lower the two components of cached-propagation training
    (``--refresh_every N``): the refresh (full propagation of the
    stale 'rest') and the ego-only train step that runs between
    refreshes.  Amortized per-step bytes = ego + refresh / N."""
    import jax

    from textgcn_tpu.parallel.mesh import (DATA_AXIS, param_shardings,
                                           shard_params)
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = shard_params(mesh, model.init_params(jax.random.key(0)))
    opt_state = optimizer.init(params)
    cap = model.captured_state()

    def refresh(params, key, captured):
        with model.bound(captured):
            return model.propagate_rest(params, key)

    r_text = _compiled_text(jax.jit(refresh), params, jax.random.key(1),
                            cap)

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    def ego_step(params, opt_state, rest, batch, key, captured):
        batch = tuple(
            jax.lax.with_sharding_constraint(b, batch_sh) for b in batch)
        with model.bound(captured), model.with_cached_rest(rest):
            (loss, _), grads = jax.value_and_grad(
                model.loss, has_aux=True)(params, batch, key)
        grads = jax.lax.with_sharding_constraint(
            grads, param_shardings(mesh, grads))
        import optax
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with model.bound(cap):
        rest = jax.jit(refresh)(params, jax.random.key(1), cap)
        batch = jax.tree.map(
            lambda x: x[0], model.sample_batches(jax.random.key(2),
                                                 batch_size))
    e_text = _compiled_text(jax.jit(ego_step), params, opt_state, rest,
                            tuple(batch), jax.random.key(3), cap)
    return {'refresh': summarize(parse_collectives(r_text)),
            'ego_step': summarize(parse_collectives(e_text))}


def audit_model(mesh, cfg, data, model, k: int | None = None) -> dict:
    """Full audit for one model: train-step + eval-batch collective
    tables.  The model must already be mesh-sharded (``shard_model``)."""
    import optax

    k = k or max(cfg.k)
    fused = getattr(model, 'supports_fused_sharded_topk', False)
    out = {
        'model': cfg.model,
        'mesh': dict(mesh.shape),
        'batch_size': cfg.batch_size,
        'emb_size': cfg.emb_size,
        'train_step': audit_train_step(mesh, model, optax.adam(cfg.lr),
                                       cfg.batch_size),
        'eval_batch': audit_eval_batch(mesh, model, cfg.batch_size, k,
                                       fused=fused),
    }
    if fused:
        # docs/SCALING.md finding: the collapsed-tower fused factors are
        # computed locally from replicated propagated tables, so the
        # fused eval is collective-identical to plain scoring.  Keep the
        # plain lowering in the JSON so that claim stays regression-checked.
        out['eval_batch_plain'] = audit_eval_batch(
            mesh, model, cfg.batch_size, k, fused=False)
    if getattr(model, 'supports_cached_propagation', False) \
            and cfg.n_layers > 0:
        cached = audit_cached(mesh, model, optax.adam(cfg.lr),
                              cfg.batch_size)
        out['cached_refresh'] = cached['refresh']
        out['cached_ego_step'] = cached['ego_step']
    return out


def format_audit(audit: dict) -> str:
    lines = [f"collective audit: model={audit['model']} "
             f"mesh={audit['mesh']} B={audit['batch_size']} "
             f"d={audit['emb_size']}"]
    phases = ('train_step', 'eval_batch', 'eval_batch_plain',
              'cached_refresh', 'cached_ego_step')
    for phase in (p for p in phases if p in audit):
        s = audit[phase]
        lines.append(f"  {phase}: {s['count']} collectives, "
                     f"{s['bytes'] / 1e6:.3f} MB/device")
        for op, v in sorted(s['by_op'].items()):
            lines.append(f"    {op:<20} x{v['count']:<3} "
                         f"{v['bytes'] / 1e6:.3f} MB")
    return '\n'.join(lines)


def _build(model_name: str, data_dir: str, mesh, **cfg_kw):
    from textgcn_tpu.config import Config
    from textgcn_tpu.parallel.mesh import shard_model
    from textgcn_tpu.registry import get_class

    kw = dict(model=model_name, data=data_dir, epochs=1, batch_size=256,
              emb_size=64, n_layers=3, dropout=0.2, k=(5,), save=False,
              save_path='/tmp/collective_audit')
    kw.update(cfg_kw)
    cfg = Config(**kw).finalize()
    loader, model_cls = get_class(model_name)
    data = loader(cfg).padded_to(mesh.size)
    model = shard_model(mesh, model_cls(cfg, data))
    return cfg, data, model


def main(argv=None):
    import argparse
    import json
    import os

    os.environ.setdefault('TEXTGCN_TPU_TEXT_ENCODER', 'stub')
    p = argparse.ArgumentParser()
    p.add_argument('--devices', type=int, default=8)
    p.add_argument('--mesh', default='',
                   help='explicit DATAxMODEL shape, e.g. 4x2')
    p.add_argument('--data', default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'data', 'dummy'))
    p.add_argument('--models', default='lgcn,ltr_linear')
    p.add_argument('--batch_size', type=int, default=256)
    p.add_argument('--emb_size', type=int, default=64)
    p.add_argument('--k', type=int, default=5)
    p.add_argument('--json', action='store_true')
    args = p.parse_args(argv)

    # append (don't replace) so a pre-set XLA_FLAGS can't silently drop
    # the virtual-device count and shrink the mesh to 1x1 (conftest.py
    # uses the same pattern)
    flags = os.environ.get('XLA_FLAGS', '')
    if 'host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags
            + f' --xla_force_host_platform_device_count={args.devices}'
        ).strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from textgcn_tpu.parallel.mesh import make_mesh
    shape = (tuple(int(v) for v in args.mesh.split('x'))
             if args.mesh else None)
    mesh = make_mesh(shape, devices=jax.devices()[:args.devices])

    results = []
    for name in args.models.split(','):
        cfg, data, model = _build(name, args.data, mesh,
                                  batch_size=args.batch_size,
                                  emb_size=args.emb_size,
                                  k=(args.k,))
        audit = audit_model(mesh, cfg, data, model)
        results.append(audit)
        print(format_audit(audit))
    if args.json:
        print(json.dumps(results))
    return results


if __name__ == '__main__':
    main()
