"""Checkpoint backends: pickle and orbax latest/best contract + roundtrip."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from textgcn_tpu.train.checkpoint import (OrbaxCheckpointer,
                                          PickleCheckpointer,
                                          make_checkpointer)


@pytest.mark.parametrize('backend', ['pickle', 'orbax'])
def test_roundtrip_and_best(tmp_path, backend):
    ck = make_checkpointer(backend)
    save = str(tmp_path / 'run')
    params = {'user_emb': jnp.arange(12.0).reshape(3, 4),
              'item_emb': jnp.ones((2, 4))}
    ck.save_latest(save, {'params': params, 'epoch': 5, 'model': 'lgcn'})
    ck.promote_best(save)
    assert os.path.exists(os.path.join(save, ck.latest_name))
    assert os.path.exists(os.path.join(save, ck.best_name))

    # load from dir resolves best
    state = ck.load(save)
    np.testing.assert_array_equal(np.asarray(state['params']['user_emb']),
                                  np.asarray(params['user_emb']))
    epoch = state.get('epoch') or state.get('meta', {}).get('epoch')
    assert epoch == 5

    # overwrite latest with new params; best unchanged
    params2 = {'user_emb': jnp.zeros((3, 4)), 'item_emb': jnp.ones((2, 4))}
    ck.save_latest(save, {'params': params2, 'epoch': 6, 'model': 'lgcn'})
    best = ck.load(save)
    np.testing.assert_array_equal(np.asarray(best['params']['user_emb']),
                                  np.asarray(params['user_emb']))


def test_orbax_reads_pickle_fallback(tmp_path):
    """An orbax-configured trainer can still load reference-style .pkl."""
    save = str(tmp_path / 'run')
    pk = PickleCheckpointer()
    params = {'user_emb': jnp.ones((2, 2))}
    pk.save_latest(save, {'params': params, 'epoch': 1, 'model': 'lgcn'})
    pk.promote_best(save)
    ob = OrbaxCheckpointer()
    state = ob.load(save)
    np.testing.assert_array_equal(np.asarray(state['params']['user_emb']),
                                  np.ones((2, 2)))
