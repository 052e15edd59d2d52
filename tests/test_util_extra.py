"""Tests: param surgery, system utils, shm cache."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from celldetection_tpu import util


@pytest.fixture(scope='module')
def params():
    return {'backbone': {'conv1': {'kernel': jnp.ones((3, 3, 1, 4))}},
            'head': {'conv': {'kernel': jnp.ones((1, 1, 4, 2)), 'bias': jnp.zeros(2)}}}


def test_iter_and_match(params):
    assert len(list(util.iter_params(params))) == 3
    assert util.match_paths(params, 'backbone') == {'backbone/conv1/kernel'}


def test_map_and_replace(params):
    doubled = util.map_params(params, lambda s, v: v * 2, 'head')
    assert float(doubled['head']['conv']['kernel'][0, 0, 0, 0]) == 2.
    assert float(doubled['backbone']['conv1']['kernel'][0, 0, 0, 0]) == 1.
    rep = util.replace_params(params, {'head/conv/bias': np.ones(2)})
    assert float(rep['head']['conv']['bias'][0]) == 1.
    with pytest.raises(KeyError):
        util.replace_params(params, {'missing/path': np.ones(2)})


def test_freeze_mask_and_optimizer(params):
    mask = util.freeze_mask(params, 'backbone')
    assert mask['backbone']['conv1']['kernel'] is False
    assert mask['head']['conv']['kernel'] is True
    tx = util.frozen_optimizer(optax.sgd(1.0), params, 'backbone')
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates['backbone']['conv1']['kernel']).sum()) == 0.
    assert float(jnp.abs(updates['head']['conv']['kernel']).sum()) > 0.


def test_ema_and_count(params):
    ema = util.ema_update(params, jax.tree_util.tree_map(lambda v: v * 0, params), decay=0.9)
    assert np.isclose(float(ema['head']['conv']['kernel'][0, 0, 0, 0]), 0.9)
    assert util.count_params(params) == 9 * 4 + 4 * 2 + 2


def test_bytes_percent():
    assert 'MiB' in str(util.Bytes(5 * 1024 * 1024))
    assert str(util.Percent(0.5)) == '50.0%'


def test_random_states_roundtrip(tmp_path):
    key = util.random_seed(42)
    np_val1 = np.random.rand()
    util.save_random_states(str(tmp_path / 'rng.pkl'), key)
    np_val2 = np.random.rand()
    key2 = util.load_random_states(str(tmp_path / 'rng.pkl'))
    np_val3 = np.random.rand()
    assert np_val2 == np_val3  # numpy state restored
    assert jnp.array_equal(jax.random.key_data(key), jax.random.key_data(key2))


def test_oom_catcher():
    catcher = util.OomCatcher(attempts=3, initial=8)
    sizes = []
    for bs in catcher:
        sizes.append(bs)
        with catcher:
            if bs > 2:
                raise RuntimeError('RESOURCE_EXHAUSTED: out of memory')
    assert sizes == [8, 4, 2] and catcher.ok


def test_shm_cache(tmp_path):
    src = tmp_path / 'data.bin'
    src.write_bytes(b'hello' * 100)
    cache = util.ShmCache(root=str(tmp_path / 'shm'))
    staged = cache.setup([str(src)])
    assert os.path.isfile(staged[0])
    assert open(staged[0], 'rb').read() == b'hello' * 100
    cache.teardown()
    assert not os.path.exists(staged[0])


def test_tpu_stats():
    stats = util.TpuStats()
    d = stats.dict()
    assert isinstance(d, dict)


def test_imagej_rois_roundtrip(tmp_path):
    import zipfile
    cons = [np.array([[5, 5], [20, 5], [20, 15], [5, 15]], float),
            np.array([[30, 30], [40, 30], [35, 45]], float)]
    fn = util.save_rois(str(tmp_path / 'rois.zip'), cons)
    with zipfile.ZipFile(fn) as z:
        names = z.namelist()
        assert len(names) == 2
        data = z.read(names[0])
    assert data[:4] == b'Iout'
    import struct
    top, left, bottom, right = struct.unpack_from('>hhhh', data, 8)
    assert (left, top, right, bottom) == (5, 5, 20, 15)
    (n,) = struct.unpack_from('>H', data, 16)
    assert n == 4


def test_batched_h5_and_base64(tmp_path):
    from celldetection_tpu.util import io as uio
    fn = str(tmp_path / 'b.h5')
    uio.to_batched_h5(fn, contours=[np.zeros((5, 2)), np.zeros((7, 2))])
    uio.to_batched_h5(fn, contours=[np.zeros((3, 2))])
    import h5py
    with h5py.File(fn) as h:
        assert len(h['contours']) == 3
        assert h['contours/2'].shape == (3, 2)
    img = (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(np.uint8)
    s = uio.img_to_base64(img)
    back = uio.base64_to_img(s)
    np.testing.assert_array_equal(img, back)


def test_spectral_and_weight_normalize():
    rng = np.random.RandomState(0)
    params = {'conv': {'kernel': jnp.asarray(rng.randn(3, 3, 4, 8) * 3, jnp.float32)}}
    sn = util.spectral_normalize(params)
    w = np.asarray(sn['conv']['kernel']).reshape(-1, 8)
    assert abs(np.linalg.svd(w, compute_uv=False)[0] - 1.0) < 1e-2
    wn = util.weight_normalize(params)
    w2 = np.asarray(wn['conv']['kernel']).reshape(-1, 8)
    np.testing.assert_allclose(np.linalg.norm(w2, axis=0), 1.0, rtol=1e-5)
