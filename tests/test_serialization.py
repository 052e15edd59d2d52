"""Tests: cdt checkpoint save/load + torch state-dict import round-trip."""
import jax
import numpy as np
import pytest

from celldetection_tpu import models, util


def test_save_load_roundtrip(tmp_path):
    m = models.CpnU12(in_channels=1, max_detections=32, samples=8,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(0), (1, 32, 32, 1))
    fn = str(tmp_path / 'model.cdt')
    util.save_model(fn, m)
    m2 = util.load_model(fn)
    x = np.random.RandomState(0).rand(1, 32, 32, 1).astype(np.float32)
    o1 = m(x, score_thresh=0.3)
    o2 = m2(x, score_thresh=0.3)
    assert len(o1['contours'][0]) == len(o2['contours'][0])
    if len(o1['contours'][0]):
        np.testing.assert_allclose(o1['contours'][0], o2['contours'][0], rtol=1e-5)


def test_save_fetchable_hash(tmp_path):
    m = models.CpnU12(in_channels=1, max_detections=16, samples=8,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(0), (1, 32, 32, 1))
    fn = str(tmp_path / 'model.cdt')
    new = util.save_fetchable_model(fn, m)
    assert '-' in new
    m2 = util.fetch_model(new)  # local path goes through load_model
    assert m2 is not None


@pytest.mark.parametrize('model_name,encoder,fused', [
    ('CpnU22', 'unet', True),
    ('CpnResNet50UNet', 'resnet', True),  # bottleneck + grouped-conv layout
])
def test_torch_state_dict_roundtrip(model_name, encoder, fused):
    """export (flax -> torch layout) then import restores the exact tree."""
    kwargs = dict(in_channels=3, max_detections=16, samples=8)
    if model_name == 'CpnU22':
        kwargs['backbone_kwargs'] = dict(base_channels=8)
    m = models.get_cpn(model_name)(**kwargs)
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 3))

    sd = util.export_torch_state_dict(m.variables, fused_initial=fused, encoder=encoder)
    assert all(k.startswith('core.') for k in sd)
    # perturb: fill with fresh random values to prove real transport
    rng = np.random.RandomState(0)
    sd = {k: rng.randn(*v.shape).astype(np.float32) for k, v in sd.items()}

    flat = util.translate_cpn_state_dict(
        {k[len('core.'):]: v for k, v in sd.items()}, fused_initial=fused, encoder=encoder)
    new_vars = util.import_state_dict(m.variables, flat, strict=True)

    # verify: exporting again reproduces the same torch dict
    sd2 = util.export_torch_state_dict(new_vars, fused_initial=fused, encoder=encoder)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], rtol=1e-6, err_msg=k)


def test_import_strict_shape_check():
    m = models.CpnU12(in_channels=1, max_detections=16, samples=8,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(0), (1, 32, 32, 1))
    with pytest.raises(KeyError):
        util.import_state_dict(m.variables, {('params', ('nonexistent',)): np.zeros(3)})
