"""ImageNet-pretrained encoder initialization (torchvision layout import)."""
import jax
import numpy as np
import pytest

from celldetection_tpu import models
from celldetection_tpu.util.pretrained import (adapt_first_conv, apply_pretrained_,
                                               translate_torchvision_resnet,
                                               DEFAULT_MODEL_URLS)


def _torchvision_layout_from_tree(variables, rng):
    """Synthesize a torchvision-layout ResNet state dict matching the model's
    encoder shapes (inverse of translate_torchvision_resnet's path mapping)."""
    from flax.traverse_util import flatten_dict
    sd = {}
    leaf_map = {('params', 'scale'): 'weight', ('params', 'bias'): 'bias',
                ('batch_stats', 'mean'): 'running_mean',
                ('batch_stats', 'var'): 'running_var'}
    for coll in variables:
        for path, v in flatten_dict(variables[coll]).items():
            if path[:2] != ('backbone', 'body'):
                continue
            p, leaf = list(path[2:]), path[-1]
            val = rng.randn(*np.shape(v)).astype(np.float32)
            if leaf == 'kernel':
                val_t = np.transpose(val, (3, 2, 0, 1))  # HWIO -> OIHW
            if p[0] == 'conv1':
                sd['conv1.weight'] = val_t
            elif p[0] == 'bn1':
                sd[f'bn1.{leaf_map[(coll, leaf)]}'] = val
            else:  # layerN / blockM / (convK|bnK|downsample_*)
                layer = p[0].replace('layer', '')
                block = p[1].replace('block', '')
                kind = p[2]
                if kind.startswith('conv'):
                    sd[f'layer{layer}.{block}.{kind}.weight'] = val_t
                elif kind.startswith('bn'):
                    sd[f'layer{layer}.{block}.{kind}.{leaf_map[(coll, leaf)]}'] = val
                elif kind == 'downsample_conv':
                    sd[f'layer{layer}.{block}.downsample.0.weight'] = val_t
                else:
                    sd[f'layer{layer}.{block}.downsample.1.{leaf_map[(coll, leaf)]}'] = val
    sd['fc.weight'] = rng.randn(1000, 8).astype(np.float32)  # must be skipped
    sd['fc.bias'] = rng.randn(1000).astype(np.float32)
    return sd


def test_adapt_first_conv_nearest_semantics():
    k = np.arange(2 * 3 * 2 * 2, dtype=np.float32).reshape(2, 3, 2, 2)
    # 3 -> 1 channel: torch nearest picks floor(0 * 3 / 1) = channel 0
    np.testing.assert_array_equal(adapt_first_conv(k, 1), k[:, [0]])
    # 3 -> 6: floor([0..5] * 0.5) = [0, 0, 1, 1, 2, 2]
    np.testing.assert_array_equal(adapt_first_conv(k, 6), k[:, [0, 0, 1, 1, 2, 2]])
    np.testing.assert_array_equal(adapt_first_conv(k, 3), k)


def test_pretrained_loads_into_resnet_unet():
    m = models.CpnResNet18UNet(in_channels=3, max_detections=16, samples=8)
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rng = np.random.RandomState(0)
    sd = _torchvision_layout_from_tree(m.variables, rng)

    apply_pretrained_(m, sd)
    got = np.asarray(m.variables['params']['backbone']['body']['conv1']['kernel'])
    np.testing.assert_allclose(got, np.transpose(sd['conv1.weight'], (2, 3, 1, 0)))
    got_var = np.asarray(
        m.variables['batch_stats']['backbone']['body']['layer4']['block1']['bn2']['norm']['var'])
    np.testing.assert_allclose(got_var, sd['layer4.1.bn2.running_var'])


def test_pretrained_channel_adaptation_single_channel():
    """pretrained with in_channels=1: conv1 weights are channel-adapted
    (parity: celldetection/models/resnet.py:253-254)."""
    m3 = models.CpnResNet18UNet(in_channels=3, max_detections=16, samples=8)
    m3.init(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rng = np.random.RandomState(1)
    sd = _torchvision_layout_from_tree(m3.variables, rng)

    m1 = models.CpnResNet18UNet(in_channels=1, max_detections=16, samples=8,
                                backbone_kwargs=dict(pretrained=sd))
    m1.hparams['model'] = 'CpnResNet18UNet'
    m1.init(jax.random.PRNGKey(0), (1, 64, 64, 1))  # applies pretrained
    got = np.asarray(m1.variables['params']['backbone']['body']['conv1']['kernel'])
    expect = np.transpose(adapt_first_conv(sd['conv1.weight'], 1), (2, 3, 1, 0))
    np.testing.assert_allclose(got, expect)
    # the rest of the encoder transported unmodified
    got_l1 = np.asarray(
        m1.variables['params']['backbone']['body']['layer1']['block0']['conv1']['kernel'])
    np.testing.assert_allclose(got_l1, np.transpose(sd['layer1.0.conv1.weight'], (2, 3, 1, 0)))


def test_pretrained_shape_mismatch_raises():
    m = models.CpnResNet18UNet(in_channels=3, max_detections=16, samples=8)
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rng = np.random.RandomState(2)
    sd = _torchvision_layout_from_tree(m.variables, rng)
    sd['layer1.0.conv1.weight'] = sd['layer1.0.conv1.weight'][:, :8]
    with pytest.raises(ValueError, match='shape mismatch'):
        apply_pretrained_(m, sd)


def test_pretrained_missing_coverage_raises():
    m = models.CpnResNet18UNet(in_channels=3, max_detections=16, samples=8)
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rng = np.random.RandomState(3)
    sd = _torchvision_layout_from_tree(m.variables, rng)
    del sd['layer2.0.conv2.weight']
    with pytest.raises(KeyError, match='not covered'):
        apply_pretrained_(m, sd)


def test_url_table_covers_resnet_family():
    for name in ('ResNet18', 'ResNet50', 'ResNeXt101', 'WideResNet50'):
        assert DEFAULT_MODEL_URLS[name].startswith('https://download.pytorch.org/')


def test_translate_rejects_unknown_keys():
    with pytest.raises(KeyError):
        translate_torchvision_resnet({'foo.bar': np.zeros((1,))})
