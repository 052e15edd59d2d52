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


def test_pretrained_convnext_layout():
    """Torchvision ConvNeXt layout import (sequential indices, LN/Linear/dw)."""
    from flax.traverse_util import flatten_dict
    from celldetection_tpu.util.pretrained import apply_pretrained_

    m = models.get_cpn('CpnConvNeXtTinyUNet')(in_channels=1, max_detections=16, samples=8)
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 1))

    rng = np.random.RandomState(1)
    sd = {}
    for path, v in flatten_dict(m.variables['params']).items():
        if path[:2] != ('backbone', 'body'):
            continue
        mod, leaf = path[2], path[-1]
        val = rng.randn(*np.shape(v)).astype(np.float32)
        if mod == 'stem_conv':
            key = 'features.0.0.' + ('weight' if leaf == 'kernel' else 'bias')
            if leaf == 'kernel':
                val = rng.randn(4, 4, 3, v.shape[-1]).astype(np.float32)
                sd[key] = np.transpose(val, (3, 2, 0, 1))
                continue
        elif mod == 'stem_norm':
            key = 'features.0.1.' + ('weight' if leaf == 'scale' else 'bias')
        elif mod.startswith('down'):
            stage = int(mod[4])
            sub = '0' if mod.endswith('norm') else '1'
            tv_leaf = 'weight' if leaf in ('scale', 'kernel') else 'bias'
            key = f'features.{2 * stage}.{sub}.{tv_leaf}'
            if leaf == 'kernel':
                sd[key] = np.transpose(val, (3, 2, 0, 1))
                continue
        else:  # stage{i}_block{j}
            stage = int(mod[5])
            j = int(mod.split('block')[1])
            base = f'features.{2 * stage + 1}.{j}'
            if leaf == 'layer_scale':
                sd[f'{base}.layer_scale'] = val.reshape(-1, 1, 1)
                continue
            sub = path[3]
            idx = {'dwconv': 0, 'norm': 2, 'mlp0': 3, 'mlp1': 5}[sub]
            tv_leaf = 'weight' if leaf in ('scale', 'kernel') else 'bias'
            key = f'{base}.block.{idx}.{tv_leaf}'
            if leaf == 'kernel':
                sd[key] = np.transpose(val, (3, 2, 0, 1)) if sub == 'dwconv' else val.T
                continue
        sd[key] = val
    sd['classifier.2.weight'] = rng.randn(1000, 768).astype(np.float32)

    m.hparams['model'] = 'CpnConvNeXtTinyUNet'
    apply_pretrained_(m, sd)
    got = np.asarray(m.variables['params']['backbone']['body']['stem_conv']['kernel'])
    src = np.transpose(sd['features.0.0.weight'], (2, 3, 1, 0))
    np.testing.assert_allclose(got, src[:, :, [0], :])
    got_ls = np.asarray(
        m.variables['params']['backbone']['body']['stage0_block0']['layer_scale'])
    np.testing.assert_allclose(got_ls, sd['features.1.0.layer_scale'].reshape(-1))


def test_pretrained_densenet_layout():
    """Torchvision DenseNet layout import (named modules, conv0 adaptation)."""
    from flax.traverse_util import flatten_dict
    from celldetection_tpu.util.pretrained import translate_torchvision_densenet

    m = models.get_cpn('CpnDenseNet121UNet') if 'CpnDenseNet121UNet' in models.models_by_name \
        else None
    if m is None:
        import pytest as _pytest
        _pytest.skip('no DenseNet CPN in zoo')
    m = m(in_channels=1, max_detections=16, samples=8)
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 1))

    # synthesize torchvision-layout dict from the tree (inverse path mapping)
    rng = np.random.RandomState(0)
    leaf_map = {('params', 'scale'): 'weight', ('params', 'bias'): 'bias',
                ('batch_stats', 'mean'): 'running_mean',
                ('batch_stats', 'var'): 'running_var'}
    sd = {}
    for coll in m.variables:
        for path, v in flatten_dict(m.variables[coll]).items():
            if path[:2] != ('backbone', 'body'):
                continue
            mods, leaf = path[2:-1], path[-1]
            val = rng.randn(*np.shape(v)).astype(np.float32)
            if leaf == 'kernel':
                name = '.'.join(mods) + '.weight'
                # conv0 gets channel-adapted on import: emit 3-channel source
                if mods == ('conv0',):
                    val = rng.randn(v.shape[0], v.shape[1], 3, v.shape[3]).astype(np.float32)
                sd['features.' + name] = np.transpose(val, (3, 2, 0, 1))
            else:
                key = '.'.join(path[2:-2]) + '.' + leaf_map[(coll, leaf)]
                sd['features.' + key] = val
    sd['classifier.weight'] = rng.randn(1000, 8).astype(np.float32)

    from celldetection_tpu.util.pretrained import apply_pretrained_
    m.hparams['model'] = 'CpnDenseNet121UNet'
    apply_pretrained_(m, sd)
    got = np.asarray(m.variables['params']['backbone']['body']['conv0']['kernel'])
    expect = np.transpose(sd['features.conv0.weight'], (2, 3, 1, 0))[:, :, [0], :]
    np.testing.assert_allclose(got, expect)
