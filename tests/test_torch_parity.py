"""Numeric parity: flax blocks vs torch equivalents with identical weights.

Builds the torch twin of each block exactly as the reference composes it
(conv/BN semantics, padding, strides, grouped convs) and checks forward
outputs match after weight transport. This validates the conventions the
checkpoint importer relies on (OIHW<->HWIO, BN eps/momentum, SAME-style
padding arithmetic).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')


def _to_torch_conv(conv, kernel, bias=None):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.transpose(kernel, (3, 2, 0, 1))))
        if bias is not None:
            conv.bias.copy_(torch.from_numpy(bias))
    return conv


def _to_torch_bn(bn, scale, bias, mean, var):
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    return bn


def _run_torch(module, x_nhwc):
    module.eval()
    with torch.no_grad():
        y = module(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def test_convnorm_matches_torch():
    from celldetection_tpu.models.commons import ConvNorm
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    m = ConvNorm(8, kernel_size=3, stride=2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    y = np.asarray(m.apply(v, jnp.asarray(x), False))

    p = v['params']
    bs = v['batch_stats']
    tm = torch.nn.Sequential(
        _to_torch_conv(torch.nn.Conv2d(3, 8, 3, stride=2, padding=1),
                       np.asarray(p['conv']['kernel']), np.asarray(p['conv']['bias'])),
        _to_torch_bn(torch.nn.BatchNorm2d(8),
                     np.asarray(p['norm']['norm']['scale']),
                     np.asarray(p['norm']['norm']['bias']),
                     np.asarray(bs['norm']['norm']['mean']),
                     np.asarray(bs['norm']['norm']['var'])),
    )
    yt = _run_torch(tm, x)
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


def test_basicblock_matches_torch():
    from celldetection_tpu.models.resnet import BasicBlock
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 16, 4).astype(np.float32)
    m = BasicBlock(planes=8, stride=2, has_downsample=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    y = np.asarray(m.apply(v, jnp.asarray(x), False))

    p, bs = v['params'], v['batch_stats']

    class TorchBasic(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(4, 8, 3, stride=2, padding=1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(8)
            self.conv2 = torch.nn.Conv2d(8, 8, 3, padding=1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(8)
            self.down = torch.nn.Sequential(torch.nn.Conv2d(4, 8, 1, stride=2, bias=False),
                                            torch.nn.BatchNorm2d(8))

        def forward(self, x):
            idn = self.down(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idn)

    tm = TorchBasic()
    _to_torch_conv(tm.conv1, np.asarray(p['conv1']['kernel']))
    _to_torch_bn(tm.bn1, np.asarray(p['bn1']['norm']['scale']), np.asarray(p['bn1']['norm']['bias']),
                 np.asarray(bs['bn1']['norm']['mean']), np.asarray(bs['bn1']['norm']['var']))
    _to_torch_conv(tm.conv2, np.asarray(p['conv2']['kernel']))
    _to_torch_bn(tm.bn2, np.asarray(p['bn2']['norm']['scale']), np.asarray(p['bn2']['norm']['bias']),
                 np.asarray(bs['bn2']['norm']['mean']), np.asarray(bs['bn2']['norm']['var']))
    _to_torch_conv(tm.down[0], np.asarray(p['downsample_conv']['kernel']))
    _to_torch_bn(tm.down[1], np.asarray(p['downsample_norm']['norm']['scale']),
                 np.asarray(p['downsample_norm']['norm']['bias']),
                 np.asarray(bs['downsample_norm']['norm']['mean']),
                 np.asarray(bs['downsample_norm']['norm']['var']))
    yt = _run_torch(tm, x)
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


def test_grouped_bottleneck_conv_matches_torch():
    """ResNeXt grouped conv layout transports correctly."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 16).astype(np.float32)
    kernel = rng.randn(3, 3, 4, 16).astype(np.float32) * 0.1  # HWIO, groups=4 (I/g=4)
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kernel), (1, 1), [(1, 1), (1, 1)],
        feature_group_count=4, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    conv = torch.nn.Conv2d(16, 16, 3, padding=1, groups=4, bias=False)
    _to_torch_conv(conv, kernel)
    yt = _run_torch(conv, x)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)


def test_maxpool_stem_matches_torch():
    """ResNet stem max-pool 3x3/2 pad 1 semantics."""
    rng = np.random.RandomState(3)
    x = rng.randn(1, 17, 17, 4).astype(np.float32)
    from flax import linen as nn
    y = nn.max_pool(jnp.asarray(x), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    yt = _run_torch(torch.nn.MaxPool2d(3, stride=2, padding=1), x)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-5, atol=1e-6)


def test_bilinear_resize_matches_torch_interpolate():
    from celldetection_tpu.ops.commons import resize_bilinear
    rng = np.random.RandomState(4)
    x = rng.randn(1, 13, 17, 3).astype(np.float32)
    y = np.asarray(resize_bilinear(jnp.asarray(x), (29, 31)))
    with torch.no_grad():
        yt = torch.nn.functional.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), (29, 31),
            mode='bilinear', align_corners=False)
    np.testing.assert_allclose(y, np.transpose(yt.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_nearest_resize_matches_torch():
    from celldetection_tpu.ops.commons import resize_nearest
    rng = np.random.RandomState(5)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    y = np.asarray(resize_nearest(jnp.asarray(x), (16, 16)))
    with torch.no_grad():
        yt = torch.nn.functional.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), (16, 16), mode='nearest')
    np.testing.assert_allclose(y, np.transpose(yt.numpy(), (0, 2, 3, 1)), rtol=1e-6)
