"""DenseNet encoders — flax.linen (NHWC).

Behavioral reference: ``celldetection/models/densenet.py`` — DenseLayer (:59),
DenseBlock (:95), Transition (:132), DenseNet (:156), 121/161/169/201
(:314-464). Multi-scale encoder: features before each transition.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .commons import Norm

__all__ = ['DenseNet', 'DenseNet121', 'DenseNet161', 'DenseNet169', 'DenseNet201']


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        out = Norm('batchnorm2d', name='norm1')(x, train)
        out = jax.nn.relu(out)
        out = nn.Conv(self.bn_size * self.growth_rate, (1,) * nd, use_bias=False,
                      name='conv1')(out)
        out = Norm('batchnorm2d', name='norm2')(out, train)
        out = jax.nn.relu(out)
        out = nn.Conv(self.growth_rate, (3,) * nd, padding=1, use_bias=False, name='conv2')(out)
        return jnp.concatenate([x, out], -1)


class _DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            x = _DenseLayer(self.growth_rate, self.bn_size, name=f'denselayer{i + 1}')(x, train)
        return x


class _Transition(nn.Module):
    out_c: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        x = Norm('batchnorm2d', name='norm')(x, train)
        x = jax.nn.relu(x)
        x = nn.Conv(self.out_c, (1,) * nd, use_bias=False, name='conv')(x)
        return nn.avg_pool(x, (2,) * nd, strides=(2,) * nd)


class DenseNetEncoder(nn.Module):
    in_channels: int = 3
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    init_features: int = 64
    bn_size: int = 4

    @property
    def out_channels(self):
        c = self.init_features
        oc = []
        for i, n in enumerate(self.block_config):
            c += n * self.growth_rate
            oc.append(c)
            if i != len(self.block_config) - 1:
                c //= 2
        return oc

    @property
    def out_strides(self):
        return [4 * (2 ** i) for i in range(len(self.block_config))]

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        x = nn.Conv(self.init_features, (7,) * nd, strides=(2,) * nd, padding=3,
                    use_bias=False, name='conv0')(x)
        x = Norm('batchnorm2d', name='norm0')(x, train)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3,) * nd, strides=(2,) * nd, padding=((1, 1),) * nd)
        features = {}
        for i, n in enumerate(self.block_config):
            x = _DenseBlock(n, self.growth_rate, self.bn_size, name=f'denseblock{i + 1}')(x, train)
            features[str(i)] = x
            if i != len(self.block_config) - 1:
                x = _Transition(x.shape[-1] // 2, name=f'transition{i + 1}')(x, train)
        return features


def _densenet(growth, config, init_feat):
    def ctor(in_channels, out_channels=0, pretrained=False, **kwargs):
        kwargs.pop('nd', None)
        return DenseNetEncoder(in_channels=in_channels, growth_rate=growth,
                               block_config=config, init_features=init_feat)
    return ctor


# Reference generic spelling: arbitrary growth/config (parity: cd.models.DenseNet)
DenseNet = DenseNetEncoder

DenseNet121 = _densenet(32, (6, 12, 24, 16), 64)
DenseNet161 = _densenet(48, (6, 12, 36, 24), 96)
DenseNet169 = _densenet(32, (6, 12, 32, 32), 64)
DenseNet201 = _densenet(32, (6, 12, 48, 32), 64)
