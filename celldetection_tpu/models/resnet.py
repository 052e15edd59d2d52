"""ResNet / ResNeXt / WideResNet encoders — flax.linen (NHWC).

Behavioral reference: ``celldetection/models/resnet.py`` — BasicBlock (:56),
Bottleneck (:88), ``_make_layer`` (:119), ``make_res_layer`` (:196), ResNet
(:265), VanillaResNet (:300), BottleResNet (:365), variants (:330-486),
``get_resnet`` (:503). Structure matches torchvision layouts (module names
conv1/bn1/layer{1..4}/.../downsample) so torch checkpoints remap directly
(see ``celldetection_tpu.util.torch_import``).

``fused_initial=True`` (UNet backbones): stage 0 = stem + layer1 at stride 4,
4 feature levels total. ``fused_initial=False`` (FPN backbones): the stem is
its own stride-2 level, 5 levels total.
"""
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .commons import GroupedConv, Norm

__all__ = [
    'BasicBlock', 'Bottleneck', 'ResNetEncoder', 'ResNet18', 'ResNet34', 'ResNet50',
    'ResNet101', 'ResNet152', 'ResNeXt50', 'ResNeXt101', 'ResNeXt152', 'WideResNet50',
    'WideResNet101', 'get_resnet',
    # reference/torchvision spellings (parity: celldetection/models/resnet.py)
    'ResNeXt50_32x4d', 'ResNeXt101_32x8d', 'ResNeXt152_32x8d',
    'WideResNet50_2', 'WideResNet101_2',
]


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity (torchvision BasicBlock semantics)."""
    planes: int
    stride: int = 1
    has_downsample: bool = False
    norm_layer: str = 'batchnorm2d'
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2  # spatial rank inferred from input (2D or 3D)
        ks = self.kernel_size
        identity = x
        out = nn.Conv(self.planes, (ks,) * nd, strides=(self.stride,) * nd,
                      padding=(ks - 1) // 2, use_bias=False, name='conv1')(x)
        out = Norm(self.norm_layer, name='bn1')(out, train)
        out = jax.nn.relu(out)
        out = nn.Conv(self.planes, (3,) * nd, padding=1, use_bias=False, name='conv2')(out)
        out = Norm(self.norm_layer, name='bn2')(out, train)
        if self.has_downsample:
            identity = nn.Conv(self.planes, (1,) * nd, strides=(self.stride,) * nd,
                               use_bias=False, name='downsample_conv')(x)
            identity = Norm(self.norm_layer, name='downsample_norm')(identity, train)
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 → 3x3(groups) → 1x1 bottleneck (torchvision Bottleneck, expansion 4)."""
    planes: int
    stride: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    norm_layer: str = 'batchnorm2d'
    kernel_size: int = 3
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        width = int(self.planes * (self.base_width / 64.)) * self.groups
        out_c = self.planes * self.expansion
        ks = self.kernel_size
        identity = x
        out = nn.Conv(width, (1,) * nd, use_bias=False, name='conv1')(x)
        out = Norm(self.norm_layer, name='bn1')(out, train)
        out = jax.nn.relu(out)
        if self.groups > 1:
            # TPU-aware grouped lowering (same param layout as nn.Conv; see
            # GroupedConv — native XLA grouped conv is up to 7x slower at
            # ResNeXt's small group widths)
            out = GroupedConv(width, (ks,) * nd, self.groups,
                              strides=(self.stride,) * nd, padding=(ks - 1) // 2,
                              name='conv2')(out)
        else:
            out = nn.Conv(width, (ks,) * nd, strides=(self.stride,) * nd,
                          padding=(ks - 1) // 2, use_bias=False, name='conv2')(out)
        out = Norm(self.norm_layer, name='bn2')(out, train)
        out = jax.nn.relu(out)
        out = nn.Conv(out_c, (1,) * nd, use_bias=False, name='conv3')(out)
        out = Norm(self.norm_layer, name='bn3')(out, train)
        if self.has_downsample:
            identity = nn.Conv(out_c, (1,) * nd, strides=(self.stride,) * nd,
                               use_bias=False, name='downsample_conv')(x)
            identity = Norm(self.norm_layer, name='downsample_norm')(identity, train)
        return jax.nn.relu(out + identity)


class _ResLayer(nn.Module):
    """Stack of residual blocks; first block may stride/downsample."""
    block: Any
    planes: int
    blocks: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    norm_layer: str = 'batchnorm2d'
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        expansion = 4 if self.block is Bottleneck else 1
        out_c = self.planes * expansion
        for i in range(self.blocks):
            stride = self.stride if i == 0 else 1
            has_ds = i == 0 and (stride != 1 or x.shape[-1] != out_c)
            kwargs = dict(planes=self.planes, stride=stride, has_downsample=has_ds,
                          norm_layer=self.norm_layer, kernel_size=self.kernel_size)
            if self.block is Bottleneck:
                kwargs.update(groups=self.groups, base_width=self.base_width)
            x = self.block(**kwargs, name=f'block{i}')(x, train)
        return x


class ResNetEncoder(nn.Module):
    """ResNet feature encoder returning a multi-scale feature dict.

    Attributes:
        layers: Blocks per stage, e.g. (3, 4, 6, 3).
        bottleneck: Bottleneck (True) or BasicBlock (False).
        fused_initial: Merge stem + stage1 into feature level '0'.
    """
    in_channels: int = 3
    layers: Sequence[int] = (2, 2, 2, 2)
    bottleneck: bool = False
    base_channel: int = 64
    groups: int = 1
    base_width: int = 64
    fused_initial: bool = True
    initial_strides: int = 2
    initial_pooling: bool = True
    norm_layer: str = 'batchnorm2d'
    # Optional per-stage token mixer (e.g. MambaLayer) — parity with the
    # reference's `secondary_block` (resnet.py:196); and PSP-style pyramid
    # pooling appended to the deepest stage (resnet.py:295-297).
    secondary_block: Any = None
    pyramid_pooling: bool = False
    pyramid_pooling_channels: int = 64

    @property
    def out_channels(self):
        e = 4 if self.bottleneck else 1
        oc = tuple(self.base_channel * (2 ** i) * e for i in range(4))
        if not self.fused_initial:
            oc = (self.base_channel,) + oc
        oc = list(oc)
        if self.pyramid_pooling:
            oc[-1] = oc[-1] + 4 * self.pyramid_pooling_channels
        return oc

    @property
    def out_strides(self):
        s = (4, 8, 16, 32)
        if not self.fused_initial:
            s = (2,) + s
        return list(s)

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2  # spatial rank inferred from input (2D or 3D)
        block = Bottleneck if self.bottleneck else BasicBlock
        x = nn.Conv(self.base_channel, (7,) * nd, strides=(self.initial_strides,) * nd,
                    padding=3, use_bias=False, name='conv1')(x)
        x = Norm(self.norm_layer, name='bn1')(x, train)
        x = jax.nn.relu(x)
        features = {}
        idx = 0
        if not self.fused_initial:
            features[str(idx)] = x
            idx += 1
        if self.initial_pooling:
            x = nn.max_pool(x, (3,) * nd, strides=(2,) * nd, padding=((1, 1),) * nd)
        for i, blocks in enumerate(self.layers):
            x = _ResLayer(block=block, planes=self.base_channel * (2 ** i), blocks=blocks,
                          stride=1 if i == 0 else 2, groups=self.groups,
                          base_width=self.base_width, norm_layer=self.norm_layer,
                          name=f'layer{i + 1}')(x, train)
            if self.secondary_block is not None:
                x = self.secondary_block(name=f'secondary{i + 1}')(x, train)
            features[str(idx)] = x
            idx += 1
        if self.pyramid_pooling:
            from .ppm import Ppm
            x = Ppm(out_channels=self.pyramid_pooling_channels, name='ppm')(x, train)
            features[str(idx - 1)] = x
        return features


def _resnet(layers, bottleneck, groups=1, base_width=64):
    def ctor(in_channels, out_channels=0, fused_initial=True, **kwargs):
        kwargs.pop('pretrained', None)
        return ResNetEncoder(in_channels=in_channels, layers=layers, bottleneck=bottleneck,
                             groups=groups, base_width=base_width,
                             fused_initial=fused_initial, **kwargs)
    return ctor


ResNet18 = _resnet((2, 2, 2, 2), False)
ResNet34 = _resnet((3, 4, 6, 3), False)
ResNet50 = _resnet((3, 4, 6, 3), True)
ResNet101 = _resnet((3, 4, 23, 3), True)
ResNet152 = _resnet((3, 8, 36, 3), True)
ResNeXt50 = _resnet((3, 4, 6, 3), True, groups=32, base_width=4)
ResNeXt101 = _resnet((3, 4, 23, 3), True, groups=32, base_width=8)
ResNeXt152 = _resnet((3, 8, 36, 3), True, groups=32, base_width=8)
WideResNet50 = _resnet((3, 4, 6, 3), True, base_width=128)
WideResNet101 = _resnet((3, 4, 23, 3), True, base_width=128)

# Reference/torchvision class spellings
ResNeXt50_32x4d = ResNeXt50
ResNeXt101_32x8d = ResNeXt101
ResNeXt152_32x8d = ResNeXt152
WideResNet50_2 = WideResNet50
WideResNet101_2 = WideResNet101

_RESNETS = {
    'ResNet18': ResNet18, 'ResNet34': ResNet34, 'ResNet50': ResNet50,
    'ResNet101': ResNet101, 'ResNet152': ResNet152, 'ResNeXt50': ResNeXt50,
    'ResNeXt101': ResNeXt101, 'ResNeXt152': ResNeXt152,
    'WideResNet50': WideResNet50, 'WideResNet101': WideResNet101,
    # reference/torchvision spellings
    'ResNeXt50_32x4d': ResNeXt50, 'ResNeXt101_32x8d': ResNeXt101,
    'ResNeXt152_32x8d': ResNeXt152,
    'WideResNet50_2': WideResNet50, 'WideResNet101_2': WideResNet101,
}


def get_resnet(name: str, in_channels: int = None, **kwargs):
    """Look up a ResNet by name (parity: ``get_resnet``,
    ``celldetection/models/resnet.py:503``). With ``in_channels`` (or any
    kwargs) the encoder is instantiated like the reference; otherwise the
    constructor is returned."""
    norm = name.lower().replace('_', '')
    for key, fn in _RESNETS.items():
        if key.lower().replace('_', '') == norm:
            if in_channels is not None:
                return fn(in_channels, **kwargs)
            if kwargs:
                raise ValueError('get_resnet kwargs require in_channels '
                                 '(instantiation, like the reference)')
            return fn
    raise KeyError(f'Unknown ResNet: {name}. Available: {sorted(_RESNETS)}')
