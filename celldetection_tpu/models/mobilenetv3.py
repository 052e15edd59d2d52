"""MobileNetV3 encoders — flax.linen (NHWC).

Behavioral reference: ``celldetection/models/mobilenetv3.py:28-95``
(torchvision-adapted MobileNetV3 Large/Small as multi-scale encoders):
stem ConvBNActivation, inverted-residual stages, and the final 1x1
ConvBNActivation ("lastconv", 6x the last block's channels) on the deepest
level. BatchNorm uses torchvision's eps=1e-3 / torch momentum 0.01 (flax
momentum 0.99). ``width_mult`` scales channels via the divisible-by-8 rule;
``reduced_tail`` halves the last stage (torchvision ``reduce_divider``);
``dilated`` swaps the tail's striding for dilation 2 (the deepest feature
level then shares the previous level's stride).
"""
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .commons import Norm

__all__ = ['MobileNetV3Large', 'MobileNetV3Small']

# torchvision MobileNetV3 batchnorm configuration
_BN = partial(Norm, 'batchnorm2d', epsilon=1e-3, momentum=0.99)


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _SqueezeExcitation(nn.Module):
    squeeze_channels: int

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        scale = jnp.mean(x, tuple(range(1, 1 + nd)), keepdims=True)
        scale = nn.Conv(self.squeeze_channels, (1,) * nd, name='fc1')(scale)
        scale = jax.nn.relu(scale)
        scale = nn.Conv(x.shape[-1], (1,) * nd, name='fc2')(scale)
        return x * jax.nn.hard_sigmoid(scale)


class _InvertedResidual(nn.Module):
    kernel: int
    expanded: int
    out_c: int
    use_se: bool
    use_hs: bool
    stride: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = jax.nn.hard_swish if self.use_hs else jax.nn.relu
        in_c = x.shape[-1]
        nd = x.ndim - 2  # rank-generic (nd=2/3), like the reference's nd convs
        # torchvision: dilation replaces striding in the dilated tail
        stride = 1 if self.dilation > 1 else self.stride
        use_res = stride == 1 and in_c == self.out_c
        out = x
        if self.expanded != in_c:
            out = nn.Conv(self.expanded, (1,) * nd, use_bias=False, name='expand')(out)
            out = _BN(name='expand_bn')(out, train)
            out = act(out)
        out = nn.Conv(self.expanded, (self.kernel,) * nd, strides=(stride,) * nd,
                      padding=(self.kernel // 2) * self.dilation,
                      kernel_dilation=(self.dilation,) * nd,
                      feature_group_count=self.expanded,
                      use_bias=False, name='dw')(out)
        out = _BN(name='dw_bn')(out, train)
        out = act(out)
        if self.use_se:
            out = _SqueezeExcitation(_make_divisible(self.expanded // 4), name='se')(out)
        out = nn.Conv(self.out_c, (1,) * nd, use_bias=False, name='project')(out)
        out = _BN(name='project_bn')(out, train)
        return x + out if use_res else out


# (kernel, expanded, out, SE, HS, stride) — torchvision tables
_LARGE = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2), (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2), (5, 120, 40, True, False, 1), (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2), (3, 200, 80, False, True, 1), (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1), (3, 480, 112, True, True, 1), (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2), (5, 960, 160, True, True, 1), (5, 960, 160, True, True, 1),
]
_SMALL = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2), (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2), (5, 240, 40, True, True, 1), (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1), (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2), (5, 576, 96, True, True, 1), (5, 576, 96, True, True, 1),
]


def _scale_settings(settings, width_mult: float):
    if width_mult == 1.0:
        return [tuple(s) for s in settings]
    adj = lambda c: _make_divisible(c * width_mult)
    return [(k, adj(e), adj(o)) + tuple(rest) for (k, e, o, *rest) in settings]


def _tail_settings(settings, reduced_tail: bool, dilated: bool):
    """Apply torchvision's ``reduce_divider``/``dilation`` to the last stage
    (every entry from the final stride-2 block on — torchvision
    ``_mobilenet_v3_conf``): ``reduced_tail`` halves the tail's out channels
    (and the expanded width of the post-boundary blocks); ``dilated`` swaps
    the tail's striding for dilation 2."""
    if not (reduced_tail or dilated):
        return [tuple(s) + (1,) for s in settings]
    last_s2 = max(i for i, s in enumerate(settings) if s[5] == 2)
    out = []
    for i, (k, e, o, se, hs, s) in enumerate(settings):
        dil = 1
        if i >= last_s2:
            if reduced_tail:
                o = o // 2
                if i > last_s2:
                    e = e // 2
            if dilated:
                dil = 2
        out.append((k, e, o, se, hs, s, dil))
    return out


class _MobileNetV3(nn.Module):
    """MobileNetV3 encoder; features collected before each stride-2 block.

    The deepest level passes through the reference's final 1x1
    ConvBNActivation (6x channels, Hardswish).
    """
    settings: Tuple = tuple(_LARGE)
    in_channels: int = 3
    stem_channels: int = 16

    @property
    def lastconv_channels(self):
        return 6 * self.settings[-1][2]

    @property
    def out_channels(self):
        # stride-level output channels: last block at each level; the deepest
        # level reports the lastconv width (ref out_channels[-1] = 6*last)
        chans, cur = [], self.stem_channels
        for (k, e, o, se, hs, s, *d) in self.settings:
            if s == 2:
                chans.append(cur)
            cur = o
        chans.append(self.lastconv_channels)
        return chans

    @property
    def out_strides(self):
        # a dilated tail keeps the previous level's spatial stride
        strides, cur = [], 2
        for (k, e, o, se, hs, s, *d) in self.settings:
            if s == 2:
                strides.append(cur)
                cur *= 1 if (d and d[0] > 1) else 2
        strides.append(cur)
        return strides

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        x = nn.Conv(self.stem_channels, (3,) * nd, strides=(2,) * nd, padding=1,
                    use_bias=False, name='stem')(x)
        x = _BN(name='stem_bn')(x, train)
        x = jax.nn.hard_swish(x)
        features = {}
        idx = 0
        for i, (k, e, o, se, hs, s, *d) in enumerate(self.settings):
            if s == 2:
                features[str(idx)] = x
                idx += 1
            x = _InvertedResidual(k, e, o, se, hs, s, d[0] if d else 1,
                                  name=f'block{i}')(x, train)
        x = nn.Conv(self.lastconv_channels, (1,) * nd, use_bias=False, name='lastconv')(x)
        x = _BN(name='lastconv_bn')(x, train)
        x = jax.nn.hard_swish(x)
        features[str(idx)] = x
        return features


def _mobilenet(settings):
    def ctor(in_channels, out_channels=0, pretrained=False, width_mult: float = 1.0,
             reduced_tail: bool = False, dilated: bool = False, **kwargs):
        kwargs.pop('nd', None)
        conf = _tail_settings(settings, reduced_tail, dilated)
        conf = _scale_settings(conf, width_mult)
        stem = _make_divisible(16 * width_mult) if width_mult != 1.0 else 16
        return _MobileNetV3(settings=tuple(conf), in_channels=in_channels,
                            stem_channels=stem)
    return ctor


MobileNetV3Large = _mobilenet(_LARGE)
MobileNetV3Small = _mobilenet(_SMALL)
