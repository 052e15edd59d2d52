"""ConvNeXt (+ V2) encoders — flax.linen (NHWC).

Behavioral reference: ``celldetection/models/convnext.py`` — CNBlock (:73),
ConvNeXt (:117), Tiny/Small/Base/Large (:230-348); ``convnextv2.py`` — GRN
(:31), CNBlockV2 (:64), ConvNeXtV2 (:110), Atto..Huge (:169-470).

NHWC is the native layout here (the torch version permutes around LayerNorm
and the MLP; channels-last removes all permutes — a direct TPU win). Stem is
a 4x4/4 patchify conv; each later stage starts with LN + 2x2/2 downsample.
"""
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ['CNBlock', 'CNBlockV2', 'GRN', 'ConvNeXtEncoder', 'ConvNeXt', 'ConvNeXtV2',
           'ConvNeXtTiny', 'ConvNeXtSmall', 'ConvNeXtBase', 'ConvNeXtLarge',
           'ConvNeXtV2Atto', 'ConvNeXtV2Femto', 'ConvNeXtV2Pico', 'ConvNeXtV2Nano',
           'ConvNeXtV2Tiny', 'ConvNeXtV2Base', 'ConvNeXtV2Large', 'ConvNeXtV2Huge']


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXt V2, arXiv 2301.00808)."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param('gamma', nn.initializers.zeros, (c,))
        beta = self.param('beta', nn.initializers.zeros, (c,))
        spatial_axes = tuple(range(1, x.ndim - 1))
        gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=spatial_axes, keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + self.epsilon)
        return gamma * (x * nx) + beta + x


class CNBlock(nn.Module):
    """ConvNeXt block: dw7x7 → LN → MLP(4x) → layer-scale → stochastic depth."""
    layer_scale: Optional[float] = 1e-6
    stochastic_depth_prob: float = 0.
    kernel_size: int = 7
    v2: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        nd = x.ndim - 2
        ks = self.kernel_size
        out = nn.Conv(c, (ks,) * nd, padding=ks // 2, feature_group_count=c, name='dwconv')(x)
        out = nn.LayerNorm(epsilon=1e-6, name='norm')(out)
        out = nn.Dense(4 * c, name='mlp0')(out)
        out = jax.nn.gelu(out, approximate=False)
        if self.v2:
            out = GRN(name='grn')(out)
        out = nn.Dense(c, name='mlp1')(out)
        if self.layer_scale is not None:
            scale = self.param('layer_scale', nn.initializers.constant(self.layer_scale), (c,))
            out = out * scale
        if self.stochastic_depth_prob > 0 and train:
            keep = 1. - self.stochastic_depth_prob
            rng = self.make_rng('dropout')
            mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
            out = out * mask / keep
        return x + out


def CNBlockV2(**kwargs):
    kwargs.setdefault('layer_scale', None)
    return CNBlock(v2=True, **kwargs)


class ConvNeXtEncoder(nn.Module):
    """ConvNeXt multi-scale encoder.

    Attributes:
        depths: Blocks per stage.
        channels: Channels per stage.
        v2: GRN blocks, no layer scale (ConvNeXt V2).
        fused_initial: Stem fused into the first feature level (strides start
            at 4 either way; non-fused exposes the stem as its own level).
    """
    in_channels: int = 3
    depths: Sequence[int] = (3, 3, 9, 3)
    channels: Sequence[int] = (96, 192, 384, 768)
    stochastic_depth_prob: float = 0.
    layer_scale: float = 1e-6
    v2: bool = False
    fused_initial: bool = True

    @property
    def out_channels(self):
        oc = list(self.channels)
        if not self.fused_initial:
            oc = [self.channels[0]] + oc
        return oc

    @property
    def out_strides(self):
        s = [4 * (2 ** i) for i in range(len(self.channels))]
        if not self.fused_initial:
            s = [4] + s
        return s

    @nn.compact
    def __call__(self, x, train: bool = False):
        total = sum(self.depths)
        sid = 0
        nd = x.ndim - 2
        x = nn.Conv(self.channels[0], (4,) * nd, strides=(4,) * nd, name='stem_conv')(x)
        x = nn.LayerNorm(epsilon=1e-6, name='stem_norm')(x)
        features = {}
        idx = 0
        if not self.fused_initial:
            features[str(idx)] = x
            idx += 1
        for i, (depth, ch) in enumerate(zip(self.depths, self.channels)):
            if i > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f'down{i}_norm')(x)
                x = nn.Conv(ch, (2,) * nd, strides=(2,) * nd, name=f'down{i}_conv')(x)
            for j in range(depth):
                sd = self.stochastic_depth_prob * sid / max(total - 1., 1.)
                ls = None if self.v2 else self.layer_scale
                x = CNBlock(layer_scale=ls, stochastic_depth_prob=sd, v2=self.v2,
                            name=f'stage{i}_block{j}')(x, train)
                sid += 1
            features[str(idx)] = x
            idx += 1
        return features


def _convnext(depths, channels, v2=False):
    def ctor(in_channels, out_channels=0, fused_initial=True, pretrained=False, **kwargs):
        kwargs.pop('nd', None)
        return ConvNeXtEncoder(in_channels=in_channels, depths=depths, channels=channels,
                               v2=v2, fused_initial=fused_initial, **kwargs)
    return ctor


# Reference generic spellings: ConvNeXt(depths=..., channels=...) builds an
# arbitrary configuration (parity: cd.models.ConvNeXt / ConvNeXtV2).
ConvNeXt = ConvNeXtEncoder


def ConvNeXtV2(**kwargs):
    kwargs.setdefault('v2', True)
    return ConvNeXtEncoder(**kwargs)


ConvNeXtTiny = _convnext((3, 3, 9, 3), (96, 192, 384, 768))
ConvNeXtSmall = _convnext((3, 3, 27, 3), (96, 192, 384, 768))
ConvNeXtBase = _convnext((3, 3, 27, 3), (128, 256, 512, 1024))
ConvNeXtLarge = _convnext((3, 3, 27, 3), (192, 384, 768, 1536))

ConvNeXtV2Atto = _convnext((2, 2, 6, 2), (40, 80, 160, 320), v2=True)
ConvNeXtV2Femto = _convnext((2, 2, 6, 2), (48, 96, 192, 384), v2=True)
ConvNeXtV2Pico = _convnext((2, 2, 6, 2), (64, 128, 256, 512), v2=True)
ConvNeXtV2Nano = _convnext((2, 2, 8, 2), (80, 160, 320, 640), v2=True)
ConvNeXtV2Tiny = _convnext((3, 3, 9, 3), (96, 192, 384, 768), v2=True)
ConvNeXtV2Base = _convnext((3, 3, 27, 3), (128, 256, 512, 1024), v2=True)
ConvNeXtV2Large = _convnext((3, 3, 27, 3), (192, 384, 768, 1536), v2=True)
ConvNeXtV2Huge = _convnext((3, 3, 27, 3), (352, 704, 1408, 2816), v2=True)
