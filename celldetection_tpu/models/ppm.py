"""Pyramid Pooling Module (PSPNet-style).

Behavioral reference: ``celldetection/models/ppm.py`` — Ppm (:11),
``append_pyramid_pooling_`` (:61).
"""
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.commons import resize_bilinear
from .commons import ConvNormRelu

__all__ = ['Ppm']


class Ppm(nn.Module):
    """Pool at multiple scales, conv, upsample, concat with input."""
    out_channels: int = 64
    scales: Sequence[int] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x, train: bool = False):
        spatial = x.shape[1:-1]
        outs = [x]
        for i, s in enumerate(self.scales):
            # adaptive average pool to s^nd
            win = tuple(max(d // s, 1) for d in spatial)
            pooled = nn.avg_pool(x, win, strides=win)
            pooled = ConvNormRelu(self.out_channels, kernel_size=1, padding=0,
                                  name=f'scale{i}')(pooled, train)
            outs.append(resize_bilinear(pooled, spatial))
        return jnp.concatenate(outs, -1)
