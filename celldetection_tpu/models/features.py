"""Multiscale basic features: intensity/edge/texture bank.

Behavioral reference: ``celldetection/models/features.py:10-69`` (skimage-style
multiscale feature module) and ``celldetection/ops/features.py:24-44``
(``texture_filter`` via Hessian eigenvalues).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .filters import GaussianFilter2d, SobelFilter2d

__all__ = ['texture_filter', 'MultiscaleBasicFeatures']


def texture_filter(gaussian_filtered: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of the Hessian per pixel (texture features), NHWC.

    Returns two channels per input channel (sorted eigenvalues).
    """
    g = gaussian_filtered
    gy, gx = jnp.gradient(g, axis=(1, 2))
    gyy, gyx = jnp.gradient(gy, axis=(1, 2))
    gxy, gxx = jnp.gradient(gx, axis=(1, 2))
    # symmetric 2x2 Hessian eigenvalues closed-form
    tr = gxx + gyy
    det = gxx * gyy - gxy * gyx
    disc = jnp.sqrt(jnp.clip(tr ** 2 / 4 - det, 0))
    e1 = tr / 2 + disc
    e2 = tr / 2 - disc
    return jnp.concatenate([e1, e2], -1)


class MultiscaleBasicFeatures(nn.Module):
    """Intensity + edges + texture over a bank of Gaussian scales."""
    sigmas: Sequence[float] = (0.5, 1.0, 2.0, 4.0)
    intensity: bool = True
    edges: bool = True
    texture: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, sigma in enumerate(self.sigmas):
            size = max(3, int(2 * round(3 * sigma) + 1))
            g = GaussianFilter2d(size=size, sigma=sigma)(x, train)
            if self.intensity:
                outs.append(g)
            if self.edges:
                gx = SobelFilter2d()(g, train)
                gy = SobelFilter2d(transpose=True)(g, train)
                outs.append(jnp.sqrt(gx ** 2 + gy ** 2 + 1e-12))
            if self.texture:
                outs.append(texture_filter(g))
        return jnp.concatenate(outs, -1)
