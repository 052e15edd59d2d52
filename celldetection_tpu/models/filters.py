"""Classical filter layers: fixed/trainable depthwise convolution kernels.

Behavioral reference: ``celldetection/models/filters.py`` — Filter2d (:15),
PascalFilter (:86), ScharrFilter (:140), SobelFilter (:190), GaussianFilter
(:239), BoxFilter (:279), LaplaceFilter (:317), UpFilter2d (:371),
EdgeFilter2d (:396).
"""
import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ['Filter2d', 'PascalFilter2d', 'ScharrFilter2d', 'SobelFilter2d', 'GaussianFilter2d',
           'BoxFilter2d', 'LaplaceFilter2d', 'EdgeFilter2d', 'UpFilter2d',
           'pascal_kernel', 'gaussian_kernel']


class UpFilter2d(nn.Module):
    """Image-pyramid upsampling: zero-injection by ``scale_factor`` then the
    given filter module (parity: ``UpFilter2d``,
    ``celldetection/models/filters.py:371`` — typically paired with
    ``PascalFilter2d``)."""
    module: Any = None
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        s = self.scale_factor
        up = jnp.zeros((n, h, s, w, s, c), x.dtype)
        up = up.at[:, :, 0, :, 0, :].set(x).reshape(n, h * s, w * s, c)
        mod = self.module if self.module is not None else PascalFilter2d()
        return mod(up, train)


def pascal_kernel(n: int) -> np.ndarray:
    """n-th Pascal-triangle row outer product (binomial smoothing kernel)."""
    row = np.array([math.comb(n - 1, k) for k in range(n)], float)
    k = np.outer(row, row)
    return k / k.sum()


def gaussian_kernel(size: int, sigma: float = None) -> np.ndarray:
    sigma = sigma or (0.3 * ((size - 1) * 0.5 - 1) + 0.8)
    ax = np.arange(size) - (size - 1) / 2
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    k = np.outer(g, g)
    return k / k.sum()


class Filter2d(nn.Module):
    """Depthwise 2d filter from a fixed kernel; optionally trainable.

    Applies the same kernel to every input channel (NHWC).
    """
    kernel: Sequence = None
    trainable: bool = False
    padding: Optional[int] = None
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = jnp.asarray(np.asarray(self.kernel, np.float32))
        if self.trainable:
            k = self.param('kernel', lambda rng: k)
        c = x.shape[-1]
        kh, kw = k.shape[-2:]
        pad = kh // 2 if self.padding is None else self.padding
        if k.ndim == 2:
            kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))      # HWI'O for depthwise
        else:  # multiple kernels -> output channels = c * num_kernels
            num = k.shape[0]
            kern = jnp.tile(k.transpose(1, 2, 0)[:, :, None, :], (1, 1, 1, c))
            kern = kern.reshape(kh, kw, 1, c * num)
        out = jax.lax.conv_general_dilated(
            x, kern, window_strides=(self.stride,) * 2,
            padding=[(pad, pad)] * 2, feature_group_count=c,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return out


def PascalFilter2d(n: int = 5, **kwargs):
    return Filter2d(kernel=pascal_kernel(n), **kwargs)


def ScharrFilter2d(transpose: bool = False, **kwargs):
    k = np.array([[3., 0., -3.], [10., 0., -10.], [3., 0., -3.]])
    return Filter2d(kernel=(k.T if transpose else k), **kwargs)


def SobelFilter2d(transpose: bool = False, **kwargs):
    k = np.array([[1., 0., -1.], [2., 0., -2.], [1., 0., -1.]])
    return Filter2d(kernel=(k.T if transpose else k), **kwargs)


def GaussianFilter2d(size: int = 5, sigma: float = None, **kwargs):
    return Filter2d(kernel=gaussian_kernel(size, sigma), **kwargs)


def BoxFilter2d(size: int = 3, **kwargs):
    return Filter2d(kernel=np.full((size, size), 1. / size ** 2), **kwargs)


def LaplaceFilter2d(diagonal: bool = False, **kwargs):
    if diagonal:
        k = np.array([[1., 1., 1.], [1., -8., 1.], [1., 1., 1.]])
    else:
        k = np.array([[0., 1., 0.], [1., -4., 1.], [0., 1., 0.]])
    return Filter2d(kernel=k, **kwargs)


class EdgeFilter2d(nn.Module):
    """Gradient-magnitude filter (Scharr/Sobel pair)."""
    magnitude: bool = True
    method: str = 'scharr'

    @nn.compact
    def __call__(self, x, train: bool = False):
        fx = (ScharrFilter2d() if self.method == 'scharr' else SobelFilter2d())
        fy = (ScharrFilter2d(transpose=True) if self.method == 'scharr'
              else SobelFilter2d(transpose=True))
        gx = fx(x, train)
        gy = fy(x, train)
        if self.magnitude:
            return jnp.sqrt(gx ** 2 + gy ** 2 + 1e-12)
        return jnp.concatenate([gx, gy], -1)
