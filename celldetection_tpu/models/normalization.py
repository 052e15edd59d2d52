"""Normalization modules. Reference: ``celldetection/models/normalization.py:7-24``."""
from flax import linen as nn

from ..ops.normalization import pixel_norm

__all__ = ['PixelNorm']


class PixelNorm(nn.Module):
    """GAN-style pixel normalization over channels (NHWC)."""
    eps: float = 1e-8

    def __call__(self, x, train: bool = False):
        return pixel_norm(x, axis=-1, eps=self.eps)
