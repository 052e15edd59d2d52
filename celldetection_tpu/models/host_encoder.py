"""Host-executed encoders inside jit graphs (timm / smp adapters).

Wraps a host-side feature extractor (``TimmEncoder`` / ``SmpEncoder``) as a
flax module via ``jax.pure_callback``: the backbone runs on CPU (torch), the
decoder/heads run on TPU. Intended for experimentation with encoders that
have no native flax implementation; production paths should use the native
encoders.
"""
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ['HostEncoder']


class HostEncoder(nn.Module):
    """Adapter: host callable with ``out_channels``/``out_strides`` → flax module.

    The wrapped encoder is *not* trained (no parameters registered); gradients
    stop at the callback boundary.
    """
    encoder: Any

    @property
    def out_channels(self):
        return list(self.encoder.out_channels)

    @property
    def out_strides(self):
        return list(self.encoder.out_strides)

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, _ = x.shape
        shapes = tuple(
            jax.ShapeDtypeStruct((n, h // s, w // s, c), jnp.float32)
            for c, s in zip(self.encoder.out_channels, self.encoder.out_strides))

        def cb(x_np):
            feats = self.encoder(np.asarray(x_np))
            return tuple(np.asarray(feats[str(i)], np.float32)
                         for i in range(len(shapes)))

        outs = jax.pure_callback(cb, shapes, x)
        return {str(i): o for i, o in enumerate(outs)}
