"""Normalization ops. Reference: ``celldetection/ops/normalization.py:6-21``."""
import jax
import jax.numpy as jnp

__all__ = ['pixel_norm']


def pixel_norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """GAN-style pixel normalization over the channel axis (NHWC default)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)
