"""Mamba (selective state-space) token mixer — TPU-native.

Behavioral reference: ``celldetection/models/mamba.py:14-55`` (``MambaLayer``:
LayerNorm + Mamba SSM over flattened spatial dims, used as a ResNet
``secondary_block``). The reference depends on the ``mamba_ssm`` CUDA
selective-scan kernel; here the selective scan is expressed with
``jax.lax.associative_scan`` — a log-depth parallel scan XLA maps natively
onto TPU (reference pattern: S5/official JAX SSM implementations).
"""
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ['selective_scan', 'Mamba', 'MambaLayer']


def selective_scan(u: jnp.ndarray, delta: jnp.ndarray, A: jnp.ndarray, B: jnp.ndarray,
                   C: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """Selective SSM scan: ``x_t = exp(Δ_t A) x_{t-1} + Δ_t B_t u_t; y = C_t x + D u``.

    Args:
        u: ``[B, L, D]`` input sequence.
        delta: ``[B, L, D]`` positive step sizes.
        A: ``[D, N]`` state matrix (diagonal, negative real).
        B, C: ``[B, L, N]`` input/output projections.
        D: ``[D]`` skip gain.

    Returns:
        ``[B, L, D]``.
    """
    dA = jnp.exp(delta[..., None] * A)                     # [B, L, D, N]
    dBu = delta[..., None] * B[..., None, :] * u[..., None]  # [B, L, D, N]

    def combine(a, b):
        # composition of affine recurrences (gain, offset)
        ga, oa = a
        gb, ob = b
        return ga * gb, gb * oa + ob

    _, x = jax.lax.associative_scan(combine, (dA, dBu), axis=1)
    y = jnp.einsum('bln,bldn->bld', C, x)
    return y + u * D


class Mamba(nn.Module):
    """Mamba block: gated selective-SSM token mixer over a 1d sequence."""
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, l, d = x.shape
        d_inner = self.expand * d
        xz = nn.Dense(2 * d_inner, use_bias=False, name='in_proj')(x)
        xs, z = jnp.split(xz, 2, -1)
        # depthwise causal conv over the sequence
        xs = jnp.pad(xs, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        xs = nn.Conv(d_inner, (self.d_conv,), padding='VALID',
                     feature_group_count=d_inner, name='conv1d')(xs)
        xs = jax.nn.silu(xs)
        # input-dependent SSM parameters
        x_dbl = nn.Dense(self.d_state * 2 + 1, use_bias=False, name='x_proj')(xs)
        delta, Bm, Cm = jnp.split(x_dbl, [1, 1 + self.d_state], -1)
        delta = jax.nn.softplus(nn.Dense(d_inner, name='dt_proj')(delta))
        A_log = self.param('A_log', lambda rng: jnp.log(jnp.broadcast_to(
            jnp.arange(1, self.d_state + 1, dtype=jnp.float32), (d_inner, self.d_state))))
        D = self.param('D', nn.initializers.ones, (d_inner,))
        y = selective_scan(xs, delta, -jnp.exp(A_log), Bm, Cm, D)
        y = y * jax.nn.silu(z)
        return nn.Dense(d, use_bias=False, name='out_proj')(y)


class MambaLayer(nn.Module):
    """LayerNorm + Mamba over flattened NHWC spatial dims (+ residual).

    Drop-in ``secondary_block`` for encoder stages (parity with the
    reference's usage in ResNet stages).
    """
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, spatial, c = x.shape[0], x.shape[1:-1], x.shape[-1]
        seq = x.reshape(n, -1, c)
        seq_n = nn.LayerNorm(name='norm')(seq)
        out = Mamba(self.d_state, self.d_conv, self.expand, name='mamba')(seq_n, train)
        return (seq + out).reshape(n, *spatial, c)
