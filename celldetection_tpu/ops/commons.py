"""Common tensor ops — TPU-native (pure jnp, static shapes).

Behavioral reference: ``celldetection/ops/commons.py`` — ``downsample_labels``
(:51), ``process_scores`` (:35), ``equal_size`` (:10), ``padded_stack2d``
(:81), ``split_spatially`` (:99), ``minibatch_std_layer`` (:123),
``strided_upsampling2d`` (:151), ``pad_to_size``/``pad_to_div`` (:188-230),
``spatial_mean`` (:233).

Layout note: this framework is channels-last (NHWC) internally; all functions
here expect NHWC unless stated otherwise.
"""
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    'equal_size', 'downsample_labels', 'process_scores', 'padded_stack2d', 'split_spatially',
    'minibatch_std_layer', 'strided_upsampling2d', 'interpolate_vector', 'pad_to_size', 'pad_to_div',
    'spatial_mean', 'resize_bilinear', 'resize_nearest', 'values2bins',
]


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """(Bi/tri)linear channels-last resize matching torch ``align_corners=False``.

    ``jax.image.resize(method='linear')`` uses half-integer pixel centers,
    which is exactly torch's ``align_corners=False``. Works for any spatial
    rank (size length = x.ndim - 2).
    """
    size = tuple(size)
    if x.shape[1:-1] == size:
        return x
    return jax.image.resize(x, (x.shape[0],) + size + (x.shape[-1],), method='linear')


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest NHWC resize (torch 'nearest' flavor: floor of scaled index).

    Integer upsampling factors lower to a broadcast+reshape (TPU-fast path);
    everything else falls back to a gather. Matches torch semantics
    (``src = floor(dst * in/out)``) in both paths.
    """
    size = tuple(size)
    spatial = x.shape[1:-1]
    if spatial == size:
        return x
    n, c = x.shape[0], x.shape[-1]
    if len(size) == 2:
        h, w = spatial
        th, tw = size
        if th % h == 0 and tw % w == 0:
            fy, fx = th // h, tw // w
            x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, fy, w, fx, c))
            return x.reshape(n, th, tw, c)
        ys = (jnp.arange(th) * (h / th)).astype(jnp.int32)
        xs = (jnp.arange(tw) * (w / tw)).astype(jnp.int32)
        return x[:, ys][:, :, xs]
    # general rank: torch-style floor indexing per axis
    out = x
    for axis, (src, dst) in enumerate(zip(spatial, size), start=1):
        if src == dst:
            continue
        idx = (jnp.arange(dst) * (src / dst)).astype(jnp.int32)
        out = jnp.take(out, idx, axis=axis)
    return out


def equal_size(x: jnp.ndarray, reference: jnp.ndarray, mode: str = 'bilinear') -> jnp.ndarray:
    """Resize NHWC ``x`` to the spatial size of ``reference`` if needed."""
    if x.shape[1:3] == reference.shape[1:3]:
        return x
    size = reference.shape[1:3]
    if mode == 'nearest':
        return resize_nearest(x, size)
    return resize_bilinear(x, size)


def downsample_labels(inputs: jnp.ndarray, size: List[int]) -> jnp.ndarray:
    """Downsample a label map via max-pooling (+ nearest interpolation).

    Args:
        inputs: ``Array[n, h, w]`` or ``Array[n, h, w, c]`` label tensor.
        size: Target (height, width).

    Returns:
        Downsampled labels (same rank as input, float dtype preserved as in
        reference which casts to float).
    """
    squeeze = inputs.ndim == 3
    if squeeze:
        inputs = inputs[..., None]
    h, w = inputs.shape[1:3]
    th, tw = size
    if (h, w) == (th, tw):
        return inputs[..., 0] if squeeze else inputs
    if not jnp.issubdtype(inputs.dtype, jnp.floating):
        inputs = inputs.astype(jnp.float32)
    kh, kw = h // th, w // tw
    r = jax.lax.reduce_window(inputs, -jnp.inf, jax.lax.max,
                              (1, kh, kw, 1), (1, kh, kw, 1), 'VALID')
    if r.shape[1:3] != (th, tw):
        r = resize_nearest(r, (th, tw))
    return r[..., 0] if squeeze else r


def _apply_score_bounds(scores, scores_lower_bound, scores_upper_bound):
    if scores_upper_bound is not None:
        scores = jnp.minimum(scores, equal_size(scores_upper_bound, scores))
    if scores_lower_bound is not None:
        scores = jnp.maximum(scores, equal_size(scores_lower_bound, scores))
    return scores


def process_scores(scores: jnp.ndarray, score_channels: int, score_thresh,
                   scores_lower_bound=None, scores_upper_bound=None):
    """Raw score logits → (probabilities, classes).

    Channel semantics (parity with ``celldetection/models/cpn.py:575-587``):
        1 channel  — sigmoid; classes = (p > thresh)
        2 channels — softmax foreground prob; classes = (p_fg > thresh)
        >2         — softmax; classes = argmax

    Args:
        scores: ``Array[n, h, w, score_channels]`` logits (NHWC).

    Returns:
        ``(scores, classes)`` — scores ``Array[n, h, w, c']`` probabilities
        (c'=1 for binary), classes ``Array[n, h, w]`` int32.
    """
    bounds = (scores_lower_bound, scores_upper_bound)
    if score_channels == 1:
        scores = _apply_score_bounds(jax.nn.sigmoid(scores), *bounds)
        classes = (scores[..., 0] > score_thresh).astype(jnp.int32)
    elif score_channels == 2:
        scores = _apply_score_bounds(jax.nn.softmax(scores, -1)[..., 1:2], *bounds)
        classes = (scores[..., 0] > score_thresh).astype(jnp.int32)
    elif score_channels > 2:
        scores = _apply_score_bounds(jax.nn.softmax(scores, -1), *bounds)
        classes = jnp.argmax(scores, -1).astype(jnp.int32)
    else:
        raise ValueError(f'Invalid score_channels: {score_channels}')
    return scores, classes


def values2bins(values: jnp.ndarray, limits, bins: int) -> jnp.ndarray:
    """Quantize values in ``limits`` into ``bins`` integer bins.

    Parity: ``celldetection/models/cpn.py:30-34``.
    """
    mi, ma = limits
    v = (values - mi) / (ma - mi)
    return ((v // (1.0 / bins)) % bins).astype(jnp.int32)


def padded_stack2d(*images, dim: int = 0) -> jnp.ndarray:
    """Stack 2d images, zero-padding spatial dims to the largest extent."""
    ts = tuple(max(i.shape[j] for i in images) for j in range(-2, 0))
    padded = []
    for i in images:
        pad = [(0, 0)] * (i.ndim - 2) + [(0, ts[0] - i.shape[-2]), (0, ts[1] - i.shape[-1])]
        padded.append(jnp.pad(i, pad))
    return jnp.stack(padded, dim)


def split_spatially(x: jnp.ndarray, size) -> jnp.ndarray:
    """Split NHWC spatial dims into patches, folding patches into batch.

    Args:
        x: ``Array[n, h, w, c]``.
        size: (patch_h, patch_w).

    Returns:
        ``Array[n * h//ph * w//pw, ph, pw, c]``.
    """
    n, h, w, c = x.shape
    ph, pw = size
    x = x.reshape(n, h // ph, ph, w // pw, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ph, pw, c)


def minibatch_std_layer(x: jnp.ndarray, channels: int = 1, group_channels: Optional[int] = None,
                        epsilon: float = 1e-8) -> jnp.ndarray:
    """Minibatch standard-deviation layer (NHWC). Ref: ProGAN (1710.10196)."""
    n, h, w, c = x.shape
    gc = min(group_channels or n, n)
    cc, g = c // channels, n // gc
    y = x.reshape(gc, g, h, w, channels, cc)
    y = jnp.sqrt(y.var(0) + epsilon).mean((1, 2, 4), keepdims=True)[..., 0]  # [g,1,1,channels]
    # element b = i0*g + i1 belongs to group i1 = b % g (the reshape above),
    # so broadcast stats back with the group axis LAST in the flattening
    y = jnp.broadcast_to(y[None], (gc, g, h, w, channels)).reshape(n, h, w, channels)
    return jnp.concatenate([x, y], -1)


def strided_upsampling2d(x: jnp.ndarray, factor: int = 2, const: float = 0) -> jnp.ndarray:
    """Upsample NHWC by inserting const-filled rows/cols."""
    n, h, w, c = x.shape
    x_ = jnp.full((n, h * factor, w * factor, c), const, dtype=x.dtype)
    return x_.at[:, ::factor, ::factor].set(x)


def interpolate_vector(v: jnp.ndarray, size: int, method: str = 'linear') -> jnp.ndarray:
    """Interpolate a 1d vector to ``size`` entries."""
    return jax.image.resize(v, (size,), method=method)


def pad_to_size(v: jnp.ndarray, size, return_pad: bool = False, **kwargs):
    """Pad the trailing dims of ``v`` at the end up to ``size``."""
    pad = [(0, 0)] * (v.ndim - len(size))
    any_pad = False
    for a, b in zip(size, v.shape[-len(size):]):
        p = max(0, a - b)
        any_pad |= p > 0
        pad.append((0, p))
    out = jnp.pad(v, pad, **kwargs) if any_pad else v
    if return_pad:
        return out, pad
    return out


def pad_to_div(v: jnp.ndarray, div: int = 32, nd: int = 2, return_pad: bool = False, **kwargs):
    """Pad trailing ``nd`` dims to be divisible by ``div``."""
    if not isinstance(div, (tuple, list)):
        div = (div,) * nd
    size = [(i // d + bool(i % d)) * d for i, d in zip(v.shape[-len(div):], div)]
    return pad_to_size(v, size, return_pad=return_pad, **kwargs)


def spatial_mean(x: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Mean over NHWC spatial dims (axes 1..ndim-2)."""
    spatial = tuple(range(1, x.ndim - 1))
    return jnp.mean(x, spatial, keepdims=keepdims)
