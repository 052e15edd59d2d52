"""On-device contour rasterization (outline drawing).

Behavioral reference: ``celldetection/ops/draw.py:4-43`` (``draw_contours_``,
a Bresenham-style batched line rasterizer on a tensor canvas).

TPU design: instead of a per-step masked scatter loop, each contour segment is
sampled at a fixed number of points (>= max segment length) and the resulting
integer coordinates are scattered once — a single static-shape scatter op.
"""
import jax.numpy as jnp

__all__ = ['draw_contours']


def draw_contours(canvas: jnp.ndarray, contours: jnp.ndarray, val=None,
                  valid: jnp.ndarray = None, close: bool = True, steps_per_segment: int = 16) -> jnp.ndarray:
    """Draw contour outlines onto a 2d canvas.

    Args:
        canvas: ``Array[h, w]``.
        contours: ``Array[num_contours, num_points, 2]`` (x, y) coordinates.
        val: Scalar or ``Array[num_contours]`` draw values. Default: contour
            index + 1 (label-image style).
        valid: Optional bool mask ``Array[num_contours]``.
        close: Whether to connect last and first point.
        steps_per_segment: Line sampling density; should be >= the maximum
            segment length in pixels for gap-free lines.

    Returns:
        Canvas with contours drawn (last write wins on overlap).
    """
    h, w = canvas.shape
    n, p, _ = contours.shape
    if val is None:
        val = jnp.arange(1, n + 1, dtype=canvas.dtype)
    val = jnp.broadcast_to(jnp.asarray(val, canvas.dtype), (n,))
    a = contours
    b = jnp.roll(contours, -1, axis=1) if close else jnp.concatenate(
        [contours[:, 1:], contours[:, -1:]], 1)
    t = jnp.linspace(0., 1., steps_per_segment)[None, None, :, None]
    pts = a[:, :, None, :] * (1 - t) + b[:, :, None, :] * t  # [n, p, steps, 2]
    xi = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, h - 1)
    vals = jnp.broadcast_to(val[:, None, None], xi.shape)
    if valid is not None:
        # route invalid contours to a scratch pixel outside the canvas... there is
        # none, so overwrite value with existing canvas content via mask on values
        keep = jnp.broadcast_to(valid[:, None, None], xi.shape)
        xi = jnp.where(keep, xi, 0)
        yi = jnp.where(keep, yi, 0)
        vals = jnp.where(keep, vals, canvas[0, 0])
    flat_idx = (yi * w + xi).reshape(-1)
    out = canvas.reshape(-1).at[flat_idx].set(vals.reshape(-1))
    return out.reshape(h, w)
