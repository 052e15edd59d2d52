"""On-device contour rasterization (outline drawing).

Behavioral reference: ``celldetection/ops/draw.py:4-43`` (``draw_contours_``,
a Bresenham-style batched line rasterizer on a tensor canvas).

TPU design: instead of a per-step masked scatter loop, each contour segment is
sampled at a fixed number of points (>= max segment length) and the resulting
integer coordinates are scattered once — a single static-shape scatter op.
"""
import jax.numpy as jnp

__all__ = ['draw_contours', 'draw_contours_']


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
    flat_idx = (yi * w + xi).reshape(-1)
    if valid is not None:
        # Route invalid contours' writes to a scratch slot appended past the
        # canvas (scatter order between duplicate indices is undefined, so
        # "rewrite the old value" masking could clobber valid writes).
        keep = jnp.broadcast_to(valid[:, None, None], xi.shape).reshape(-1)
        flat_idx = jnp.where(keep, flat_idx, h * w)
        out = jnp.concatenate([canvas.reshape(-1), jnp.zeros((1,), canvas.dtype)])
        out = out.at[flat_idx].set(vals.reshape(-1))
        return out[:h * w].reshape(h, w)
    out = canvas.reshape(-1).at[flat_idx].set(vals.reshape(-1))
    return out.reshape(h, w)


# Reference spelling (``draw_contours_``, celldetection/ops/draw.py:4). JAX
# arrays are immutable, so the "in-place" form returns the updated canvas.
draw_contours_ = draw_contours
