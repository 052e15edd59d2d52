"""CPN decode math — TPU-native (pure jnp, static shapes).

Implements the Contour Proposal Network transform chain: relative-to-absolute
location decoding, inverse-DFT contour sampling from elliptic Fourier
descriptors, multi-scale rescaling, refinement bucket weighting, order
weighting, and tile-border / stitching filters.

Behavioral reference: ``celldetection/ops/cpn.py`` (reference repo) —
``rel_location2abs_location`` (:15), ``fouriers2contours`` (:44),
``get_scale``/``scale_contours``/``scale_fourier`` (:98-165),
``order_weighting`` (:230), ``refinement_bucket_weight`` (:238),
``resolve_refinement_buckets`` (:247), ``remove_border_contours`` (:258),
``filter_contours_by_stitching_rule`` (:293).

Design notes (TPU):
    - No shape-keyed caches: XLA constant-folds index grids and basis matrices.
    - The inverse DFT is expressed as an einsum over the order axis so XLA can
      map it onto the MXU in one fused contraction per cos/sin branch.
    - All functions are fixed-shape; ragged selections are handled upstream via
      capacity padding + validity masks (see ``celldetection_tpu.models.cpn``).
"""
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    'rel_location2abs_location', 'fouriers2contours', 'fourier_basis', 'get_scale', 'scale_contours',
    'scale_fourier', 'order_weighting', 'refinement_bucket_weight', 'resolve_refinement_buckets',
    'remove_border_contours', 'filter_contours_by_stitching_rule', 'batched_box_nms',
]


def rel_location2abs_location(locations: jnp.ndarray,
                              channels_last: bool = None) -> jnp.ndarray:
    """Add the pixel-grid offset to relative locations.

    Args:
        locations: ``Array[..., 2, h, w]`` in xy format (channel-first, parity
            with reference) or ``Array[..., h, w, 2]`` (channel-last).
        channels_last: Layout; when None it is inferred from which axis has
            extent 2 — channels-last wins the ambiguous h==2 case (it is this
            package's native layout; pass the flag explicitly for 2-row
            channel-first maps).

    Returns:
        Absolute locations with the same layout.
    """
    if channels_last is None:
        channels_last = locations.shape[-1] == 2
    if channels_last:
        h, w = locations.shape[-3], locations.shape[-2]
        gx = jax.lax.broadcasted_iota(locations.dtype, (h, w), 1)
        gy = jax.lax.broadcasted_iota(locations.dtype, (h, w), 0)
        return locations + jnp.stack((gx, gy), -1)
    h, w = locations.shape[-2], locations.shape[-1]
    gx = jax.lax.broadcasted_iota(locations.dtype, (h, w), 1)
    gy = jax.lax.broadcasted_iota(locations.dtype, (h, w), 0)
    return locations + jnp.stack((gx, gy), 0)


def fourier_basis(order: int, samples: int = None, sampling: jnp.ndarray = None,
                  dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cos/sin sampling basis of the inverse elliptic-Fourier transform.

    Args:
        order: Number of Fourier orders.
        samples: Number of contour samples (used when ``sampling is None``).
        sampling: Optional explicit sampling ``Array[..., samples]`` in [0, 1].

    Returns:
        ``(c_cos, c_sin, sampling)`` where the basis arrays have shape
        ``(..., order, samples)``.
    """
    if sampling is None:
        sampling = jnp.linspace(0.0, 1.0, samples, dtype=dtype)
    k = jnp.arange(1, order + 1, dtype=sampling.dtype)
    c = (2.0 * math.pi) * k[..., :, None] * sampling[..., None, :]
    return jnp.cos(c), jnp.sin(c), sampling


def fouriers2contours(fourier: jnp.ndarray, locations: jnp.ndarray, samples: int = 64,
                      sampling: Optional[jnp.ndarray] = None):
    """Inverse-DFT sampling: Fourier descriptors → contour coordinates.

    ``con[..., s, :] = loc + sum_k [a,c]_k cos(2 pi k t_s) + [b,d]_k sin(2 pi k t_s)``

    Args:
        fourier: ``Array[..., order, 4]`` with coefficient layout (a, b, c, d);
            (a, b) are the x-coefficients (cos, sin), (c, d) the y-coefficients.
        locations: ``Array[..., 2]`` contour centroids (x, y).
        samples: Number of contour samples (ignored if ``sampling`` given).
        sampling: Optional sampling positions ``Array[..., samples]`` in [0, 1].
            May be broadcast against the leading dims of ``fourier``.

    Returns:
        ``(contours, sampling)`` — contours ``Array[..., samples, 2]``.
    """
    order = fourier.shape[-2]
    c_cos, c_sin, sampling = fourier_basis(order, samples, sampling, dtype=fourier.dtype)
    # Contract the order axis on the MXU: (..., order, 2) x (..., order, samples)
    cos_coef = fourier[..., (0, 2)]  # x/y cosine coefficients
    sin_coef = fourier[..., (1, 3)]  # x/y sine coefficients
    # precision=highest keeps fp32 accumulate on TPU (order is tiny; cost ~0)
    con = jnp.einsum('...oc,...os->...sc', cos_coef, c_cos, precision='highest')
    con = con + jnp.einsum('...oc,...os->...sc', sin_coef, c_sin, precision='highest')
    con = con + locations[..., None, :]
    return con, sampling


def get_scale(actual_size, original_size, flip: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    scale = jnp.asarray(original_size, dtype=dtype) / jnp.asarray(actual_size, dtype=dtype)
    if flip:
        scale = jnp.flip(scale, -1)
    return scale


def scale_contours(actual_size, original_size, contours: jnp.ndarray) -> jnp.ndarray:
    """Scale contours from ``actual_size`` (h, w) to ``original_size`` (h, w).

    The last contour dim is (x, y), hence the flipped scale.
    """
    return contours * get_scale(actual_size, original_size, dtype=contours.dtype)


def scale_fourier(actual_size, original_size, fourier: jnp.ndarray, location: jnp.ndarray):
    """Scale Fourier descriptors and locations between resolutions.

    x-coefficients (slots 0, 1) scale with width ratio, y-coefficients
    (slots 2, 3) with height ratio.
    """
    scale = get_scale(actual_size, original_size, dtype=fourier.dtype)
    coef_scale = jnp.concatenate((jnp.broadcast_to(scale[..., 0:1], scale.shape[:-1] + (2,)),
                                  jnp.broadcast_to(scale[..., 1:2], scale.shape[:-1] + (2,))), -1)
    return fourier * coef_scale, location * scale


def order_weighting(order: int, max_w: float = 5., min_w: float = 1., spread=None,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Quadratically decaying per-order loss weights, ``Array[order, 1]``."""
    x = jnp.arange(order, dtype=dtype)
    if spread is None:
        spread = order - 1
    y = min_w + (max_w - min_w) * (1. - jnp.clip(x / spread, 0., 1.)) ** 2
    return y[:, None]


def refinement_bucket_weight(index: jnp.ndarray, base_index: jnp.ndarray) -> jnp.ndarray:
    """Triangle (linear-interpolation) weight of a refinement bucket tap."""
    dist = jnp.abs(index + 0.5 - base_index)
    w = jnp.where(dist > 1., 0., 1. - dist)
    return jax.lax.stop_gradient(w)


def resolve_refinement_buckets(samplings: jnp.ndarray, num_buckets: int):
    """3-tap bucket indices + triangle weights for bucketed refinement."""
    base_index = samplings * num_buckets
    base_int = base_index.astype(jnp.int32)
    out = []
    for delta in (-1, 0, 1):
        idx = base_int + delta
        out.append((idx % num_buckets, refinement_bucket_weight(idx.astype(samplings.dtype), base_index)))
    return tuple(out)


def remove_border_contours(contours: jnp.ndarray, size, padding: float = 1,
                           top: bool = True, right: bool = True, bottom: bool = True, left: bool = True,
                           offsets: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Keep-mask for contours that do NOT touch selected border regions.

    Args:
        contours: ``Array[num_contours, num_points, 2]`` (x, y).
        size: Context size (h, w).
        padding: Border thickness in pixels.
        top/right/bottom/left: Which borders to test.
        offsets: Optional xy offsets added to contours before the test.

    Returns:
        Bool keep mask ``Array[num_contours]``.
    """
    h, w = size[0], size[1]
    if offsets is not None:
        contours = contours + offsets
    x, y = contours[..., 0], contours[..., 1]
    keep = jnp.ones(contours.shape[:-2], dtype=bool)
    if top:
        keep = keep & jnp.all(y > padding, -1)
    if right:
        keep = keep & jnp.all(x < (w - padding), -1)
    if bottom:
        keep = keep & jnp.all(y < (h - padding), -1)
    if left:
        keep = keep & jnp.all(x > padding, -1)
    return keep


def filter_contours_by_stitching_rule(contours: jnp.ndarray, tile_size, overlaps,
                                      rule: str = 'ex_br', offsets: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Greedy stitching-rule keep mask for tiled inference.

    ``'ex_br'`` drops contours reaching into the exclusive bottom/right overlap
    region ``tile_size - overlaps[:, 1]`` (in local tile coordinates).

    Args:
        contours: ``Array[num_contours, num_points, 2]``.
        tile_size: (height, width).
        overlaps: ``Array[2, 2]`` overlaps at (start, end) per spatial dim.
        rule: Comma-separable rule string; only ``'ex_br'`` is defined.
        offsets: Optional xy offsets.

    Returns:
        Bool keep mask ``Array[num_contours]``.
    """
    tile_size = jnp.asarray(tile_size)
    overlaps = jnp.asarray(overlaps)
    if offsets is not None:
        contours = contours + offsets
    rules = rule.split(',')
    if 'ex_br' in rules:
        stop = (tile_size - overlaps[:, 1])[::-1]  # to (x, y)
        right_bottom = jnp.all(jnp.any(contours >= stop, -1), -1)
        keep = ~right_bottom
    else:
        raise ValueError(f'Unknown stitching rule: {rule}')
    return keep


def batched_box_nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                    iou_threshold: float, tile: int = 128) -> jnp.ndarray:
    """Batched exact-greedy NMS over capacity-padded boxes.

    Thin wrapper over :func:`celldetection_tpu.ops.boxes.nms_padded` vmapped
    over the batch dim. See that function for semantics.
    """
    from .boxes import nms_padded
    return jax.vmap(lambda b, s, v: nms_padded(b, s, v, iou_threshold, tile=tile))(boxes, scores, valid)
