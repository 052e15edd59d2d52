"""Box math and NMS — TPU-native (pure jnp, static shapes).

Behavioral reference: ``celldetection/ops/boxes.py`` (nms :24, box voting :53-83,
contours2boxes :86, pairwise IoU/GIoU :101-126) and the exact-greedy semantics
of ``torch.ops.torchvision.nms`` used by the reference's main path
(``celldetection/ops/cpn.py:189-227``).

Design notes (TPU):
    - ``nms_padded`` implements *exact greedy* NMS on capacity-padded inputs as
      a blocked sweep: sort by score, then per tile of ``tile`` boxes run a
      short sequential suppression (a ``fori_loop`` of vector ops) followed by
      one dense [tile, N] IoU suppression of all later boxes. This keeps the
      O(N^2) work in large matrix ops that XLA tiles onto the MXU/VPU while
      preserving the sequential-greedy keep set bit-for-bit.
    - All functions carry validity masks instead of ragged shapes.
"""
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    'contours2boxes', 'box_area', 'box_iou', 'pairwise_box_iou', 'pairwise_generalized_box_iou',
    'nms_padded', 'nms_chunked', 'nms_indices', 'filter_by_box_voting',
    'remove_small_boxes_mask', 'nms', 'batched_box_nmsi',
]


def nms(boxes, scores, iou_threshold: float):
    """torchvision-style NMS: keep indices sorted by descending score.

    Reference-compat convenience over :func:`nms_indices` (parity:
    ``cd.ops.nms``); returns a host numpy index array of the kept boxes.
    Production code should use :func:`nms_padded` (static shapes, stays
    on-device).
    """
    import numpy as np
    boxes = jnp.asarray(boxes)
    valid = jnp.ones(boxes.shape[0], bool)
    order, keep = nms_indices(boxes, jnp.asarray(scores), valid, iou_threshold)
    order, keep = np.asarray(order), np.asarray(keep)
    return order[keep]


def batched_box_nmsi(boxes, scores, iou_threshold: float, batch_size: int = None):
    """Chunked NMS over lists of box/score arrays → list of keep indices.

    Parity: ``cd.ops.batched_box_nmsi`` (``celldetection/ops/cpn.py:189``) —
    the per-50k-chunk sweep with a cross-chunk final pass. Here each list
    entry runs through :func:`nms_chunked` (on-device, exact within chunks +
    final pass) and the kept indices are returned on host.
    """
    import numpy as np
    assert len(boxes) == len(scores)
    out = []
    for b, s in zip(boxes, scores):
        b, s = jnp.asarray(b), jnp.asarray(s)
        v = jnp.ones(b.shape[0], bool)
        if batch_size:
            keep = nms_chunked(b, s, v, iou_threshold, chunk=int(batch_size))
        else:
            keep = nms_chunked(b, s, v, iou_threshold)
        idx = np.flatnonzero(np.asarray(keep))
        out.append(idx[np.argsort(-np.asarray(s)[idx], kind='stable')])
    return out


def contours2boxes(contours: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Contours → boxes in (x0, y0, x1, y1) format.

    Args:
        contours: ``Array[(...,) num_points, 2]``.
        axis: The ``num_points`` axis.
    """
    return jnp.concatenate((contours.min(axis), contours.max(axis)), axis + (axis < 0))


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Full IoU matrix ``Array[n, m]`` of two box sets."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.)


def _suppression_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """``IoU > thresh`` as ``inter > thresh * union``, ``Array[n, m]`` bool.

    The multiply form is used by both the XLA sweep and the Pallas kernel so
    the two backends round identically on knife-edge IoU values (and it saves
    a divide).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter, 0.) > thresh * union


def _pairwise_inter_union(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter, union


def pairwise_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 0.) -> jnp.ndarray:
    """Aligned (element-wise) IoU of two equal-length box sets, ``Array[n]``."""
    inter, union = _pairwise_inter_union(boxes1, boxes2)
    return jnp.abs(inter / (union + eps))


def pairwise_generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 0.) -> jnp.ndarray:
    """Aligned GIoU of two equal-length box sets, ``Array[n]``."""
    inter, union = _pairwise_inter_union(boxes1, boxes2)
    iou = inter / (union + eps)
    lti = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rbi = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    whi = jnp.clip(rbi - lti, 0)
    areai = whi[..., 0] * whi[..., 1]
    return iou - (areai - union) / (areai + eps)


def remove_small_boxes_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Bool mask of boxes with both sides >= ``min_size``."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


@partial(jax.jit, static_argnames=('iou_threshold', 'tile'))
def nms_padded(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
               iou_threshold: float, tile: int = 128) -> jnp.ndarray:
    """Exact-greedy NMS on capacity-padded boxes.

    Matches ``torchvision.ops.nms`` keep semantics: boxes are visited in
    descending score order; a box is kept iff it has IoU <= ``iou_threshold``
    with every *kept* higher-scoring box.

    Args:
        boxes: ``Array[N, 4]`` (x0, y0, x1, y1); padded entries arbitrary.
        scores: ``Array[N]``.
        valid: ``Array[N]`` bool; padded entries False.
        iou_threshold: Suppression threshold (strictly-greater comparison).
        tile: Block size of the suppression sweep.

    Returns:
        Bool keep mask ``Array[N]`` in the *original* box order (False for
        invalid entries).
    """
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), bool)
    if _use_pallas_sweep(n):
        # VMEM-resident Mosaic sweep: same keep set, 1.6-6.6x faster on
        # TPU v5e for N in [8k, 131k] (see kernels/nms_pallas.py).
        from ..kernels.nms_pallas import nms_pallas_impl
        return nms_pallas_impl(boxes, scores, valid, iou_threshold)
    n_pad = (-n) % tile
    order = jnp.argsort(jnp.where(valid, scores, -jnp.inf), descending=True)
    if n_pad:
        order_p = jnp.concatenate([order, jnp.zeros((n_pad,), order.dtype)])
    else:
        order_p = order
    np_tot = n + n_pad
    b = boxes[order_p]
    v = valid[order_p]
    if n_pad:
        v = v & (jnp.arange(np_tot) < n)

    keep = _nms_sweep(b, v, iou_threshold, tile)
    # Scatter back to original order.
    out = jnp.zeros((n,), bool)
    out = out.at[order_p[:np_tot]].max(keep)
    return out & valid


# Mosaic-sweep selection bounds: above MAX the planar box table exceeds the
# VMEM budget (~16 MB). MIN=2048 measured on v5e (scripts/measure_nms2048.py):
# at the CPN per-image capacity the single VMEM kernel is ~0.2 ms faster than
# the 16-step scan inside the CpnU22 forward (keep sets bit-identical at
# thresholds 0.2/0.5/0.8); the big wins remain at stitch scale (1.6-6.6x for
# 8k-131k). Override with CDT_PALLAS_NMS_MIN for experiments.
import os as _os

_PALLAS_NMS_MIN = int(_os.environ.get('CDT_PALLAS_NMS_MIN', '2048'))
_PALLAS_NMS_MAX = 262144


def _use_pallas_sweep(n: int) -> bool:
    if not (_PALLAS_NMS_MIN <= n <= _PALLAS_NMS_MAX):
        return False
    try:
        from ..kernels.nms_pallas import pallas_available
        return pallas_available()
    except Exception:
        return False


def _nms_sweep(b: jnp.ndarray, v: jnp.ndarray, iou_threshold: float, tile: int) -> jnp.ndarray:
    """Blocked greedy suppression sweep over score-descending boxes.

    Args:
        b: ``Array[M, 4]`` boxes sorted by descending score, ``M % tile == 0``.
        v: ``Array[M]`` bool validity.

    Returns:
        Keep mask ``Array[M]`` in the given (sorted) order.
    """
    m = b.shape[0]
    keep = v
    num_tiles = m // tile
    pos = jnp.arange(m)

    def tile_body(i, keep):
        start = i * tile
        rows = jax.lax.dynamic_slice_in_dim(b, start, tile, 0)          # [T, 4]
        k = jax.lax.dynamic_slice_in_dim(keep, start, tile, 0)           # [T]
        sup_rr = _suppression_matrix(rows, rows, iou_threshold)          # [T, T]
        tri = jnp.arange(tile)

        def inner(j, k):
            sup = sup_rr[j] & (tri > j) & k[j]
            return k & ~sup

        k = jax.lax.fori_loop(0, tile, inner, k)
        keep = jax.lax.dynamic_update_slice_in_dim(keep, k, start, 0)
        # Suppress all strictly-later boxes against this tile's kept rows.
        sup_rn = _suppression_matrix(rows, b, iou_threshold)             # [T, M]
        sup_any = jnp.any(sup_rn & k[:, None], 0)
        keep = keep & ~(sup_any & (pos >= start + tile))
        return keep

    return jax.lax.fori_loop(0, num_tiles, tile_body, keep)


@partial(jax.jit, static_argnames=('iou_threshold', 'chunk', 'tile', 'survivors_cap',
                                   'return_overflow'))
def nms_chunked(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                iou_threshold: float, chunk: int = 16384, tile: int = 256,
                survivors_cap: int = None, return_overflow: bool = False):
    """Hierarchical greedy NMS for very large N (cross-tile stitching scale).

    Mirrors the reference's large-N strategy (chunked NMS + one final pass
    over the survivors, ``celldetection/ops/cpn.py:189-227`` with
    ``NMS_BATCH_SIZE=50000``) in a TPU-native form:

      1. Sort all boxes globally by descending score.
      2. Split into score-contiguous chunks of ``chunk`` and run the exact
         blocked greedy sweep *in parallel over chunks* (``vmap``) — the
         O(N²) pair work drops to O(N·chunk).
      3. Compact the survivors (score-sorted) into a ``survivors_cap`` buffer
         and run one final exact sweep across chunk boundaries.

    Like the reference's chunked path, the result is exact greedy NMS within
    each chunk and across the surviving set, but a box suppressed inside its
    chunk cannot be "rescued" when its suppressor later loses the final pass
    — an accepted approximation at this scale. For ``N <= chunk`` the result
    equals :func:`nms_padded` exactly.

    Args:
        boxes / scores / valid: As in :func:`nms_padded`.
        chunk: Chunk length (multiple of ``tile``).
        tile: Block size of each suppression sweep.
        survivors_cap: Static capacity of the final cross-chunk pass. Boxes
            beyond the cap (lowest scores among survivors) are dropped
            conservatively. Default: ``4 * chunk``.
        return_overflow: Also return a bool scalar that is True when the
            per-chunk survivors exceeded ``survivors_cap`` — i.e. lower-scored
            survivors were dropped and recall is NOT complete. Callers that
            cannot tolerate silent truncation (the tiled-inference stitch)
            must check this and retry with a larger cap (the torch reference
            cannot lose boxes here — dynamic shapes,
            ``celldetection/ops/cpn.py:189-227``).

    Returns:
        Bool keep mask ``Array[N]`` in the original box order (plus the
        overflow scalar when ``return_overflow``).
    """
    n = boxes.shape[0]
    if n <= chunk:
        keep = nms_padded(boxes, scores, valid, iou_threshold, tile=tile)
        return (keep, jnp.asarray(False)) if return_overflow else keep
    if _use_pallas_sweep(n):
        # Exact greedy via the Mosaic sweep beats the chunked approximation
        # wherever the boxes fit in VMEM — no chunking needed up to ~262k.
        from ..kernels.nms_pallas import nms_pallas_impl
        keep = nms_pallas_impl(boxes, scores, valid, iou_threshold)
        return (keep, jnp.asarray(False)) if return_overflow else keep
    # Callers pass arbitrary chunk sizes (e.g. the reference's
    # NMS_BATCH_SIZE=50000 via batched_box_nmsi); round up to a tile multiple.
    chunk += (-chunk) % tile
    cap = survivors_cap or 4 * chunk
    cap = min(cap, n)
    cap += (-cap) % tile

    order = jnp.argsort(jnp.where(valid, scores, -jnp.inf), descending=True)
    n_pad = (-n) % chunk
    if n_pad:
        order_p = jnp.concatenate([order, jnp.zeros((n_pad,), order.dtype)])
    else:
        order_p = order
    np_tot = n + n_pad
    num_chunks = np_tot // chunk
    b = boxes[order_p]
    s = jnp.where(valid, scores, -jnp.inf)[order_p]
    v = valid[order_p]
    if n_pad:
        v = v & (jnp.arange(np_tot) < n)

    keep = jax.vmap(lambda bb, vv: _nms_sweep(bb, vv, iou_threshold, tile))(
        b.reshape(num_chunks, chunk, 4), v.reshape(num_chunks, chunk))
    keep = keep.reshape(-1)

    # Final pass across chunk boundaries over the compacted survivors.
    # If more than ``cap`` boxes survived their chunks, the lowest-scored
    # survivors fall off the buffer — flagged via ``return_overflow``.
    cap_overflow = keep.sum() > cap
    surv = jnp.argsort(jnp.where(keep, s, -jnp.inf), descending=True)[:cap]
    sb = b[surv]
    sv = keep[surv]
    if _use_pallas_sweep(cap):
        from ..kernels.nms_pallas import nms_pallas_impl
        skeep = nms_pallas_impl(sb, s[surv], sv, iou_threshold)
    else:
        skeep = _nms_sweep(sb, sv, iou_threshold, tile)

    out = jnp.zeros((n,), bool)
    out = out.at[order_p[surv]].max(skeep)
    out = out & valid
    return (out, cap_overflow) if return_overflow else out


def nms_indices(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                iou_threshold: float, tile: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS returning score-sorted keep indices (padded) + validity mask.

    Returns:
        ``(indices, keep_valid)`` — both ``Array[N]``; indices are positions in
        the input arrays sorted by descending score, entries with
        ``keep_valid == False`` are padding.
    """
    keep = nms_padded(boxes, scores, valid, iou_threshold, tile=tile)
    order = jnp.argsort(jnp.where(keep, scores, -jnp.inf), descending=True)
    keep_sorted = keep[order]
    return order, keep_sorted


def get_iou_voting(boxes: jnp.ndarray, thresh: float, valid: jnp.ndarray = None) -> jnp.ndarray:
    """Sum of IoUs > thresh against all (valid) boxes, including self."""
    iou = box_iou(boxes, boxes)
    iou = iou * (iou > thresh)
    if valid is not None:
        iou = iou * valid[None, :]
    return iou.sum(-1)


def filter_by_box_voting(boxes: jnp.ndarray, thresh: float, min_vote: float,
                         valid: jnp.ndarray = None, return_votes: bool = False):
    """Keep mask of boxes whose IoU-vote sum reaches ``min_vote``.

    A box votes for itself (vote 1.0) and every box overlapping it with
    IoU > ``thresh`` adds its IoU to the vote.
    """
    votes = get_iou_voting(boxes, thresh, valid)
    mask = votes >= min_vote
    if valid is not None:
        mask = mask & valid
    if return_votes:
        return mask, votes
    return mask
