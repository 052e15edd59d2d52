"""Pallas TPU kernel: exact-greedy NMS as a VMEM-resident blocked sweep.

The XLA formulation (``celldetection_tpu.ops.boxes.nms_padded``) carries the
keep mask through a ``fori_loop`` whose every step re-streams the full box
list from HBM for the ``[tile, N]`` suppression slab — O(N²·16/T) bytes of
HBM traffic plus per-step loop latency. This kernel keeps the score-sorted
boxes (planar ``[8, N]`` layout: coordinate rows are lane-major vectors) and
the keep mask entirely in VMEM and runs the same *exact greedy* sweep as two
nested blocked loops:

  1. per tile of ``tile`` boxes: an in-tile sequential suppression over the
     ``[tile, tile]`` IoU matrix (scratch-resident, dynamic row reads);
  2. per later column block of ``cblk`` boxes: a ``[tile, cblk]`` broadcast
     IoU computed from the planar rows, reduced over kept rows — pure VPU
     work with zero HBM re-reads.

Keep sets match ``nms_padded`` bit-for-bit: same visit order and the same
``inter > thresh * union`` suppression test (``ops/boxes.py``
``_suppression_matrix`` uses the identical multiply form, so the two backends
round identically even on knife-edge IoU values). ``torchvision.ops.nms``
computes ``inter / union > thresh``, which can differ on exact ties of the
divide's rounding — equal keep sets on tie-free inputs.

VMEM budget: ``[8, N]`` boxes + ``[1, N]`` mask + ``[tile, tile]`` scratch +
``[tile, cblk]`` working set ≈ 36·N bytes + 2.3 MB → N up to ~300k fits the
16 MB budget; larger N goes through ``nms_chunked`` (the reference chunks at
50k too, ``celldetection/ops/cpn.py:189-227``).

Measured on TPU v5e (fp32, crowded random boxes, vs the XLA ``nms_padded``):
see ``scripts/profile_nms.py``; wired as the production sweep for large N in
``ops/boxes.py`` when running on TPU.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ['nms_pallas', 'nms_pallas_impl', 'pallas_available']


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:
        return False


def _iou_block(x0r, y0r, x1r, y1r, ar, x0c, y0c, x1c, y1c, ac, thresh):
    """IoU > thresh of row boxes [T, 1] vs column boxes [1, C] → bool [T, C]."""
    iw = jnp.maximum(jnp.minimum(x1r, x1c) - jnp.maximum(x0r, x0c), 0.)
    ih = jnp.maximum(jnp.minimum(y1r, y1c) - jnp.maximum(y0r, y0c), 0.)
    inter = iw * ih
    union = ar + ac - inter
    return jnp.where(union > 0., inter, 0.) > thresh * union


def _nms_kernel(data_ref, keep_ref, iou_scr, *, iou_threshold, tile, cblk):
    """data_ref [8, Np] (rows: x0, y0, x1, y1, valid); keep_ref [1, Np]."""
    np_tot = data_ref.shape[1]
    num_tiles = np_tot // tile
    num_cblk = np_tot // cblk
    keep_ref[:] = data_ref[4:5, :]
    col_t = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    col_c = jax.lax.broadcasted_iota(jnp.int32, (1, cblk), 1)

    def tile_body(i, _):
        s = pl.multiple_of(i * tile, tile)
        x0 = data_ref[0:1, pl.ds(s, tile)]
        y0 = data_ref[1:2, pl.ds(s, tile)]
        x1 = data_ref[2:3, pl.ds(s, tile)]
        y1 = data_ref[3:4, pl.ds(s, tile)]
        area = (x1 - x0) * (y1 - y0)
        x0r, y0r, x1r, y1r = (v.reshape(tile, 1) for v in (x0, y0, x1, y1))
        ar = area.reshape(tile, 1)

        # ---- in-tile sequential greedy over the [T, T] IoU matrix ----------
        iou_scr[:] = _iou_block(x0r, y0r, x1r, y1r, ar,
                                x0, y0, x1, y1, area, iou_threshold)

        def inner(j, k):
            row = iou_scr[pl.ds(j, 1), :]                      # [1, T] bool
            # k[j] extracted by masked reduce (arbitrary lane-position reads
            # must be 128-aligned on TPU; a reduce avoids the constraint)
            kj = jnp.sum(jnp.where(col_t == j, k, 0.))
            sup = row & (col_t > j) & (kj > 0.)
            return jnp.where(sup, 0., k)

        k = keep_ref[0:1, pl.ds(s, tile)]
        k = jax.lax.fori_loop(0, tile, inner, k)
        keep_ref[0:1, pl.ds(s, tile)] = k
        kept = k.reshape(tile, 1) > 0.

        # ---- suppress all strictly-later boxes, one [T, C] block at a time -
        def col_body(cb, _):
            cs = pl.multiple_of(cb * cblk, cblk)
            x0c = data_ref[0:1, pl.ds(cs, cblk)]
            y0c = data_ref[1:2, pl.ds(cs, cblk)]
            x1c = data_ref[2:3, pl.ds(cs, cblk)]
            y1c = data_ref[3:4, pl.ds(cs, cblk)]
            ac = (x1c - x0c) * (y1c - y0c)
            over = _iou_block(x0r, y0r, x1r, y1r, ar,
                              x0c, y0c, x1c, y1c, ac, iou_threshold)
            sup = jnp.any(over & kept, axis=0, keepdims=True)   # [1, C]
            sup = sup & ((cs + col_c) >= s + tile)              # later boxes only
            kcol = keep_ref[0:1, pl.ds(cs, cblk)]
            keep_ref[0:1, pl.ds(cs, cblk)] = jnp.where(sup, 0., kcol)
            return 0

        first_cb = (i * tile) // cblk  # first block containing later boxes
        jax.lax.fori_loop(first_cb, num_cblk, col_body, 0)
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


def nms_pallas_impl(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                    iou_threshold: float, tile: int = 256, cblk: int = 2048,
                    interpret: bool = False) -> jnp.ndarray:
    """Exact-greedy NMS keep mask via the blocked Pallas sweep (unjitted).

    Same contract as :func:`celldetection_tpu.ops.boxes.nms_padded`: boxes in
    any order, scores define the greedy visit order, ``valid`` masks padding;
    returns a bool keep mask in the original order.
    """
    from jax.experimental.pallas import tpu as pltpu

    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), bool)
    if cblk % tile:
        raise ValueError(f'cblk ({cblk}) must be a multiple of tile ({tile}): '
                         f'padding to a multiple of cblk must also cover whole '
                         f'row tiles or tail boxes would skip the greedy sweep')
    blk = max(tile, cblk)
    n_pad = (-n) % blk
    order = jnp.argsort(jnp.where(valid, scores, -jnp.inf), descending=True)
    b = boxes[order]
    v = valid[order]
    if n_pad:
        b = jnp.concatenate([b, jnp.zeros((n_pad, 4), b.dtype)])
        v = jnp.concatenate([v, jnp.zeros((n_pad,), bool)])
    np_tot = n + n_pad
    data = jnp.zeros((8, np_tot), jnp.float32)
    data = data.at[0:4, :].set(b.astype(jnp.float32).T)
    data = data.at[4, :].set(v.astype(jnp.float32))

    keep_f = pl.pallas_call(
        partial(_nms_kernel, iou_threshold=float(iou_threshold), tile=tile, cblk=cblk),
        out_shape=jax.ShapeDtypeStruct((1, np_tot), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile, tile), jnp.bool_)],
        interpret=interpret,
    )(data)
    keep_sorted = keep_f[0, :n] > 0.
    out = jnp.zeros((n,), bool)
    out = out.at[order].max(keep_sorted)
    return out & valid


nms_pallas = jax.jit(nms_pallas_impl,
                     static_argnames=('iou_threshold', 'tile', 'cblk', 'interpret'))
