"""Pallas TPU kernel: exact-greedy NMS for large box counts.

The XLA formulation (``celldetection_tpu.ops.boxes.nms_padded``) materializes
a ``[tile, N]`` IoU block per sweep step from HBM-resident boxes; for the
cross-tile stitching pass of gigapixel mosaics N can reach 10^5–10^6, where
the repeated HBM traffic for the suppression matrix dominates. This kernel
keeps the score-sorted box list in VMEM block-by-block and runs the blocked
greedy sweep in-core: for each block, (a) an in-block sequential suppression
over at most ``BLOCK`` rows, then (b) one vectorized suppression of all later
blocks against the surviving rows — the same math as the XLA path (bit-equal
keep sets), with the [BLOCK, BLOCK] IoU tiles living entirely in VMEM.

Equivalent workload in the reference: ``torch.ops.torchvision.nms`` C++/CUDA
kernel, chunked at 50k boxes (``celldetection/ops/cpn.py:189-227``).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['nms_pallas', 'pallas_available']

BLOCK = 256  # rows per suppression block (multiple of 8 sublanes)


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:
        return False


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, iou_threshold):
    """Grid-free kernel: full sweep over N boxes in VMEM.

    boxes_ref: [N, 4] score-sorted boxes (f32, VMEM)
    valid_ref: [N, 1] validity (f32 0/1, VMEM)
    keep_ref:  [N, 1] output keep mask (f32 0/1, VMEM)
    """
    import jax.experimental.pallas as pl

    n = boxes_ref.shape[0]
    num_blocks = n // BLOCK
    keep_ref[:] = valid_ref[:]

    x0 = boxes_ref[:, 0:1]
    y0 = boxes_ref[:, 1:2]
    x1 = boxes_ref[:, 2:3]
    y1 = boxes_ref[:, 3:4]
    area = (x1 - x0) * (y1 - y0)          # [N, 1]

    def block_body(bi, _):
        start = bi * BLOCK
        bx0 = boxes_ref[pl.ds(start, BLOCK), 0:1]
        by0 = boxes_ref[pl.ds(start, BLOCK), 1:2]
        bx1 = boxes_ref[pl.ds(start, BLOCK), 2:3]
        by1 = boxes_ref[pl.ds(start, BLOCK), 3:4]
        barea = (bx1 - bx0) * (by1 - by0)

        # IoU of block rows vs ALL boxes: [BLOCK, N]
        lt_x = jnp.maximum(bx0, x0[:, 0][None, :])
        lt_y = jnp.maximum(by0, y0[:, 0][None, :])
        rb_x = jnp.minimum(bx1, x1[:, 0][None, :])
        rb_y = jnp.minimum(by1, y1[:, 0][None, :])
        inter = jnp.maximum(rb_x - lt_x, 0.) * jnp.maximum(rb_y - lt_y, 0.)
        union = barea + area[:, 0][None, :] - inter
        iou = jnp.where(union > 0., inter / union, 0.)          # [BLOCK, N]
        over = iou > iou_threshold                              # [BLOCK, N]

        # (a) in-block greedy: sequential over BLOCK rows
        col = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        blk_over = jax.lax.dynamic_slice(over, (0, start), (BLOCK, BLOCK))

        def row_body(j, k):
            # k: [1, BLOCK] keep among block rows
            kj = jax.lax.dynamic_slice(k, (0, j), (1, 1))[0, 0]
            sup = jax.lax.dynamic_slice(blk_over, (j, 0), (1, BLOCK)) & (col > j) & kj
            return k & ~sup

        k_blk = keep_ref[pl.ds(start, BLOCK), 0][None, :] > 0.
        k_blk = jax.lax.fori_loop(0, BLOCK, row_body, k_blk)
        keep_ref[pl.ds(start, BLOCK), 0] = k_blk[0].astype(jnp.float32)

        # (b) suppress all later boxes vs surviving rows
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        sup_any = jnp.any(over & k_blk[0][:, None], axis=0)[None, :]    # [1, N]
        later = pos >= (start + BLOCK)
        cur = keep_ref[:, 0][None, :] > 0.
        new = cur & ~(sup_any & later)
        keep_ref[:, 0] = new[0].astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_blocks, block_body, 0)


def nms_pallas_impl(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                    iou_threshold: float, interpret: bool = False) -> jnp.ndarray:
    """Exact-greedy NMS keep mask via the Pallas sweep kernel (unjitted).

    Same contract as :func:`celldetection_tpu.ops.boxes.nms_padded`.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = boxes.shape[0]
    n_pad = (-n) % BLOCK
    order = jnp.argsort(jnp.where(valid, scores, -jnp.inf), descending=True)
    b = boxes[order]
    v = valid[order]
    if n_pad:
        b = jnp.concatenate([b, jnp.zeros((n_pad, 4), b.dtype)])
        v = jnp.concatenate([v, jnp.zeros((n_pad,), bool)])
    np_tot = n + n_pad

    keep_f = pl.pallas_call(
        partial(_nms_kernel, iou_threshold=iou_threshold),
        out_shape=jax.ShapeDtypeStruct((np_tot, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(b.astype(jnp.float32), v.astype(jnp.float32)[:, None])
    keep_sorted = keep_f[:n, 0] > 0.
    out = jnp.zeros((n,), bool)
    out = out.at[order].max(keep_sorted)
    return out & valid


nms_pallas = jax.jit(nms_pallas_impl, static_argnames=('iou_threshold', 'interpret'))
