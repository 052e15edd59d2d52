"""Measure the chunked-NMS keep-set deviation vs exact greedy at scale.

The chunked pass (``ops/boxes.py:nms_chunked`` — score-contiguous chunks +
final cross-chunk sweep, mirroring the reference's ``NMS_BATCH_SIZE=50000``
strategy, ``celldetection/ops/cpn.py:189-227``) can drop a box whose in-chunk
suppressor later loses the final pass. This script quantifies that rate on
crowded random data at gigapixel-stitch scale; the measured number is
recorded in docs/DESIGN.md.

Usage: JAX_PLATFORMS=cpu python scripts/measure_nms_deviation.py [N]
"""
import json
import sys
import time

import numpy as np


def np_greedy(boxes, scores, thresh):
    """Exact greedy NMS, score-ordered, vectorized suppression per keep."""
    order = np.argsort(-scores, kind='stable')
    b = boxes[order]
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    area = (x2 - x1) * (y2 - y1)
    n = len(b)
    alive = np.ones(n, bool)
    for i in range(n):
        if not alive[i]:
            continue
        xx1 = np.maximum(x1[i], x1[i + 1:])
        yy1 = np.maximum(y1[i], y1[i + 1:])
        xx2 = np.minimum(x2[i], x2[i + 1:])
        yy2 = np.minimum(y2[i], y2[i + 1:])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        union = area[i] + area[i + 1:] - inter
        alive[i + 1:] &= ~(inter > thresh * union)
    keep = np.zeros(n, bool)
    keep[order] = alive
    return keep


def main():
    import jax.numpy as jnp
    from celldetection_tpu.ops.boxes import nms_chunked
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    rng = np.random.RandomState(1)
    span = 1500.0 * np.sqrt(n / 131072.0)  # keep density constant
    xy = rng.rand(n, 2).astype(np.float32) * span
    wh = (rng.rand(n, 2) * 20 + 4).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rng.rand(n).astype(np.float32)
    thresh = 0.3
    t0 = time.time()
    exact = np_greedy(boxes, scores, thresh)
    t_exact = time.time() - t0
    t0 = time.time()
    chunked = np.asarray(nms_chunked(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(np.ones(n, bool)),
        thresh, chunk=16384, tile=512, survivors_cap=n))
    t_chunked = time.time() - t0
    diff = int(np.logical_xor(exact, chunked).sum())
    print(json.dumps({
        'metric': 'chunked-NMS keep-set deviation vs exact greedy',
        'n_boxes': n, 'survivors_exact': int(exact.sum()),
        'survivors_chunked': int(chunked.sum()),
        'keep_set_diff': diff,
        'keep_set_diff_rate': round(diff / max(int(exact.sum()), 1), 6),
        'exact_seconds': round(t_exact, 1),
        'chunked_seconds': round(t_chunked, 1),
    }), flush=True)


if __name__ == '__main__':
    main()
