"""Keep-set equality + in-model timing for the Pallas NMS at n=2048.

Equality: crowded random boxes at the CPN per-image capacity; the Pallas
keep mask must match the XLA formulation bit-for-bit. Timing: full CpnU22
fp32 batch-1 forward with the gate at 2048 (Pallas) vs 8192 (XLA scan);
standalone micro-benches are meaningless through the relay (~25 ms dispatch
floor), so the model IS the harness.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, readback, iters=12):
    readback(fn(*args))
    readback(fn(*args))
    t0 = time.perf_counter()
    pending = fn(*args)
    for _ in range(iters - 1):
        nxt = fn(*args)
        readback(pending)
        pending = nxt
    readback(pending)
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    from celldetection_tpu.ops import boxes as boxes_mod
    from celldetection_tpu.kernels.nms_pallas import nms_pallas_impl
    from celldetection_tpu import models

    # ---- keep-set equality at n=2048 (crowded) -----------------------------
    rng = np.random.RandomState(0)
    n = 2048
    centers = rng.rand(n, 2).astype(np.float32) * 256  # crowded: heavy overlap
    wh = (5 + rng.rand(n, 2) * 40).astype(np.float32)
    bx = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2], -1))
    sc = jnp.asarray(rng.rand(n).astype(np.float32))
    va = jnp.asarray(rng.rand(n) > 0.05)

    saved = boxes_mod._PALLAS_NMS_MIN
    for thr in (0.2, 0.5, 0.8):
        boxes_mod._PALLAS_NMS_MIN = 1 << 30  # force XLA
        ref = np.asarray(jax.jit(lambda b, s, v, t=thr: boxes_mod.nms_padded(b, s, v, t))(bx, sc, va))
        got = np.asarray(nms_pallas_impl(bx, sc, va, thr))
        assert (ref == got).all(), f'keep mismatch at thr={thr}: {int((ref != got).sum())} boxes'
        print(f'thr={thr}: keep sets identical ({int(ref.sum())} kept)', flush=True)
    boxes_mod._PALLAS_NMS_MIN = saved

    # ---- in-model timing ----------------------------------------------------
    model = models.CpnU22(in_channels=3, max_detections=2048, samples=32)
    model.init(jax.random.PRNGKey(0), (1, 256, 256, 3))
    v = model.variables
    x = jnp.asarray(np.random.RandomState(0).rand(1, 1024, 1024, 3), jnp.float32)
    rb = lambda o: jax.device_get((o['boxes'], o['scores'], o['valid']))

    for gate, label in ((1 << 30, 'XLA scan  '), (2048, 'Pallas VMEM')):
        boxes_mod._PALLAS_NMS_MIN = gate
        fn = jax.jit(lambda v, x: model.forward_padded(v, x, nms=True))
        dt = bench(fn, (v, x), rb)
        print(f'full fp32 b1, NMS={label}: {dt / 12 * 1e3:7.1f} ms/step '
              f'({12 / dt:6.2f} tiles/s)', flush=True)
    boxes_mod._PALLAS_NMS_MIN = saved


if __name__ == '__main__':
    main()
