"""CpnU22 fp32 batch-1 ablations: conv floor vs decode tail vs NMS cost.

- convs-floor: full core incl. heads, but every output reduced to a scalar
  (XLA computes all convs, materializes nothing big).
- nms2048: nms_padded alone on 2048 capacity-padded boxes.
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
    from celldetection_tpu import models
    from celldetection_tpu.ops.boxes import nms_padded

    tile = 1024
    iters = int(os.environ.get('PROF_ITERS', '12'))

    model = models.CpnU22(in_channels=3, max_detections=2048, samples=32)
    model.init(jax.random.PRNGKey(0), (1, 256, 256, 3))
    v = model.variables
    x = jnp.asarray(np.random.RandomState(0).rand(1, tile, tile, 3), jnp.float32)

    def convs_floor(v, x):
        out = model.core.apply(v, x, False)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l) for l in leaves if jnp.issubdtype(l.dtype, jnp.floating))

    floor_fn = jax.jit(convs_floor)
    rb = lambda o: jax.device_get(o)
    dt = bench(floor_fn, (v, x), rb, iters)
    print(f'convs-floor (all heads, scalar out): {dt / iters * 1e3:7.1f} ms/step', flush=True)

    # NMS alone at the capacity the model uses.
    rng = np.random.RandomState(0)
    centers = rng.rand(2048, 2) * 1024
    wh = 10 + rng.rand(2048, 2) * 30
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2], -1), jnp.float32)
    scores = jnp.asarray(rng.rand(2048), jnp.float32)
    valid = jnp.ones((2048,), bool)
    nms_fn = jax.jit(lambda b, s, va: nms_padded(b, s, va, 0.5))
    dt = bench(nms_fn, (boxes, scores, valid), lambda o: jax.device_get(o), iters)
    print(f'nms_padded n=2048:                   {dt / iters * 1e3:7.2f} ms/step', flush=True)


if __name__ == '__main__':
    main()
