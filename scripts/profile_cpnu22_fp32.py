"""Fp32 batch-1 CpnU22 breakdown: encoder / +decoder / +heads / +decode / +NMS.

The reference CLI default workload (fp32, batch 1, 1024^2 tiles —
``celldetection_scripts/cpn_inference.py:446-452``) is the one bench line
still near baseline; this locates the time. Run on the real chip.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, readback, iters=12):
    readback(fn(*args))  # compile
    readback(fn(*args))  # warm
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

    tile = int(os.environ.get('PROF_TILE', '1024'))
    batch = int(os.environ.get('PROF_BATCH', '1'))
    iters = int(os.environ.get('PROF_ITERS', '12'))

    model = models.CpnU22(in_channels=3, max_detections=2048, samples=32)
    model.init(jax.random.PRNGKey(0), (1, 256, 256, 3))
    v = model.variables
    x = jnp.asarray(np.random.RandomState(0).rand(batch, tile, tile, 3), jnp.float32)

    enc_fn = jax.jit(lambda v, x: model.core.backbone.apply(
        {k: s['backbone'] for k, s in v.items() if 'backbone' in s}, x, False))
    core_fn = jax.jit(lambda v, x: model.core.apply(v, x, False))
    dec_fn = jax.jit(lambda v, x: model.forward_padded(v, x, nms=False))
    full_fn = jax.jit(lambda v, x: model.forward_padded(v, x, nms=True))

    def rb_enc(o):
        leaves = jax.tree_util.tree_leaves(o)
        jax.device_get(leaves[0].ravel()[0])

    rb_core = lambda o: jax.device_get(o['scores'][..., 0, 0])
    rb_out = lambda o: jax.device_get((o['boxes'], o['scores'], o['valid']))

    for name, fn, rb in (('encoder+unet', enc_fn, rb_enc),
                         ('core(+heads)', core_fn, rb_core),
                         ('+decode', dec_fn, rb_out),
                         ('full(+nms)', full_fn, rb_out)):
        dt = bench(fn, (v, x), rb, iters)
        print(f'batch={batch} fp32 {name:13s}: {batch * iters / dt:7.3f} tiles/s '
              f'({dt / iters * 1e3:7.1f} ms/step)', flush=True)


if __name__ == '__main__':
    main()
