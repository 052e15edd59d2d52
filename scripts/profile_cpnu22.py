"""Stage-by-stage CpnU22 throughput breakdown on the real chip.

Times: (1) core dense heads only, (2) + decode, (3) + NMS (full), at batch 4
and 8. Prints tiles/s for each so we can see where the time goes.
"""
import os
import time

import numpy as np


def bench(fn, args, readback, iters=12):
    out = fn(*args)
    readback(out)  # compile
    out = fn(*args)
    readback(out)  # warm
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

    tile = 1024
    iters = int(os.environ.get('PROF_ITERS', '12'))
    batches = tuple(int(b) for b in
                    os.environ.get('PROF_BATCHES', '2,4').split(','))
    for batch in batches:  # batch 8 OOMs on v5e 16G (see bench.py)
        model = models.CpnU22(in_channels=3, max_detections=2048, samples=32,
                              compute_dtype=jnp.bfloat16)
        # Small-shape init: identical params (spatial-size independent), and
        # eager full-shape init OOMs since the head fusion (see bench.py).
        model.init(jax.random.PRNGKey(0), (1, 256, 256, 3))
        v = model.variables
        x = jnp.asarray(np.random.RandomState(0).rand(batch, tile, tile, 3), jnp.float32)

        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

        core_fn = jax.jit(lambda v, x: model.core.apply(cast(v), x.astype(jnp.bfloat16), False))
        dec_fn = jax.jit(lambda v, x: model.forward_padded(v, x, nms=False))
        full_fn = jax.jit(lambda v, x: model.forward_padded(v, x, nms=True))

        rb_core = lambda o: jax.device_get(o['scores'][..., 0, 0])
        rb_out = lambda o: jax.device_get((o['boxes'], o['scores'], o['valid']))

        for name, fn, rb in (('core', core_fn, rb_core),
                             ('decode', dec_fn, rb_out),
                             ('full+nms', full_fn, rb_out)):
            dt = bench(fn, (v, x), rb, iters)
            print(f'batch={batch} {name:9s}: {batch * iters / dt:7.3f} tiles/s '
                  f'({dt / iters * 1e3:7.1f} ms/step)', flush=True)


if __name__ == '__main__':
    main()
