"""NMS on the real chip: XLA blocked sweep vs Pallas VMEM-resident sweep."""
import time

import numpy as np


def timeit(fn, args, iters=20):
    import jax
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from celldetection_tpu.kernels.nms_pallas import nms_pallas
    from celldetection_tpu.ops.boxes import nms_chunked, nms_padded

    rng = np.random.RandomState(0)
    for n in (8192, 20_000, 65_536, 131_072):
        xy = rng.rand(n, 2).astype(np.float32) * (20 * np.sqrt(n))
        wh = rng.rand(n, 2).astype(np.float32) * 16 + 4
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        scores = jnp.asarray(rng.rand(n).astype(np.float32))
        valid = jnp.ones((n,), bool)

        xla = jax.jit(lambda b, s, v: nms_padded(b, s, v, 0.2, tile=256))
        pls = jax.jit(lambda b, s, v: nms_pallas(b, s, v, 0.2))
        t_x = timeit(xla, (boxes, scores, valid))
        t_p = timeit(pls, (boxes, scores, valid))
        k_x = int(np.asarray(xla(boxes, scores, valid)).sum())
        k_p = int(np.asarray(pls(boxes, scores, valid)).sum())
        line = (f'N={n:7d}  xla={t_x:8.2f} ms  pallas={t_p:8.2f} ms  '
                f'speedup={t_x / t_p:5.2f}x  keep xla={k_x} pallas={k_p} '
                f'{"MATCH" if k_x == k_p else "MISMATCH"}')
        print(line, flush=True)

        if n == 65_536:
            ch = jax.jit(lambda b, s, v: nms_chunked(b, s, v, 0.2, chunk=16384,
                                                     tile=256))
            print(f'  (nms_chunked ref: {timeit(ch, (boxes, scores, valid)):8.2f} ms, '
                  f'keep={int(np.asarray(ch(boxes, scores, valid)).sum())})', flush=True)


if __name__ == '__main__':
    main()
