"""Microbenchmark cpn_decode sub-stages on the real chip with synthetic dense maps.

CpnU22 dense shapes at 1024^2 input, head stride via feature '1' (512^2):
scores [B,512,512,2], locations [B,512,512,2], fourier [B,512,512,order*4],
refinement [B,1024,1024,2].
"""
import time

import numpy as np


def timeit(fn, args, iters=30):
    import jax
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    r = jax.device_get(jax.tree_util.tree_leaves(out)[0])  # settle relay
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from celldetection_tpu.models.cpn import cpn_decode, local_refinement, _gather_hw

    B, H, W, h, w = 4, 1024, 1024, 512, 512
    order, samples, K = 5, 32, 2048
    rng = np.random.RandomState(0)
    dense = {
        'scores': jnp.asarray(rng.randn(B, h, w, 2), jnp.float32),
        'locations': jnp.asarray(rng.randn(B, h, w, 2), jnp.float32),
        'fourier': jnp.asarray(rng.randn(B, h, w, order * 4), jnp.float32),
        'refinement': jnp.asarray(rng.randn(B, H, W, 2), jnp.float32),
        'uncertainty': None,
    }

    full = jax.jit(lambda d: cpn_decode(d, (H, W), order=order, samples=samples,
                                        score_channels=2, score_thresh=0.9,
                                        max_detections=K, refinement_iterations=4,
                                        refinement_buckets=1))
    print('decode total     :', round(timeit(full, (dense,)), 2), 'ms', flush=True)

    topk = jax.jit(lambda s: jax.lax.top_k(s.reshape(B, h * w), K))
    print('top_k 512^2->2048:', round(timeit(topk, (dense['scores'][..., 0],)), 2), 'ms', flush=True)

    idx = jnp.asarray(rng.randint(0, h * w, (B, K)), jnp.int32)
    gath = jax.jit(lambda f, i: (_gather_hw(f.reshape(B, h, w, -1), i)))
    print('gather fourier   :', round(timeit(gath, (dense['fourier'], idx)), 2), 'ms', flush=True)

    cont = jnp.asarray(rng.rand(B, K, samples, 2) * 1000, jnp.float32)
    refine = jax.jit(lambda c, r: local_refinement(c, r, num_loops=4, num_buckets=1,
                                                   original_size=(H, W), sampling=None)[0])
    print('refine x4        :', round(timeit(refine, (cont, dense['refinement'])), 2), 'ms', flush=True)

    refine1 = jax.jit(lambda c, r: local_refinement(c, r, num_loops=1, num_buckets=1,
                                                    original_size=(H, W), sampling=None)[0])
    print('refine x1        :', round(timeit(refine1, (cont, dense['refinement'])), 2), 'ms', flush=True)

    from celldetection_tpu.ops.cpn import fouriers2contours
    four = jnp.asarray(rng.randn(B, K, order, 4), jnp.float32)
    locs = jnp.asarray(rng.rand(B, K, 2) * 500, jnp.float32)
    dec = jax.jit(lambda f, l: fouriers2contours(f, l, samples=samples)[0])
    print('fouriers2contours:', round(timeit(dec, (four, locs)), 2), 'ms', flush=True)


if __name__ == '__main__':
    main()
