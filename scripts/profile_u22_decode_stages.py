"""Incremental in-model ablation of the CpnU22 fp32 batch-1 decode tail.

Each stage jits convs + a prefix of the decode and reduces outputs to
scalars, so stage-to-stage deltas are the true incremental device cost
(standalone micro-benches are useless through the relay: its dispatch floor
is ~25 ms).
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
    from celldetection_tpu.ops.commons import process_scores

    iters = int(os.environ.get('PROF_ITERS', '12'))
    model = models.CpnU22(in_channels=3, max_detections=2048, samples=32)
    model.init(jax.random.PRNGKey(0), (1, 256, 256, 3))
    v = model.variables
    x = jnp.asarray(np.random.RandomState(0).rand(1, 1024, 1024, 3), jnp.float32)

    def reduce_all(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                   if jnp.issubdtype(l.dtype, jnp.floating) or jnp.issubdtype(l.dtype, jnp.integer))

    def stage_scores_topk(v, x):
        dense = model.core.apply(v, x, False)
        scores, classes = process_scores(dense['scores'], model.score_channels,
                                         model.score_thresh, None, None)
        sel = scores[..., 0]
        b, h, w = sel.shape
        flat = jnp.where(classes > 0, sel, -jnp.inf).reshape(b, h * w)
        tv, ti = jax.lax.top_k(flat, 2048)
        return reduce_all(dense) + jnp.sum(tv) + jnp.sum(ti)

    def stage_full_decode(v, x):
        out = model.forward_padded(v, x, nms=False)
        return reduce_all(out)

    def stage_full(v, x):
        out = model.forward_padded(v, x, nms=True)
        return reduce_all(out)

    rb = lambda o: jax.device_get(o)
    for name, fn in (('convs+scores+topk', jax.jit(stage_scores_topk)),
                     ('full decode      ', jax.jit(stage_full_decode)),
                     ('full + nms       ', jax.jit(stage_full))):
        dt = bench(fn, (v, x), rb, iters)
        print(f'{name}: {dt / iters * 1e3:7.1f} ms/step', flush=True)


if __name__ == '__main__':
    main()
