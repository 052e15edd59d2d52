"""Where does the flagship (CpnResNeXt101UNet, bf16, batch 4, 1024^2) spend time?

Round-2 left the flagship at 8.63 tiles/s (82 TF/s effective of a ~100 TF/s
measured chip ceiling). The grouped-conv hypothesis is dead
(scripts/bench_grouped_conv.py: XLA grouped convs are <1% of the forward).
This breaks the forward into stages to locate the actual remaining headroom:

  backbone      encoder+UNet-decoder dense maps only
  core          backbone + 5 heads (dense outputs)
  core+decode   + contour decode, refinement sampling, boxes (no NMS)
  full          forward_padded with NMS (the benched pipeline)

Each timed with double-buffered dispatch + device_get readback of a scalar,
matching bench.py methodology.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from celldetection_tpu import models

BATCH = int(os.environ.get('PROF_BATCH', '4'))
TILE = int(os.environ.get('PROF_TILE', '1024'))
ITERS = int(os.environ.get('PROF_ITERS', '10'))
DTYPE = os.environ.get('PROF_DTYPE', 'bfloat16')


def _sync(out):
    # block_until_ready can return early through the axon PJRT relay
    # (see bench.py) — host readback is the only reliable fence.
    jax.device_get(jax.tree_util.tree_leaves(out)[0])


def timed(name, fn, *args):
    _sync(fn(*args))  # compile
    _sync(fn(*args))  # warm
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fn(*args)  # async dispatch; same-stream ordering
    _sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:14s} {dt * 1e3:9.2f} ms/batch  {BATCH / dt:7.2f} tiles/s', flush=True)
    return dt


def main():
    cache_dir = os.environ.get('BENCH_CACHE', os.path.expanduser('~/.cache/cdt_xla_cache'))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass
    compute_dtype = jnp.bfloat16 if DTYPE == 'bfloat16' else None
    print(f'config: batch={BATCH} tile={TILE} dtype={DTYPE}', flush=True)
    model = models.CpnResNeXt101UNet(in_channels=3, max_detections=2048, samples=32,
                                     compute_dtype=compute_dtype)
    model.init(jax.random.PRNGKey(0), (1, 256, 256, 3))  # small-shape init: identical params, avoids eager full-res OOM (see bench.py)
    v = model.variables
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, TILE, TILE, 3), jnp.float32)

    core = model.core

    @jax.jit
    def encoder_only(v, x):
        def run(mdl, xi, train):
            return mdl.backbone.body(xi, train)
        feats = core.apply(v, x, False, method=run)
        return jax.tree_util.tree_map(lambda t: t.sum(), feats)

    @jax.jit
    def backbone_only(v, x):
        def run(mdl, xi, train):
            return mdl.backbone(xi, train)
        feats = core.apply(v, x, False, method=run)
        return jax.tree_util.tree_map(lambda t: t.sum(), feats)

    @jax.jit
    def core_only(v, x):
        out = core.apply(v, x, False)
        return {k: t.sum() for k, t in out.items() if t is not None and hasattr(t, 'sum')}

    @jax.jit
    def full(v, x):
        return model.forward_padded(v, x, nms=True)

    @jax.jit
    def full_no_nms(v, x):
        return model.forward_padded(v, x, nms=False)

    def flops_of(fn, *args):
        try:
            c = fn.lower(*args).compile().cost_analysis()
            if isinstance(c, list):
                c = c[0]
            return float(c.get('flops', float('nan')))
        except Exception as e:
            print('cost_analysis failed:', type(e).__name__)
            return float('nan')

    probes = [('encoder', encoder_only), ('backbone', backbone_only),
              ('core(+heads)', core_only), ('full(no NMS)', full_no_nms),
              ('full(+NMS)', full)]
    times = {}
    for name, fn in probes:
        try:
            dt = timed(name, fn, v, x)
        except Exception as e:
            print(f'{name} probe failed: {type(e).__name__} {str(e)[:160]}')
            continue
        fl = flops_of(fn, v, x)
        times[name] = dt
        print(f'  {name}: {fl / 1e12:.2f} TFLOP -> {fl / dt / 1e12:.1f} TF/s',
              flush=True)
    if 'encoder' in times and 'backbone' in times:
        print(f'decoder      ~{(times["backbone"] - times["encoder"]) * 1e3:8.2f} ms')
    if 'backbone' in times:
        print(f'heads        ~{(times["core(+heads)"] - times["backbone"]) * 1e3:8.2f} ms')
    print(f'decode+refine ~{(times["full(no NMS)"] - times["core(+heads)"]) * 1e3:8.2f} ms')
    print(f'NMS           ~{(times["full(+NMS)"] - times["full(no NMS)"]) * 1e3:8.2f} ms')


if __name__ == '__main__':
    main()
