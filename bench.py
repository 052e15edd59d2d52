"""Throughput benchmark: 1024x1024 tiles/sec/chip through the full CPN forward.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload parity with the reference CLI defaults (tile 1024^2, batch 1 default,
decode + refinement + NMS included — ``celldetection_scripts/cpn_inference.py:451-452``).

Timing uses host readback of the results (``jax.device_get``) per batch —
``block_until_ready`` can return early through the axon PJRT relay — so the
measured time covers the full compute + result-transfer pipeline a production
tile loop pays.

``vs_baseline`` compares against an A100 estimate for the same model/workload
(the reference publishes no numbers — see BASELINE.md). Derivation of the
constants: the backbone dominates; CpnU22 @1024^2 is ~3.2 TFLOP/forward
(XLA cost analysis). A100 with cuDNN TF32 convs (torch default) sustains
~60-80 TFLOP/s on large convs => ~20 tiles/s; CpnResNeXt101UNet ~2.5x the
FLOPs => ~8 tiles/s. Estimates intentionally favor the baseline.
"""
import json
import os
import time

import numpy as np

A100_TILES_PER_S = {
    'CpnU22': 20.0,
    'CpnResNeXt101UNet': 8.0,
}


def main():
    model_name = os.environ.get('BENCH_MODEL', 'CpnU22')
    batch = int(os.environ.get('BENCH_BATCH', '4'))
    tile = int(os.environ.get('BENCH_TILE', '1024'))
    iters = int(os.environ.get('BENCH_ITERS', '10'))
    dtype_name = os.environ.get('BENCH_DTYPE', 'bfloat16')

    import jax
    import jax.numpy as jnp
    from celldetection_tpu import models

    dev = jax.devices()[0]
    ctor = models.get_cpn(model_name)
    compute_dtype = jnp.bfloat16 if dtype_name == 'bfloat16' else None
    model = ctor(in_channels=3, max_detections=2048, samples=32,
                 compute_dtype=compute_dtype)
    model.init(jax.random.PRNGKey(0), (batch, tile, tile, 3))

    fwd = jax.jit(lambda v, x: model.forward_padded(v, x, nms=True))
    x = jnp.asarray(np.random.RandomState(0).rand(batch, tile, tile, 3), jnp.float32)

    def run_once():
        out = fwd(model.variables, x)
        # Host readback of the actual results (what a tile pipeline consumes).
        jax.device_get((out['boxes'], out['scores'], out['valid']))

    run_once()  # compile
    run_once()  # warm

    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    dt = time.perf_counter() - t0

    tiles_per_s = batch * iters / dt
    baseline = A100_TILES_PER_S.get(model_name, float('nan'))
    print(json.dumps({
        'metric': f'{model_name} tiles(1024^2)/s/chip [{dtype_name}, batch {batch}, '
                  f'decode+refine+NMS, {dev.device_kind}]',
        'value': round(tiles_per_s, 3),
        'unit': 'tiles/s',
        'vs_baseline': round(tiles_per_s / baseline, 3) if baseline == baseline else None,
    }))


if __name__ == '__main__':
    main()
