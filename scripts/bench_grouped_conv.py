"""Microbench: grouped 3x3 conv strategies at ResNeXt101-32x8d flagship shapes.

VERDICT r2 item 6: the flagship bench (CpnResNeXt101UNet) is the binding
constraint; grouped convs (groups=32) were measured at ~25% waste vs plain
convs on TPU. This compares, per stage shape, on the real chip:

  xla_grouped   nn.Conv feature_group_count=32 (current production path)
  dense         same-shape conv with groups=1 (32x the FLOPs, MXU-friendly)
  shifted_bmm   grouped conv as 9 shift+batched-einsum 1x1 steps
                ('bhwgc,gcd->bhwgd' per tap, accumulated)
  im2col_bmm    one im2col then a single batched einsum over groups
                ('bhwgkc,gkcd->bhwgd' with k=9*cg contraction)

Shapes (batch 4, 1024^2 tiles, after the stem /4): the four ResNeXt101
stages with width = planes*(8/64)*32 -> cg = width/32 per group.
Ref grouped-conv sites: torchvision Bottleneck (celldetection/models/resnet.py:88-118).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

G = 32
# (H, W, width, stride) at batch 4, 1024 tiles: stages see /4,/8,/16,/32 maps.
STAGES = [
    (256, 256, 256, 1),
    (128, 128, 512, 1),
    (64, 64, 1024, 1),
    (32, 32, 2048, 1),
]
BATCH = 4
DTYPE = jnp.bfloat16


def conv_grouped(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), 'SAME', feature_group_count=G,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)


def conv_dense(x, w_dense):
    return jax.lax.conv_general_dilated(
        x, w_dense, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)


def shifted_bmm(x, w):
    # w: (3, 3, cg, width) -> per-tap (G, cg, cg_out)
    b, h, wd, c = x.shape
    cg = c // G
    xg = x.reshape(b, h, wd, G, cg)
    wg = w.reshape(3, 3, cg, G, cg)  # HWIO with O grouped: O = G*cg
    acc = jnp.zeros((b, h, wd, G, cg), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            shifted = jnp.roll(xg, (1 - dy, 1 - dx), axis=(1, 2))
            tap = jnp.einsum('bhwgc,cgd->bhwgd', shifted, wg[dy, dx],
                             preferred_element_type=jnp.float32)
            acc = acc + tap
    return acc.astype(x.dtype).reshape(b, h, wd, c)


def im2col_bmm(x, w):
    b, h, wd, c = x.shape
    cg = c // G
    pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [pads[:, dy:dy + h, dx:dx + wd] for dy in range(3) for dx in range(3)]
    col = jnp.stack(cols, axis=3).reshape(b, h, wd, 9, G, cg)
    wg = w.reshape(3 * 3, cg, G, cg)
    return jnp.einsum('bhwkgc,kcgd->bhwgd', col, wg,
                      preferred_element_type=jnp.float32
                      ).astype(x.dtype).reshape(b, h, wd, c)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    print(f'device: {jax.devices()[0].device_kind}, dtype={DTYPE.__name__}, batch={BATCH}')
    totals = {}
    for h, w, width, stride in STAGES:
        cg = width // G
        x = jnp.asarray(rng.randn(BATCH, h, w, width), DTYPE)
        wk = jnp.asarray(rng.randn(3, 3, cg, width) * 0.05, DTYPE)
        wk_dense = jnp.asarray(rng.randn(3, 3, width, width) * 0.05, DTYPE)
        flops = 2 * BATCH * h * w * 9 * cg * width  # true grouped FLOPs
        row = {}
        for name, fn, args in [
                ('xla_grouped', jax.jit(conv_grouped), (x, wk)),
                ('dense', jax.jit(conv_dense), (x, wk_dense)),
                ('shifted_bmm', jax.jit(shifted_bmm), (x, wk)),
                ('im2col_bmm', jax.jit(im2col_bmm), (x, wk)),
        ]:
            try:
                dt = timeit(fn, *args)
            except Exception as e:  # OOM on big col buffers etc.
                print(f'  {name}: FAILED {type(e).__name__}')
                continue
            row[name] = dt
            totals[name] = totals.get(name, 0.0) + dt
            print(f'  [{h}x{w} c={width} cg={cg}] {name:12s} {dt * 1e3:8.3f} ms '
                  f'({flops / dt / 1e12:6.1f} TF/s grouped-FLOPs)')
    print('totals (per 4 single convs):',
          {k: f'{v * 1e3:.2f} ms' for k, v in totals.items()})


if __name__ == '__main__':
    main()
