"""Per-stage ResNeXt101 encoder timing on the real chip (flagship bottleneck).

profile_flagship.py measured the encoder at 2.75 TFLOP / ~205 ms (13 TF/s) —
the single largest inefficiency in the flagship forward. This times each
piece standalone (stem, stage1..4 as full Bottleneck stacks, bf16) to find
where the time goes and what the recomposition ceiling is.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from celldetection_tpu.models import resnet as resnet_lib

BATCH = int(os.environ.get("PROF_BATCH", "4"))
DTYPE = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[os.environ.get("PROF_DTYPE", "bfloat16")]


def timed(name, apply_fn, v, x, iters=10, flops=None):
    jax.device_get(jax.tree_util.tree_leaves(apply_fn(v, x))[0].sum())
    jax.device_get(jax.tree_util.tree_leaves(apply_fn(v, x))[0].sum())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = apply_fn(v, x)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / iters
    extra = f'  {flops / dt / 1e12:6.1f} TF/s' if flops else ''
    print(f'{name:28s} {dt * 1e3:8.2f} ms{extra}', flush=True)
    return dt


class StemModule(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        from celldetection_tpu.models.commons import Norm
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name='conv1')(x)
        x = Norm('batchnorm2d', name='bn1')(x, train)
        x = jax.nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class StageModule(nn.Module):
    planes: int
    blocks: int
    stride: int
    in_down: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.blocks):
            x = resnet_lib.Bottleneck(self.planes, stride=self.stride if i == 0 else 1,
                                      has_downsample=(i == 0),
                                      groups=32, base_width=8,
                                      name=f'b{i}')(x, train)
        return x


def flops_of(fn, v, x):
    try:
        c = fn.lower(v, x).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get('flops', 0))
    except Exception:
        return None


def main():
    rng = np.random.RandomState(0)
    print(f'device: {jax.devices()[0].device_kind}, batch {BATCH}, {DTYPE.__name__}')

    total = 0.0
    cases = [
        ('stem 1024^2 3->64/4', StemModule(), (BATCH, 1024, 1024, 3), 1),
        ('stage1 x3 256^2 w256', StageModule(64, 3, 1), (BATCH, 256, 256, 64), 1),
        ('stage2 x4 /2 w512', StageModule(128, 4, 2), (BATCH, 256, 256, 256), 1),
        ('stage3 x23 /2 w1024', StageModule(256, 23, 2), (BATCH, 128, 128, 512), 1),
        ('stage4 x3 /2 w2048', StageModule(512, 3, 2), (BATCH, 64, 64, 1024), 1),
    ]
    for name, mod, shape, _ in cases:
        x = jnp.asarray(rng.randn(*shape), DTYPE)
        v = mod.init(jax.random.PRNGKey(0), x)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(DTYPE) if jnp.issubdtype(a.dtype, jnp.floating) else a, v)
        fn = jax.jit(lambda vv, xx, m=mod: m.apply(vv, xx, False))
        fl = flops_of(fn, v, x)
        total += timed(name, fn, v, x, flops=fl)
    print(f'sum of stages: {total * 1e3:.1f} ms '
          f'(profile_flagship encoder measured ~205 ms fp32)')


if __name__ == '__main__':
    main()
