"""Dissect the pathological stage1 Bottleneck (2.8 TF/s, 26 ms/block).

Times each piece of the ResNeXt stage1 block at its real shape
(batch 4, 256^2, width 256, bf16) to find the slow op, plus variants
(no-norm, no-groups, channels-last vs other layouts).
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
from celldetection_tpu.models.commons import Norm

BATCH, HW, CIN, WIDTH = int(os.environ.get("PROF_BATCH", "4")), 256, 64, 256
DTYPE = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[os.environ.get("PROF_DTYPE", "bfloat16")]


def timed(name, apply_fn, v, x, iters=20):
    jax.device_get(jax.tree_util.tree_leaves(apply_fn(v, x))[0].sum())
    jax.device_get(jax.tree_util.tree_leaves(apply_fn(v, x))[0].sum())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = apply_fn(v, x)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:34s} {dt * 1e3:8.3f} ms', flush=True)
    return dt


class OneConv(nn.Module):
    out_c: int
    k: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Conv(self.out_c, (self.k, self.k), padding=self.k // 2,
                       feature_group_count=self.groups, use_bias=False)(x)


class ConvBN(nn.Module):
    out_c: int
    k: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.out_c, (self.k, self.k), padding=self.k // 2,
                    feature_group_count=self.groups, use_bias=False)(x)
        x = Norm('batchnorm2d', name='bn')(x, train)
        return jax.nn.relu(x)


class BNOnly(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return Norm('batchnorm2d', name='bn')(x, train)


def run(name, mod, shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), DTYPE)
    v = mod.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(
        lambda a: a.astype(DTYPE) if jnp.issubdtype(a.dtype, jnp.floating) else a, v)
    fn = jax.jit(lambda vv, xx, m=mod: m.apply(vv, xx, False))
    return timed(name, fn, v, x)


def main():
    print(f'device: {jax.devices()[0].device_kind}  shapes: {BATCH}x{HW}^2')
    s = (BATCH, HW, HW, WIDTH)
    run('full Bottleneck (w256,g32)', resnet_lib.Bottleneck(64, has_downsample=True,
                                                            groups=32, base_width=8),
        (BATCH, HW, HW, CIN))
    run('full Bottleneck plain (g1,w64)', resnet_lib.Bottleneck(64, has_downsample=True),
        (BATCH, HW, HW, CIN))
    run('conv1x1 64->256', OneConv(WIDTH), (BATCH, HW, HW, CIN))
    run('conv1x1 256->256', OneConv(WIDTH), s)
    run('grouped3x3 256 g32', OneConv(WIDTH, 3, 32), s)
    run('dense3x3 256', OneConv(WIDTH, 3, 1), s)
    run('conv1x1+bn+relu 256->256', ConvBN(WIDTH), s)
    run('grouped3x3+bn+relu', ConvBN(WIDTH, 3, 32), s)
    run('bn only 256', BNOnly(), s)
    run('bn only 64', BNOnly(), (BATCH, HW, HW, CIN))


if __name__ == '__main__':
    main()
