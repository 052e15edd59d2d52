"""Fused contour-head conv (round 5): numeric equivalence + wiring.

CPNCore fuses the score/location/fourier (+uncertainty) KxK head convs into
one conv with concatenated output channels when the heads share input and
geometry (``models/cpn.py``). These tests pin:
  - FusableReadOut == ReadOut given identical params (drop-in param layout),
  - fused group == per-head unfused application,
  - CPNCore eligibility wiring (fused when configs match, param tree stable).
"""
import jax
import jax.numpy as jnp
import numpy as np

from celldetection_tpu import models
from celldetection_tpu.models.commons import FusableReadOut, ReadOut, fused_head_conv


def test_fusable_readout_matches_readout():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 16), jnp.float32)
    kw = dict(kernel_size=7, channels_mid=None, activation='relu', dropout=0.1)
    a = ReadOut(8, **kw)
    b = FusableReadOut(8, **kw)
    va = a.init(jax.random.PRNGKey(3), x, False)
    vb = b.init(jax.random.PRNGKey(3), x, False)
    # identical param layout AND identical init draws (same paths, same rng)
    fa = jax.tree_util.tree_flatten_with_path(va)
    fb = jax.tree_util.tree_flatten_with_path(vb)
    assert [jax.tree_util.keystr(p) for p, _ in fa[0]] == \
           [jax.tree_util.keystr(p) for p, _ in fb[0]]
    for (_, la), (_, lb) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    ya = a.apply(va, x, False)
    yb = b.apply(vb, x, False)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-5)


def test_fused_group_matches_unfused():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 24, 24, 12), jnp.float32)
    heads = [FusableReadOut(c, kernel_size=5, dropout=0.0) for c in (2, 4, 6)]
    variables = [h.init(jax.random.PRNGKey(10 + i), x, False)
                 for i, h in enumerate(heads)]
    # unfused: each head end-to-end
    ref = [h.apply(v, x, False) for h, v in zip(heads, variables)]
    # fused: one conv over concatenated kernels, then per-head tails
    ws = [h.apply(v, x, False, mode='weights') for h, v in zip(heads, variables)]
    mid = fused_head_conv(x, [k for k, _ in ws], [b for _, b in ws], 1, 2)
    off = 0
    for h, v, (k, _), r in zip(heads, variables, ws, ref):
        c = k.shape[-1]
        out = h.apply(v, x, False, mode='tail', mid=mid[..., off:off + c])
        off += c
        np.testing.assert_allclose(np.asarray(out), np.asarray(r), atol=1e-5)


def test_cpn_forward_with_fused_heads():
    """End-to-end: a CPN with fusable heads runs, and its param tree keeps
    the ReadOut layout (conv0/norm/conv1 under each *_head)."""
    m = models.CpnU12(in_channels=1, order=3, samples=16, max_detections=32,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 1))
    p = m.variables['params']
    for name in ('score_head', 'location_head', 'fourier_head'):
        assert {'conv0', 'norm', 'conv1'} <= set(p[name].keys()), (name, p[name].keys())
    img = np.random.RandomState(0).rand(64, 64, 1).astype(np.float32)
    out = m(img[None], score_thresh=0.4)
    assert 'contours' in out and 'scores' in out
