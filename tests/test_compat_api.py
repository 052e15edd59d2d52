"""Reference-compat API surface: names a celldetection user expects.

Covers the round-2 additions closing the export-diff vs the reference
(``cd.Dict``, ``cd.ops.nms``/``batched_box_nmsi``, property tables,
``UpFilter2d``, warmup factor, padding calc, R1 penalty, process filters,
torchvision model spellings).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dict_and_update():
    from celldetection_tpu.util import Dict, update_dict_, dict_hash, dict_to_json_string

    d = Dict(a=1)
    d.b = 2
    assert d['b'] == 2 and d.a == 1
    del d.a
    with pytest.raises(AttributeError):
        _ = d.a

    dst = {'x': 1}
    update_dict_(dst, {'x': 9, 'y': 2})
    assert dst == {'x': 1, 'y': 2}
    update_dict_(dst, {'x': 9}, override=True)
    assert dst['x'] == 9

    assert dict_hash({'a': 1, 'b': 2}) == dict_hash({'b': 2, 'a': 1})
    s = dict_to_json_string({'a': 1, 'fn': len})
    assert s == '{"a": 1}'


def test_has_argument_and_misc():
    from celldetection_tpu.util import has_argument
    from celldetection_tpu.util.misc import is_picklable, load_txt, print_to_file, num_params

    def f(a, b=1):
        return a + b

    assert has_argument(f, 'a') and not has_argument(f, 'z')
    assert has_argument(f, 'a', 'z', mode='any')
    assert not has_argument(f, 'a', 'z', mode='all')

    assert is_picklable({'a': 1}) and not is_picklable(lambda: 0)

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, 'x.txt')
        print_to_file('hello', 'world', filename=p)
        assert load_txt(p) == ['hello world']

    assert num_params({'params': {'w': np.zeros((3, 4))}}) == 12
    assert num_params({'params': {'w': np.zeros((3, 4))},
                       'batch_stats': {'m': np.zeros(5)}}, trainable=True) == 12


def test_calculate_padding_and_warmup():
    from celldetection_tpu.util import calculate_padding
    from celldetection_tpu.optim import get_warmup_factor

    assert calculate_padding(64, 3, 1, 1) == 1
    assert calculate_padding(64, 3, 1, 1, 'valid') == 0
    with pytest.raises(ValueError):
        calculate_padding(64, 3, 1, 1, 'bogus')

    assert get_warmup_factor(2000, steps=1000) == 1.
    assert get_warmup_factor(0, steps=10, factor=0.5) == 0.5
    assert abs(get_warmup_factor(5, steps=10, factor=0.) - 0.5) < 1e-9


def test_nms_compat():
    from celldetection_tpu.ops import nms, batched_box_nmsi

    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms(boxes, scores, 0.5)
    assert list(keep) == [0, 2]

    keeps = batched_box_nmsi([boxes, boxes], [scores, scores], 0.5)
    assert len(keeps) == 2
    assert list(keeps[0]) == [0, 2]


def test_labels2property_table():
    from celldetection_tpu.data import labels2property_table

    labels = np.zeros((16, 16), 'int32')
    labels[2:6, 2:6] = 1
    labels[10:14, 9:15] = 2
    df = labels2property_table(labels, 'label', 'area')
    assert list(df.columns) == ['label', 'area']
    assert sorted(df['label']) == [1, 2]
    assert sorted(df['area']) == [16, 24]


def test_upfilter2d():
    from celldetection_tpu.models import UpFilter2d, BoxFilter2d

    x = jnp.ones((1, 4, 4, 2))
    up = UpFilter2d(BoxFilter2d(size=3))
    v = up.init(jax.random.PRNGKey(0), x, False)
    out = up.apply(v, x, False)
    assert out.shape == (1, 8, 8, 2)
    # zero-injection: a 3x3 box mean sees at most 1/9*value per pixel quad
    assert float(out.max()) <= 4 / 9 + 1e-6


def test_r1_regularization():
    from celldetection_tpu.ops import r1_regularization

    w = jnp.asarray([[2.0], [0.0]])  # fn(x) = x @ w
    x = jnp.ones((3, 2))
    pen = r1_regularization(lambda p, x: x @ p, w, x, gamma=2.)
    # grad per item = w -> ||w||^2 = 4; gamma/2 * 4 = 4
    np.testing.assert_allclose(np.asarray(pen), [4., 4., 4.], rtol=1e-6)


def test_all_filter_single_process():
    from celldetection_tpu.parallel import all_filter

    assert all_filter(True) == ({0}, set())
    assert all_filter(False) == (set(), {0})


def test_torchvision_spellings():
    from celldetection_tpu import models

    enc = models.ResNeXt50_32x4d(in_channels=1)
    assert enc.groups == 32
    enc = models.WideResNet101_2(in_channels=1)
    assert enc.base_width == 128
    cnx = models.ConvNeXtV2(in_channels=1, depths=(2, 2), channels=(16, 32))
    assert cnx.v2
    dn = models.DenseNet(in_channels=1, growth_rate=8, block_config=(2, 2), init_features=8)
    assert dn.growth_rate == 8


def test_random_code_name_dir(tmp_path):
    from celldetection_tpu.util.misc import random_code_name_dir
    import os

    p = random_code_name_dir(str(tmp_path))
    assert os.path.isdir(p)
    p2 = random_code_name_dir(str(tmp_path))
    assert p != p2


def test_imagej_roi_load_roundtrip(tmp_path):
    from celldetection_tpu.util import save_rois, load_imagej_rois

    cons = [np.array([[5, 5], [20, 5], [20, 15], [5, 15]], float),
            np.array([[30, 30], [40, 30], [35, 45]], float)]
    fn = save_rois(str(tmp_path / 'rois.zip'), cons)
    boxes, back = load_imagej_rois(fn)
    assert len(back) == 2 and boxes.shape == (2, 4)
    for a, b in zip(cons, back):
        np.testing.assert_allclose(a, b)
    np.testing.assert_allclose(boxes[0], [5, 5, 20, 15])

    fn1 = save_rois(str(tmp_path / 'one.roi'), cons[:1])
    _, single = load_imagej_rois(fn1)
    np.testing.assert_allclose(single[0], cons[0])


def test_loss_dict_helpers_and_classes():
    from celldetection_tpu.ops import (add_to_loss_dict, reduce_loss_dict,
                                       SigmoidFocalLoss, sigmoid_focal_loss)

    d = {}
    add_to_loss_dict(d, 'a', jnp.asarray(float('nan')))
    add_to_loss_dict(d, 'a', jnp.asarray(2.), weight=0.5)
    add_to_loss_dict(d, '_skip', jnp.asarray(100.))
    add_to_loss_dict(d, 'b', None)
    assert float(d['a']) == 1.0 and 'b' not in d
    assert float(reduce_loss_dict(d, 2)) == 0.5

    logits = jnp.asarray([[0.3, -1.2]])
    targets = jnp.asarray([[1., 0.]])
    cls = SigmoidFocalLoss(gamma=1.5)
    np.testing.assert_allclose(np.asarray(cls(logits, targets)),
                               np.asarray(sigmoid_focal_loss(logits, targets, gamma=1.5)))


def test_split_and_regionprops2d():
    from celldetection_tpu.data import split, regionprops2d

    parts = split(10, .5, .3, .2, seed=0)
    assert [len(p) for p in parts] == [5, 3, 2]
    assert sorted(np.concatenate(parts).tolist()) == list(range(10))
    with pytest.raises(ValueError):
        split(10, .5, .4)

    labels = np.zeros((8, 8, 2), 'int32')
    labels[:3, :3, 0] = 1
    labels[4:, 4:, 1] = 2
    props = list(regionprops2d(labels))
    assert sorted(p.label for p in props) == [1, 2]


def test_misc_system_compat(tmp_path):
    from celldetection_tpu.util import (num_bytes, get_random_states, glob_h5_split,
                                        compare_file_hashes, save_requirements)
    from celldetection_tpu.util.misc import is_ipython, is_package_installed

    assert num_bytes(np.zeros((4, 4), np.float32)) == 64
    st = get_random_states()
    assert 'numpy' in st and 'random' in st

    (tmp_path / 'vol-r.h5').write_bytes(b'x')
    assert glob_h5_split(str(tmp_path / '*')) == [str(tmp_path / 'vol')]

    a, b = tmp_path / 'a.txt', tmp_path / 'b.txt'
    a.write_text('same'); b.write_text('same')
    assert compare_file_hashes(str(a), str(b))
    b.write_text('diff')
    assert not compare_file_hashes(str(a), str(b))

    req = save_requirements(str(tmp_path / 'req.txt'))
    assert 'jax==' in ''.join(open(req))

    assert not is_ipython()
    assert is_package_installed('jax') and not is_package_installed('definitely_not_a_pkg')


def test_visualization_compat(tmp_path):
    import matplotlib
    matplotlib.use('Agg')
    from celldetection_tpu.visualization import imshow_col, get_axes, plot_zstack, plot_gif

    f = imshow_col(np.zeros((8, 8)), np.ones((8, 8)), titles=['a', 'b'])
    assert len(get_axes(f)) == 2
    plot_zstack(np.random.rand(6, 8, 8))
    plot_zstack(np.random.rand(6, 8, 8), project='max')
    gif = tmp_path / 'x.gif'
    plot_gif(np.zeros((4, 4)), np.ones((4, 4)), fn=str(gif))
    assert gif.stat().st_size > 0


def test_toydata_shape_generators():
    from celldetection_tpu.data import toydata as td

    img = np.zeros((64, 64, 3), 'uint8') + 255
    rng = np.random.RandomState(0)
    for fn in (td.random_circle, td.random_ellipse, td.random_rectangle, td.random_triangle):
        mask = np.zeros((64, 64), 'uint8')
        img, mask = fn(img, mask, 32, 32, [100, 50, 20], radius_range=(5, 12), rng=rng)
        assert mask.sum() > 10, fn.__name__
        assert (img[mask > 0] != 255).any()


def test_property_table_multicolumn_and_scalar_spacing():
    from celldetection_tpu.data import labels2property_table

    labels = np.zeros((12, 12), 'int32')
    labels[2:6, 3:7] = 1
    df = labels2property_table(labels, 'label', 'bbox', separator='-')
    assert list(df.columns) == ['label', 'bbox-0', 'bbox-1', 'bbox-2', 'bbox-3']
    assert df['bbox-0'][0] == 2 and df['bbox-1'][0] == 3

    # scalar spacing is isotropic: area scales by s**2 in 2D
    df = labels2property_table(labels, 'area', spacing=0.5)
    assert abs(float(df['area'][0]) - 16 * 0.25) < 1e-9

    # iter_channels=False: the stack is one 3D label image (volumetric area)
    vol = np.zeros((4, 4, 2), 'int32')
    vol[1:3, 1:3, :] = 1
    df = labels2property_table(vol, 'area', iter_channels=False)
    assert int(df['area'][0]) == 8


def test_centroid_offset_in_pixel_space():
    from celldetection_tpu.data.misc import labels2properties

    labels = np.zeros((8, 8), 'int32')
    labels[0:2, 0:2] = 1  # centroid at (0.5, 0.5) px
    c = labels2properties(labels, 'centroid', offset=(100, 100), spacing=(0.5, 0.5))[0]
    # (coords + offset) * spacing = (100.5, 100.5) * 0.5
    np.testing.assert_allclose(c, (50.25, 50.25))
