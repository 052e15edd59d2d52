"""Tests: mask-gated tiled inference (score bounds + tile skipping)."""
import jax
import numpy as np
import pytest

from celldetection_tpu import models, parallel


@pytest.fixture(scope='module')
def model():
    m = models.CpnU12(in_channels=1, max_detections=32, samples=8,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 1))
    return m


def test_mask_suppresses_outside(model):
    img = np.random.RandomState(0).rand(128, 128).astype(np.float32)
    tiled = parallel.TiledInference(model, tile_size=64, stride=48)
    out_full = tiled(img, score_thresh=0.3)
    # mask only the top-left quadrant
    mask = np.zeros((128, 128), np.float32)
    mask[:64, :64] = 1.
    out_masked = tiled(img, score_thresh=0.3, mask=mask)
    assert len(out_masked['boxes']) <= len(out_full['boxes'])
    if len(out_masked['contours']):
        # all detections inside masked region (with small tolerance)
        assert out_masked['contours'][..., 0].max() <= 70
        assert out_masked['contours'][..., 1].max() <= 70


def test_empty_mask_skips_all_tiles(model):
    img = np.random.RandomState(0).rand(128, 128).astype(np.float32)
    tiled = parallel.TiledInference(model, tile_size=64, stride=48)
    out = tiled(img, mask=np.zeros((128, 128), np.float32))
    assert out['num_tiles'] == 0 and len(out['boxes']) == 0


def test_point_mask_forces_detections(model):
    import jax.numpy as jnp
    img = np.random.RandomState(0).rand(1, 64, 64, 1).astype(np.float32)
    # region large enough to survive bilinear downsampling to head resolution
    pmask = np.zeros((1, 64, 64, 1), np.float32)
    pmask[0, 24:40, 24:40, 0] = 1.
    out = model.forward_padded(model.variables, jnp.asarray(img),
                               score_thresh=jnp.asarray(0.95), nms=False,
                               scores_lower_bound=jnp.asarray(pmask))
    # the lower bound of 1.0 > score_thresh forces foreground pixels
    assert int(out['valid'].sum()) >= 1
    # (the tiled path additionally drops degenerate boxes of untrained nets —
    # remove_small_boxes parity — so the end-to-end count is model-dependent)


def test_tta_inference(model):
    from celldetection_tpu.parallel import TiledInference
    from celldetection_tpu.parallel.tiles import tta_inference
    img = np.random.RandomState(2).rand(96, 96).astype(np.float32)
    tiled = TiledInference(model, tile_size=96, stride=64)
    base = tiled(img, score_thresh=0.35)
    out = tta_inference(tiled, img, reps=4, score_thresh=0.35)
    # flips of an asymmetric random image yield different detections; after
    # NMS the merged set is at least as large as any single pass
    assert len(out['boxes']) >= 0
    assert out['num_tiles'] == 4 * base['num_tiles']
    if len(out['contours']):
        assert out['contours'][..., 0].max() < 96 and out['contours'][..., 1].max() < 96


def test_point_mask_exclusive_skips_and_bounds(model):
    from celldetection_tpu.parallel import TiledInference
    img = np.random.RandomState(3).rand(128, 128).astype(np.float32)
    pmask = np.zeros((128, 128), np.float32)
    pmask[8:24, 8:24] = 1.  # only in the first tile
    tiled = TiledInference(model, tile_size=64, stride=64)
    out = tiled(img, point_mask=pmask, point_mask_exclusive=True, score_thresh=0.5)
    # point-empty tiles are skipped entirely (4-tile grid, 1 tile has points)
    assert out['num_tiles'] == 1
    # exclusive: every detection must touch the marked region
    for box in out['boxes']:
        x0, y0, x1, y1 = box
        assert x0 < 24 and y0 < 24, (box, 'detection outside exclusive point region')


def test_load_image_h5_dataset_and_separator(tmp_path):
    from celldetection_tpu.util.io import load_image, to_h5
    img = np.random.RandomState(0).rand(8, 8).astype(np.float32)
    fn = str(tmp_path / 'x.h5')
    to_h5(fn, data=img)
    np.testing.assert_allclose(load_image(fn + '::data'), img)
    np.testing.assert_allclose(load_image(fn, dataset='data'), img)
    np.testing.assert_allclose(load_image(f'{fn}##data', separator='##'), img)


def test_labels2properties_spacing():
    from celldetection_tpu.data.misc import labels2properties
    labels = np.zeros((10, 10), 'int32')
    labels[2:6, 2:6] = 1
    (a_px,), (a_um,) = (labels2properties(labels, 'area'),
                        labels2properties(labels, 'area', spacing=(0.5, 0.5)))
    assert a_px == 16 and abs(a_um - 4.0) < 1e-9
