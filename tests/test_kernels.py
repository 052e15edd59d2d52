"""Tests: Pallas kernels (interpret mode on CPU; compiled on TPU hardware)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celldetection_tpu.ops.boxes import nms_padded


def _random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.rand(n, 2).astype(np.float32) * 200
    sizes = rng.rand(n, 2).astype(np.float32) * 30 + 2
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.05
    return boxes, scores, valid


@pytest.mark.parametrize('n', [300, 1024])
def test_nms_pallas_interpret_matches_xla(n):
    """Pallas kernel (interpret mode) produces the exact XLA keep set."""
    from celldetection_tpu.kernels.nms_pallas import nms_pallas

    boxes, scores, valid = _random_boxes(n)
    expected = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                     jnp.asarray(valid), 0.3))
    got = np.asarray(nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.asarray(valid), iou_threshold=0.3, interpret=True))
    np.testing.assert_array_equal(got, expected)


def test_native_rasterizer_matches_reference_fill():
    from celldetection_tpu import native
    if not native.available():
        pytest.skip('no native toolchain')
    theta = np.linspace(0, 2 * np.pi, 48, endpoint=False)
    cons = [np.stack([30 + 12 * np.cos(theta), 40 + 9 * np.sin(theta)], -1),
            np.stack([70 + 10 * np.cos(theta), 70 + 10 * np.sin(theta)], -1)]
    lbl = native.contours2labels_native(cons, (100, 100))
    assert set(np.unique(lbl)) == {0, 1, 2}
    from celldetection_tpu import data
    lbl_cv = data.resolve_label_channels(data.contours2labels(cons, (100, 100)))
    # non-overlapping contours -> near-identical fills (boundary-pixel
    # conventions differ: cv2 paints the polygon outline, scanline fills the
    # interior — a ~1px ring of divergence is expected)
    inter = ((lbl > 0) & (lbl_cv > 0)).sum()
    union = ((lbl > 0) | (lbl_cv > 0)).sum()
    assert inter / union > 0.9
    assert (lbl[lbl == 1] == 1).all() and (lbl_cv[lbl == 1] == 1).mean() > 0.9
