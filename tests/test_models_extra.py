"""Tests: additional backbones (ConvNeXt/DenseNet/MobileNetV3/MaNet), filters, viz."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celldetection_tpu import models


X32 = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)


@pytest.mark.parametrize('name', [
    'CpnConvNeXtTinyUNet', 'CpnMobileNetV3SmallFPN',
])
def test_backbone_cpn_variants(name):
    m = models.get_cpn(name)(in_channels=3, max_detections=16, samples=8)
    m.init(jax.random.PRNGKey(0), (1, 32, 32, 3))
    out = m(X32, score_thresh=0.3)
    assert len(out['contours']) == 1
    assert out['contours'][0].shape[1:] == (8, 2)


def test_manet_decoder_shapes():
    from celldetection_tpu.models import MaNet, ResNet18
    enc = ResNet18(3)
    m = MaNet(body=enc)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    assert out['out'].shape[1:3] == (64, 64)
    assert 'encoder.0' in out


def test_encoder_feature_shapes():
    enc = models.ConvNeXtTiny(3)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    f = enc.apply(v, jnp.zeros((1, 64, 64, 3)), False)
    assert [f[k].shape[-1] for k in sorted(f)] == list(enc.out_channels)
    assert f['0'].shape[1] == 16  # stride 4

    enc2 = models.DenseNet121(3)
    v2 = enc2.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    f2 = enc2.apply(v2, jnp.zeros((1, 64, 64, 3)), False)
    assert [f2[k].shape[-1] for k in sorted(f2)] == list(enc2.out_channels)

    enc3 = models.MobileNetV3Small(3)
    v3 = enc3.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    f3 = enc3.apply(v3, jnp.zeros((1, 64, 64, 3)), False)
    assert len(f3) == len(enc3.out_channels)


def test_convnext_grn_and_v2():
    enc = models.ConvNeXtV2Atto(3)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)
    # V2 has GRN params, no layer_scale
    flat = str(jax.tree_util.tree_structure(v))
    assert 'grn' in flat and 'layer_scale' not in flat


def test_filters():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 2).astype(np.float32))
    for f in [models.GaussianFilter2d(5), models.SobelFilter2d(), models.BoxFilter2d(3),
              models.LaplaceFilter2d(), models.PascalFilter2d(5)]:
        v = f.init(jax.random.PRNGKey(0), x)
        y = f.apply(v, x)
        assert y.shape == x.shape
    edge = models.EdgeFilter2d()
    v = edge.init(jax.random.PRNGKey(0), x)
    y = edge.apply(v, x)
    assert y.shape == x.shape and (np.asarray(y) >= 0).all()
    # box filter preserves mean
    bf = models.BoxFilter2d(3)
    ones = jnp.ones((1, 8, 8, 1))
    y = bf.apply(bf.init(jax.random.PRNGKey(0), ones), ones)
    np.testing.assert_allclose(np.asarray(y)[0, 2:-2, 2:-2, 0], 1., rtol=1e-5)


def test_ppm():
    ppm = models.Ppm(out_channels=8)
    x = jnp.zeros((1, 24, 24, 16))
    v = ppm.init(jax.random.PRNGKey(0), x)
    y = ppm.apply(v, x)
    assert y.shape == (1, 24, 24, 16 + 4 * 8)


def test_multiscale_features():
    mf = models.MultiscaleBasicFeatures(sigmas=(1.0, 2.0))
    x = jnp.zeros((1, 32, 32, 1))
    v = mf.init(jax.random.PRNGKey(0), x)
    y = mf.apply(v, x)
    assert y.shape[-1] == 2 * (1 + 1 + 2)  # per sigma: intensity + edge + 2 texture


def test_pixel_norm():
    pn = models.PixelNorm()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 8).astype(np.float32))
    y = pn.apply({}, x)
    norms = np.asarray(jnp.mean(jnp.square(y), -1))
    np.testing.assert_allclose(norms, 1., rtol=1e-4)


def test_visualization_roundtrip(tmp_path):
    from celldetection_tpu import visualization as viz
    img = np.random.RandomState(0).rand(32, 32)
    cons = [np.array([[5, 5], [10, 5], [10, 10], [5, 10]], float)]
    ax = viz.show_detection(image=img, contours=cons, boxes=[[5, 5, 10, 10]],
                            scores=[0.9], locations=[[7, 7]])
    fig = ax.figure
    arr = viz.figure2img(fig)
    assert arr.ndim == 3
    viz.save_fig(str(tmp_path / 'fig.png'), fig)
    lbl = np.zeros((16, 16), np.int32)
    lbl[2:6, 2:6] = 1
    rgb = viz.label_cmap(lbl, seed=0)
    assert rgb.shape == (16, 16, 3)


def test_metrics_logger(tmp_path):
    from celldetection_tpu.util import MetricsLogger
    ml = MetricsLogger(str(tmp_path), 'm')
    ml.log(0, loss=1.0)
    ml.log(1, loss=0.5)
    import json
    lines = [json.loads(l) for l in open(ml.path)]
    assert len(lines) == 2 and lines[1]['loss'] == 0.5


def test_mamba_selective_scan_matches_sequential():
    from celldetection_tpu.models import selective_scan
    rng = np.random.RandomState(0)
    B, L, D, N = 2, 17, 4, 8
    u = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    delta = jnp.asarray(np.abs(rng.randn(B, L, D)) * 0.1 + 0.01, jnp.float32)
    A = -jnp.asarray(np.abs(rng.randn(D, N)) + 0.1, jnp.float32)
    Bm = jnp.asarray(rng.randn(B, L, N), jnp.float32)
    Cm = jnp.asarray(rng.randn(B, L, N), jnp.float32)
    Dp = jnp.asarray(rng.randn(D), jnp.float32)
    y = np.asarray(selective_scan(u, delta, A, Bm, Cm, Dp))
    x = np.zeros((B, D, N))
    ys = []
    for t in range(L):
        dA = np.exp(np.asarray(delta[:, t])[..., None] * np.asarray(A))
        dBu = (np.asarray(delta[:, t])[..., None] * np.asarray(Bm[:, t])[:, None, :]
               * np.asarray(u[:, t])[..., None])
        x = dA * x + dBu
        ys.append(np.einsum('bn,bdn->bd', np.asarray(Cm[:, t]), x))
    y_ref = np.stack(ys, 1) + np.asarray(u) * np.asarray(Dp)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_mamba_layer_shapes():
    from celldetection_tpu.models import MambaLayer
    ml = MambaLayer()
    x = jnp.zeros((1, 8, 8, 16))
    v = ml.init(jax.random.PRNGKey(0), x)
    assert ml.apply(v, x).shape == (1, 8, 8, 16)


def test_unet_3d_forward():
    from celldetection_tpu.models import U22
    u = U22(in_channels=1, out_channels=2)
    x3 = jnp.zeros((1, 16, 16, 16, 1))
    v = u.init(jax.random.PRNGKey(0), x3, False)
    assert u.apply(v, x3, False).shape == (1, 16, 16, 16, 2)


def test_augmentation_pipeline():
    from celldetection_tpu.data import conf2augmentation
    rng = np.random.RandomState(0)
    aug = conf2augmentation({
        'RandomRotate90': {'p': 1.0}, 'HorizontalFlip': {'p': 1.0},
        'RandomBrightnessContrast': {'p': 1.0}, 'ElasticTransform': {'p': 1.0},
    })
    img = rng.rand(32, 32, 1).astype(np.float32)
    lbl = np.zeros((32, 32, 1), np.int32)
    lbl[10:20, 10:20] = 1
    out_img, out_lbl = aug(img, lbl, rng)
    assert out_img.shape == (32, 32, 1) and out_lbl.shape == (32, 32, 1)
    assert set(np.unique(out_lbl)) <= {0, 1}
    assert (out_lbl == 1).sum() > 0


def test_resnet_secondary_block_and_ppm():
    from functools import partial
    from celldetection_tpu.models import ResNetEncoder, MambaLayer
    enc = ResNetEncoder(in_channels=1, layers=(1, 1, 1, 1), base_channel=8,
                        secondary_block=MambaLayer, pyramid_pooling=True,
                        pyramid_pooling_channels=4)
    x = jnp.zeros((1, 32, 32, 1))
    v = enc.init(jax.random.PRNGKey(0), x, False)
    f = enc.apply(v, x, False)
    assert f['3'].shape[-1] == enc.out_channels[-1]
    assert 'secondary1' in str(jax.tree_util.tree_structure(v))


def test_util_misc():
    from celldetection_tpu import util
    name = util.random_code_name(6)
    assert len(name) == 6 and name.isalpha()
    assert util.parse_url_params('http://x.com/a?b=1&c=2') == {'b': '1', 'c': '2'}
    assert util.say_goodbye().endswith('!')


def test_host_encoder_in_jit():
    from celldetection_tpu.models.host_encoder import HostEncoder

    class FakeEnc:
        out_channels = [8, 16]
        out_strides = [2, 4]

        def __call__(self, x, train=False):
            n, h, w, c = x.shape
            return {'0': np.ones((n, h // 2, w // 2, 8), np.float32),
                    '1': np.ones((n, h // 4, w // 4, 16), np.float32)}

    he = HostEncoder(FakeEnc())
    v = he.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), False)
    out = jax.jit(lambda x: he.apply(v, x, False))(jnp.zeros((1, 16, 16, 3)))
    assert out['0'].shape == (1, 8, 8, 8) and out['1'].shape == (1, 4, 4, 16)


def test_host_encoder_trainable_gradients():
    """trainable=True: torch params become flax params; grads cross the
    callback via host-side torch autograd and match torch exactly."""
    import torch
    from celldetection_tpu.models.host_encoder import HostEncoder

    class TorchEnc:
        out_channels = [6]
        out_strides = [2]

        def __init__(self):
            torch.manual_seed(0)
            self.module = torch.nn.Sequential(
                torch.nn.Conv2d(3, 6, 3, stride=2, padding=1),
                torch.nn.ReLU(),
                torch.nn.Conv2d(6, 6, 3, padding=1))

        def torch_features(self, x_t):
            return [self.module(x_t)]

    enc = TorchEnc()
    he = HostEncoder(enc, trainable=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3), jnp.float32)
    v = he.init(jax.random.PRNGKey(0), x, False)
    # registered params mirror the torch module
    assert any('0__weight' in k for k in v['params'])

    def loss_fn(params, x):
        out = he.apply({'params': params}, x, False)
        return jnp.sum(out['0'] ** 2)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(v['params'], x)
    g_params, g_x = grads

    # torch reference (re-enable grads: the host bwd pass switches them off)
    for p in enc.module.parameters():
        p.requires_grad_(True)
    x_t = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).requires_grad_(True)
    f = enc.module(x_t)
    (f ** 2).sum().backward()
    np.testing.assert_allclose(float(loss), float((f ** 2).sum()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_params['0__weight']),
                               enc.module[0].weight.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_x),
                               x_t.grad.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)

    # jit + grad composes
    jl = jax.jit(jax.grad(loss_fn))(v['params'], x)
    np.testing.assert_allclose(np.asarray(jl['2__bias']),
                               enc.module[2].bias.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_timm_smp_cpns_gated():
    """Unknown encoder names require the host adapter (timm/smp) and fail
    cleanly whether or not those optional packages are installed; known names
    resolve to native TPU backbones and construct without torch-side deps."""
    import pytest as _pytest
    from celldetection_tpu import models as _m
    # ImportError without timm/smp; their own lookup error (RuntimeError /
    # ValueError / KeyError) when present — gated either way.
    adapter_errors = (ImportError, RuntimeError, ValueError, KeyError)
    for name in ('CpnTimmUNet', 'CpnSmpUNet', 'CpnTimmMaNet', 'CpnSmpMaNet'):
        assert name in _m.models_by_name
        with _pytest.raises(adapter_errors):
            _m.get_cpn(name)(3, model_name='nosuch_net_xyz')
    # known names resolve to the native backbone table (round-3 behavior):
    # construction succeeds with no torch-side packages involved
    m = _m.get_cpn('CpnTimmUNet')(3, model_name='resnet18')
    assert m.core is not None
    # fixed-encoder spelling (CpnMiTB5MaNet pins smp's mit_b5): resolves
    # natively when a native MiT implementation exists, otherwise it needs the
    # smp host adapter and must fail cleanly without it
    assert 'CpnMiTB5MaNet' in _m.models_by_name
    from celldetection_tpu.models.host_encoder import resolve_native_encoder
    if resolve_native_encoder('mit_b5', 3) is not None:
        assert _m.get_cpn('CpnMiTB5MaNet')(3).core is not None
    else:
        try:
            import segmentation_models_pytorch  # noqa: F401
        except ImportError:
            with _pytest.raises(ImportError):
                _m.get_cpn('CpnMiTB5MaNet')(3)


def test_replay_cache():
    from celldetection_tpu.models import ReplayCache
    rc = ReplayCache(size=8, rng=np.random.RandomState(0))
    rc.add(np.ones((4, 2, 2)), fraction=1.0)
    assert len(rc) == 4
    batch = rc(2)
    assert batch.shape == (2, 2, 2)


def test_resnet_unet_fpn_3d_forward():
    """nd=3 support for ResNet encoders + UNet/FPN decoders (parity with the
    reference's nd-generalized backbones, celldetection/models/resnet.py)."""
    from celldetection_tpu.models import fpn as fpn_lib
    from celldetection_tpu.models import unet as unet_lib

    x3 = jnp.zeros((1, 16, 16, 16, 1))
    m = unet_lib.ResNet18UNet(1, out_channels=4)
    v = m.init(jax.random.PRNGKey(0), x3, False)
    assert m.apply(v, x3, False).shape == (1, 16, 16, 16, 4)

    f = fpn_lib.ResNet18FPN(1)
    v = f.init(jax.random.PRNGKey(0), x3, False)
    feats = f.apply(v, x3, False)
    assert feats['0'].shape == (1, 8, 8, 8, 256)
    assert feats['pool'].shape[1:4] == (1, 1, 1)


def test_convnext_densenet_mobilenet_3d_forward():
    """nd=3 smoke for the remaining encoder families (parity: the reference
    generalizes ConvNeXt/DenseNet/MobileNetV3 to nd,
    celldetection/models/convnext.py:117, densenet.py:156,
    mobilenetv3.py:28-95)."""
    from celldetection_tpu.models import convnext, densenet, mobilenetv3

    x3 = jnp.zeros((1, 16, 16, 16, 1))

    m = convnext.ConvNeXtAttoEncoder(in_channels=1) \
        if hasattr(convnext, 'ConvNeXtAttoEncoder') else convnext.ConvNeXtTiny(1)
    v = m.init(jax.random.PRNGKey(0), x3, False)
    feats = m.apply(v, x3, False)
    assert feats['0'].shape[1:4] == (4, 4, 4)

    m = densenet.DenseNet121(in_channels=1)
    v = m.init(jax.random.PRNGKey(0), x3, False)
    feats = m.apply(v, x3, False)
    assert feats['0'].shape[1:4] == (4, 4, 4)

    m = mobilenetv3.MobileNetV3Small(in_channels=1)
    v = m.init(jax.random.PRNGKey(0), x3, False)
    feats = m.apply(v, x3, False)
    # every stride-2 level halves ALL three spatial dims (nd-generic strides)
    assert feats['0'].shape[1:4] == (8, 8, 8)
    assert feats['1'].shape[1:4] == (4, 4, 4)


def test_ppm_manet_3d_forward():
    from celldetection_tpu.models.ppm import Ppm
    from celldetection_tpu.models.manet import PositionWiseAttention, MultiscaleFusionAttention

    x3 = jnp.zeros((1, 12, 12, 12, 8))
    p = Ppm(out_channels=4, scales=(1, 2, 3))
    v = p.init(jax.random.PRNGKey(0), x3, False)
    out = p.apply(v, x3, False)
    assert out.shape == (1, 12, 12, 12, 8 + 3 * 4)

    x3 = jnp.zeros((1, 4, 4, 4, 8))
    pab = PositionWiseAttention(mid_channels=4)
    v = pab.init(jax.random.PRNGKey(0), x3, False)
    assert pab.apply(v, x3, False).shape == x3.shape

    lo = jnp.zeros((1, 8, 8, 8, 6))
    mfab = MultiscaleFusionAttention(out_channels=5, lateral_channels=6)
    v = mfab.init(jax.random.PRNGKey(0), x3, lo, False)
    assert mfab.apply(v, x3, lo, False).shape == (1, 8, 8, 8, 5)


def test_densenet_convnext_3d_forward():
    from celldetection_tpu.models.convnext import ConvNeXtEncoder
    from celldetection_tpu.models.densenet import DenseNetEncoder

    x3 = jnp.zeros((1, 32, 32, 32, 1))
    d = DenseNetEncoder(in_channels=1, growth_rate=8, block_config=(2, 2), init_features=8)
    v = d.init(jax.random.PRNGKey(0), x3, False)
    feats = d.apply(v, x3, False)
    assert feats['0'].shape[1:4] == (8, 8, 8)
    assert feats['1'].shape[1:4] == (4, 4, 4)

    c = ConvNeXtEncoder(in_channels=1, depths=(2, 2), channels=(16, 32))
    v = c.init({'params': jax.random.PRNGKey(0)}, x3, False)
    feats = c.apply(v, x3, False)
    assert feats['0'].shape == (1, 8, 8, 8, 16)
    assert feats['1'].shape == (1, 4, 4, 4, 32)


def test_mobilenetv3_reduced_tail_and_dilated():
    """torchvision conf parity for the reduced_tail / dilated tail variants
    (reference: celldetection/models/mobilenetv3.py:28-95 via
    torchvision _mobilenet_v3_conf)."""
    import jax
    import numpy as np
    from celldetection_tpu.models import mobilenetv3 as mnv3

    base = mnv3.MobileNetV3Large(3)
    red = mnv3.MobileNetV3Large(3, reduced_tail=True)
    dil = mnv3.MobileNetV3Large(3, dilated=True)
    both = mnv3.MobileNetV3Large(3, reduced_tail=True, dilated=True)

    # reduced tail: deepest level (6*out of last block) halves: 960 -> 480
    assert base.out_channels[-1] == 960 and red.out_channels[-1] == 480
    assert base.out_channels[:-1] == red.out_channels[:-1]
    # dilated: deepest level keeps the previous level's stride
    assert base.out_strides == [2, 4, 8, 16, 32]
    assert dil.out_strides == [2, 4, 8, 16, 16]
    assert both.out_channels[-1] == 480 and both.out_strides[-1] == 16

    x = np.zeros((1, 64, 64, 3), np.float32)
    v = both.init(jax.random.PRNGKey(0), x)
    feats = both.apply(v, x)
    assert feats[str(len(both.out_channels) - 1)].shape == (1, 4, 4, 480)
    # small variant too: 576 -> 288
    small = mnv3.MobileNetV3Small(3, reduced_tail=True)
    assert small.out_channels[-1] == 288

    # end-to-end through the CPN zoo
    from celldetection_tpu import models
    m = models.get_cpn('CpnMobileNetV3LargeUNet')(
        3, backbone_kwargs=dict(reduced_tail=True, dilated=True), max_detections=64)
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 3))
    out = m(np.zeros((64, 64, 3), np.float32))
    assert 'contours' in out
