"""Feature Pyramid Network — flax.linen (NHWC).

Behavioral reference: ``celldetection/models/fpn.py`` — FeaturePyramidNetwork
(:79, ConvNorm blocks instead of raw convs), LastLevelMaxPool (:50),
BackboneWithFPN (:137), FPN (:189), ResNet/MobileNet variants (:240-443).

Top-down pathway: per-level 1x1 inner ConvNorm, nearest-upsample + add,
3x3 layer ConvNorm, plus a stride-2 max-pool extra level ('pool').
"""
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.commons import resize_nearest
from .commons import ConvNorm, Normalize
from . import resnet as resnet_lib

__all__ = ['FeaturePyramidNetwork', 'BackboneWithFPN', 'FPN',
           'ResNet18FPN', 'ResNet34FPN', 'ResNet50FPN', 'ResNet101FPN', 'ResNet152FPN',
           'ResNeXt50FPN', 'ResNeXt101FPN', 'ResNeXt152FPN', 'WideResNet50FPN',
           'WideResNet101FPN']


class FeaturePyramidNetwork(nn.Module):
    """FPN decoder over an ordered dict of features (finest first).

    ``norm_layer`` defaults to None — plain convs with bias, matching the
    reference's torchvision-style FPN default (``celldetection/models/fpn.py:
    79-106``); reference FPN checkpoints then import directly.
    """
    out_channels: int = 256
    norm_layer: Optional[str] = None
    extra_maxpool: bool = True

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray], train: bool = False) -> Dict[str, jnp.ndarray]:
        names = list(x.keys())
        feats = list(x.values())
        n = len(feats)
        last_inner = ConvNorm(self.out_channels, kernel_size=1, padding=0,
                              norm_layer=self.norm_layer, name=f'inner{n - 1}')(feats[-1], train)
        results = [ConvNorm(self.out_channels, kernel_size=3,
                            norm_layer=self.norm_layer, name=f'layer{n - 1}')(last_inner, train)]
        for i in range(n - 2, -1, -1):
            inner = ConvNorm(self.out_channels, kernel_size=1, padding=0,
                             norm_layer=self.norm_layer, name=f'inner{i}')(feats[i], train)
            top_down = resize_nearest(last_inner, inner.shape[1:-1])
            last_inner = inner + top_down
            results.insert(0, ConvNorm(self.out_channels, kernel_size=3,
                                       norm_layer=self.norm_layer,
                                       name=f'layer{i}')(last_inner, train))
        out = {k: v for k, v in zip(names, results)}
        if self.extra_maxpool:
            nd = results[-1].ndim - 2
            out['pool'] = nn.max_pool(results[-1], (1,) * nd, strides=(2,) * nd)
        return out


class BackboneWithFPN(nn.Module):
    """Normalize → backbone → FPN (encoder field named ``body`` for
    reference-layout parameter paths)."""
    body: Any
    out_channels: int = 256
    normalize: bool = True
    inputs_mean: Any = 0.
    inputs_std: Any = 1.
    norm_layer: Optional[str] = None

    @property
    def feature_channels(self):
        n = len(self.body.out_channels) + 1  # + 'pool'
        return [self.out_channels] * n

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs
        if self.normalize:
            x = Normalize(self.inputs_mean, self.inputs_std, name='normalize')(x)
        feats = self.body(x, train)
        return FeaturePyramidNetwork(self.out_channels, norm_layer=self.norm_layer,
                                     name='fpn')(feats, train)


def FPN(backbone, channels: int = 256, **kwargs):
    """FPN over an arbitrary encoder (parity: ``cd.models.FPN``)."""
    return BackboneWithFPN(body=backbone, out_channels=channels, **kwargs)


def _warn_dropped_pretrained(pretrained):
    if pretrained:
        import warnings
        warnings.warn('pretrained=True on a bare backbone constructor is not '
                      'applied here — build the CPN with '
                      "backbone_kwargs={'pretrained': True} (weights load after "
                      'init via cdt.util.apply_pretrained_), or apply them '
                      'manually.', stacklevel=3)


def _res_fpn(resnet_ctor):
    def ctor(in_channels, fpn_channels: int = 256, backbone_kwargs: dict = None,
             pretrained=False, **kwargs):
        # reference signature: second positional is the FPN width
        # (celldetection/models/fpn.py:241); 0/None means default (the CPN
        # zoo passes the UNet-style out_channels=0 sentinel positionally)
        _warn_dropped_pretrained(pretrained)
        bk = dict(fused_initial=False)
        bk.update(backbone_kwargs or {})
        backbone = resnet_ctor(in_channels, **bk)
        return FPN(backbone, channels=fpn_channels or 256, **kwargs)
    return ctor


def _enc_fpn(ctor_fn):
    def ctor(in_channels, fpn_channels: int = 256, backbone_kwargs: dict = None,
             pretrained=False, **kwargs):
        _warn_dropped_pretrained(pretrained)
        backbone = ctor_fn(in_channels, **(backbone_kwargs or {}))
        return FPN(backbone, channels=fpn_channels or 256, **kwargs)
    return ctor


from . import mobilenetv3 as _mnv3  # noqa: E402

MobileNetV3LargeFPN = _enc_fpn(_mnv3.MobileNetV3Large)
MobileNetV3SmallFPN = _enc_fpn(_mnv3.MobileNetV3Small)
__all__ += ['MobileNetV3LargeFPN', 'MobileNetV3SmallFPN']

ResNet18FPN = _res_fpn(resnet_lib.ResNet18)
ResNet34FPN = _res_fpn(resnet_lib.ResNet34)
ResNet50FPN = _res_fpn(resnet_lib.ResNet50)
ResNet101FPN = _res_fpn(resnet_lib.ResNet101)
ResNet152FPN = _res_fpn(resnet_lib.ResNet152)
ResNeXt50FPN = _res_fpn(resnet_lib.ResNeXt50)
ResNeXt101FPN = _res_fpn(resnet_lib.ResNeXt101)
ResNeXt152FPN = _res_fpn(resnet_lib.ResNeXt152)
WideResNet50FPN = _res_fpn(resnet_lib.WideResNet50)
WideResNet101FPN = _res_fpn(resnet_lib.WideResNet101)
