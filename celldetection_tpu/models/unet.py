"""U-Net family — flax.linen (NHWC).

Behavioral reference: ``celldetection/models/unet.py`` — ``UNetEncoder``
(:29), ``GeneralizedUNet`` (:62, forward :178-249), ``BackboneAsUNet``
(:253), ``UNet`` (:338), ``U22`` (:405), ``ResUNet`` (:434), ``SlimU22``
(:467), ``WideU22`` (:497), ``U17`` (:527), ``U12`` (:556), plus the
ResNet/ConvNeXt-encoder variants (:591-830, see
``celldetection_tpu.models.resnet`` / ``.convnext``).

Decoder semantics preserved: top-down nearest upsampling, 1x1 channel
reduction ("inner blocks"), concat-merge with lateral features, stride
bridging for encoders that start above stride 1, full-res bilinear final
interpolation, and ``keep_features`` exposing encoder maps under
``encoder.*`` keys.
"""
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Type, Union

import jax.numpy as jnp
from flax import linen as nn

from ..ops.commons import resize_bilinear, resize_nearest
from .commons import Normalize, ResBlock, TwoConvNormRelu

__all__ = ['UNetEncoder', 'GeneralizedUNet', 'BackboneAsUNet', 'UNet',
           'U22', 'SlimU22', 'WideU22', 'U17', 'U12', 'ResUNet']


class UNetEncoder(nn.Module):
    """Plain U-Net encoder: ``depth`` stages of ``block_cls``, downsampling 2x.

    Attributes:
        in_channels: Input channels (informational; convs infer from input).
        depth: Number of stages (feature strides 1, 2, 4, ...).
        base_channels: Stage-0 channels; stage i has ``base * factor**i``.
        pool: Max-pool (True) or strided conv (False) downsampling.
    """
    in_channels: int = 3
    depth: int = 5
    base_channels: int = 64
    factor: int = 2
    pool: bool = True
    block_cls: Any = None
    norm_layer: Union[str, None] = 'batchnorm2d'

    @property
    def out_channels(self):
        return [self.base_channels * (self.factor ** i) for i in range(self.depth)]

    @property
    def out_strides(self):
        return [2 ** i for i in range(self.depth)]

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        block_cls = self.block_cls or TwoConvNormRelu
        features = {}
        for i in range(self.depth):
            out_c = self.base_channels * (self.factor ** i)
            if i > 0 and self.pool:
                nd = x.ndim - 2
                x = nn.max_pool(x, (2,) * nd, strides=(2,) * nd)
                stride = 1
            else:
                stride = int((not self.pool and i > 0) + 1)
            x = block_cls(out_c, stride=stride, norm_layer=self.norm_layer, name=f'block{i}')(x, train)
            features[str(i)] = x
        return features


class GeneralizedUNet(nn.Module):
    """Generalized U-Net decoder over a dict of multi-scale features.

    Args (attributes):
        in_channels_list: Encoder channels per level (level 0 = finest).
        out_channels: Final output channels; 0 omits the output layer and
            returns the feature dict instead.
        block_cls: Decoder block (called as ``block(out_c)(x, train)``).
        in_strides_list: Encoder strides; a first stride > 1 activates bridge
            blocks that synthesize the missing fine levels.
        out_channels_list: Decoder channels per level (default: mirror input).
        keep_features: Include raw encoder maps as ``encoder.<k>`` outputs.
    """
    in_channels_list: Sequence[int]
    out_channels: int = 0
    block_cls: Any = None
    block_kwargs: Optional[dict] = None
    final_activation: Any = None
    interpolate: str = 'nearest'
    in_strides_list: Optional[Sequence[int]] = None
    out_channels_list: Optional[Sequence[int]] = None
    keep_features: bool = True
    bridge_strides: bool = True
    # Optional per-level block applied after each decoder block (reference
    # ``secondary_block``, unet.py:153-155; e.g. MambaLayer).
    secondary_block: Any = None
    nd: int = 2

    def _plan(self):
        in_list = list(self.in_channels_list)
        out_list = list(self.out_channels_list) if self.out_channels_list is not None else list(in_list)
        strides = list(self.in_strides_list) if (self.in_strides_list is not None and self.bridge_strides) \
            else [2 ** i for i in range(len(in_list))]
        bridges = 0
        s = strides[0]
        while s > 1:
            s //= 2
            bridges += 1
        num = len(in_list)
        for _ in range(bridges):
            in_list = [0] + in_list
            if len(out_list) < num + bridges - 1:
                out_list = [out_list[0]] + out_list
        return in_list, out_list, bridges

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray], size: Optional[Tuple[int, int]],
                 train: bool = False):
        block_cls = self.block_cls or TwoConvNormRelu
        block_kwargs = self.block_kwargs or {}
        in_list, out_list, bridges = self._plan()
        depth = len(in_list) - 1

        names = list(x.keys())
        feats = list(x.values())
        last_inner = feats[-1]
        results = [last_inner]
        for i in range(depth - 1, -1, -1):
            has_lat = in_list[i] > 0
            lateral = feats[i - bridges] if has_lat else None
            top_down = last_inner
            # Inner 1x1 channel reduction — applied BEFORE the upsample.
            # A 1x1 conv is a per-pixel linear map, and nearest/bilinear
            # resize is a spatial convex combination (weights sum to 1), so
            # conv∘resize == resize∘conv exactly (incl. bias). Reducing
            # channels first runs the conv at 1/4 the pixels and halves the
            # upsample's HBM bytes — the decoder is memory-bound at fp32.
            # (Reference applies it post-interpolate, unet.py:218-227;
            # results are identical up to fp summation order.)
            inner_inc = out_list[i + 1] if i + 1 < depth else in_list[i + 1]
            inner_ouc = out_list[i]
            if inner_inc > 0 and inner_ouc < inner_inc:
                top_down = nn.Conv(inner_ouc, (1,) * (top_down.ndim - 2),
                                   name=f'inner{i + 1}')(top_down)
            # Upsample top-down path to lateral size (or 2x for bridge levels).
            if lateral is not None:
                t_size = lateral.shape[1:-1]
            else:
                t_size = tuple(s * 2 for s in top_down.shape[1:-1])
            if top_down.shape[1:-1] != t_size:
                if self.interpolate == 'nearest':
                    top_down = resize_nearest(top_down, t_size)
                else:
                    top_down = resize_bilinear(top_down, t_size)
            if has_lat:
                block_in = jnp.concatenate([lateral, top_down], -1)
                last_inner = block_cls(out_list[i], name=f'layer{i}', **block_kwargs)(block_in, train)
            else:  # bridge block (no lateral features at this stride)
                # inherit activation/norm from block_kwargs (ref:
                # update_dict_(bridge_block_kwargs, block_kwargs,
                # ('activation', 'norm_layer')))
                bridge_kwargs = {k: v for k, v in block_kwargs.items()
                                 if k in ('activation', 'norm_layer')}
                last_inner = TwoConvNormRelu(out_list[i], use_bias=False,
                                             name=f'layer{i}',
                                             **bridge_kwargs)(top_down, train)
            if self.secondary_block is not None:
                last_inner = self.secondary_block(name=f'secondary{i}')(last_inner, train)
            results.insert(0, last_inner)

        if size is None:
            final = results[0]
        else:
            final = resize_bilinear(last_inner, size)
        if self.out_channels > 0:
            final = nn.Conv(self.out_channels, (1,) * (final.ndim - 2),
                            name='out_layer')(final)
            if self.final_activation is not None:
                from .commons import get_activation
                final = get_activation(self.final_activation)(final)
            return final
        out = {'out': final}
        # Finest-first: with stride bridging, keys '0', '1', ... name the
        # synthesized fine levels (zip truncates — parity with reference
        # ``unet.py:246`` where names come from the original feature dict).
        for k, v in zip(names, results):
            out[k] = v
        if self.keep_features:
            for k, v in x.items():
                out[f'encoder.{k}'] = v
        return out

    @property
    def out_channels_list_resolved(self):
        _, out_list, _ = self._plan()
        return out_list


class BackboneAsUNet(nn.Module):
    """Encoder backbone + GeneralizedUNet decoder + input normalization.

    The encoder field is named ``body`` so parameter paths mirror the
    reference layout (``backbone.body.*`` / ``backbone.unet.*``) for
    checkpoint transport.
    """
    body: Any
    in_channels_list: Sequence[int]
    out_channels: int = 0
    block_cls: Any = None
    block_kwargs: Optional[dict] = None
    final_activation: Any = None
    interpolate: str = 'nearest'
    in_strides_list: Optional[Sequence[int]] = None
    out_channels_list: Optional[Sequence[int]] = None
    normalize: bool = True
    inputs_mean: Any = 0.
    inputs_std: Any = 1.

    @property
    def feature_channels(self):
        """Per-key decoder output channels (key '0' = finest level)."""
        plan = GeneralizedUNet(
            in_channels_list=self.in_channels_list,
            out_channels_list=self.out_channels_list,
            in_strides_list=self.in_strides_list,
        )
        return plan.out_channels_list_resolved

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs
        if self.normalize:
            x = Normalize(self.inputs_mean, self.inputs_std, name='normalize')(x)
        features = self.body(x, train)
        out = GeneralizedUNet(
            in_channels_list=self.in_channels_list,
            out_channels=self.out_channels,
            block_cls=self.block_cls,
            block_kwargs=self.block_kwargs,
            final_activation=self.final_activation,
            interpolate=self.interpolate,
            in_strides_list=self.in_strides_list,
            out_channels_list=self.out_channels_list,
            name='unet',
        )(features, size=inputs.shape[1:-1], train=train)
        return out


class UNet(BackboneAsUNet):
    """U-Net over an arbitrary encoder (parity: ``cd.models.UNet``)."""


def _unet_variant(backbone_kwargs=None, **overrides):
    kw = dict(backbone_kwargs or {})
    kw.update(overrides)
    return kw


def _make_encoder_unet(in_channels, out_channels, base_channels, depth=5, block_cls=None,
                       final_activation=None, backbone_kwargs=None, **kwargs):
    bk = dict(backbone_kwargs or {})
    encoder = UNetEncoder(in_channels=in_channels, depth=bk.pop('depth', depth),
                          base_channels=bk.pop('base_channels', base_channels),
                          block_cls=block_cls, **bk)
    return UNet(
        body=encoder,
        in_channels_list=encoder.out_channels,
        in_strides_list=encoder.out_strides,
        out_channels=out_channels,
        block_cls=block_cls,
        final_activation=final_activation,
        **kwargs,
    )


def U22(in_channels, out_channels=0, final_activation=None, backbone_kwargs=None, **kwargs):
    """U-Net 22: 22 convolutions over 5 resolutions, base 64 channels."""
    return _make_encoder_unet(in_channels, out_channels, 64, 5, None, final_activation,
                              backbone_kwargs, **kwargs)


def SlimU22(in_channels, out_channels=0, final_activation=None, backbone_kwargs=None, **kwargs):
    """U22 with half the feature channels (base 32)."""
    return _make_encoder_unet(in_channels, out_channels, 32, 5, None, final_activation,
                              backbone_kwargs, **kwargs)


def WideU22(in_channels, out_channels=0, final_activation=None, backbone_kwargs=None, **kwargs):
    """U22 with 1.5x feature channels (base 96)."""
    return _make_encoder_unet(in_channels, out_channels, 96, 5, None, final_activation,
                              backbone_kwargs, **kwargs)


def U17(in_channels, out_channels=0, final_activation=None, backbone_kwargs=None, **kwargs):
    """U-Net 17: 4 resolutions."""
    return _make_encoder_unet(in_channels, out_channels, 64, 4, None, final_activation,
                              backbone_kwargs, **kwargs)


def U12(in_channels, out_channels=0, final_activation=None, backbone_kwargs=None, **kwargs):
    """U-Net 12: 3 resolutions."""
    return _make_encoder_unet(in_channels, out_channels, 64, 3, None, final_activation,
                              backbone_kwargs, **kwargs)


def ResUNet(in_channels, out_channels=0, final_activation=None, backbone_kwargs=None, **kwargs):
    """U-Net with residual blocks."""
    return _make_encoder_unet(in_channels, out_channels, 64, 5, ResBlock, final_activation,
                              backbone_kwargs, **kwargs)


def _backbone_unet(backbone_ctor, default_backbone_kwargs=None):
    """Backbone encoder + bridged UNet decoder.

    ResNet-family UNets default to ``fused_initial=False`` — the stem is its
    own stride-2 feature level feeding the decoder, matching the reference's
    ``_default_res_kwargs`` (``celldetection/models/unet.py:584-588``). This
    is required for real reference checkpoints (e.g. the hosted ginoro model)
    to import.
    """
    def ctor(in_channels, out_channels=0, final_activation=None, backbone_kwargs=None,
             pretrained=False, block_cls=None, **kwargs):
        if pretrained:
            import warnings
            warnings.warn('pretrained=True on a bare backbone constructor is not '
                          'applied here — build the CPN with '
                          "backbone_kwargs={'pretrained': True} (weights load "
                          'after init via cdt.util.apply_pretrained_).',
                          stacklevel=2)
        bk = dict(default_backbone_kwargs or {})
        bk.update(backbone_kwargs or {})
        encoder = backbone_ctor(in_channels, **bk)
        return UNet(
            body=encoder,
            in_channels_list=list(encoder.out_channels),
            in_strides_list=list(encoder.out_strides),
            out_channels=out_channels,
            block_cls=block_cls,
            final_activation=final_activation,
            **kwargs,
        )
    return ctor


from . import resnet as _resnet  # noqa: E402  (avoids circular import at module top)

_RES_UNET_KW = dict(fused_initial=False)
ResNet18UNet = _backbone_unet(_resnet.ResNet18, _RES_UNET_KW)
ResNet34UNet = _backbone_unet(_resnet.ResNet34, _RES_UNET_KW)
ResNet50UNet = _backbone_unet(_resnet.ResNet50, _RES_UNET_KW)
ResNet101UNet = _backbone_unet(_resnet.ResNet101, _RES_UNET_KW)
ResNet152UNet = _backbone_unet(_resnet.ResNet152, _RES_UNET_KW)
ResNeXt50UNet = _backbone_unet(_resnet.ResNeXt50, _RES_UNET_KW)
ResNeXt101UNet = _backbone_unet(_resnet.ResNeXt101, _RES_UNET_KW)
ResNeXt152UNet = _backbone_unet(_resnet.ResNeXt152, _RES_UNET_KW)
WideResNet50UNet = _backbone_unet(_resnet.WideResNet50, _RES_UNET_KW)
WideResNet101UNet = _backbone_unet(_resnet.WideResNet101, _RES_UNET_KW)

__all__ += ['ResNet18UNet', 'ResNet34UNet', 'ResNet50UNet', 'ResNet101UNet', 'ResNet152UNet',
            'ResNeXt50UNet', 'ResNeXt101UNet', 'ResNeXt152UNet', 'WideResNet50UNet',
            'WideResNet101UNet']

from . import convnext as _convnext  # noqa: E402
from . import densenet as _densenet  # noqa: E402
from . import mobilenetv3 as _mnv3  # noqa: E402

ConvNeXtTinyUNet = _backbone_unet(_convnext.ConvNeXtTiny)
ConvNeXtSmallUNet = _backbone_unet(_convnext.ConvNeXtSmall)
ConvNeXtBaseUNet = _backbone_unet(_convnext.ConvNeXtBase)
ConvNeXtLargeUNet = _backbone_unet(_convnext.ConvNeXtLarge)
ConvNeXtV2TinyUNet = _backbone_unet(_convnext.ConvNeXtV2Tiny)
ConvNeXtV2BaseUNet = _backbone_unet(_convnext.ConvNeXtV2Base)
DenseNet121UNet = _backbone_unet(_densenet.DenseNet121)
DenseNet161UNet = _backbone_unet(_densenet.DenseNet161)
DenseNet169UNet = _backbone_unet(_densenet.DenseNet169)
DenseNet201UNet = _backbone_unet(_densenet.DenseNet201)
MobileNetV3LargeUNet = _backbone_unet(_mnv3.MobileNetV3Large)
MobileNetV3SmallUNet = _backbone_unet(_mnv3.MobileNetV3Small)

__all__ += ['ConvNeXtTinyUNet', 'ConvNeXtSmallUNet', 'ConvNeXtBaseUNet', 'ConvNeXtLargeUNet',
            'ConvNeXtV2TinyUNet', 'ConvNeXtV2BaseUNet', 'DenseNet121UNet', 'DenseNet161UNet',
            'DenseNet169UNet', 'DenseNet201UNet', 'MobileNetV3LargeUNet', 'MobileNetV3SmallUNet']
