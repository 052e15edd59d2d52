"""MA-Net: Multi-scale Attention Network — flax.linen (NHWC).

Behavioral reference: ``celldetection/models/manet.py`` —
PositionWiseAttention (:26), PAB (:51), MultiscaleFusionAttention (:71),
MaNet (:116). U-Net variant whose decoder merges with Multi-scale Fusion
Attention blocks (dual squeeze-excitation gating) and whose deepest encoder
feature passes through a Position-wise Attention Block.
"""
import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.commons import resize_bilinear, resize_nearest
from .commons import ConvNormRelu, Normalize

__all__ = ['PositionWiseAttention', 'MultiscaleFusionAttention', 'MaNetDecoder', 'MaNet',
           'TimmMaNet', 'SmpMaNet']


class PositionWiseAttention(nn.Module):
    """PAB: softmax position-affinity attention over flattened spatial dims."""
    out_channels: Optional[int] = None
    mid_channels: int = 64
    kernel_size: int = 3
    beta: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_out = self.out_channels or x.shape[-1]
        nd = x.ndim - 2
        if x.shape[-1] != c_out:
            x = nn.Conv(c_out, (3,) * nd, padding=1, name='in_conv')(x)
        n, spatial = x.shape[0], x.shape[1:-1]
        hw = math.prod(spatial)
        a = nn.Conv(self.mid_channels, (1,) * nd, name='proj_a')(x).reshape(n, hw, -1)
        b = nn.Conv(self.mid_channels, (1,) * nd, name='proj_b')(x).reshape(n, hw, -1)
        p = jnp.einsum('nic,njc->nij', a, b)
        p = jax.nn.softmax(p.reshape(n, -1), -1).reshape(n, hw, hw)
        cmap = nn.Conv(c_out, (self.kernel_size,) * nd, padding=self.kernel_size // 2,
                       name='proj')(x).reshape(n, hw, c_out)
        out = jnp.einsum('nij,nic->njc', p, cmap).reshape(n, *spatial, c_out)
        beta = self.param('beta', nn.initializers.zeros, (1,)) if self.beta else 1.
        return nn.Conv(c_out, (3,) * nd, padding=1, name='out_conv')(beta * out + x)


class MultiscaleFusionAttention(nn.Module):
    """MFAB decoder block: conv-in, dual SE gating with the lateral, concat, conv-out."""
    out_channels: int
    lateral_channels: int
    compression: int = 16
    interpolation: str = 'nearest'

    @nn.compact
    def __call__(self, x, lateral=None, train: bool = False):
        in_c = x.shape[-1]
        nd = x.ndim - 2
        x = ConvNormRelu(in_c, use_bias=False, name='in0')(x, train)
        x = ConvNormRelu(self.lateral_channels, kernel_size=1, padding=0, use_bias=False,
                         name='in1')(x, train)
        if lateral is not None:
            if x.shape[1:-1] != lateral.shape[1:-1]:
                x = resize_nearest(x, lateral.shape[1:-1]) if self.interpolation == 'nearest' \
                    else resize_bilinear(x, lateral.shape[1:-1])

            def se(y, name):
                c = y.shape[-1]
                s = jnp.mean(y, tuple(range(1, y.ndim - 1)), keepdims=True)
                s = nn.Conv(max(c // self.compression, 1), (1,) * nd, name=f'{name}_fc0')(s)
                s = jax.nn.relu(s)
                s = nn.Conv(c, (1,) * nd, name=f'{name}_fc1')(s)
                return jax.nn.sigmoid(s)

            a = se(x, 'se_high')
            b = se(lateral, 'se_low')
            x = x * (a + b)
            x = jnp.concatenate((x, lateral), -1)
        x = ConvNormRelu(self.out_channels, use_bias=False, name='out0')(x, train)
        return ConvNormRelu(self.out_channels, use_bias=False, name='out1')(x, train)


class MaNetDecoder(nn.Module):
    """PAB on the deepest level + MFAB top-down decoding."""
    in_channels_list: Sequence[int]
    out_channels_list: Optional[Sequence[int]] = None
    pab_channels: int = 64
    keep_features: bool = True

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray], size, train: bool = False):
        names = list(x.keys())
        feats = list(x.values())
        out_list = list(self.out_channels_list or self.in_channels_list)
        if self.pab_channels:
            feats[-1] = PositionWiseAttention(mid_channels=self.pab_channels,
                                              name='pab')(feats[-1], train)
        last_inner = feats[-1]
        results = [last_inner]
        for i in range(len(feats) - 2, -1, -1):
            last_inner = MultiscaleFusionAttention(
                out_channels=out_list[i], lateral_channels=feats[i].shape[-1],
                name=f'mfab{i}')(last_inner, feats[i], train)
            results.insert(0, last_inner)
        final = resize_bilinear(last_inner, size) if size is not None else last_inner
        out = {'out': final}
        for k, v in zip(names, results):
            out[k] = v
        if self.keep_features:
            for k, v in x.items():
                out[f'encoder.{k}'] = v
        return out


class MaNet(nn.Module):
    """Encoder + MA-Net decoder (parity: ``cd.models.MaNet``)."""
    body: Any
    pab_channels: int = 64
    out_channels: int = 0
    normalize: bool = True
    inputs_mean: Any = 0.
    inputs_std: Any = 1.

    @property
    def feature_channels(self):
        return list(self.body.out_channels)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs
        if self.normalize:
            x = Normalize(self.inputs_mean, self.inputs_std, name='normalize')(x)
        feats = self.body(x, train)
        return MaNetDecoder(in_channels_list=list(self.body.out_channels),
                            pab_channels=self.pab_channels,
                            name='decoder')(feats, size=inputs.shape[1:-1], train=train)


def _adapter_manet(adapter: str, model_name: str, in_channels: int,
                   pretrained: bool, backbone_kwargs: dict, **kwargs) -> MaNet:
    from .host_encoder import (HostEncoder, build_host_encoder,
                               resolve_native_encoder)
    bk = dict(backbone_kwargs or {})
    if not bk.pop('force_host', False):
        native = resolve_native_encoder(model_name, in_channels, backbone_kwargs=bk)
        if native is not None:
            return MaNet(body=native, **kwargs)
    enc, trainable = build_host_encoder(adapter, model_name, in_channels=in_channels,
                                        pretrained=pretrained, backbone_kwargs=bk)
    return MaNet(body=HostEncoder(enc, trainable=trainable), **kwargs)


def TimmMaNet(model_name: str, in_channels: int = 3, pretrained: bool = False,
              backbone_kwargs: dict = None, **kwargs) -> MaNet:
    """MA-Net over a timm encoder (parity: ``cd.models.TimmMaNet``,
    ``celldetection/models/manet.py``). Encoder names with a native flax
    implementation (``host_encoder.NATIVE_ENCODER_NAMES``) run as TPU compute;
    other names use the host-executed torch path, where
    ``backbone_kwargs['trainable']=True`` fine-tunes via host torch autograd."""
    return _adapter_manet('timm', model_name, in_channels, pretrained,
                          backbone_kwargs, **kwargs)


def SmpMaNet(model_name: str, in_channels: int = 3, pretrained: bool = False,
             backbone_kwargs: dict = None, **kwargs) -> MaNet:
    """MA-Net over an smp encoder (parity: ``cd.models.SmpMaNet``); same
    native-first resolution as :func:`TimmMaNet`."""
    return _adapter_manet('smp', model_name, in_channels, pretrained,
                          backbone_kwargs, **kwargs)
