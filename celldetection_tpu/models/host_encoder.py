"""Host-executed encoders inside jit graphs (timm / smp adapters).

Wraps a host-side feature extractor (``TimmEncoder`` / ``SmpEncoder``) as a
flax module via ``jax.pure_callback``: the backbone runs on CPU (torch), the
decoder/heads run on TPU. Intended for experimentation with encoders that
have no native flax implementation; production paths should use the native
encoders.

With ``trainable=True`` the torch module's parameters are registered as flax
params (so optax trains them like any other leaf) and gradients cross the
callback boundary through a ``jax.custom_vjp`` whose backward pass runs torch
autograd on the host — full fine-tuning of timm/smp encoders, as the
reference's Lightning training supports (``celldetection/models/timmodels.py:
94-229``). Torch buffers (BatchNorm running stats) stay frozen: the module is
kept in eval mode, which is the standard fine-tuning configuration and keeps
the function pure.

Note: host callbacks require a runtime with host send/recv support (standard
CPU/TPU runtimes have it; some remote PJRT relays do not).
"""
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ['HostEncoder', 'build_host_encoder', 'resolve_native_encoder',
           'NATIVE_ENCODER_NAMES']

# timm / smp encoder names with a native flax implementation in this package.
# Resolution happens in :func:`resolve_native_encoder`: these run as real TPU
# compute (XLA-compiled), not host callbacks — only names outside this table
# fall back to the torch host path. smp prefixes ('timm-', 'tu-') are
# stripped before lookup. Reference behavior: timm/smp encoders in
# ``celldetection/models/timmodels.py:94-229`` / ``smp.py:10-80``.
NATIVE_ENCODER_NAMES = {
    'resnet18': 'ResNet18', 'resnet34': 'ResNet34', 'resnet50': 'ResNet50',
    'resnet101': 'ResNet101', 'resnet152': 'ResNet152',
    'resnext50_32x4d': 'ResNeXt50', 'resnext101_32x8d': 'ResNeXt101',
    'wide_resnet50_2': 'WideResNet50', 'wide_resnet101_2': 'WideResNet101',
    'densenet121': 'DenseNet121', 'densenet161': 'DenseNet161',
    'densenet169': 'DenseNet169', 'densenet201': 'DenseNet201',
    'convnext_tiny': 'ConvNeXtTiny', 'convnext_small': 'ConvNeXtSmall',
    'convnext_base': 'ConvNeXtBase', 'convnext_large': 'ConvNeXtLarge',
    'convnextv2_tiny': 'ConvNeXtV2Tiny', 'convnextv2_base': 'ConvNeXtV2Base',
    'mobilenetv3_large_100': 'MobileNetV3Large',
    'mobilenetv3_small_100': 'MobileNetV3Small',
}


def normalize_encoder_name(model_name: str) -> str:
    """Strip smp's 'timm-'/'tu-' prefixes and lowercase for table lookup."""
    name = (model_name or '').lower()
    for prefix in ('timm-', 'tu-'):
        if name.startswith(prefix):
            name = name[len(prefix):]
    return name


def resolve_native_encoder(model_name: str, in_channels: int = 3,
                           backbone_kwargs: dict = None):
    """timm/smp encoder name → native flax encoder module, or ``None``.

    The returned module exposes ``out_channels`` / ``out_strides`` — the same
    interface as the host adapters — and runs natively on TPU. ``None`` means
    the architecture has no native implementation here (caller falls back to
    the host-callback path). Pass ``backbone_kwargs={'force_host': True}`` at
    the call sites to skip native resolution entirely.
    """
    native_name = NATIVE_ENCODER_NAMES.get(normalize_encoder_name(model_name))
    if native_name is None:
        return None
    from . import convnext, densenet, mobilenetv3, resnet
    for lib in (resnet, densenet, convnext, mobilenetv3):
        ctor = getattr(lib, native_name, None)
        if ctor is not None:
            bk = dict(backbone_kwargs or {})
            bk.pop('trainable', None)  # native modules are always trainable
            return ctor(in_channels, **bk)
    raise AssertionError(f'native table names unknown ctor {native_name!r}')


def build_host_encoder(adapter: str, model_name: str, in_channels: int = 3,
                       pretrained: bool = False, backbone_kwargs: dict = None):
    """Construct a timm/smp encoder + the popped ``trainable`` flag.

    Single home for the adapter dispatch shared by the CPN zoo and the
    standalone Timm/Smp MaNet constructors.

    Returns:
        ``(encoder, trainable)``.
    """
    bk = dict(backbone_kwargs or {})
    trainable = bk.pop('trainable', False)
    if adapter == 'timm':
        from .timmodels import TimmEncoder
        enc = TimmEncoder(model_name, in_channels=in_channels,
                          pretrained=pretrained, **bk)
    elif adapter == 'smp':
        from .smp import SmpEncoder
        enc = SmpEncoder(model_name, in_channels=in_channels,
                         weights='imagenet' if pretrained else None, **bk)
    else:
        raise ValueError(f'Unknown host adapter: {adapter!r}')
    return enc, trainable


def _to_torch_nchw(x_np):
    import torch
    return torch.from_numpy(np.asarray(x_np, np.float32)).permute(0, 3, 1, 2)


def _load_params(encoder, names, arrays):
    import torch
    # copy=True: jax hands out read-only views; load_state_dict copies anyway
    sd = {n: torch.from_numpy(np.array(a, np.float32, copy=True))
          for n, a in zip(names, arrays)}
    encoder.module.load_state_dict(sd, strict=False)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _host_apply(encoder, names, shapes, params, x):
    def cb(params_np, x_np):
        import torch
        _load_params(encoder, names, params_np)
        with torch.no_grad():
            feats = encoder.torch_features(_to_torch_nchw(x_np))
        return tuple(np.ascontiguousarray(f.permute(0, 2, 3, 1).numpy(), np.float32)
                     for f in feats)

    return jax.pure_callback(cb, shapes, params, x)


def _host_apply_fwd(encoder, names, shapes, params, x):
    return _host_apply(encoder, names, shapes, params, x), (params, x)


def _host_apply_bwd(encoder, names, shapes, res, cts):
    params, x = res
    out_shapes = (tuple(jax.ShapeDtypeStruct(np.shape(p), jnp.float32) for p in params),
                  jax.ShapeDtypeStruct(x.shape, jnp.float32))

    def cb(params_np, x_np, cts_np):
        import torch
        _load_params(encoder, names, params_np)
        ps = dict(encoder.module.named_parameters())
        ordered = [ps[n] for n in names]
        for p in ordered:
            p.requires_grad_(True)
        x_t = _to_torch_nchw(x_np)
        x_t.requires_grad_(True)
        feats = encoder.torch_features(x_t)
        loss = sum((f * torch.from_numpy(np.ascontiguousarray(c)).permute(0, 3, 1, 2)).sum()
                   for f, c in zip(feats, cts_np))
        grads = torch.autograd.grad(loss, ordered + [x_t], allow_unused=True)
        for p in ordered:
            p.requires_grad_(False)
        pgs = tuple(np.zeros(p.shape, np.float32) if g is None
                    else np.ascontiguousarray(g.numpy(), np.float32)
                    for g, p in zip(grads[:-1], ordered))
        xg = np.zeros(x_np.shape, np.float32) if grads[-1] is None else \
            np.ascontiguousarray(grads[-1].permute(0, 2, 3, 1).numpy(), np.float32)
        return pgs, xg

    return jax.pure_callback(cb, out_shapes, params, x, cts)


_host_apply.defvjp(_host_apply_fwd, _host_apply_bwd)


class HostEncoder(nn.Module):
    """Adapter: host callable with ``out_channels``/``out_strides`` → flax module.

    With ``trainable=False`` (default) the wrapped encoder has no registered
    parameters and gradients stop at the callback boundary. With
    ``trainable=True`` its torch parameters become flax params under this
    module's scope and receive gradients via host-side torch autograd.
    """
    encoder: Any
    trainable: bool = False

    @property
    def out_channels(self):
        return list(self.encoder.out_channels)

    @property
    def out_strides(self):
        return list(self.encoder.out_strides)

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, _ = x.shape
        shapes = tuple(
            jax.ShapeDtypeStruct((n, h // s, w // s, c), jnp.float32)
            for c, s in zip(self.encoder.out_channels, self.encoder.out_strides))

        if not self.trainable:
            def cb(x_np):
                feats = self.encoder(np.asarray(x_np))
                return tuple(np.asarray(feats[str(i)], np.float32)
                             for i in range(len(shapes)))

            outs = jax.pure_callback(cb, shapes, x)
            return {str(i): o for i, o in enumerate(outs)}

        items = list(self.encoder.module.named_parameters())
        names = tuple(nm for nm, _ in items)
        params = tuple(
            self.param(nm.replace('.', '__'),
                       (lambda a: lambda *_: jnp.asarray(a, jnp.float32))(
                           p.detach().cpu().numpy()))
            for nm, p in items)
        outs = _host_apply(self.encoder, names, shapes, params, x)
        return {str(i): o for i, o in enumerate(outs)}
