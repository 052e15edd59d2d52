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

__all__ = ['HostEncoder', 'build_host_encoder']


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
