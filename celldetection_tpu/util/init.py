"""Reference-matching parameter initialization.

The torch reference trains from torch's default init distributions, which
differ from flax's defaults (lecun_normal kernels, zero biases). For training
parity the CPN re-samples its freshly-initialized parameters to match the
reference's scheme per subtree:

- torch conv/linear default (encoder stems, ResNet/ResNeXt bodies, CPN heads):
  ``kaiming_uniform_(a=sqrt(5))`` == ``U(+-1/sqrt(fan_in))`` kernels and
  ``U(+-1/sqrt(fan_in))`` biases (no custom init in the reference's
  ``celldetection/models/resnet.py`` / ``commons.py`` -> torch defaults).
- UNet / FPN decoders: ``kaiming_uniform_(a=1)`` == ``U(+-sqrt(3/fan_in))``
  kernels, zero biases (``celldetection/models/unet.py:171-176``,
  ``fpn.py:125-129``).
- ConvNeXt(V2) bodies: ``trunc_normal_(std=.02)`` kernels, zero biases
  (``celldetection/models/convnext.py:209-213``, ``convnextv2.py:24-28``).
- DenseNet bodies: ``kaiming_normal_`` (fan_in, relu) kernels
  (``celldetection/models/densenet.py:254-262``).
- MobileNetV3 bodies: ``kaiming_normal_(mode='fan_out')`` kernels, zero
  biases (``celldetection/models/mobilenetv3.py:14-25``).

Norm parameters (scale=1, bias=0) already match and are left untouched.
"""
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['torch_init_variables', 'detect_encoder_family']


def _fan_in(kernel_shape: Sequence[int]) -> int:
    """torch fan_in: in_features * prod(kernel spatial). Flax conv kernels are
    ``(*spatial, in_c_per_group, out_c)`` and dense kernels ``(in, out)`` —
    both give ``prod(shape[:-1])``."""
    n = 1
    for s in kernel_shape[:-1]:
        n *= int(s)
    return max(n, 1)


def _fan_out(kernel_shape: Sequence[int]) -> int:
    """torch fan_out for convs: out_features * prod(kernel spatial)."""
    n = int(kernel_shape[-1])
    for s in kernel_shape[:-2]:
        n *= int(s)
    return max(n, 1)


def _scheme_torch_conv(rng, kernel, bias):
    bound = 1.0 / np.sqrt(_fan_in(kernel.shape))
    k1, k2 = jax.random.split(rng)
    new_kernel = jax.random.uniform(k1, kernel.shape, kernel.dtype, -bound, bound)
    new_bias = None
    if bias is not None:
        new_bias = jax.random.uniform(k2, bias.shape, bias.dtype, -bound, bound)
    return new_kernel, new_bias


def _scheme_kaiming_uniform_a1(rng, kernel, bias):
    bound = np.sqrt(3.0 / _fan_in(kernel.shape))
    new_kernel = jax.random.uniform(rng, kernel.shape, kernel.dtype, -bound, bound)
    return new_kernel, (None if bias is None else jnp.zeros_like(bias))


def _scheme_trunc_normal_02(rng, kernel, bias):
    new_kernel = 0.02 * jax.random.truncated_normal(rng, -2.0, 2.0, kernel.shape,
                                                    kernel.dtype)
    return new_kernel, (None if bias is None else jnp.zeros_like(bias))


def _scheme_kaiming_normal_fan_in(rng, kernel, bias):
    std = np.sqrt(2.0 / _fan_in(kernel.shape))
    new_kernel = std * jax.random.normal(rng, kernel.shape, kernel.dtype)
    return new_kernel, (None if bias is None else jnp.zeros_like(bias))


def _scheme_kaiming_normal_fan_out(rng, kernel, bias):
    std = np.sqrt(2.0 / _fan_out(kernel.shape))
    std_kernel = std * jax.random.normal(rng, kernel.shape, kernel.dtype)
    return std_kernel, (None if bias is None else jnp.zeros_like(bias))


SCHEMES: Dict[str, Callable] = {
    'torch_conv': _scheme_torch_conv,
    'kaiming_uniform_a1': _scheme_kaiming_uniform_a1,
    'trunc_normal_02': _scheme_trunc_normal_02,
    'kaiming_normal_fan_in': _scheme_kaiming_normal_fan_in,
    'kaiming_normal_fan_out': _scheme_kaiming_normal_fan_out,
}

# encoder family -> scheme for the encoder ('body') subtree
FAMILY_SCHEMES = {
    'resnet': 'torch_conv',        # reference resnet.py: torch defaults
    'unet_encoder': 'torch_conv',  # UNetEncoder: torch defaults
    'convnext': 'trunc_normal_02',
    'densenet': 'kaiming_normal_fan_in',
    'mobilenetv3': 'kaiming_normal_fan_out',
}


def detect_encoder_family(backbone) -> Optional[str]:
    """Best-effort encoder family from the backbone's ``body`` module class."""
    body = getattr(backbone, 'body', None)
    probe = body if body is not None else backbone
    name = (type(probe).__name__ + ' ' + type(probe).__module__).lower()
    for fam in ('convnext', 'densenet', 'mobilenetv3'):
        if fam in name:
            return fam
    if 'resnet' in name or 'resnext' in name:
        return 'resnet'
    if 'unetencoder' in name:
        return 'unet_encoder'
    return None


def _resolve_scheme(path: Tuple[str, ...], encoder_family: Optional[str]) -> str:
    parts = [p.lower() for p in path]
    # decoder subtrees (GeneralizedUNet / FeaturePyramidNetwork): the
    # reference re-inits every conv inside with kaiming_uniform(a=1) + zero
    # bias, regardless of encoder family
    if 'unet' in parts or 'fpn' in parts:
        return 'kaiming_uniform_a1'
    if 'body' in parts and encoder_family is not None:
        return FAMILY_SCHEMES.get(encoder_family, 'torch_conv')
    return 'torch_conv'


def torch_init_variables(variables, rng, encoder_family: Optional[str] = None,
                         scheme_resolver: Optional[Callable] = None):
    """Re-sample ``variables['params']`` to torch/reference init distributions.

    Walks the param tree; every dict holding a ``kernel`` (conv / dense) is
    re-drawn according to its path. Norm scales/biases and other leaves are
    left unchanged. Deterministic per path (rng folded with a path hash), so
    two models of equal structure initialize identically given equal seeds.
    """
    resolver = scheme_resolver or (lambda p: _resolve_scheme(p, encoder_family))

    def walk(tree, path):
        if not isinstance(tree, dict):
            return tree
        out = dict(tree)
        if 'kernel' in tree and hasattr(tree['kernel'], 'shape') \
                and getattr(tree['kernel'], 'ndim', 0) >= 2:
            scheme = SCHEMES[resolver(path)]
            # crc32, NOT hash(): Python string hashing is salted per process
            # (PYTHONHASHSEED), which made "same seed" inits differ across
            # processes/runs — fatal for multi-host training, where every
            # process must materialize bit-identical replicated params
            import zlib
            leaf_rng = jax.random.fold_in(
                rng, int(np.uint32(zlib.crc32('/'.join(path).encode()) & 0x7FFFFFFF)))
            bias = tree.get('bias')
            new_kernel, new_bias = scheme(leaf_rng, tree['kernel'], bias)
            out['kernel'] = new_kernel
            if bias is not None and new_bias is not None:
                out['bias'] = new_bias
            # re-init only the conv/dense pair; nested submodules (rare) still walk
            for k, v in tree.items():
                if k not in ('kernel', 'bias'):
                    out[k] = walk(v, path + (k,))
            return out
        for k, v in tree.items():
            out[k] = walk(v, path + (k,))
        return out

    from flax.core import freeze, unfreeze
    frozen = hasattr(variables, 'unfreeze')
    tree = unfreeze(variables) if frozen else dict(variables)
    params = tree.get('params')
    if params is not None:
        tree['params'] = walk(unfreeze(params) if hasattr(params, 'unfreeze')
                              else params, ())
    return freeze(tree) if frozen else tree
