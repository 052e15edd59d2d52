"""Building blocks — flax.linen modules (NHWC).

Behavioral reference: ``celldetection/models/commons.py`` — ConvNorm (:68),
ConvNormRelu (:93), TwoConvNormRelu (:120), ScaledTanh/Sigmoid (:175-203),
ResBlock (:308), BottleneckBlock (:363), ReadOut (:461), Fuse (:640-682),
Normalize (:686), SqueezeExcitation (:711), SelfAttention (:736),
LayerNormNd (:787), DynamicTanh (:27).

Design notes (TPU):
    - Channels-last; convs map to XLA ``conv_general_dilated`` which the TPU
      compiler tiles onto the MXU.
    - BatchNorm uses running stats at inference (``train=False``); training
      updates live in the ``batch_stats`` collection (torch-compatible
      momentum/eps defaults for weight-import parity).
    - Dropout is deterministic-off at inference; pass an rng via linen's
      ``rngs={'dropout': key}`` when training.
"""
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    'get_activation', 'Norm', 'ConvNorm', 'ConvNormRelu', 'TwoConvNormRelu', 'TwoConvNormLeaky',
    'ScaledTanh', 'ScaledSigmoid', 'ResBlock', 'BottleneckBlock', 'ReadOut', 'Fuse', 'Normalize',
    'SqueezeExcitation', 'SelfAttention', 'LayerNorm2d', 'DynamicTanh', 'kaiming_uniform',
    'MinibatchStdLayer', 'SpatialSplit', 'AdditiveNoise', 'Stride', 'ReplayCache', 'GroupedConv',
    'norm_overrides', 'FusableReadOut', 'fused_head_conv',
]

# torch nn.BatchNorm2d defaults: momentum=0.1 (flax momentum = 1 - 0.1), eps=1e-5
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

# Trace-time layer overrides (``conf2tweaks_``). Torch tweaks submodules by
# setting attributes post-construction (``celldetection/util/schedule.py:108``,
# ``util.py:791``); flax modules are built inline during apply, so the
# equivalent hook is a context active while a model traces: ``Norm`` consults
# these overrides before its own fields. ``CPN.forward_padded``/``init`` wrap
# their ``core.apply`` in :func:`norm_overrides` with the model's tweaks.
# Thread-local so concurrent traces of differently-tweaked models cannot leak
# overrides into each other (ADVICE r4).
import threading

_NORM_TLS = threading.local()


def _current_norm_overrides() -> dict:
    return getattr(_NORM_TLS, 'overrides', {})


class norm_overrides:
    """Context manager installing per-trace norm overrides, e.g.
    ``{'batchnorm': {'momentum': 0.95, 'epsilon': 1e-3}}`` (flax momentum)."""

    def __init__(self, overrides: Optional[dict]):
        self.overrides = overrides or {}

    def __enter__(self):
        self._saved = _current_norm_overrides()
        merged = dict(self._saved)
        merged.update(self.overrides)
        _NORM_TLS.overrides = merged
        return self

    def __exit__(self, *exc):
        _NORM_TLS.overrides = self._saved
        return False


def kaiming_uniform(a: float = 1.0):
    """He/kaiming uniform with negative_slope ``a`` (fan_in), torch-compatible."""
    def init(key, shape, dtype=jnp.float32):
        # conv kernel HWIO: fan_in = prod(spatial) * in_channels
        fan_in = 1
        for d in shape[:-1]:
            fan_in *= d
        gain = (2.0 / (1 + a ** 2)) ** 0.5
        bound = gain * (3.0 / fan_in) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


_ACTIVATIONS = {
    'relu': jax.nn.relu,
    'leakyrelu': partial(jax.nn.leaky_relu, negative_slope=0.01),
    'gelu': jax.nn.gelu,
    'sigmoid': jax.nn.sigmoid,
    'tanh': jnp.tanh,
    'softmax': partial(jax.nn.softmax, axis=-1),
    'silu': jax.nn.silu,
    'swish': jax.nn.silu,
    'elu': jax.nn.elu,
    'selu': jax.nn.selu,
    'mish': lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    'hardswish': jax.nn.hard_swish,
    'hardsigmoid': jax.nn.hard_sigmoid,
    'identity': lambda x: x,
    'none': lambda x: x,
}


def get_activation(activation) -> Callable:
    """Resolve an activation by name/callable/None (``lookup_nn`` analogue)."""
    if activation is None:
        return _ACTIVATIONS['identity']
    if callable(activation):
        return activation
    key = str(activation).lower().replace('_', '').replace('2d', '')
    if key in _ACTIVATIONS:
        return _ACTIVATIONS[key]
    raise ValueError(f'Unknown activation: {activation}')


class Norm(nn.Module):
    """String-dispatched normalization layer ('batchnorm2d', 'layernorm2d',
    'groupnorm', 'instancenorm2d', None).

    ``epsilon``/``momentum`` override the batchnorm defaults (torchvision
    MobileNetV3 uses eps=1e-3, torch momentum 0.01 → flax momentum 0.99).
    """
    kind: Union[str, None] = 'batchnorm2d'
    num_groups: int = 32
    epsilon: Optional[float] = None
    momentum: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kind = None if self.kind is None else str(self.kind).lower().replace('_', '').replace('nd', '2d')
        if kind is None or kind in ('identity', 'none'):
            return x
        if kind.startswith('batchnorm'):
            # tweak overrides (conf2tweaks_) win over constructor fields, like
            # torch's attribute-setting tweak_module_ does
            ov = _current_norm_overrides().get('batchnorm', {})
            momentum = ov.get('momentum', self.momentum if self.momentum is not None
                              else BN_MOMENTUM)
            epsilon = ov.get('epsilon', self.epsilon if self.epsilon is not None
                             else BN_EPS)
            return nn.BatchNorm(use_running_average=not train,
                                momentum=momentum, epsilon=epsilon, name='norm')(x)
        if kind.startswith('layernorm'):
            return nn.LayerNorm(epsilon=1e-5, name='norm')(x)
        if kind.startswith('groupnorm'):
            return nn.GroupNorm(num_groups=min(self.num_groups, x.shape[-1]), name='norm')(x)
        if kind.startswith('instancenorm'):
            return nn.GroupNorm(num_groups=x.shape[-1], name='norm')(x)
        raise ValueError(f'Unknown norm: {self.kind}')


class GroupedConv(nn.Module):
    """Grouped conv with a measured TPU lowering choice (bias-free, same param
    layout as ``nn.Conv(feature_group_count=groups)``: ``kernel`` of shape
    ``(*k, in/groups, features)`` — checkpoints are interchangeable).

    XLA:TPU's native grouped conv collapses at small group widths on large
    spatial maps (ResNeXt stage1, 8-ch groups at 256^2: 17.1 ms vs 2.4 ms at
    batch 1 fp32 — measured on v5e). An exactly-equivalent dense conv with
    the grouped kernel scattered onto a block-diagonal (zeros elsewhere) is
    4.6-7x faster for group width <= 16 at every measured batch/precision,
    and 1.2x faster for width 32 at batch 1; native wins at width >= 32 for
    batch >= 4 and at width >= 64 everywhere. The choice is static per traced
    shape, so each jitted program gets its best lowering.
    """
    features: int
    kernel_size: Tuple[int, ...]
    groups: int
    strides: Optional[Tuple[int, ...]] = None
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        k = tuple(self.kernel_size)
        cg_in = x.shape[-1] // self.groups
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            k + (cg_in, self.features), jnp.float32)
        kernel = kernel.astype(x.dtype)
        strides = self.strides or (1,) * len(k)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * len(k)
        cg_out = self.features // self.groups
        dense = self.groups > 1 and (cg_in <= 16 or (cg_in <= 32 and x.shape[0] == 1))
        if dense:
            w = jnp.zeros(k + (x.shape[-1], self.features), kernel.dtype)
            for g in range(self.groups):
                w = w.at[..., g * cg_in:(g + 1) * cg_in,
                         g * cg_out:(g + 1) * cg_out].set(
                             kernel[..., g * cg_out:(g + 1) * cg_out])
            groups = 1
        else:
            w, groups = kernel, self.groups
        spatial = 'DHW'[-len(k):]  # 'HW' (2D) / 'DHW' (3D)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, (f'N{spatial}C', f'{spatial}IO', f'N{spatial}C'))
        return jax.lax.conv_general_dilated(x, w, strides, pad,
                                            dimension_numbers=dn,
                                            feature_group_count=groups)


class ConvNorm(nn.Module):
    """Convolution + normalization (nd-generic: rank inferred or set via ``nd``)."""
    out_channels: int
    kernel_size: int = 3
    padding: Optional[int] = None
    stride: int = 1
    norm_layer: Union[str, None] = 'batchnorm2d'
    use_bias: bool = True
    feature_group_count: int = 1
    nd: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2  # infer spatial rank from input (batch + channel)
        pad = self.kernel_size // 2 if self.padding is None else self.padding
        x = nn.Conv(self.out_channels, (self.kernel_size,) * nd, strides=(self.stride,) * nd,
                    padding=pad, use_bias=self.use_bias,
                    feature_group_count=self.feature_group_count, name='conv')(x)
        return Norm(self.norm_layer, name='norm')(x, train)


class ConvNormRelu(nn.Module):
    """Convolution + normalization + activation."""
    out_channels: int
    kernel_size: int = 3
    padding: Optional[int] = None
    stride: int = 1
    norm_layer: Union[str, None] = 'batchnorm2d'
    activation: Any = 'relu'
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNorm(self.out_channels, self.kernel_size, self.padding, self.stride,
                     self.norm_layer, self.use_bias, self.feature_group_count, name='block')(x, train)
        return get_activation(self.activation)(x)


class TwoConvNormRelu(nn.Module):
    """conv-norm-act ×2 (the U-Net workhorse block)."""
    out_channels: int
    kernel_size: int = 3
    padding: Optional[int] = None
    stride: int = 1
    mid_channels: Optional[int] = None
    norm_layer: Union[str, None] = 'batchnorm2d'
    activation: Any = 'relu'
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels if self.mid_channels is None else self.mid_channels
        act = get_activation(self.activation)
        x = ConvNorm(mid, self.kernel_size, self.padding, self.stride, self.norm_layer,
                     self.use_bias, name='block0')(x, train)
        x = act(x)
        x = ConvNorm(self.out_channels, self.kernel_size, self.padding, 1, self.norm_layer,
                     self.use_bias, name='block1')(x, train)
        return act(x)


class TwoConvNormLeaky(TwoConvNormRelu):
    activation: Any = 'leakyrelu'


class ScaledTanh(nn.Module):
    """``tanh(x) * factor + shift``."""
    factor: float
    shift: float = 0.

    def __call__(self, x):
        return jnp.tanh(x) * self.factor + self.shift


class ScaledSigmoid(nn.Module):
    """``sigmoid(x) * factor + shift``."""
    factor: float
    shift: float = 0.

    def __call__(self, x):
        return jax.nn.sigmoid(x) * self.factor + self.shift


class ResBlock(nn.Module):
    """Basic residual block with projection shortcut when shapes change."""
    out_channels: int
    kernel_size: int = 3
    padding: Optional[int] = None
    norm_layer: Union[str, None] = 'batchnorm2d'
    activation: Any = 'relu'
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        in_channels = x.shape[-1]
        if in_channels != self.out_channels or self.stride != 1:
            identity = ConvNorm(self.out_channels, 1, 0, self.stride, self.norm_layer,
                                use_bias=False, name='downsample')(x, train)
        else:
            identity = x
        out = ConvNorm(self.out_channels, self.kernel_size, self.padding, self.stride,
                       self.norm_layer, use_bias=False, name='block0')(x, train)
        out = act(out)
        out = ConvNorm(self.out_channels, self.kernel_size, self.padding, 1,
                       self.norm_layer, use_bias=False, name='block1')(out, train)
        return act(out + identity)


class BottleneckBlock(nn.Module):
    """1x1 → kxk → 1x1 bottleneck residual block."""
    out_channels: int
    kernel_size: int = 3
    padding: Optional[int] = None
    mid_channels: Optional[int] = None
    compression: int = 4
    base_channels: int = 64
    norm_layer: Union[str, None] = 'batchnorm2d'
    activation: Any = 'relu'
    stride: int = 1
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        in_channels = x.shape[-1]
        mid = self.mid_channels or max(self.base_channels, self.out_channels // self.compression,
                                       in_channels // self.compression)
        if in_channels != self.out_channels or self.stride != 1:
            identity = ConvNorm(self.out_channels, 1, 0, self.stride, self.norm_layer,
                                use_bias=False, name='downsample')(x, train)
        else:
            identity = x
        out = ConvNorm(mid, 1, 0, 1, self.norm_layer, use_bias=False, name='block0')(x, train)
        out = act(out)
        out = ConvNorm(mid, self.kernel_size, self.padding, self.stride, self.norm_layer,
                       use_bias=False, feature_group_count=self.feature_group_count,
                       name='block1')(out, train)
        out = act(out)
        out = ConvNorm(self.out_channels, 1, 0, 1, self.norm_layer, use_bias=False,
                       name='block2')(out, train)
        return act(out + identity)


class ReadOut(nn.Module):
    """Dense prediction head: conv-norm-act-dropout-1x1 (+ final activation).

    Parity: ``celldetection/models/commons.py:461-511``.
    """
    channels_out: int
    kernel_size: int = 3
    padding: Optional[int] = None
    activation: Any = 'relu'
    norm: Union[str, None] = 'batchnorm2d'
    final_activation: Any = None
    dropout: float = 0.1
    channels_mid: Optional[int] = None
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        mid = x.shape[-1] if self.channels_mid is None else self.channels_mid
        x = nn.Conv(mid, (self.kernel_size,) * nd, strides=(self.stride,) * nd,
                    padding=self.kernel_size // 2 if self.padding is None else self.padding,
                    name='conv0')(x)
        x = Norm(self.norm, name='norm')(x, train)
        x = get_activation(self.activation)(x)
        if self.dropout:
            # spatial (whole-channel) dropout — parity with the reference's
            # nn.Dropout2d; broadcast over the spatial dims
            x = nn.Dropout(self.dropout, deterministic=not train,
                           broadcast_dims=tuple(range(1, x.ndim - 1)),
                           name='dropout')(x)
        x = nn.Conv(self.channels_out, (1,) * nd, name='conv1')(x)
        if self.final_activation is None:
            return x
        fa = self.final_activation
        if isinstance(fa, nn.Module):
            return fa(x)
        return get_activation(fa)(x)


class _Conv0Weights(nn.Module):
    """Param-layout stand-in for ``ReadOut``'s first conv (child name
    ``conv0``): declares the exact ``nn.Conv`` kernel/bias params (same
    shapes, same default inits, same path → same init draw) and returns them
    instead of computing, so sibling heads can fuse their convs."""
    features: Optional[int]
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        in_c = x.shape[-1]
        out_c = self.features or in_c
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (self.kernel_size,) * nd + (in_c, out_c))
        bias = self.param('bias', nn.initializers.zeros, (out_c,))
        return kernel, bias


def fused_head_conv(x, kernels, biases, stride: int, padding: int):
    """One conv over the concatenated output channels of several same-geometry
    head convs reading the same input.

    TPU rationale: CPN's score/location/fourier heads each run a KxK conv with
    ~64 output channels on the SAME full-resolution map. 64 output channels
    underfill the 128-lane MXU tiling and each conv pays its own weight-load
    and map re-read from HBM; concatenating the kernels runs ONE conv with
    192-256 output channels — full tiles, one pass over the (bandwidth-bound)
    input map. FLOPs are identical; utilization is not.
    """
    from flax.linen import dtypes as _dtypes
    nd = x.ndim - 2
    kernel = kernels[0] if len(kernels) == 1 else jnp.concatenate(kernels, axis=-1)
    bias = biases[0] if len(biases) == 1 else jnp.concatenate(biases, axis=-1)
    x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias, dtype=None)
    spec = {1: ('NWC', 'WIO', 'NWC'), 2: ('NHWC', 'HWIO', 'NHWC'),
            3: ('NDHWC', 'DHWIO', 'NDHWC')}[nd]
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, spec)
    y = jax.lax.conv_general_dilated(x, kernel, window_strides=(stride,) * nd,
                                     padding=((padding, padding),) * nd,
                                     dimension_numbers=dn)
    return y + bias


class FusableReadOut(nn.Module):
    """``ReadOut`` with its first conv exposed for cross-head fusion.

    Identical param tree to :class:`ReadOut` (children ``conv0``, ``norm``,
    ``dropout``, ``conv1``) so checkpoints, torch transport and init are
    unaffected — only the compute path differs. Protocol: call once with
    ``mode='weights'`` to create + fetch the conv0 kernel/bias, fuse the
    sibling heads' convs via :func:`fused_head_conv`, then call again with
    ``mode='tail'`` handing each head its channel slice. Calling with the
    default mode reproduces plain ``ReadOut`` behavior.
    """
    channels_out: int
    kernel_size: int = 3
    padding: Optional[int] = None
    activation: Any = 'relu'
    norm: Union[str, None] = 'batchnorm2d'
    final_activation: Any = None
    dropout: float = 0.1
    channels_mid: Optional[int] = None
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, mode: str = 'full', mid=None):
        nd = x.ndim - 2
        kernel, bias = _Conv0Weights(self.channels_mid, self.kernel_size,
                                     name='conv0')(x)
        if mode == 'weights':
            return kernel, bias
        if mid is None:
            pad = self.kernel_size // 2 if self.padding is None else self.padding
            mid = fused_head_conv(x, [kernel], [bias], self.stride, pad)
        y = Norm(self.norm, name='norm')(mid, train)
        y = get_activation(self.activation)(y)
        if self.dropout:
            y = nn.Dropout(self.dropout, deterministic=not train,
                           broadcast_dims=tuple(range(1, y.ndim - 1)),
                           name='dropout')(y)
        y = nn.Conv(self.channels_out, (1,) * nd, name='conv1')(y)
        if self.final_activation is None:
            return y
        fa = self.final_activation
        if isinstance(fa, nn.Module):
            return fa(y)
        return get_activation(fa)(y)


class Fuse(nn.Module):
    """Resize-to-first + concat + conv-norm-act feature fusion.

    Parity: ``celldetection/models/commons.py:640-682`` (Fuse2d).
    """
    out_channels: int
    kernel_size: int = 1
    padding: int = 0
    activation: Any = 'relu'
    norm_layer: Union[str, None] = 'batchnorm2d'

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        from ..ops.commons import resize_nearest
        xs = tuple(xs)
        target = xs[0].shape[1:3]
        xs = [x if x.shape[1:3] == target else resize_nearest(x, target) for x in xs]
        x = jnp.concatenate(xs, -1)
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 2, padding=self.padding, name='conv')(x)
        x = Norm(self.norm_layer, name='norm')(x, train)
        return get_activation(self.activation)(x)


Fuse2d = Fuse


class Normalize(nn.Module):
    """Input normalization: ``(x - mean) / std`` with optional range check.

    Range violations are clamped silently under jit (the reference asserts;
    asserts are host-side only there).
    """
    mean: Any = 0.
    std: Any = 1.
    assert_range: Optional[Tuple[float, float]] = (0., 1.)

    def __call__(self, x):
        if self.assert_range is not None:
            # clamp to the expected input range (the reference asserts on
            # host; under jit we clamp, which also catches un-normalized
            # 0-255 inputs instead of silently producing garbage)
            lo, hi = self.assert_range
            x = jnp.clip(x, lo, hi)
        mean = jnp.asarray(self.mean, x.dtype)
        std = jnp.asarray(self.std, x.dtype)
        return (x - mean) / std


class SqueezeExcitation(nn.Module):
    """Squeeze-and-excitation with optional residual add."""
    squeeze_channels: Optional[int] = None
    compression: int = 16
    activation: Any = 'relu'
    scale_activation: Any = 'sigmoid'
    residual: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        sq = self.squeeze_channels or max(c // self.compression, 1)
        scale = jnp.mean(x, (1, 2), keepdims=True)
        scale = nn.Conv(sq, (1, 1), name='fc0')(scale)
        scale = get_activation(self.activation)(scale)
        scale = nn.Conv(c, (1, 1), name='fc1')(scale)
        scale = get_activation(self.scale_activation)(scale)
        scaled = x * scale
        return x + scaled if self.residual else scaled


class SelfAttention(nn.Module):
    """SAGAN-style self-attention over flattened spatial positions."""
    out_channels: Optional[int] = None
    mid_channels: Optional[int] = None
    beta: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        c_out = self.out_channels or c_in
        c_mid = self.mid_channels or c_in // 8
        if c_in != c_out:
            x = nn.Conv(c_out, (3, 3), padding=1, name='in_conv')(x)
        n, h, w, c = x.shape
        a = nn.Conv(c_mid, (1, 1), name='proj_a')(x).reshape(n, h * w, c_mid)
        b = nn.Conv(c_mid, (1, 1), name='proj_b')(x).reshape(n, h * w, c_mid)
        p = jnp.einsum('nic,njc->nij', a, b)
        p = jax.nn.softmax(p, axis=1)
        cmap = nn.Conv(c_out, (1, 1), name='proj')(x).reshape(n, h * w, c_out)
        out = jnp.einsum('nij,nic->njc', p, cmap).reshape(n, h, w, c_out)
        beta = self.param('beta', nn.initializers.zeros, (1,)) if self.beta else 1.
        return nn.Conv(c_out, (1, 1), name='out_conv')(beta * out + x)


class LayerNorm2d(nn.Module):
    """Channel LayerNorm on NHWC (native layout — no permutes needed)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.LayerNorm(epsilon=self.epsilon, name='ln')(x)


class ReplayCache:
    """Experience-replay cache for GAN training (reference commons.py:207).

    Host-side container of detached batch items; ``add`` stores a fraction of
    a batch, calling the cache samples a batch back.
    """

    def __init__(self, size: int = 128, rng: 'np.random.RandomState' = None):
        import numpy as np
        self.cache = []
        self.size = size
        self.rng = rng or np.random

    def __len__(self):
        return len(self.cache)

    def is_empty(self):
        return len(self) <= 0

    def add(self, x, fraction: float = .5):
        import numpy as np
        x = np.asarray(x)
        n = len(x)
        for i in self.rng.choice(np.arange(n), int(n * fraction), replace=False):
            self.cache.append(np.array(x[i]))
        while len(self) > self.size:
            del self.cache[self.rng.randint(0, len(self))]

    def __call__(self, num: int):
        import numpy as np
        if self.is_empty():
            return None
        idx = self.rng.randint(0, len(self), num)
        return jnp.asarray(np.stack([self.cache[i] for i in idx], 0))


class MinibatchStdLayer(nn.Module):
    """Minibatch std-dev feature channel (ProGAN; ops parity commons.py:123)."""
    channels: int = 1
    group_channels: Optional[int] = None
    epsilon: float = 1e-8

    def __call__(self, x, train: bool = False):
        from ..ops.commons import minibatch_std_layer
        return minibatch_std_layer(x, self.channels, self.group_channels, self.epsilon)


class SpatialSplit(nn.Module):
    """Fold spatial patches into the batch dim (reference commons.py:515)."""
    height: int
    width: Optional[int] = None

    def __call__(self, x, train: bool = False):
        from ..ops.commons import split_spatially
        return split_spatially(x, (self.height, self.width or self.height))


class AdditiveNoise(nn.Module):
    """Add (optionally learned-weighted) Gaussian noise (reference commons.py:564)."""
    noise_channels: int = 1
    mean: float = 0.
    std: float = 1.
    weighted: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        if not train:
            return x
        rng = self.make_rng('noise')
        shape = x.shape[:-1] + (self.noise_channels,)
        noise = jax.random.normal(rng, shape) * self.std + self.mean
        noise = jnp.repeat(noise, c // self.noise_channels, -1)
        w = self.param('weight', nn.initializers.zeros, (c,)) if self.weighted else 1.
        return x + noise * w


class Stride(nn.Module):
    """Strided subsampling view (reference commons.py:612)."""
    stride: int
    start: int = 0

    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        sl = (slice(None),) + (slice(self.start, None, self.stride),) * nd
        return x[sl]


class DynamicTanh(nn.Module):
    """DyT normalization replacement (arXiv 2503.10622)."""
    alpha_init_value: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        alpha = self.param('alpha', nn.initializers.constant(self.alpha_init_value), (1,))
        weight = self.param('weight', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        return jnp.tanh(alpha * x) * weight + bias
