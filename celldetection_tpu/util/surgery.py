"""Parameter-tree surgery: freeze/replace/EMA over flax param pytrees.

Behavioral reference: ``celldetection/util/util.py`` — ``tweak_module_``
(:791), ``replace_module_`` (:843), ``freeze_``/``unfreeze_`` (:1706-1788),
``exponential_moving_average_`` (:1520). Torch mutates modules in place; the
JAX equivalents are pure pytree transforms + optax masking.
"""
import re
from typing import Callable, Dict

import jax
import numpy as np

__all__ = ['iter_params', 'match_paths', 'map_params', 'replace_params', 'freeze_mask',
           'frozen_optimizer', 'ema_update', 'count_params', 'spectral_normalize',
           'weight_normalize', 'spectral_norm_', 'weight_norm_',
           'exponential_moving_average_']


def _flat(tree):
    from flax.traverse_util import flatten_dict
    return flatten_dict(tree)


def _unflat(flat):
    from flax.traverse_util import unflatten_dict
    return unflatten_dict(flat)


def iter_params(params, pattern: str = '.*'):
    """Yield ``(path_str, array)`` for parameters whose path matches ``pattern``."""
    rx = re.compile(pattern)
    for path, v in _flat(params).items():
        s = '/'.join(path)
        if rx.search(s):
            yield s, v


def match_paths(params, pattern: str):
    """Set of '/'-joined paths matching a regex."""
    return {s for s, _ in iter_params(params, pattern)}


def map_params(params, fn: Callable, pattern: str = '.*'):
    """Apply ``fn(path_str, array)`` to matching leaves, return new tree."""
    rx = re.compile(pattern)
    flat = dict(_flat(params))
    for path in list(flat):
        s = '/'.join(path)
        if rx.search(s):
            flat[path] = fn(s, flat[path])
    return _unflat(flat)


def replace_params(params, replacements: Dict[str, 'np.ndarray']):
    """Replace leaves by '/'-joined path (strict: unknown paths raise)."""
    flat = dict(_flat(params))
    by_str = {'/'.join(p): p for p in flat}
    for s, v in replacements.items():
        if s not in by_str:
            raise KeyError(f'No parameter at path: {s}')
        tgt = flat[by_str[s]]
        if tuple(tgt.shape) != tuple(np.shape(v)):
            raise ValueError(f'Shape mismatch at {s}: {np.shape(v)} vs {tgt.shape}')
        flat[by_str[s]] = jax.numpy.asarray(v, tgt.dtype)
    return _unflat(flat)


def freeze_mask(params, pattern: str, frozen: bool = True):
    """Bool pytree: True where trainable. ``pattern`` marks frozen (or
    trainable when ``frozen=False``) subtrees — the optax-mask analogue of
    ``freeze_``/``unfreeze_``."""
    rx = re.compile(pattern)
    flat = _flat(params)
    mask = {p: (not rx.search('/'.join(p))) if frozen else bool(rx.search('/'.join(p)))
            for p in flat}
    return _unflat(mask)


def frozen_optimizer(tx, params, pattern: str):
    """Wrap an optax optimizer so parameters matching ``pattern`` stay fixed.

    Frozen leaves get zero updates (optax.masked alone would pass raw
    gradients through on unmasked leaves).
    """
    import optax
    trainable = freeze_mask(params, pattern, frozen=True)
    frozen = jax.tree_util.tree_map(lambda t: not t, trainable)
    return optax.chain(optax.masked(tx, trainable),
                       optax.masked(optax.set_to_zero(), frozen))


def spectral_normalize(params, pattern: str = r'kernel$', iterations: int = 20,
                       eps: float = 1e-12):
    """Divide matching kernels by their largest singular value.

    The functional analogue of applying torch spectral norm to module weights
    (``celldetection/util/util.py:922``): power iteration estimates sigma_max
    of each kernel (reshaped to 2d) and the kernel is scaled to unit spectral
    norm. Returns a new tree.
    """
    import jax.numpy as jnp

    def norm_one(s, v):
        w = jnp.reshape(v, (-1, v.shape[-1]))
        u = jnp.ones((w.shape[0],), v.dtype) / (w.shape[0] ** 0.5)
        for _ in range(iterations):
            vv = w.T @ u
            vv = vv / (jnp.linalg.norm(vv) + eps)
            u = w @ vv
            u = u / (jnp.linalg.norm(u) + eps)
        sigma = u @ (w @ vv)
        return v / (sigma + eps)

    return map_params(params, norm_one, pattern)


def weight_normalize(params, pattern: str = r'kernel$', eps: float = 1e-12):
    """Normalize matching kernels to unit L2 norm per output channel
    (the direction component of torch weight norm, ``util.py:954``)."""
    import jax.numpy as jnp

    def norm_one(s, v):
        flat = jnp.reshape(v, (-1, v.shape[-1]))
        n = jnp.linalg.norm(flat, axis=0)
        return v / (n + eps)

    return map_params(params, norm_one, pattern)


def ema_update(ema_params, new_params, decay: float = 0.999):
    """Exponential moving average of parameters (pytree-wise)."""
    return jax.tree_util.tree_map(lambda e, p: decay * e + (1. - decay) * p,
                                  ema_params, new_params)


def count_params(params) -> int:
    return sum(int(np.prod(np.shape(v))) for v in jax.tree_util.tree_leaves(params))


# Reference spellings (celldetection/util/util.py) for the param transforms.
spectral_norm_ = spectral_normalize
weight_norm_ = weight_normalize
exponential_moving_average_ = ema_update
