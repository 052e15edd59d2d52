"""Minimal inference wrapper.

Behavioral reference: ``celldetection/models/inference.py:7-26`` (eval-mode
callable with autocast). The JAX analogue pins a compute dtype and wraps the
jitted padded forward.
"""
from typing import Optional

import jax.numpy as jnp

__all__ = ['Inference']


class Inference:
    """Callable inference wrapper with optional low-precision compute.

    Examples:
        >>> infer = Inference(model, amp=True)       # bf16 backbone
        >>> detections = infer(images)
    """

    def __init__(self, model, amp: bool = False, transform=None):
        self.model = model
        if amp:
            model.compute_dtype = jnp.bfloat16
            model._jit_cache.clear()
        self.transform = transform

    def __call__(self, inputs, **kwargs):
        if self.transform is not None:
            inputs = self.transform(inputs)
        return self.model(inputs, **kwargs)
