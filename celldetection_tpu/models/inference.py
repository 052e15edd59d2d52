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
        self.amp = amp
        self.transform = transform

    def __call__(self, inputs, **kwargs):
        if self.transform is not None:
            inputs = self.transform(inputs)
        # scope low precision to this call (a permanent mutation would leak
        # bf16 into every other user of the shared model); the model's jit
        # cache is keyed by compute_dtype so toggling reuses compiled programs
        want = jnp.bfloat16 if self.amp else None
        prev = self.model.compute_dtype
        self.model.compute_dtype = want
        try:
            return self.model(inputs, **kwargs)
        finally:
            self.model.compute_dtype = prev
