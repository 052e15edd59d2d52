"""segmentation-models-pytorch encoder adapter (optional dependency).

Behavioral reference: ``celldetection/models/smp.py:10-80`` (``SmpEncoder``
wrapping ``smp.encoders.get_encoder``). Same host-side execution caveats as
:class:`celldetection_tpu.models.timmodels.TimmEncoder`.
"""
from typing import Optional

import numpy as np

__all__ = ['SmpEncoder']


class SmpEncoder:
    """Host-side smp encoder with the framework's encoder interface."""

    def __init__(self, model_name: str, in_channels: int = 3, weights: Optional[str] = None,
                 depth: int = 5, **kwargs):
        try:
            import segmentation_models_pytorch as smp
            import torch
        except ImportError as e:
            raise ImportError(
                'SmpEncoder requires the optional `segmentation-models-pytorch` + '
                '`torch` packages. For TPU execution use the native encoders.') from e
        self._torch = torch
        self.module = smp.encoders.get_encoder(model_name, in_channels=in_channels,
                                               weights=weights, depth=depth, **kwargs)
        self.module.eval()
        # skip the identity/input feature levels like the reference does
        self.out_channels = list(self.module.out_channels)[1:]
        self.out_strides = [2 ** i for i in range(1, len(self.out_channels) + 1)]
        self.pretrained_cfg = {}

    def torch_features(self, x_t):
        """NCHW torch tensor → list of NCHW feature tensors (autograd-capable)."""
        return self.module(x_t)[1:]

    def __call__(self, x, train: bool = False):
        import jax.numpy as jnp
        torch = self._torch
        x_t = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        with torch.no_grad():
            feats = self.torch_features(x_t)
        return {str(i): jnp.asarray(f.permute(0, 2, 3, 1).numpy()) for i, f in enumerate(feats)}
