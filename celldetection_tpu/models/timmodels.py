"""Timm encoder adapter (optional dependency).

Behavioral reference: ``celldetection/models/timmodels.py:94-229``
(``TimmEncoder`` wrapping ``timm.create_model(features_only=True)``).

JAX cannot execute torch modules; this adapter covers two cases:
  1. ``timm`` + ``torch`` available → wraps the torch feature extractor and
     runs it host-side (CPU), returning features as jnp arrays. Intended for
     experimentation, not the TPU fast path.
  2. Weight transport: torch timm checkpoints for architectures that exist
     natively here (ResNet/ConvNeXt families) should be imported via
     ``celldetection_tpu.util.torch_import`` instead.
"""
from typing import Optional, Sequence

import numpy as np

__all__ = ['TimmEncoder', 'get_timm_names']


def get_timm_names(filter: str = ''):
    """List available timm model names (requires timm)."""
    import timm
    return timm.list_models(f'*{filter}*') if filter else timm.list_models()


class TimmEncoder:
    """Host-side timm feature extractor with the encoder interface
    (``out_channels`` / ``out_strides`` / callable returning a feature dict).

    Note:
        Runs on CPU via torch; prefer the native flax encoders for TPU
        execution. Raises ImportError with guidance when timm is missing.
    """

    def __init__(self, model_name: str, in_channels: int = 3, pretrained: bool = False,
                 out_indices: Optional[Sequence[int]] = None, **kwargs):
        try:
            import timm
            import torch
        except ImportError as e:
            raise ImportError(
                'TimmEncoder requires the optional `timm` + `torch` packages. '
                'For TPU execution use the native encoders (cdt.models.ResNet*, '
                'ConvNeXt*, ...) and import timm weights via '
                'cdt.util.torch_import.') from e
        self._torch = torch
        self.module = timm.create_model(model_name, features_only=True,
                                        in_chans=in_channels, pretrained=pretrained,
                                        out_indices=out_indices, **kwargs)
        self.module.eval()
        self.out_channels = list(self.module.feature_info.channels())
        self.out_strides = list(self.module.feature_info.reduction())
        self.pretrained_cfg = getattr(self.module, 'pretrained_cfg', {})

    def torch_features(self, x_t):
        """NCHW torch tensor → list of NCHW feature tensors (autograd-capable)."""
        return self.module(x_t)

    def __call__(self, x, train: bool = False):
        import jax.numpy as jnp
        torch = self._torch
        x_t = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)  # NHWC -> NCHW
        with torch.no_grad():
            feats = self.torch_features(x_t)
        return {str(i): jnp.asarray(f.permute(0, 2, 3, 1).numpy()) for i, f in enumerate(feats)}
