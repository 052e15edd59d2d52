"""ImageNet-pretrained encoder initialization (torchvision-layout weights).

Behavioral reference: the reference's pretrained pipeline — URL table
``celldetection/models/resnet.py:15-25``, layout remap + first-conv channel
adaptation ``celldetection/models/resnet.py:236-262`` and
``resolve_pretrained`` (``celldetection/util/util.py``). Here the torchvision
state dict is translated directly into the flax variables tree of
:class:`..models.resnet.ResNetEncoder` (the key renaming the reference needs
for its Sequential layout does not apply — our tree is addressed by named
modules).

Offline behavior: ``pretrained=True`` needs the torchvision weight file; pass
a local path (or pre-populate the torch-hub cache) in air-gapped setups.
"""
import os
import re
from typing import Dict, Tuple

import numpy as np

__all__ = ['DEFAULT_MODEL_URLS', 'adapt_first_conv', 'translate_torchvision_resnet',
           'translate_torchvision_densenet', 'translate_torchvision_convnext',
           'resolve_pretrained_state', 'resolve_pretrained', 'apply_pretrained_']

# torchvision ImageNet checkpoints (same table as the reference,
# celldetection/models/resnet.py:15-25 — public download.pytorch.org URLs).
DEFAULT_MODEL_URLS = {
    'ResNet18': 'https://download.pytorch.org/models/resnet18-f37072fd.pth',
    'ResNet34': 'https://download.pytorch.org/models/resnet34-b627a593.pth',
    'ResNet50': 'https://download.pytorch.org/models/resnet50-11ad3fa6.pth',
    'ResNet101': 'https://download.pytorch.org/models/resnet101-cd907fc2.pth',
    'ResNet152': 'https://download.pytorch.org/models/resnet152-f82ba261.pth',
    'ResNeXt50': 'https://download.pytorch.org/models/resnext50_32x4d-1a0047aa.pth',
    'ResNeXt101': 'https://download.pytorch.org/models/resnext101_32x8d-8ba56ff5.pth',
    'WideResNet50': 'https://download.pytorch.org/models/wide_resnet50_2-9ba9bcbe.pth',
    'WideResNet101': 'https://download.pytorch.org/models/wide_resnet101_2-d733dc28.pth',
}


def adapt_first_conv(kernel_oihw: np.ndarray, in_channels: int) -> np.ndarray:
    """Resample a first-conv kernel's input-channel dim to ``in_channels``.

    Mirrors the reference's ``F.interpolate(..., mode='nearest')`` over the
    (channels, kh, kw) volume (``celldetection/models/resnet.py:253-254``):
    channel ``i`` of the result is source channel ``floor(i * C_src / C_dst)``.
    """
    src = kernel_oihw.shape[1]
    if src == in_channels:
        return kernel_oihw
    idx = np.floor(np.arange(in_channels) * src / in_channels).astype(int)
    return kernel_oihw[:, idx]


def translate_torchvision_resnet(state_dict: Dict[str, np.ndarray], in_channels: int = 3,
                                 base: Tuple[str, ...] = ('backbone', 'body'),
                                 ) -> Dict[Tuple, np.ndarray]:
    """Torchvision ResNet state dict → flat ``{(collection, path): array}``.

    Handles plain/grouped (ResNeXt) / wide variants; the classifier head
    (``fc.*``) is dropped; ``conv1`` is channel-adapted to ``in_channels``.
    """
    from .torch_import import _emit_conv, _emit_norm, _translate_resnet_stage

    out: Dict[Tuple, np.ndarray] = {}
    for key, v in state_dict.items():
        v = np.asarray(v)
        if key.startswith('fc.'):
            continue
        if key.startswith('conv1.'):
            if key.endswith('weight'):
                v = adapt_first_conv(v, in_channels)
            _emit_conv(out, base + ('conv1',), key.split('.', 1)[1], v)
        elif key.startswith('bn1.'):
            _emit_norm(out, base + ('bn1',), key.split('.', 1)[1], v)
        else:
            m = re.match(r'layer(\d+)\.(.*)', key)
            if not m:
                raise KeyError(f'Unrecognized torchvision key: {key}')
            _translate_resnet_stage(out, base, f'layer{m.group(1)}', m.group(2), v)
    return out


DEFAULT_MODEL_URLS.update({
    # torchvision DenseNet ImageNet weights (ref: celldetection/models/densenet.py:17-20)
    'DenseNet121': 'https://download.pytorch.org/models/densenet121-a639ec97.pth',
    'DenseNet161': 'https://download.pytorch.org/models/densenet161-8d451a50.pth',
    'DenseNet169': 'https://download.pytorch.org/models/densenet169-b2777c0a.pth',
    'DenseNet201': 'https://download.pytorch.org/models/densenet201-c1103571.pth',
})


def translate_torchvision_densenet(state_dict: Dict[str, np.ndarray], in_channels: int = 3,
                                   base: Tuple[str, ...] = ('backbone', 'body'),
                                   ) -> Dict[Tuple, np.ndarray]:
    """Torchvision DenseNet state dict → flat ``{(collection, path): array}``.

    Our encoder reuses torchvision's module names (conv0/norm0/denseblockN/
    denselayerM/transitionN), so the mapping is positional-free (unlike the
    reference's order-zipped remap, ``celldetection/models/densenet.py:24``).
    """
    from .torch_import import _emit_conv, _emit_norm

    out: Dict[Tuple, np.ndarray] = {}
    legacy = re.compile(r'^(.*denselayer\d+\.(?:norm|relu|conv))'
                        r'\.([12])\.(weight|bias|running_mean|running_var)$')
    for key, v in state_dict.items():
        v = np.asarray(v)
        if key.startswith('classifier.'):
            continue
        if key.startswith('features.'):
            key = key[len('features.'):]
        # the hosted 2017-era files use 'norm.1.weight' inside denselayers;
        # torchvision applies this same regex remap on load
        m = legacy.match(key)
        if m:
            key = f'{m.group(1)}{m.group(2)}.{m.group(3)}'
        parts = key.split('.')
        leaf = parts[-1]
        path = base + tuple(parts[:-1])
        if parts[-2].startswith('conv'):
            if leaf == 'weight' and parts[-2] == 'conv0':
                v = adapt_first_conv(v, in_channels)
            _emit_conv(out, path, leaf, v)
        elif parts[-2].startswith('norm'):
            _emit_norm(out, path, leaf, v)
        else:
            raise KeyError(f'Unrecognized torchvision densenet key: {key}')
    return out


DEFAULT_MODEL_URLS.update({
    # torchvision ConvNeXt ImageNet weights (ref: celldetection/models/convnext.py:19-24)
    'ConvNeXtTiny': 'https://download.pytorch.org/models/convnext_tiny-983f1562.pth',
    'ConvNeXtSmall': 'https://download.pytorch.org/models/convnext_small-0c510722.pth',
    'ConvNeXtBase': 'https://download.pytorch.org/models/convnext_base-6075fbad.pth',
    'ConvNeXtLarge': 'https://download.pytorch.org/models/convnext_large-ea097f82.pth',
})


def translate_torchvision_convnext(state_dict: Dict[str, np.ndarray], in_channels: int = 3,
                                   base: Tuple[str, ...] = ('backbone', 'body'),
                                   ) -> Dict[Tuple, np.ndarray]:
    """Torchvision ConvNeXt state dict → flat ``{(collection, path): array}``.

    Torchvision's features Sequential places stage ``i``'s blocks at index
    ``2i+1`` and the LN+2x2 downsample at ``2i``; block internals are
    ``block.{0 dw-conv, 2 LN, 3 Linear 4C, 5 Linear C}`` + ``layer_scale``
    (ref remap: ``celldetection/models/convnext.py:27-38``). Our encoder
    names them stem_conv/stem_norm/down{i}_{norm,conv}/stage{i}_block{j}.
    """
    from .torch_import import _conv_kernel

    out: Dict[Tuple, np.ndarray] = {}

    def put(path, leaf, v):
        out[('params', base + path + (leaf,))] = v

    for key, v in state_dict.items():
        v = np.asarray(v)
        if key.startswith('classifier.'):
            continue
        if not key.startswith('features.'):
            raise KeyError(f'Unrecognized torchvision convnext key: {key}')
        parts = key[len('features.'):].split('.')
        fi = int(parts[0])
        if fi == 0:  # stem: 0 conv, 1 LayerNorm
            leaf = parts[-1]
            if parts[1] == '0':
                if leaf == 'weight':
                    put(('stem_conv',), 'kernel', _conv_kernel(adapt_first_conv(v, in_channels)))
                else:
                    put(('stem_conv',), 'bias', v)
            else:
                put(('stem_norm',), 'scale' if leaf == 'weight' else 'bias', v)
        elif fi % 2 == 0:  # downsample: 0 LayerNorm, 1 conv
            stage = fi // 2
            leaf = parts[-1]
            if parts[1] == '0':
                put((f'down{stage}_norm',), 'scale' if leaf == 'weight' else 'bias', v)
            else:
                put((f'down{stage}_conv',), 'kernel' if leaf == 'weight' else 'bias',
                    _conv_kernel(v) if leaf == 'weight' else v)
        else:  # stage blocks
            stage, j = fi // 2, int(parts[1])
            blk = (f'stage{stage}_block{j}',)
            if parts[2] == 'layer_scale':
                put(blk, 'layer_scale', v.reshape(-1))
                continue
            idx, leaf = int(parts[3]), parts[-1]
            if idx == 0:  # depthwise conv
                put(blk + ('dwconv',), 'kernel' if leaf == 'weight' else 'bias',
                    _conv_kernel(v) if leaf == 'weight' else v)
            elif idx == 2:  # LayerNorm
                put(blk + ('norm',), 'scale' if leaf == 'weight' else 'bias', v)
            elif idx in (3, 5):  # Linear layers (channels-last in torch too)
                name = 'mlp0' if idx == 3 else 'mlp1'
                put(blk + (name,), 'kernel' if leaf == 'weight' else 'bias',
                    v.T if leaf == 'weight' else v)
            else:
                raise KeyError(f'Unrecognized torchvision convnext key: {key}')
    return out


_NAME_TO_URL_KEY = {
    'ResNeXt50': 'ResNeXt50', 'ResNeXt101': 'ResNeXt101',
    'WideResNet50': 'WideResNet50', 'WideResNet101': 'WideResNet101',
    'ResNet18': 'ResNet18', 'ResNet34': 'ResNet34', 'ResNet50': 'ResNet50',
    'ResNet101': 'ResNet101', 'ResNet152': 'ResNet152',
    'DenseNet121': 'DenseNet121', 'DenseNet161': 'DenseNet161',
    'DenseNet169': 'DenseNet169', 'DenseNet201': 'DenseNet201',
    'ConvNeXtTiny': 'ConvNeXtTiny', 'ConvNeXtSmall': 'ConvNeXtSmall',
    'ConvNeXtBase': 'ConvNeXtBase', 'ConvNeXtLarge': 'ConvNeXtLarge',
}


def _resnet_family_from_model_name(model_name: str):
    """'CpnResNeXt101UNet' → 'ResNeXt101' (longest match wins).

    Also resolves timm/smp encoder spellings ('resnet50',
    'timm-resnext101_32x8d') for natively-resolved Timm/Smp zoo models.
    """
    for key in sorted(_NAME_TO_URL_KEY, key=len, reverse=True):
        if key in model_name:
            return key
    from ..models.host_encoder import NATIVE_ENCODER_NAMES, normalize_encoder_name
    return NATIVE_ENCODER_NAMES.get(normalize_encoder_name(model_name))


def resolve_pretrained_state(spec, model_name: str = '') -> Dict[str, np.ndarray]:
    """Resolve a ``pretrained`` spec to a torch-layout state dict.

    Args:
        spec: ``True`` (look up by model name), a URL, a local ``.pth`` path,
            or an in-memory mapping of arrays (used by tests).
        model_name: Zoo name used for the URL lookup when ``spec is True``.
    """
    if isinstance(spec, dict):
        return {k: np.asarray(v) for k, v in spec.items()}
    if spec is True:
        family = _resnet_family_from_model_name(model_name)
        if family is None or family not in DEFAULT_MODEL_URLS:
            raise ValueError(f'No pretrained weights known for {model_name!r}; '
                             f'available: {sorted(DEFAULT_MODEL_URLS)}')
        spec = DEFAULT_MODEL_URLS[family]
    import torch
    if isinstance(spec, str) and os.path.isfile(spec):
        data = torch.load(spec, map_location='cpu', weights_only=True)
    elif isinstance(spec, str) and spec.startswith(('http://', 'https://')):
        data = torch.hub.load_state_dict_from_url(spec, map_location='cpu',
                                                  check_hash=True)
    else:
        raise ValueError(f'Cannot resolve pretrained spec: {spec!r}')
    if 'state_dict' in data and not any(k.startswith(('conv1', 'layer')) for k in data):
        data = data['state_dict']
    return {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v) for k, v in data.items()}


# Reference spelling (celldetection/util/util.py resolve_pretrained)
resolve_pretrained = resolve_pretrained_state


def apply_pretrained_(model, spec) -> None:
    """Load ImageNet weights into an initialized CPN's encoder subtree.

    Only the encoder (``backbone/body``) leaves are touched; decoder and head
    parameters keep their fresh initialization. Every encoder leaf must be
    covered by the translated checkpoint or a descriptive error is raised.
    """
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    hparams = getattr(model, 'hparams', {}) or {}
    model_name = hparams.get('model', '')
    if spec is True and _resnet_family_from_model_name(model_name) is None:
        # Timm/Smp zoo models carry the encoder name separately
        # (e.g. model='CpnTimmUNet', model_name='resnet50')
        model_name = hparams.get('model_name', '') or model_name
    in_channels = hparams.get('in_channels', 3)
    sd = resolve_pretrained_state(spec, model_name)
    if 'DenseNet' in model_name or any(k.startswith(('features.denseblock', 'denseblock'))
                                       for k in sd):
        flat = translate_torchvision_densenet(sd, in_channels=in_channels)
    elif 'ConvNeXt' in model_name or any('.block.' in k for k in sd):
        flat = translate_torchvision_convnext(sd, in_channels=in_channels)
    else:
        flat = translate_torchvision_resnet(sd, in_channels=in_channels)

    variables = model.variables
    target = {c: flatten_dict(variables[c]) for c in variables}
    subtree = ('backbone', 'body')
    covered = set()
    for (coll, path), v in flat.items():
        if path not in target.get(coll, {}):
            raise KeyError(f'Pretrained leaf not in model: {coll}/{"/".join(path)}')
        tgt = target[coll][path]
        if tuple(tgt.shape) != tuple(v.shape):
            raise ValueError(f'Pretrained shape mismatch at {coll}/{"/".join(path)}: '
                             f'{v.shape} vs {tgt.shape}')
        target[coll][path] = jnp.asarray(v, tgt.dtype)
        covered.add((coll, path))
    missing = [f'{c}/{"/".join(p)}' for c in target for p in target[c]
               if p[:len(subtree)] == subtree and (c, p) not in covered
               and p[-1] != 'num_batches_tracked']
    if missing:
        raise KeyError(f'{len(missing)} encoder leaves not covered by pretrained '
                       f'weights, e.g. ' + ', '.join(missing[:8]))
    model.variables = {c: unflatten_dict(target[c]) for c in target}
