"""PyTorch checkpoint ingestion (cd-format / torchvision → flax).

Behavioral reference: the reference's cd checkpoint format
(``celldetection/util/util.py:373-560``) and its state-dict remappers
(``celldetection/models/resnet.py:236-262``). This module translates torch
state-dict keys into this framework's flax parameter tree:

  - Conv kernels OIHW → HWIO (grouped convs share the same transpose).
  - BatchNorm weight/bias → params scale/bias; running stats → batch_stats.
  - Key paths are rewritten by rule tables per architecture family
    (CPN heads, GeneralizedUNet decoder, ResNet/UNetEncoder bodies).

Import is strict: every float leaf of the target tree must be covered, with
matching shapes, or a descriptive error is raised.
"""
import re
from typing import Dict, Tuple

import numpy as np

__all__ = ['translate_cpn_state_dict', 'import_state_dict', 'load_torch_cd_model',
           'export_torch_state_dict']


def _conv_kernel(v: np.ndarray) -> np.ndarray:
    return np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO


def _seq_convnorm(rest: str):
    """TwoConvNormRelu Sequential indices → (block name, leaf)."""
    m = re.match(r'(\d)\.(.*)', rest)
    if m is None:
        raise KeyError(f'Unrecognized TwoConvNormRelu key suffix: {rest!r}')
    idx, leaf = int(m.group(1)), m.group(2)
    block = {0: 'block0', 1: 'block0', 3: 'block1', 4: 'block1'}[idx]
    kind = 'conv' if idx in (0, 3) else 'norm'
    return block, kind, leaf


def _norm_leaf(leaf: str):
    """Torch norm leaf → (collection, flax leaf)."""
    return {
        'weight': ('params', 'scale'),
        'bias': ('params', 'bias'),
        'running_mean': ('batch_stats', 'mean'),
        'running_var': ('batch_stats', 'var'),
        'num_batches_tracked': (None, None),
    }[leaf]


def _emit_conv(out, path, leaf, v):
    if leaf == 'weight':
        out[('params', path + ('kernel',))] = _conv_kernel(v)
    elif leaf == 'bias':
        out[('params', path + ('bias',))] = v
    else:
        raise KeyError(f'Unexpected conv leaf {leaf} at {path}')


def _emit_norm(out, path, leaf, v):
    coll, name = _norm_leaf(leaf)
    if coll is None:
        return
    out[(coll, path + ('norm', name))] = v


def _translate_readout(out, head: str, rest: str, v):
    # ReadOut: block.0 conv0, block.1 norm, block.4 conv1 (2=act, 3=dropout)
    m = re.match(r'block\.(\d)\.(.*)', rest)
    if not m:
        raise KeyError(f'Unknown ReadOut key: {head}.{rest}')
    idx, leaf = int(m.group(1)), m.group(2)
    if idx == 0:
        _emit_conv(out, (head, 'conv0'), leaf, v)
    elif idx == 1:
        # Norm wrapper module is itself named 'norm' -> head/norm/norm/<leaf>
        _emit_norm(out, (head, 'norm'), leaf, v)
    elif idx == 4:
        _emit_conv(out, (head, 'conv1'), leaf, v)
    else:
        raise KeyError(f'Unexpected ReadOut index {idx} in {head}.{rest}')


def _translate_resnet_stage(out, base: Tuple[str, ...], layer_name: str, rest: str, v):
    """layerN.<i>.conv1.weight / bn1.* / downsample.0/1.*"""
    m = re.match(r'(\d+)\.(.*)', rest)
    if m is None:
        raise KeyError(f'Unrecognized ResNet stage key: {layer_name}.{rest}')
    block_idx, sub = int(m.group(1)), m.group(2)
    path = base + (layer_name, f'block{block_idx}')
    m2 = re.match(r'(conv\d|bn\d|downsample)\.?(.*)', sub)
    if m2 is None:
        raise KeyError(f'Unrecognized ResNet block key: {layer_name}.{rest}')
    kind, leaf = m2.group(1), m2.group(2)
    if kind.startswith('conv'):
        _emit_conv(out, path + (kind,), leaf, v)
    elif kind.startswith('bn'):
        _emit_norm(out, path + (kind,), leaf, v)
    else:  # downsample.0 conv / downsample.1 norm
        m3 = re.match(r'(\d)\.(.*)', leaf)
        if m3 is None:
            raise KeyError(f'Unrecognized downsample key: {layer_name}.{rest}')
        if m3.group(1) == '0':
            _emit_conv(out, path + ('downsample_conv',), m3.group(2), v)
        else:
            _emit_norm(out, path + ('downsample_norm',), m3.group(2), v)


def detect_encoder_layout(state_dict) -> Tuple[str, bool]:
    """Infer ``(encoder, fused_initial)`` from torch-layout keys.

    A ResNet body contains ``convN``/``bnN`` leaf names; a fused stem puts
    layer1 at ``body.0.4`` while the reference's UNet/FPN default
    (``fused_initial=False``) puts it under ``body.1.1``.
    """
    body = [re.sub(r'^(core\.)?backbone\.body\.', '', k) for k in state_dict
            if re.match(r'(core\.)?backbone\.body\.', k)]
    encoder = 'resnet' if any('.conv1.' in k or '.bn1.' in k or 'downsample' in k
                              for k in body) else 'unet'
    fused = any(k.startswith('0.4.') for k in body)
    return encoder, fused


def translate_cpn_state_dict(state_dict: Dict[str, np.ndarray], fused_initial: bool = None,
                             encoder: str = None) -> Dict[Tuple, np.ndarray]:
    """Torch CPN state dict → flat ``{(collection, path): array}``.

    Args:
        state_dict: Torch-layout keys (reference module naming).
        fused_initial: ResNet stem fused into stage 0. Default: auto-detect.
        encoder: 'resnet' (BackboneAsUNet over ResNet) or 'unet' (UNetEncoder).
            Default: auto-detect.
    """
    if encoder is None or fused_initial is None:
        det_encoder, det_fused = detect_encoder_layout(state_dict)
        encoder = det_encoder if encoder is None else encoder
        fused_initial = det_fused if fused_initial is None else fused_initial
    out: Dict[Tuple, np.ndarray] = {}
    for key, v in state_dict.items():
        v = np.asarray(v)
        if key == 'order_weights':
            continue  # recomputed constant
        key = re.sub(r'^core\.', '', key)
        # --- heads ----------------------------------------------------------
        m = re.match(r'(score|location|fourier|refinement|uncertainty)_head\.(.*)', key)
        if m:
            _translate_readout(out, f'{m.group(1)}_head', m.group(2), v)
            continue
        m = re.match(r'(score|location|fourier|refinement|uncertainty)_fuse\.block\.(\d)\.(.*)', key)
        if m:
            name = f'{m.group(1)}_fuse'
            if m.group(2) == '0':
                _emit_conv(out, (name, 'conv'), m.group(3), v)
            else:
                _emit_norm(out, (name, 'norm'), m.group(3), v)
            continue
        # --- decoder --------------------------------------------------------
        m = re.match(r'backbone\.unet\.inner_blocks\.(\d+)\.(.*)', key)
        if m:
            _emit_conv(out, ('backbone', 'unet', f'inner{int(m.group(1)) + 1}'), m.group(2), v)
            continue
        m = re.match(r'backbone\.unet\.layer_blocks\.(\d+)\.(.*)', key)
        if m:
            block, kind, leaf = _seq_convnorm(m.group(2))
            path = ('backbone', 'unet', f'layer{int(m.group(1))}', block)
            if kind == 'conv':
                _emit_conv(out, path + ('conv',), leaf, v)
            else:
                _emit_norm(out, path + ('norm',), leaf, v)
            continue
        m = re.match(r'backbone\.unet\.out_layer\.(.*)', key)
        if m:
            _emit_conv(out, ('backbone', 'unet', 'out_layer'), m.group(1), v)
            continue
        # FPN decoder: fpn.{inner,layer}_blocks.<i>.<0 conv | 1 norm>.*
        m = re.match(r'backbone\.fpn\.(inner|layer)_blocks\.(\d+)\.(\d)\.(.*)', key)
        if m:
            name = f'{m.group(1)}{int(m.group(2))}'
            if m.group(3) == '0':
                _emit_conv(out, ('backbone', 'fpn', name, 'conv'), m.group(4), v)
            else:
                _emit_norm(out, ('backbone', 'fpn', name, 'norm'), m.group(4), v)
            continue
        # --- encoder body ---------------------------------------------------
        m = re.match(r'backbone\.body\.(.*)', key)
        if m:
            rest = m.group(1)
            base = ('backbone', 'body')
            if encoder == 'unet':
                # UNetEncoder: body.<i> = block (i==0) | Sequential(pool, block)
                m2 = re.match(r'(\d+)\.(.*)', rest)
                i, sub = int(m2.group(1)), m2.group(2)
                if i > 0:  # strip the pool wrapper index
                    sub = re.sub(r'^1\.', '', sub)
                block, kind, leaf = _seq_convnorm(sub)
                path = base + (f'block{i}', block)
                if kind == 'conv':
                    _emit_conv(out, path + ('conv',), leaf, v)
                else:
                    _emit_norm(out, path + ('norm',), leaf, v)
                continue
            # ResNet encoder
            if fused_initial:
                # body.0.0 conv1 / body.0.1 bn1 / body.0.4.* layer1 / body.K layerK+1
                m2 = re.match(r'0\.0\.(.*)', rest)
                if m2:
                    _emit_conv(out, base + ('conv1',), m2.group(1), v)
                    continue
                m2 = re.match(r'0\.1\.(.*)', rest)
                if m2:
                    _emit_norm(out, base + ('bn1',), m2.group(1), v)
                    continue
                m2 = re.match(r'0\.4\.(.*)', rest)
                if m2:
                    _translate_resnet_stage(out, base, 'layer1', m2.group(1), v)
                    continue
                m2 = re.match(r'(\d)\.(.*)', rest)
                if m2:
                    _translate_resnet_stage(out, base, f'layer{int(m2.group(1)) + 1}',
                                            m2.group(2), v)
                    continue
            else:
                # body.0 = Sequential(conv, bn, relu); body.1 = Sequential(pool, layer1); body.K = layerK
                m2 = re.match(r'0\.0\.(.*)', rest)
                if m2:
                    _emit_conv(out, base + ('conv1',), m2.group(1), v)
                    continue
                m2 = re.match(r'0\.1\.(.*)', rest)
                if m2:
                    _emit_norm(out, base + ('bn1',), m2.group(1), v)
                    continue
                m2 = re.match(r'1\.1\.(.*)', rest)
                if m2:
                    _translate_resnet_stage(out, base, 'layer1', m2.group(1), v)
                    continue
                m2 = re.match(r'(\d)\.(.*)', rest)
                if m2:
                    _translate_resnet_stage(out, base, f'layer{int(m2.group(1))}',
                                            m2.group(2), v)
                    continue
        raise KeyError(f'Unrecognized torch key: {key} (shape {v.shape})')
    return out


def import_state_dict(variables, flat: Dict[Tuple, np.ndarray], strict: bool = True):
    """Merge a translated flat dict into a flax variables tree (strict shapes)."""
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    target = {c: flatten_dict(variables[c]) for c in variables}
    covered = {c: set() for c in variables}
    for (coll, path), v in flat.items():
        if coll not in target:
            if strict:
                raise KeyError(f'No collection {coll} in target (path {path})')
            continue
        if path not in target[coll]:
            # Allow bias-less convs etc. to be absent only when not strict.
            if strict:
                raise KeyError(f'Path not in target[{coll}]: {"/".join(path)}')
            continue
        tgt = target[coll][path]
        if tuple(tgt.shape) != tuple(v.shape):
            raise ValueError(f'Shape mismatch at {coll}/{"/".join(path)}: '
                             f'{v.shape} vs {tgt.shape}')
        target[coll][path] = jnp.asarray(v, tgt.dtype)
        covered[coll].add(path)
    if strict:
        missing = []
        for c in target:
            for path in target[c]:
                if path not in covered[c]:
                    missing.append(f'{c}/{"/".join(path)}')
        if missing:
            raise KeyError(f'{len(missing)} target leaves not covered by import, e.g. '
                           + ', '.join(missing[:8]))
    return {c: unflatten_dict(target[c]) for c in target}


def export_torch_state_dict(variables, fused_initial: bool = True,
                            encoder: str = 'resnet') -> Dict[str, np.ndarray]:
    """Inverse mapping: flax variables → reference torch-layout state dict.

    Enables exporting cdt checkpoints for consumption by the torch reference,
    and is the round-trip oracle for the import tests.
    """
    from flax.traverse_util import flatten_dict

    inv_norm = {('params', 'scale'): 'weight', ('params', 'bias'): 'bias',
                ('batch_stats', 'mean'): 'running_mean', ('batch_stats', 'var'): 'running_var'}
    out: Dict[str, np.ndarray] = {}

    def put(key, v, is_conv_kernel):
        v = np.asarray(v)
        if is_conv_kernel:
            v = np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
        out['core.' + key] = v

    def norm_suffix(coll, leaf):
        return inv_norm[(coll, leaf)]

    for coll in variables:
        flat = flatten_dict(variables[coll])
        for path, v in flat.items():
            p = list(path)
            leaf = p[-1]
            is_kernel = leaf == 'kernel'
            # --- multi-feature fuse layers (inverse of the *_fuse import) ---
            if p[0].endswith('_fuse'):
                if p[1] == 'conv':
                    put(f'{p[0]}.block.0.{"weight" if is_kernel else "bias"}', v, is_kernel)
                elif p[1] == 'norm':
                    put(f'{p[0]}.block.1.{norm_suffix(coll, leaf)}', v, False)
                else:
                    raise KeyError(f'export: unknown fuse path {path}')
                continue
            # --- heads ------------------------------------------------------
            if p[0].endswith('_head'):
                head = p[0]
                if p[1] == 'conv0':
                    put(f'{head}.block.0.{"weight" if is_kernel else "bias"}', v, is_kernel)
                elif p[1] == 'conv1':
                    put(f'{head}.block.4.{"weight" if is_kernel else "bias"}', v, is_kernel)
                elif p[1] == 'norm':
                    put(f'{head}.block.1.{norm_suffix(coll, leaf)}', v, False)
                else:
                    raise KeyError(f'export: unknown head path {path}')
                continue
            if p[0] == 'backbone' and p[1] == 'unet':
                m = re.match(r'inner(\d+)', p[2])
                if m:
                    put(f'backbone.unet.inner_blocks.{int(m.group(1)) - 1}.'
                        f'{"weight" if is_kernel else "bias"}', v, is_kernel)
                    continue
                m = re.match(r'layer(\d+)', p[2])
                if m:
                    b = 0 if p[3] == 'block0' else 3
                    if p[4] == 'conv':
                        put(f'backbone.unet.layer_blocks.{m.group(1)}.{b}.'
                            f'{"weight" if is_kernel else "bias"}', v, is_kernel)
                    else:  # norm
                        put(f'backbone.unet.layer_blocks.{m.group(1)}.{b + 1}.'
                            f'{norm_suffix(coll, leaf)}', v, False)
                    continue
                if p[2] == 'out_layer':
                    put(f'backbone.unet.out_layer.{"weight" if is_kernel else "bias"}',
                        v, is_kernel)
                    continue
                raise KeyError(f'export: unknown unet path {path}')
            if p[0] == 'backbone' and p[1] == 'fpn':
                m = re.match(r'(inner|layer)(\d+)', p[2])
                base = f'backbone.fpn.{m.group(1)}_blocks.{m.group(2)}'
                if p[3] == 'conv':
                    put(f'{base}.0.{"weight" if is_kernel else "bias"}', v, is_kernel)
                else:
                    put(f'{base}.1.{norm_suffix(coll, leaf)}', v, False)
                continue
            if p[0] == 'backbone' and p[1] == 'body':
                if encoder == 'unet':
                    m = re.match(r'block(\d+)', p[2])
                    i = int(m.group(1))
                    prefix = f'backbone.body.{i}.' + ('1.' if i > 0 else '')
                    b = 0 if p[3] == 'block0' else 3
                    if p[4] == 'conv':
                        put(f'{prefix}{b}.{"weight" if is_kernel else "bias"}', v, is_kernel)
                    else:
                        put(f'{prefix}{b + 1}.{norm_suffix(coll, leaf)}', v, False)
                    continue
                # resnet encoder
                if p[2] == 'conv1':
                    put('backbone.body.0.0.weight', v, True)
                    continue
                if p[2] == 'bn1':
                    put(f'backbone.body.0.1.{norm_suffix(coll, leaf)}', v, False)
                    continue
                m = re.match(r'layer(\d+)', p[2])
                if m is None:
                    raise KeyError(f'export: unknown resnet body path {path} '
                                   f'(wrong encoder= setting?)')
                layer_idx = int(m.group(1))
                if fused_initial:
                    stage = '0.4' if layer_idx == 1 else str(layer_idx - 1)
                else:
                    stage = '1.1' if layer_idx == 1 else str(layer_idx)
                bi = re.match(r'block(\d+)', p[3]).group(1)
                kind = p[4]
                if kind.startswith('conv'):
                    put(f'backbone.body.{stage}.{bi}.{kind}.weight', v, True)
                elif kind.startswith('bn'):
                    put(f'backbone.body.{stage}.{bi}.{kind}.{norm_suffix(coll, leaf)}', v, False)
                elif kind == 'downsample_conv':
                    put(f'backbone.body.{stage}.{bi}.downsample.0.weight', v, True)
                elif kind == 'downsample_norm':
                    put(f'backbone.body.{stage}.{bi}.downsample.1.{norm_suffix(coll, leaf)}',
                        v, False)
                else:
                    raise KeyError(f'export: unknown resnet path {path}')
                continue
            raise KeyError(f'export: unknown path {path}')
    return out


def load_torch_cd_model(filename: str, input_shape=None, **overrides):
    """Load a reference cd-format ``.pt``/Lightning ``.ckpt`` checkpoint.

    Rebuilds the equivalent cdt model from the stored class name + kwargs and
    imports the weights. torch is NOT required: zip-format checkpoints (torch
    >= 1.6, incl. the hosted ginoro model) unpickle through the restricted
    torch-free reader (:mod:`..util.pt_pickle`); only legacy pre-1.6 files
    fall back to the torch package.
    """
    from .pt_pickle import PTUnpickleError, load_pt
    try:
        data = load_pt(filename)
    except PTUnpickleError:
        import torch  # legacy non-zip format: requires torch
        data = torch.load(filename, map_location='cpu', weights_only=False)
    if 'cd.models' in data:
        info = data['cd.models']
        stored = info['model']
        model_name = overrides.pop('model', None) or (
            stored if isinstance(stored, str) else getattr(stored, '__name__', str(stored)))
        kwargs = dict(info.get('kwargs', {}))
        kwargs.update(info.get('updated_kwargs', {}))
        state_dict = data['state_dict']
    elif 'state_dict' in data:  # Lightning ckpt
        state_dict = {re.sub(r'^model\.', '', k): v for k, v in data['state_dict'].items()}
        hp = data.get('hyper_parameters', {})
        model_name = overrides.pop('model', hp.get('model'))
        kwargs = dict(hp.get('kwargs', {}))
    else:
        raise ValueError(f'Unrecognized checkpoint format: {list(data)[:8]}')

    from ..models import get_cpn
    kwargs.update(overrides)
    in_channels = kwargs.pop('in_channels')
    backbone_kwargs = kwargs.pop('backbone_kwargs', None)
    import inspect
    ctor = get_cpn(model_name)
    sig = inspect.signature(ctor)
    # the generated zoo ctors take most CPN options via **kwargs — admit them
    # (dropping e.g. uncertainty_head/max_detections rebuilds a DIFFERENT
    # architecture and breaks the strict import)
    has_var_kw = any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values())
    accepted = {k: v for k, v in kwargs.items()
                if k in sig.parameters or has_var_kw}
    model = ctor(in_channels, backbone_kwargs=backbone_kwargs, **accepted)
    input_shape = input_shape or (1, 128, 128, in_channels)
    model.init(input_shape=tuple(input_shape))

    sd = {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v) for k, v in state_dict.items()}
    flat = translate_cpn_state_dict(sd)  # encoder layout auto-detected from keys
    model.variables = import_state_dict(model.variables, flat)
    return model
