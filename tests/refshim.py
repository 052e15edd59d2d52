"""Dependency shims that let the *reference* package run on CPU in this image.

The reference (``/root/reference/celldetection``) imports torchvision,
pytorch_lightning, skimage, timm, smp, albumentations and pynvml at module
scope — none of which are installed here. For parity-fixture generation we
only need the reference's *model forward* on CPU, which touches a small,
well-known slice of the torchvision API. This module provides original
implementations of that slice (written from the public torchvision API
semantics, not copied from any repo) plus inert stubs for everything that is
referenced at import time but never executed in our fixture runs.

Usage::

    import refshim
    refshim.install()          # must run before `import celldetection`
    import sys; sys.path.insert(0, '/root/reference')
    import celldetection as cd

Functional (really-implemented) pieces:
  - torchvision.ops.boxes: nms / box_iou / box_area / remove_small_boxes
  - torch.ops.torchvision.nms (registered via torch.library)
  - torchvision.ops.feature_pyramid_network.FeaturePyramidNetwork (+ helpers)
  - torchvision.models._utils.IntermediateLayerGetter
  - torchvision.models.resnet.BasicBlock / Bottleneck (forward + expansion)
  - torchvision.transforms.Compose / Normalize
  - pytorch_lightning.core.mixins.HyperparametersMixin
  - skimage.img_as_ubyte
Everything else is an inert stub that raises if actually called.
"""
import sys
import types
from collections import OrderedDict

__all__ = ['install']


def _new_module(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _stub_class(name, base=object):
    def _init(self, *a, **k):
        raise NotImplementedError(f'refshim stub {name} cannot be instantiated')
    return type(name, (base,), {'__init__': _init} if base is object else {})


def _url_weights_enum(url='https://example.invalid/weights.pth'):
    """Object providing the ``.IMAGENET1K_V1.url`` access pattern."""
    leaf = types.SimpleNamespace(url=url)
    return types.SimpleNamespace(IMAGENET1K_V1=leaf, IMAGENET1K_V2=leaf, DEFAULT=leaf)


def install():  # noqa: C901 - one long, linear setup function by design
    if 'torchvision' in sys.modules:
        return
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # ------------------------------------------------------------------ ops
    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def _upcast(t):
        if t.is_floating_point():
            return t if t.dtype in (torch.float32, torch.float64) else t.float()
        return t if t.dtype in (torch.int32, torch.int64) else t.int()

    def box_iou(boxes1, boxes2):
        area1 = box_area(boxes1)
        area2 = box_area(boxes2)
        lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
        rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
        wh = _upcast(rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (area1[:, None] + area2[None, :] - inter)

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True)
        boxes = boxes[order]
        n = boxes.shape[0]
        alive = torch.ones(n, dtype=torch.bool)
        iou = box_iou(boxes, boxes)
        for i in range(n):
            if not alive[i]:
                continue
            alive &= ~(iou[i] > iou_threshold)
            alive[i] = True
        return order[alive]

    def remove_small_boxes(boxes, min_size):
        ws = boxes[:, 2] - boxes[:, 0]
        hs = boxes[:, 3] - boxes[:, 1]
        return torch.where((ws >= min_size) & (hs >= min_size))[0]

    def clip_boxes_to_image(boxes, size):
        h, w = size
        boxes = boxes.clone()
        boxes[:, 0::2] = boxes[:, 0::2].clamp(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clamp(0, h)
        return boxes

    try:  # make torch.ops.torchvision.nms resolvable
        lib = torch.library.Library('torchvision', 'DEF')
        lib.define('nms(Tensor boxes, Tensor scores, float iou_threshold) -> Tensor')
        lib.impl('nms', lambda b, s, t: nms(b, s, t), 'CompositeExplicitAutograd')
        install._tv_lib = lib  # keep alive
    except Exception:  # already registered (re-install in same process)
        pass

    tv = _new_module('torchvision')
    tv_ops = _new_module('torchvision.ops')
    tv.ops = tv_ops
    tv_boxes = _new_module('torchvision.ops.boxes')
    for fn in (box_area, box_iou, _upcast, nms, remove_small_boxes, clip_boxes_to_image):
        setattr(tv_boxes, fn.__name__, fn)
    tv_ops.boxes = tv_boxes
    tv_ops.nms = nms
    tv_ops.box_iou = box_iou

    class Permute(nn.Module):
        def __init__(self, dims):
            super().__init__()
            self.dims = list(dims)

        def forward(self, x):
            return x.permute(self.dims)

    tv_ops.Permute = Permute

    class StochasticDepth(nn.Module):
        def __init__(self, p, mode):
            super().__init__()
            self.p, self.mode = p, mode

        def forward(self, x):
            if not self.training or self.p == 0.0:
                return x
            keep = 1.0 - self.p
            shape = [x.shape[0]] + [1] * (x.ndim - 1) if self.mode == 'row' else [1] * x.ndim
            noise = torch.empty(shape, dtype=x.dtype, device=x.device).bernoulli_(keep)
            return x * noise / keep

    sd_mod = _new_module('torchvision.ops.stochastic_depth')
    sd_mod.StochasticDepth = StochasticDepth
    tv_ops.stochastic_depth = sd_mod
    tv_ops.StochasticDepth = StochasticDepth

    def sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2.0, reduction='none'):
        p = torch.sigmoid(inputs)
        ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction='none')
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce * ((1 - p_t) ** gamma)
        if alpha >= 0:
            loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
        if reduction == 'mean':
            return loss.mean()
        if reduction == 'sum':
            return loss.sum()
        return loss

    fl_mod = _new_module('torchvision.ops.focal_loss')
    fl_mod.sigmoid_focal_loss = sigmoid_focal_loss
    tv_ops.focal_loss = fl_mod

    class ConvNormActivation(nn.Sequential):
        def __init__(self, in_channels, out_channels, kernel_size=3, stride=1, padding=None,
                     groups=1, norm_layer=nn.BatchNorm2d, activation_layer=nn.ReLU,
                     dilation=1, inplace=True, bias=None, conv_layer=nn.Conv2d):
            if padding is None:
                padding = (kernel_size - 1) // 2 * dilation
            if bias is None:
                bias = norm_layer is None
            layers = [conv_layer(in_channels, out_channels, kernel_size, stride, padding,
                                 dilation=dilation, groups=groups, bias=bias)]
            if norm_layer is not None:
                layers.append(norm_layer(out_channels))
            if activation_layer is not None:
                kw = {'inplace': inplace} if inplace is not None else {}
                layers.append(activation_layer(**kw))
            super().__init__(*layers)
            self.out_channels = out_channels

    misc_mod = _new_module('torchvision.ops.misc')
    misc_mod.ConvNormActivation = ConvNormActivation
    misc_mod.Conv2dNormActivation = ConvNormActivation
    misc_mod.Permute = Permute
    tv_ops.misc = misc_mod

    # ------------------------------------------------ feature pyramid network
    class ExtraFPNBlock(nn.Module):
        def forward(self, results, x, names):
            raise NotImplementedError

    class FeaturePyramidNetwork(nn.Module):
        def __init__(self, in_channels_list, out_channels, extra_blocks=None, norm_layer=None):
            super().__init__()
            self.inner_blocks = nn.ModuleList()
            self.layer_blocks = nn.ModuleList()
            for in_channels in in_channels_list:
                if in_channels == 0:
                    raise ValueError('in_channels=0 is currently not supported')
                if norm_layer is None:
                    inner = nn.Conv2d(in_channels, out_channels, 1)
                    layer = nn.Conv2d(out_channels, out_channels, 3, padding=1)
                else:
                    inner = nn.Sequential(nn.Conv2d(in_channels, out_channels, 1, bias=False),
                                          norm_layer(out_channels))
                    layer = nn.Sequential(
                        nn.Conv2d(out_channels, out_channels, 3, padding=1, bias=False),
                        norm_layer(out_channels))
                self.inner_blocks.append(inner)
                self.layer_blocks.append(layer)
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_uniform_(m.weight, a=1)
                    if m.bias is not None:
                        nn.init.constant_(m.bias, 0)
            self.extra_blocks = extra_blocks

        def get_result_from_inner_blocks(self, x, idx):
            return self.inner_blocks[idx](x)

        def get_result_from_layer_blocks(self, x, idx):
            return self.layer_blocks[idx](x)

        def forward(self, x):
            names = list(x.keys())
            x = list(x.values())
            last_inner = self.get_result_from_inner_blocks(x[-1], -1)
            results = [self.get_result_from_layer_blocks(last_inner, -1)]
            for idx in range(len(x) - 2, -1, -1):
                inner_lateral = self.get_result_from_inner_blocks(x[idx], idx)
                feat_shape = inner_lateral.shape[-2:]
                inner_top_down = F.interpolate(last_inner, size=feat_shape, mode='nearest')
                last_inner = inner_lateral + inner_top_down
                results.insert(0, self.get_result_from_layer_blocks(last_inner, idx))
            if self.extra_blocks is not None:
                results, names = self.extra_blocks(results, x, names)
            return OrderedDict(list(zip(names, results)))

    class LastLevelMaxPool(ExtraFPNBlock):
        def forward(self, results, x, names):
            names.append('pool')
            results.append(F.max_pool2d(results[-1], 1, 2, 0))
            return results, names

    fpn_mod = _new_module('torchvision.ops.feature_pyramid_network')
    fpn_mod.FeaturePyramidNetwork = FeaturePyramidNetwork
    fpn_mod.ExtraFPNBlock = ExtraFPNBlock
    fpn_mod.LastLevelMaxPool = LastLevelMaxPool
    tv_ops.feature_pyramid_network = fpn_mod
    tv_ops.FeaturePyramidNetwork = FeaturePyramidNetwork

    # ---------------------------------------------------------------- models
    tv_models = _new_module('torchvision.models')
    tv.models = tv_models

    class IntermediateLayerGetter(nn.ModuleDict):
        def __init__(self, model, return_layers):
            if not set(return_layers).issubset([name for name, _ in model.named_children()]):
                raise ValueError('return_layers are not present in model')
            orig_return_layers = {str(k): str(v) for k, v in return_layers.items()}
            remaining = dict(orig_return_layers)
            layers = OrderedDict()
            for name, module in model.named_children():
                layers[name] = module
                if name in remaining:
                    del remaining[name]
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = orig_return_layers

        def forward(self, x):
            out = OrderedDict()
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    utils_mod = _new_module('torchvision.models._utils')
    utils_mod.IntermediateLayerGetter = IntermediateLayerGetter
    tv_models._utils = utils_mod

    # Standard (torchvision-semantics) residual blocks: the reference binds
    # `forward` and `expansion` from these.
    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            identity = x
            out = self.conv1(x)
            out = self.bn1(out)
            out = self.relu(out)
            out = self.conv2(out)
            out = self.bn2(out)
            if self.downsample is not None:
                identity = self.downsample(x)
            out += identity
            out = self.relu(out)
            return out

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            identity = x
            out = self.conv1(x)
            out = self.bn1(out)
            out = self.relu(out)
            out = self.conv2(out)
            out = self.bn2(out)
            out = self.relu(out)
            out = self.conv3(out)
            out = self.bn3(out)
            if self.downsample is not None:
                identity = self.downsample(x)
            out += identity
            out = self.relu(out)
            return out

    resnet_mod = _new_module('torchvision.models.resnet')
    resnet_mod.BasicBlock = BasicBlock
    resnet_mod.Bottleneck = Bottleneck
    for name in ('ResNet18_Weights', 'ResNet34_Weights', 'ResNet50_Weights',
                 'ResNet101_Weights', 'ResNet152_Weights', 'ResNeXt50_32X4D_Weights',
                 'ResNeXt101_32X8D_Weights', 'Wide_ResNet50_2_Weights',
                 'Wide_ResNet101_2_Weights'):
        setattr(resnet_mod, name, _url_weights_enum())
    tv_models.resnet = resnet_mod

    class CNBlockConfig:
        def __init__(self, input_channels, out_channels, num_layers):
            self.input_channels = input_channels
            self.out_channels = out_channels
            self.num_layers = num_layers

    convnext_mod = _new_module('torchvision.models.convnext')
    convnext_mod.CNBlockConfig = CNBlockConfig
    for name in ('ConvNeXt_Tiny_Weights', 'ConvNeXt_Small_Weights',
                 'ConvNeXt_Base_Weights', 'ConvNeXt_Large_Weights'):
        setattr(convnext_mod, name, _url_weights_enum())
    convnext_mod.ConvNeXt = _stub_class('ConvNeXt', nn.Module)
    tv_models.convnext = convnext_mod

    densenet_mod = _new_module('torchvision.models.densenet')
    for name in ('_DenseLayer', '_DenseBlock', '_Transition', 'DenseNet'):
        setattr(densenet_mod, name, type(name, (nn.Module,), {}))
    for name in ('DenseNet121_Weights', 'DenseNet161_Weights',
                 'DenseNet169_Weights', 'DenseNet201_Weights'):
        setattr(densenet_mod, name, _url_weights_enum())
    tv_models.densenet = densenet_mod

    mnv3_mod = _new_module('torchvision.models.mobilenetv3')

    class InvertedResidualConfig:
        def __init__(self, *a, **k):
            raise NotImplementedError('refshim stub InvertedResidualConfig')

    mnv3_mod.InvertedResidualConfig = InvertedResidualConfig
    mnv3_mod.InvertedResidual = type('InvertedResidual', (nn.Module,), {})

    def _mobilenet_v3_conf(*a, **k):
        raise NotImplementedError('refshim stub _mobilenet_v3_conf')

    mnv3_mod._mobilenet_v3_conf = _mobilenet_v3_conf
    for name in ('MobileNet_V3_Large_Weights', 'MobileNet_V3_Small_Weights'):
        setattr(mnv3_mod, name, _url_weights_enum())
    tv_models.mobilenetv3 = mnv3_mod

    mnv2_mod = _new_module('torchvision.models.mobilenetv2')
    mnv2_mod.ConvBNActivation = ConvNormActivation
    tv_models.mobilenetv2 = mnv2_mod

    seg_mod = _new_module('torchvision.models.segmentation')
    dlv3_mod = _new_module('torchvision.models.segmentation.deeplabv3')
    dlv3_mod.ASPP = type('ASPP', (nn.Module,), {})
    seg_mod.deeplabv3 = dlv3_mod
    tv_models.segmentation = seg_mod

    det_mod = _new_module('torchvision.models.detection')
    bu_mod = _new_module('torchvision.models.detection.backbone_utils')
    bu_mod.BackboneWithFPN = type('BackboneWithFPN', (nn.Module,), {})
    det_mod.backbone_utils = bu_mod
    tv_models.detection = det_mod

    fe_mod = _new_module('torchvision.models.feature_extraction')

    def create_feature_extractor(*a, **k):
        raise NotImplementedError('refshim stub create_feature_extractor')

    fe_mod.create_feature_extractor = create_feature_extractor
    tv_models.feature_extraction = fe_mod

    # ------------------------------------------------------------ transforms
    trans_mod = _new_module('torchvision.transforms')

    class Compose:
        def __init__(self, transforms):
            self.transforms = list(transforms)

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class TvNormalize(nn.Module):
        def __init__(self, mean, std, inplace=False):
            super().__init__()
            self.mean, self.std = mean, std

        def forward(self, x):
            mean = torch.as_tensor(self.mean, dtype=x.dtype, device=x.device)
            std = torch.as_tensor(self.std, dtype=x.dtype, device=x.device)
            shape = [1] * x.ndim
            shape[-3] = -1  # channels-first convention (..., C, H, W)
            return (x - mean.reshape(shape)) / std.reshape(shape)

    trans_mod.Compose = Compose
    trans_mod.Normalize = TvNormalize
    tv.transforms = trans_mod

    tvu_mod = _new_module('torchvision.utils')

    def make_grid(tensors, *a, **k):
        raise NotImplementedError('refshim stub make_grid')

    tvu_mod.make_grid = make_grid
    tv.utils = tvu_mod

    ds_mod = _new_module('torchvision.datasets')
    dsu_mod = _new_module('torchvision.datasets.utils')

    def download_and_extract_archive(*a, **k):
        raise NotImplementedError('refshim stub download_and_extract_archive (no network)')

    dsu_mod.download_and_extract_archive = download_and_extract_archive
    dsu_mod.download_url = download_and_extract_archive
    ds_mod.utils = dsu_mod
    tv.datasets = ds_mod

    # ----------------------------------------------------- pytorch_lightning
    pl_mod = _new_module('pytorch_lightning')

    class AttributeDict(dict):
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

        def __setattr__(self, name, value):
            self[name] = value

    class HyperparametersMixin:
        def save_hyperparameters(self, *args, ignore=None, logger=True):
            import inspect
            frame = inspect.currentframe().f_back
            # Capture the constructor locals of the calling class's __init__.
            init_locals = dict(frame.f_locals)
            init_locals.pop('self', None)
            init_locals.pop('__class__', None)
            ignore = set(ignore or ())
            self.hparams.update({k: v for k, v in init_locals.items() if k not in ignore})

        @property
        def hparams(self):
            if '_refshim_hparams' not in self.__dict__:
                self.__dict__['_refshim_hparams'] = AttributeDict()
            return self.__dict__['_refshim_hparams']

        def _set_hparams(self, hp):
            if hasattr(hp, 'items'):
                self.hparams.update(dict(hp))
            else:
                self.hparams.update(vars(hp))

        @property
        def _hparams(self):
            return self.hparams

        _hparams_initial = AttributeDict()  # instance value set by callers

    class LightningModule(nn.Module, HyperparametersMixin):
        trainer = None

        def log(self, *a, **k):
            pass

        def log_dict(self, *a, **k):
            pass

    class Callback:
        pass

    class Trainer:
        def __init__(self, *a, **k):
            raise NotImplementedError('refshim stub Trainer (install pytorch_lightning)')

    class LightningDataModule:
        pass

    pl_mod.LightningModule = LightningModule
    pl_mod.Callback = Callback
    pl_mod.Trainer = Trainer
    pl_mod.LightningDataModule = LightningDataModule
    pl_core = _new_module('pytorch_lightning.core')
    pl_mixins = _new_module('pytorch_lightning.core.mixins')
    pl_mixins.HyperparametersMixin = HyperparametersMixin
    pl_core.mixins = pl_mixins
    pl_mod.core = pl_core
    pl_cb = _new_module('pytorch_lightning.callbacks')
    pl_cb.Callback = Callback
    pl_mod.callbacks = pl_cb

    lf_mod = _new_module('lightning_fabric')
    lf_utils = _new_module('lightning_fabric.utilities')
    lf_rz = _new_module('lightning_fabric.utilities.rank_zero')

    def rank_zero_only(fn):
        return fn

    rank_zero_only.rank = 0
    lf_rz.rank_zero_only = rank_zero_only
    lf_utils.rank_zero = lf_rz
    lf_mod.utilities = lf_utils

    # ---------------------------------------------------------------- skimage
    if 'skimage' not in sys.modules:
        import numpy as np
        sk_mod = _new_module('skimage')

        def img_as_ubyte(img):
            img = np.asarray(img)
            if img.dtype == np.uint8:
                return img
            if np.issubdtype(img.dtype, np.floating):
                return np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
            info = np.iinfo(img.dtype)
            return np.clip(np.round(img.astype(np.float64) / info.max * 255.0),
                           0, 255).astype(np.uint8)

        sk_mod.img_as_ubyte = img_as_ubyte
        sk_measure = _new_module('skimage.measure')

        # Functional: the reference's target-encoding path iterates regionprops
        # (celldetection/data/cpn.py:115,437,447); back it with our scipy-based
        # engine, which provides the label/bbox/image/coords subset it uses.
        from celldetection_tpu.data._regionprops import regionprops as _cdt_regionprops

        sk_measure.regionprops = _cdt_regionprops

        def _sk_label(*a, **k):
            raise NotImplementedError('refshim stub skimage.measure.label')

        sk_measure.label = _sk_label
        sk_mod.measure = sk_measure
        sk_morph = _new_module('skimage.morphology')
        sk_mod.morphology = sk_morph

    # --------------------------------------------------------- inert stubs
    if 'pynvml' not in sys.modules:
        try:
            import pynvml  # noqa: F401
        except ImportError:
            nv_mod = _new_module('pynvml')

            def nvmlInit():
                raise RuntimeError('refshim stub pynvml (no NVIDIA devices)')

            nv_mod.nvmlInit = nvmlInit

            def _nv_getattr(name):
                if name.startswith('__'):
                    raise AttributeError(name)
                return nvmlInit

            nv_mod.__getattr__ = _nv_getattr

    if 'timm' not in sys.modules:
        try:
            import timm  # noqa: F401
        except ImportError:
            timm_mod = _new_module('timm')
            timm_models = _new_module('timm.models')
            timm_layers = _new_module('timm.models.layers')

            def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
                with torch.no_grad():
                    tensor.normal_(mean, std).clamp_(mean + a * std, mean + b * std)
                return tensor

            timm_layers.trunc_normal_ = trunc_normal_
            timm_models.layers = timm_layers
            timm_mod.models = timm_models

            def create_model(*a, **k):
                raise ImportError('refshim stub timm.create_model (timm is not '
                                  'actually installed)')

            timm_mod.create_model = create_model

    for name in ('segmentation_models_pytorch', 'albumentations'):
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            mod = _new_module(name)

            def _raiser(attr, _name=name):
                if attr.startswith('__'):
                    raise AttributeError(attr)

                def _fail(*a, **k):
                    raise ImportError(f'refshim stub {_name}.{attr} '
                                      f'({_name} is not actually installed)')
                return _fail
            mod.__getattr__ = _raiser
            if name == 'segmentation_models_pytorch':
                enc = _new_module(name + '.encoders')

                def get_encoder(*a, **k):
                    raise ImportError('refshim stub smp.encoders.get_encoder '
                                      '(smp is not actually installed)')

                enc.get_encoder = get_encoder
                mod.encoders = enc
