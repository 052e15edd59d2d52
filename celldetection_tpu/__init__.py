"""celldetection_tpu — TPU-native cell instance segmentation with Contour Proposal Networks.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
``celldetection`` PyTorch library (FZJ-INM1-BDA/celldetection): CPN models,
backbones, target encoding, instance metrics, tiled gigapixel inference, and
multi-chip sharded execution on TPU meshes.

Typical usage::

    import celldetection_tpu as cdt
    model = cdt.models.CpnU22(in_channels=3)
    detections = model(images)          # NCHW or NHWC, uint8 or float
"""
from .__meta__ import __version__
from . import ops
from . import data
from . import models
from . import util
from . import parallel
from . import optim
from . import callbacks
from . import runtime
from . import visualization
from . import native
from . import kernels
from .util.config import (Config, Schedule, conf2call, conf2optimizer, conf2scheduler,
                          conf2tweaks_)
from .util.tiling import Tiling, get_tiling_slices
from .data.cpn import CPNTargetGenerator
from .data.instance_eval import LabelMatcher, LabelMatcherList
from .parallel.tiles import TiledInference
from .runtime.trainer import CPNTrainer
from .runtime.cpn_inference import cpn_inference
from .util.serialization import fetch_model, load_model, save_model
