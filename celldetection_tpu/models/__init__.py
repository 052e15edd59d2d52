from .commons import *
from .unet import *
from .resnet import *
from .fpn import *
from .convnext import *
from .densenet import *
from .mobilenetv3 import *
from .manet import *
from .filters import *
from .ppm import *
from .features import *
from .normalization import *
from .cpn import *
from .inference import Inference
from .mamba import Mamba, MambaLayer, selective_scan
from . import (commons, unet, resnet, fpn, convnext, densenet, mobilenetv3, manet,
               filters, ppm, features, normalization, cpn, inference, mamba)
