from .commons import *
from .unet import *
from .resnet import *
from .fpn import *
from .cpn import *
from . import commons, unet, resnet, fpn, cpn
