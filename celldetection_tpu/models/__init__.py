from .commons import *
from .unet import *
from .cpn import *
from . import commons, unet, cpn
