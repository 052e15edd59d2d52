from .cpn import *
from .misc import *
from .segmentation import *
from .instance_eval import *
from .toydata import *
from .transforms import *
from ._regionprops import regionprops
from .targets import *
from .augmentation import conf2augmentation
from . import (cpn, misc, segmentation, instance_eval, toydata, transforms, targets,
               augmentation, datasets)
