from .cpn import *
from .boxes import *
from .commons import *
from .loss import *
from .normalization import *
from .draw import *
from . import cpn, boxes, commons, loss, normalization, draw
