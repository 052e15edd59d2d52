from .config import *
from .tiling import *
from .timer import *
from .io import *
from . import config, tiling, timer, io
