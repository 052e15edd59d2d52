from .mesh import *
from .tiles import *
from .train import *
from . import mesh, tiles, train
