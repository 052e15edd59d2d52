from .images import *
from .cmaps import *
from . import images, cmaps
