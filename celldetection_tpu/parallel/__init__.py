from .mesh import *
from .tiles import *
from .train import *
from .tasks import serve, query, sink, TaskServer
from . import mesh, tiles, train, tasks
