from .keepalive import KeepAlive
from .dropout import StepDropout
