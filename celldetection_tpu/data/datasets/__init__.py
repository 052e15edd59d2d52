from .generic import GenericH5
from .bbbc039 import BBBC039Train, BBBC039Val, BBBC039Test
from .bbbc038 import BBBC038Train
from .bbbc041 import BBBC041Train, BBBC041Test
from .synth import SynthTrain, SynthVal, SynthTest
