from .generic import GenericH5
from .bbbc039 import BBBC039Train, BBBC039Val, BBBC039Test
from .synth import SynthTrain, SynthVal, SynthTest
