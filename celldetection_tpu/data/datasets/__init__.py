from .generic import GenericH5
from .bbbc039 import BBBC039Train, BBBC039Val, BBBC039Test, download_bbbc039
from .bbbc038 import BBBC038Train, download_bbbc038
from .bbbc041 import BBBC041Train, BBBC041Test, download_bbbc041
from .synth import SynthTrain, SynthVal, SynthTest, download_synth
