from . import trainer
from . import cpn_inference as _cpn_inference_mod
from .trainer import CPNTrainer
from .cpn_inference import cpn_inference, preprocess, resolve_model
