from .config import *
from .tiling import *
from .timer import *
from .io import *
from .serialization import *
from .torch_import import (translate_cpn_state_dict, import_state_dict,
                           load_torch_cd_model, export_torch_state_dict)
from .logging import MetricsLogger, log_figure
from .surgery import *
from .system import *
from .shm_cache import ShmCache
from .rois import save_rois, contour2roi_bytes, load_imagej_rois, roi_bytes2contour
from .misc import *
from .init import torch_init_variables, detect_encoder_family
from .pretrained import (DEFAULT_MODEL_URLS, resolve_pretrained,
                         resolve_pretrained_state, apply_pretrained_)
from . import (config, tiling, timer, io, serialization, torch_import, logging,
               surgery, system, shm_cache, rois, misc, pretrained)
