from .afm import AFM
from .base import Model
from .dcn import DCN
from .deepfm import DeepFM
from .din import DIN
from .fm import FM
from .xdeepfm import XDeepFM

MODEL_REGISTRY = {m.name: m for m in (FM, DeepFM, DCN, XDeepFM, AFM, DIN)}

__all__ = ["AFM", "DCN", "DIN", "DeepFM", "FM", "Model", "XDeepFM", "MODEL_REGISTRY"]
