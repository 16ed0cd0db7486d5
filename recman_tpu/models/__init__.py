from .afm import AFM
from .autoint import AutoInt
from .base import Model
from .dcn import DCN
from .dcn_v2 import DCNv2
from .deepfm import DeepFM
from .din import DIN
from .fm import FM
from .xdeepfm import XDeepFM

MODEL_REGISTRY = {m.name: m for m in (FM, DeepFM, DCN, DCNv2, XDeepFM, AFM, DIN, AutoInt)}

__all__ = ["AFM", "AutoInt", "DCN", "DCNv2", "DIN", "DeepFM", "FM", "Model", "XDeepFM", "MODEL_REGISTRY"]
