from . import layers, blocks, mapping, backbones, fusion, predictor, cmfp, base_model  # noqa: F401
from .base_model import BaseModel  # noqa: F401
