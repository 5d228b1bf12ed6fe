from .config import Config, compose  # noqa: F401
from .registry import instantiate, call, register  # noqa: F401
