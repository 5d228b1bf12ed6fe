from .config import Config, compose, read_override_file  # noqa: F401
from .registry import instantiate, call, register  # noqa: F401
