from . import io  # noqa: F401
from .logger import logger, set_verbose, is_verbose  # noqa: F401
