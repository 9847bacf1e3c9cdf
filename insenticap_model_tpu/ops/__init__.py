from . import beam  # noqa: F401
from . import adaptive_pool  # noqa: F401
