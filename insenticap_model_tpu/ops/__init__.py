from . import adaptive_pool  # noqa: F401
from . import beam  # noqa: F401
from . import ciderd_device  # noqa: F401
from . import fused_attention  # noqa: F401
from . import fused_topk  # noqa: F401
from . import lm_device  # noqa: F401
