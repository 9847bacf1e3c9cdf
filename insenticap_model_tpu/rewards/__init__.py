from . import ciderd  # noqa: F401
from . import bleu  # noqa: F401
from . import rewards  # noqa: F401
