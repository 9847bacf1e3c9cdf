from . import collate  # noqa: F401
from . import feature_store  # noqa: F401
from . import loaders  # noqa: F401
