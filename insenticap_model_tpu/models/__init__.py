from . import captioner  # noqa: F401
from . import concept_detector  # noqa: F401
from . import sentiment_detector  # noqa: F401
from . import sent_senti_cls  # noqa: F401
from . import encoder  # noqa: F401
