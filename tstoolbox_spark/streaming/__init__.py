from .continuous import continuous_cascade, continuous_rollup  # noqa: F401
from .sessions import continuous_session_stats  # noqa: F401
