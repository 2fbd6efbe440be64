from .continuous import (  # noqa: F401
    continuous_bloom,
    continuous_cascade,
    continuous_cms,
    continuous_hist,
    continuous_ingest_dedup,
    continuous_phll,
    continuous_rollup,
)
from .sessions import continuous_session_stats  # noqa: F401
from .stateful import continuous_ewm  # noqa: F401
