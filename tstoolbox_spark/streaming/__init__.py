from .continuous import continuous_rollup  # noqa: F401
