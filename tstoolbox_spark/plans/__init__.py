from .router import (  # noqa: F401
    route_distinct_query,
    route_quantile_query,
    route_tier_query,
)
