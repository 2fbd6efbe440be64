from .router import route_tier_query  # noqa: F401
