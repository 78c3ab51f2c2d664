from .market_analytics import SliceConfig, market_analytics_pipeline  # noqa: F401
