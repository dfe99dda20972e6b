from .stock_pipeline import normalize_staging, run_stock_pipeline, derive_patterns  # noqa: F401
from .news_pipeline import score_news, correlate_signal_with_price  # noqa: F401
