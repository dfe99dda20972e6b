from .relational import (  # noqa: F401
    latest_per_key,
    top_k,
    top_k_per_key,
    safe_div,
    pct_change_expr,
    weekend_adjust,
)
from .windows import per_key_window, with_lag_features, as_of_join  # noqa: F401
from .indicators import sma, ema, rsi, bollinger, with_indicators  # noqa: F401
from .patterns import detect_trends, detect_ma_cross, detect_volatility  # noqa: F401
