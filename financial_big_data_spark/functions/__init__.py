from .windows import (
    bar_window,
    bollinger,
    log_return,
    pct_change,
    price_diff,
    rolling_mean,
    rolling_std,
    rsi,
    trend_strength,
)

__all__ = [
    "bar_window",
    "bollinger",
    "log_return",
    "pct_change",
    "price_diff",
    "rolling_mean",
    "rolling_std",
    "rsi",
    "trend_strength",
]
