from .market_analysis import market_analysis_plan

__all__ = ["market_analysis_plan"]
