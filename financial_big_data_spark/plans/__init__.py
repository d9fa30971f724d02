from .corpus_curation import curate_corpus
from .market_analysis import market_analysis_plan

__all__ = ["curate_corpus", "market_analysis_plan"]
