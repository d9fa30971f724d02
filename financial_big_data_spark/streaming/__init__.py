from .dedup import enrich_with_dimension, streaming_exact_dedup
from .regime import streaming_bar_stats, streaming_label_transitions

__all__ = [
    "enrich_with_dimension",
    "streaming_bar_stats",
    "streaming_exact_dedup",
    "streaming_label_transitions",
]
