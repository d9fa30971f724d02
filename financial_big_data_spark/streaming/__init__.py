from .regime import streaming_bar_stats, streaming_label_transitions

__all__ = ["streaming_bar_stats", "streaming_label_transitions"]
