from .regime import coarse_regime, detect_regime_5way, regime_features
from .transitions import regime_runs, regime_transitions, top_transitions, transition_matrix

__all__ = [
    "coarse_regime",
    "detect_regime_5way",
    "regime_features",
    "regime_runs",
    "regime_transitions",
    "top_transitions",
    "transition_matrix",
]
