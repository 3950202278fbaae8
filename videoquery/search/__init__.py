from videoquery.search.scoring import (
    ensemble_similarities,
    scores_from_similarities,
    weighted_scores,
)
from videoquery.search.optimizer import GridResult, optimize_weights
from videoquery.search.selection import select_clips_to_review, lowest_scoring_user_match
from videoquery.search.target import (
    scale_feature,
    simple_bootstrap,
    valid_plus_invalid_bootstrap,
    TargetEstimator,
)
from videoquery.search.engine import SearchEngine

__all__ = [
    "ensemble_similarities",
    "scores_from_similarities",
    "weighted_scores",
    "GridResult",
    "optimize_weights",
    "select_clips_to_review",
    "lowest_scoring_user_match",
    "scale_feature",
    "simple_bootstrap",
    "valid_plus_invalid_bootstrap",
    "TargetEstimator",
    "SearchEngine",
]
