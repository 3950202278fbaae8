from videoquery.index.store import FeatureIndex, FeatureRecord
from videoquery.index.csvio import (
    FeatureCSV,
    read_features_csv,
    write_features_csv,
    read_feature_tree,
)

__all__ = [
    "FeatureIndex",
    "FeatureRecord",
    "FeatureCSV",
    "read_features_csv",
    "write_features_csv",
    "read_feature_tree",
]
