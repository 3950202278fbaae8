from videoquery.core.config import (
    BrokerConfig,
    ExtractionConfig,
    HyperParams,
    SearchConfig,
    compute_eps,
)
from videoquery.core.meshes import make_mesh, data_sharding, replicated_sharding

__all__ = [
    "BrokerConfig",
    "ExtractionConfig",
    "HyperParams",
    "SearchConfig",
    "compute_eps",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
]
