from videoquery.nn import bn_inception
from videoquery.nn.tsn import StreamEnsemble, TwoStreamTSN, stack_params

__all__ = ["bn_inception", "StreamEnsemble", "TwoStreamTSN", "stack_params"]
