from .graph_tensors import GraphTensors  # noqa: F401
from .message import (  # noqa: F401
    gated_mean_pair,
    gather_endpoints,
    sddmm_add,
    segment_sum_sorted,
    set_default_backend,
)
