from .graph_tensors import GraphTensors, with_windowed_plans  # noqa: F401
from .message import (  # noqa: F401
    fused_gate_gather,
    gated_mean_pair,
    gather_uv,
    sddmm_add,
    segment_sum_sorted,
    set_default_backend,
)
