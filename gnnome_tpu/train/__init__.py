from .loss import bce_with_logits, symmetry_loss  # noqa: F401
from .metrics import calculate_tfpn, calculate_metrics, calculate_metrics_inverse, compute_metrics  # noqa: F401
from .scheduler import ReduceLROnPlateau  # noqa: F401
