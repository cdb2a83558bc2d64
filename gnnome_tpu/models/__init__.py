from . import sym_gated_gcn  # noqa: F401
from .sym_gated_gcn import forward as sym_gated_gcn_forward  # noqa: F401
from .sym_gated_gcn import init_params as sym_gated_gcn_init  # noqa: F401
from .convert import torch_to_pytree, pytree_to_torch  # noqa: F401
from .features import edge_features, node_features  # noqa: F401
