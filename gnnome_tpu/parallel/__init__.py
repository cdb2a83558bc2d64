from .mesh import make_mesh, graph_sharding, replicated_sharding  # noqa: F401
from .sharded import shard_graph_tensors, make_sharded_train_step, shard_example  # noqa: F401
