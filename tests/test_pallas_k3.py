"""K3 fused eval-layer kernel: full-model eval parity vs the XLA path
(interpret mode on CPU), both directions, with overflow edges present."""
import numpy as np
import pytest
import jax

from gnnome_tpu.config import ModelConfig
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.models import edge_features, node_features
from gnnome_tpu.models.sym_gated_gcn import init_params, forward
from gnnome_tpu.ops import GraphTensors
from gnnome_tpu.ops.graph_tensors import with_windowed_plans
from gnnome_tpu.ops.pallas_kernels import set_interpret

TILE, WIN = 128, 128


@pytest.fixture(autouse=True)
def _interpret_mode():
    set_interpret(True)
    yield
    set_interpret(False)


@pytest.mark.parametrize("flip", [False, True])
def test_k3_full_model_eval_parity(flip):
    g, _, _, _ = synthetic_assembly_graph(n_reads=300, genome_len=20000,
                                          read_len=400, seed=70,
                                          with_sequences=True,
                                          false_edge_frac=0.15)
    gt = GraphTensors.from_graph(g, TILE, WIN)
    gt = with_windowed_plans(gt, flip_too=True, tile_e=TILE, window=WIN)
    assert (gt.wplan_flip if flip else gt.wplan).n_ovf > 0  # exercise overflow

    cfg = ModelConfig(num_gnn_layers=3, dropout=0.0)
    params, state = init_params(jax.random.PRNGKey(4), cfg)
    # non-trivial BN running stats so the affine fold is actually tested
    state = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.dtype.kind == "f" else a, state)

    x = gt.pad_nodes(node_features(g, reverse=flip))
    e = gt.pad_edges(edge_features(g))
    ref, _ = forward(params, state, gt, x, e, cfg, backend="xla", flip=flip)
    got, _ = forward(params, state, gt, x, e, cfg, backend="pallas", flip=flip)
    np.testing.assert_allclose(np.asarray(got)[: g.num_edges],
                               np.asarray(ref)[: g.num_edges],
                               atol=5e-5, rtol=1e-4)
