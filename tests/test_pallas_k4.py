"""K4 fused training edge stage: full-model training-mode parity (forward,
BatchNorm state, and gradients) vs the XLA path, interpret mode on CPU, both
symmetry directions, with overflow edges present."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

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


def _setup(flip, window_v=None):
    g, _, _, _ = synthetic_assembly_graph(n_reads=300, genome_len=20000,
                                          read_len=400, seed=70,
                                          with_sequences=True,
                                          false_edge_frac=0.15)
    gt = GraphTensors.from_graph(g, TILE, WIN)
    gt = with_windowed_plans(gt, flip_too=True, tile_e=TILE, window=WIN,
                             window_v=window_v)
    assert (gt.wplan_flip if flip else gt.wplan).n_ovf > 0  # exercise overflow

    cfg = ModelConfig(num_gnn_layers=3, dropout=0.0)
    params, state = init_params(jax.random.PRNGKey(4), cfg)
    state = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.dtype.kind == "f" else a, state)
    x = gt.pad_nodes(node_features(g, reverse=flip))
    e = gt.pad_edges(edge_features(g))
    return g, gt, cfg, params, state, x, e


@pytest.mark.parametrize("flip", [False, True])
def test_k4_training_forward_and_state_parity(flip):
    g, gt, cfg, params, state, x, e = _setup(flip)
    ref, st_ref = forward(params, state, gt, x, e, cfg, backend="xla",
                          flip=flip, training=True)
    got, st_got = forward(params, state, gt, x, e, cfg, backend="pallas",
                          flip=flip, training=True)
    np.testing.assert_allclose(np.asarray(got)[: g.num_edges],
                               np.asarray(ref)[: g.num_edges],
                               atol=5e-5, rtol=1e-4)
    # BatchNorm running stats advance identically (incl. the double update)
    for a, b in zip(jax.tree_util.tree_leaves(st_got),
                    jax.tree_util.tree_leaves(st_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("flip", [False, True])
def test_k4_training_gradient_parity(flip):
    g, gt, cfg, params, state, x, e = _setup(flip)
    mask = np.zeros((gt.n_edges_pad, 1), np.float32)
    mask[: g.num_edges] = 1.0
    mask = jnp.asarray(mask)

    def loss_fn(p, backend):
        logits, _ = forward(p, state, gt, x, e, cfg, backend=backend,
                            flip=flip, training=True)
        return (jnp.abs(logits) * mask).sum() / g.num_edges

    g_ref = jax.grad(lambda p: loss_fn(p, "xla"))(params)
    g_got = jax.grad(lambda p: loss_fn(p, "pallas"))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = jax.tree_util.tree_leaves(g_got)
    for (path, a), b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("flip", [False, True])
def test_k4_training_parity_asymmetric_windows(flip):
    """Per-endpoint window sizes (the production default: narrow v side)
    must not change forward outputs or gradients."""
    g, gt, cfg, params, state, x, e = _setup(flip, window_v=WIN // 2)
    ref, _ = forward(params, state, gt, x, e, cfg, backend="xla",
                     flip=flip, training=True)
    got, _ = forward(params, state, gt, x, e, cfg, backend="pallas",
                     flip=flip, training=True)
    np.testing.assert_allclose(np.asarray(got)[: g.num_edges],
                               np.asarray(ref)[: g.num_edges],
                               atol=5e-5, rtol=1e-4)
    mask = np.zeros((gt.n_edges_pad, 1), np.float32)
    mask[: g.num_edges] = 1.0
    mask = jnp.asarray(mask)

    def loss_fn(p, backend):
        logits, _ = forward(p, state, gt, x, e, cfg, backend=backend,
                            flip=flip, training=True)
        return (jnp.abs(logits) * mask).sum() / g.num_edges

    g_ref = jax.grad(lambda p: loss_fn(p, "xla"))(params)
    g_got = jax.grad(lambda p: loss_fn(p, "pallas"))(params)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                            jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("remat", [True, "full"])
def test_k4_training_gradient_parity_remat(remat):
    """The remat modes change the checkpoint structure around the fused edge
    stage (remat=True: lean edge VJP + checkpointed node stage; "full":
    whole-body replay) — gradients must not change."""
    g, gt, cfg, params, state, x, e = _setup(False)
    mask = np.zeros((gt.n_edges_pad, 1), np.float32)
    mask[: g.num_edges] = 1.0
    mask = jnp.asarray(mask)

    def loss_fn(p, backend, remat_):
        logits, _ = forward(p, state, gt, x, e, cfg, backend=backend,
                            training=True, remat=remat_)
        return (jnp.abs(logits) * mask).sum() / g.num_edges

    g_ref = jax.grad(lambda p: loss_fn(p, "xla", False))(params)
    g_got = jax.grad(lambda p: loss_fn(p, "pallas", remat))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = jax.tree_util.tree_leaves(g_got)
    for (path, a), b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))
