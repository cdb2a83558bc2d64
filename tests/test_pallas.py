"""Pallas windowed-kernel tests (interpret mode on CPU): plan invariants,
K1/K2 equality vs the XLA path, full-model forward + gradient equality."""
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
from gnnome_tpu.ops.windowed import build_windowed_plan
from gnnome_tpu.ops import message
from gnnome_tpu.ops.pallas_kernels import set_interpret

TILE, WIN = 128, 128


@pytest.fixture(autouse=True)
def _interpret_mode():
    set_interpret(True)
    yield
    set_interpret(False)


def _gt(seed=50, n_reads=300, false_frac=0.15):
    g, _, _, _ = synthetic_assembly_graph(n_reads=n_reads, genome_len=20000,
                                          read_len=400, seed=seed,
                                          with_sequences=True,
                                          false_edge_frac=false_frac)
    gt = GraphTensors.from_graph(g, edge_pad_multiple=TILE,
                                 node_pad_multiple=WIN)
    gt = with_windowed_plans(gt, flip_too=True, tile_e=TILE, window=WIN)
    return g, gt


def _check_plan_invariants(gt, require_ovf=True):
    for plan, u, v in ((gt.wplan, gt.src, gt.dst),
                       (gt.wplan_flip, gt.dst, gt.src)):
        assert plan is not None
        T, W = plan.n_tiles, plan.window
        assert T * plan.tile_e == gt.n_edges_pad
        # lane-major rows -> slot order, dropping sublane pad rows
        rows = plan.tile_e // plan.chunk
        ul = (np.asarray(plan.u_local)
              .reshape(T, plan.rows_p, plan.chunk)[:, :rows, :]
              .reshape(-1))
        blk = np.repeat(np.asarray(plan.u_blk), plan.tile_e).astype(np.int64)
        un = np.asarray(u).astype(np.int64)
        in_win = ul < plan.sentinel          # sentinel == coverage k_u * W
        # in-window locals reconstruct the node id
        np.testing.assert_array_equal((blk * W + ul)[in_win], un[in_win])
        # overflow edges are real, counted, and listed
        ovf = ~in_win & (np.asarray(gt.edge_mask)[:, 0] > 0)
        listed = set(np.asarray(plan.ovf_slots)[: plan.n_ovf].tolist())
        assert set(np.nonzero(ovf)[0].tolist()) <= listed
        if require_ovf:
            # random false edges should yield SOME overflow to exercise
            assert plan.n_ovf > 0


def test_plan_invariants():
    g, gt = _gt()
    _check_plan_invariants(gt)


def test_plan_invariants_auto():
    """Auto-selected per-side (window, k) configs keep all plan invariants
    on a banded graph (the 15% random false edges become overflow)."""
    g, _ = _gt()
    gt = GraphTensors.from_graph(g, edge_pad_multiple=TILE,
                                 node_pad_multiple=512)
    gt = with_windowed_plans(gt, flip_too=True, tile_e=TILE)  # auto
    _check_plan_invariants(gt, require_ovf=False)
    for plan in (gt.wplan, gt.wplan_flip):
        assert plan.k_u >= 2 and plan.k_v >= 2
        assert plan.cover_u <= 2048 and plan.cover_v <= 2048


def test_fused_gate_gather_matches_xla():
    g, gt = _gt()
    rng = np.random.default_rng(0)
    Np, Ep = gt.n_nodes_pad, gt.n_edges_pad
    pu = jnp.asarray(rng.normal(size=(Np, 128)).astype(np.float32))
    pv = jnp.asarray(rng.normal(size=(Np, 128)).astype(np.float32))
    b3e = jnp.asarray(rng.normal(size=(Ep, 64)).astype(np.float32))
    real = np.asarray(gt.edge_mask)[:, 0] > 0  # padded slots are undefined
    for flip in (False, True):
        ref = message.fused_gate_gather(gt, pu, pv, b3e, flip=flip,
                                        backend="xla")
        got = message.fused_gate_gather(gt, pu, pv, b3e, flip=flip,
                                        backend="pallas")
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a)[real], np.asarray(b)[real],
                                       atol=1e-5, rtol=1e-5)


def test_gated_mean_pair_matches_xla():
    g, gt = _gt()
    rng = np.random.default_rng(1)
    Ep = gt.n_edges_pad
    sigma = jnp.asarray(rng.uniform(0, 1, size=(Ep, 1)).astype(np.float32))
    sigma = sigma * gt.edge_mask
    a2h = jnp.asarray(rng.normal(size=(Ep, 64)).astype(np.float32))
    a3h = jnp.asarray(rng.normal(size=(Ep, 64)).astype(np.float32))
    for flip in (False, True):
        ref = message.gated_mean_pair(gt, sigma, a2h, a3h, flip=flip,
                                      backend="xla")
        got = message.gated_mean_pair(gt, sigma, a2h, a3h, flip=flip,
                                      backend="pallas")
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


def test_full_forward_pallas_matches_xla():
    g, gt = _gt()
    cfg = ModelConfig(num_gnn_layers=3, dropout=0.0)
    params, state = init_params(jax.random.PRNGKey(2), cfg)
    x = gt.pad_nodes(node_features(g))
    e = gt.pad_edges(edge_features(g))
    ref, _ = forward(params, state, gt, x, e, cfg, backend="xla")
    got, _ = forward(params, state, gt, x, e, cfg, backend="pallas")
    np.testing.assert_allclose(np.asarray(got)[: g.num_edges],
                               np.asarray(ref)[: g.num_edges],
                               atol=5e-5, rtol=1e-4)


def test_pallas_gradients_match_xla():
    g, gt = _gt(n_reads=200)
    cfg = ModelConfig(num_gnn_layers=2, dropout=0.0)
    params, state = init_params(jax.random.PRNGKey(3), cfg)
    x = gt.pad_nodes(node_features(g))
    e = gt.pad_edges(edge_features(g))
    mask = gt.slots_to_edges(gt.edge_mask)

    def loss(params, backend):
        scores, _ = forward(params, state, gt, x, e, cfg, training=True,
                            backend=backend)
        return jnp.sum(scores * mask)

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_got = jax.grad(lambda p: loss(p, "pallas"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_multiblock_windows_match_xla():
    """k_u=3 / k_v=4 window runs (the auto-select shapes) reproduce the XLA
    forward and training gradients exactly like the 2-block plans."""
    import dataclasses
    g, _ = _gt(n_reads=300)
    gt = GraphTensors.from_graph(g, edge_pad_multiple=TILE,
                                 node_pad_multiple=512)
    plan = build_windowed_plan(gt, flip=False, tile_e=TILE, window=128,
                               window_v=128, k_u=3, k_v=4)
    plan_f = build_windowed_plan(gt, flip=True, tile_e=TILE, window=128,
                                 window_v=128, k_u=4, k_v=3)
    assert plan is not None and plan_f is not None
    assert (plan.k_u, plan.k_v, plan_f.k_u, plan_f.k_v) == (3, 4, 4, 3)
    gt = dataclasses.replace(gt, wplan=plan, wplan_flip=plan_f)
    cfg = ModelConfig(num_gnn_layers=2, dropout=0.0)
    params, state = init_params(jax.random.PRNGKey(4), cfg)
    x = gt.pad_nodes(node_features(g))
    e = gt.pad_edges(edge_features(g))
    ref, _ = forward(params, state, gt, x, e, cfg, backend="xla")
    got, _ = forward(params, state, gt, x, e, cfg, backend="pallas")
    np.testing.assert_allclose(np.asarray(got)[: g.num_edges],
                               np.asarray(ref)[: g.num_edges],
                               atol=5e-5, rtol=1e-4)
    mask = gt.slots_to_edges(gt.edge_mask)

    def loss(params, backend):
        scores, _ = forward(params, state, gt, x, e, cfg, training=True,
                            backend=backend)
        return jnp.sum(scores * mask)

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_got = jax.grad(lambda p: loss(p, "pallas"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_plan_none_for_tiny_graphs():
    g, _, _, _ = synthetic_assembly_graph(n_reads=20, genome_len=2000,
                                          read_len=300, seed=51,
                                          with_sequences=False)
    gt = GraphTensors.from_graph(g, 64, 32)
    assert build_windowed_plan(gt, tile_e=512, window=1024) is None
    # pallas backend silently falls back to XLA without a plan
    rng = np.random.default_rng(0)
    pu = jnp.asarray(rng.normal(size=(gt.n_nodes_pad, 128)).astype(np.float32))
    pv = jnp.asarray(rng.normal(size=(gt.n_nodes_pad, 128)).astype(np.float32))
    b3e = jnp.asarray(rng.normal(size=(gt.n_edges_pad, 64)).astype(np.float32))
    ref = message.fused_gate_gather(gt, pu, pv, b3e, backend="xla")
    got = message.fused_gate_gather(gt, pu, pv, b3e, backend="pallas")
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]))
