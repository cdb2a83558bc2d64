"""Halo-exchange graph-parallel tests: numerical equality vs single-device
forward on the 8-virtual-device mesh, and the collective footprint (strip
ppermutes instead of full all-gathers)."""
import numpy as np
import jax

from gnnome_tpu.config import Config
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.infer import score_graph
from gnnome_tpu.models import node_features, edge_features
from gnnome_tpu.models.checkpoint import load_model_weights
from gnnome_tpu.ops import GraphTensors
from gnnome_tpu.parallel import make_mesh
from gnnome_tpu.parallel.halo import (build_halo_plan, make_halo_forward,
                                      halo_scores_to_host)
from gnnome_tpu.parallel.mesh import graph_sharding, replicated_sharding

WEIGHTS = "/root/repo/weights/weights.npz"


def _setup(seed=60, n_reads=512):
    g, _, _, _ = synthetic_assembly_graph(n_reads=n_reads, genome_len=40000,
                                          read_len=500, seed=seed,
                                          with_sequences=True,
                                          false_edge_frac=0.0)
    cfg = Config()
    cfg.compute.edge_pad_multiple = 256
    cfg.compute.node_pad_multiple = 64
    gt = GraphTensors.build(g.src, g.dst, g.num_nodes, 256, 64, divisible_by=8)
    return g, cfg, gt


def test_halo_plan_build():
    g, cfg, gt = _setup()
    e = gt.pad_edges(edge_features(g))
    plan = build_halo_plan(gt, np.asarray(e), 8)
    assert plan is not None
    assert plan.P == 8 and plan.Nb * 8 == gt.n_nodes_pad
    assert plan.K <= plan.Nb // 2
    # every real edge appears exactly once
    assert int(np.asarray(plan.emask).sum()) == gt.n_edges


def test_halo_forward_matches_single_device():
    g, cfg, gt = _setup()
    params, state = load_model_weights(WEIGHTS)
    ref = score_graph(g, params, state, cfg)

    mesh = make_mesh(8)
    e_host = np.asarray(gt.pad_edges(edge_features(g)))
    plan = build_halo_plan(gt, e_host, 8)
    assert plan is not None

    x = np.asarray(gt.pad_nodes(node_features(g)))
    x_blocks = x.reshape(8, plan.Nb, -1)
    fwd = make_halo_forward(cfg, mesh, plan, gt.n_nodes)

    plan_dev = jax.device_put(plan, graph_sharding(mesh))
    x_dev = jax.device_put(x_blocks, graph_sharding(mesh))
    params_r = jax.device_put(params, replicated_sharding(mesh))
    state_r = jax.device_put(state, replicated_sharding(mesh))
    scores_dev = np.asarray(fwd(params_r, state_r, plan_dev, x_dev))
    got = halo_scores_to_host(plan, scores_dev, gt)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_halo_collective_footprint():
    """The halo path must move strips (collective-permute), not the full node
    array (all-gather) — 2 ppermutes per layer + 2 returns + 2 for scoring."""
    g, cfg, gt = _setup()
    params, state = load_model_weights(WEIGHTS)
    mesh = make_mesh(8)
    e_host = np.asarray(gt.pad_edges(edge_features(g)))
    plan = build_halo_plan(gt, e_host, 8)
    x = np.asarray(gt.pad_nodes(node_features(g))).reshape(8, plan.Nb, -1)
    fwd = make_halo_forward(cfg, mesh, plan, gt.n_nodes)
    plan_dev = jax.device_put(plan, graph_sharding(mesh))
    x_dev = jax.device_put(x, graph_sharding(mesh))
    params_r = jax.device_put(params, replicated_sharding(mesh))
    state_r = jax.device_put(state, replicated_sharding(mesh))
    txt = fwd.lower(params_r, state_r, plan_dev, x_dev).compile().as_text()
    assert txt.count("all-gather") == 0
    assert txt.count("collective-permute") > 0
