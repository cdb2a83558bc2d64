"""Halo-exchange training step: loss/updated-params equality vs the
single-device train step on the 8-virtual-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from gnnome_tpu.config import Config
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.models import node_features, edge_features
from gnnome_tpu.models.sym_gated_gcn import init_params
from gnnome_tpu.ops import GraphTensors
from gnnome_tpu.parallel import make_mesh
from gnnome_tpu.parallel.halo import (build_halo_plan, make_halo_train_step,
                                      to_device_edges, halo_scores_to_host)
from gnnome_tpu.parallel.mesh import graph_sharding, replicated_sharding
from gnnome_tpu.train.step import make_steps, prepare_units


def test_halo_train_step_matches_single_device():
    g, _, _, _ = synthetic_assembly_graph(n_reads=512, genome_len=40000,
                                          read_len=500, seed=61,
                                          with_sequences=True,
                                          false_edge_frac=0.0)
    cfg = Config()
    cfg.model.dropout = 0.0
    cfg.train.masking = False
    cfg.train.num_nodes_per_cluster = 10**6  # full-graph path
    cfg.compute.edge_pad_multiple = 256
    cfg.compute.node_pad_multiple = 64
    cfg.compute.remat = False

    # ---- single-device reference step
    rng = np.random.default_rng(0)
    (ex,) = prepare_units(g, cfg, rng)
    params, state = init_params(jax.random.PRNGKey(7), cfg.model)
    tx, train_step, _ = make_steps(cfg)
    opt_state = tx.init(params)
    pw = jnp.asarray(1.3, jnp.float32)
    key = jax.random.PRNGKey(9)
    p1, s1, o1, loss1, logits1 = train_step(params, state, opt_state, ex.gt,
                                            ex.x, ex.x_rev, ex.e, ex.labels,
                                            ex.mask, pw, key)

    # ---- halo step on the same padded graph
    gt = GraphTensors.build(g.src, g.dst, g.num_nodes, 256, 64, divisible_by=8)
    e_host = np.asarray(gt.pad_edges(edge_features(g)))
    plan = build_halo_plan(gt, e_host, 8)
    assert plan is not None
    # same Np => BatchNorm node statistics match the single-device masked BN
    assert gt.n_nodes_pad == ex.gt.n_nodes_pad

    mesh = make_mesh(8)
    x = np.asarray(gt.pad_nodes(node_features(g))).reshape(8, plan.Nb, -1)
    xr = np.asarray(gt.pad_nodes(
        node_features(g, reverse=True))).reshape(8, plan.Nb, -1)
    labels = to_device_edges(
        plan, np.asarray(gt.pad_edges(g.y.astype(np.float32)[:, None])), gt)

    tx2, halo_step = make_halo_train_step(cfg, mesh, plan, gt.n_nodes)
    gshard, rshard = graph_sharding(mesh), replicated_sharding(mesh)
    params_r = jax.device_put(params, rshard)
    state_r = jax.device_put(state, rshard)
    opt_r = tx2.init(params_r)
    plan_dev = jax.device_put(plan, gshard)
    p2, s2, o2, loss2, logits2 = halo_step(
        params_r, state_r, opt_r, plan_dev,
        jax.device_put(x, gshard), jax.device_put(xr, gshard),
        jax.device_put(labels, gshard), pw, key)

    assert abs(float(loss1) - float(loss2)) < 1e-5
    got = halo_scores_to_host(plan, np.asarray(logits2)[..., None], gt)
    np.testing.assert_allclose(got, np.asarray(logits1)[: g.num_edges],
                               atol=5e-5, rtol=1e-3)
    # updated params agree (Adam first-step tolerance, see test_parallel)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # BN running stats agree
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
