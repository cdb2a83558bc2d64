"""Halo-exchange training step: loss/updated-params equality vs the
single-device train step on the 8-virtual-device mesh, plus the multi-chip
train-loop route (``compute.mesh`` in the config)."""
import numpy as np
import jax
import jax.numpy as jnp

from gnnome_tpu.config import Config
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.models.sym_gated_gcn import init_params
from gnnome_tpu.ops import GraphTensors
from gnnome_tpu.parallel import make_mesh
from gnnome_tpu.parallel.halo import (halo_example_from_unit,
                                      make_halo_train_step,
                                      make_halo_eval_step,
                                      halo_scores_to_host)
from gnnome_tpu.parallel.mesh import replicated_sharding
from gnnome_tpu.train.step import make_steps, prepare_units, host_units


def _graph(seed=61):
    g, _, _, _ = synthetic_assembly_graph(n_reads=512, genome_len=40000,
                                          read_len=500, seed=seed,
                                          with_sequences=True,
                                          false_edge_frac=0.0)
    return g


def _cfg():
    cfg = Config()
    cfg.model.dropout = 0.0
    cfg.train.masking = False
    cfg.train.num_nodes_per_cluster = 10**6  # full-graph path
    cfg.compute.edge_pad_multiple = 256
    cfg.compute.node_pad_multiple = 64
    cfg.compute.remat = False
    cfg.compute.bucket_growth = 0.0
    return cfg


def test_halo_train_step_matches_single_device():
    g = _graph()
    cfg = _cfg()

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

    # ---- halo step on the same graph through the production unit builder
    cfg.compute.mesh = 8
    mesh = make_mesh(8)
    (unit,) = host_units(g, cfg, np.random.default_rng(0))
    hex_ = halo_example_from_unit(cfg, mesh, unit)
    assert hex_ is not None
    # same Np => BatchNorm node statistics match the single-device masked BN
    assert hex_.gt.n_nodes_pad == ex.gt.n_nodes_pad

    tx2, halo_step = make_halo_train_step(cfg, mesh)
    rshard = replicated_sharding(mesh)
    params_r = jax.device_put(params, rshard)
    state_r = jax.device_put(state, rshard)
    opt_r = jax.device_put(tx2.init(params), rshard)
    p2, s2, o2, loss2, logits2 = halo_step(
        params_r, state_r, opt_r, hex_.plan, hex_.x, hex_.x_rev,
        hex_.labels, pw, key, hex_.scalars)

    assert abs(float(loss1) - float(loss2)) < 1e-5
    got = halo_scores_to_host(hex_.plan, np.asarray(logits2)[..., None],
                              hex_.gt)
    from gnnome_tpu.train.step import logits_to_host
    np.testing.assert_allclose(got, logits_to_host(ex, logits1),
                               atol=5e-5, rtol=1e-3)
    # updated params agree (Adam first-step tolerance, see test_parallel)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # BN running stats agree
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_halo_eval_step_matches_train_loss_shape():
    g = _graph(seed=62)
    cfg = _cfg()
    cfg.compute.mesh = 8
    mesh = make_mesh(8)
    (unit,) = host_units(g, cfg, np.random.default_rng(1))
    hex_ = halo_example_from_unit(cfg, mesh, unit)
    assert hex_ is not None
    params, state = init_params(jax.random.PRNGKey(3), cfg.model)
    rshard = replicated_sharding(mesh)
    eval_step = make_halo_eval_step(cfg, mesh)
    loss, logits = eval_step(jax.device_put(params, rshard),
                             jax.device_put(state, rshard),
                             hex_.plan, hex_.x, hex_.x_rev, hex_.labels,
                             jnp.asarray(1.0, jnp.float32), hex_.scalars)
    assert np.isfinite(float(loss))
    got = halo_scores_to_host(hex_.plan, np.asarray(logits)[..., None],
                              hex_.gt)
    assert got.shape[0] == g.num_edges


def test_halo_train_remat_and_bf16_runs():
    """remat + bfloat16 on the halo step (the large-graph configuration)."""
    g = _graph(seed=63)
    cfg = _cfg()
    cfg.compute.mesh = 8
    cfg.compute.remat = True
    cfg.compute.dtype = "bfloat16"
    cfg.model.dropout = 0.2
    mesh = make_mesh(8)
    (unit,) = host_units(g, cfg, np.random.default_rng(2))
    hex_ = halo_example_from_unit(cfg, mesh, unit)
    assert hex_ is not None
    params, state = init_params(jax.random.PRNGKey(4), cfg.model)
    tx, halo_step = make_halo_train_step(cfg, mesh)
    rshard = replicated_sharding(mesh)
    params_r = jax.device_put(params, rshard)
    state_r = jax.device_put(state, rshard)
    opt_r = jax.device_put(tx.init(params), rshard)
    p, s, o, loss, logits = halo_step(params_r, state_r, opt_r, hex_.plan,
                                      hex_.x, hex_.x_rev, hex_.labels,
                                      jnp.asarray(1.0, jnp.float32),
                                      jax.random.PRNGKey(5), hex_.scalars)
    assert np.isfinite(float(loss))


def test_train_loop_multichip(tmp_path):
    """`train()` with compute.mesh > 1 runs end-to-end through the halo
    runner (tiny synthetic dataset, 2 epochs)."""
    import os
    from gnnome_tpu.train.loop import train

    root = tmp_path / "ds"
    (root / "hifiasm" / "processed").mkdir(parents=True)
    (root / "hifiasm" / "info").mkdir(parents=True)
    g2, reads, _, _ = synthetic_assembly_graph(n_reads=96, genome_len=8000,
                                               read_len=400, seed=5,
                                               with_sequences=True)
    g2.save(str(root / "hifiasm" / "processed" / "0.npz"))
    reads.save(str(root / "hifiasm" / "info" / "0_reads.npz"))
    root = str(root)
    cfg = Config()
    cfg.train.num_epochs = 2
    cfg.train.masking = False
    cfg.train.num_nodes_per_cluster = 10**6
    cfg.compute.edge_pad_multiple = 256
    cfg.compute.node_pad_multiple = 64
    cfg.compute.mesh = 8
    cfg.compute.remat = False
    cfg.paths.models_path = str(tmp_path / "models")
    cfg.paths.checkpoints_path = str(tmp_path / "ckpts")
    model_path = train(root, root, "hifiasm", out_name="halo-test",
                       overfit=True, cfg=cfg)
    assert os.path.isfile(model_path)
