"""Dual-pass fused mode vs two sequential symmetry passes.

forward_dual runs BOTH symmetry-loss passes (reference train.py:159-185) in
one dual-width fused kernel pass.  These tests pin its equivalence to the
two-pass path — logits of both directions, the chained BN state, and the
gradients of the full symmetry loss — in interpreter mode at f32 (tight
tolerances; fused and two-pass differ only in XLA fusion order)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnnome_tpu.config import ModelConfig
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.models import edge_features, node_features
from gnnome_tpu.models.sym_gated_gcn import init_params, forward, forward_dual
from gnnome_tpu.ops import GraphTensors
from gnnome_tpu.ops.graph_tensors import with_windowed_plans
from gnnome_tpu.ops.pallas_kernels import set_interpret
from gnnome_tpu.train.loss import symmetry_loss


@pytest.fixture(autouse=True)
def _interp():
    set_interpret(True)
    yield
    set_interpret(False)


def _setup(layers=3):
    g, _, _, _ = synthetic_assembly_graph(n_reads=420, genome_len=40000,
                                          read_len=520, seed=11)
    cfg = ModelConfig(num_gnn_layers=layers, dropout=0.0)
    gt = GraphTensors.build(g.src, g.dst, g.num_nodes, 2048, 512)
    gt = with_windowed_plans(gt, flip_too=True)
    x = jnp.asarray(gt.pad_nodes(node_features(g)))
    deg = np.asarray(x)
    x_rev = jnp.asarray(deg[:, [1, 0]])
    e = jnp.asarray(gt.pad_edges(edge_features(g)))
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    y = jnp.asarray(gt.pad_edges(
        np.random.default_rng(3).integers(0, 2, g.num_edges)[:, None]
        .astype(np.float32)))[:, 0]
    return cfg, gt, x, x_rev, e, params, state, y, g


def _two_pass(params, state, gt, x, x_rev, e, cfg, training):
    lo, st = forward(params, state, gt, x, e, cfg, training=training,
                     flip=False, rng=None, backend="pallas")
    lr, st = forward(params, st, gt, x_rev, e, cfg, training=training,
                     flip=True, rng=None, backend="pallas")
    return lo, lr, st


@pytest.mark.parametrize("training", [False, True])
def test_dual_matches_two_pass(training):
    cfg, gt, x, x_rev, e, params, state, y, g = _setup()
    lo2, lr2, st2 = _two_pass(params, state, gt, x, x_rev, e, cfg, training)
    lod, lrd, std = forward_dual(params, state, gt, x, x_rev, e, cfg,
                                 training=training, rng=None,
                                 backend="pallas")
    n = g.num_edges
    np.testing.assert_allclose(np.asarray(lod)[:n], np.asarray(lo2)[:n],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(lrd)[:n], np.asarray(lr2)[:n],
                               rtol=0, atol=5e-5)
    f2 = jax.tree_util.tree_leaves(st2)
    fd = jax.tree_util.tree_leaves(std)
    for a, b in zip(fd, f2):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-6, atol=1e-6)


def test_dual_gradients_match_two_pass():
    cfg, gt, x, x_rev, e, params, state, y, g = _setup(layers=2)
    mask = gt.edge_mask[:, 0]
    pw = jnp.asarray(1.3, jnp.float32)

    def loss2(p):
        lo, lr, _ = _two_pass(p, state, gt, x, x_rev, e, cfg, True)
        return symmetry_loss(lo[:, 0], lr[:, 0], y, pw, alpha=0.1, mask=mask)

    def lossd(p):
        lo, lr, _ = forward_dual(p, state, gt, x, x_rev, e, cfg,
                                 training=True, rng=None, backend="pallas")
        return symmetry_loss(lo[:, 0], lr[:, 0], y, pw, alpha=0.1, mask=mask)

    l2, g2 = jax.value_and_grad(loss2)(params)
    ld, gd = jax.value_and_grad(lossd)(params)
    assert abs(float(l2) - float(ld)) < 2e-6 * (abs(float(l2)) + 1)
    from jax.flatten_util import ravel_pytree
    f2 = np.asarray(ravel_pytree(g2)[0], np.float64)
    fd = np.asarray(ravel_pytree(gd)[0], np.float64)
    rms = np.sqrt((f2 ** 2).mean()) + 1e-12
    err = (np.abs(fd - f2) / np.maximum(np.abs(f2), rms)).max()
    assert err < 2e-4, f"grad rel err {err}"


def test_dual_fallback_without_plan():
    # no windowed plan => forward_dual must route through the two-pass path
    cfg, gt, x, x_rev, e, params, state, y, g = _setup(layers=2)
    import dataclasses
    gt_np = dataclasses.replace(gt, wplan=None, wplan_flip=None)
    lo2, lr2, st2 = _two_pass(params, state, gt_np, x, x_rev, e, cfg, False)
    lod, lrd, _ = forward_dual(params, state, gt_np, x, x_rev, e, cfg,
                               training=False, rng=None, backend="pallas")
    n = g.num_edges
    np.testing.assert_allclose(np.asarray(lod)[:n], np.asarray(lo2)[:n],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lrd)[:n], np.asarray(lr2)[:n],
                               rtol=0, atol=1e-5)


def test_dual_declines_full_remat_beyond_edge_budget(capsys):
    """remat='full' beyond DUAL_FULL_REMAT_MAX_EDGES must take the
    sequential-pass path (the dual carries would blow a 16 GB chip — round-4
    OOM) and say so once; the example builder must provision flip plans for
    exactly that condition."""
    import dataclasses
    import gnnome_tpu.models.sym_gated_gcn as S
    from gnnome_tpu.config import Config
    from gnnome_tpu.train.step import make_example

    cfg, gt, x, x_rev, e, params, state, y, g = _setup(layers=2)
    # pretend the graph is beyond the budget (the gate reads n_edges_pad)
    big = dataclasses.replace(gt, n_edges_pad=S.DUAL_FULL_REMAT_MAX_EDGES + 1)
    object.__setattr__(big, "_host", getattr(gt, "_host", None))
    S._DECLINE_WARNED.clear()
    lo, lr, _ = forward_dual(params, state, big, x, x_rev, e, cfg,
                             training=False, rng=None, backend="pallas",
                             remat="full")
    out = capsys.readouterr().out
    assert "declined" in out and "remat='full'" in out
    # same call again: warned once only
    forward_dual(params, state, big, x, x_rev, e, cfg, training=False,
                 rng=None, backend="pallas", remat="full")
    assert capsys.readouterr().out == ""
    n = g.num_edges
    lo2, lr2, _ = _two_pass(params, state, gt, x, x_rev, e, cfg, False)
    np.testing.assert_allclose(np.asarray(lo)[:n], np.asarray(lo2)[:n],
                               rtol=0, atol=1e-4)

    # the example builder provisions flip plans iff the dual path declines
    c = Config()
    c.compute.backend = "pallas"
    c.compute.remat = "full"
    ex_small = make_example(c, np.ones(g.num_nodes), np.ones(g.num_nodes),
                            np.zeros((g.num_edges, 2), np.float32),
                            np.zeros(g.num_edges, np.float32),
                            g.src, g.dst, g.num_nodes)
    # a small graph keeps the dual path: no flip plan needed
    assert ex_small.gt.wplan_flip is None
