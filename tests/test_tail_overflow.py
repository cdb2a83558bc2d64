"""Tail-overflow slot layout (round-5 perf lever).

``with_windowed_plans`` reslots the graph so every patched (overflow) edge
lives in one contiguous region at the end of the padded slot space; the XLA
patch paths then run as static slices instead of gathers + full-array
scatters.  These tests pin the layout invariants and the end-to-end equality
of tail mode vs the scatter fallback vs the XLA path (interpret mode).
"""
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


def _graph(seed=50):
    g, _, _, _ = synthetic_assembly_graph(n_reads=300, genome_len=20000,
                                          read_len=400, seed=seed,
                                          with_sequences=True,
                                          false_edge_frac=0.15)
    return g


def _gt(g, tail: bool, monkeypatch):
    monkeypatch.setenv("GN_TAIL_OVF", "1" if tail else "0")
    gt = GraphTensors.from_graph(g, edge_pad_multiple=TILE,
                                 node_pad_multiple=WIN)
    return with_windowed_plans(gt, flip_too=True, tile_e=TILE, window=WIN)


def test_tail_layout_invariants(monkeypatch):
    g = _graph()
    gt = _gt(g, True, monkeypatch)
    for plan in (gt.wplan, gt.wplan_flip):
        assert plan.ovf_start >= 0, "tail mode must activate on this graph"
        R = plan.ovf_slots.shape[0]
        assert R & (R - 1) == 0                       # power of two
        assert plan.ovf_start + R == gt.n_edges_pad   # region at the very end
        assert plan.ovf_start % 2 == 0                # packed-parity aligned
        np.testing.assert_array_equal(
            np.asarray(plan.ovf_slots),
            plan.ovf_start + np.arange(R))            # contiguous
    assert not gt.dst_sorted

    # every real edge appears exactly once; the region head holds exactly
    # the patched reals (interior keeps its positions, minus the holes the
    # moved edges left behind)
    em = gt.host("edge_mask")[:, 0] > 0
    assert int(em.sum()) == g.num_edges
    E0 = gt.wplan.ovf_start
    n_reg = int(np.asarray(gt.wplan.ovf_mask).sum())
    assert em[E0:E0 + n_reg].all() and not em[E0 + n_reg:].any()
    assert int(em[:E0].sum()) + n_reg == g.num_edges

    # the slot maps stay a bijection over all padded slots
    eos, soe = gt.host("eid_of_slot"), gt.host("slot_of_eid")
    np.testing.assert_array_equal(eos[soe], np.arange(eos.shape[0]))


def test_tail_vs_scatter_vs_xla_equality(monkeypatch):
    """Same logits and gradients from tail mode, scatter mode and the XLA
    path, in HOST edge order (slot layouts differ)."""
    g = _graph()
    cfg = ModelConfig(num_gnn_layers=3, dropout=0.0)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    x_np = node_features(g)
    e_np = edge_features(g)
    y = np.random.default_rng(3).integers(0, 2, g.num_edges).astype(np.float32)

    def run(gt, backend, training):
        x = jnp.asarray(gt.pad_nodes(x_np))
        e = jnp.asarray(gt.pad_edges(e_np))
        labels = jnp.asarray(gt.pad_edges(y[:, None]))[:, 0]
        # logits/labels are in HOST edge order here (slot_io=False):
        mask = jnp.asarray(gt.host_prefix_mask(g.num_edges))

        def loss_fn(p):
            logits, _ = forward(p, state, gt, x, e, cfg, training=training,
                                backend=backend, rng=None)
            lo = logits[:, 0]
            return (jnp.abs(lo - labels) * mask).sum() / mask.sum(), lo

        if not training:
            # the fused eval stage is deliberately non-differentiable
            loss, logits = loss_fn(params)
            return np.asarray(logits)[: g.num_edges], float(loss), None
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return np.asarray(logits)[: g.num_edges], float(loss), grads

    gt_tail = _gt(g, True, monkeypatch)
    gt_scat = _gt(g, False, monkeypatch)
    assert gt_tail.wplan.ovf_start >= 0 and gt_scat.wplan.ovf_start < 0

    for training in (False, True):
        lo_t, ls_t, gr_t = run(gt_tail, "pallas", training)
        lo_s, ls_s, gr_s = run(gt_scat, "pallas", training)
        lo_x, ls_x, _ = run(gt_scat, "xla", training)
        np.testing.assert_allclose(lo_t, lo_s, rtol=0, atol=2e-5)
        np.testing.assert_allclose(lo_t, lo_x, rtol=0, atol=2e-5)
        assert abs(ls_t - ls_s) < 1e-6
        if training:
            for a, b in zip(jax.tree_util.tree_leaves(gr_t),
                            jax.tree_util.tree_leaves(gr_s)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0, atol=3e-4)


def test_make_example_mask_matches_label_order(monkeypatch):
    """``make_example``'s loss mask must ride the same ordering as its
    labels: slot-order edge_mask when ``slot_io`` (flagship), host-order
    prefix otherwise (zoo models) — under the tail layout the two orderings
    differ, and mixing them silently leaks pad logits into the loss."""
    from gnnome_tpu.config import Config
    from gnnome_tpu.models.features import edge_features as efeat
    from gnnome_tpu.train.step import make_example

    monkeypatch.setenv("GN_TAIL_OVF", "1")
    g = _graph()
    e = efeat(g)
    y = np.random.default_rng(0).integers(0, 2, g.num_edges).astype(np.float32)
    ind = np.bincount(g.dst, minlength=g.num_nodes).astype(np.float32)
    outd = np.bincount(g.src, minlength=g.num_nodes).astype(np.float32)

    for model, expect_slot in (("sym_gatedgcn", True), ("gcn", False)):
        cfg = Config()
        cfg.model.model = model
        cfg.compute.backend = "pallas"
        cfg.compute.edge_pad_multiple = TILE
        cfg.compute.node_pad_multiple = WIN
        ex = make_example(cfg, ind, outd, e, y, g.src, g.dst, g.num_nodes)
        assert ex.slot_io == expect_slot
        mask = np.asarray(ex.mask)
        labels = np.asarray(ex.labels)
        if expect_slot:
            np.testing.assert_array_equal(
                mask, ex.gt.host("edge_mask")[:, 0])
        else:
            np.testing.assert_array_equal(
                mask, (np.arange(ex.gt.n_edges_pad)
                       < g.num_edges).astype(np.float32))
        # the mask keeps exactly the real labels in either ordering
        assert int(mask.sum()) == g.num_edges
        lab_sum = labels[mask > 0].sum()
        assert abs(lab_sum - y.sum()) < 1e-3


def test_tail_infeasible_small_graph_falls_back(monkeypatch):
    """A graph whose region can't fit keeps the scatter plans unchanged."""
    monkeypatch.setenv("GN_TAIL_OVF", "1")
    # tiny graph: Ep == 128 and R would be >= Ep -> fallback required
    g, _, _, _ = synthetic_assembly_graph(n_reads=40, genome_len=4000,
                                          read_len=400, seed=1,
                                          with_sequences=False,
                                          false_edge_frac=0.8)
    gt = GraphTensors.from_graph(g, edge_pad_multiple=TILE,
                                 node_pad_multiple=WIN)
    gt = with_windowed_plans(gt, flip_too=False, tile_e=TILE, window=WIN)
    if gt.wplan is not None and gt.wplan.ovf_start < 0:
        assert gt.dst_sorted          # untouched layout
