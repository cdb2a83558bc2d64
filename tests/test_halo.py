"""Halo-exchange graph-parallel tests: numerical equality vs single-device
forward on the 8-virtual-device mesh, the collective footprint (strip
ppermutes instead of full all-gathers), and the production routing
(``score_graph`` with ``compute.mesh`` set goes through the halo path)."""
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
                                      halo_scores_to_host,
                                      prepare_halo_example, halo_score_graph)
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
    assert plan.K <= plan.Nb // 2 + 8
    # every real edge appears exactly once
    assert int(np.asarray(plan.emask).sum()) == gt.n_edges


def test_halo_plan_tiny_blocks_fall_back():
    """Nb < K floor (huge mesh / tiny graph) must yield None (GSPMD
    fallback), never a plan whose strip slices would crash inside jit."""
    from gnnome_tpu.graphs.synthetic import synthetic_assembly_graph
    g, _, _, _ = synthetic_assembly_graph(n_reads=30, genome_len=3000,
                                          read_len=300, seed=3)
    # force Nb = Np/P below the K floor of 8
    gt = GraphTensors.build(g.src, g.dst, g.num_nodes, 128, 4,
                            divisible_by=4)
    P = gt.n_nodes_pad // 4
    plan = build_halo_plan(gt, np.zeros((gt.n_edges_pad, 2), np.float32), P)
    assert plan is None


def _halo_scores(g, cfg, gt, params, state, mesh):
    ex = prepare_halo_example(cfg, mesh, gt, node_features(g), None,
                              edge_features(g), None, bucket_growth=0.0)
    assert ex is not None
    fwd = make_halo_forward(cfg, mesh)
    params_r = jax.device_put(params, replicated_sharding(mesh))
    state_r = jax.device_put(state, replicated_sharding(mesh))
    return fwd, ex, params_r, state_r


def test_halo_forward_matches_single_device():
    g, cfg, gt = _setup()
    params, state = load_model_weights(WEIGHTS)
    ref = score_graph(g, params, state, cfg)

    mesh = make_mesh(8)
    fwd, ex, params_r, state_r = _halo_scores(g, cfg, gt, params, state, mesh)
    scores_dev = np.asarray(fwd(params_r, state_r, ex.plan, ex.x, ex.scalars))
    got = halo_scores_to_host(ex.plan, scores_dev, gt)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_halo_collective_footprint_and_overlap():
    """The halo path must move strips (collective-permute), not the full node
    array (all-gather), and the exchange must be double-buffered: RAW d-wide
    strips leave at each layer's TAIL and are consumed at the next layer's
    head (projected receiver-side), so the in-flight window spans the scan
    back-edge structurally — not by scheduler luck.  (On TPU lowering these
    become async start/done pairs; the CPU mesh lowers them synchronously,
    so the structure is checked via count and width.)"""
    import re

    g, cfg, gt = _setup()
    params, state = load_model_weights(WEIGHTS)
    mesh = make_mesh(8)
    fwd, ex, params_r, state_r = _halo_scores(g, cfg, gt, params, state, mesh)
    txt = fwd.lower(params_r, state_r, ex.plan, ex.x,
                    ex.scalars).compile().as_text()
    assert txt.count("all-gather") == 0
    perms = re.findall(r"f32\[\d+,(\d+)\][^\n]*collective-permute\(", txt)
    # exactly 6: 2 initial strips (pre-scan), 2 per-body strips (layer-tail
    # raw h), 2 per-body aggregation returns; the predictor reuses the final
    # in-flight strips (NO extra exchange).
    assert len(perms) == 6, perms
    d = cfg.model.dim_latent
    # 4 strip permutes are RAW d-wide (not 4d projected), 2 returns are 2d
    assert sorted(int(w) for w in perms) == [d, d, d, d, 2 * d, 2 * d]


def test_score_graph_mesh_routes_through_halo(monkeypatch):
    """compute.mesh > 1 must use the halo path for banded graphs — the GSPMD
    fallback (2 all-gathers per layer) must not be touched."""
    g, cfg, gt = _setup()
    params, state = load_model_weights(WEIGHTS)
    ref = score_graph(g, params, state, cfg)

    import gnnome_tpu.parallel.sharded as sharded

    def boom(*a, **k):
        raise AssertionError("GSPMD fallback used for a banded graph")

    monkeypatch.setattr(sharded, "sharded_score_graph", boom)
    cfg.compute.mesh = 8
    got = score_graph(g, params, state, cfg)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_halo_overflow_edges_match_single_device():
    """Stray long-range edges (false overlaps) must route through the psum'd
    overflow row buffer and still reproduce the single-device logits."""
    g, _, _, _ = synthetic_assembly_graph(n_reads=512, genome_len=40000,
                                          read_len=500, seed=77,
                                          with_sequences=True,
                                          false_edge_frac=0.01)
    cfg = Config()
    cfg.compute.edge_pad_multiple = 256
    cfg.compute.node_pad_multiple = 64
    gt = GraphTensors.build(g.src, g.dst, g.num_nodes, 256, 64, divisible_by=8)
    plan = build_halo_plan(gt, np.asarray(gt.pad_edges(edge_features(g))), 8)
    assert plan is not None and plan.n_ovf > 0, \
        "test graph must actually exercise the overflow path"

    params, state = load_model_weights(WEIGHTS)
    ref = score_graph(g, params, state, cfg)
    mesh = make_mesh(8)
    fwd, ex, params_r, state_r = _halo_scores(g, cfg, gt, params, state, mesh)
    scores_dev = np.asarray(fwd(params_r, state_r, ex.plan, ex.x, ex.scalars))
    got = halo_scores_to_host(ex.plan, scores_dev, gt)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_halo_score_graph_none_for_unbanded():
    """A graph whose reach exceeds the block size yields no plan (caller
    falls back to GSPMD)."""
    rng = np.random.default_rng(0)
    n = 512
    src = rng.integers(0, n, 4000).astype(np.int32)
    dst = rng.integers(0, n, 4000).astype(np.int32)

    class G:
        num_nodes = n
        num_edges = 4000

    g = G()
    g.src, g.dst = src, dst
    gt = GraphTensors.build(src, dst, n, 256, 64, divisible_by=8)
    plan = build_halo_plan(gt, np.zeros((gt.n_edges_pad, 2), np.float32), 8)
    assert plan is None


def test_halo_band_reorder_for_shuffled_graph():
    """A graph whose node ids are randomly permuted (not genome-ordered)
    yields no identity-order plan, but halo_score_graph re-bands it with the
    BFS pair order and still matches the single-device logits."""
    import dataclasses
    from gnnome_tpu.parallel.halo import band_order

    g, cfg, gt0 = _setup(seed=5)
    rng = np.random.default_rng(4)
    pair_perm = rng.permutation(g.num_nodes // 2)
    new_of_old = np.empty(g.num_nodes, dtype=np.int64)
    new_of_old[0::2] = 2 * pair_perm
    new_of_old[1::2] = 2 * pair_perm + 1
    old_of_new = np.argsort(new_of_old)
    g2 = dataclasses.replace(
        g, src=new_of_old[g.src].astype(g.src.dtype),
        dst=new_of_old[g.dst].astype(g.dst.dtype),
        read_length=g.read_length[old_of_new], _csr=None, _csc=None)

    gt2 = GraphTensors.build(g2.src, g2.dst, g2.num_nodes, 256, 64,
                             divisible_by=8)
    assert build_halo_plan(
        gt2, np.asarray(gt2.pad_edges(edge_features(g2))), 8) is None, \
        "shuffled graph must not be banded in identity order"
    # RC-pair adjacency is preserved by the re-banding permutation
    nn = band_order(g2.src, g2.dst, g2.num_nodes)
    assert np.array_equal(nn[0::2] ^ 1, nn[1::2])

    params, state = load_model_weights(WEIGHTS)
    ref = score_graph(g2, params, state, cfg)
    got = halo_score_graph(g2, params, state, cfg, make_mesh(8))
    assert got is not None, "band reordering should recover a halo plan"
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
