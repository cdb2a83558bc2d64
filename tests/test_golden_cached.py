"""Golden-fixture fast check (round-5 verdict ask #3).

The discriminating E. coli-scale golden graph is a cached versioned fixture
(tests/fixtures/golden_ecoli_v1.npz, built once by
scripts/golden_ecoli_run.py); this test re-runs the PARITY content — jax vs
the torch oracle with the converted reference weights.pt — on a subgraph in
seconds, so the gate rides the normal test flow instead of a 40-minute
rebuild.  Full-graph AP + decode parity stays in the script
(GOLDEN_ECOLI_r05.json).
"""
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_ecoli_v1.npz")
WEIGHTS_PT = "/root/reference/weights/weights.pt"

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(FIXTURE) and os.path.isfile(WEIGHTS_PT)),
    reason="golden fixture or reference weights.pt not present")


@pytest.fixture(scope="module")
def golden_sub():
    from gnnome_tpu.graphs.container import AssemblyGraph
    g = AssemblyGraph.load(FIXTURE)
    # The graph is banded along the genome, but the hard negatives (repeat
    # cross-copy edges: similarity ~1, label 0) connect DISTANT copies, so no
    # contiguous node range contains both endpoints.  Take the band around
    # node 0 plus bands around the endpoints of the first few hard negatives
    # so the subgraph sample stays discriminating (AP strictly < 1).
    hard = np.nonzero((g.y == 0) & (g.overlap_similarity > 0.95))[0]
    keep = np.zeros(g.num_nodes, dtype=bool)
    keep[:1600] = True
    band = 400
    for eid in hard[:: max(1, len(hard) // 4)][:4]:
        for v in (int(g.src[eid]), int(g.dst[eid])):
            keep[max(0, v - band): v + band] = True
    sub, _, _ = g.node_subgraph(keep)
    assert sub.num_edges > 10_000
    assert ((sub.y == 0) & (sub.overlap_similarity > 0.95)).sum() > 0
    return sub


@pytest.mark.slow
def test_cached_golden_subgraph_parity(golden_sub):
    import torch
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_ref import RefSymGatedGCNModel

    from gnnome_tpu.config import ModelConfig
    from gnnome_tpu.models import (edge_features, node_features,
                                   sym_gated_gcn_forward, torch_to_pytree)
    from gnnome_tpu.ops import GraphTensors
    from gnnome_tpu.train.metrics import average_precision

    g = golden_sub
    x = node_features(g)
    e = edge_features(g)

    params, state = torch_to_pytree(WEIGHTS_PT)
    gt = GraphTensors.from_graph(g)
    logits_jax, _ = sym_gated_gcn_forward(
        params, state, gt, gt.pad_nodes(x), gt.pad_edges(e), ModelConfig(),
        training=False)
    lo_jax = np.asarray(logits_jax)[: g.num_edges, 0].astype(np.float64)

    model = RefSymGatedGCNModel(normalization="batch")
    model.load_state_dict(torch.load(WEIGHTS_PT, map_location="cpu"))
    model.eval()
    with torch.no_grad():
        lo_t = model(torch.from_numpy(g.src.astype(np.int64)),
                     torch.from_numpy(g.dst.astype(np.int64)),
                     torch.from_numpy(x), torch.from_numpy(e))
    lo_torch = lo_t.numpy().reshape(-1).astype(np.float64)

    p_jax = 1 / (1 + np.exp(-lo_jax))
    p_torch = 1 / (1 + np.exp(-lo_torch))
    assert np.abs(p_jax - p_torch).max() < 1e-4

    y = g.y.astype(np.int32)
    ap = average_precision(p_jax, y)
    ap_t = average_precision(p_torch, y)
    # discriminating but not degenerate (round-4 golden recipe)
    assert 0.9 < ap < 1.0
    assert abs(ap - ap_t) < 1e-4
