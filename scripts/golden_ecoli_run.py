#!/usr/bin/env python
"""The BASELINE golden run at E. coli scale: edge probabilities, AP, and
greedy-decode contiguity of this framework vs the torch oracle loaded with
the reference's released weights.pt, on the SAME graph.

The reference's named artifact is the hifiasm E. coli example graph
(reference README.md:85-109); hifiasm cannot run in this offline
environment, so the graph is a synthetic E. coli-scale assembly graph
(4.64 Mb genome, ~20 kb HiFi-like reads, ~30x coverage, 15% false edges) —
same scale, same topology class, same feature pipeline.  The torch oracle
(tests/torch_ref.py) is state-dict-compatible with the reference model
(models/full_graph.py:9-31) and loads weights.pt verbatim.

Writes GOLDEN_ECOLI.json at the repo root.  CPU-only; ~2-4 min.

Usage: python scripts/golden_ecoli_run.py [--reads N] [--genome L]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only parity run; sitecustomize pins the axon (TPU) platform, so the
# config override must land before first backend use (see tests/conftest.py)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

WEIGHTS_PT = "/root/reference/weights/weights.pt"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=4800)
    ap.add_argument("--genome", type=int, default=4_641_652)  # E. coli K-12
    ap.add_argument("--read-len", type=int, default=20_000)
    ap.add_argument("--seed", type=int, default=7)
    # discriminating-graph knobs (round-3 verdict: the error-free graph's AP
    # was degenerately 1.0 for every score set — read errors spread true-edge
    # similarities below 1, wrong-strand hard negatives overlap the score
    # distributions, coverage gaps force >1 contig)
    ap.add_argument("--error-rate", type=float, default=0.02)
    ap.add_argument("--hard-false-frac", type=float, default=0.10)
    ap.add_argument("--coverage-gaps", type=int, default=3)
    ap.add_argument("--repeat-pairs", type=int, default=4)
    # band-capped aligner: everything above 75% identity stays exact;
    # diverged pairs (random/wrong-strand) clamp instead of costing O(L*ED)
    ap.add_argument("--sim-band-frac", type=float, default=0.25)
    # The built graph is a versioned fixture: the 40-minute synthetic-graph
    # construction (round-4 verdict: build_seconds 2547 of total 2566) runs
    # ONCE; --cached reloads it and the parity/AP/decode content takes
    # minutes.  A build always refreshes the fixture.
    ap.add_argument("--fixture", default=os.path.join(
        ROOT, "tests", "fixtures", "golden_ecoli_v1.npz"))
    ap.add_argument("--cached", action="store_true",
                    help="load the graph from --fixture when present "
                         "instead of rebuilding")
    ap.add_argument("--out",
                    default=os.path.join(ROOT, "GOLDEN_ECOLI_r05.json"))
    args = ap.parse_args()

    import numpy as np
    import torch

    from gnnome_tpu.config import DecodeConfig, ModelConfig
    from gnnome_tpu.decode.assembly import calculate_n50, calculate_ng50
    from gnnome_tpu.decode.greedy import decode_greedy
    from gnnome_tpu.graphs.synthetic import synthetic_assembly_graph
    from gnnome_tpu.models import (edge_features, node_features,
                                   sym_gated_gcn_forward, torch_to_pytree)
    from gnnome_tpu.ops import GraphTensors
    from gnnome_tpu.train.metrics import average_precision

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from torch_ref import RefSymGatedGCNModel

    t_all = time.perf_counter()
    from gnnome_tpu.graphs.container import AssemblyGraph
    cached = False
    if args.cached and os.path.isfile(args.fixture):
        t0 = time.perf_counter()
        g = AssemblyGraph.load(args.fixture)
        t_build = time.perf_counter() - t0
        cached = True
        print(f"loaded cached golden fixture {args.fixture}: "
              f"{g.num_nodes} nodes / {g.num_edges} edges in {t_build:.1f}s",
              flush=True)
    else:
        print(f"building E. coli-scale graph ({args.reads} reads, "
              f"{args.genome/1e6:.2f} Mb genome)...", flush=True)
        t0 = time.perf_counter()
        g, reads, _, _ = synthetic_assembly_graph(
            n_reads=args.reads, genome_len=args.genome, read_len=args.read_len,
            seed=args.seed, with_labels=True, with_sequences=True,
            false_edge_frac=0.15, error_rate=args.error_rate,
            hard_false_frac=args.hard_false_frac,
            n_coverage_gaps=args.coverage_gaps,
            n_repeat_pairs=args.repeat_pairs,
            sim_band_frac=args.sim_band_frac)
        t_build = time.perf_counter() - t0
        print(f"  {g.num_nodes} nodes / {g.num_edges} edges "
              f"({g.y.sum():.0f} positive) in {t_build:.1f}s", flush=True)
        os.makedirs(os.path.dirname(args.fixture), exist_ok=True)
        g.save(args.fixture)
        print(f"  fixture saved: {args.fixture} "
              f"({os.path.getsize(args.fixture)/1e6:.1f} MB)", flush=True)

    x = node_features(g)
    e = edge_features(g)

    # ---------------------------------------------------------- ours (JAX)
    cfg = ModelConfig()
    params, state = torch_to_pytree(WEIGHTS_PT)
    gt = GraphTensors.from_graph(g)
    t0 = time.perf_counter()
    logits_jax, _ = sym_gated_gcn_forward(
        params, state, gt, gt.pad_nodes(x), gt.pad_edges(e), cfg,
        training=False)
    logits_jax = np.asarray(logits_jax)[: g.num_edges, 0].astype(np.float64)
    t_jax = time.perf_counter() - t0

    # -------------------------------------------------------- torch oracle
    model = RefSymGatedGCNModel(normalization=cfg.normalization)
    sd = torch.load(WEIGHTS_PT, map_location="cpu")
    model.load_state_dict(sd)
    model.eval()
    t0 = time.perf_counter()
    with torch.no_grad():
        logits_t = model(torch.from_numpy(g.src.astype(np.int64)),
                         torch.from_numpy(g.dst.astype(np.int64)),
                         torch.from_numpy(x), torch.from_numpy(e))
    logits_torch = logits_t.numpy().reshape(-1).astype(np.float64)
    t_torch = time.perf_counter() - t0

    # -------------------------------------- per-layer activation max-diff
    # (both stacks stepped layer-by-layer from the same encoder outputs; the
    # jax layers run the XLA path — no windowed plan on from_graph tensors)
    print("per-layer activation parity...", flush=True)
    per_layer = _per_layer_diffs(params, state, cfg, gt, g, x, e, model)
    for row in per_layer:
        print(f"  {row}", flush=True)

    # ------------------------------------------------------------- parity
    probs_jax = 1.0 / (1.0 + np.exp(-logits_jax))
    probs_torch = 1.0 / (1.0 + np.exp(-logits_torch))
    dl = np.abs(logits_jax - logits_torch)
    dp = np.abs(probs_jax - probs_torch)
    y = g.y.astype(np.int32)
    ap_jax = float(average_precision(probs_jax, y))
    ap_torch = float(average_precision(probs_torch, y))
    try:
        from sklearn.metrics import average_precision_score
        ap_sklearn = float(average_precision_score(y, probs_torch))
    except Exception:
        ap_sklearn = None

    # ------------------------------------------------------------- decode
    dcfg = DecodeConfig(load_checkpoint=False)
    results = {}
    for name, sc in (("jax", logits_jax), ("torch", logits_torch),
                     ("labels", None)):
        t0 = time.perf_counter()
        if sc is None:
            res = decode_greedy(g, y.astype(np.float32), dcfg,
                                rng=np.random.default_rng(args.seed),
                                use_labels=True)
        else:
            res = decode_greedy(g, sc.astype(np.float32), dcfg,
                                rng=np.random.default_rng(args.seed))
        lens = res.contigs_len
        results[name] = {
            "contigs": len(lens),
            "total_bases": int(sum(lens)),
            "n50": int(calculate_n50(lens)),
            "ng50": int(calculate_ng50(lens, args.genome)),
            "longest": int(max(lens)) if lens else 0,
            "decode_seconds": round(time.perf_counter() - t0, 2),
        }
        print(f"  decode[{name}]: {results[name]}", flush=True)

    out = {
        "graph": {"nodes": int(g.num_nodes), "edges": int(g.num_edges),
                  "positives": int(y.sum()), "genome_bp": args.genome,
                  "reads": args.reads, "seed": args.seed,
                  "cached_fixture": cached,
                  "build_seconds": round(t_build, 2)},
        "weights": "reference weights.pt (220,529 params), converted",
        "edge_prob_parity": {
            "max_abs_logit_diff": float(dl.max()),
            "max_abs_prob_diff": float(dp.max()),
            "mean_abs_prob_diff": float(dp.mean()),
            "frac_prob_diff_gt_1e-5": float((dp > 1e-5).mean()),
        },
        "average_precision": {"jax": ap_jax, "torch_oracle": ap_torch,
                              "sklearn_on_torch": ap_sklearn,
                              "abs_diff": abs(ap_jax - ap_torch)},
        "per_layer_max_abs_diff": per_layer,
        "decode": results,
        "score_seconds": {"jax_cpu": round(t_jax, 2),
                          "torch_cpu": round(t_torch, 2)},
        "total_seconds": round(time.perf_counter() - t_all, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


def _per_layer_diffs(params, state, cfg, gt, g, x, e, torch_model):
    """Step both stacks one GNN layer at a time from identical encoder
    outputs; return per-layer max|Δh| / max|Δe| (h node space, e edge space,
    first N real rows).  The jax side runs eval-mode XLA layers (the parity
    path); the torch side iterates the oracle's conv list."""
    import numpy as np
    import torch
    import jax
    import jax.numpy as jnp

    from gnnome_tpu.models.nn import mlp2
    from gnnome_tpu.models.sym_gated_gcn import sym_gated_gcn_layer

    n, m = g.num_nodes, g.num_edges
    xt = torch.from_numpy(x)
    et = torch.from_numpy(e)
    src = torch.from_numpy(g.src.astype(np.int64))
    dst = torch.from_numpy(g.dst.astype(np.int64))
    with torch.no_grad():
        h_t = torch_model.linear2_node(torch.relu(torch_model.linear1_node(xt)))
        e_t = torch_model.linear2_edge(torch.relu(torch_model.linear1_edge(et)))

    h_j = mlp2(params["node_encoder"], jnp.asarray(gt.pad_nodes(x)))
    e_j = gt.edges_to_slots(mlp2(params["edge_encoder"],
                                 jnp.asarray(gt.pad_edges(e))))

    num_layers = jax.tree_util.tree_leaves(params["gnn"])[0].shape[0]
    rows = []
    for i in range(num_layers):
        p_l = jax.tree_util.tree_map(lambda a: a[i], params["gnn"])
        s_l = jax.tree_util.tree_map(lambda a: a[i], state["gnn"])
        h_j, e_j, _ = sym_gated_gcn_layer(
            p_l, s_l, gt, h_j, e_j, training=False, flip=False,
            norm=cfg.normalization, drop_rate=0.0, rng=None, backend="xla")
        with torch.no_grad():
            h_t, e_t = torch_model.gnn.convs[i](src, dst, h_t, e_t)
        e_host = np.asarray(gt.slots_to_edges(e_j))[:m]
        dh = float(np.abs(np.asarray(h_j)[:n] - h_t.numpy()).max())
        de = float(np.abs(e_host - e_t.numpy()).max())
        rows.append({"layer": i, "max_abs_dh": dh, "max_abs_de": de})
    return rows


if __name__ == "__main__":
    main()
