#!/usr/bin/env python
"""Projected multi-chip scaling for the five BASELINE configs.

Builds the REAL halo plan (exact strip width K / overflow Rpad) for a graph
at each config's scale and device count, then projects edges/s scaling
efficiency from a measured single-chip step time using the wire model in
gnnome_tpu/parallel/projection.py (assumptions documented there).

Writes SCALING_PROJECTION.json at the repo root and prints a markdown table
for IMPLEMENTATION_NOTES.md.  Host-side numpy only — no TPU needed; pass
``--train-eps/--eval-eps`` to re-anchor on freshly measured BENCH numbers.

Usage: python scripts/scaling_projection.py [--train-eps 2.02e6]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# host-side numpy analysis only; never let sitecustomize pin the TPU platform
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def build_config_graph(name: str, n_nodes: int, avg_degree: float,
                       locality: int, seed: int = 0):
    import numpy as np
    from gnnome_tpu.graphs.synthetic import random_bench_graph
    from gnnome_tpu.ops import GraphTensors

    src, dst = random_bench_graph(n_nodes, avg_degree, seed=seed,
                                  locality=locality)
    # mesh-divisible padding up to the largest projected device count
    gt = GraphTensors.build(src, dst, n_nodes, divisible_by=32)
    e_feat = np.zeros((gt.n_edges_pad, 2), dtype=np.float32)
    return gt, e_feat, int(src.shape[0])


# The five BASELINE configs mapped to graph scales (BASELINE.json):
#  1. E. coli hifiasm example graph (inference)     ~10k nodes, deg ~6
#  2. bacterial-scale full-graph training           ~10k nodes, deg ~6
#  3. Raven ONT topology (denser, longer reach)     ~20k nodes, deg ~8, loc 128
#  4. human chromosome, 1 host (8 chips)            1M nodes, deg ~6
#  5. whole genome CHM13, >=2 hosts                 largest chr ~2M nodes
CONFIGS = [  # (name, n_nodes, degree, locality, train, device_counts, link)
    ("1_ecoli_infer", 9_600, 6.0, 64, False, (2, 4, 8), "ici"),
    ("2_bacterial_train", 9_600, 6.0, 64, True, (2, 4, 8), "ici"),
    ("3_raven_ont_infer", 20_480, 8.0, 128, False, (2, 4, 8), "ici"),
    ("4_human_chr_train_1host", 1_048_576, 6.0, 64, True, (2, 4, 8), "ici"),
    # >=2 hosts: the ring's host-crossing links ride DCN — the slowest link
    # paces every exchange, so project the whole ring at DCN speed (worst
    # case; ICI-internal hops are strictly faster)
    ("5_chm13_train_2hosts", 2_097_152, 6.0, 64, True, (8, 16, 32), "dcn"),
]


def main():
    ap = argparse.ArgumentParser()
    # anchors: round-3 measured single-chip rates at 1.57M edges
    # (commit 74b87d8; re-anchor from BENCH_r04 when available)
    ap.add_argument("--train-eps", type=float, default=2.02e6,
                    help="measured single-chip TRAIN edges/s")
    ap.add_argument("--eval-eps", type=float, default=6.25e6,
                    help="measured single-chip EVAL edges/s")
    ap.add_argument("--tpu", choices=("v5e", "v5p"), default="v5e")
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "SCALING_PROJECTION.json"))
    args = ap.parse_args()

    from gnnome_tpu.parallel.projection import (DCN_GBPS_PER_HOST, ICI_GBPS,
                                                project_curve)

    ici = ICI_GBPS[args.tpu]
    results = {"anchor": {"train_edges_per_s_1chip": args.train_eps,
                          "eval_edges_per_s_1chip": args.eval_eps,
                          "tpu": args.tpu, "ici_gbps": ici,
                          "dcn_gbps": DCN_GBPS_PER_HOST},
               "configs": {}}
    rows = []
    for name, n_nodes, deg, loc, train, counts, linkname in CONFIGS:
        gt, e_feat, n_edges = build_config_graph(name, n_nodes, deg, loc)
        eps = args.train_eps if train else args.eval_eps
        t1 = n_edges / eps
        link = ici if linkname == "ici" else DCN_GBPS_PER_HOST
        curve = project_curve(gt, e_feat, t1, device_counts=counts,
                              link_gbps=link,
                              passes=2 if train else 1, train=train)
        results["configs"][name] = {
            "n_nodes": n_nodes, "n_edges": n_edges,
            "mode": "train" if train else "eval",
            "link": linkname, "link_gbps": link,
            "t_step_1chip_s": round(t1, 6),
            "curve": [p.as_dict() for p in curve],
        }
        for p in curve:
            if p.P > 1:
                rows.append((name, n_edges, p))
        print(f"{name}: E={n_edges} t1={t1*1e3:.2f} ms  " +
              "  ".join(f"P={p.P}: K={p.K} ovf={p.Rpad} "
                        f"eff={p.eff_overlap_measured:.3f}"
                        f"/{p.eff_serial:.3f}"
                        for p in curve if p.P > 1), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)

    print("\n| config | edges | P | K | Rpad | wire ms | hidden ms |"
          " compute ms | eff (measured) | eff (serial) |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for name, n_edges, p in rows:
        print(f"| {name} | {n_edges/1e6:.2f}M | {p.P} | {p.K} | {p.Rpad} |"
              f" {p.t_wire_s*1e3:.3f} | {p.t_hidden_s*1e3:.3f} |"
              f" {p.t_compute_s*1e3:.3f} |"
              f" {p.eff_overlap_measured:.3f} | {p.eff_serial:.3f} |")


if __name__ == "__main__":
    main()
