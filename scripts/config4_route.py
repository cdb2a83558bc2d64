#!/usr/bin/env python
"""BASELINE config 4 (human-chromosome-scale training) post-ceiling-correction
(round-5 verdict ask #5).

The round-4 memory correction put the single-chip full-graph symmetry-train
ceiling at ~3.6M padded edges (16 GB v5e), so the 6.3M-edge config-4 unit
takes the reference's own route — cluster-minibatch training
(reference train.py:335,404: METIS partitions above num_nodes_per_cluster).
This run quantifies what that route costs:

  A. config-4 scale (1M nodes / ~6.3M edges): cluster-minibatch training on
     one real chip — edges/s, units/epoch, compile count.
  B. convergence comparison at a size that fits BOTH routes (~459k nodes /
     ~2.8M edges, inside the dual-pass full-remat ceiling): N epochs of
     full-graph training vs N epochs of cluster training from the same
     init, evaluated each epoch on the SAME full graph — the loss/AP gap
     IS the cost of the cluster route's gradient approximation.

Writes CONFIG4_ROUTE_r05.json at the repo root.  Runs on the real TPU
(single process, tunnel-friendly: everything in one process).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT = os.path.join(ROOT, "CONFIG4_ROUTE_r05.json")


class CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.count = 0

    def emit(self, record):
        if "Finished XLA compilation" in record.getMessage():
            self.count += 1


def build_graph(n_nodes: int, seed: int):
    from gnnome_tpu.graphs.synthetic import positional_bench_assembly_graph
    return positional_bench_assembly_graph(n_nodes, seed)


def make_cfg(cluster: int, remat, epochs: int):
    from gnnome_tpu.config import Config
    cfg = Config()
    cfg.train.num_epochs = epochs
    cfg.train.seed = 1
    cfg.train.masking = False
    cfg.train.num_nodes_per_cluster = cluster
    cfg.compute.dtype = "bfloat16"
    cfg.compute.matmul_precision = "default"   # bf16 perf mode (as bench.py)
    cfg.compute.remat = remat
    cfg.compute.bucket_growth = 1.2
    return cfg


def run_units(g, cfg, epochs: int, eval_graph=None, label=""):
    """Minimal deterministic trainer over host_units (the real unit pipeline
    — masking/clustering/bucketing identical to train.loop), recording
    per-epoch mean train loss and (optionally) full-graph eval loss/AP."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gnnome_tpu.models.sym_gated_gcn import init_params
    from gnnome_tpu.train.metrics import get_aps
    from gnnome_tpu.train.step import (host_units, make_example, make_steps,
                                       logits_to_host)
    from gnnome_tpu.config import resolve_backend

    cfg.compute.backend = resolve_backend(cfg.compute)
    tx, train_step, eval_step = make_steps(cfg)
    params, state = init_params(jax.random.PRNGKey(1), cfg.model)
    opt_state = tx.init(params)

    pos = float((g.y == 1).sum())
    neg = float((g.y == 0).sum())
    pw = jnp.asarray(neg / max(pos, 1.0), jnp.float32)

    rng_np = np.random.default_rng(0)
    t0 = time.perf_counter()
    units = host_units(g, cfg, rng_np, shuffle_parts=False)
    exs = [make_example(cfg, u.in_deg, u.out_deg, u.e_feat, u.y, u.src,
                        u.dst, u.n_nodes, bucket_growth=u.bucket_growth)
           for u in units]
    t_prep = time.perf_counter() - t0
    ex_ev = None
    if eval_graph is not None:
        u_ev = host_units(eval_graph, cfg_override_cluster(cfg),
                          np.random.default_rng(0), shuffle_parts=False)[0]
        ex_ev = make_example(cfg, u_ev.in_deg, u_ev.out_deg, u_ev.e_feat,
                             u_ev.y, u_ev.src, u_ev.dst, u_ev.n_nodes)

    rows = []
    total_edges = 0
    t_train0 = time.perf_counter()
    for ep in range(epochs):
        t_ep = time.perf_counter()
        losses = []
        for ex in exs:
            params, state, opt_state, loss, _ = train_step(
                params, state, opt_state, ex.gt, ex.x, ex.x_rev, ex.e,
                ex.labels, ex.mask, pw, jax.random.PRNGKey(ep))
            losses.append(float(loss))
            total_edges += ex.n_edges
        row = {"epoch": ep, "train_loss": float(np.mean(losses)),
               "epoch_wall_s": round(time.perf_counter() - t_ep, 2)}
        if ex_ev is not None:
            ev_loss, ev_logits = eval_step(params, state, ex_ev.gt, ex_ev.x,
                                           ex_ev.x_rev, ex_ev.e,
                                           ex_ev.labels, ex_ev.mask, pw)
            lo = logits_to_host(ex_ev, np.asarray(ev_logits))
            row["eval_loss"] = float(ev_loss)
            row["eval_ap"] = round(get_aps(
                lo.astype(np.float64), eval_graph.y.astype(np.int32)), 6)
        rows.append(row)
        print(f"  [{label}] {row}", flush=True)
    wall = time.perf_counter() - t_train0
    return {"units_per_epoch": len(exs), "prep_s": round(t_prep, 1),
            "train_wall_s": round(wall, 1),
            "edges_per_s": round(total_edges / wall, 1),
            "epochs": rows}


def cfg_override_cluster(cfg):
    import dataclasses
    c2 = dataclasses.replace(cfg)
    c2.train = dataclasses.replace(cfg.train, num_nodes_per_cluster=10 ** 12)
    return c2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=["a", "b", "all"])
    ap.add_argument("--config4-nodes", type=int, default=1_048_576)
    ap.add_argument("--both-nodes", type=int, default=458_752)
    ap.add_argument("--cluster-nodes", type=int, default=65_536)
    ap.add_argument("--epochs-a", type=int, default=2)
    ap.add_argument("--epochs-b", type=int, default=10)
    args = ap.parse_args()

    import jax
    out = {}
    if os.path.isfile(OUT):
        with open(OUT) as f:
            out = json.load(f)
    out["platform"] = jax.default_backend()
    counter = CompileCounter()
    logging.getLogger("jax._src.interpreters.pxla").addHandler(counter)
    logging.getLogger("jax._src.dispatch").addHandler(counter)
    jax.config.update("jax_log_compiles", True)

    if args.stage in ("a", "all"):
        print("=== A: config-4 scale, cluster-minibatch route ===", flush=True)
        g4 = build_graph(args.config4_nodes, seed=4)
        print(f"graph: {g4.num_nodes} nodes / {g4.num_edges} edges",
              flush=True)
        c0 = counter.count
        res = run_units(g4, make_cfg(args.cluster_nodes, True, args.epochs_a),
                        args.epochs_a, label="A-cluster")
        res["compile_count"] = counter.count - c0
        res["n_nodes"], res["n_edges"] = g4.num_nodes, g4.num_edges
        res["cluster_nodes"] = args.cluster_nodes
        out["A_config4_cluster_route"] = res
        with open(OUT, "w") as f:
            json.dump(out, f, indent=2)

    if args.stage in ("b", "all"):
        print("=== B: cluster-vs-full convergence at a size fitting both ===",
              flush=True)
        gb = build_graph(args.both_nodes, seed=5)
        print(f"graph: {gb.num_nodes} nodes / {gb.num_edges} edges",
              flush=True)
        c0 = counter.count
        res_full = run_units(gb, make_cfg(10 ** 12, "full", args.epochs_b),
                             args.epochs_b, eval_graph=gb, label="B-full")
        res_full["compile_count"] = counter.count - c0
        c0 = counter.count
        res_clu = run_units(gb, make_cfg(args.cluster_nodes, True,
                                         args.epochs_b),
                            args.epochs_b, eval_graph=gb, label="B-cluster")
        res_clu["compile_count"] = counter.count - c0
        gap = [round(a["eval_loss"] - b["eval_loss"], 6)
               for a, b in zip(res_clu["epochs"], res_full["epochs"])]
        out["B_convergence"] = {
            "n_nodes": gb.num_nodes, "n_edges": gb.num_edges,
            "cluster_nodes": args.cluster_nodes,
            "full_graph": res_full, "cluster": res_clu,
            "eval_loss_gap_cluster_minus_full_per_epoch": gap,
        }
        with open(OUT, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2)[:2000])


if __name__ == "__main__":
    main()
