#!/usr/bin/env python
"""The from-scratch TRAINING QUALITY gate (round-5 verdict ask #1).

Everything quality-related in earlier rounds was computed with the
reference's converted ``weights.pt``; this run demonstrates the framework's
core claim — that *training it from scratch produces an assembler-quality
model* (the reference's entire reason to exist, train.py:188-494 ->
weights.pt that assembles):

1. ``build``  — a multi-graph DISCRIMINATING synthetic dataset (real
   sequences, 2% read errors, wrong-strand hard negatives, planted repeats,
   coverage gaps — the round-4 golden-graph recipe at training scale).
2. ``train``  — the full product ``train()`` protocol (reference
   train.py:188-494: per-epoch shuffle, strandwise masking, METIS-style
   clustering, symmetry loss, pos_weight = 1/(pos:neg), plateau LR,
   validation-driven model selection) until validation AP plateaus.
3. ``parity`` — the all-negative-collapse diagnosis (round-4 verdict):
   BOTH stacks (this framework and the torch oracle) trained from
   IDENTICAL initial weights on the same data with the same deterministic
   full-graph protocol; per-epoch loss/AP/recall trajectories recorded
   side by side.  With pos_weight = 1/ratio ~ 0.17 on ~85%-positive graphs
   the loss optimum pins uninformative edges at p=0.5, so threshold-0.5
   recall collapses early in BOTH stacks while AP (ranking quality) climbs
   — parity of dynamics, not a framework bug.
4. ``golden`` — the held-out golden E. coli-scale fixture scored with the
   SELF-TRAINED weights vs the converted reference weights.pt: AP and
   greedy-decode NG50 side by side.

Writes TRAIN_QUALITY_r05.json at the repo root.  CPU-only.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

# CPU-only: the tunneled TPU is single-client and this run must not contend
# with it (see tests/conftest.py note on the sitecustomize platform pin)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

WEIGHTS_PT = "/root/reference/weights/weights.pt"
GOLDEN_FIXTURE = os.path.join(ROOT, "tests", "fixtures", "golden_ecoli_v1.npz")
OUT_JSON = os.path.join(ROOT, "TRAIN_QUALITY_r05.json")
ECOLI_BP = 4_641_652

# training-graph spec: the golden recipe (error/hard-negative/repeat/gap
# knobs identical to scripts/golden_ecoli_run.py) at ~1/13 scale so a
# multi-graph dataset builds in minutes, with coverage ~20x like the golden.
# Repeats are the hard part: the round-5 diagnosis showed a model trained on
# 2 easy repeat pairs leaves golden repeat cross-edges (similarity ~1,
# label 0) at p>0.9 and the greedy decode chains segments into one 14 Mb
# mis-assembly — so every graph plants SEVERAL pairs at VARIED length
# fractions of the read length (the structural motif the GNN must learn).
TRAIN_SPEC = dict(genome_len=360_000, read_len=6_000, n_reads=1_200,
                  error_rate=0.02, hard_false_frac=0.10, false_edge_frac=0.15,
                  n_coverage_gaps=1, n_repeat_pairs=5, sim_band_frac=0.15)
REPEAT_FRACS = [0.5, 0.6, 0.7, 0.8]      # repeat_len = frac * read_len
TRAIN_SEEDS = [100, 101, 102, 103, 104, 105, 106, 107]
VALID_SEEDS = [200, 201]


def _build_graph(seed: int):
    from gnnome_tpu.graphs.synthetic import synthetic_assembly_graph
    spec = dict(TRAIN_SPEC)
    spec["repeat_len"] = int(
        spec["read_len"] * REPEAT_FRACS[seed % len(REPEAT_FRACS)])
    g, _, _, _ = synthetic_assembly_graph(
        seed=seed, with_labels=True, with_sequences=True, **spec)
    return g


def stage_build(root: str) -> dict:
    t0 = time.perf_counter()
    info = {"spec": TRAIN_SPEC, "train_seeds": TRAIN_SEEDS,
            "valid_seeds": VALID_SEEDS, "graphs": []}
    for split, seeds in (("train", TRAIN_SEEDS), ("valid", VALID_SEEDS)):
        pdir = os.path.join(root, split, "hifiasm", "processed")
        os.makedirs(pdir, exist_ok=True)
        for i, seed in enumerate(seeds):
            t1 = time.perf_counter()
            g = _build_graph(seed)
            g.save(os.path.join(pdir, f"{i}.npz"))
            row = {"split": split, "seed": seed, "nodes": g.num_nodes,
                   "edges": g.num_edges, "pos_frac": float(g.y.mean()),
                   "build_s": round(time.perf_counter() - t1, 1)}
            info["graphs"].append(row)
            print(f"  built {row}", flush=True)
    info["build_total_s"] = round(time.perf_counter() - t0, 1)
    return info


def stage_train(root: str, epochs: int, resume: bool = False) -> dict:
    from gnnome_tpu.config import Config
    from gnnome_tpu.train.loop import train

    cfg = Config()
    cfg.paths.models_path = os.path.join(root, "models")
    cfg.paths.checkpoints_path = os.path.join(root, "checkpoints")
    cfg.train.num_epochs = epochs
    cfg.train.seed = 1
    cfg.train.masking = True
    cfg.train.num_nodes_per_cluster = 1000      # reference default
    cfg.compute.bucket_growth = 1.2
    cfg.compute.backend = "xla"

    t0 = time.perf_counter()
    model_path = train(os.path.join(root, "train"), os.path.join(root, "valid"),
                       "hifiasm", out_name="quality_r05", resume=resume,
                       cfg=cfg)
    wall = time.perf_counter() - t0

    logs = sorted(
        f for f in os.listdir(cfg.paths.checkpoints_path)
        if f.startswith("log_quality_r05"))
    epoch_log = []
    for lf in logs:
        with open(os.path.join(cfg.paths.checkpoints_path, lf)) as f:
            epoch_log += [json.loads(line) for line in f]
    epoch_log.sort(key=lambda r: r.get("epoch", 0))
    best = max(epoch_log, key=lambda r: r.get("valid/ap", 0.0))
    return {"model_path": model_path, "epochs": epochs,
            "total_wall_s": round(wall, 1),
            "best_valid_ap_epoch": best.get("epoch"),
            "best_valid_ap": best.get("valid/ap"),
            "epoch_metrics": epoch_log}


# --------------------------------------------------------------- parity arm
def _features(g):
    from gnnome_tpu.models.features import edge_features
    import numpy as np

    def z(v):
        v = v.astype(np.float32)
        s = v.std(ddof=1) if v.size > 1 else 1.0
        return (v - v.mean()) / (s if s > 0 else 1.0)

    zi, zo = z(g.in_degrees()), z(g.out_degrees())
    import numpy as np
    x = np.stack([zi, zo], axis=1)
    x_rev = np.stack([zo, zi], axis=1)
    return x, x_rev, edge_features(g)


def _metrics_row(logits, y):
    import numpy as np
    from gnnome_tpu.train.metrics import calculate_tfpn, calculate_metrics, get_aps
    tp, tn, fp, fn = calculate_tfpn(logits, y)
    _, _, recall, f1 = calculate_metrics(tp, tn, fp, fn)
    return {"recall@0.5": round(recall, 4), "f1@0.5": round(f1, 4),
            "ap": round(get_aps(np.asarray(logits, np.float64), y), 6)}


def stage_parity(root: str, epochs: int) -> dict:
    """Identical-initial-weights, identical-data, deterministic full-graph
    training in both stacks; per-epoch trajectories side by side."""
    import numpy as np
    import torch

    from gnnome_tpu.config import Config
    from gnnome_tpu.graphs.container import AssemblyGraph
    from gnnome_tpu.models.convert import pytree_to_torch
    from gnnome_tpu.models.sym_gated_gcn import init_params
    from gnnome_tpu.train.step import make_steps, make_example
    from torch_ref import RefSymGatedGCNModel

    torch.manual_seed(0)
    torch.use_deterministic_algorithms(True)

    g_tr = AssemblyGraph.load(
        os.path.join(root, "train", "hifiasm", "processed", "0.npz"))
    g_va = AssemblyGraph.load(
        os.path.join(root, "valid", "hifiasm", "processed", "0.npz"))

    pos = float((g_tr.y == 1).sum())
    neg = float((g_tr.y == 0).sum())
    pos_weight = neg / pos
    alpha, lr = 0.1, 1e-4

    cfg = Config()
    cfg.model.dropout = 0.0          # removes RNG as a divergence source
    cfg.train.masking = False
    cfg.train.num_nodes_per_cluster = 10 ** 9
    cfg.train.lr = lr
    cfg.compute.backend = "xla"

    params, state = init_params(jax.random.PRNGKey(1), cfg.model)
    sd = pytree_to_torch(params, state)

    # ---- jax arm
    tx, train_step, eval_step = make_steps(cfg)
    opt_state = tx.init(params)
    import jax.numpy as jnp
    pw = jnp.asarray(pos_weight, dtype=jnp.float32)

    def example(g):
        _, _, e = _features(g)   # make_example z-scores degrees itself
        return make_example(cfg, g.in_degrees(), g.out_degrees(), e, g.y,
                            g.src, g.dst, g.num_nodes)

    ex_tr, ex_va = example(g_tr), example(g_va)
    from gnnome_tpu.train.step import logits_to_host

    jax_rows = []
    for ep in range(epochs):
        params, state, opt_state, tr_loss, _ = train_step(
            params, state, opt_state, ex_tr.gt, ex_tr.x, ex_tr.x_rev, ex_tr.e,
            ex_tr.labels, ex_tr.mask, pw, jax.random.PRNGKey(ep))
        va_loss, va_logits = eval_step(params, state, ex_va.gt, ex_va.x,
                                       ex_va.x_rev, ex_va.e, ex_va.labels,
                                       ex_va.mask, pw)
        row = {"epoch": ep, "train_loss": float(tr_loss),
               "valid_loss": float(va_loss),
               **_metrics_row(logits_to_host(ex_va, va_logits),
                              g_va.y.astype(np.int32))}
        jax_rows.append(row)
        print(f"  jax   {row}", flush=True)

    # ---- torch arm (same init, same data, same protocol)
    model = RefSymGatedGCNModel(normalization="batch", dropout=0.0)
    model.load_state_dict(sd)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    pw_t = torch.tensor([pos_weight])

    def tensors(g):
        x, x_rev, e = _features(g)
        return (torch.from_numpy(g.src.astype(np.int64)),
                torch.from_numpy(g.dst.astype(np.int64)),
                torch.from_numpy(x), torch.from_numpy(x_rev),
                torch.from_numpy(e),
                torch.from_numpy(g.y.astype(np.float32)).unsqueeze(1))
    tr_t, va_t = tensors(g_tr), tensors(g_va)

    def sym_loss(model, t):
        src, dst, x, x_rev, e, y = t
        logits_org = model(src, dst, x, e)
        logits_rev = model.forward_flipped(src, dst, x_rev, e)
        bce_org = torch.nn.functional.binary_cross_entropy_with_logits(
            logits_org, y, pos_weight=pw_t, reduction="none")
        bce_rev = torch.nn.functional.binary_cross_entropy_with_logits(
            logits_rev, y, pos_weight=pw_t, reduction="none")
        abs_d = alpha * torch.abs(logits_org - logits_rev)
        return (bce_org + bce_rev + abs_d).mean(), logits_org

    torch_rows = []
    for ep in range(epochs):
        model.train()
        opt.zero_grad()
        loss, _ = sym_loss(model, tr_t)
        loss.backward()
        opt.step()
        model.eval()
        with torch.no_grad():
            va_loss, va_logits = sym_loss(model, va_t)
        row = {"epoch": ep, "train_loss": float(loss.detach()),
               "valid_loss": float(va_loss),
               **_metrics_row(va_logits.numpy().reshape(-1),
                              g_va.y.astype(np.int32))}
        torch_rows.append(row)
        print(f"  torch {row}", flush=True)

    divergence = {
        "max_abs_valid_loss_diff": max(
            abs(a["valid_loss"] - b["valid_loss"])
            for a, b in zip(jax_rows, torch_rows)),
        "max_abs_valid_ap_diff": max(
            abs(a["ap"] - b["ap"]) for a, b in zip(jax_rows, torch_rows)),
    }
    return {"protocol": "identical init (pytree_to_torch), full-graph "
                        "symmetry loss, Adam 1e-4, dropout 0, "
                        f"pos_weight {pos_weight:.4f}, {epochs} epochs",
            "jax": jax_rows, "torch": torch_rows, "divergence": divergence}


# --------------------------------------------------------------- golden arm
def stage_golden(root: str, model_path: str | None) -> dict:
    import numpy as np
    from gnnome_tpu.config import Config, DecodeConfig
    from gnnome_tpu.decode.assembly import calculate_n50, calculate_ng50
    from gnnome_tpu.decode.greedy import decode_greedy
    from gnnome_tpu.graphs.container import AssemblyGraph
    from gnnome_tpu.infer import score_graph
    from gnnome_tpu.models.checkpoint import load_model_weights
    from gnnome_tpu.train.metrics import average_precision

    if not os.path.isfile(GOLDEN_FIXTURE):
        raise FileNotFoundError(
            f"{GOLDEN_FIXTURE} missing — run scripts/golden_ecoli_run.py first")
    g = AssemblyGraph.load(GOLDEN_FIXTURE)
    y = g.y.astype(np.int32)

    if model_path is None:
        mdir = os.path.join(root, "models")
        cands = sorted(os.path.join(mdir, f) for f in os.listdir(mdir)
                       if f.endswith(".npz"))
        model_path = cands[-1]

    cfg = Config()
    cfg.compute.backend = "xla"

    out = {"fixture": GOLDEN_FIXTURE,
           "graph": {"nodes": g.num_nodes, "edges": g.num_edges,
                     "positives": int(y.sum())},
           "self_trained_model": model_path}
    scores = {}
    for name, path in (("self_trained", model_path),
                       ("converted_reference", WEIGHTS_PT)):
        params, state = load_model_weights(path)
        t0 = time.perf_counter()
        s = score_graph(g, params, state, cfg)
        scores[name] = s
        out[f"ap_{name}"] = float(average_precision(
            1.0 / (1.0 + np.exp(-s.astype(np.float64))), y))
        out[f"score_s_{name}"] = round(time.perf_counter() - t0, 1)
        print(f"  AP[{name}] = {out[f'ap_{name}']:.6f}", flush=True)
    out["ap_gap"] = out["ap_converted_reference"] - out["ap_self_trained"]

    dcfg = DecodeConfig(load_checkpoint=False)
    out["decode"] = {}
    for name in ("self_trained", "converted_reference", "labels"):
        t0 = time.perf_counter()
        if name == "labels":
            res = decode_greedy(g, y.astype(np.float32), dcfg,
                                rng=np.random.default_rng(7), use_labels=True)
        else:
            res = decode_greedy(g, scores[name].astype(np.float32), dcfg,
                                rng=np.random.default_rng(7))
        lens = res.contigs_len
        out["decode"][name] = {
            "contigs": len(lens), "total_bases": int(sum(lens)),
            "n50": int(calculate_n50(lens)),
            "ng50": int(calculate_ng50(lens, ECOLI_BP)),
            "longest": int(max(lens)) if lens else 0,
            "decode_s": round(time.perf_counter() - t0, 1)}
        print(f"  decode[{name}]: {out['decode'][name]}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["build", "train", "parity", "golden", "all"])
    ap.add_argument("--root", default="/tmp/train_quality_r05")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--parity-epochs", type=int, default=8)
    ap.add_argument("--model", default=None,
                    help="golden stage: self-trained model npz override")
    ap.add_argument("--resume", action="store_true",
                    help="train stage: continue from the checkpoint")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    state_path = os.path.join(args.root, "quality_state.json")
    out = {}
    if os.path.isfile(state_path):
        with open(state_path) as f:
            out = json.load(f)

    def save():
        with open(state_path, "w") as f:
            json.dump(out, f, indent=2, default=float)

    stages = ([args.stage] if args.stage != "all"
              else ["build", "train", "parity", "golden"])
    for st in stages:
        print(f"==== stage {st} ====", flush=True)
        t0 = time.perf_counter()
        if st == "build":
            out["dataset"] = stage_build(args.root)
        elif st == "train":
            out["training"] = stage_train(args.root, args.epochs,
                                          resume=args.resume)
        elif st == "parity":
            out["collapse_parity"] = stage_parity(args.root, args.parity_epochs)
        elif st == "golden":
            mp = args.model or (out.get("training") or {}).get("model_path")
            out["golden_heldout"] = stage_golden(args.root, mp)
        print(f"==== stage {st} done in {time.perf_counter()-t0:.0f}s ====",
              flush=True)
        save()

    if all(k in out for k in
           ("dataset", "training", "collapse_parity", "golden_heldout")):
        with open(OUT_JSON, "w") as f:
            json.dump(out, f, indent=2, default=float)
        print(f"wrote {OUT_JSON}")


if __name__ == "__main__":
    main()
