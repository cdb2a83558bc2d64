#!/usr/bin/env python
"""The recorded multi-epoch PRODUCT-SURFACE training run (round-4 ask #4).

Drives ``gnnome_tpu.train.loop.train`` — the real CLI path, not a bench
harness — over a multi-graph masked+clustered dataset, exactly the
reference protocol (train.py:188-494: per-epoch shuffle, strandwise masking,
METIS-style clustering, symmetry loss, plateau scheduler, per-epoch
checkpoint), and records:

* per-epoch wall-clock;
* the COMPILE COUNT (bucketed shapes must bound it; a compile per unit
  would be the reference-protocol killer on TPU);
* that ``--resume`` bit-reproduces: two identical resumed continuations end
  in bitwise-identical model weights.

Modes (pick with --mode):
  cpu-mesh     multi-graph masked+clustered dataset on an 8-virtual-device
               CPU mesh (compute.mesh=8, the halo-exchange path + GSPMD
               fallback) — the multi-chip product surface without hardware.
  cpu          same dataset, single-device CPU (fast sanity).
  tpu-full     one ~1M-node/6M-edge graph, single real TPU chip,
               remat='full' (the chromosome-scale memory mode), 2 epochs.

Writes TRAIN_RUN_<mode>.json at the repo root.
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


class CompileCounter(logging.Handler):
    """Counts XLA compiles via jax's own 'Finished XLA compilation' logs."""

    def __init__(self):
        super().__init__()
        self.count = 0

    def emit(self, record):
        if "Finished XLA compilation" in record.getMessage():
            self.count += 1


def build_dataset(root: str, mode: str, seed: int = 20260820) -> None:
    """Multi-graph training dataset in the real on-disk layout."""
    import numpy as np
    from gnnome_tpu.graphs.synthetic import synthetic_assembly_graph

    os.makedirs(os.path.join(root, "hifiasm", "processed"), exist_ok=True)
    os.makedirs(os.path.join(root, "hifiasm", "info"), exist_ok=True)
    have_train = os.path.isfile(
        os.path.join(root, "hifiasm", "processed", "0.npz"))
    have_valid = os.path.isdir(os.path.join(root, "valid"))
    # reuse only a COMPLETE previous dataset: a tpu-full tree without the
    # held-out valid/ split (pre-round-5 layout) must be rebuilt, or
    # run_training's valid_root fallback silently selects on the TRAINING
    # graph while the artifact claims held-out validation
    if have_train and (mode != "tpu-full" or have_valid):
        return
    if mode == "tpu-full":
        # one chromosome-scale full-graph training unit (remat='full') plus
        # a smaller held-out VALIDATION graph, so the recording carries real
        # validation metrics (round-5 verdict ask #7).
        # Size note: the symmetry-loss step at 1M nodes / 4.8M edges needs
        # ~18.5 GB on today's code (measured OOM logs, 2026-08-20) — the
        # round-2 "6.3M edges on 16 GB" claim predates the dual-era carries.
        # 768k nodes / ~3.5M edges is the largest that holds on one chip.
        from gnnome_tpu.graphs.synthetic import (
            positional_bench_assembly_graph as make)

        make(786_432, seed).save(
            os.path.join(root, "hifiasm", "processed", "0.npz"))
        vdir = os.path.join(root, "valid", "hifiasm", "processed")
        os.makedirs(vdir, exist_ok=True)
        make(131_072, seed + 1).save(os.path.join(vdir, "0.npz"))
        return
    # three graphs straddling the cluster threshold so epochs mix full-graph
    # units with clustered ones (reference train.py:324-348 both paths)
    specs = [(600, 60_000), (900, 90_000), (1400, 140_000)]
    for i, (n_reads, genome) in enumerate(specs):
        g, _, _, _ = synthetic_assembly_graph(
            n_reads=n_reads, genome_len=genome, read_len=900,
            seed=seed + i, with_sequences=False, false_edge_frac=0.15)
        g.overlap_similarity = np.random.default_rng(seed + i).uniform(
            0.95, 1.0, g.num_edges).astype(np.float32)
        g.save(os.path.join(root, "hifiasm", "processed", f"{i}.npz"))


def run_training(root: str, mode: str, epochs: int, resume_from: str | None,
                 out_name: str):
    import jax
    from gnnome_tpu.config import Config
    from gnnome_tpu.train.loop import train

    cfg = Config()
    cfg.paths.models_path = os.path.join(root, "models")
    cfg.paths.checkpoints_path = os.path.join(root, "checkpoints")
    cfg.train.num_epochs = epochs
    cfg.train.seed = 1
    if mode == "tpu-full":
        cfg.compute.remat = "full"
        cfg.compute.dtype = "bfloat16"
        cfg.train.masking = False          # full-graph unit each epoch
        cfg.train.num_nodes_per_cluster = 10**9
    else:
        cfg.train.masking = True
        cfg.train.num_nodes_per_cluster = 1000   # reference default
        cfg.compute.bucket_growth = 1.2
        if mode == "cpu-mesh":
            cfg.compute.mesh = 8
        cfg.compute.backend = "xla" if jax.default_backend() == "cpu" \
            else "pallas"

    counter = CompileCounter()
    logging.getLogger("jax._src.interpreters.pxla").addHandler(counter)
    logging.getLogger("jax._src.dispatch").addHandler(counter)
    # jax_log_compiles raises the per-compile messages to WARNING — the
    # counter sees them without turning on the firehose DEBUG stream
    jax.config.update("jax_log_compiles", True)

    t0 = time.time()
    # full reference protocol incl. the validation epoch on every mode
    # (tpu-full validates on its smaller held-out graph, round-5 ask #7)
    valid_root = (os.path.join(root, "valid")
                  if os.path.isdir(os.path.join(root, "valid")) else root)
    model_path = train(root, valid_root, "hifiasm", out_name=out_name,
                       overfit=False, resume=bool(resume_from), cfg=cfg)
    wall = time.time() - t0
    return model_path, wall, counter.count


def epoch_walls(log_path: str):
    """Per-epoch metric records (incl. the loop's epoch_wall_s fields)."""
    with open(log_path) as f:
        return [json.loads(line) for line in f]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="cpu-mesh",
                    choices=["cpu-mesh", "cpu", "tpu-full"])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--root", default="")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    if args.mode in ("cpu-mesh", "cpu"):
        # sitecustomize pins JAX_PLATFORMS=axon (tunneled TPU); the config
        # update below overrides it BEFORE first backend use — the env var
        # alone is re-pinned (see .claude/skills/verify: environment gotchas)
        if args.mode == "cpu-mesh":
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")

    import tempfile
    root = args.root or tempfile.mkdtemp(prefix=f"train_run_{args.mode}_")
    print(f"dataset root: {root}", flush=True)
    build_dataset(root, args.mode)

    t0 = time.time()
    model_path, wall, compiles = run_training(root, args.mode, args.epochs,
                                              None, "r04")
    ck = os.path.join(root, "checkpoints")
    log_file = [f for f in os.listdir(ck) if f.startswith("log_r04")][0]
    epochs_log = epoch_walls(os.path.join(ck, log_file))

    # ---- resume reproducibility: continue the SAME checkpoint twice for
    # one extra epoch; both continuations must end bitwise-identical.
    # Compare the CHECKPOINTS (written every epoch) — the best-model file
    # only exists when the extra epoch improves validation loss
    import numpy as np
    finals = []
    for attempt in range(2):
        run_training(root, args.mode, args.epochs + 1, "resume", "r04")
        cp = [f for f in os.listdir(ck)
              if f.startswith("ckpt_") and "resumed" in f][0]
        # EVERY array in the checkpoint: params, BN running stats, optimizer
        # moments, scheduler state, epoch — a resume nondeterminism that
        # perturbs only the non-param state must fail this gate too
        with np.load(os.path.join(ck, cp)) as z:
            finals.append({k: z[k].copy() for k in z.files})
        # remove the resumed artifacts so the second attempt is identical
        for f in os.listdir(ck):
            if "resumed" in f:
                os.remove(os.path.join(ck, f))
        models = os.path.join(root, "models")
        for f in os.listdir(models):
            if "resumed" in f:
                os.remove(os.path.join(models, f))
    bit_identical = (sorted(finals[0]) == sorted(finals[1]) and all(
        np.array_equal(finals[0][k], finals[1][k]) for k in finals[0]))

    import jax
    out = {
        "mode": args.mode,
        "epochs": args.epochs,
        "platform": jax.default_backend(),
        "n_devices": jax.device_count(),
        "total_wall_s": round(wall, 1),
        "compile_count": compiles,
        "epoch_metrics": epochs_log,
        "resume_bit_identical": bit_identical,
        "dataset_root": root if args.keep else "(removed)",
    }
    path = os.path.join(ROOT, f"TRAIN_RUN_{args.mode}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps(out, indent=2, default=float))
    if not args.keep:
        import shutil
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
