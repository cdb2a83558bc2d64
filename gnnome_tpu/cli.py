"""gnnome-tpu command-line interface.

One typed CLI replacing the reference's six per-script argparse entry points
(run.py, create_inference_graphs.py, inference.py, train.py, generate_data.py,
split_data.py, install_tools.py).  Every command accepts ``--set
section.key=value`` config overrides (highest precedence).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

from .config import Config


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--config", type=str, default=None, help="JSON config file")
    p.add_argument("--set", action="append", default=[], metavar="SEC.KEY=VAL",
                   help="config override, e.g. --set decode.len_threshold=50000")


def _load_cfg(args) -> Config:
    cfg = Config.load(args.config) if args.config else Config()
    cfg.apply_overrides(args.set)
    if cfg.compute.device != "auto":
        import jax
        jax.config.update("jax_platforms", cfg.compute.device)
        if cfg.compute.device == "cpu" and cfg.compute.mesh > 1:
            # virtual CPU devices for the requested mesh (test/sim runs)
            jax.config.update("jax_num_cpu_devices", cfg.compute.mesh)
    return cfg


def cmd_run(args):
    """End-to-end: reads -> hifiasm -> graph -> scores -> contigs
    (reference run.py:9-42)."""
    cfg = _load_cfg(args)
    out = args.out
    hifiasm = os.path.abspath(os.path.join(cfg.paths.hifiasm_dir, "hifiasm"))
    hifiasm_out = os.path.join(out, "hifiasm", "output")
    os.makedirs(hifiasm_out, exist_ok=True)
    print(f"Step 1: hifiasm on {args.reads}")
    import shlex
    subprocess.run(
        f"{shlex.quote(hifiasm)} --prt-raw -o {shlex.quote(hifiasm_out)}/asm "
        f"-t{args.threads} -l0 {shlex.quote(args.reads)}",
        shell=True, check=True)
    gfa = os.path.join(hifiasm_out, "asm.bp.raw.r_utg.gfa")
    print("Step 2: building the inference graph")
    _build_graph(gfa, args.reads, out, "hifiasm", cfg, threads=int(args.threads))
    print(f"Step 3: inference with model {args.model}")
    from .infer import run_inference
    run_inference(out, args.model, "hifiasm", os.path.join(out, "hifiasm"), cfg)
    print(f"Assembly saved in: {out}/hifiasm/assembly/0_assembly.fasta")


def _build_graph(gfa, reads, out_dir, assembler, cfg, training=False, threads=1):
    from .data.dataset import dataset_for
    ds = dataset_for(assembler, out_dir, threads=threads, config=cfg)
    ds.save_parsed(0, gfa, reads, training=training)


def cmd_build_graph(args):
    """GFA + reads -> processed graph dir (reference create_inference_graphs.py)."""
    cfg = _load_cfg(args)
    assert os.path.isfile(args.gfa), "GFA not found!"
    assert os.path.isfile(args.reads), "Reads not found!"
    _build_graph(args.gfa, args.reads, args.out, args.asm, cfg,
                 training=args.training, threads=args.threads)
    print("Graph processed.")


def cmd_infer(args):
    """Dataset -> contigs (reference inference.py:504-519)."""
    cfg = _load_cfg(args)
    from .infer import run_inference
    from .utils.profiling import maybe_trace
    with maybe_trace(args.profile):
        run_inference(args.data, args.model, args.asm, args.out, cfg)


def cmd_train(args):
    """Train the model (reference train.py:497-512)."""
    cfg = _load_cfg(args)
    if args.dropout is not None:
        cfg.model.dropout = args.dropout
    if args.seed is not None:
        cfg.train.seed = args.seed
    from .train.loop import train
    train(train_path=args.train, valid_path=args.valid, assembler=args.asm,
          out_name=args.name, overfit=args.overfit, resume=args.resume, cfg=cfg)


def cmd_generate_data(args):
    """Simulate reads + build graphs (reference generate_data.py)."""
    cfg = _load_cfg(args)
    from .data.simulate import simulate_and_generate
    simulate_and_generate(args.datadir, args.chrdir, args.asm, args.threads, cfg)


def cmd_split_data(args):
    """Copy processed graphs into train/valid dirs (reference split_data.py)."""
    cfg = _load_cfg(args)
    from .data.split import train_valid_split
    from .data.chromosomes import get_train_valid_chrs
    train_dict, valid_dict = get_train_valid_chrs(args.chrs_config)
    train_valid_split(args.datadir, args.savedir, args.asm, train_dict,
                      valid_dict, args.name)


def cmd_install_tools(args):
    cfg = _load_cfg(args)
    from .data.tools import install_tools
    install_tools(cfg)


def cmd_download_profile(args):
    """Fetch the PBSIM3 sample profile (reference download_profile.sh)."""
    cfg = _load_cfg(args)
    from .data.tools import download_profile
    download_profile(cfg)


def cmd_evaluate(args):
    """Assembly contiguity metrics (reference utils/evaluate.py:93-105), with
    optional external minigraph/paftools NG50/NGA50 (evaluate.py:139-157)."""
    cfg = _load_cfg(args)
    from .decode.assembly import (quick_evaluation, run_minigraph, parse_pafs,
                                  parse_minigraph_report, CHM13_CHR_LENS)
    from .utils.fastx import read_fastx

    contigs = list(read_fastx(args.assembly))
    ref_length = args.ref_length
    if ref_length is None and args.chr:
        ref_length = CHM13_CHR_LENS.get(args.chr)
    ev = quick_evaluation(contigs, ref_length=ref_length)
    for k, v in ev.items():
        print(f"{k}:\t{v}")

    if args.ref:
        import os as _os
        outdir = args.out or _os.path.dirname(_os.path.abspath(args.assembly))
        paf = _os.path.join(outdir, "asm.paf")
        report = _os.path.join(outdir, "minigraph.txt")
        p = run_minigraph(args.ref, args.assembly, paf,
                          minigraph=cfg.paths.minigraph)
        if p.wait() != 0:
            raise SystemExit(f"minigraph failed (rc={p.returncode}); "
                             f"no NG50/NGA50 computed")
        idx = args.ref + ".fai"
        if not _os.path.isfile(idx):
            raise SystemExit(f"missing reference index {idx} "
                             f"(run: samtools faidx {args.ref})")
        p = parse_pafs(idx, report, paf, paftools=cfg.paths.paftools)
        if p.wait() != 0:
            raise SystemExit(f"paftools failed (rc={p.returncode}); "
                             f"no NG50/NGA50 computed")
        print(parse_minigraph_report(report))


def cmd_convert_weights(args):
    """torch weights.pt <-> native npz."""
    _load_cfg(args)      # honour --config/--set (e.g. compute.device=cpu)
    from .models.checkpoint import load_model_weights, save_model_weights
    params, state = load_model_weights(args.src)
    if args.dst.endswith(".pt"):
        import torch
        from .models.convert import pytree_to_torch
        torch.save(pytree_to_torch(params, state), args.dst)
    else:
        save_model_weights(args.dst, params, state)
    print(f"Converted {args.src} -> {args.dst}")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="gnnome-tpu",
                                     description=__doc__.split("\n")[0])
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("run", help="end-to-end assembly from reads")
    p.add_argument("-r", "--reads", required=True)
    p.add_argument("-o", "--out", default=".")
    p.add_argument("-t", "--threads", type=int, default=1)
    p.add_argument("-m", "--model", default="weights/weights.npz")
    _add_common(p)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("build-graph", help="GFA + reads -> processed graph")
    p.add_argument("--gfa", required=True)
    p.add_argument("--reads", required=True)
    p.add_argument("--asm", required=True, choices=["hifiasm", "raven"])
    p.add_argument("--out", required=True)
    p.add_argument("--training", action="store_true",
                   help="parse GT labels from read headers")
    p.add_argument("--threads", type=int, default=1)
    _add_common(p)
    p.set_defaults(fn=cmd_build_graph)

    p = sub.add_parser("infer", help="score + decode a processed dataset")
    p.add_argument("--data", required=True)
    p.add_argument("--asm", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="weights/weights.npz")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write an XLA profiler trace to DIR")
    _add_common(p)
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("train", help="train the edge-scoring model")
    p.add_argument("--train", required=True)
    p.add_argument("--valid", required=True)
    p.add_argument("--asm", required=True)
    p.add_argument("--name", default=None)
    p.add_argument("--overfit", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dropout", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    _add_common(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("generate-data", help="simulate reads + build graphs")
    p.add_argument("--datadir", required=True)
    p.add_argument("--chrdir", required=True)
    p.add_argument("--asm", required=True)
    p.add_argument("--threads", type=int, default=1)
    _add_common(p)
    p.set_defaults(fn=cmd_generate_data)

    p = sub.add_parser("split-data", help="split processed graphs train/valid")
    p.add_argument("--datadir", required=True)
    p.add_argument("--savedir", required=True)
    p.add_argument("--asm", required=True)
    p.add_argument("--name", default=None)
    p.add_argument("--chrs-config", default=None,
                   help="JSON file with train/valid chromosome counts")
    _add_common(p)
    p.set_defaults(fn=cmd_split_data)

    p = sub.add_parser("install-tools", help="clone+build hifiasm/raven/pbsim3")
    _add_common(p)
    p.set_defaults(fn=cmd_install_tools)

    p = sub.add_parser("download-profile",
                       help="fetch the PBSIM3 sample profile archive")
    _add_common(p)
    p.set_defaults(fn=cmd_download_profile)

    p = sub.add_parser("evaluate", help="assembly contiguity metrics")
    p.add_argument("--assembly", required=True, help="contigs FASTA")
    p.add_argument("--ref-length", type=int, default=None,
                   help="reference length for NG50")
    p.add_argument("--chr", default=None,
                   help="CHM13 chromosome name for NG50 (e.g. chr19)")
    p.add_argument("--ref", default=None,
                   help="reference FASTA for external minigraph NG50/NGA50")
    p.add_argument("--out", default=None, help="dir for paf/report outputs")
    _add_common(p)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("convert-weights", help="torch .pt <-> native .npz")
    p.add_argument("src")
    p.add_argument("dst")
    _add_common(p)
    p.set_defaults(fn=cmd_convert_weights)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
