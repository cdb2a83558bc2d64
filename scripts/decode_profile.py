#!/usr/bin/env python
"""Profile the greedy decoder's per-phase cost at chromosome scale.

Builds an assembly-shaped AssemblyGraph from the bench generator (banded +
RC-paired is irrelevant to decode cost; degrees and scale are what matter),
fakes edge logits, and times one full ``decode_greedy`` run (optionally
under cProfile for the per-function breakdown).

Usage: python scripts/decode_profile.py [--nodes N] [--degree D] [--paths K]
"""
from __future__ import annotations

import argparse
import cProfile
import io
import pstats
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnnome_tpu.config import DecodeConfig
from gnnome_tpu.decode.greedy import decode_greedy
from gnnome_tpu.graphs.synthetic import random_rc_bench_graph as build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=524_288)
    ap.add_argument("--degree", type=float, default=6.0)
    ap.add_argument("--paths", type=int, default=100)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    g = build(args.nodes, args.degree)
    rng = np.random.default_rng(1)
    scores = rng.normal(1.0, 2.0, g.num_edges).astype(np.float32)
    cfg = DecodeConfig(num_decoding_paths=args.paths, len_threshold=0)

    t0 = time.perf_counter()
    if args.profile:
        pr = cProfile.Profile()
        pr.enable()
    res = decode_greedy(g, scores, cfg)
    if args.profile:
        pr.disable()
    dt = time.perf_counter() - t0
    print(f"decode: {dt:.2f}s  contigs={len(res.walks)}  "
          f"visited={int(res.visited.sum())}/{g.num_nodes}")
    if args.profile:
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
        print(s.getvalue())


if __name__ == "__main__":
    main()
