#!/usr/bin/env python
"""Decompose the train-step cost on the bench graph (one variant per run).

Usage: python scripts/perf_probe.py VARIANT [--nodes N] [--iters K]

Variants:
  train          full train step (as bench.py)
  train_noremat  remat=False
  train_nosym    symmetry loss off (single directional pass)
  fwd_train      one training-mode forward (no grad)
  fwd_eval       one eval-mode forward (K3 path)
  grad_only      value_and_grad without optimizer update
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", help="comma-separated list of variants")
    ap.add_argument("--nodes", type=int, default=262_144)
    ap.add_argument("--degree", type=float, default=6.0)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--window", type=int, default=0, help="override WINDOW")
    ap.add_argument("--window-v", type=int, default=0,
                    help="override WINDOW_V (v-side block rows)")
    ap.add_argument("--force-u", default="",
                    help="force u-side (band) plan config, e.g. 256x3")
    ap.add_argument("--force-v", default="",
                    help="force v-side (sort-key) plan config, e.g. 128x3")
    ap.add_argument("--tile-e", type=int, default=0, help="override TILE_E")
    ap.add_argument("--chunk", type=int, default=0, help="override CHUNK")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from gnnome_tpu.config import Config
    from gnnome_tpu.graphs.synthetic import random_bench_graph
    from gnnome_tpu.models.sym_gated_gcn import init_params
    from gnnome_tpu.train.step import make_steps, make_example

    if args.window or args.tile_e or args.window_v or args.force_u \
            or args.force_v or args.chunk:
        import gnnome_tpu.ops.windowed as W
        if args.window or args.window_v:
            W.AUTO_SELECT = False    # force the explicit 2-block config
        if args.window:
            W.WINDOW = args.window
        if args.window_v:
            W.WINDOW_V = args.window_v
        if args.force_u:
            w_, k_ = args.force_u.split("x")
            W.FORCE_U = (int(w_), int(k_))
        if args.force_v:
            w_, k_ = args.force_v.split("x")
            W.FORCE_V = (int(w_), int(k_))
        if args.tile_e:
            W.TILE_E = args.tile_e
        if args.chunk:
            W.CHUNK = args.chunk

    cfg = Config()
    cfg.model.dropout = 0.2
    cfg.compute.matmul_precision = "default"
    cfg.compute.dtype = args.dtype
    cfg.compute.backend = args.backend

    src, dst = random_bench_graph(args.nodes, args.degree, seed=0)
    n_edges = src.shape[0]
    rng = np.random.default_rng(0)
    in_deg = np.bincount(dst, minlength=args.nodes).astype(np.float32)
    out_deg = np.bincount(src, minlength=args.nodes).astype(np.float32)
    e_feat = rng.normal(size=(n_edges, 2)).astype(np.float32)
    y = (rng.random(n_edges) < 0.5).astype(np.float32)
    t0 = time.perf_counter()
    ex = make_example(cfg, in_deg, out_deg, e_feat, y, src, dst, args.nodes)
    print(f"example build: {time.perf_counter()-t0:.2f}s", flush=True)
    if ex.gt.wplan is not None:
        p = ex.gt.wplan
        print(f"plan: T={p.n_tiles} tile_e={p.tile_e} "
              f"u={p.k_u}x{p.window} v={p.k_v}x{p.win_v} "
              f"ovf={p.n_ovf} ({100*p.n_ovf/n_edges:.3f}%)",
              flush=True)

    pw = jnp.asarray(1.0, jnp.float32)
    key = jax.random.PRNGKey(1)

    def build_runner(v):
        import dataclasses
        c = Config.from_dict(cfg.to_dict())
        if v == "train_noremat":
            c.compute.remat = False
        if v == "train_nosym":
            c.train.use_symmetry_loss = False
        params, state = init_params(jax.random.PRNGKey(0), c.model)
        if v.startswith("train"):
            tx, train_step, eval_step = make_steps(c)
            opt_state = tx.init(params)
            box = {"p": params, "s": state, "o": opt_state}

            def run_once():
                box["p"], box["s"], box["o"], loss, _ = train_step(
                    box["p"], box["s"], box["o"], ex.gt, ex.x, ex.x_rev, ex.e,
                    ex.labels, ex.mask, pw, key)
                return loss
        elif v in ("fwd_train", "fwd_eval"):
            from gnnome_tpu.models.sym_gated_gcn import forward
            training = v == "fwd_train"
            dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
            fwd = jax.jit(lambda p, s, x, e: forward(
                p, s, ex.gt, x, e, c.model, training=training, flip=False,
                rng=jax.random.PRNGKey(0), backend=args.backend,
                remat=False, dtype=dtype)[0])

            def run_once():
                return fwd(params, state, ex.x, ex.e).sum()
        elif v == "grad_only":
            from gnnome_tpu.models.zoo import get_model
            from gnnome_tpu.train.loss import symmetry_loss
            _, fwd = get_model(c.model.model)
            dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

            def loss_fn(p, s, x, x_rev, e, labels, mask):
                lo, s = fwd(p, s, ex.gt, x, e, c.model, training=True,
                            flip=False, rng=key, backend=args.backend,
                            remat=c.compute.remat, dtype=dtype)
                lr_, s = fwd(p, s, ex.gt, x_rev, e, c.model, training=True,
                             flip=True, rng=key, backend=args.backend,
                             remat=c.compute.remat, dtype=dtype)
                return symmetry_loss(lo[:, 0], lr_[:, 0], labels, pw,
                                     alpha=0.1, mask=mask)
            g = jax.jit(jax.grad(loss_fn))

            def run_once():
                grads = g(params, state, ex.x, ex.x_rev, ex.e, ex.labels,
                          ex.mask)
                return jax.tree_util.tree_leaves(grads)[0].sum()
        else:
            raise SystemExit(f"unknown variant {v}")
        return run_once

    for v in args.variant.split(","):
        run_once = build_runner(v)
        t0 = time.perf_counter()
        float(run_once())
        print(f"[{v}] compile+first run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        for _ in range(args.warmup - 1):
            float(run_once())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = run_once()
        # single sync at the end: dispatches are async, so device steps
        # back-to-back and host-CPU load / tunnel sync latency don't pollute
        # the per-step time (a per-step float() read measured up to +5%
        # under concurrent host load)
        float(r)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"[{v}] {dt*1000:.1f} ms/step  ({n_edges/dt:,.0f} edges/s)",
              flush=True)


if __name__ == "__main__":
    main()
