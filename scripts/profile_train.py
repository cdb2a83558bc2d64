#!/usr/bin/env python
"""Break down the SymGatedGCN train-step cost on the bench graph.

Times, on the real device:
  * eval forward (inference mode, K3 path when backend=pallas+bf16)
  * training-mode forward only (both symmetry passes, no grad)
  * full value_and_grad (no optimizer)
  * full train step (grad + Adam)
with the configured remat policy, so the remat/backward split is visible.

Usage: python scripts/profile_train.py [--nodes N] [--remat true|false|full]
       [--backend pallas|xla] [--dtype bfloat16|float32] [--trace DIR]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=262_144)
    ap.add_argument("--degree", type=float, default=6.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--remat", default="true")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--trace", default="")
    ap.add_argument("--no-sym", action="store_true",
                    help="disable the symmetry loss (single pass)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from gnnome_tpu.config import Config
    from gnnome_tpu.graphs.synthetic import random_bench_graph
    from gnnome_tpu.models.sym_gated_gcn import init_params
    from gnnome_tpu.train.step import make_steps, make_example
    from functools import partial

    cfg = Config()
    cfg.model.dropout = 0.2
    cfg.compute.matmul_precision = "default"
    cfg.compute.dtype = args.dtype
    cfg.compute.backend = args.backend
    cfg.compute.remat = {"true": True, "false": False, "full": "full"}[args.remat]
    if args.no_sym:
        cfg.train.use_symmetry_loss = False

    src, dst = random_bench_graph(args.nodes, args.degree, seed=0)
    n_nodes, n_edges = args.nodes, src.shape[0]
    rng = np.random.default_rng(0)
    in_deg = np.bincount(dst, minlength=n_nodes).astype(np.float32)
    out_deg = np.bincount(src, minlength=n_nodes).astype(np.float32)
    e_feat = rng.normal(size=(n_edges, 2)).astype(np.float32)
    y = (rng.random(n_edges) < 0.5).astype(np.float32)
    ex = make_example(cfg, in_deg, out_deg, e_feat, y, src, dst, n_nodes)

    params, state = init_params(jax.random.PRNGKey(0), cfg.model)
    tx, train_step, eval_step = make_steps(cfg)
    opt_state = tx.init(params)
    pw = jnp.asarray(1.0, jnp.float32)
    key = jax.random.PRNGKey(1)

    # rebuild the internal loss_fn pieces for partial timing
    from gnnome_tpu.models.zoo import get_model
    from gnnome_tpu.train.loss import bce_with_logits, symmetry_loss
    model_cfg = cfg.model
    backend = None if cfg.compute.backend == "auto" else cfg.compute.backend
    dtype = jnp.bfloat16 if cfg.compute.dtype == "bfloat16" else jnp.float32
    _, fwd = get_model(model_cfg.model)
    use_sym = cfg.train.use_symmetry_loss

    # NOTE: all big arrays must be jit ARGUMENTS — closure constants are
    # serialised into the remote-compile request body, which the tunnel
    # rejects (HTTP 413) at multi-million-edge scale
    slot_io = ex.slot_io

    def loss_fn(params, state, gt_, x_, x_rev_, e_, labels_, mask_,
                training):
        k1, k2 = jax.random.split(key)
        logits_org, st = fwd(params, state, gt_, x_, e_, model_cfg,
                             training=training, flip=False, rng=k1,
                             backend=backend,
                             remat=(cfg.compute.remat if training else False),
                             dtype=dtype, slot_io=slot_io)
        logits_org = logits_org[:, 0]
        if use_sym:
            logits_rev, st = fwd(params, st, gt_, x_rev_, e_, model_cfg,
                                 training=training, flip=True, rng=k2,
                                 backend=backend,
                                 remat=(cfg.compute.remat if training else False),
                                 dtype=dtype, slot_io=slot_io)
            loss = symmetry_loss(logits_org, logits_rev[:, 0], labels_, pw,
                                 alpha=cfg.train.alpha, mask=mask_)
        else:
            loss = bce_with_logits(logits_org, labels_, pw, mask=mask_)
        return loss

    train_fwd = jax.jit(partial(loss_fn, training=True))
    grad_fn = jax.jit(lambda p, s, *a: jax.value_and_grad(
        lambda pp: loss_fn(pp, s, *a, True))(p))

    def timeit(name, f, iters=args.iters):
        try:
            return _timeit(name, f, iters)
        except Exception as exc:
            print(f"{name:28s}    FAILED: {str(exc)[:160]}")

    def _timeit(name, f, iters):
        r = f()
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, r)
        # host read for tunnel sync
        float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f()
            float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s} {dt*1000:9.1f} ms   ({n_edges/dt/1e6:.3f} M edges/s)")
        return dt

    print(f"graph: {n_nodes} nodes / {n_edges} edges  backend={args.backend} "
          f"dtype={args.dtype} remat={cfg.compute.remat} sym={use_sym}")

    big = (ex.gt, ex.x, ex.x_rev, ex.e, ex.labels, ex.mask)
    timeit("eval forward", lambda: eval_step(
        params, state, ex.gt, ex.x, ex.x_rev, ex.e, ex.labels, ex.mask, pw))
    timeit("train forward (no grad)", lambda: train_fwd(params, state, *big))
    timeit("value_and_grad", lambda: grad_fn(params, state, *big))
    box = {"p": params, "s": state, "o": opt_state}

    def full():
        box["p"], box["s"], box["o"], loss, _ = train_step(
            box["p"], box["s"], box["o"], ex.gt, ex.x, ex.x_rev, ex.e,
            ex.labels, ex.mask, pw, key)
        return loss
    timeit("full train step", full)

    if args.trace:
        jax.profiler.start_trace(args.trace)
        full()
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
