#!/usr/bin/env python
"""Microbenchmark the message-passing kernels on the bench graph.

Each candidate runs N times inside ONE jit (lax.fori_loop with a data
dependency) so per-call dispatch/tunnel overhead is amortised away; reported
number is per-iteration device time.  All tensors are jit ARGUMENTS (closure
constants would be serialised into the remote-compile request).

Usage: python scripts/kernel_bench.py [--nodes N] [--reps 20] [--only NAME]
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
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", default="")
    ap.add_argument("--tile-e", type=int, default=0)
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from gnnome_tpu.config import Config
    from gnnome_tpu.graphs.synthetic import random_bench_graph
    from gnnome_tpu.ops import message
    from gnnome_tpu.ops.graph_tensors import GraphTensors, with_windowed_plans
    from gnnome_tpu.train.step import effective_pads

    jax.config.update("jax_default_matmul_precision", "default")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = Config()
    cfg.compute.backend = "pallas"

    src, dst = random_bench_graph(args.nodes, args.degree, seed=0)
    n_nodes, n_edges = args.nodes, int(src.shape[0])
    epad, npad = effective_pads(cfg)
    gt = GraphTensors.build(src, dst, n_nodes, edge_pad_multiple=epad,
                            node_pad_multiple=npad)
    if args.tile_e or args.window or args.chunk:
        import dataclasses
        from gnnome_tpu.ops.windowed import build_windowed_plan, TILE_E, WINDOW, CHUNK
        plan = build_windowed_plan(
            gt, flip=False, tile_e=args.tile_e or TILE_E,
            window=args.window or WINDOW, chunk=args.chunk or CHUNK)
        gt = dataclasses.replace(gt, wplan=plan)
    else:
        gt = with_windowed_plans(gt, flip_too=False)
    plan = gt.wplan
    Ep, Np = gt.n_edges_pad, gt.n_nodes_pad
    d = 64
    rng = np.random.default_rng(0)

    proj_u = jnp.asarray(rng.normal(size=(Np, 2 * d)), dtype)
    proj_v = jnp.asarray(rng.normal(size=(Np, 2 * d)), dtype)
    b3e = jnp.asarray(rng.normal(size=(Ep, d)), dtype)
    e_in = jnp.asarray(rng.normal(size=(Ep, d)), dtype)
    pay_u = jnp.asarray(rng.normal(size=(Ep, d + 1)), dtype)
    pay_v = jnp.asarray(rng.normal(size=(Ep, d + 1)), dtype)
    scale = jnp.ones((d,), dtype)
    bias = jnp.zeros((d,), dtype)
    h = jnp.asarray(rng.normal(size=(Np, d)), dtype)
    w5 = jnp.asarray(rng.normal(size=(d, 5 * d)), dtype)

    reps = args.reps

    def timeit(name, body, *tensors):
        """body(i, *tensors) -> tensor with same shape/dtype as tensors[0]."""
        if args.only and args.only not in name:
            return

        @partial(jax.jit, static_argnums=())
        def run(*ts):
            def it(i, x):
                return body(i, x, *ts[1:])
            return jax.lax.fori_loop(0, reps, it, ts[0])

        r = run(*tensors)
        float(r.reshape(-1)[0].astype(jnp.float32))
        t0 = time.perf_counter()
        r = run(*tensors)
        float(r.reshape(-1)[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:34s} {dt*1000:8.2f} ms/iter  "
              f"({n_edges/dt/1e6:8.1f} M edges/s)", flush=True)
        return dt

    print(f"graph: {n_nodes} nodes / {n_edges} edges (Ep={Ep}, Np={Np}) "
          f"dtype={args.dtype} tile_e={plan.tile_e} window={plan.window} "
          f"tiles={plan.n_tiles} ovf={plan.n_ovf}", flush=True)

    def k1_body(i, b3, pu, pv, pl, s_, d_):
        g3 = message._gate_gather_pallas(pl, s_, d_, pu, pv, b3)
        return g3[:, :d] + g3[:1, d: 2 * d] + g3[:1, 2 * d:]

    timeit("K1 gather_gate (+ovf patch)", k1_body, b3e, proj_u, proj_v,
           plan, gt.src, gt.dst)

    def k2_body(i, p, pv, pl, s_, d_):
        sb, sf = message._aggregate_pallas(pl, s_, d_, p, pv)
        return p + sf[:1, :].astype(p.dtype) + sb[:1, :].astype(p.dtype)

    timeit("K2 aggregate (+combine+ovf)", k2_body, pay_u, pay_v,
           plan, gt.src, gt.dst)

    b3e_p = message.pack_edges(b3e)
    e_in_p = message.pack_edges(e_in)
    deo_p = message.pack_edges(e_in) * 0.01

    def k3_body(i, e, pu, pv, b3, g):
        eo, sv, su = message.fused_eval_edge_stage(g, pu, pv, b3, e,
                                                   scale, bias)
        return eo + sv[:1, :].astype(eo.dtype) + su[:1, :].astype(eo.dtype)

    timeit("K3 fused edge stage (packed)", k3_body, e_in_p, proj_u, proj_v,
           b3e_p, gt)

    def k7_body(i, b3, pu, pv, pl):
        from gnnome_tpu.ops.pallas_kernels import k7_gate_stats
        stats = k7_gate_stats(pl, pu, pv, b3)
        return b3 + stats[:1, :].astype(b3.dtype)

    timeit("K7 gate stats", k7_body, b3e_p, proj_u, proj_v, plan)

    def k8_body(i, b3, ei, de, pu, pv, pl):
        from gnnome_tpu.ops.pallas_kernels import k8_train_layer_bwd
        xp, dp, pu_parts, pv_parts, _st = k8_train_layer_bwd(
            pl, pu, pv, pu, pv, b3, ei, de,
            scale.astype(jnp.float32), bias.astype(jnp.float32),
            with_xsum=True)
        return xp + dp[:1, :] + pu_parts[0][:1, :1].astype(xp.dtype)

    timeit("K8 fused train backward + xsum", k8_body, b3e_p, e_in_p, deo_p,
           proj_u, proj_v, plan)

    wuv = jnp.asarray(rng.normal(size=(d, 4 * d)) * 0.1, dtype)
    buv = jnp.zeros((4 * d,), dtype)
    w3 = jnp.asarray(rng.normal(size=(d, d)) * 0.1, dtype)
    zero = jnp.zeros_like(w3)
    wbd = jnp.concatenate([jnp.concatenate([w3, zero], axis=1),
                           jnp.concatenate([zero, w3], axis=1)], axis=0)
    b3b = jnp.zeros((2 * d,), dtype)

    def tl_body(i, ei, h_, wu, g):
        eo, sv, su, mn, uv = message.fused_train_stage(
            g, h_, wu, buv, wbd, b3b, ei, scale.astype(jnp.float32),
            bias.astype(jnp.float32))
        return ei + eo[:1, :] + sv[:1, :].astype(ei.dtype)

    timeit("full train-fwd stage (proj+K7+K3)", tl_body, e_in_p, h, wuv, gt)

    def tlg_body(i, ei, h_, wu, g):
        def f(h2, wu2, ei2):
            eo, sv, su, mn, uv = message.fused_train_stage(
                g, h2, wu2, buv, wbd, b3b, ei2, scale.astype(jnp.float32),
                bias.astype(jnp.float32))
            return (eo.astype(jnp.float32).sum()
                    + sv.sum() + su.sum())
        dh, dwu, dei = jax.grad(f, argnums=(0, 1, 2))(h_, wu, ei)
        return ei + dei + dh[:1, :1].astype(ei.dtype)

    timeit("train stage fwd+bwd (K7+K3+K8)", tlg_body, e_in_p, h, wuv, gt)

    from gnnome_tpu.models.sym_gated_gcn import (score_edges,
                                                 _predictor_init)
    pred_p = _predictor_init(jax.random.PRNGKey(0), d, d)

    def sp_body(i, ei, h_, g):
        z = score_edges(pred_p, g, h_, ei, dtype=dtype, backend="pallas",
                        packed=True)
        return ei + z[:1, :1].astype(ei.dtype)

    timeit("score predictor fwd (K6)", sp_body, e_in_p, h, gt)

    def spg_body(i, ei, h_, g):
        def f(h2, ei2):
            z = score_edges(pred_p, g, h2, ei2, dtype=dtype,
                            backend="pallas", packed=True)
            return z.astype(jnp.float32).sum()
        dh, dei = jax.grad(f, argnums=(0, 1))(h_, ei)
        return ei + dei + dh[:1, :1].astype(ei.dtype)

    timeit("score predictor fwd+bwd", spg_body, e_in_p, h, gt)

    def xg_body(i, b3, pu, pv, s_, d_):
        g, a2, a3 = message._gate_gather_xla(s_, d_, True, pu, pv, b3)
        return g + a2[:1, :] + a3[:1, :]

    timeit("XLA endpoint gathers + gate", xg_body, b3e, proj_u, proj_v,
           gt.src, gt.dst)

    def xs_body(i, p, pv, s_, d_):
        sf = jax.ops.segment_sum(p.astype(jnp.float32), d_,
                                 num_segments=Np, indices_are_sorted=True)
        sb = jax.ops.segment_sum(pv.astype(jnp.float32), s_,
                                 num_segments=Np)
        return p + sf[:1, :].astype(p.dtype) + sb[:1, :].astype(p.dtype)

    timeit("XLA segment-sum pair (sort+unsort)", xs_body, pay_u, pay_v,
           gt.src, gt.dst)

    timeit("XLA node gather [Ep,64]", lambda i, hh, s_: hh + jnp.take(
        hh, s_, axis=0)[:1, :], h, gt.src)

    timeit("elementwise sigmoid chain [Ep,64]",
           lambda i, e, ei: jax.nn.sigmoid(e) * e + ei[:1, :], e_in, e_in)

    timeit("proj matmul [Np,64]x[64,320]",
           lambda i, hh, ww: hh + (hh @ ww)[:, :d], h, w5)


if __name__ == "__main__":
    main()
