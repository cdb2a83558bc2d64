#!/usr/bin/env python
"""Time the DUAL-pass train step's stages in isolation on the bench graph.

Stages (all at dual width: h [Np, 2d], packed edges [Ep/2, 4d]):
  proj        the two dual projection matmuls (h @ w_uv, e @ wbd3)
  k7          dual gate statistics
  k3          dual fused eval edge stage (affine folded)
  trainstage  proj+K7+K3 (fused_train_stage forward)
  trainbwd    fused_train_stage fwd+bwd (adds K8 + combines + patches)
  score       dual score predictor forward
  scorebwd    dual score predictor fwd+bwd
  node        dual node stage (gated means + A1 + BN + relu + dropout)

Usage: python scripts/dual_probe.py [--nodes N] [--iters K] [--only S1,S2]
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from gnnome_tpu.config import Config
    from gnnome_tpu.graphs.synthetic import random_bench_graph
    from gnnome_tpu.models.sym_gated_gcn import (init_params, _dual_wuv, _bd,
                                                 _bd4, score_edges_dual)
    from gnnome_tpu.ops import message
    from gnnome_tpu.train.step import make_example

    cfg = Config()
    cfg.compute.dtype = args.dtype
    cfg.compute.backend = "pallas"
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    src, dst = random_bench_graph(args.nodes, args.degree, seed=0)
    n = args.nodes
    rng = np.random.default_rng(0)
    in_deg = np.bincount(dst, minlength=n).astype(np.float32)
    out_deg = np.bincount(src, minlength=n).astype(np.float32)
    e_feat = rng.normal(size=(src.shape[0], 2)).astype(np.float32)
    y = (rng.random(src.shape[0]) < 0.5).astype(np.float32)
    ex = make_example(cfg, in_deg, out_deg, e_feat, y, src, dst, n)
    gt = ex.gt
    d = cfg.model.dim_latent
    Np, Ep = gt.n_nodes_pad, gt.n_edges_pad
    print(f"graph: {n} nodes / {gt.n_edges} edges (Np={Np} Ep={Ep}) "
          f"dual width 2d={2*d}", flush=True)

    params, state = init_params(jax.random.PRNGKey(0), cfg.model)
    p0 = jax.tree_util.tree_map(lambda a: a[0], params["gnn"])
    w_uv, b_uv = _dual_wuv(p0, dtype)
    w3 = p0["B3"]["w"].astype(dtype)
    wbd3 = _bd4(w3)
    b3b = jnp.concatenate([p0["B3"]["b"]] * 4).astype(dtype)
    gamma2 = jnp.concatenate([p0["bn_e"]["scale"]] * 2)
    beta2 = jnp.concatenate([p0["bn_e"]["bias"]] * 2)

    h = jnp.asarray(rng.normal(size=(Np, 2 * d)) * 0.3, dtype)
    e_p = jnp.asarray(rng.normal(size=(Ep // 2, 4 * d)) * 0.3, dtype)
    scale2 = jnp.asarray(rng.random(2 * d) + 0.5, jnp.float32)
    bias2 = jnp.asarray(rng.random(2 * d) - 0.5, jnp.float32)

    def timeit(name, f, *tensors):
        if args.only and name not in args.only.split(","):
            return

        def body(ts):
            r = ts[0]
            for i in range(4):
                r = f(i, *ts)
            return r

        jf = jax.jit(body)
        r = jf(tensors)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = jf(tensors)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        dt = (time.perf_counter() - t0) / args.iters / 4
        print(f"{name:26s} {dt*1000:8.2f} ms", flush=True)

    # --- projection matmuls only
    def proj_f(i, h_, e_):
        pr = h_ @ w_uv + b_uv
        b3 = e_ @ wbd3 + b3b
        return pr[:, :1] + b3[:1, :1] * 0 + h_ * (1 + i * 0)

    timeit("proj (h@w_uv + e@wbd3)", proj_f, h, e_p)

    # --- K7 dual
    from gnnome_tpu.ops.pallas_kernels import k7_gate_stats

    def k7_f(i, h_, e_):
        pr = h_ @ w_uv + b_uv
        b3 = e_ @ wbd3 + b3b
        st = k7_gate_stats(gt.wplan, pr[:, :4 * d], pr[:, 4 * d:], b3)
        return h_ + st[:1, :1].astype(h_.dtype)

    timeit("proj + K7 stats", k7_f, h, e_p)

    # --- K3 dual (eval stage, affine folded)
    def k3_f(i, h_, e_):
        pr = h_ @ w_uv + b_uv
        b3 = e_ @ wbd3 + b3b
        eo, sv, su = message.fused_eval_edge_stage(
            gt, pr[:, :4 * d], pr[:, 4 * d:], b3, e_,
            scale2.astype(dtype), bias2.astype(dtype))
        return h_ + eo[:1, :1].astype(h_.dtype) + sv[:1, :1].astype(h_.dtype)

    timeit("proj + K3 eval stage", k3_f, h, e_p)

    # --- full dual train stage forward
    def ts_f(i, h_, e_):
        eo, sv, su, mn, uv = message.fused_train_stage(
            gt, h_, w_uv, b_uv, wbd3, b3b, e_, gamma2, beta2)
        return h_ + eo[:1, :1].astype(h_.dtype) + sv[:1, :1].astype(h_.dtype)

    timeit("train stage fwd (K7+K3)", ts_f, h, e_p)

    # --- train stage fwd+bwd
    def tsg_f(i, h_, e_):
        def f(h2, e2):
            eo, sv, su, mn, uv = message.fused_train_stage(
                gt, h2, w_uv, b_uv, wbd3, b3b, e2, gamma2, beta2)
            return (eo.astype(jnp.float32).sum() + sv.sum() + su.sum())
        dh, de = jax.grad(f, argnums=(0, 1))(h_, e_)
        return h_ + dh[:1, :1].astype(h_.dtype) + de[:1, :1].astype(h_.dtype)

    timeit("train stage fwd+bwd (+K8)", tsg_f, h, e_p)

    # --- dual score predictor
    def sc_f(i, h_, e_):
        z = score_edges_dual(params["predictor"], gt, h_, e_, dtype=dtype)
        return h_ + z[:1, :1].astype(h_.dtype)

    timeit("score fwd (K6)", sc_f, h, e_p)

    def scg_f(i, h_, e_):
        def f(h2, e2):
            z = score_edges_dual(params["predictor"], gt, h2, e2, dtype=dtype)
            return z.astype(jnp.float32).sum()
        dh, de = jax.grad(f, argnums=(0, 1))(h_, e_)
        return h_ + dh[:1, :1].astype(h_.dtype) + de[:1, :1].astype(h_.dtype)

    timeit("score fwd+bwd", scg_f, h, e_p)

    # --- node stage (gated means + A1 + dual BN + relu)
    from gnnome_tpu.models.norm import batch_norm_dual
    from gnnome_tpu.models.sym_gated_gcn import GATE_EPS
    sum_v = jnp.asarray(rng.normal(size=(Np, 4 * d)), dtype)
    sum_u = jnp.asarray(rng.normal(size=(Np, 4 * d)), dtype)
    a1w = p0["A1"]["w"].astype(dtype)
    a1b = jnp.concatenate([p0["A1"]["b"]] * 2).astype(dtype)
    bnp = {"scale": p0["bn_h"]["scale"], "bias": p0["bn_h"]["bias"]}
    bns = {"mean": jnp.zeros(d), "var": jnp.ones(d),
           "count": jnp.zeros((), jnp.int32)}

    def node_f(i, h_, sv_, su_):
        def gm(a, half):
            return (a[:, half * d:(half + 1) * d]
                    / (a[:, (2 + half) * d:(3 + half) * d]
                       + GATE_EPS)).astype(dtype)
        hf = jnp.concatenate([gm(sv_, 0), gm(su_, 1)], axis=1)
        hb = jnp.concatenate([gm(su_, 0), gm(sv_, 1)], axis=1)
        a1 = h_ @ _bd(a1w, a1w) + a1b
        hn = a1 + hf + hb
        hn, _ = batch_norm_dual(bnp, bns, hn, gt.node_mask, gt.n_nodes, True)
        return jax.nn.relu(hn) + h_

    timeit("node stage fwd", node_f, h, sum_v, sum_u)


if __name__ == "__main__":
    main()
