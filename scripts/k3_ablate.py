#!/usr/bin/env python
"""Ablate the K3 kernel to locate its cost: full / no-scatter / no-select /
DMA-only variants, plus chunk-size and dot-precision sweeps."""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(variant, tile_e, window, d, chunk):
    def kern(u_blk_ref, v_blk_ref, u0, u1, v0, v1, ul, vl, b3e, e_in,
             affine, emask, e_out, pu_out, pv_out):
        io2 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 2 * window), 1)
        scale = affine[0:1, :]
        bias = affine[1:2, :]
        t = pl.program_id(0)

        if variant in ("per_tile", "noout", "dma_noout"):
            pu_out[:] = jnp.zeros_like(pu_out)
            pv_out[:] = jnp.zeros_like(pv_out)
        else:
            @pl.when(jnp.logical_or(t == 0, u_blk_ref[t] != u_blk_ref[t - 1]))
            def _():
                pu_out[:] = jnp.zeros_like(pu_out)

            @pl.when(jnp.logical_or(t == 0, v_blk_ref[t] != v_blk_ref[t - 1]))
            def _():
                pv_out[:] = jnp.zeros_like(pv_out)

        def body(c, _):
            sl = pl.ds(c * chunk, chunk)
            ulc = ul[sl, 0]
            vlc = vl[sl, 0]
            dt = e_out.dtype
            if variant in ("dma_only", "dma_noout"):
                e_out[sl, :] = b3e[sl, :] + e_in[sl, :] + u0[0:1, :d] + v0[0:1, :d]
                return 0
            oh_u = (io2 == ulc[:, None]).astype(u0.dtype)
            oh_v = (io2 == vlc[:, None]).astype(u0.dtype)
            if variant == "oh_only":
                e_out[sl, :] = (b3e[sl, :] + e_in[sl, :]
                                + oh_u[:, :d].astype(dt) + oh_v[:, :d].astype(dt))
                return 0

            def select(oh, w0, w1):
                return (jnp.dot(oh[:, :window], w0[:],
                                preferred_element_type=jnp.float32)
                        + jnp.dot(oh[:, window:], w1[:],
                                  preferred_element_type=jnp.float32))

            g_u = select(oh_u, u0, u1)
            g_v = select(oh_v, v0, v1)
            gate = (g_u[:, :d] + g_v[:, :d]).astype(dt) + b3e[sl, :]
            gate = gate * scale + bias
            gate = jax.nn.relu(gate)
            eo = gate + e_in[sl, :]
            e_out[sl, :] = eo
            if variant == "no_scatter":
                return 0
            sigma = (jax.nn.sigmoid(eo.astype(jnp.float32)).astype(dt)
                     * emask[sl, :].astype(dt))
            pay_v = jnp.concatenate([sigma * g_u[:, d:].astype(dt), sigma], 1)
            pay_u = jnp.concatenate([sigma * g_v[:, d:].astype(dt), sigma], 1)

            def scatter_t(idx, pay_c, out):
                ioT = jax.lax.broadcasted_iota(jnp.int32, (window, chunk), 0)
                ohT0 = (ioT == idx[None, :]).astype(pay_c.dtype)
                ohT1 = (ioT == (idx[None, :] - window)).astype(pay_c.dtype)
                out[:window, :] += jnp.dot(
                    ohT0, pay_c, preferred_element_type=jnp.float32
                ).astype(out.dtype)
                out[window:, :] += jnp.dot(
                    ohT1, pay_c, preferred_element_type=jnp.float32
                ).astype(out.dtype)

            def scatter_r(oh, pay_c, out):
                dn = (((0,), (0,)), ((), ()))
                out[:window, :] += jax.lax.dot_general(
                    oh[:, :window], pay_c, dimension_numbers=dn,
                    preferred_element_type=jnp.float32).astype(out.dtype)
                out[window:, :] += jax.lax.dot_general(
                    oh[:, window:], pay_c, dimension_numbers=dn,
                    preferred_element_type=jnp.float32).astype(out.dtype)

            if variant == "full_reuse":
                scatter_r(oh_u, pay_u, pu_out)
                scatter_r(oh_v, pay_v, pv_out)
            elif variant == "noout":
                pu_out[0:8, :] += jnp.sum(pay_u, axis=0, keepdims=True)
                pv_out[0:8, :] += jnp.sum(pay_v, axis=0, keepdims=True)
            else:
                scatter_t(ulc, pay_u, pu_out)
                scatter_t(vlc, pay_v, pv_out)
            return 0

        jax.lax.fori_loop(0, tile_e // chunk, body, 0)

    return kern


def run_variant(plan, variant, proj_u, proj_v, b3e, e_in, affine, emask,
                chunk, d=64):
    T, ET, W = plan.n_tiles, plan.tile_e, plan.window
    Ep = b3e.shape[0]
    NB = plan.n_blocks
    dtype = b3e.dtype
    if variant == "static_in":
        win_maps = [lambda t, ub, vb: (t // 4, 0),
                    lambda t, ub, vb: (t // 4 + 1, 0),
                    lambda t, ub, vb: (t // 4, 0),
                    lambda t, ub, vb: (t // 4 + 1, 0)]
    else:
        win_maps = [lambda t, ub, vb: (ub[t], 0),
                    lambda t, ub, vb: (ub[t] + 1, 0),
                    lambda t, ub, vb: (vb[t], 0),
                    lambda t, ub, vb: (vb[t] + 1, 0)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((W, 2 * d), win_maps[0]),
            pl.BlockSpec((W, 2 * d), win_maps[1]),
            pl.BlockSpec((W, 2 * d), win_maps[2]),
            pl.BlockSpec((W, 2 * d), win_maps[3]),
            pl.BlockSpec((ET, 1), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, 1), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((8, d), lambda t, ub, vb: (0, 0)),
            pl.BlockSpec((ET, 1), lambda t, ub, vb: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
        ] + ([
            pl.BlockSpec((8, 2 * d), lambda t, ub, vb: (0, 0)),
            pl.BlockSpec((8, 2 * d), lambda t, ub, vb: (0, 0)),
        ] if variant in ("noout", "dma_noout") else [
            pl.BlockSpec((2 * W, 2 * d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((2 * W, 2 * d), lambda t, ub, vb: (t, 0)),
        ] if variant == "per_tile" else [
            pl.BlockSpec((2 * W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((2 * W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
        ]),
    )
    out_shape = [
        jax.ShapeDtypeStruct((Ep, d), dtype),
    ] + ([
        jax.ShapeDtypeStruct((8, 2 * d), jnp.float32),
        jax.ShapeDtypeStruct((8, 2 * d), jnp.float32),
    ] if variant in ("noout", "dma_noout") else [
        jax.ShapeDtypeStruct((T * 2 * W, 2 * d), jnp.float32),
        jax.ShapeDtypeStruct((T * 2 * W, 2 * d), jnp.float32),
    ] if variant == "per_tile" else [
        jax.ShapeDtypeStruct((NB * 2 * W, 2 * d), jnp.float32),
        jax.ShapeDtypeStruct((NB * 2 * W, 2 * d), jnp.float32),
    ])
    kern = make_kernel(variant, ET, W, d, chunk)
    return pl.pallas_call(kern, grid_spec=grid_spec, out_shape=out_shape)(
        plan.u_blk, plan.v_blk, proj_u, proj_u, proj_v, proj_v,
        plan.u_local, plan.v_local, b3e, e_in, affine, emask)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=262_144)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--tile-e", type=int, default=0)
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    from gnnome_tpu.config import Config
    from gnnome_tpu.graphs.synthetic import random_bench_graph
    from gnnome_tpu.ops.graph_tensors import GraphTensors, with_windowed_plans
    from gnnome_tpu.train.step import effective_pads

    jax.config.update("jax_default_matmul_precision", "default")
    import math
    from gnnome_tpu.ops.windowed import build_windowed_plan, TILE_E, WINDOW
    cfg = Config()
    cfg.compute.backend = "pallas"
    src, dst = random_bench_graph(args.nodes, 6.0, seed=0)
    te = args.tile_e or TILE_E
    w = args.window or WINDOW
    epad, npad = math.lcm(512, te), math.lcm(128, w)
    gt = GraphTensors.build(src, dst, args.nodes, edge_pad_multiple=epad,
                            node_pad_multiple=npad)
    plan = build_windowed_plan(gt, tile_e=te, window=w)
    print(f"tile_e={te} window={w} tiles={plan.n_tiles} ovf={plan.n_ovf}",
          flush=True)
    Ep, Np = gt.n_edges_pad, gt.n_nodes_pad
    d = 64
    n_edges = int(src.shape[0])
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    proj_u = jnp.asarray(rng.normal(size=(Np, 2 * d)), dt)
    proj_v = jnp.asarray(rng.normal(size=(Np, 2 * d)), dt)
    b3e = jnp.asarray(rng.normal(size=(Ep, d)), dt)
    e_in = jnp.asarray(rng.normal(size=(Ep, d)), dt)
    affine = jnp.zeros((8, d), dt).at[0].set(1.0)
    emask = jnp.asarray(np.asarray(gt.edge_mask), dt)

    reps = args.reps

    pairs = [("noout", 512), ("per_tile", 512),
             ("static_in", 512), ("noout", 1024),
             ("per_tile", 1024)]
    if args.variants:
        pairs = []
        for it in args.variants.split(","):
            v, c = it.rsplit(":", 1)
            pairs.append((v, int(c)))
    for variant, chunk in pairs:
        @jax.jit
        def run(pu, pv, b3, ei, em):
            def it(i, x):
                eo, s1, s2 = run_variant(plan, variant, pu, pv, b3, x, affine,
                                         em, chunk)
                return eo
            return jax.lax.fori_loop(0, reps, it, ei)

        try:
            r = run(proj_u, proj_v, b3e, e_in, emask)
            float(r.reshape(-1)[0].astype(jnp.float32))
            t0 = time.perf_counter()
            r = run(proj_u, proj_v, b3e, e_in, emask)
            float(r.reshape(-1)[0].astype(jnp.float32))
            ms = (time.perf_counter() - t0) / reps * 1000
            print(f"{variant:12s} chunk={chunk:5d}  {ms:8.2f} ms "
                  f"({n_edges/ms/1e3:8.1f} M edges/s)", flush=True)
        except Exception as e:
            print(f"{variant:12s} chunk={chunk:5d}  FAILED: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
