"""Pallas/Mosaic TPU kernels for the message-passing hot path.

Two kernels over the windowed plan (ops/windowed.py):

K1 ``gather_gate``   per edge tile: DMA both endpoints' node-row windows into
                     VMEM (Pallas block prefetch with scalar-driven index maps
                     — consecutive tiles reuse unchanged windows), select rows
                     with one-hot matmuls ON THE MXU, and emit the fused gate
                     input ``B1h[u] + B2h[v] + B3e`` plus the gathered message
                     values A2h[u], A3h[v].

K2 ``aggregate``     per edge tile: transpose-one-hot matmuls accumulate
                     ``[sigma*m | sigma]`` into per-tile window partials for
                     BOTH aggregation directions; a cheap XLA segment-sum
                     combines the (much smaller) partial rows into node space.

Tiles are large (TILE_E edges) to amortise window DMA and keep the partial
volume small; the edge loop runs in CHUNK-row steps inside the kernel so the
one-hot temporaries stay VMEM-sized.  Dots run at Precision.HIGHEST: with f32
inputs the one-hot row select is then exact to f32 (bf16x3 passes), with bf16
inputs it is a single MXU pass with f32 accumulation.

Both kernels replace row-gather/scatter HLOs (the measured cost driver on
TPU — see models/sym_gated_gcn.py docstring) with sequential window DMA + MXU
selects.  Edges escaping their tile window are routed to a small XLA overflow
path by the caller (ops/message.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .windowed import WindowedPlan

CHUNK = 512          # edge rows per inner step (one-hot height)


def _prec(dtype):
    # HIGHEST makes f32 one-hot selects exact (bf16x3 passes); bf16 operands
    # must use default precision (Mosaic rejects fp32 contract on bf16 lhs)
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------- K1: gather
def _k1_kernel(u_blk_ref, v_blk_ref, u0, u1, v0, v1, ul, vl, b3e,
               gate_out, a2h_out, a3h_out, *, tile_e, window, d, chunk):
    io = jax.lax.broadcasted_iota(jnp.int32, (chunk, window), 1)
    dt = gate_out.dtype

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        ulc = ul[sl, 0]
        vlc = vl[sl, 0]

        def select(idx, w0, w1):
            oh0 = (io == idx[:, None]).astype(w0.dtype)
            oh1 = (io == (idx[:, None] - window)).astype(w0.dtype)
            pr = _prec(w0.dtype)
            return (jnp.dot(oh0, w0[:], preferred_element_type=jnp.float32,
                            precision=pr)
                    + jnp.dot(oh1, w1[:], preferred_element_type=jnp.float32,
                              precision=pr))

        gu = select(ulc, u0, u1)          # [chunk, 2d] = [B1h_u | A2h_u]
        gv = select(vlc, v0, v1)          # [chunk, 2d] = [B2h_v | A3h_v]
        gate_out[sl, :] = (gu[:, :d] + gv[:, :d]).astype(dt) + b3e[sl, :]
        a2h_out[sl, :] = gu[:, d:].astype(dt)
        a3h_out[sl, :] = gv[:, d:].astype(dt)
        return 0

    jax.lax.fori_loop(0, tile_e // chunk, body, 0)


def k1_gather_gate(plan: WindowedPlan, proj_u, proj_v, b3e):
    """proj_u/proj_v: [Np, 2d] node arrays ([B1h|A2h] / [B2h|A3h]);
    b3e: [Ep, d] slot order.  Returns (gate_raw, a2h_u, a3h_v), each [Ep, d];
    overflow slots carry only the b3e part (caller patches)."""
    Ep, d = b3e.shape
    T, ET, W = plan.n_tiles, plan.tile_e, plan.window
    dtype = b3e.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t] + 1, 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t] + 1, 0)),
            pl.BlockSpec((ET, 1), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, 1), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((Ep, d), dtype)] * 3
    kern = functools.partial(_k1_kernel, tile_e=ET, window=W, d=d,
                             chunk=min(CHUNK, ET))
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(),
    )(plan.u_blk, plan.v_blk, proj_u, proj_u, proj_v, proj_v,
      plan.u_local, plan.v_local, b3e)


# ------------------------------------------------------------- K2: aggregate
def _k2_kernel(u_blk_ref, v_blk_ref, ul, vl, pay_u, pay_v,
               pu_out, pv_out, *, tile_e, window, chunk):
    io = jax.lax.broadcasted_iota(jnp.int32, (window, chunk), 0)
    # block-keyed accumulation: the out blocks follow u_blk/v_blk (monotone),
    # staying in VMEM across consecutive tiles; zero only on block change
    t = pl.program_id(0)

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

        def scatter(idx, pay_c, out):
            ohT0 = (io == idx[None, :]).astype(pay_c.dtype)
            ohT1 = (io == (idx[None, :] - window)).astype(pay_c.dtype)
            pr = _prec(pay_c.dtype)
            out[:window, :] += jnp.dot(
                ohT0, pay_c, preferred_element_type=jnp.float32,
                precision=pr).astype(out.dtype)
            out[window:, :] += jnp.dot(
                ohT1, pay_c, preferred_element_type=jnp.float32,
                precision=pr).astype(out.dtype)

        scatter(ulc, pay_u[sl, :], pu_out)
        scatter(vlc, pay_v[sl, :], pv_out)
        return 0

    jax.lax.fori_loop(0, tile_e // chunk, body, 0)


def k2_aggregate(plan: WindowedPlan, pay_u, pay_v):
    """pay_u/pay_v: [Ep, Dp] per-edge payloads ([sigma*m | sigma]).

    Returns (partial_u, partial_v): [NB*2W, Dp] per-BLOCK partial sums; row
    ``b*2W + j`` belongs to node ``b*W + j`` (combine with
    ``message.combine_block_partials`` — a reshape+add, no segment-sum).
    """
    Ep, Dp = pay_u.shape
    T, ET, W = plan.n_tiles, plan.tile_e, plan.window
    NB = plan.n_blocks

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((ET, 1), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, 1), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, Dp), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, Dp), lambda t, ub, vb: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((2 * W, Dp), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((2 * W, Dp), lambda t, ub, vb: (vb[t], 0)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((NB * 2 * W, Dp), jnp.float32)] * 2
    kern = functools.partial(_k2_kernel, tile_e=ET, window=W,
                             chunk=min(CHUNK, ET))
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(),
    )(plan.u_blk, plan.v_blk, plan.u_local, plan.v_local, pay_u, pay_v)


# ----------------------------------------------------- K3: fused eval layer
def _k3_kernel(u_blk_ref, v_blk_ref, u0, u1, v0, v1, ul, vl, b3e, e_in,
               affine, emask, e_out, pu_out, pv_out, *, tile_e, window, d,
               chunk):
    """Whole SymGatedGCN edge stage for EVAL mode in one pass: windowed
    endpoint selects -> gate -> BatchNorm affine -> relu -> residual ->
    sigmoid -> both aggregation partials.  No HBM round-trips between steps
    (the split K1/K2 path pays ~8 extra E x d passes per layer)."""
    io = jax.lax.broadcasted_iota(jnp.int32, (chunk, window), 1)
    ioT = jax.lax.broadcasted_iota(jnp.int32, (window, chunk), 0)
    scale = affine[0:1, :]
    bias = affine[1:2, :]
    # block-keyed accumulation (see _k2_kernel)
    t = pl.program_id(0)

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
        pr = _prec(u0.dtype)

        def select(idx, w0, w1):
            oh0 = (io == idx[:, None]).astype(w0.dtype)
            oh1 = (io == (idx[:, None] - window)).astype(w0.dtype)
            return (jnp.dot(oh0, w0[:], preferred_element_type=jnp.float32,
                            precision=pr)
                    + jnp.dot(oh1, w1[:], preferred_element_type=jnp.float32,
                              precision=pr))

        g_u = select(ulc, u0, u1)
        g_v = select(vlc, v0, v1)
        dt = e_out.dtype
        gate = (g_u[:, :d] + g_v[:, :d]).astype(dt) + b3e[sl, :]
        gate = gate * scale + bias            # eval BatchNorm affine
        gate = jax.nn.relu(gate)
        eo = gate + e_in[sl, :]
        e_out[sl, :] = eo
        # sigmoid in f32: Mosaic's bf16 logistic lowering miscompiles
        # (f32 constant broadcast into a bf16 vector)
        sigma = (jax.nn.sigmoid(eo.astype(jnp.float32)).astype(dt)
                 * emask[sl, :].astype(dt))

        pay_v = jnp.concatenate(
            [sigma * g_u[:, d:].astype(dt), sigma], axis=1)   # into dst
        pay_u = jnp.concatenate(
            [sigma * g_v[:, d:].astype(dt), sigma], axis=1)   # into src

        def scatter(idx, pay_c, out):
            ohT0 = (ioT == idx[None, :]).astype(pay_c.dtype)
            ohT1 = (ioT == (idx[None, :] - window)).astype(pay_c.dtype)
            prs = _prec(pay_c.dtype)
            out[:window, :] += jnp.dot(
                ohT0, pay_c, preferred_element_type=jnp.float32,
                precision=prs).astype(out.dtype)
            out[window:, :] += jnp.dot(
                ohT1, pay_c, preferred_element_type=jnp.float32,
                precision=prs).astype(out.dtype)

        scatter(ulc, pay_u, pu_out)
        scatter(vlc, pay_v, pv_out)
        return 0

    jax.lax.fori_loop(0, tile_e // chunk, body, 0)


def k3_fused_eval_layer(plan: WindowedPlan, proj_u, proj_v, b3e, e_in,
                        bn_scale, bn_bias, emask):
    """Fused eval edge stage.  Returns (e_out [Ep, d], partial_u, partial_v
    [NB*2W, 2d] per-block partials); overflow slots carry gate = affine(b3e)
    + residual only (caller patches e_out and adds overflow payloads)."""
    Ep, d = b3e.shape
    T, ET, W = plan.n_tiles, plan.tile_e, plan.window
    dtype = b3e.dtype
    # [8, d]: min sublane tile is 8; rows 0/1 hold scale/bias
    affine = jnp.concatenate(
        [jnp.stack([bn_scale, bn_bias]),
         jnp.zeros((6, d), bn_scale.dtype)]).astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t] + 1, 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t] + 1, 0)),
            pl.BlockSpec((ET, 1), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, 1), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((8, d), lambda t, ub, vb: (0, 0)),
            pl.BlockSpec((ET, 1), lambda t, ub, vb: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((2 * W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((2 * W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
        ],
    )
    NB = plan.n_blocks
    out_shape = [
        jax.ShapeDtypeStruct((Ep, d), dtype),
        jax.ShapeDtypeStruct((NB * 2 * W, 2 * d), jnp.float32),
        jax.ShapeDtypeStruct((NB * 2 * W, 2 * d), jnp.float32),
    ]
    kern = functools.partial(_k3_kernel, tile_e=ET, window=W, d=d,
                             chunk=min(CHUNK, ET))
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(),
    )(plan.u_blk, plan.v_blk, proj_u, proj_u, proj_v, proj_v,
      plan.u_local, plan.v_local, b3e, e_in, affine, emask)


# ----------------------------------------------------------------- utilities
_INTERPRET = False


def set_interpret(flag: bool) -> None:
    """Interpreter mode for CPU testing of the kernels."""
    global _INTERPRET
    _INTERPRET = flag


def _interpret() -> bool:
    return _INTERPRET
