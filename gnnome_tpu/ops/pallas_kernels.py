"""Pallas/Mosaic TPU kernels for the message-passing hot path.

Three kernels over the windowed plan (ops/windowed.py):

K1 ``gather_gate``   per edge tile: DMA both endpoints' node-row windows into
                     VMEM (Pallas block prefetch with scalar-driven index maps
                     — consecutive tiles reuse unchanged windows), select rows
                     with one-hot matmuls ON THE MXU, and emit the fused gate
                     input ``B1h[u] + B2h[v] + B3e`` plus the gathered message
                     values A2h[u], A3h[v].

K2 ``aggregate``     per edge tile: one-hot matmuls accumulate
                     ``[sigma*m | sigma]`` into per-block window partials for
                     BOTH aggregation directions; a reshape+add combine turns
                     the partial rows into node space (ops/message.py).

K3 ``fused eval``    the whole eval-mode edge stage in one pass: selects ->
                     gate -> BN affine -> relu -> residual -> sigmoid -> both
                     aggregation partials.

One-hots are built **transposed** ``[2W, chunk]`` (window rows x edge lanes):
the per-edge local indices stream in lane-major rows (see windowed.py — a
column layout pays a 128x lane-padding tax in HBM, the dominant kernel cost
before this design), the build is a broadcast compare against iota over
sublanes, selects contract the one-hot's dim 0 (``dot_general`` with a
transposed contraction — native on the MXU), and scatters are plain dots that
accumulate a whole chunk in ONE MXU op.  Padded and overflow edges carry the
sentinel index 2W, so their one-hot columns are all-zero and they are inert
in every select and scatter — no edge mask enters the kernels; overflow slots
are patched by a small XLA path in the caller (ops/message.py).

Dots run at Precision.HIGHEST for f32 operands: the one-hot row select is
then exact to f32 (bf16x3 passes); bf16 operands use default precision (a
single MXU pass with f32 accumulation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .windowed import WindowedPlan


def _prec(dtype):
    # HIGHEST makes f32 one-hot selects exact (bf16x3 passes); bf16 operands
    # must use default precision (Mosaic rejects fp32 contract on bf16 lhs)
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _ohT(io2, idx_ref, c, chunk, dtype):
    """Transposed one-hot [2W, chunk] for in-kernel chunk ``c``: column e is
    one-hot at the local window row of edge ``c*chunk + e`` (all-zero for the
    sentinel 2W: padded / overflow edges)."""
    row = idx_ref[c, :][None, :]            # [1, chunk] lane-major
    return (io2 == row).astype(dtype)


def _selT(ohT, w0, w1, pr):
    """Row select via transposed contraction: [chunk, D] = ohT^T @ [w0; w1]."""
    dn = (((0,), (0,)), ((), ()))
    W = w0.shape[0]
    return (jax.lax.dot_general(ohT[:W], w0[:], dimension_numbers=dn,
                                preferred_element_type=jnp.float32,
                                precision=pr)
            + jax.lax.dot_general(ohT[W:], w1[:], dimension_numbers=dn,
                                  preferred_element_type=jnp.float32,
                                  precision=pr))


def _scatT(ohT, pay, lo, hi):
    """Accumulate a whole chunk into the block's window partial in one dot.
    The [2W, D] window result is split across two contiguous outputs (own
    block rows -> ``lo``, next-block rows -> ``hi``): the host-side combine
    is then a single fused pad+add over contiguous arrays instead of three
    strided-slice passes over an interleaved [NB*2W, D] layout (measured
    ~6.6 ms -> ~2 ms per combine on the bench graph)."""
    acc = jnp.dot(ohT, pay, preferred_element_type=jnp.float32,
                  precision=_prec(pay.dtype))
    W = lo.shape[0]
    lo[:] += acc[:W].astype(lo.dtype)
    hi[:] += acc[W:].astype(hi.dtype)


# ---------------------------------------------------------------- K1: gather
def _k1_kernel(u_blk_ref, v_blk_ref, u0, u1, v0, v1, ul, vl, b3e,
               g3_out, *, tile_e, window, d, chunk):
    io2 = jax.lax.broadcasted_iota(jnp.int32, (2 * window, chunk), 0)
    dt = g3_out.dtype

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        pr = _prec(u0.dtype)
        gu = _selT(_ohT(io2, ul, c, chunk, u0.dtype), u0, u1, pr)
        gv = _selT(_ohT(io2, vl, c, chunk, u0.dtype), v0, v1, pr)
        gate = (gu[:, :d] + gv[:, :d]).astype(dt) + b3e[sl, :]
        # one fused [chunk, 3d] store: a 3d-wide row costs 256 HBM lanes vs
        # 3 x 128 for separate d-wide outputs (every [*, 64] array lane-pads
        # 2x; [*, 192] pads only 1.33x) and one out-block DMA per tile
        g3_out[sl, :] = jnp.concatenate(
            [gate, gu[:, d:].astype(dt), gv[:, d:].astype(dt)], axis=1)
        return 0

    # static unroll: lets Mosaic interleave one-hot builds (VPU) with the
    # select/scatter dots (MXU) across chunks; fori_loop serialises them
    for c in range(tile_e // chunk):
        body(c, 0)


def k1_gather_gate(plan: WindowedPlan, proj_u, proj_v, b3e):
    """proj_u/proj_v: [Np, 2d] node arrays ([B1h|A2h] / [B2h|A3h]);
    b3e: [Ep, d] slot order.  Returns g3 [Ep, 3d] = [gate_raw | a2h_u | a3h_v];
    overflow slots carry only the b3e part of the gate (caller patches)."""
    Ep, d = b3e.shape
    T, ET, W, C = plan.n_tiles, plan.tile_e, plan.window, plan.chunk
    dtype = b3e.dtype
    rows = plan.rows_p

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t] + 1, 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t] + 1, 0)),
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ET, 3 * d), lambda t, ub, vb: (t, 0)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((Ep, 3 * d), dtype)]
    kern = functools.partial(_k1_kernel, tile_e=ET, window=W, d=d, chunk=C)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(),
    )(plan.u_blk, plan.v_blk, proj_u, proj_u, proj_v, proj_v,
      plan.u_local, plan.v_local, b3e)[0]


# ------------------------------------------------------------- K2: aggregate
def _k2_kernel(u_blk_ref, v_blk_ref, ul, vl, pay_u, pay_v,
               pu_lo, pu_hi, pv_lo, pv_hi, *, tile_e, window, chunk):
    io2 = jax.lax.broadcasted_iota(jnp.int32, (2 * window, chunk), 0)
    # block-keyed accumulation: the out blocks follow u_blk/v_blk (monotone),
    # staying in VMEM across consecutive tiles; zero only on block change
    t = pl.program_id(0)

    @pl.when(jnp.logical_or(t == 0, u_blk_ref[t] != u_blk_ref[t - 1]))
    def _():
        pu_lo[:] = jnp.zeros_like(pu_lo)
        pu_hi[:] = jnp.zeros_like(pu_hi)

    @pl.when(jnp.logical_or(t == 0, v_blk_ref[t] != v_blk_ref[t - 1]))
    def _():
        pv_lo[:] = jnp.zeros_like(pv_lo)
        pv_hi[:] = jnp.zeros_like(pv_hi)

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        dt = pay_u.dtype
        _scatT(_ohT(io2, ul, c, chunk, dt), pay_u[sl, :], pu_lo, pu_hi)
        _scatT(_ohT(io2, vl, c, chunk, dt), pay_v[sl, :], pv_lo, pv_hi)
        return 0

    # static unroll: lets Mosaic interleave one-hot builds (VPU) with the
    # select/scatter dots (MXU) across chunks; fori_loop serialises them
    for c in range(tile_e // chunk):
        body(c, 0)


def k2_aggregate(plan: WindowedPlan, pay_u, pay_v):
    """pay_u/pay_v: [Ep, Dp] per-edge payloads ([sigma*m | sigma]).

    Returns (pu_lo, pu_hi, pv_lo, pv_hi): [NB*W, Dp] per-BLOCK partial sums;
    row ``b*W + j`` of the low array belongs to node ``b*W + j``, of the high
    array to node ``(b+1)*W + j`` (combine with
    ``message.combine_block_partials`` — one fused pad+add).
    """
    Ep, Dp = pay_u.shape
    T, ET, W, C = plan.n_tiles, plan.tile_e, plan.window, plan.chunk
    NB = plan.n_blocks
    rows = plan.rows_p

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, Dp), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, Dp), lambda t, ub, vb: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((W, Dp), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, Dp), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, Dp), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, Dp), lambda t, ub, vb: (vb[t], 0)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((NB * W, Dp), jnp.float32)] * 4
    kern = functools.partial(_k2_kernel, tile_e=ET, window=W, chunk=C)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(),
    )(plan.u_blk, plan.v_blk, plan.u_local, plan.v_local, pay_u, pay_v)


# ----------------------------------------------------- K3: fused eval layer
def _k3_kernel(u_blk_ref, v_blk_ref, u0, u1, v0, v1, ul, vl, b3e, e_in,
               affine, e_out, pu_lo, pu_hi, pv_lo, pv_hi,
               *, tile_e, window, d, chunk):
    """Whole SymGatedGCN edge stage for EVAL mode in one pass: windowed
    endpoint selects -> gate -> BatchNorm affine -> relu -> residual ->
    sigmoid -> both aggregation partials.  No HBM round-trips between steps
    (the split K1/K2 path pays ~8 extra E x d passes per layer).  Each
    endpoint's one-hot is built once and reused by select AND scatter."""
    io2 = jax.lax.broadcasted_iota(jnp.int32, (2 * window, chunk), 0)
    scale = affine[0:1, :]
    bias = affine[1:2, :]
    # block-keyed accumulation (see _k2_kernel)
    t = pl.program_id(0)

    @pl.when(jnp.logical_or(t == 0, u_blk_ref[t] != u_blk_ref[t - 1]))
    def _():
        pu_lo[:] = jnp.zeros_like(pu_lo)
        pu_hi[:] = jnp.zeros_like(pu_hi)

    @pl.when(jnp.logical_or(t == 0, v_blk_ref[t] != v_blk_ref[t - 1]))
    def _():
        pv_lo[:] = jnp.zeros_like(pv_lo)
        pv_hi[:] = jnp.zeros_like(pv_hi)

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        pr = _prec(u0.dtype)
        ohT_u = _ohT(io2, ul, c, chunk, u0.dtype)
        ohT_v = _ohT(io2, vl, c, chunk, u0.dtype)
        g_u = _selT(ohT_u, u0, u1, pr)
        g_v = _selT(ohT_v, v0, v1, pr)
        dt = e_out.dtype
        gate = (g_u[:, :d] + g_v[:, :d]).astype(dt) + b3e[sl, :]
        gate = gate * scale + bias            # eval BatchNorm affine
        gate = jax.nn.relu(gate)
        eo = gate + e_in[sl, :]
        e_out[sl, :] = eo
        # sigmoid in f32: Mosaic's bf16 logistic lowering miscompiles
        # (f32 constant broadcast into a bf16 vector); padded/overflow edges
        # need no masking — their one-hot columns are all-zero (sentinel)
        sigma = jax.nn.sigmoid(eo.astype(jnp.float32)).astype(dt)

        pay_v = jnp.concatenate(
            [sigma * g_u[:, d:].astype(dt), sigma], axis=1)   # into dst
        pay_u = jnp.concatenate(
            [sigma * g_v[:, d:].astype(dt), sigma], axis=1)   # into src

        _scatT(ohT_u, pay_u, pu_lo, pu_hi)
        _scatT(ohT_v, pay_v, pv_lo, pv_hi)
        return 0

    # static unroll: lets Mosaic interleave one-hot builds (VPU) with the
    # select/scatter dots (MXU) across chunks; fori_loop serialises them
    for c in range(tile_e // chunk):
        body(c, 0)


def k3_fused_eval_layer(plan: WindowedPlan, proj_u, proj_v, b3e, e_in,
                        bn_scale, bn_bias):
    """Fused eval edge stage.  Returns (e_out [Ep, d], pu_lo, pu_hi, pv_lo,
    pv_hi [NB*W, 2d] per-block partials, see k2_aggregate); overflow slots
    carry gate = affine(b3e) + residual only and contribute nothing to the
    partials (caller patches e_out and adds overflow payloads)."""
    Ep, d = b3e.shape
    T, ET, W, C = plan.n_tiles, plan.tile_e, plan.window, plan.chunk
    dtype = b3e.dtype
    rows = plan.rows_p
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
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((8, d), lambda t, ub, vb: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
        ],
    )
    NB = plan.n_blocks
    out_shape = (
        [jax.ShapeDtypeStruct((Ep, d), dtype)]
        + [jax.ShapeDtypeStruct((NB * W, 2 * d), jnp.float32)] * 4
    )
    kern = functools.partial(_k3_kernel, tile_e=ET, window=W, d=d, chunk=C)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(),
    )(plan.u_blk, plan.v_blk, proj_u, proj_u, proj_v, proj_v,
      plan.u_local, plan.v_local, b3e, e_in, affine)


# ---------------------------------------------- K7: training gate statistics
def _k7_kernel(u_blk_ref, v_blk_ref, u0, u1, v0, v1, ul, vl, b3e,
               stats_out, xu_lo, xu_hi, xv_lo, xv_hi,
               *, tile_e, window, d, chunk):
    """Training BatchNorm is two-pass: this is the FIRST pass, fused.  Per
    chunk: windowed gate-half selects -> gate_raw x -> per-tile [sum(x),
    sum(x^2)] partials (the batch statistics) AND per-block window partials of
    [sum(x) | count] keyed by BOTH endpoints (the backward's batch-stat
    correction term is linear in x, so its node-space scatter is
    ``c1*deg + c2*xsum`` — see message._train_layer_bwd).  gate_raw never
    touches HBM: the [Ep, 3d] K1 payload this pass replaces was the largest
    allocation of the 1M-node training step (3 GB padded, twice)."""
    io2 = jax.lax.broadcasted_iota(jnp.int32, (2 * window, chunk), 0)
    t = pl.program_id(0)

    @pl.when(jnp.logical_or(t == 0, u_blk_ref[t] != u_blk_ref[t - 1]))
    def _():
        xu_lo[:] = jnp.zeros_like(xu_lo)
        xu_hi[:] = jnp.zeros_like(xu_hi)

    @pl.when(jnp.logical_or(t == 0, v_blk_ref[t] != v_blk_ref[t - 1]))
    def _():
        xv_lo[:] = jnp.zeros_like(xv_lo)
        xv_hi[:] = jnp.zeros_like(xv_hi)

    acc1 = jnp.zeros((1, d), jnp.float32)
    acc2 = jnp.zeros((1, d), jnp.float32)
    dt = b3e.dtype
    ones = jnp.ones((chunk, d), dt)
    for c in range(tile_e // chunk):
        sl = pl.ds(c * chunk, chunk)
        pr = _prec(u0.dtype)
        ohT_u = _ohT(io2, ul, c, chunk, u0.dtype)
        ohT_v = _ohT(io2, vl, c, chunk, u0.dtype)
        xu = _selT(ohT_u, u0, u1, pr)
        xv = _selT(ohT_v, v0, v1, pr)
        x = (xu[:, :d] + xv[:, :d]).astype(dt) + b3e[sl, :]
        xf = x.astype(jnp.float32)
        # padded AND overflow slots carry the sentinel -> excluded here and
        # inert in the scatters; the caller adds overflow edges' contributions
        mrow = (ul[c, :] != 2 * window).astype(jnp.float32)[None, :]
        acc1 = acc1 + jnp.dot(mrow, xf, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        acc2 = acc2 + jnp.dot(mrow, xf * xf,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        pay = jnp.concatenate([x, ones], axis=1)
        _scatT(ohT_u, pay, xu_lo, xu_hi)
        _scatT(ohT_v, pay, xv_lo, xv_hi)

    stats_out[:] = jnp.concatenate(
        [acc1, acc2, jnp.zeros((6, d), jnp.float32)], axis=0)


def k7_gate_stats(plan: WindowedPlan, proj_u, proj_v, b3e):
    """First (statistics) pass of the training edge stage.  Returns
    (stats [T*8, d] f32 — rows 0/1 of each tile hold sum(x)/sum(x^2) over
    kernel-covered valid edges, xu_lo, xu_hi, xv_lo, xv_hi [NB*W, 2d] f32 —
    per-block partials of [sum(x) | count] keyed by u / v, see k2_aggregate
    for the low/high split)."""
    Ep, d = b3e.shape
    T, ET, W, C = plan.n_tiles, plan.tile_e, plan.window, plan.chunk
    rows = plan.rows_p

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            # full-width (W, 2d) windows: a (W, d) block of a [Np, 2d] array
            # violates the 128-lane block rule; the gate halves are sliced
            # from the select results instead
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t] + 1, 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t] + 1, 0)),
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
        ],
    )
    NB = plan.n_blocks
    out_shape = (
        [jax.ShapeDtypeStruct((T * 8, d), jnp.float32)]
        + [jax.ShapeDtypeStruct((NB * W, 2 * d), jnp.float32)] * 4
    )
    kern = functools.partial(_k7_kernel, tile_e=ET, window=W, d=d, chunk=C)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(),
    )(plan.u_blk, plan.v_blk, proj_u, proj_u, proj_v, proj_v,
      plan.u_local, plan.v_local, b3e)


# ------------------------------------- K8: fused training layer backward
def _k8_kernel(u_blk_ref, v_blk_ref, du0, du1, dv0, dv1, u0, u1, v0, v1,
               ul, vl, b3e, e_in, d_e_out, affine,
               xdy_out, dein_out, pu_lo, pu_hi, pv_lo, pv_hi,
               *, tile_e, window, d, chunk):
    """Adjoint of the whole training edge stage in one pass, with NO [Ep, 3d]
    HBM arrays: the forward gate/messages are RE-SELECTED from the node
    windows (cheaper than streaming a materialised [Ep, 3d] payload — the
    kernels are HBM-bound), the elementwise forward is recomputed, the full
    adjoint chain runs in registers, and the d_proj payloads
    [d_gate_local | d_msg] are scattered straight into per-block window
    partials (one-hots built once per chunk serve 4 selects + 2 scatters).
    Outputs additionally [x | d_y] per edge (``xdy`` — one unpadded [Ep, 2d]
    row instead of two lane-padded [Ep, d] arrays): the caller closes the
    batch-statistics chain from it (d_gamma/d_beta/d_b3e and the c1+c2*x
    node-space correction via K7's deg/xsum partials)."""
    io2 = jax.lax.broadcasted_iota(jnp.int32, (2 * window, chunk), 0)
    scale = affine[0:1, :]
    bias = affine[1:2, :]
    scale_f = scale.astype(jnp.float32)
    t = pl.program_id(0)

    @pl.when(jnp.logical_or(t == 0, u_blk_ref[t] != u_blk_ref[t - 1]))
    def _():
        pu_lo[:] = jnp.zeros_like(pu_lo)
        pu_hi[:] = jnp.zeros_like(pu_hi)

    @pl.when(jnp.logical_or(t == 0, v_blk_ref[t] != v_blk_ref[t - 1]))
    def _():
        pv_lo[:] = jnp.zeros_like(pv_lo)
        pv_hi[:] = jnp.zeros_like(pv_hi)

    for c in range(tile_e // chunk):
        sl = pl.ds(c * chunk, chunk)
        dt = xdy_out.dtype
        pr = _prec(u0.dtype)
        ohT_u = _ohT(io2, ul, c, chunk, u0.dtype)
        ohT_v = _ohT(io2, vl, c, chunk, u0.dtype)
        gu = _selT(ohT_u, u0, u1, pr)
        gv = _selT(ohT_v, v0, v1, pr)
        du = _selT(ohT_u, du0, du1, pr)
        dv = _selT(ohT_v, dv0, dv1, pr)
        # recomputed forward, bit-matching the K3/K7 dtype discipline
        x = (gu[:, :d] + gv[:, :d]).astype(dt) + b3e[sl, :]
        gaff = x * scale + bias
        # compare in f32: Mosaic has no bf16 vector cmpf (conversion is exact)
        relu_m = (gaff.astype(jnp.float32) > 0).astype(jnp.float32)
        eo = jax.nn.relu(gaff) + e_in[sl, :]
        # f32 sigmoid: Mosaic's bf16 logistic lowering miscompiles
        sigma = jax.nn.sigmoid(eo.astype(jnp.float32))
        a2u = gu[:, d:].astype(dt).astype(jnp.float32)
        a3v = gv[:, d:].astype(dt).astype(jnp.float32)
        d_sigma = (dv[:, :d] * a2u + dv[:, d:]
                   + du[:, :d] * a3v + du[:, d:])
        d_eo = (d_e_out[sl, :].astype(jnp.float32)
                + d_sigma * sigma * (1.0 - sigma))
        d_y = d_eo * relu_m
        xdy_out[sl, :] = jnp.concatenate([x, d_y.astype(dt)], axis=1)
        dein_out[sl, :] = d_eo.astype(dt)
        pay_u = jnp.concatenate(
            [d_y * scale_f, sigma * dv[:, :d]], axis=1).astype(dt)
        pay_v = jnp.concatenate(
            [d_y * scale_f, sigma * du[:, :d]], axis=1).astype(dt)
        _scatT(ohT_u, pay_u, pu_lo, pu_hi)
        _scatT(ohT_v, pay_v, pv_lo, pv_hi)


def k8_train_layer_bwd(plan: WindowedPlan, d_sum_u, d_sum_v, proj_u, proj_v,
                       b3e, e_in, d_e_out, scale_eff, bias_eff):
    """Fused training-layer backward.  ``d_sum_u``/``d_sum_v`` are the node
    cotangent arrays [Np, 2d] (caller casts to the compute dtype); returns
    (xdy [Ep, 2d] = [gate_raw | d_gate_affine], d_e_in [Ep, d],
    pu_lo, pu_hi, pv_lo, pv_hi [NB*W, 2d] d_proj window partials).  Overflow
    edges select zero everywhere (sentinel one-hots) and their xdy/partial
    contributions are patched by the caller."""
    Ep, d = b3e.shape
    T, ET, W, C = plan.n_tiles, plan.tile_e, plan.window, plan.chunk
    dtype = b3e.dtype
    rows = plan.rows_p
    affine = jnp.concatenate(
        [jnp.stack([scale_eff, bias_eff]),
         jnp.zeros((6, d), jnp.float32)]).astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t] + 1, 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t] + 1, 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t] + 1, 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t] + 1, 0)),
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((8, d), lambda t, ub, vb: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ET, 2 * d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, 2 * d), lambda t, ub, vb: (vb[t], 0)),
        ],
    )
    NB = plan.n_blocks
    out_shape = [
        jax.ShapeDtypeStruct((Ep, 2 * d), dtype),
        jax.ShapeDtypeStruct((Ep, d), dtype),
    ] + [jax.ShapeDtypeStruct((NB * W, 2 * d), jnp.float32)] * 4
    kern = functools.partial(_k8_kernel, tile_e=ET, window=W, d=d, chunk=C)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(),
    )(plan.u_blk, plan.v_blk, d_sum_u, d_sum_u, d_sum_v, d_sum_v,
      proj_u, proj_u, proj_v, proj_v,
      plan.u_local, plan.v_local, b3e, e_in, d_e_out, affine)


# ------------------------------------------- K6: score-predictor first layer
def _k6_kernel(u_blk_ref, v_blk_ref, u0, u1, v0, v1, ul, vl, be,
               z_out, *, tile_e, window, d, chunk):
    """Fused ``relu(pu[u] + pv[v] + be)`` — the score predictor's endpoint
    gathers AND first-layer matmul in one windowed pass (``pu = h @ W1u`` etc.
    are computed in NODE space by the caller, so the [Ep, 3d] concat and the
    edge-space [Ep,3d]x[3d,H] matmul never materialise; reference
    score_predictor.py:13-23).  Overflow slots carry relu(be) (caller
    patches)."""
    io2 = jax.lax.broadcasted_iota(jnp.int32, (2 * window, chunk), 0)
    for c in range(tile_e // chunk):
        sl = pl.ds(c * chunk, chunk)
        pr = _prec(u0.dtype)
        gu = _selT(_ohT(io2, ul, c, chunk, u0.dtype), u0, u1, pr)
        gv = _selT(_ohT(io2, vl, c, chunk, u0.dtype), v0, v1, pr)
        z_out[sl, :] = jax.nn.relu(
            (gu + gv).astype(z_out.dtype) + be[sl, :])


def k6_score_gate(plan: WindowedPlan, pu, pv, be):
    """pu/pv: [Np, H] node pre-projections; be: [Ep, H] slot order.
    Returns z [Ep, H] = relu(pu[u] + pv[v] + be)."""
    Ep, H = be.shape
    T, ET, W, C = plan.n_tiles, plan.tile_e, plan.window, plan.chunk
    rows = plan.rows_p

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((W, H), lambda t, ub, vb: (ub[t], 0)),
            pl.BlockSpec((W, H), lambda t, ub, vb: (ub[t] + 1, 0)),
            pl.BlockSpec((W, H), lambda t, ub, vb: (vb[t], 0)),
            pl.BlockSpec((W, H), lambda t, ub, vb: (vb[t] + 1, 0)),
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ET, H), lambda t, ub, vb: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ET, H), lambda t, ub, vb: (t, 0)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((Ep, H), be.dtype)]
    kern = functools.partial(_k6_kernel, tile_e=ET, window=W, d=H, chunk=C)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(),
    )(plan.u_blk, plan.v_blk, pu, pu, pv, pv,
      plan.u_local, plan.v_local, be)[0]


# ----------------------------------------------------------------- utilities
_INTERPRET = False


def set_interpret(flag: bool) -> None:
    """Interpreter mode for CPU testing of the kernels."""
    global _INTERPRET
    _INTERPRET = flag


def _interpret() -> bool:
    return _INTERPRET
