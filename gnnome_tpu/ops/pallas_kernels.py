"""Pallas/Mosaic TPU kernels for the message-passing hot path.

Kernels over the windowed plan (ops/windowed.py):

K1 ``gather_gate``   per edge tile: DMA both endpoints' node-row windows into
                     VMEM (Pallas block prefetch with scalar-driven index maps
                     — consecutive tiles reuse unchanged windows), select rows
                     with one-hot matmuls ON THE MXU, and emit the fused gate
                     input ``B1h[u] + B2h[v] + B3e`` plus the gathered message
                     values A2h[u], A3h[v].

K2 ``aggregate``     per edge tile: one-hot matmuls accumulate
                     ``[sigma*m | sigma]`` into per-block window partials for
                     BOTH aggregation directions; a shifted-add combine turns
                     the partial arrays into node space (ops/message.py).

K3 ``fused eval``    the whole eval-mode edge stage in one pass: selects ->
                     gate -> BN affine -> relu -> residual -> sigmoid -> both
                     aggregation partials.

K6/K7/K8/K9          score-gate fwd, training gate statistics, fused training
                     backward, packed dual scatter — see each function.

Every endpoint window is a run of ``k`` consecutive ``W``-row blocks
(coverage = k*W rows; per-side (W, k) chosen by the plan from the graph's
measured spans — ops/windowed.py).  Selects sum k per-block contractions;
scatters split one [k*W, D] dot across k per-block partial output arrays,
where array i's block b holds contributions to node rows (b+i)*W + j (the
combine in ops/message.py is k shifted adds).  Select/scatter MACs are
proportional to the coverage, so more, smaller blocks buy the same span
guarantee at fewer MACs.

One-hots are built **transposed** ``[k*W, chunk]`` (window rows x edge
lanes): the per-edge local indices stream in lane-major rows (see
windowed.py — a column layout pays a 128x lane-padding tax in HBM, the
dominant kernel cost before this design), the build is a broadcast compare
against iota over sublanes, selects contract the one-hot's dim 0
(``dot_general`` with a transposed contraction — native on the MXU), and
scatters are plain dots that accumulate a whole chunk in ONE MXU op.  Padded
and overflow edges carry the sentinel index k*W, so their one-hot columns are
all-zero and they are inert in every select and scatter — no edge mask enters
the kernels; overflow slots are patched by a small XLA path in the caller
(ops/message.py).

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

# Mosaic scoped-VMEM budget: the default 16 MB caps K8's stack at edge tiles
# of 2048; larger tiles (fewer window DMAs + fewer per-tile partials for the
# same band coverage) need more.  v5e has 128 MB VMEM; 64 MB leaves room for
# XLA's surrounding fusions.
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _prec(dtype):
    # HIGHEST makes f32 one-hot selects exact (bf16x3 passes); bf16 operands
    # must use default precision (Mosaic rejects fp32 contract on bf16 lhs)
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _ohT(io2, idx_ref, c, chunk, dtype):
    """Transposed one-hot [k*W, chunk] for in-kernel chunk ``c``: column e is
    one-hot at the local window row of edge ``c*chunk + e`` (all-zero for the
    sentinel k*W: padded / overflow edges)."""
    row = idx_ref[c, :][None, :]            # [1, chunk] lane-major
    return (io2 == row).astype(dtype)


def _ohT2(io2, idx_e_ref, idx_o_ref, c, dtype):
    """Parity-MERGED transposed one-hot [k*W, chunk]: lanes 0:hc are the
    chunk's even edges, lanes hc: the odd edges.  One double-width one-hot
    serves both parities' selects AND scatters in a single MXU dot each —
    same MACs as two half-width dots, half the dot count (and Mosaic pipeline
    slots), measured the difference between ~20% and ~40%+ MXU occupancy."""
    row = jnp.concatenate([idx_e_ref[c, :][None, :],
                           idx_o_ref[c, :][None, :]], axis=1)
    return (io2 == row).astype(dtype)


def _stack_p(a, d):
    """Packed [hc, 2d] -> row-stacked [2hc, d] (even rows first).

    NOT the obvious ``concat([a[:, :d], a[:, d:]], 0)``: Mosaic's hardware
    backend crashes (tpu_compile_helper exit 1, ANY dtype) lowering a
    sublane-concat whose operand is an offset lane slice — minimal repro and
    the workaround ladder live in scripts/mosaic_f32_repro*.py.  ``pltpu.
    roll`` normalizes the odd half's layout first; roll itself only lowers
    for 32-bit lanes, so bf16 round-trips (exactly) through f32."""
    if _interpret():
        return jnp.concatenate([a[:, :d], a[:, d:]], axis=0)
    x = a if a.dtype == jnp.float32 else a.astype(jnp.float32)
    hi = pltpu.roll(x, d, 1)[:, :d]
    return jnp.concatenate([x[:, :d], hi], axis=0).astype(a.dtype)


def _unstack_p(a, hc):
    """Row-stacked [2hc, d] -> packed [hc, 2d]."""
    return jnp.concatenate([a[:hc], a[hc:]], axis=1)


def _selT(ohT, ws, pr):
    """Row select via transposed contraction over the window's k block refs:
    [chunk, D] = sum_i ohT[i*W:(i+1)*W]^T @ ws[i]."""
    dn = (((0,), (0,)), ((), ()))
    W = ws[0].shape[0]
    acc = None
    for i, w in enumerate(ws):
        p = jax.lax.dot_general(ohT[i * W:(i + 1) * W], w[:],
                                dimension_numbers=dn,
                                preferred_element_type=jnp.float32,
                                precision=pr)
        acc = p if acc is None else acc + p
    return acc


def _scatT(ohT, pay, outs):
    """Accumulate a whole chunk into the window's per-block partials in one
    dot.  The [k*W, D] result is split across k contiguous output refs all
    indexed at the run's FIRST block: ref i's block b holds contributions to
    node rows (b+i)*W + j, so the host-side combine is k shifted adds over
    contiguous arrays instead of strided-slice passes over an interleaved
    layout (measured ~6.6 ms -> ~2 ms per combine on the bench graph)."""
    acc = jnp.dot(ohT, pay, preferred_element_type=jnp.float32,
                  precision=_prec(pay.dtype))
    W = outs[0].shape[0]
    for i, o in enumerate(outs):
        # partials ride the payload dtype: in bf16 mode each per-chunk
        # `o += acc` rounds, so effective accumulation depth is the per-node
        # in-run DEGREE (not just the 1-3-tile block depth) — high-degree
        # nodes lose more precision than low-degree ones.  Covered by the
        # loose bf16 eval tolerances; switch partials back to f32 if those
        # ever tighten (advisor note, round 4).
        o[:] += acc[i * W:(i + 1) * W].astype(o.dtype)


def _win_specs(W, D, side, k):
    """k window-block specs following the u (side=0) / v (side=1) run."""
    if side == 0:
        return [pl.BlockSpec((W, D), (lambda t, ub, vb, i=i: (ub[t] + i, 0)))
                for i in range(k)]
    return [pl.BlockSpec((W, D), (lambda t, ub, vb, i=i: (vb[t] + i, 0)))
            for i in range(k)]


def _first_blk_specs(W, D, side, k):
    """k scatter-partial specs, all indexed at the run's first block."""
    if side == 0:
        return [pl.BlockSpec((W, D), lambda t, ub, vb: (ub[t], 0))
                for _ in range(k)]
    return [pl.BlockSpec((W, D), lambda t, ub, vb: (vb[t], 0))
            for _ in range(k)]


def _zero_on_run_change(blk_ref, outs):
    """Zero scatter partials when the tile enters a new block run (monotone
    ``blk`` => the out blocks stay in VMEM across consecutive tiles)."""
    t = pl.program_id(0)

    @pl.when(jnp.logical_or(t == 0, blk_ref[t] != blk_ref[t - 1]))
    def _():
        for o in outs:
            o[:] = jnp.zeros_like(o)


# ---------------------------------------------------------------- K1: gather
def _k1_kernel(u_blk_ref, v_blk_ref, *refs, tile_e, wu, wv, d, chunk,
               ku, kv):
    uws = refs[:ku]
    vws = refs[ku:ku + kv]
    ul, vl, b3e, g3_out = refs[ku + kv:]
    io2u = jax.lax.broadcasted_iota(jnp.int32, (ku * wu, chunk), 0)
    io2v = jax.lax.broadcasted_iota(jnp.int32, (kv * wv, chunk), 0)
    dt = g3_out.dtype

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        pr = _prec(uws[0].dtype)
        gu = _selT(_ohT(io2u, ul, c, chunk, uws[0].dtype), uws, pr)
        gv = _selT(_ohT(io2v, vl, c, chunk, uws[0].dtype), vws, pr)
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
    T, ET, C = plan.n_tiles, plan.tile_e, plan.chunk
    Wu, Wv = plan.window, plan.win_v
    ku, kv = plan.k_u, plan.k_v
    dtype = b3e.dtype
    rows = plan.rows_p

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=(
            _win_specs(Wu, 2 * d, 0, ku) + _win_specs(Wv, 2 * d, 1, kv)
            + [pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, C), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((ET, d), lambda t, ub, vb: (t, 0))]),
        out_specs=[
            pl.BlockSpec((ET, 3 * d), lambda t, ub, vb: (t, 0)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((Ep, 3 * d), dtype)]
    kern = functools.partial(_k1_kernel, tile_e=ET, wu=Wu, wv=Wv, d=d,
                             chunk=C, ku=ku, kv=kv)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(), compiler_params=_CPARAMS,
    )(plan.u_blk, plan.v_blk, *([proj_u] * ku), *([proj_v] * kv),
      plan.u_local, plan.v_local, b3e)[0]


# ------------------------------------------------------------- K2: aggregate
def _k2_kernel(u_blk_ref, v_blk_ref, *refs, tile_e, wu, wv, chunk, ku, kv):
    ul, vl, pay_u, pay_v = refs[:4]
    pu = refs[4:4 + ku]
    pv = refs[4 + ku:]
    io2u = jax.lax.broadcasted_iota(jnp.int32, (ku * wu, chunk), 0)
    io2v = jax.lax.broadcasted_iota(jnp.int32, (kv * wv, chunk), 0)
    _zero_on_run_change(u_blk_ref, pu)
    _zero_on_run_change(v_blk_ref, pv)

    def body(c, _):
        sl = pl.ds(c * chunk, chunk)
        dt = pay_u.dtype
        _scatT(_ohT(io2u, ul, c, chunk, dt), pay_u[sl, :], pu)
        _scatT(_ohT(io2v, vl, c, chunk, dt), pay_v[sl, :], pv)
        return 0

    # static unroll: lets Mosaic interleave one-hot builds (VPU) with the
    # select/scatter dots (MXU) across chunks; fori_loop serialises them
    for c in range(tile_e // chunk):
        body(c, 0)


def k2_aggregate(plan: WindowedPlan, pay_u, pay_v):
    """pay_u/pay_v: [Ep, Dp] per-edge payloads ([sigma*m | sigma]).

    Returns (k_u + k_v) per-block partial-sum arrays, first keyed by u then
    by v: row ``b*W + j`` of the u-side array i belongs to node
    ``(b+i)*W + j`` (combine with ``message.combine_block_partials`` — one
    fused shifted add).
    """
    Ep, Dp = pay_u.shape
    T, ET, C = plan.n_tiles, plan.tile_e, plan.chunk
    Wu, Wv = plan.window, plan.win_v
    ku, kv = plan.k_u, plan.k_v
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
        out_specs=(_first_blk_specs(Wu, Dp, 0, ku)
                   + _first_blk_specs(Wv, Dp, 1, kv)),
    )
    # partials ride the payload dtype (block accumulation depth is 1-3
    # tiles; the combined sums are cast to the compute dtype by every caller
    # anyway) — halves the partial write-back + combine bytes in bf16 mode,
    # and is a no-op in f32 parity mode
    out_shape = (
        [jax.ShapeDtypeStruct((plan.n_blocks * Wu, Dp), pay_u.dtype)] * ku
        + [jax.ShapeDtypeStruct((plan.n_blocks_v * Wv, Dp),
                                pay_u.dtype)] * kv)
    kern = functools.partial(_k2_kernel, tile_e=ET, wu=Wu, wv=Wv, chunk=C,
                             ku=ku, kv=kv)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(), compiler_params=_CPARAMS,
    )(plan.u_blk, plan.v_blk, plan.u_local, plan.v_local, pay_u, pay_v)
    return out[:ku], out[ku:]


# ----------------------------------------------------- K3: fused edge stage
def _k3_kernel(u_blk_ref, v_blk_ref, *refs, tile_e, wu, wv, d, chunk,
               ku, kv):
    """Whole SymGatedGCN edge stage (affine-BN form — eval stats, or training
    stats folded by the caller) in one pass: windowed endpoint selects ->
    gate -> affine -> relu -> residual -> sigmoid -> both aggregation
    partials.  No HBM round-trips between steps.  Edge arrays are PACKED
    [Ep/2, 2d] (edge 2r in lanes :d of row r, edge 2r+1 in lanes d:) — no
    128-lane padding in HBM; per chunk, one one-hot per endpoint per parity
    serves both the selects and the scatters against the same node windows."""
    uws = refs[:ku]
    vws = refs[ku:ku + kv]
    ule, ulo, vle, vlo, b3e, e_in, affine, e_out = refs[ku + kv:ku + kv + 8]
    pu = refs[ku + kv + 8:ku + kv + 8 + ku]
    pv = refs[ku + kv + 8 + ku:]
    io2u = jax.lax.broadcasted_iota(jnp.int32, (ku * wu, chunk), 0)
    io2v = jax.lax.broadcasted_iota(jnp.int32, (kv * wv, chunk), 0)
    scale2 = affine[0:1, :]                   # [1, 2d] = [scale | scale]
    bias2 = affine[1:2, :]
    _zero_on_run_change(u_blk_ref, pu)
    _zero_on_run_change(v_blk_ref, pv)

    hc = chunk // 2
    for c in range(tile_e // chunk):
        psl = pl.ds(c * hc, hc)
        pr = _prec(uws[0].dtype)
        # parity-merged one-hots: lanes 0:hc even edges, hc: odd — one
        # double-width dot per endpoint replaces two half-width ones
        ohT_u = _ohT2(io2u, ule, ulo, c, uws[0].dtype)
        ohT_v = _ohT2(io2v, vle, vlo, c, uws[0].dtype)
        gu = _selT(ohT_u, uws, pr)            # [2hc, 2d] rows: even | odd
        gv = _selT(ohT_v, vws, pr)
        dt = e_out.dtype
        gate = _unstack_p((gu[:, :d] + gv[:, :d]).astype(dt), hc) + b3e[psl, :]
        gate = gate * scale2 + bias2
        gate = jax.nn.relu(gate)
        eo = gate + e_in[psl, :]
        e_out[psl, :] = eo
        # sigmoid in f32: Mosaic's bf16 logistic lowering miscompiles
        # (f32 constant broadcast into a bf16 vector); padded/overflow edges
        # need no masking — their one-hot columns are all-zero (sentinel)
        sigma = jax.nn.sigmoid(eo.astype(jnp.float32)).astype(dt)
        sig2 = _stack_p(sigma, d)             # [2hc, d] rows: even | odd
        _scatT(ohT_u, jnp.concatenate(
            [sig2 * gv[:, d:].astype(dt), sig2], 1), pu)         # into src
        _scatT(ohT_v, jnp.concatenate(
            [sig2 * gu[:, d:].astype(dt), sig2], 1), pv)         # into dst


def k3_fused_edge_stage(plan: WindowedPlan, proj_u, proj_v, b3e_p, e_in_p,
                        bn_scale, bn_bias):
    """Fused edge stage over PACKED edge arrays ([Ep/2, 2d], see _k3_kernel).
    Returns (e_out_p [Ep/2, 2d], pu_parts, pv_parts — per-block partial
    tuples, see k2_aggregate); overflow slots carry
    gate = affine(b3e) + residual only and contribute nothing to the partials
    (caller patches e_out and adds overflow payloads)."""
    Eh, d2 = b3e_p.shape
    d = d2 // 2
    T, ET, C = plan.n_tiles, plan.tile_e, plan.chunk
    Wu, Wv = plan.window, plan.win_v
    ku, kv = plan.k_u, plan.k_v
    dtype = b3e_p.dtype
    rows = plan.rows_p
    # [8, 2d]: min sublane tile is 8; rows 0/1 hold [scale|scale]/[bias|bias]
    affine = jnp.concatenate(
        [jnp.stack([jnp.concatenate([bn_scale, bn_scale]),
                    jnp.concatenate([bn_bias, bn_bias])]),
         jnp.zeros((6, 2 * d), bn_scale.dtype)]).astype(dtype)

    ETh, Ch = ET // 2, C // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=(
            _win_specs(Wu, 2 * d, 0, ku) + _win_specs(Wv, 2 * d, 1, kv)
            + [pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((ETh, 2 * d), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((ETh, 2 * d), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((8, 2 * d), lambda t, ub, vb: (0, 0))]),
        out_specs=(
            [pl.BlockSpec((ETh, 2 * d), lambda t, ub, vb: (t, 0))]
            + _first_blk_specs(Wu, 2 * d, 0, ku)
            + _first_blk_specs(Wv, 2 * d, 1, kv)),
    )
    # aggregation partials ride the edge-stream dtype (see k2_aggregate:
    # 1-3-tile accumulation depth, sums cast to the compute dtype by the
    # caller) — halves partial write-back + combine bytes in bf16 mode
    out_shape = (
        [jax.ShapeDtypeStruct((Eh, 2 * d), dtype)]
        + [jax.ShapeDtypeStruct((plan.n_blocks * Wu, 2 * d), dtype)] * ku
        + [jax.ShapeDtypeStruct((plan.n_blocks_v * Wv, 2 * d),
                                dtype)] * kv
    )
    kern = functools.partial(_k3_kernel, tile_e=ET, wu=Wu, wv=Wv, d=d,
                             chunk=C, ku=ku, kv=kv)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(), compiler_params=_CPARAMS,
    )(plan.u_blk, plan.v_blk, *([proj_u] * ku), *([proj_v] * kv),
      plan.u_local_e, plan.u_local_o, plan.v_local_e, plan.v_local_o,
      b3e_p, e_in_p, affine)
    return out[0], out[1:1 + ku], out[1 + ku:]


# ---------------------------------------------- K7: training gate statistics
def _k7_kernel(u_blk_ref, v_blk_ref, *refs, tile_e, wu, wv, d, chunk,
               ku, kv):
    """Training BatchNorm is two-pass: this is the FIRST pass, fused.  Per
    chunk: windowed gate-half selects -> gate_raw x -> per-tile [sum(x),
    sum(x^2)] partials (the batch statistics).  gate_raw never touches HBM:
    the [Ep, 3d] K1 payload this pass replaces was the largest allocation of
    the 1M-node training step (3 GB padded, twice).  The backward's x-sum
    node partials come from K8 (which re-selects x anyway).  Edge arrays are
    PACKED [Ep/2, 2d] (see _k3_kernel)."""
    uws = refs[:ku]
    vws = refs[ku:ku + kv]
    ule, ulo, vle, vlo, b3e, stats_out = refs[ku + kv:]
    io2u = jax.lax.broadcasted_iota(jnp.int32, (ku * wu, chunk), 0)
    io2v = jax.lax.broadcasted_iota(jnp.int32, (kv * wv, chunk), 0)
    acc = jnp.zeros((1, 2 * d), jnp.float32)    # [s1 | s2], both parities
    dt = b3e.dtype
    hc = chunk // 2
    hp = jax.lax.Precision.HIGHEST
    for c in range(tile_e // chunk):
        psl = pl.ds(c * hc, hc)
        pr = _prec(uws[0].dtype)
        # parity-merged one-hots (see _ohT2); d-wide gate windows
        # (pre-sliced by the caller): HALF the select MACs of the [W, 2d]
        # message windows
        ohT_u = _ohT2(io2u, ule, ulo, c, uws[0].dtype)
        ohT_v = _ohT2(io2v, vle, vlo, c, uws[0].dtype)
        xu = _selT(ohT_u, uws, pr)            # [2hc, d] rows: even | odd
        xv = _selT(ohT_v, vws, pr)
        b3e2 = _stack_p(b3e[psl, :], d)
        x = (xu + xv).astype(dt) + b3e2
        xf = x.astype(jnp.float32)
        # padded AND overflow slots carry the sentinel -> excluded here and
        # inert in the scatters; the caller adds overflow edges' contributions
        m = jnp.concatenate([ule[c, :][None, :], ulo[c, :][None, :]], axis=1)
        m = (m != ku * wu).astype(jnp.float32)
        acc = acc + jnp.dot(
            m, jnp.concatenate([xf, xf * xf], axis=1),
            preferred_element_type=jnp.float32, precision=hp)

    stats_out[:] = jnp.concatenate(
        [acc, jnp.zeros((7, 2 * d), jnp.float32)], axis=0)


def k7_gate_stats(plan: WindowedPlan, proj_u, proj_v, b3e_p):
    """First (statistics) pass of the training edge stage (packed edge
    layout).  Returns stats [T*8, 2d] f32 — per tile, row 0 holds
    [sum(x) | sum(x^2)].  The backward's x-sum node partials come from K8."""
    Eh, d2 = b3e_p.shape
    d = d2 // 2
    T, ET, C = plan.n_tiles, plan.tile_e, plan.chunk
    Wu, Wv = plan.window, plan.win_v
    ku, kv = plan.k_u, plan.k_v
    rows = plan.rows_p
    ETh, Ch = ET // 2, C // 2
    # the stats pass only needs the gate halves: pre-sliced [Np, d] windows
    # are legal blocks (minor dim == array dim) and HALVE the select MACs
    pu_g = proj_u[:, :d]
    pv_g = proj_v[:, :d]

    out_specs = [pl.BlockSpec((8, 2 * d), lambda t, ub, vb: (t, 0))]
    out_shape = [jax.ShapeDtypeStruct((T * 8, 2 * d), jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=(
            _win_specs(Wu, d, 0, ku) + _win_specs(Wv, d, 1, kv)
            + [pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((ETh, 2 * d), lambda t, ub, vb: (t, 0))]),
        out_specs=out_specs,
    )
    kern = functools.partial(_k7_kernel, tile_e=ET, wu=Wu, wv=Wv, d=d,
                             chunk=C, ku=ku, kv=kv)
    (stats,) = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(), compiler_params=_CPARAMS,
    )(plan.u_blk, plan.v_blk, *([pu_g] * ku), *([pv_g] * kv),
      plan.u_local_e, plan.u_local_o, plan.v_local_e, plan.v_local_o, b3e_p)
    return stats


# ------------------------------------- K8: fused training layer backward
def _k8_kernel(u_blk_ref, v_blk_ref, *refs, tile_e, wu, wv, d, chunk,
               ku, kv, with_xsum=False):
    """Adjoint of the whole training edge stage in one pass, with NO [Ep, 3d]
    HBM arrays: the forward gate/messages are RE-SELECTED from the node
    windows (cheaper than streaming a materialised [Ep, 3d] payload — the
    kernels are HBM-bound), the elementwise forward is recomputed, the full
    adjoint chain runs in registers, and the d_proj payloads
    [d_gate_local | d_msg] are scattered straight into per-block window
    partials (the parity one-hots serve 8 selects + 4 scatters).  Outputs
    additionally the recomputed gate_raw ``x`` and the residual cotangent
    ``d_eo`` (both packed, no padding): the caller derives d_e_in = d_eo,
    d_y = d_eo * relu_mask, and closes the batch-statistics chain
    (d_gamma/d_beta/d_b3e and the c1+c2*x node-space correction via K8's
    deg/xsum partials).  Edge arrays are PACKED [Ep/2, 2d] (_k3_kernel)."""
    dus = refs[:ku]
    dvs = refs[ku:ku + kv]
    uws = refs[ku + kv:2 * ku + kv]
    vws = refs[2 * ku + kv:2 * ku + 2 * kv]
    (ule, ulo, vle, vlo, b3e, e_in, d_e_out, affine,
     x_out, deo_out) = refs[2 * ku + 2 * kv:2 * ku + 2 * kv + 10]
    pu = refs[2 * ku + 2 * kv + 10:2 * ku + 2 * kv + 10 + ku]
    pv = refs[2 * ku + 2 * kv + 10 + ku:2 * ku + 2 * kv + 10 + ku + kv]
    stats_out = refs[-1]
    io2u = jax.lax.broadcasted_iota(jnp.int32, (ku * wu, chunk), 0)
    io2v = jax.lax.broadcasted_iota(jnp.int32, (kv * wv, chunk), 0)
    scale1 = affine[0:1, :d]                 # stacked rows: d-wide affine
    bias1 = affine[1:2, :d]
    scale1_f = scale1.astype(jnp.float32)
    _zero_on_run_change(u_blk_ref, pu)
    _zero_on_run_change(v_blk_ref, pv)
    # per-tile [sum(d_y) | sum(d_y * x)] — the batch-statistics chain's
    # global reductions ride the kernel (d_y and x are already in registers)
    # instead of a separate full-edge XLA reduction pass; sentinel
    # (padded/overflow) slots are excluded via the mask dot, exactly like K7
    acc = jnp.zeros((1, 2 * d), jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    hc = chunk // 2
    for c in range(tile_e // chunk):
        psl = pl.ds(c * hc, hc)
        dt = x_out.dtype
        pr = _prec(uws[0].dtype)
        # parity-merged one-hots: 4 selects + 2 scatters per chunk where the
        # per-parity form needed 8 + 4 (same MACs, half the dot count); all
        # per-edge tensors live ROW-STACKED [2hc, d] (even rows | odd rows).
        # (A round-4 experiment selected [proj | d_sum] from ONE concatenated
        # [W, 4d] window per side — measured ZERO step gain, and the node-
        # space concat costs 2 x [Np, 4d] extra HBM at chromosome scale,
        # which is what OOMed the 1M-node remat='full' run.  Separate window
        # refs reuse the arrays the step already holds.)
        ohT_u = _ohT2(io2u, ule, ulo, c, uws[0].dtype)
        ohT_v = _ohT2(io2v, vle, vlo, c, uws[0].dtype)
        gu = _selT(ohT_u, uws, pr)           # [2hc, 2d]
        gv = _selT(ohT_v, vws, pr)
        du = _selT(ohT_u, dus, pr)
        dv = _selT(ohT_v, dvs, pr)
        # recomputed forward, bit-matching the K3/K7 dtype discipline
        x = (gu[:, :d] + gv[:, :d]).astype(dt) + _stack_p(b3e[psl, :], d)
        gaff = x * scale1 + bias1
        # compare in f32: Mosaic has no bf16 vector cmpf (conversion is exact)
        relu_m = (gaff.astype(jnp.float32) > 0).astype(jnp.float32)
        eo = jax.nn.relu(gaff) + _stack_p(e_in[psl, :], d)
        # f32 sigmoid: Mosaic's bf16 logistic lowering miscompiles
        sigma = jax.nn.sigmoid(eo.astype(jnp.float32))
        a2u = gu[:, d:].astype(dt).astype(jnp.float32)
        a3v = gv[:, d:].astype(dt).astype(jnp.float32)
        dv_m, dv_s = dv[:, :d], dv[:, d:]
        du_m, du_s = du[:, :d], du[:, d:]
        d_sigma = dv_m * a2u + dv_s + du_m * a3v + du_s
        d_eo = (_stack_p(d_e_out[psl, :], d).astype(jnp.float32)
                + d_sigma * sigma * (1.0 - sigma))
        d_y = d_eo * relu_m
        mrow = jnp.concatenate([ule[c, :][None, :], ulo[c, :][None, :]],
                               axis=1)
        mrow = (mrow != ku * wu).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            mrow, jnp.concatenate([d_y, d_y * x.astype(jnp.float32)],
                                  axis=1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp)
        x_out[psl, :] = _unstack_p(x, hc)
        deo_out[psl, :] = _unstack_p(d_eo.astype(dt), hc)
        dys = d_y * scale1_f
        sdv = sigma * dv_m
        sdu = sigma * du_m
        if with_xsum:
            # node x-sums for the batch-statistics chain (``c2*xsum``) ride
            # the SAME one-hots and the SAME dots as the d_proj payloads —
            # a [2hc, 3d] payload instead of a second scatter pass
            _scatT(ohT_u, jnp.concatenate(
                [jnp.concatenate([dys, sdv], axis=1).astype(dt), x], axis=1),
                pu)
            _scatT(ohT_v, jnp.concatenate(
                [jnp.concatenate([dys, sdu], axis=1).astype(dt), x], axis=1),
                pv)
        else:
            _scatT(ohT_u, jnp.concatenate(
                [dys, sdv], axis=1).astype(dt), pu)
            _scatT(ohT_v, jnp.concatenate(
                [dys, sdu], axis=1).astype(dt), pv)

    stats_out[:] = jnp.concatenate(
        [acc, jnp.zeros((7, 2 * d), jnp.float32)], axis=0)


def k8_train_layer_bwd(plan: WindowedPlan, d_sum_u, d_sum_v, proj_u, proj_v,
                       b3e_p, e_in_p, d_e_out_p, scale_eff, bias_eff,
                       with_xsum: bool = False):
    """Fused training-layer backward (packed edge layout).  ``d_sum_u``/
    ``d_sum_v`` are the node cotangent arrays [Np, 2d] (caller casts to the
    compute dtype); returns (x_p [Ep/2, 2d] recomputed gate_raw,
    deo_p [Ep/2, 2d] residual cotangent (= d_e_in), pu_parts, pv_parts
    window-partial tuples keyed by u / v, stats [T*8, 2d] f32 — per tile,
    row 0 holds [sum(d_y) | sum(d_y * x)] over non-sentinel slots, the
    batch-statistics chain's global reductions).  The partials are [NB*W, 2d]
    ([d_gate | d_msg]); with ``with_xsum`` they widen to [NB*W, 3d]
    ([d_gate | d_msg | x]) — the x-sums for the batch-statistics chain ride
    the same scatter dots.  Overflow edges select zero everywhere (sentinel
    one-hots) and their x/deo/partial contributions are patched by the
    caller."""
    Eh, d2 = b3e_p.shape
    d = d2 // 2
    T, ET, C = plan.n_tiles, plan.tile_e, plan.chunk
    Wu, Wv = plan.window, plan.win_v
    ku, kv = plan.k_u, plan.k_v
    dtype = b3e_p.dtype
    rows = plan.rows_p
    affine = jnp.concatenate(
        [jnp.stack([jnp.concatenate([scale_eff, scale_eff]),
                    jnp.concatenate([bias_eff, bias_eff])]),
         jnp.zeros((6, 2 * d), jnp.float32)]).astype(dtype)

    ETh, Ch = ET // 2, C // 2
    pd = 3 * d if with_xsum else 2 * d      # partial width (see docstring)
    out_specs = (
        [pl.BlockSpec((ETh, 2 * d), lambda t, ub, vb: (t, 0)),
         pl.BlockSpec((ETh, 2 * d), lambda t, ub, vb: (t, 0))]
        + _first_blk_specs(Wu, pd, 0, ku) + _first_blk_specs(Wv, pd, 1, kv)
        + [pl.BlockSpec((8, 2 * d), lambda t, ub, vb: (t, 0))])
    # d_proj partials ride the payload dtype (see k7_gate_stats: block
    # accumulation depth is 1-3 tiles; the combined sums are cast to the
    # compute dtype anyway) — halves another 2 GB at 6.3M edges
    out_shape = [
        jax.ShapeDtypeStruct((Eh, 2 * d), dtype),
        jax.ShapeDtypeStruct((Eh, 2 * d), dtype),
    ] + ([jax.ShapeDtypeStruct((plan.n_blocks * Wu, pd), dtype)] * ku
         + [jax.ShapeDtypeStruct((plan.n_blocks_v * Wv, pd), dtype)] * kv
         + [jax.ShapeDtypeStruct((T * 8, 2 * d), jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=(
            _win_specs(Wu, 2 * d, 0, ku) + _win_specs(Wv, 2 * d, 1, kv)
            + _win_specs(Wu, 2 * d, 0, ku) + _win_specs(Wv, 2 * d, 1, kv)
            + [pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((ETh, 2 * d), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((ETh, 2 * d), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((ETh, 2 * d), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((8, 2 * d), lambda t, ub, vb: (0, 0))]),
        out_specs=out_specs,
    )
    kern = functools.partial(_k8_kernel, tile_e=ET, wu=Wu, wv=Wv, d=d,
                             chunk=C, ku=ku, kv=kv, with_xsum=with_xsum)
    # in-place: x_out overwrites b3e_p and deo_out overwrites d_e_out_p
    # (0.75 GB each at 6.3M edges).  Exact: at overflow rows the kernel
    # writes x = b3e and deo = d_e_out verbatim (sentinel selects are zero),
    # so the caller's overflow patches read the outputs in place of the
    # destroyed inputs.  Alias indices count scalar-prefetch args too.
    pos_b3e = 2 + 2 * ku + 2 * kv + 4
    out = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={pos_b3e: 0, pos_b3e + 2: 1},
        interpret=_interpret(), compiler_params=_CPARAMS,
    )(plan.u_blk, plan.v_blk, *([d_sum_u] * ku), *([d_sum_v] * kv),
      *([proj_u] * ku), *([proj_v] * kv),
      plan.u_local_e, plan.u_local_o, plan.v_local_e, plan.v_local_o,
      b3e_p, e_in_p, d_e_out_p, affine)
    return (out[0], out[1], out[2:2 + ku], out[2 + ku:2 + ku + kv],
            out[2 + ku + kv])


# ------------------------------------------- K6: score-predictor first layer
def _k6_kernel(u_blk_ref, v_blk_ref, *refs, tile_e, wu, wv, d, chunk,
               ku, kv):
    """Fused ``relu(pu[u] + pv[v] + be)`` — the score predictor's endpoint
    gathers AND first-layer matmul in one windowed pass (``pu = h @ W1u`` etc.
    are computed in NODE space by the caller, so the [Ep, 3d] concat and the
    edge-space [Ep,3d]x[3d,H] matmul never materialise; reference
    score_predictor.py:13-23).  ``puv`` packs [pu | pv] side by side ([Np,
    2H], no 128-lane padding); edge arrays are PACKED [Ep/2, 2H]
    (_k3_kernel).  Overflow slots carry relu(be) (caller patches)."""
    uws = refs[:ku]
    vws = refs[ku:ku + kv]
    ule, ulo, vle, vlo, be, z_out = refs[ku + kv:]
    io2u = jax.lax.broadcasted_iota(jnp.int32, (ku * wu, chunk), 0)
    io2v = jax.lax.broadcasted_iota(jnp.int32, (kv * wv, chunk), 0)
    hc = chunk // 2
    for c in range(tile_e // chunk):
        psl = pl.ds(c * hc, hc)
        pr = _prec(uws[0].dtype)
        # parity-merged selects (see _ohT2): 2 dots instead of 4
        gu = _selT(_ohT2(io2u, ule, ulo, c, uws[0].dtype), uws, pr)
        gv = _selT(_ohT2(io2v, vle, vlo, c, uws[0].dtype), vws, pr)
        s = _unstack_p(gu[:, :d] + gv[:, d:], hc)
        z_out[psl, :] = jax.nn.relu(s.astype(z_out.dtype) + be[psl, :])


def k6_score_gate(plan: WindowedPlan, puv, be_p):
    """puv: [Np, 2H] packed node pre-projections [pu | pv]; be_p: [Ep/2, 2H]
    packed slot order.  Returns packed z [Ep/2, 2H] =
    relu(pu[u] + pv[v] + be)."""
    Eh, H2 = be_p.shape
    H = H2 // 2
    T, ET, C = plan.n_tiles, plan.tile_e, plan.chunk
    Wu, Wv = plan.window, plan.win_v
    ku, kv = plan.k_u, plan.k_v
    rows = plan.rows_p
    ETh, Ch = ET // 2, C // 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=(
            _win_specs(Wu, 2 * H, 0, ku) + _win_specs(Wv, 2 * H, 1, kv)
            + [pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
               pl.BlockSpec((ETh, 2 * H), lambda t, ub, vb: (t, 0))]),
        out_specs=[
            pl.BlockSpec((ETh, 2 * H), lambda t, ub, vb: (t, 0)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((Eh, 2 * H), be_p.dtype)]
    kern = functools.partial(_k6_kernel, tile_e=ET, wu=Wu, wv=Wv, d=H,
                             chunk=C, ku=ku, kv=kv)
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(), compiler_params=_CPARAMS,
    )(plan.u_blk, plan.v_blk, *([puv] * ku), *([puv] * kv),
      plan.u_local_e, plan.u_local_o, plan.v_local_e, plan.v_local_o,
      be_p)[0]


# --------------------------------------- K9: packed shared-payload aggregate
def _k9_kernel(u_blk_ref, v_blk_ref, *refs, tile_e, wu, wv, d, chunk,
               ku, kv):
    """Dual-direction scatter of ONE packed payload [Ep/2, 2D] into per-block
    window partials keyed by u AND v — the adjoint of K6's two selects (the
    score-gate backward scatters the same masked cotangent by both
    endpoints).  The packed analog of _k2_kernel."""
    ule, ulo, vle, vlo, pay = refs[:5]
    pu = refs[5:5 + ku]
    pv = refs[5 + ku:]
    io2u = jax.lax.broadcasted_iota(jnp.int32, (ku * wu, chunk), 0)
    io2v = jax.lax.broadcasted_iota(jnp.int32, (kv * wv, chunk), 0)
    _zero_on_run_change(u_blk_ref, pu)
    _zero_on_run_change(v_blk_ref, pv)

    hc = chunk // 2
    for c in range(tile_e // chunk):
        psl = pl.ds(c * hc, hc)
        dt = pay.dtype
        # parity-merged dual scatter (see _ohT2): 2 dots instead of 4
        p2 = _stack_p(pay[psl, :], d)
        _scatT(_ohT2(io2u, ule, ulo, c, dt), p2, pu)
        _scatT(_ohT2(io2v, vle, vlo, c, dt), p2, pv)


def k9_aggregate_packed(plan: WindowedPlan, pay_p):
    """pay_p: [Ep/2, 2D] packed per-edge payload.  Returns (pu_parts,
    pv_parts): tuples of [NB*W, D] per-block partial sums of the payload
    keyed by u / v (combine with ``message.combine_block_partials``)."""
    Eh, D2 = pay_p.shape
    D = D2 // 2
    T, ET, C = plan.n_tiles, plan.tile_e, plan.chunk
    Wu, Wv = plan.window, plan.win_v
    ku, kv = plan.k_u, plan.k_v
    rows = plan.rows_p
    ETh, Ch = ET // 2, C // 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((rows, Ch), lambda t, ub, vb: (t, 0)),
            pl.BlockSpec((ETh, 2 * D), lambda t, ub, vb: (t, 0)),
        ],
        out_specs=(_first_blk_specs(Wu, D, 0, ku)
                   + _first_blk_specs(Wv, D, 1, kv)),
    )
    out_shape = (
        [jax.ShapeDtypeStruct((plan.n_blocks * Wu, D), jnp.float32)] * ku
        + [jax.ShapeDtypeStruct((plan.n_blocks_v * Wv, D),
                                jnp.float32)] * kv)
    kern = functools.partial(_k9_kernel, tile_e=ET, wu=Wu, wv=Wv, d=D,
                             chunk=C, ku=ku, kv=kv)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(), compiler_params=_CPARAMS,
    )(plan.u_blk, plan.v_blk,
      plan.u_local_e, plan.u_local_o, plan.v_local_e, plan.v_local_o, pay_p)
    return out[:ku], out[ku:]


# ----------------------------------------------------------------- utilities
_INTERPRET = False


def set_interpret(flag: bool) -> None:
    """Interpreter mode for CPU testing of the kernels."""
    global _INTERPRET
    _INTERPRET = flag


def _interpret() -> bool:
    return _INTERPRET
