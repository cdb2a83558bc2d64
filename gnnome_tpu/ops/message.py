"""Message-passing primitives: SDDMM (per-edge) and gated SpMM (per-node).

These replace DGL's ``apply_edges``/``update_all`` kernel dispatches
(reference layers/gated_gcn_full.py:104-127, layers/score_predictor.py:23).

TPU cost model (measured on v5e, see SURVEY.md §7 "hard parts"):

* row gathers dominate; 128-wide rows cost the same as 64-wide, so endpoint
  gathers are fused (one gather per endpoint per layer, not one per tensor);
* permutations cost as much as gathers, so edges are kept in dst-sorted slot
  order end-to-end: the forward aggregation is a *sorted* segment-sum and the
  backward aggregation an unsorted one (cheaper than permute+sorted);
* everything here is pure gather/segment-sum — XLA autodiff gives the exact
  adjoints (gather <-> scatter-add) with the same cost shape.

``pallas`` backend slot: ops/pallas_kernels.py (fused gate+aggregate).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .graph_tensors import GraphTensors

_DEFAULT_BACKEND = "xla"


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(name)
    _DEFAULT_BACKEND = name


def get_default_backend() -> str:
    return _DEFAULT_BACKEND


# -------------------------------------------------------------------- gathers
def _plan_for(gt: GraphTensors, flip: bool):
    return gt.wplan_flip if flip else gt.wplan


def combine_block_partials(parts, visited, n_pad: int, window: int,
                           all_visited: bool = False):
    """k per-block window-partial arrays [NB*W, D] -> [Np, D] node sums.

    Row ``b*W + j`` of partial array i belongs to node ``(b+i)*W + j``
    (ops/pallas_kernels.py ``_scatT``): the combine is a masked pad +
    shifted add over k CONTIGUOUS arrays — one fused elementwise pass, no
    strided slices (the old interleaved [NB*2W, D] layout cost three
    separate ~540 MB fusions per combine on the bench graph).  ``visited``
    masks never-written (uninitialised) partial blocks; when the host-side
    plan proves every block was visited (``all_visited``), the mask pass is
    skipped entirely.
    """
    NB = visited.shape[0]
    D = parts[0].shape[1]
    zero = jnp.zeros((), parts[0].dtype)
    tail = n_pad - NB * window           # == (k-1) * window
    # never-written blocks hold UNINITIALISED HBM: mask with where, not a
    # multiply — garbage can be NaN/inf bit patterns and NaN * 0 == NaN
    vis = None if all_visited else (visited > 0)
    res = None
    for i, p in enumerate(parts):
        if vis is not None:
            p = jnp.where(vis[:, None, None],
                          p.reshape(NB, window, D),
                          zero).reshape(NB * window, D)
        s = jax.lax.pad(p, zero,
                        ((i * window, tail - i * window, 0), (0, 0, 0)))
        res = s if res is None else res + s
    return res


def fused_gate_gather(gt: GraphTensors, proj_u: jax.Array, proj_v: jax.Array,
                      b3e: jax.Array, flip: bool = False,
                      backend: str | None = None):
    """(gate_raw, a2h_u, a3h_v) in slot order from the fused projections.

    ``proj_u`` [Np, 2d] = [B1h | A2h]; ``proj_v`` [Np, 2d] = [B2h | A3h];
    gate_raw = B1h[u] + B2h[v] + b3e where (u, v) = (src, dst) or reversed
    under ``flip`` (reference gated_gcn_full.py:104-105).
    """
    backend = backend or _DEFAULT_BACKEND
    u_idx, v_idx = (gt.src, gt.dst) if not flip else (gt.dst, gt.src)
    plan = _plan_for(gt, flip)
    if backend == "pallas" and plan is not None:
        d = b3e.shape[1]
        g3 = _gate_gather_pallas(plan, u_idx, v_idx, proj_u, proj_v, b3e)
        return g3[:, :d], g3[:, d: 2 * d], g3[:, 2 * d:]
    # v_idx is the slot-sort key when not flipped -> sorted adjoint
    # (gt.dst_sorted is False after the tail-overflow reslot)
    return _gate_gather_xla(u_idx, v_idx, (not flip) and gt.dst_sorted,
                            proj_u, proj_v, b3e)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gate_gather_xla(u_idx, v_idx, v_sorted, proj_u, proj_v, b3e):
    """XLA endpoint gathers with segment-sum adjoints (measured ~2x faster on
    TPU than the default scatter-add VJP of ``jnp.take``)."""
    d = b3e.shape[1]
    g_u = jnp.take(proj_u, u_idx, axis=0)
    g_v = jnp.take(proj_v, v_idx, axis=0)
    gate = g_u[:, :d] + g_v[:, :d] + b3e
    return gate, g_u[:, d:], g_v[:, d:]


def _gate_gather_xla_fwd(u_idx, v_idx, v_sorted, proj_u, proj_v, b3e):
    out = _gate_gather_xla(u_idx, v_idx, v_sorted, proj_u, proj_v, b3e)
    return out, (u_idx, v_idx, proj_u.shape[0])


def _gate_gather_xla_bwd(v_sorted, res, g):
    u_idx, v_idx, n = res
    d_gate, d_a2h, d_a3h = g
    d_pu = jax.ops.segment_sum(jnp.concatenate([d_gate, d_a2h], axis=1),
                               u_idx, num_segments=n)
    d_pv = jax.ops.segment_sum(jnp.concatenate([d_gate, d_a3h], axis=1),
                               v_idx, num_segments=n,
                               indices_are_sorted=v_sorted)
    return None, None, d_pu, d_pv, d_gate


_gate_gather_xla.defvjp(_gate_gather_xla_fwd, _gate_gather_xla_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_uv(u_idx, v_idx, v_sorted, h):
    """(h[u], h[v]) with segment-sum adjoints — used by the score predictor
    (reference score_predictor.py:13 concat gathers)."""
    return jnp.take(h, u_idx, axis=0), jnp.take(h, v_idx, axis=0)


def _gather_uv_fwd(u_idx, v_idx, v_sorted, h):
    return gather_uv(u_idx, v_idx, v_sorted, h), (u_idx, v_idx, h.shape[0])


def _gather_uv_bwd(v_sorted, res, g):
    u_idx, v_idx, n = res
    d_u, d_v = g
    d_h = (jax.ops.segment_sum(d_u, u_idx, num_segments=n)
           + jax.ops.segment_sum(d_v, v_idx, num_segments=n,
                                 indices_are_sorted=v_sorted))
    return None, None, d_h


gather_uv.defvjp(_gather_uv_fwd, _gather_uv_bwd)


def gather_uv_planned(gt: GraphTensors, flip: bool, h: jax.Array,
                      backend: str | None = None):
    """(h[u], h[v]) for the score predictor; when a windowed plan exists the
    adjoint runs through the K2 dual scatter instead of two XLA segment-sums
    (measured ~35 ms -> ~13 ms per direction pass on the bench graph)."""
    backend = backend or _DEFAULT_BACKEND
    u_idx, v_idx = (gt.src, gt.dst) if not flip else (gt.dst, gt.src)
    plan = _plan_for(gt, flip)
    if backend == "pallas" and plan is not None:
        return _gather_uv_pallas(plan, u_idx, v_idx, h)
    return gather_uv(u_idx, v_idx, (not flip) and gt.dst_sorted, h)


@jax.custom_vjp
def _gather_uv_pallas(plan, u_idx, v_idx, h):
    return jnp.take(h, u_idx, axis=0), jnp.take(h, v_idx, axis=0)


def _gather_uv_pallas_fwd(plan, u_idx, v_idx, h):
    return _gather_uv_pallas(plan, u_idx, v_idx, h), (plan, u_idx, v_idx)


def _gather_uv_pallas_bwd(res, g):
    plan, u_idx, v_idx = res
    d_u, d_v = g
    sum_b, sum_f = _aggregate_pallas(plan, u_idx, v_idx, d_u, d_v)
    return None, None, None, (sum_b + sum_f).astype(d_u.dtype)


_gather_uv_pallas.defvjp(_gather_uv_pallas_fwd, _gather_uv_pallas_bwd)


@jax.custom_vjp
def _gate_gather_pallas(plan, u_idx, v_idx, proj_u, proj_v, b3e):
    from .pallas_kernels import k1_gather_gate

    d = b3e.shape[1]
    g3 = k1_gather_gate(plan, proj_u, proj_v, b3e)
    # patch overflow edges with direct XLA gathers (mask cast keeps the
    # compute dtype — an f32 mask would silently promote the whole array)
    m = plan.ovf_mask.astype(g3.dtype)
    gu = jnp.take(proj_u, _ovf_idx(plan, u_idx), axis=0)
    gv = jnp.take(proj_v, _ovf_idx(plan, v_idx), axis=0)
    patch = m * jnp.concatenate(
        [gu[:, :d] + gv[:, :d], gu[:, d:], gv[:, d:]], axis=1)
    if plan.ovf_start >= 0:
        g3 = jax.lax.dynamic_update_slice_in_dim(
            g3, _ovf_rows(plan, g3) + patch, plan.ovf_start, axis=0)
    else:
        g3 = g3.at[plan.ovf_slots].add(patch)
    return g3


def _gate_gather_fwd(plan, u_idx, v_idx, proj_u, proj_v, b3e):
    out = _gate_gather_pallas(plan, u_idx, v_idx, proj_u, proj_v, b3e)
    return out, (plan, u_idx, v_idx)


def _gate_gather_bwd(res, g):
    plan, u_idx, v_idx = res
    d_g3 = g
    d = d_g3.shape[1] // 3
    # the adjoint of the windowed gather is the windowed scatter: reuse K2;
    # the u-side payload [d_gate | d_a2h] is a contiguous slice of d_g3
    d_pu, d_pv = _aggregate_pallas(
        plan, u_idx, v_idx, d_g3[:, : 2 * d],
        jnp.concatenate([d_g3[:, :d], d_g3[:, 2 * d:]], axis=1))
    dt = d_g3.dtype
    return (None, None, None, d_pu.astype(dt), d_pv.astype(dt),
            d_g3[:, :d])


_gate_gather_pallas.defvjp(_gate_gather_fwd, _gate_gather_bwd)


# -------------------------------------------------- packed edge-array layout
# All fused-path edge arrays are PACKED [Ep/2, 2d]: edge 2r in lanes :d of
# row r, edge 2r+1 in lanes d: (an exact row-major reshape of the [Ep, d]
# slot-order array).  A 64-wide bf16/f32 minor dim pays a 2x 128-lane padding
# tax in HBM; the packed form is stored at its unpadded size and halves every
# kernel's edge-stream bytes.  The helpers below give per-overflow-slot views
# of packed arrays without unpacking.

def pack_edges(a):
    """[Ep, d] slot order -> packed [Ep/2, 2d] (bitwise row-major reshape)."""
    return a.reshape(a.shape[0] // 2, 2 * a.shape[1])


def unpack_edges(a):
    """Packed [Ep/2, 2d] -> [Ep, d] slot order."""
    return a.reshape(a.shape[0] * 2, a.shape[1] // 2)


def _ovf_idx(plan, idx):
    """Per-patch-slot values of a [Ep] slot-order index array: a static
    slice in tail mode (contiguous region), a gather in scatter mode."""
    if plan.ovf_start >= 0:
        return jax.lax.slice_in_dim(idx, plan.ovf_start,
                                    plan.ovf_start + plan.ovf_slots.shape[0])
    return jnp.take(idx, plan.ovf_slots)


def _ovf_rows(plan, arr):
    """[n_ovf_pad, D] patch rows of an UNPACKED [Ep, D] slot-order array."""
    if plan.ovf_start >= 0:
        return jax.lax.slice_in_dim(arr, plan.ovf_start,
                                    plan.ovf_start + plan.ovf_slots.shape[0])
    return jnp.take(arr, plan.ovf_slots, axis=0)


def _ovf_take(plan, packed, d):
    """[n_ovf_pad, d] per-overflow-slot values from a packed edge array.
    Tail mode: the contiguous packed rows reshape EXACTLY to slot order
    (row r holds slots 2r, 2r+1) — one static slice, no gather."""
    R = plan.ovf_slots.shape[0]
    if plan.ovf_start >= 0:
        rows = jax.lax.slice_in_dim(packed, plan.ovf_start // 2,
                                    (plan.ovf_start + R) // 2)
        return rows.reshape(R, d)
    vals = jnp.take(packed, plan.ovf_slots // 2, axis=0)
    par = (plan.ovf_slots % 2)[:, None]
    return jnp.where(par == 0, vals[:, :d], vals[:, d:])


def _ovf_apply(plan, packed, new, mask, mode: str = "set"):
    """Masked per-overflow-slot write of [n_ovf_pad, d] values into the
    parity lane half of a packed edge array.

    Tail mode: one static region slice + masked combine + one
    dynamic-update-slice — no full-array scatter exists anywhere.

    Scatter mode: lowered as ONE scatter-add of deltas — duplicate target
    rows (an even and an odd overflow slot sharing a packed row) accumulate
    correctly, and masked pad entries contribute zero.  ``set`` writes
    new - old (one extra rounding step in the array dtype for overflow rows
    only); ``add`` accumulates ``new``."""
    d = new.shape[1]
    if plan.ovf_start >= 0:
        R = plan.ovf_slots.shape[0]
        start_r = plan.ovf_start // 2
        old = jax.lax.slice_in_dim(packed, start_r,
                                   start_r + R // 2).reshape(R, d)
        if mode == "set":
            upd = jnp.where(mask > 0, new.astype(packed.dtype), old)
        else:
            upd = (old.astype(jnp.float32)
                   + new.astype(jnp.float32) * mask).astype(packed.dtype)
        return jax.lax.dynamic_update_slice_in_dim(
            packed, upd.reshape(R // 2, 2 * d), start_r, axis=0)
    rows = plan.ovf_slots // 2
    par = (plan.ovf_slots % 2)[:, None]
    if mode == "set":
        old = _ovf_take(plan, packed, d)
        delta = (new.astype(jnp.float32) - old.astype(jnp.float32)) * mask
    else:
        delta = new.astype(jnp.float32) * mask
    zero = jnp.zeros_like(delta)
    full = jnp.where(par == 0,
                     jnp.concatenate([delta, zero], axis=1),
                     jnp.concatenate([zero, delta], axis=1))
    return packed.at[rows].add(full.astype(packed.dtype))


def fused_eval_edge_stage(gt: GraphTensors, proj_u, proj_v, b3e_p, e_in_p,
                          bn_scale, bn_bias, flip: bool = False):
    """EVAL-mode fused edge stage (Pallas K3) over PACKED edge arrays:
    returns (e_out_p [Ep/2, 2d], sum_into_v [Np, 2d], sum_into_u [Np, 2d])
    where u/v are the flip-resolved endpoint roles.  Requires a windowed
    plan; caller must check.  Not differentiable (inference path; the
    training path wraps the same kernel in ``fused_train_stage``'s custom
    VJP)."""
    plan = _plan_for(gt, flip)
    u_idx, v_idx = (gt.src, gt.dst) if not flip else (gt.dst, gt.src)
    return _eval_edge_stage(plan, u_idx, v_idx, proj_u, proj_v, b3e_p,
                            e_in_p, bn_scale, bn_bias)


def _eval_edge_stage(plan, u_idx, v_idx, proj_u, proj_v, b3e_p, e_in_p,
                     bn_scale, bn_bias):
    from .pallas_kernels import k3_fused_edge_stage

    d = b3e_p.shape[1] // 2
    n_pad = plan.n_pad
    dt = b3e_p.dtype

    e_out_p, pu_parts, pv_parts = k3_fused_edge_stage(
        plan, proj_u, proj_v, b3e_p, e_in_p, bn_scale, bn_bias)
    sum_u = combine_block_partials(pu_parts, plan.u_visited, n_pad,
                                   plan.window, plan.u_all)
    sum_v = combine_block_partials(pv_parts, plan.v_visited, n_pad,
                                   plan.win_v, plan.v_all)

    # overflow edges: recompute the full edge stage with direct gathers,
    # matching the kernel's dtype discipline
    m = plan.ovf_mask
    uo, vo = _ovf_idx(plan, u_idx), _ovf_idx(plan, v_idx)
    gu = jnp.take(proj_u, uo, axis=0)
    gv = jnp.take(proj_v, vo, axis=0)
    gate = (gu[:, :d] + gv[:, :d]).astype(dt) + _ovf_take(plan, b3e_p, d)
    gate = gate * bn_scale.astype(dt) + bn_bias.astype(dt)
    gate = jax.nn.relu(gate)
    eo_ovf = gate + _ovf_take(plan, e_in_p, d)
    e_out_p = _ovf_apply(plan, e_out_p, eo_ovf, m, "set")
    sigma = jax.nn.sigmoid(eo_ovf.astype(jnp.float32)) * m
    sum_v = sum_v + jax.ops.segment_sum(
        jnp.concatenate([sigma * gu[:, d:], sigma], axis=1),
        vo, num_segments=n_pad)
    sum_u = sum_u + jax.ops.segment_sum(
        jnp.concatenate([sigma * gv[:, d:], sigma], axis=1),
        uo, num_segments=n_pad)
    return e_out_p, sum_v, sum_u



def fused_train_stage(gt: GraphTensors, h, w_uv, b_uv, wbd3, b3b, e_p,
                      gamma, beta, flip: bool = False):
    """The WHOLE training-mode edge stage — endpoint projections, batch
    statistics, BatchNorm, relu, residual, sigmoid, both gated aggregations —
    as one differentiable primitive over PACKED edge arrays, with no [Ep, 3d]
    intermediates and no 128-lane padding in HBM (reference hot path
    gated_gcn_full.py:104-127 + the torch BN batch-stat backward).

    The projections ``proj = h @ w_uv + b_uv`` ([Np, 4d] = [B1h|A2h|B2h|A3h])
    and ``b3e_p = e_p @ wbd3 + b3b`` (block-diagonal B3 over the packed
    layout) happen INSIDE the primitive so they are never residuals: the
    saved state is just (h, e_p — the layer carries the scan already keeps —
    the weights, and four [d] statistics vectors).  That makes the un-remat'd
    scan cheap enough in memory that the layer body needs NO rematerialised
    replay: the backward recomputes the two projections (cheap MXU matmuls)
    and runs K8 once — K7/K3 never run again.

    Forward: K7 computes the gate statistics windowed (gate_raw never
    materialises), the statistics fold into one affine, and the K3 kernel
    runs the fused edge stage.  Backward: K8 re-selects everything from the
    node windows and emits d_proj window partials, x-sum partials, the
    recomputed gate and the residual cotangent directly; the
    batch-statistics chain closes in node space because its per-edge term
    ``m*(c1 + c2*x)`` is linear in x.  Returns (e_out_p [Ep/2, 2d],
    sum_v [Np, 2d], sum_u [Np, 2d], mean [d], unbiased_var [d]); the
    mean/var outputs carry NO gradient (torch updates running stats under
    no_grad)."""
    plan = _plan_for(gt, flip)
    u_idx, v_idx = (gt.src, gt.dst) if not flip else (gt.dst, gt.src)
    # real edge count as a TRACED f32 scalar (exact to 2^24): a static int
    # here would recompile every masked/clustered unit
    ne = (gt.ne_valid if gt.ne_valid is not None
          else jnp.float32(gt.n_edges))
    # packed slot-validity mask [Ep/2, 2]: the batch-stat backward's c-term
    # applies at VALID slots only, and slot validity is no longer
    # position-derivable once the tail-overflow layout holes the interior
    em_p = gt.edge_mask.reshape(-1, 2)
    return _train_stage(plan, u_idx, v_idx, h, w_uv, b_uv,
                        wbd3, b3b, e_p, gamma, beta, ne, em_p)


def _train_stage_impl(plan, u_idx, v_idx, h, w_uv, b_uv,
                      wbd3, b3b, e_p, gamma, beta, n_edges, em_p):
    from .pallas_kernels import k7_gate_stats

    d = h.shape[1]
    dt = e_p.dtype
    proj = h @ w_uv + b_uv
    proj_u, proj_v = proj[:, : 2 * d], proj[:, 2 * d:]
    b3e_p = e_p @ wbd3 + b3b
    stats = k7_gate_stats(plan, proj_u, proj_v, b3e_p)
    stats = stats.reshape(plan.n_tiles, 8, 2 * d).sum(axis=0)
    s1 = stats[0, :d]
    s2 = stats[0, d:]
    # overflow edges: the kernel excluded them (sentinel); add their exact
    # contributions from direct gathers
    m = plan.ovf_mask
    uo, vo = _ovf_idx(plan, u_idx), _ovf_idx(plan, v_idx)
    gu = jnp.take(proj_u, uo, axis=0)
    gv = jnp.take(proj_v, vo, axis=0)
    x_o = (gu[:, :d] + gv[:, :d]).astype(dt) + _ovf_take(plan, b3e_p, d)
    xf_o = x_o.astype(jnp.float32) * m
    s1 = s1 + xf_o.sum(axis=0)
    s2 = s2 + (xf_o * x_o.astype(jnp.float32)).sum(axis=0)

    n = n_edges                                     # traced f32 scalar
    mean = s1 / n
    var = s2 / n - mean * mean                      # biased (normalises)
    inv = jax.lax.rsqrt(var + 1e-5)
    scale_eff = gamma * inv
    bias_eff = beta - mean * scale_eff
    unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))

    e_out_p, sum_v, sum_u = _eval_edge_stage(plan, u_idx, v_idx, proj_u,
                                             proj_v, b3e_p, e_p,
                                             scale_eff, bias_eff)
    # emit the aggregation sums in the compute dtype (no-op in f32 parity
    # mode): they are the node stage's checkpoint inputs, i.e. the largest
    # per-layer residual of the lean-VJP remat modes — bf16 halves ~1 GB per
    # group at 6.3M edges, which is what lets the chromosome-scale
    # remat="full" backward skip the per-layer K7/K3 replay on a 16 GB chip
    out = (e_out_p, sum_v.astype(dt), sum_u.astype(dt), mean, unbiased)
    res = (plan, u_idx, v_idx, h, w_uv, b_uv, wbd3, b3b, e_p, gamma,
           mean, inv, scale_eff, bias_eff, n, em_p)
    return out, res


@jax.custom_vjp
def _train_stage(plan, u_idx, v_idx, h, w_uv, b_uv, wbd3, b3b,
                 e_p, gamma, beta, n_edges, em_p):
    out, _ = _train_stage_impl(plan, u_idx, v_idx, h, w_uv, b_uv,
                               wbd3, b3b, e_p, gamma, beta, n_edges, em_p)
    return out


def _train_stage_fwd(plan, u_idx, v_idx, h, w_uv, b_uv, wbd3, b3b,
                     e_p, gamma, beta, n_edges, em_p):
    return _train_stage_impl(plan, u_idx, v_idx, h, w_uv, b_uv,
                             wbd3, b3b, e_p, gamma, beta, n_edges, em_p)


def _train_stage_bwd(res, cots):
    from .pallas_kernels import k8_train_layer_bwd

    (plan, u_idx, v_idx, h, w_uv, b_uv, wbd3, b3b, e_p, gamma,
     mean, inv, scale_eff, bias_eff, n_edges, em_p) = res
    # mean/unbiased-var cotangents are dropped: running-stat updates carry no
    # gradient (torch semantics — they happen under no_grad)
    d_e_out_p, d_sum_v, d_sum_u, _dm, _dv = cots
    dt = e_p.dtype
    d = h.shape[1]
    Eh = e_p.shape[0]
    n_pad = plan.n_pad

    # recompute the projections (deterministic: same inputs, same precision
    # -> bitwise-identical to the forward's, so K8's recomputed relu masks
    # match K3's exactly)
    proj = h @ w_uv + b_uv
    proj_u, proj_v = proj[:, : 2 * d], proj[:, 2 * d:]
    b3e_p = e_p @ wbd3 + b3b

    # cast BEFORE the kernel: bf16 node-window DMAs are ~2x cheaper (no-op in
    # f32 mode); padded slots carry sentinel one-hots -> zero selects
    x_p, deo_p, pu_parts, pv_parts, k8_stats = k8_train_layer_bwd(
        plan, d_sum_u.astype(dt), d_sum_v.astype(dt), proj_u, proj_v,
        b3e_p, e_p, d_e_out_p.astype(dt), scale_eff, bias_eff,
        with_xsum=True)
    # partials are [NB*W, 3d] = [d_gate | d_msg | x]: one combine per
    # endpoint yields both the d_proj sums and the batch-stat x-sums
    cu = combine_block_partials(pu_parts, plan.u_visited, n_pad,
                                plan.window, plan.u_all)
    cv = combine_block_partials(pv_parts, plan.v_visited, n_pad,
                                plan.win_v, plan.v_all)
    d_pu, xsum_u = cu[:, : 2 * d], cu[:, 2 * d:]
    d_pv, xsum_v = cv[:, : 2 * d], cv[:, 2 * d:]

    # ---- overflow handling, DE-SERIALISED: K8 left x/deo unpatched at
    # overflow rows (x = b3e, deo = d_e_out verbatim — sentinel selects
    # contribute zero).  Instead of repairing both big packed arrays in HBM
    # (a gather + full-array scatter-add each, serialised BEFORE the
    # batch-statistics chain could start), the chain below runs on the
    # UNPATCHED arrays and every overflow effect is applied as a small dense
    # correction — the only remaining full-array write is ONE add into
    # d_e_p at the very end (a static region-slice update in tail mode),
    # independent of the statistics chain.
    sl, m = plan.ovf_slots, plan.ovf_mask
    uo, vo = _ovf_idx(plan, u_idx), _ovf_idx(plan, v_idx)
    gu = jnp.take(proj_u, uo, axis=0)
    gv = jnp.take(proj_v, vo, axis=0)
    x_uo = _ovf_take(plan, x_p, d)                  # unpatched row = b3e
    deo_uo = _ovf_take(plan, deo_p, d)              # unpatched row = d_e_out
    x_o = (gu[:, :d] + gv[:, :d]).astype(dt) + x_uo
    xf_o = x_o.astype(jnp.float32) * m
    xsum_u = (xsum_u.astype(jnp.float32)
              + jax.ops.segment_sum(xf_o, uo, num_segments=n_pad))
    xsum_v = (xsum_v.astype(jnp.float32)
              + jax.ops.segment_sum(xf_o, vo, num_segments=n_pad))
    gaff = x_o * scale_eff.astype(dt) + bias_eff.astype(dt)
    relu_m = (gaff.astype(jnp.float32) > 0).astype(jnp.float32)
    eo = jax.nn.relu(gaff) + _ovf_take(plan, e_p, d)
    sigma = jax.nn.sigmoid(eo.astype(jnp.float32))
    du_o = jnp.take(d_sum_u.astype(dt), uo, axis=0).astype(jnp.float32) * m
    dv_o = jnp.take(d_sum_v.astype(dt), vo, axis=0).astype(jnp.float32) * m
    a2u = gu[:, d:].astype(dt).astype(jnp.float32)
    a3v = gv[:, d:].astype(dt).astype(jnp.float32)
    d_sigma = (dv_o[:, :d] * a2u + dv_o[:, d:]
               + du_o[:, :d] * a3v + du_o[:, d:])
    d_eo_x = d_sigma * sigma * (1.0 - sigma)
    d_eo_full = (deo_uo.astype(jnp.float32) + d_eo_x)
    d_y_o = d_eo_full * relu_m * m                  # TRUE dy at ovf rows
    # what the unpatched chain will (wrongly) contribute at those rows
    gaff_uo = (x_uo * scale_eff.astype(dt)
               + bias_eff.astype(dt)).astype(jnp.float32)
    dy_uo = deo_uo.astype(jnp.float32) * (gaff_uo > 0) * m
    xf_uo = x_uo.astype(jnp.float32) * m
    d_pu = d_pu + jax.ops.segment_sum(
        jnp.concatenate([d_y_o * scale_eff, m * sigma * dv_o[:, :d]],
                        axis=1), uo, num_segments=n_pad)
    d_pv = d_pv + jax.ops.segment_sum(
        jnp.concatenate([d_y_o * scale_eff, m * sigma * du_o[:, :d]],
                        axis=1), vo, num_segments=n_pad)

    # ---- batch-statistics chain.  The global [sum(dy) | sum(dy*x)] sums
    # ride K8 itself (per-tile stats, sentinel slots excluded in-kernel —
    # no separate full-edge reduction pass); only the TRUE overflow terms
    # are added here.  The per-edge d_b3e still closes from the unpatched
    # packed x / d_eo below (relu mask recomputed exactly as the kernel
    # did; slot validity from iotas — padded slots sort last).
    scale2_dt = jnp.concatenate([scale_eff, scale_eff]).astype(dt)
    bias2_dt = jnp.concatenate([bias_eff, bias_eff]).astype(dt)
    gaff_p = x_p * scale2_dt + bias2_dt
    relu_p = (gaff_p.astype(jnp.float32) > 0).astype(jnp.float32)
    dy_p = deo_p.astype(jnp.float32) * relu_p
    # slot validity from the packed edge mask (the tail-overflow layout
    # holes the interior, so validity is not position-derivable); region
    # rows count as valid here and their c-term closes via the delta
    # corrections below, exactly like scatter-mode overflow rows
    mvalid = jnp.concatenate(
        [jnp.broadcast_to(em_p[:, :1], (Eh, d)),
         jnp.broadcast_to(em_p[:, 1:], (Eh, d))], axis=1)
    xf_p = x_p.astype(jnp.float32)
    s = k8_stats.reshape(plan.n_tiles, 8, 2 * d)[:, 0, :].sum(axis=0)
    A = s[:d] + d_y_o.sum(axis=0)                   # d_bias_eff
    B = s[d:] + (d_y_o * xf_o).sum(axis=0)          # d_scale_eff (pre-chain)
    g_term = B - mean * A
    d_gamma = inv * g_term
    d_beta = A
    d_var = -0.5 * (inv ** 3) * (gamma * g_term)
    d_mean = -A * scale_eff - 2.0 * mean * d_var
    c1 = d_mean / n_edges
    c2 = 2.0 * d_var / n_edges
    c12 = jnp.concatenate([c1, c1])
    c22 = jnp.concatenate([c2, c2])
    scale2_f = jnp.concatenate([scale_eff, scale_eff])
    d_b3e_p = (dy_p * scale2_f + mvalid * (c12 + c22 * xf_p)).astype(dt)
    # per-slot d_b3e correction at overflow rows (true minus unpatched)
    db3e_true = d_y_o * scale_eff + m * (c1 + c2 * xf_o)
    db3e_uo = dy_uo * scale_eff + m * (c1 + c2 * xf_uo)
    db3e_delta = db3e_true - db3e_uo
    # node-space stats term: sum_e m*(c1 + c2*x) into each endpoint =
    # c1*deg + c2*xsum (K8's x-sums; deg comes exact from the host plan)
    zu = c2 * xsum_u + c1 * plan.deg_u[:, None]
    zv = c2 * xsum_v + c1 * plan.deg_v[:, None]
    d_pu = d_pu + jnp.concatenate([zu, jnp.zeros_like(zu)], axis=1)
    d_pv = d_pv + jnp.concatenate([zv, jnp.zeros_like(zv)], axis=1)

    # ---- close the projection matmuls (f32 accumulation, grads cast back
    # to the weights' dtype — same discipline as XLA's matmul adjoints)
    d_proj = jnp.concatenate([d_pu, d_pv], axis=1).astype(dt)
    d_h = jnp.matmul(d_proj, w_uv.T,
                     preferred_element_type=jnp.float32).astype(h.dtype)
    d_w_uv = jnp.matmul(h.T, d_proj,
                        preferred_element_type=jnp.float32
                        ).astype(w_uv.dtype)
    d_b_uv = d_proj.astype(jnp.float32).sum(axis=0).astype(b_uv.dtype)
    # e/B3 closes from the unpatched d_b3e_p + small per-parity corrections:
    # a packed slot only touches its parity's diagonal block of wbd3, whose
    # per-slot transform is the top-left [d, d] block (blockdiag structure)
    w3d = wbd3[:d, :d].astype(jnp.float32)
    d_e_base = (deo_p.astype(jnp.float32)
                + jnp.matmul(d_b3e_p, wbd3.T,
                             preferred_element_type=jnp.float32)).astype(dt)
    delta_e = d_eo_x * m + jnp.matmul(db3e_delta, w3d.T,
                                      preferred_element_type=jnp.float32)
    d_e_p = _ovf_apply(plan, d_e_base, delta_e, m, "add")
    even = (sl % 2 == 0).astype(jnp.float32)[:, None] * m
    odd = m - even
    e_of = _ovf_take(plan, e_p, d).astype(jnp.float32)
    ce = jnp.matmul((e_of * even).T, db3e_delta * even,
                    preferred_element_type=jnp.float32)
    co = jnp.matmul((e_of * odd).T, db3e_delta * odd,
                    preferred_element_type=jnp.float32)
    zblk = jnp.zeros_like(ce)
    corr_w = jnp.concatenate(
        [jnp.concatenate([ce, zblk], axis=1),
         jnp.concatenate([zblk, co], axis=1)], axis=0)
    d_wbd3 = (jnp.matmul(e_p.T, d_b3e_p,
                         preferred_element_type=jnp.float32)
              + corr_w).astype(wbd3.dtype)
    db3b_corr = jnp.concatenate([(db3e_delta * even).sum(axis=0),
                                 (db3e_delta * odd).sum(axis=0)])
    d_b3b = (d_b3e_p.astype(jnp.float32).sum(axis=0)
             + db3b_corr).astype(b3b.dtype)

    return (None, None, None, d_h, d_w_uv, d_b_uv, d_wbd3, d_b3b, d_e_p,
            d_gamma.astype(gamma.dtype), d_beta.astype(gamma.dtype), None,
            None)


_train_stage.defvjp(_train_stage_fwd, _train_stage_bwd)


@jax.custom_vjp
def _aggregate_pallas(plan, u_idx, v_idx, pay_u, pay_v):
    """(sum_b [Np, Dp] into u_idx, sum_f [Np, Dp] into v_idx) from edge
    payloads via per-tile window partials + a small combine segment-sum."""
    from .pallas_kernels import k2_aggregate

    n_pad = plan.n_pad
    pu_parts, pv_parts = k2_aggregate(plan, pay_u, pay_v)
    sum_b = combine_block_partials(pu_parts, plan.u_visited, n_pad,
                                   plan.window, plan.u_all)
    sum_f = combine_block_partials(pv_parts, plan.v_visited, n_pad,
                                   plan.win_v, plan.v_all)
    # overflow contributions
    m = plan.ovf_mask
    sum_b = sum_b + jax.ops.segment_sum(
        _ovf_rows(plan, pay_u) * m, _ovf_idx(plan, u_idx),
        num_segments=n_pad)
    sum_f = sum_f + jax.ops.segment_sum(
        _ovf_rows(plan, pay_v) * m, _ovf_idx(plan, v_idx),
        num_segments=n_pad)
    return sum_b, sum_f


def _aggregate_fwd(plan, u_idx, v_idx, pay_u, pay_v):
    out = _aggregate_pallas(plan, u_idx, v_idx, pay_u, pay_v)
    # residuals must be jax values: a 0-sized array carries the payload dtype
    return out, (u_idx, v_idx, jnp.zeros((0,), pay_u.dtype))


def _aggregate_bwd(res, g):
    u_idx, v_idx, dtype_probe = res
    d_sum_b, d_sum_f = g
    # cast BEFORE the gather: a bf16 row gather is ~5x cheaper than f32
    # (measured cost model, models/sym_gated_gcn.py docstring); in f32 mode
    # the cast is a no-op so gradients are unchanged
    d_pay_u = jnp.take(d_sum_b.astype(dtype_probe.dtype), u_idx, axis=0)
    d_pay_v = jnp.take(d_sum_f.astype(dtype_probe.dtype), v_idx, axis=0)
    return None, None, None, d_pay_u, d_pay_v


_aggregate_pallas.defvjp(_aggregate_fwd, _aggregate_bwd)


def fused_score_gate(gt: GraphTensors, flip: bool, puv, be_p):
    """``relu(pu[u] + pv[v] + be)`` for the score predictor's first layer
    (Pallas K6): endpoint gathers, the three-way add and the relu in one
    windowed pass over PACKED edge arrays.  ``puv`` is the [Np, 2H] packed
    node pre-projection [h @ W1u | h @ W1v]; ``be_p`` = packed
    ``e @ W1e + b1`` in slot order ([Ep/2, 2H]).  Requires a windowed plan;
    the caller checks."""
    plan = _plan_for(gt, flip)
    u_idx, v_idx = (gt.src, gt.dst) if not flip else (gt.dst, gt.src)
    return _score_gate_pallas(plan, u_idx, v_idx, puv, be_p)


@jax.custom_vjp
def _score_gate_pallas(plan, u_idx, v_idx, puv, be_p):
    from .pallas_kernels import k6_score_gate

    H = be_p.shape[1] // 2
    z_p = k6_score_gate(plan, puv, be_p)
    # overflow slots: recompute with direct gathers
    m = plan.ovf_mask
    zo = jax.nn.relu(jnp.take(puv, _ovf_idx(plan, u_idx), axis=0)[:, :H]
                     + jnp.take(puv, _ovf_idx(plan, v_idx), axis=0)[:, H:]
                     + _ovf_take(plan, be_p, H))
    return _ovf_apply(plan, z_p, zo, m, "set")


def _score_gate_fwd(plan, u_idx, v_idx, puv, be_p):
    z_p = _score_gate_pallas(plan, u_idx, v_idx, puv, be_p)
    return z_p, (plan, u_idx, v_idx, z_p)


def _score_gate_bwd(res, dz_p):
    from .pallas_kernels import k9_aggregate_packed

    plan, u_idx, v_idx, z_p = res
    H = z_p.shape[1] // 2
    n_pad = plan.n_pad
    dz_p = dz_p * (z_p > 0).astype(dz_p.dtype)
    # adjoint of the two windowed selects = the packed dual scatter (K9);
    # overflow slots scatter nothing in-kernel (sentinel) — patched below
    pu_parts, pv_parts = k9_aggregate_packed(plan, dz_p)
    d_pu = combine_block_partials(pu_parts, plan.u_visited, n_pad,
                                  plan.window, plan.u_all)
    d_pv = combine_block_partials(pv_parts, plan.v_visited, n_pad,
                                  plan.win_v, plan.v_all)
    m = plan.ovf_mask
    dzo = _ovf_take(plan, dz_p, H).astype(jnp.float32) * m
    d_puv = jnp.concatenate(
        [d_pu + jax.ops.segment_sum(dzo, _ovf_idx(plan, u_idx),
                                    num_segments=n_pad),
         d_pv + jax.ops.segment_sum(dzo, _ovf_idx(plan, v_idx),
                                    num_segments=n_pad)], axis=1)
    return (None, None, None, d_puv.astype(dz_p.dtype), dz_p)


_score_gate_pallas.defvjp(_score_gate_fwd, _score_gate_bwd)


def sddmm_add(a_nodes, b_nodes, e_edges, src, dst):
    """Per-edge ``a[src] + b[dst] + e`` — the generic SDDMM primitive
    (reference gated_gcn_full.py:104-105); the SymGatedGCN layer itself uses
    the fused endpoint gathers below."""
    return jnp.take(a_nodes, src, axis=0) + jnp.take(b_nodes, dst, axis=0) + e_edges


# ------------------------------------------------------------------ gated SpMM
def gated_mean_pair(gt: GraphTensors, sigma, a2h_src, a3h_dst,
                    flip: bool = False, eps: float = 1e-6,
                    backend: str | None = None):
    """Both directions of the symmetric gated-mean aggregation, slot order.

    Inputs are already-gathered per-edge values:
      a2h_src = A2h[src] (slot order), a3h_dst = A3h[dst].

    Returns (h_fwd, h_bwd) over padded nodes:
      h_fwd[i] = sum_{e: dst=i} sigma_e * a2h_src_e / (sum sigma_e + eps)
      h_bwd[i] = sum_{e: src=i} sigma_e * a3h_dst_e / (sum sigma_e + eps)
    (reference gated_gcn_full.py:111-127; ``flip`` swaps roles for the
    reversed-graph pass, train.py:165,180.)

    ``sigma`` must be zero on padded slots.
    """
    backend = backend or _DEFAULT_BACKEND
    n = gt.n_nodes_pad
    acc = jnp.float32
    d = a2h_src.shape[1]

    plan = _plan_for(gt, flip)
    if backend == "pallas" and plan is not None:
        # K2 accumulates in f32 internally; keep payloads in compute dtype
        pay_f = jnp.concatenate([sigma * a2h_src, sigma], axis=1)
        pay_b = jnp.concatenate([sigma * a3h_dst, sigma], axis=1)
        u_idx, v_idx = (gt.src, gt.dst) if not flip else (gt.dst, gt.src)
        sum_b, sum_f = _aggregate_pallas(plan, u_idx, v_idx, pay_b, pay_f)
        h_fwd = (sum_f[:, :d] / (sum_f[:, d:] + eps)).astype(a2h_src.dtype)
        h_bwd = (sum_b[:, :d] / (sum_b[:, d:] + eps)).astype(a2h_src.dtype)
        return h_fwd, h_bwd

    pay_f = jnp.concatenate([sigma * a2h_src, sigma], axis=1).astype(acc)
    pay_b = jnp.concatenate([sigma * a3h_dst, sigma], axis=1).astype(acc)
    if not flip:
        sum_f = jax.ops.segment_sum(pay_f, gt.dst, num_segments=n,
                                    indices_are_sorted=gt.dst_sorted)
        sum_b = jax.ops.segment_sum(pay_b, gt.src, num_segments=n)
    else:
        sum_f = jax.ops.segment_sum(pay_f, gt.src, num_segments=n)
        sum_b = jax.ops.segment_sum(pay_b, gt.dst, num_segments=n,
                                    indices_are_sorted=gt.dst_sorted)
    h_fwd = (sum_f[:, :d] / (sum_f[:, d:] + eps)).astype(a2h_src.dtype)
    h_bwd = (sum_b[:, :d] / (sum_b[:, d:] + eps)).astype(a2h_src.dtype)
    return h_fwd, h_bwd


def segment_sum_sorted(values, seg_ids, num_segments: int):
    """Fixed-order segment sum over pre-sorted segment ids."""
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments,
                               indices_are_sorted=True)
