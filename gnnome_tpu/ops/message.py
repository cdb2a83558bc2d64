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


def combine_block_partials(low, high, visited, n_pad: int, window: int,
                           all_visited: bool = False):
    """(low, high) [NB*W, D] per-block window partials -> [Np, D] node sums.

    Row ``b*W + j`` of ``low`` belongs to node ``b*W + j``, of ``high`` to
    node ``(b+1)*W + j``: the combine is a masked pad + shifted add over two
    CONTIGUOUS arrays — one fused elementwise pass, no strided slices (the
    old interleaved [NB*2W, D] layout cost three separate ~540 MB fusions
    per combine on the bench graph).  ``visited`` masks never-written
    (uninitialised) partial blocks; when the host-side plan proves every
    block was visited (``all_visited``), the mask pass is skipped entirely.
    """
    NB = visited.shape[0]
    D = low.shape[1]
    zero = jnp.zeros((), low.dtype)
    if all_visited:
        lm, hm = low, high
    else:
        lm = (low.reshape(NB, window, D) * visited[:, None, None]
              ).reshape(NB * window, D)
        hm = (high.reshape(NB, window, D) * visited[:, None, None]
              ).reshape(NB * window, D)
    pad = n_pad - NB * window            # == window
    res = (jax.lax.pad(lm, zero, ((0, pad, 0), (0, 0, 0)))
           + jax.lax.pad(hm, zero, ((pad, 0, 0), (0, 0, 0))))
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
    return _gate_gather_xla(u_idx, v_idx, not flip, proj_u, proj_v, b3e)


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
    return gather_uv(u_idx, v_idx, not flip, h)


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
    sl = plan.ovf_slots
    m = plan.ovf_mask.astype(g3.dtype)
    gu = jnp.take(proj_u, jnp.take(u_idx, sl), axis=0)
    gv = jnp.take(proj_v, jnp.take(v_idx, sl), axis=0)
    g3 = g3.at[sl].add(m * jnp.concatenate(
        [gu[:, :d] + gv[:, :d], gu[:, d:], gv[:, d:]], axis=1))
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


def fused_eval_edge_stage(gt: GraphTensors, proj_u, proj_v, b3e, e_in,
                          bn_scale, bn_bias, flip: bool = False):
    """EVAL-mode fused edge stage (Pallas K3): returns
    (e_out [Ep, d], sum_into_v [Np, d+1], sum_into_u [Np, d+1]) where u/v are
    the flip-resolved endpoint roles.  Requires a windowed plan; caller must
    check.  Not differentiable (inference path; the training path wraps the
    same kernel in ``fused_train_layer``'s custom VJP)."""
    plan = _plan_for(gt, flip)
    u_idx, v_idx = (gt.src, gt.dst) if not flip else (gt.dst, gt.src)
    return _eval_edge_stage(plan, u_idx, v_idx, proj_u, proj_v, b3e, e_in,
                            bn_scale, bn_bias)


def _eval_edge_stage(plan, u_idx, v_idx, proj_u, proj_v, b3e, e_in,
                     bn_scale, bn_bias):
    from .pallas_kernels import k3_fused_eval_layer

    d = b3e.shape[1]
    n_pad = plan.n_pad

    e_out, pu_lo, pu_hi, pv_lo, pv_hi = k3_fused_eval_layer(
        plan, proj_u, proj_v, b3e, e_in, bn_scale, bn_bias)
    sum_u = combine_block_partials(pu_lo, pu_hi, plan.u_visited, n_pad,
                                   plan.window, plan.u_all)
    sum_v = combine_block_partials(pv_lo, pv_hi, plan.v_visited, n_pad,
                                   plan.window, plan.v_all)

    # overflow edges: recompute the full edge stage with direct gathers
    sl = plan.ovf_slots
    m = plan.ovf_mask.astype(e_out.dtype)
    gu = jnp.take(proj_u, jnp.take(u_idx, sl), axis=0)
    gv = jnp.take(proj_v, jnp.take(v_idx, sl), axis=0)
    gate = (gu[:, :d] + gv[:, :d] + jnp.take(b3e, sl, axis=0))
    gate = gate * bn_scale + bn_bias
    gate = jax.nn.relu(gate)
    eo_ovf = gate + jnp.take(e_in, sl, axis=0)
    old = jnp.take(e_out, sl, axis=0)
    e_out = e_out.at[sl].set(m * eo_ovf + (1.0 - m) * old)
    sigma = (jax.nn.sigmoid(eo_ovf.astype(jnp.float32)) *
             plan.ovf_mask).astype(jnp.float32)
    sum_v = sum_v + jax.ops.segment_sum(
        jnp.concatenate([sigma * gu[:, d:], sigma], axis=1),
        jnp.take(v_idx, sl), num_segments=n_pad)
    sum_u = sum_u + jax.ops.segment_sum(
        jnp.concatenate([sigma * gv[:, d:], sigma], axis=1),
        jnp.take(u_idx, sl), num_segments=n_pad)
    return e_out, sum_v, sum_u



def fused_train_layer(gt: GraphTensors, proj_u, proj_v, b3e, e_in,
                      gamma, beta, flip: bool = False):
    """The WHOLE training-mode edge stage — batch statistics, BatchNorm,
    relu, residual, sigmoid, both gated aggregations — as one differentiable
    primitive with no [Ep, 3d] intermediates in HBM (reference hot path
    gated_gcn_full.py:104-127 + the torch BN batch-stat backward).

    Forward: K7 computes the gate statistics windowed (gate_raw never
    materialises), the statistics fold into one affine, and the K3 kernel
    runs the fused edge stage.  Backward: K8 re-selects everything from the
    node windows and emits d_proj window partials + [x | d_y] directly; the
    batch-statistics chain closes in node space because its per-edge term
    ``m*(c1 + c2*x)`` is linear in x (K7's [xsum | deg] partials supply the
    scatter).  Returns (e_out [Ep, d], sum_v [Np, 2d], sum_u [Np, 2d],
    mean [d], unbiased_var [d]); the mean/var outputs carry NO gradient
    (torch updates running stats under no_grad)."""
    plan = _plan_for(gt, flip)
    u_idx, v_idx = (gt.src, gt.dst) if not flip else (gt.dst, gt.src)
    return _train_layer(gt.n_edges, plan, u_idx, v_idx, gt.edge_mask,
                        proj_u, proj_v, b3e, e_in, gamma, beta)


def _train_layer_impl(n_edges, plan, u_idx, v_idx, emask, proj_u, proj_v,
                      b3e, e_in, gamma, beta):
    from .pallas_kernels import k7_gate_stats

    d = b3e.shape[1]
    n_pad = plan.n_pad
    stats, xu_lo, xu_hi, xv_lo, xv_hi = k7_gate_stats(plan, proj_u, proj_v,
                                                      b3e)
    stats = stats.reshape(plan.n_tiles, 8, d)
    s1 = stats[:, 0].sum(axis=0)
    s2 = stats[:, 1].sum(axis=0)
    xsum_u = combine_block_partials(xu_lo, xu_hi, plan.u_visited, n_pad,
                                    plan.window, plan.u_all)
    xsum_v = combine_block_partials(xv_lo, xv_hi, plan.v_visited, n_pad,
                                    plan.window, plan.v_all)
    # overflow edges: the kernel excluded them (sentinel); add their exact
    # contributions from direct gathers
    sl, m = plan.ovf_slots, plan.ovf_mask
    uo, vo = jnp.take(u_idx, sl), jnp.take(v_idx, sl)
    gu = jnp.take(proj_u, uo, axis=0)
    gv = jnp.take(proj_v, vo, axis=0)
    x_o = (gu[:, :d] + gv[:, :d]).astype(b3e.dtype) + jnp.take(b3e, sl,
                                                               axis=0)
    xf_o = x_o.astype(jnp.float32) * m
    s1 = s1 + xf_o.sum(axis=0)
    s2 = s2 + (xf_o * x_o.astype(jnp.float32)).sum(axis=0)
    pay_o = jnp.concatenate([xf_o, m * jnp.ones_like(xf_o)], axis=1)
    xsum_u = xsum_u + jax.ops.segment_sum(pay_o, uo, num_segments=n_pad)
    xsum_v = xsum_v + jax.ops.segment_sum(pay_o, vo, num_segments=n_pad)

    n = n_edges
    mean = s1 / n
    var = s2 / n - mean * mean                      # biased (normalises)
    inv = jax.lax.rsqrt(var + 1e-5)
    scale_eff = gamma * inv
    bias_eff = beta - mean * scale_eff
    unbiased = var * (n / (n - 1)) if n > 1 else var

    e_out, sum_v, sum_u = _eval_edge_stage(plan, u_idx, v_idx, proj_u,
                                           proj_v, b3e, e_in, scale_eff,
                                           bias_eff)
    out = (e_out, sum_v, sum_u, mean, unbiased)
    res = (plan, u_idx, v_idx, emask, proj_u, proj_v, b3e, e_in, gamma,
           xsum_u, xsum_v, mean, inv, scale_eff, bias_eff)
    return out, res


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _train_layer(n_edges, plan, u_idx, v_idx, emask, proj_u, proj_v,
                 b3e, e_in, gamma, beta):
    out, _ = _train_layer_impl(n_edges, plan, u_idx, v_idx, emask,
                               proj_u, proj_v, b3e, e_in, gamma, beta)
    return out


def _train_layer_fwd(n_edges, plan, u_idx, v_idx, emask, proj_u, proj_v,
                     b3e, e_in, gamma, beta):
    return _train_layer_impl(n_edges, plan, u_idx, v_idx, emask,
                             proj_u, proj_v, b3e, e_in, gamma, beta)


def _train_layer_bwd(n_edges, res, cots):
    from .pallas_kernels import k8_train_layer_bwd

    (plan, u_idx, v_idx, emask, proj_u, proj_v, b3e, e_in, gamma,
     xsum_u, xsum_v, mean, inv, scale_eff, bias_eff) = res
    # mean/unbiased-var cotangents are dropped: running-stat updates carry no
    # gradient (torch semantics — they happen under no_grad)
    d_e_out, d_sum_v, d_sum_u, _dm, _dv = cots
    dt = b3e.dtype
    d = b3e.shape[1]
    n_pad = plan.n_pad

    # cast BEFORE the kernel: bf16 node-window DMAs are ~2x cheaper (no-op in
    # f32 mode); padded slots carry sentinel one-hots -> zero selects
    xdy, d_e_in, pu_lo, pu_hi, pv_lo, pv_hi = k8_train_layer_bwd(
        plan, d_sum_u.astype(dt), d_sum_v.astype(dt), proj_u, proj_v,
        b3e, e_in, d_e_out, scale_eff, bias_eff)
    d_pu = combine_block_partials(pu_lo, pu_hi, plan.u_visited, n_pad,
                                  plan.window, plan.u_all)
    d_pv = combine_block_partials(pv_lo, pv_hi, plan.v_visited, n_pad,
                                  plan.window, plan.v_all)

    # ---- overflow patch: recompute forward + adjoint with direct gathers
    sl, m = plan.ovf_slots, plan.ovf_mask
    uo, vo = jnp.take(u_idx, sl), jnp.take(v_idx, sl)
    gu = jnp.take(proj_u, uo, axis=0)
    gv = jnp.take(proj_v, vo, axis=0)
    x_o = (gu[:, :d] + gv[:, :d]).astype(dt) + jnp.take(b3e, sl, axis=0)
    gaff = x_o * scale_eff.astype(dt) + bias_eff.astype(dt)
    relu_m = (gaff > 0).astype(jnp.float32)
    eo = jax.nn.relu(gaff) + jnp.take(e_in, sl, axis=0)
    sigma = jax.nn.sigmoid(eo.astype(jnp.float32))
    du_o = jnp.take(d_sum_u.astype(dt), uo, axis=0).astype(jnp.float32) * m
    dv_o = jnp.take(d_sum_v.astype(dt), vo, axis=0).astype(jnp.float32) * m
    a2u = gu[:, d:].astype(jnp.float32)
    a3v = gv[:, d:].astype(jnp.float32)
    d_sigma = (dv_o[:, :d] * a2u + dv_o[:, d:]
               + du_o[:, :d] * a3v + du_o[:, d:])
    d_eo_x = d_sigma * sigma * (1.0 - sigma)
    d_y_o = ((jnp.take(d_e_out, sl, axis=0).astype(jnp.float32) + d_eo_x)
             * relu_m * m)
    new_row = jnp.concatenate([x_o.astype(jnp.float32), d_y_o], axis=1)
    old_row = jnp.take(xdy, sl, axis=0).astype(jnp.float32)
    xdy = xdy.at[sl].set(jnp.where(m > 0, new_row, old_row).astype(dt))
    d_e_in = d_e_in.at[sl].add((m * d_eo_x).astype(dt))
    d_pu = d_pu + jax.ops.segment_sum(
        jnp.concatenate([d_y_o * scale_eff, sigma * dv_o[:, :d]], axis=1),
        uo, num_segments=n_pad)
    d_pv = d_pv + jax.ops.segment_sum(
        jnp.concatenate([d_y_o * scale_eff, sigma * du_o[:, :d]], axis=1),
        vo, num_segments=n_pad)

    # ---- batch-statistics chain, closed from [x | d_y] + the K7 partials
    x = xdy[:, :d].astype(jnp.float32)
    dy = xdy[:, d:].astype(jnp.float32)
    dym = dy * emask
    A = dym.sum(axis=0)                             # d_bias_eff
    B = (dym * x).sum(axis=0)                       # d_scale_eff (pre-chain)
    g_term = B - mean * A
    d_gamma = inv * g_term
    d_beta = A
    d_var = -0.5 * (inv ** 3) * (gamma * g_term)
    d_mean = -A * scale_eff - 2.0 * mean * d_var
    c1 = d_mean / n_edges
    c2 = 2.0 * d_var / n_edges
    d_b3e = (dy * scale_eff + emask * (c1 + c2 * x)).astype(dt)
    # node-space stats term: sum_e m*(c1 + c2*x) into each endpoint =
    # c1*deg + c2*xsum (K7's [xsum | deg] partials)
    zu = c2 * xsum_u[:, :d] + c1 * xsum_u[:, d:]
    zv = c2 * xsum_v[:, :d] + c1 * xsum_v[:, d:]
    d_pu = d_pu + jnp.concatenate([zu, jnp.zeros_like(zu)], axis=1)
    d_pv = d_pv + jnp.concatenate([zv, jnp.zeros_like(zv)], axis=1)

    return (None, None, None, None, d_pu.astype(dt), d_pv.astype(dt),
            d_b3e, d_e_in.astype(e_in.dtype),
            d_gamma.astype(gamma.dtype), d_beta.astype(gamma.dtype))


_train_layer.defvjp(_train_layer_fwd, _train_layer_bwd)


@jax.custom_vjp
def _aggregate_pallas(plan, u_idx, v_idx, pay_u, pay_v):
    """(sum_b [Np, Dp] into u_idx, sum_f [Np, Dp] into v_idx) from edge
    payloads via per-tile window partials + a small combine segment-sum."""
    from .pallas_kernels import k2_aggregate

    n_pad = plan.n_pad
    pu_lo, pu_hi, pv_lo, pv_hi = k2_aggregate(plan, pay_u, pay_v)
    sum_b = combine_block_partials(pu_lo, pu_hi, plan.u_visited, n_pad,
                                   plan.window, plan.u_all)
    sum_f = combine_block_partials(pv_lo, pv_hi, plan.v_visited, n_pad,
                                   plan.window, plan.v_all)
    # overflow contributions
    sl, m = plan.ovf_slots, plan.ovf_mask
    sum_b = sum_b + jax.ops.segment_sum(
        jnp.take(pay_u, sl, axis=0) * m, jnp.take(u_idx, sl),
        num_segments=n_pad)
    sum_f = sum_f + jax.ops.segment_sum(
        jnp.take(pay_v, sl, axis=0) * m, jnp.take(v_idx, sl),
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


def fused_score_gate(gt: GraphTensors, flip: bool, pu, pv, be):
    """``relu(pu[u] + pv[v] + be)`` for the score predictor's first layer
    (Pallas K6): endpoint gathers, the three-way add and the relu in one
    windowed pass.  ``pu``/``pv`` are the [Np, H] node pre-projections
    ``h @ W1u`` / ``h @ W1v``; ``be`` = ``e @ W1e + b1`` in slot order.
    Requires a windowed plan; the caller checks."""
    plan = _plan_for(gt, flip)
    u_idx, v_idx = (gt.src, gt.dst) if not flip else (gt.dst, gt.src)
    return _score_gate_pallas(plan, u_idx, v_idx, pu, pv, be)


@jax.custom_vjp
def _score_gate_pallas(plan, u_idx, v_idx, pu, pv, be):
    from .pallas_kernels import k6_score_gate

    z = k6_score_gate(plan, pu, pv, be)
    # overflow slots: recompute with direct gathers
    sl = plan.ovf_slots
    m = plan.ovf_mask.astype(z.dtype)
    zo = jax.nn.relu(jnp.take(pu, jnp.take(u_idx, sl), axis=0)
                     + jnp.take(pv, jnp.take(v_idx, sl), axis=0)
                     + jnp.take(be, sl, axis=0))
    old = jnp.take(z, sl, axis=0)
    return z.at[sl].set(m * zo + (1.0 - m) * old)


def _score_gate_fwd(plan, u_idx, v_idx, pu, pv, be):
    z = _score_gate_pallas(plan, u_idx, v_idx, pu, pv, be)
    return z, (plan, u_idx, v_idx, z)


def _score_gate_bwd(res, dz):
    plan, u_idx, v_idx, z = res
    dz = dz * (z > 0).astype(dz.dtype)
    # adjoint of the two windowed selects = the K2 dual scatter
    d_pu, d_pv = _aggregate_pallas(plan, u_idx, v_idx, dz, dz)
    return (None, None, None, d_pu.astype(dz.dtype), d_pv.astype(dz.dtype),
            dz)


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
                                    indices_are_sorted=True)
        sum_b = jax.ops.segment_sum(pay_b, gt.src, num_segments=n)
    else:
        sum_f = jax.ops.segment_sum(pay_f, gt.src, num_segments=n)
        sum_b = jax.ops.segment_sum(pay_b, gt.dst, num_segments=n,
                                    indices_are_sorted=True)
    h_fwd = (sum_f[:, :d] / (sum_f[:, d:] + eps)).astype(a2h_src.dtype)
    h_bwd = (sum_b[:, :d] / (sum_b[:, d:] + eps)).astype(a2h_src.dtype)
    return h_fwd, h_bwd


def segment_sum_sorted(values, seg_ids, num_segments: int):
    """Fixed-order segment sum over pre-sorted segment ids."""
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments,
                               indices_are_sorted=True)
