"""SymGatedGCN edge-scoring model in functional JAX.

Faithful TPU-native re-derivation of the reference model
(models/full_graph.py:9-30 + layers/gated_gcn_full.py:8-142 +
layers/score_predictor.py:5-24), with the math restructured for XLA/TPU:

* the six per-layer 64x64 projections run as ONE fused [64, 5*64] matmul on
  the MXU, with the output columns grouped so each edge endpoint needs exactly
  one 128-wide row gather per layer (row gathers are the cost driver on TPU;
  128-wide rows cost the same as 64-wide — measured);
* edges stay in dst-sorted *slot order* through all layers (GraphTensors):
  forward aggregation = sorted segment-sum, backward = unsorted segment-sum,
  zero runtime permutations; host edge order is restored only at the output;
* the per-edge gate is computed **once**: on the original graph the forward
  gate ``bn(B1h[src] + B2h[dst] + B3e)`` and the backward gate (computed on
  ``dgl.reverse`` in the reference, gated_gcn_full.py:117-119) are the *same
  tensor* — identical outputs, half the work (running BN stats still advance
  twice to match torch training semantics);
* the 8 layers run under ``lax.scan`` over stacked parameters (one compiled
  layer body), optionally rematerialised;
* optional bfloat16 compute (gathers/matmuls/gates) with float32 BatchNorm and
  float32 segment-sum accumulation — parity mode is pure float32.

The symmetry-loss "reversed graph" pass (reference train.py:159-185) is the
same function with ``flip=True`` — src/dst roles swap, no data movement.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.graph_tensors import GraphTensors
from ..ops.message import gated_mean_pair
from .nn import linear, linear_init, mlp2, mlp2_init, dropout
from .norm import norm_init, bn_state_init, apply_norm

GATE_EPS = 1e-6  # gated-mean denominator epsilon (reference gated_gcn_full.py:114)


def _unroll_layers(backend, remat) -> bool:
    """Python-unrolled layer loop instead of ``lax.scan`` on the hot path.

    A scan's autodiff saves per-layer residuals by dynamic-update-slicing
    them into stacked ``[L, ...]`` buffers and re-slicing per iteration in
    the backward — at bench scale that is ~[L, Ep/2, 2d] of pure stacking
    DMA (the "scan carry DUS" glue in the round-4 device trace).  Unrolling
    keeps each layer's residuals as separate buffers: same memory, zero
    stacking traffic, and XLA fuses across layer boundaries.  Off for
    remat='full' (the sqrt(L) group schedule needs the scan's O(G+g) carry
    memory) and for the XLA backend (CPU tests/product keep the
    bounded-compile-size scan).  GN_UNROLL_LAYERS=0/1 overrides."""
    if remat == "full":
        return False
    import os
    v = os.environ.get("GN_UNROLL_LAYERS", "auto")
    if v in ("0", "false"):
        return False
    if v in ("1", "true"):
        return True
    return backend == "pallas"


def _scan_unrolled(body, carry, xs, n: int):
    """``lax.scan(body, carry, xs)`` as a Python loop (static trip count)."""
    sts = []
    for i in range(n):
        inp = jax.tree_util.tree_map(lambda a: a[i], xs)
        carry, st = body(carry, inp)
        sts.append(st)
    st = jax.tree_util.tree_map(lambda *a: jnp.stack(a, axis=0), *sts)
    return carry, st


def _nn(gt: GraphTensors):
    """Real node count for normalisation math — the TRACED 0-d leaf when the
    graph carries one (so shape-bucketed units share compiled programs,
    tests/test_compile_buckets.py), else the static int."""
    return gt.nn_valid if gt.nn_valid is not None else gt.n_nodes


def _ne(gt: GraphTensors):
    return gt.ne_valid if gt.ne_valid is not None else gt.n_edges


# ------------------------------------------------------------------------ init
def init_params(rng: jax.Array, cfg: ModelConfig):
    """(params, state) pytrees.  GNN-layer leaves are stacked on axis 0."""
    d = cfg.dim_latent
    keys = jax.random.split(rng, 4 + cfg.num_gnn_layers)
    params = {
        "node_encoder": mlp2_init(keys[0], cfg.node_features,
                                  cfg.hidden_ne_features, d),
        "edge_encoder": mlp2_init(keys[1], cfg.edge_features,
                                  cfg.hidden_ne_features, d),
        "gnn": _stack([_layer_init(keys[4 + i], d)
                       for i in range(cfg.num_gnn_layers)]),
        "predictor": _predictor_init(keys[2], d, cfg.hidden_edge_scores),
    }
    state = {"gnn": _stack([_layer_state_init(d)
                            for _ in range(cfg.num_gnn_layers)])}
    return params, state


def _layer_init(rng, d):
    ks = jax.random.split(rng, 6)
    p = {name: linear_init(k, d, d)
         for name, k in zip(("A1", "A2", "A3", "B1", "B2", "B3"), ks)}
    p["bn_h"] = norm_init(d)
    p["bn_e"] = norm_init(d)
    return p


def _layer_state_init(d):
    return {"bn_h": bn_state_init(d), "bn_e": bn_state_init(d)}


def _predictor_init(rng, d, hidden):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {"W1": linear_init(k1, 3 * d, hidden),
            "W2": linear_init(k2, hidden, 32),
            "W3": linear_init(k3, 32, 1)}


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


# ----------------------------------------------------------------------- layer
def sym_gated_gcn_layer(p, s, gt: GraphTensors, h, e, *, training: bool,
                        flip: bool, norm: str, drop_rate: float,
                        rng: Optional[jax.Array], backend: Optional[str],
                        dtype=jnp.float32, packed: bool = False,
                        remat_node: bool = False):
    """One SymGatedGCN layer (reference gated_gcn_full.py:82-142).
    ``h`` node space; ``e`` edge SLOT space — PACKED [Ep/2, 2d] when
    ``packed`` (the fused Pallas mode, see ops/message.py), else [Ep, d].

    ``remat_node=True`` (the fused-training remat mode): only the NODE stage
    is checkpointed.  The edge stage is a custom-VJP primitive whose saved
    state is tiny (see message.fused_train_stage), so rematerialising it
    would only re-run the expensive K7/K3 kernels for nothing."""
    h_in, e_in = h, e
    d = h.shape[1]

    a1h = None
    if not (packed and training):
        # fused projection; column groups: [B1|A2] (message-source endpoint),
        # [B2|A3] (target endpoint), [A1] (self)
        w = jnp.concatenate([p["B1"]["w"], p["A2"]["w"], p["B2"]["w"],
                             p["A3"]["w"], p["A1"]["w"]], axis=1).astype(dtype)
        b = jnp.concatenate([p["B1"]["b"], p["A2"]["b"], p["B2"]["b"],
                             p["A3"]["b"], p["A1"]["b"]]).astype(dtype)
        proj = h @ w + b
        a1h = proj[:, 4 * d:]

        w3 = p["B3"]["w"].astype(dtype)
        b3 = p["B3"]["b"].astype(dtype)
        if packed:
            # packed edges stay packed: e_p @ blockdiag(W3, W3) is the exact
            # per-edge e @ W3 (and HALF the [*, 128]-tile MXU passes of the
            # unpacked [Ep, 64] matmul)
            zero = jnp.zeros_like(w3)
            wbd = jnp.concatenate(
                [jnp.concatenate([w3, zero], axis=1),
                 jnp.concatenate([zero, w3], axis=1)], axis=0)
            b3e = e @ wbd + jnp.concatenate([b3, b3])
        else:
            b3e = e @ w3 + b3

    if packed and not training:
        # whole edge stage in one fused Pallas pass (eval BN = affine)
        from ..ops.message import fused_eval_edge_stage
        bn_e_scale = (p["bn_e"]["scale"]
                      * jax.lax.rsqrt(s["bn_e"]["var"] + 1e-5)).astype(dtype)
        bn_e_bias = (p["bn_e"]["bias"]
                     - s["bn_e"]["mean"] * bn_e_scale).astype(dtype)
        e_out, sum_v, sum_u = fused_eval_edge_stage(
            gt, proj[:, : 2 * d], proj[:, 2 * d: 4 * d], b3e, e_in,
            bn_e_scale, bn_e_bias, flip=flip)
        s_bn_e = s["bn_e"]
    elif packed:
        # training: the whole edge stage (endpoint projections -> windowed
        # batch statistics -> affine -> relu -> residual -> sigmoid -> dual
        # aggregation) is ONE custom-VJP primitive with fused Pallas forward
        # (K7+K3) and backward (K8) — no [Ep, 3d] gate/message arrays ever
        # reach HBM, and the backward never re-runs the forward kernels.  BN
        # semantics match norm.batch_norm exactly: biased batch var
        # normalises, unbiased updates the running stats TWICE (the
        # reference's shared bn_e quirk, gated_gcn_full.py:106,119),
        # momentum 0.1, gradients flow through the batch statistics (torch
        # BN training semantics).
        from ..ops.message import fused_train_stage
        w_uv = jnp.concatenate([p["B1"]["w"], p["A2"]["w"], p["B2"]["w"],
                                p["A3"]["w"]], axis=1).astype(dtype)
        b_uv = jnp.concatenate([p["B1"]["b"], p["A2"]["b"], p["B2"]["b"],
                                p["A3"]["b"]]).astype(dtype)
        w3 = p["B3"]["w"].astype(dtype)
        zero = jnp.zeros_like(w3)
        wbd = jnp.concatenate(
            [jnp.concatenate([w3, zero], axis=1),
             jnp.concatenate([zero, w3], axis=1)], axis=0)
        b3b = jnp.concatenate([p["B3"]["b"], p["B3"]["b"]]).astype(dtype)
        e_out, sum_v, sum_u, mean, unbiased = fused_train_stage(
            gt, h, w_uv, b_uv, wbd, b3b, e,
            p["bn_e"]["scale"], p["bn_e"]["bias"], flip=flip)
        rm, rv = s["bn_e"]["mean"], s["bn_e"]["var"]
        for _ in range(2):
            rm = 0.9 * rm + 0.1 * mean
            rv = 0.9 * rv + 0.1 * unbiased
        s_bn_e = {"mean": rm, "var": rv, "count": s["bn_e"]["count"] + 2}
    else:
        from ..ops.message import fused_gate_gather
        # fused endpoint gathers + gate (reference gated_gcn_full.py:104-105);
        # Pallas windowed kernels when the graph carries a plan, XLA otherwise
        gate, a2h_u, a3h_v = fused_gate_gather(gt, proj[:, : 2 * d],
                                               proj[:, 2 * d: 4 * d], b3e,
                                               flip=flip, backend=backend)

        gate, s_bn_e = apply_norm(norm, p["bn_e"], s["bn_e"], gate,
                                  gt.edge_mask, _ne(gt), training,
                                  repeat_updates=2)
        gate = jax.nn.relu(gate)
        e_out = gate + e_in          # residual (reference :108-109)

        sigma = jax.nn.sigmoid(e_out) * gt.edge_mask.astype(dtype)
        h_fwd, h_bwd = gated_mean_pair(gt, sigma, a2h_u, a3h_v, flip=flip,
                                       eps=GATE_EPS, backend=backend)
        sum_v = sum_u = None

    def node_stage(p_a1, p_bn_h, s_bn_h_in, h_res, sum_v_, sum_u_, key):
        if sum_v_ is not None:      # fused paths: gated means from the sums
            hf = (sum_v_[:, :d] / (sum_v_[:, d:] + GATE_EPS)).astype(dtype)
            hb = (sum_u_[:, :d] / (sum_u_[:, d:] + GATE_EPS)).astype(dtype)
        else:
            hf, hb = h_fwd, h_bwd
        if a1h is not None:
            a1 = a1h
        else:                       # fused training: A1h is its own matmul
            a1 = h_res @ p_a1["w"].astype(dtype) + p_a1["b"].astype(dtype)
        h_new = a1 + hf + hb
        h_new, s_bn_h = apply_norm(norm, p_bn_h, s_bn_h_in, h_new,
                                   gt.node_mask, _nn(gt), training,
                                   repeat_updates=1)
        h_new = jax.nn.relu(h_new)
        h_new = h_new + h_res
        if training and drop_rate > 0.0 and key is not None:
            h_new = dropout(key, h_new, drop_rate)
        return h_new, s_bn_h

    if remat_node:
        node_stage = jax.checkpoint(node_stage)
    h_new, s_bn_h = node_stage(p["A1"], p["bn_h"], s["bn_h"], h_in,
                               sum_v, sum_u, rng)
    return h_new, e_out, {"bn_h": s_bn_h, "bn_e": s_bn_e}


# -------------------------------------------------------------- dual-pass mode
# The symmetry loss runs the model twice — org graph and flipped roles
# (reference train.py:159-185).  The windowed kernels are completely
# role-symmetric AND width-generic: gate = u_window_sel + v_window_sel,
# scatter_u = [sigma * v_msg | sigma], scatter_v = [sigma * u_msg | sigma] —
# which projection lives in which window column is entirely the caller's
# choice.  So BOTH passes fuse into ONE kernel pass at double feature width:
# u-window = [B1·h_org | B2·h_flip | A2·h_org | A3·h_flip] (the flip pass's
# gate source at u=src is its B2, because src is the flip graph's dst), and
# the org/flip lanes ride the same one-hots, the same dots, the same edge
# streams.  Same MACs as two passes; HALF the kernel calls, one-hot builds,
# index DMA, and per-dot overhead — and the row-stacked elementwise tensors
# become [*, 128] (full lane occupancy) instead of [*, 64].


def _bd(a, b):
    """Block-diagonal [[a, 0], [0, b]]."""
    za = jnp.zeros((a.shape[0], b.shape[1]), a.dtype)
    zb = jnp.zeros((b.shape[0], a.shape[1]), b.dtype)
    return jnp.concatenate([jnp.concatenate([a, za], axis=1),
                            jnp.concatenate([zb, b], axis=1)], axis=0)


def _bd4(w):
    """4-block-diagonal of one matrix (dual-PACKED edge arrays: lanes are
    [e_2r org | e_2r flip | e_2r+1 org | e_2r+1 flip])."""
    return _bd(_bd(w, w), _bd(w, w))


def _dual_wuv(p, dtype):
    """Dual endpoint-projection weights: h_dual [Np, 2d] (org | flip halves)
    @ w_uv -> [B1h_o | B2h_f | A2h_o | A3h_f | B2h_o | B1h_f | A3h_o | A2h_f]
    (u-window gate, u msg, v gate, v msg — each org|flip)."""
    def w(n):
        return p[n]["w"].astype(dtype)

    def b(n):
        return p[n]["b"].astype(dtype)

    w_uv = jnp.concatenate([_bd(w("B1"), w("B2")), _bd(w("A2"), w("A3")),
                            _bd(w("B2"), w("B1")), _bd(w("A3"), w("A2"))],
                           axis=1)
    b_uv = jnp.concatenate([b("B1"), b("B2"), b("A2"), b("A3"),
                            b("B2"), b("B1"), b("A3"), b("A2")])
    return w_uv, b_uv


def _layer_dual(p, s, gt: GraphTensors, h, e, *, training: bool,
                drop_rate: float, rng, dtype, remat_node: bool):
    """One SymGatedGCN layer over BOTH symmetry passes: ``h`` [Np, 2d]
    (org | flip), ``e`` dual-PACKED [Ep/2, 4d].  Fused Pallas only
    (norm='batch'); reference per-pass semantics bit-level preserved —
    see forward_dual."""
    from ..ops.message import fused_train_stage, fused_eval_edge_stage
    from .norm import batch_norm_dual

    h_in = h
    d = h.shape[1] // 2
    w3 = p["B3"]["w"].astype(dtype)
    wbd3 = _bd4(w3)
    b3b = jnp.concatenate([p["B3"]["b"]] * 4).astype(dtype)

    if training:
        w_uv, b_uv = _dual_wuv(p, dtype)
        gamma2 = jnp.concatenate([p["bn_e"]["scale"]] * 2)
        beta2 = jnp.concatenate([p["bn_e"]["bias"]] * 2)
        e_out, sum_v, sum_u, mean2, unb2 = fused_train_stage(
            gt, h, w_uv, b_uv, wbd3, b3b, e, gamma2, beta2, flip=False)
        # bn_e running chain: the org pass's two updates, THEN the flip
        # pass's two (sequential torch forwards through the shared module)
        rm, rv = s["bn_e"]["mean"], s["bn_e"]["var"]
        for half in (slice(0, d), slice(d, 2 * d)):
            for _ in range(2):
                rm = 0.9 * rm + 0.1 * mean2[half]
                rv = 0.9 * rv + 0.1 * unb2[half]
        s_bn_e = {"mean": rm, "var": rv, "count": s["bn_e"]["count"] + 4}
    else:
        w_uv, b_uv = _dual_wuv(p, dtype)
        proj = h @ w_uv + b_uv
        b3e = e @ wbd3 + b3b
        # cast discipline identical to the single-pass eval path (forward)
        scale = (p["bn_e"]["scale"]
                 * jax.lax.rsqrt(s["bn_e"]["var"] + 1e-5)).astype(dtype)
        bias = (p["bn_e"]["bias"] - s["bn_e"]["mean"] * scale).astype(dtype)
        e_out, sum_v, sum_u = fused_eval_edge_stage(
            gt, proj[:, : 4 * d], proj[:, 4 * d:], b3e, e,
            jnp.concatenate([scale] * 2), jnp.concatenate([bias] * 2),
            flip=False)
        s_bn_e = s["bn_e"]

    def node_stage(p_a1, p_bn_h, s_bn_h_in, h_res, sum_v_, sum_u_, key):
        # sum arrays are [Np, 4d] = [m_org | m_flip | sig_org | sig_flip];
        # the flip pass's forward aggregation keys by src (its dst role)
        def gm(a, half):
            return (a[:, half * d:(half + 1) * d]
                    / (a[:, (2 + half) * d:(3 + half) * d]
                       + GATE_EPS)).astype(dtype)

        hf = jnp.concatenate([gm(sum_v_, 0), gm(sum_u_, 1)], axis=1)
        hb = jnp.concatenate([gm(sum_u_, 0), gm(sum_v_, 1)], axis=1)
        a1w = p_a1["w"].astype(dtype)
        a1 = h_res @ _bd(a1w, a1w) + jnp.concatenate(
            [p_a1["b"]] * 2).astype(dtype)
        h_new = a1 + hf + hb
        h_new, s_bn_h = batch_norm_dual(p_bn_h, s_bn_h_in, h_new,
                                        gt.node_mask, _nn(gt), training,
                                        repeat_updates=1)
        h_new = jax.nn.relu(h_new)
        h_new = h_new + h_res
        if training and drop_rate > 0.0 and key is not None:
            h_new = dropout(key, h_new, drop_rate)
        return h_new, s_bn_h

    if remat_node:
        node_stage = jax.checkpoint(node_stage)
    h_new, s_bn_h = node_stage(p["A1"], p["bn_h"], s["bn_h"], h_in,
                               sum_v, sum_u, rng)
    return h_new, e_out, {"bn_h": s_bn_h, "bn_e": s_bn_e}


def score_edges_dual(p, gt: GraphTensors, h, e, *, dtype=jnp.float32):
    """Both passes' edge logits in one windowed pass: ``h`` [Np, 2d]
    (org | flip), ``e`` dual-packed [Ep/2, 4d].  Returns [Ep, 2] slot-order
    logits (column 0 org, column 1 flip).  The whole predictor stays packed
    (K6 at doubled hidden width + 4-block-diagonal tail matmuls)."""
    from ..ops.message import fused_score_gate

    d = h.shape[1] // 2
    w1 = p["W1"]["w"].astype(dtype)
    b1 = p["W1"]["b"].astype(dtype)
    w2 = p["W2"]["w"].astype(dtype)
    b2 = p["W2"]["b"].astype(dtype)
    h_org, h_flip = h[:, :d], h[:, d:]
    # u-window section = [org src-proj | flip's dst-proj] (u IS the flip dst)
    puv = jnp.concatenate(
        [h_org @ w1[:d], h_flip @ w1[d: 2 * d],
         h_org @ w1[d: 2 * d], h_flip @ w1[:d]], axis=1)
    be_p = e @ _bd4(w1[2 * d:]) + jnp.concatenate([b1] * 4)
    z_p = fused_score_gate(gt, False, puv, be_p)
    z = jax.nn.relu(z_p @ _bd4(w2) + jnp.concatenate([b2] * 4))
    lp = z @ _bd4(p["W3"]["w"].astype(dtype)) + p["W3"]["b"].astype(dtype)
    return lp.reshape(lp.shape[0] * 2, 2)


# above this padded edge count the dual pass's doubled carry width
# ([Ep/2, 4d] per layer) no longer fits the sqrt(L)-group remat="full"
# memory model on a 16 GB chip (measured: 4.8M edges wants ~26 GB); the two
# sequential passes (outer nothing-saveable checkpoint => only ONE pass's
# carries alive at a time) hold 6.3M edges there (round-2 measurement)
DUAL_FULL_REMAT_MAX_EDGES = 3_000_000
_DECLINE_WARNED: set = set()


def _warn_dual_decline(reason: str) -> None:
    """One-line, once-per-reason notice when the fused dual-pass path is
    declined — without it a config like norm='layer' silently loses the
    fused speedup and perf triage at user sites is guesswork."""
    if reason not in _DECLINE_WARNED:
        _DECLINE_WARNED.add(reason)
        print(f"[gnnome_tpu] fused dual-pass path declined: {reason} "
              "(running the two sequential symmetry passes)")


def forward_dual(params, state, gt: GraphTensors, x, x_rev, e,
                 cfg: ModelConfig, *, training: bool = False,
                 rng: Optional[jax.Array] = None,
                 backend: Optional[str] = None, remat: bool = False,
                 dtype=jnp.float32, slot_io: bool = False, **_):
    """Run BOTH symmetry-loss passes (reference train.py:159-185) as ONE
    dual-width fused pass.  Returns (logits_org [Ep, 1], logits_rev [Ep, 1],
    new_state) — bit-level equivalent to forward(flip=False) followed by
    forward(flip=True) with chained state, modulo dropout masks (one dual
    draw instead of two per-pass draws) and f32 reduction fusion order.

    Falls back to the two sequential passes whenever the fused path is
    unavailable (non-pallas backend, layer norm, no windowed plan) or would
    not fit (remat='full' beyond DUAL_FULL_REMAT_MAX_EDGES)."""
    from ..ops.message import _plan_for, pack_edges
    from ..ops.pallas_kernels import _interpret

    fused = True
    if backend != "pallas":
        fused = False
        _warn_dual_decline(f"backend={backend!r} (pallas required)")
    elif cfg.normalization != "batch":
        fused = False
        _warn_dual_decline(f"normalization={cfg.normalization!r} "
                           "(batch required)")
    elif not (dtype in (jnp.bfloat16, jnp.float32) or _interpret()):
        fused = False
        _warn_dual_decline(f"dtype={dtype} unsupported on hardware")
    elif _plan_for(gt, False) is None:
        fused = False
        _warn_dual_decline("graph has no windowed plan")
    elif remat == "full" and gt.n_edges_pad > DUAL_FULL_REMAT_MAX_EDGES:
        fused = False
        _warn_dual_decline(
            f"remat='full' at {gt.n_edges_pad} padded edges exceeds the "
            f"dual carry budget ({DUAL_FULL_REMAT_MAX_EDGES}); sequential "
            "passes keep the proven single-pass memory model")
    if not fused:
        k1, k2 = (jax.random.split(rng) if rng is not None else (None, None))
        lo, st = forward(params, state, gt, x, e, cfg, training=training,
                         flip=False, rng=k1, backend=backend, remat=remat,
                         dtype=dtype, slot_io=slot_io)
        lr, st = forward(params, st, gt, x_rev, e, cfg, training=training,
                         flip=True, rng=k2, backend=backend, remat=remat,
                         dtype=dtype, slot_io=slot_io)
        return lo, lr, st

    h = jnp.concatenate([mlp2(params["node_encoder"], x),
                         mlp2(params["node_encoder"], x_rev)],
                        axis=1).astype(dtype)
    e = mlp2(params["edge_encoder"], e).astype(dtype)
    if not slot_io:
        e = gt.edges_to_slots(e)
    e = pack_edges(jnp.concatenate([e, e], axis=1))     # [Ep/2, 4d]

    num_layers = jax.tree_util.tree_leaves(params["gnn"])[0].shape[0]
    layer_fn = partial(_layer_dual, training=training,
                       drop_rate=cfg.dropout, dtype=dtype,
                       remat_node=training and bool(remat))

    def body(carry, inp):
        h, e = carry
        p_l, s_l, key_l = inp
        h, e, new_s = layer_fn(p_l, s_l, gt, h, e, rng=key_l)
        return (h, e), new_s

    keys = (jax.random.split(rng, num_layers) if rng is not None
            else jnp.zeros((num_layers, 2), jnp.uint32))
    xs = (params["gnn"], state["gnn"], keys)

    # sqrt(L) group remat for the large-graph mode (see forward); the dual
    # carries are already lane-full ([Np, 2d=128] / [Ep/2, 4d=256])
    group = 1
    if remat == "full":
        group = max((g for g in range(1, num_layers + 1)
                     if num_layers % g == 0 and g * g <= num_layers),
                    default=1)
    if group > 1:
        n_groups = num_layers // group
        gxs = jax.tree_util.tree_map(
            lambda a: a.reshape(n_groups, group, *a.shape[1:]), xs)

        @jax.checkpoint
        def group_body(carry, ginp):
            return jax.lax.scan(body, carry, ginp)

        def run_layers(h, e):
            (h, e), st = jax.lax.scan(group_body, (h, e), gxs)
            st = jax.tree_util.tree_map(
                lambda a: a.reshape(num_layers, *a.shape[2:]), st)
            return (h, e), st
        run_layers = jax.checkpoint(
            run_layers, policy=jax.checkpoint_policies.nothing_saveable)
    elif _unroll_layers("pallas", remat):
        def run_layers(h, e):
            return _scan_unrolled(body, (h, e), xs, num_layers)
    else:
        def run_layers(h, e):
            return jax.lax.scan(body, (h, e), xs)

    (h, e), new_gnn_state = run_layers(h, e)

    predict = partial(score_edges_dual, params["predictor"], gt, dtype=dtype)
    if remat:
        predict = jax.checkpoint(predict)
    scores = predict(h, e)
    if not slot_io:
        scores = gt.slots_to_edges(scores)
    return (scores[:, :1].astype(jnp.float32),
            scores[:, 1:].astype(jnp.float32), {"gnn": new_gnn_state})


# ----------------------------------------------------------------------- model
def score_edges(p, gt: GraphTensors, h, e, *, flip: bool = False,
                dtype=jnp.float32, backend: Optional[str] = None,
                packed: bool = False):
    """Edge logits from final node/edge states, slot order
    (reference layers/score_predictor.py:12-24).  ``flip`` swaps endpoint
    roles for the reversed-graph pass.  ``packed``: ``e`` is the packed
    [Ep/2, 2d] fused-mode carry; the whole first predictor layer then runs
    packed (K6 + block-diagonal matmuls, no 128-lane padding) and edges
    unpack only at the narrow [Ep, 32] second layer."""
    from ..ops.message import (gather_uv_planned, fused_score_gate,
                               unpack_edges)

    d = h.shape[1]
    w1 = p["W1"]["w"].astype(dtype)
    b1 = p["W1"]["b"].astype(dtype)
    w2 = p["W2"]["w"].astype(dtype)
    b2 = p["W2"]["b"].astype(dtype)
    if packed:
        # K6: pre-project the endpoint parts in NODE space (row gathers cost
        # the same at any width <= 128, so gather-after-matmul moves the
        # [Ep,3d]x[3d,H] matmul to [Np,d]x[d,H] and fuses both gathers, the
        # add and the relu into one windowed pass
        puv = jnp.concatenate([h @ w1[:d], h @ w1[d: 2 * d]], axis=1)
        w1e = w1[2 * d:]
        zero = jnp.zeros_like(w1e)
        wbd1 = jnp.concatenate(
            [jnp.concatenate([w1e, zero], axis=1),
             jnp.concatenate([zero, w1e], axis=1)], axis=0)
        be_p = e @ wbd1 + jnp.concatenate([b1, b1])
        z_p = fused_score_gate(gt, flip, puv, be_p)
        zero2 = jnp.zeros_like(w2)
        wbd2 = jnp.concatenate(
            [jnp.concatenate([w2, zero2], axis=1),
             jnp.concatenate([zero2, w2], axis=1)], axis=0)
        z = unpack_edges(jax.nn.relu(z_p @ wbd2 + jnp.concatenate([b2, b2])))
    else:
        h_src, h_dst = gather_uv_planned(gt, flip, h, backend=backend)
        z = jnp.concatenate([h_src, h_dst, e], axis=1)
        z = jax.nn.relu(z @ w1 + b1)
        z = jax.nn.relu(z @ w2 + b2)
    return z @ p["W3"]["w"].astype(dtype) + p["W3"]["b"].astype(dtype)


def forward(params, state, gt: GraphTensors, x, e, cfg: ModelConfig, *,
            training: bool = False, flip: bool = False,
            rng: Optional[jax.Array] = None, backend: Optional[str] = None,
            remat: bool = False, dtype=jnp.float32, gt_proc=None,
            slot_io: bool = False, **_):
    """Full model forward (reference models/full_graph.py:22-30).

    ``x``/``e`` in host order (padded); returns (edge_logits [Ep, 1] in host
    edge order, new_state).  Rows >= gt.n_edges are padding.
    ``remat=True`` rematerialises each layer in the backward pass.

    ``slot_io=True``: ``e`` arrives already in slot order and the logits are
    returned in slot order — the caller does the (bijective) permutation on
    the host once, instead of paying two [Ep, d] device gathers plus their
    backward transposes inside every jitted step (~17 ms each on the bench
    graph).  Padded slots sort last, so ``[:n_edges]`` truncation and
    edge-masked losses work identically in either order.
    """
    from ..ops.message import _plan_for, pack_edges
    from ..ops.pallas_kernels import _interpret

    h = mlp2(params["node_encoder"], x).astype(dtype)
    e = mlp2(params["edge_encoder"], e).astype(dtype)
    if not slot_io:
        e = gt.edges_to_slots(e)

    # fused Pallas mode: the whole edge stage runs in the K3/K7/K8 kernels
    # over PACKED [Ep/2, 2d] edge arrays — e is packed ONCE here and stays
    # packed through every layer (no 128-lane padding anywhere in the edge
    # stream).  Runs at both bf16 (the perf mode) and f32 (parity mode —
    # HIGHEST-precision one-hot dots make the selects exact; the round-2
    # Mosaic remote-compile failure no longer reproduces, and the on-TPU
    # parity suite under tests_tpu/ pins fused-vs-XLA agreement directly on
    # hardware); interpreter mode (tests) exercises it at any dtype.
    fused = (backend == "pallas" and cfg.normalization == "batch"
             and (dtype in (jnp.bfloat16, jnp.float32) or _interpret())
             and _plan_for(gt, flip) is not None)
    if fused:
        e = pack_edges(e)

    num_layers = jax.tree_util.tree_leaves(params["gnn"])[0].shape[0]
    # fused-training remat: the edge stage's custom VJP already keeps only
    # tiny residuals (message.fused_train_stage) and its backward never
    # re-runs the forward kernels, so checkpointing the whole body would
    # only add a useless K7+K3 replay.  Checkpoint JUST the node stage and
    # let the scan save the edge stage's (cheap) residuals.  Under "full"
    # remat the same applies INSIDE each sqrt-schedule group: the group
    # replay recomputes the layer states, and each layer's backward then
    # runs K8 directly — the aggregation sums live only for the g layers of
    # the group being differentiated.
    lean_edge_vjp = fused and training and bool(remat)
    layer_fn = partial(sym_gated_gcn_layer, training=training, flip=flip,
                       norm=cfg.normalization, drop_rate=cfg.dropout,
                       backend=backend, dtype=dtype, packed=fused,
                       remat_node=lean_edge_vjp)

    # "full" remat (the large-graph mode): carry (h, e) through the scan
    # packed two rows per 128-lane row.  The scan's per-layer carry stack is
    # the dominant training allocation at multi-million-edge scale
    # ([L, Ep, 64]); XLA pads a 64-wide bf16/f32 minor dim 2x to the 128-lane
    # tile AND keeps a compressed+uncompressed copy pair alive while
    # rematerialising it (measured 18 GB for 6.3M edges).  A [Ep/2, 128]
    # carry has no lane padding, so the stack is stored once at its unpadded
    # size.  The repack is an exact row-major reshape (bitwise identity).
    # In fused mode e is already packed natively; only h needs the repack.
    pack_h = remat == "full"
    pack_e = pack_h and not fused

    def _pk(a, on):
        return a.reshape(a.shape[0] // 2, 2 * a.shape[1]) if on else a

    def _unpk(a, on):
        return a.reshape(a.shape[0] * 2, a.shape[1] // 2) if on else a

    def body(carry, inp):
        h, e = carry
        p_l, s_l, key_l = inp
        h, e, new_s = layer_fn(p_l, s_l, gt, _unpk(h, pack_h),
                               _unpk(e, pack_e), rng=key_l)
        return (_pk(h, pack_h), _pk(e, pack_e)), new_s

    if remat and not lean_edge_vjp:
        body = jax.checkpoint(body)

    keys = (jax.random.split(rng, num_layers) if rng is not None
            else jnp.zeros((num_layers, 2), jnp.uint32))
    xs = (params["gnn"], state["gnn"], keys)

    # sqrt(L) remat schedule for the large-graph mode: a flat scan's backward
    # saves EVERY layer's (h, e) carry ([L, Ep/2, 128] — 6 GB at 6.3M edges,
    # the largest allocation after packing).  A scan of G groups of g layers
    # saves only the G group-boundary carries; each group's backward rebuilds
    # its g per-layer carries transiently, so the peak stack is (G + g)
    # carries instead of L.
    group = 1
    if remat == "full":
        group = max((g for g in range(1, num_layers + 1)
                     if num_layers % g == 0 and g * g <= num_layers),
                    default=1)

    if group > 1:
        n_groups = num_layers // group
        gxs = jax.tree_util.tree_map(
            lambda a: a.reshape(n_groups, group, *a.shape[1:]), xs)

        @jax.checkpoint
        def group_body(carry, ginp):
            return jax.lax.scan(body, carry, ginp)

        def run_layers(h, e):
            (h, e), st = jax.lax.scan(group_body, (h, e), gxs)
            st = jax.tree_util.tree_map(
                lambda a: a.reshape(num_layers, *a.shape[2:]), st)
            return (h, e), st
    elif _unroll_layers(backend, remat):
        def run_layers(h, e):
            return _scan_unrolled(body, (h, e), xs, num_layers)
    else:
        def run_layers(h, e):
            return jax.lax.scan(body, (h, e), xs)

    if remat == "full":
        # outer remat too: nothing is saved in the primal forward, so the two
        # symmetry-loss passes never hold their carry stacks at the same time
        # (each is rebuilt, used and freed inside its own backward segment),
        # at O(L^2/2) layer-forward recompute cost
        run_layers = jax.checkpoint(
            run_layers, policy=jax.checkpoint_policies.nothing_saveable)
    (h, e), new_gnn_state = run_layers(_pk(h, pack_h), _pk(e, pack_e))
    h, e = _unpk(h, pack_h), _unpk(e, pack_e)

    # in fused mode e stays PACKED into the score predictor (K6 + blockdiag
    # matmuls); it unpacks only at the narrow [Ep, 32] second layer
    predict = partial(score_edges, params["predictor"], gt, flip=flip,
                      dtype=dtype, backend=backend, packed=fused)
    if remat:
        # the predictor's concat/MLP residuals are E x 192-sized — recompute
        predict = jax.checkpoint(predict)
    scores = predict(h, e)
    if not slot_io:
        scores = gt.slots_to_edges(scores)
    return scores.astype(jnp.float32), {"gnn": new_gnn_state}
