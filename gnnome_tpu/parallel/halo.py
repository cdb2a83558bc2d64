"""Explicit halo-exchange graph parallelism (shard_map + ppermute).

The GSPMD auto-sharded path (parallel/sharded.py) lowers each per-layer
endpoint gather to an **all-gather of the full node array** (measured: 2 per
layer).  Assembly graphs are banded, so a device that owns a contiguous node
block only ever needs a K-row strip from each neighbour.  This module
implements that: each SymGatedGCN layer exchanges two K-row boundary strips
over ICI (``ppermute``), gathers locally from the extended block, and returns
boundary partial sums the same way — communication O(K·D) per layer instead
of O(N·D).

Layout (host-built HaloPlan): nodes are split into P contiguous blocks
(RC pairs stay together); every edge is assigned to the device owning its
``dst`` (edges are dst-sorted, so assignments are contiguous); per-device edge
arrays are padded to a common Emax.  The reach K is the maximum distance any
edge's ``src`` lies outside its device's block; graphs whose reach exceeds the
block size fall back to the GSPMD path (``build_halo_plan`` returns None).

Everything runs under ``jax.shard_map`` with replicated parameters; autodiff
transposes the ppermutes automatically, and replicated-parameter gradients
come out psum'd.  BatchNorm statistics are psum'd across devices so results
are bitwise-comparable (up to reduction order) with the single-device model.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.graph_tensors import GraphTensors
from .mesh import GRAPH_AXIS


class HostArray:
    """Identity-hashed wrapper so host-side numpy metadata can live in a
    pytree meta field (plain arrays break treedef equality checks)."""

    def __init__(self, a):
        self.a = a

    def __eq__(self, other):
        return self is other or (isinstance(other, HostArray)
                                 and self.a is other.a)

    def __hash__(self):
        return id(self.a)


@dataclass(frozen=True)
class HaloPlan:
    # --- leaves; leading axis P is sharded over the mesh ---
    src_ext: jax.Array      # int32 [P, Emax] index into h_ext (K+Nb+K rows)
    dst_loc: jax.Array      # int32 [P, Emax] local dst index, sentinel Nb
    e_feat: jax.Array       # f32 [P, Emax, F] per-device edge features
    emask: jax.Array        # f32 [P, Emax, 1]
    nmask: jax.Array        # f32 [P, Nb, 1] real-node mask per block
    # --- static ---
    P: int = 0
    Nb: int = 0             # node rows per device
    K: int = 0              # halo strip rows
    Emax: int = 0
    n_edges: int = 0
    # host-side (numpy, not traced): (device, pos) per global edge slot
    slot_map: object = None


jax.tree_util.register_dataclass(
    HaloPlan,
    data_fields=["src_ext", "dst_loc", "e_feat", "emask", "nmask"],
    meta_fields=["P", "Nb", "K", "Emax", "n_edges", "slot_map"],
)


def build_halo_plan(gt: GraphTensors, e_feat_host: np.ndarray, n_devices: int,
                    max_k_frac: float = 0.5) -> HaloPlan | None:
    """Host-side plan; ``e_feat_host`` is [Ep, F] in host edge order.
    Returns None when the graph's reach exceeds ``max_k_frac * Nb``."""
    P = n_devices
    Np, Ep = gt.n_nodes_pad, gt.n_edges_pad
    if Np % P != 0:
        return None
    Nb = Np // P
    src = np.asarray(gt.src)
    dst = np.asarray(gt.dst)
    mask = np.asarray(gt.edge_mask)[:, 0]
    e_slots = np.asarray(
        e_feat_host[np.asarray(gt.eid_of_slot)], dtype=np.float32)

    owner = dst // Nb
    real = mask > 0
    # reach: how far src lies outside the owner's block
    blk_start = owner.astype(np.int64) * Nb
    off = src.astype(np.int64) - blk_start
    reach = np.maximum(np.maximum(-off, off - (Nb - 1)), 0)
    K = int(reach[real].max()) if real.any() else 0
    K = max(8, -(-K // 8) * 8)
    if K > max_k_frac * Nb:
        return None

    counts = np.bincount(owner[real], minlength=P)
    Emax = max(128, int(-(-counts.max() // 128) * 128))

    src_ext = np.full((P, Emax), K + Nb + K, dtype=np.int32)  # sentinel (unused)
    dst_loc = np.full((P, Emax), Nb, dtype=np.int32)          # dump row
    e_dev = np.zeros((P, Emax, e_slots.shape[1]), dtype=np.float32)
    emask = np.zeros((P, Emax, 1), dtype=np.float32)
    slot_map = np.zeros((Ep, 2), dtype=np.int64)

    fill = np.zeros(P, dtype=np.int64)
    order = np.nonzero(real)[0]
    for s in order.tolist():
        d = owner[s]
        pos = fill[d]
        fill[d] = pos + 1
        src_ext[d, pos] = off[s] + K
        dst_loc[d, pos] = dst[s] - d * Nb
        e_dev[d, pos] = e_slots[s]
        emask[d, pos] = 1.0
        slot_map[s] = (d, pos)

    nmask = np.asarray(gt.node_mask).reshape(P, Nb, 1).astype(np.float32)
    return HaloPlan(
        src_ext=jnp.asarray(src_ext), dst_loc=jnp.asarray(dst_loc),
        e_feat=jnp.asarray(e_dev), emask=jnp.asarray(emask),
        nmask=jnp.asarray(nmask),
        P=P, Nb=Nb, K=K, Emax=Emax, n_edges=gt.n_edges,
        slot_map=HostArray(slot_map),
    )


# -------------------------------------------------------------- ring exchange
def _perm_fwd(P):
    return [(i, (i + 1) % P) for i in range(P)]


def _perm_bwd(P):
    return [(i, (i - 1) % P) for i in range(P)]


def halo_extend(h_block: jax.Array, K: int, P: int) -> jax.Array:
    """[Nb, D] -> [K+Nb+K, D]: receive the left neighbour's bottom strip and
    the right neighbour's top strip (one ppermute each over ICI)."""
    from_left = jax.lax.ppermute(h_block[-K:], GRAPH_AXIS, _perm_fwd(P))
    from_right = jax.lax.ppermute(h_block[:K], GRAPH_AXIS, _perm_bwd(P))
    return jnp.concatenate([from_left, h_block, from_right], axis=0)


def halo_return(partial_ext: jax.Array, K: int, Nb: int, P: int) -> jax.Array:
    """Inverse of halo_extend for partial sums: rows [0,K) belong to the left
    neighbour's tail, rows [K+Nb,) to the right neighbour's head — send them
    home and add."""
    local = partial_ext[K:K + Nb]
    to_left = jax.lax.ppermute(partial_ext[:K], GRAPH_AXIS, _perm_bwd(P))
    to_right = jax.lax.ppermute(partial_ext[K + Nb:], GRAPH_AXIS, _perm_fwd(P))
    local = local.at[Nb - K:].add(to_left)
    local = local.at[:K].add(to_right)
    return local


def _psum_bn(p, s, x, mask, n_valid, training, repeat_updates=1):
    """Masked BatchNorm with cross-device statistics (psum'd sums);
    torch semantics as in models/norm.py."""
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    if training:
        mean = jax.lax.psum((x * mask).sum(0), GRAPH_AXIS) / n_valid
        var = jax.lax.psum((((x - mean) ** 2) * mask).sum(0),
                           GRAPH_AXIS) / n_valid
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (x - mean) * inv
        unbiased = var * (n_valid / (n_valid - 1)) if n_valid > 1 else var
        rm, rv = s["mean"], s["var"]
        for _ in range(repeat_updates):
            rm = 0.9 * rm + 0.1 * mean
            rv = 0.9 * rv + 0.1 * unbiased
        new_s = {"mean": rm, "var": rv, "count": s["count"] + repeat_updates}
    else:
        y = (x - s["mean"]) * jax.lax.rsqrt(s["var"] + 1e-5)
        new_s = s
    return (y * p["scale"] + p["bias"]).astype(in_dtype), new_s


# ------------------------------------------------------------------ the model
def _halo_layer(p, s, plan: HaloPlan, h, e_dev, nmask, n_nodes_real, *,
                training, flip):
    """One SymGatedGCN layer on a device's block (math identical to
    models/sym_gated_gcn.sym_gated_gcn_layer; reference
    gated_gcn_full.py:82-142).

    Role bookkeeping: the gate is ``B1h[src] + B2h[dst]`` (flip: roles
    swapped); ``dst`` is always device-local (edges are assigned by dst), so
    one endpoint gathers from the halo-extended block and the other locally.
    The node update ``a1h + into_dst + into_src`` is role-symmetric.
    """
    K, Nb, P, d = plan.K, plan.Nb, plan.P, h.shape[1]
    h_in, e_in = h, e_dev

    w = jnp.concatenate([p["B1"]["w"], p["A2"]["w"], p["B2"]["w"],
                         p["A3"]["w"], p["A1"]["w"]], axis=1)
    b = jnp.concatenate([p["B1"]["b"], p["A2"]["b"], p["B2"]["b"],
                         p["A3"]["b"], p["A1"]["b"]])
    proj = h @ w + b
    a1h = proj[:, 4 * d:]

    # one halo exchange covers both endpoint column groups
    proj_ext = halo_extend(proj[:, : 4 * d], K, P)
    src_ext = plan.src_ext[0]        # [Emax] (leading P axis sharded away)
    dst_loc = plan.dst_loc[0]
    emask = plan.emask[0]
    proj_pad = jnp.pad(proj[:, : 4 * d], ((0, 1), (0, 0)))  # row Nb = dump

    if not flip:
        # B1h/A2h from src (halo), B2h/A3h from dst (local)
        g_ext = jnp.take(proj_ext[:, : 2 * d], src_ext, axis=0,
                         fill_value=0.0, mode="fill")
        g_loc = jnp.take(proj_pad[:, 2 * d: 4 * d], dst_loc, axis=0)
        gate = g_ext[:, :d] + g_loc[:, :d]
    else:
        # B1h/A2h from dst (local), B2h/A3h from src (halo)
        g_loc = jnp.take(proj_pad[:, : 2 * d], dst_loc, axis=0)
        g_ext = jnp.take(proj_ext[:, 2 * d: 4 * d], src_ext, axis=0,
                         fill_value=0.0, mode="fill")
        gate = g_loc[:, :d] + g_ext[:, :d]
    m_ext = g_ext[:, d:]             # message value aggregated into dst
    m_loc = g_loc[:, d:]             # message value aggregated into src

    b3e = e_dev @ p["B3"]["w"] + p["B3"]["b"]
    gate = gate + b3e
    gate, s_bn_e = _psum_bn(p["bn_e"], s["bn_e"], gate, emask, plan.n_edges,
                            training, repeat_updates=2)
    gate = jax.nn.relu(gate)
    e_out = gate + e_in
    sigma = jax.nn.sigmoid(e_out) * emask

    eps = 1e-6
    into_dst = jax.ops.segment_sum(
        jnp.concatenate([sigma * m_ext, sigma], 1), dst_loc,
        num_segments=Nb + 1, indices_are_sorted=True)[:Nb]
    part_src = jax.ops.segment_sum(
        jnp.concatenate([sigma * m_loc, sigma], 1), src_ext,
        num_segments=K + Nb + K + 1)[:-1]
    into_src = halo_return(part_src, K, Nb, P)

    r_dst = into_dst[:, :d] / (into_dst[:, d:] + eps)
    r_src = into_src[:, :d] / (into_src[:, d:] + eps)

    h_new = a1h + r_dst + r_src
    h_new, s_bn_h = _psum_bn(p["bn_h"], s["bn_h"], h_new, nmask,
                             n_nodes_real, training)
    h_new = jax.nn.relu(h_new) + h_in
    return h_new, e_out, {"bn_h": s_bn_h, "bn_e": s_bn_e}


def make_halo_forward(cfg: Config, mesh, plan: HaloPlan, n_nodes_real: int):
    """jit'd shard_map forward over the mesh.

    Note: BatchNorm node statistics use all padded block rows; callers that
    need exact single-device parity in *training* mode should compare against
    a GraphTensors padded to the same Np (eval mode is exact either way since
    running stats are used).  Returns per-device logits [P, Emax, 1]; map to
    host edge order with ``halo_scores_to_host``.
    """
    from jax.sharding import PartitionSpec as P_

    model_cfg = cfg.model
    num_layers = model_cfg.num_gnn_layers

    if model_cfg.normalization != "batch":
        raise NotImplementedError("halo path currently implements batch norm "
                                  "semantics only")

    def device_fn(params, state, plan_shard, x_blk, flip):
        # encoders (node rows local; edge features per device)
        from ..models.nn import mlp2
        h = mlp2(params["node_encoder"], x_blk[0])  # shard_map keeps axis 0
        e_dev = mlp2(params["edge_encoder"], plan_shard.e_feat[0])
        nmask = plan_shard.nmask[0]

        for i in range(num_layers):
            p_l = jax.tree_util.tree_map(lambda a: a[i], params["gnn"])
            s_l = jax.tree_util.tree_map(lambda a: a[i], state["gnn"])
            h, e_dev, _ns = _halo_layer(p_l, s_l, plan_shard, h, e_dev,
                                        nmask, n_nodes_real,
                                        training=False, flip=flip)

        # score predictor: h[u] via halo, h[v] local
        K, Nb, Pn = plan_shard.K, plan_shard.Nb, plan_shard.P
        h_ext = halo_extend(h, K, Pn)
        hu = jnp.take(h_ext, plan_shard.src_ext[0], axis=0, fill_value=0.0,
                      mode="fill")
        hv = jnp.take(jnp.pad(h, ((0, 1), (0, 0))), plan_shard.dst_loc[0],
                      axis=0)
        if flip:
            hu, hv = hv, hu
        pp = params["predictor"]
        z = jnp.concatenate([hu, hv, e_dev], axis=1)
        z = jax.nn.relu(z @ pp["W1"]["w"] + pp["W1"]["b"])
        z = jax.nn.relu(z @ pp["W2"]["w"] + pp["W2"]["b"])
        return (z @ pp["W3"]["w"] + pp["W3"]["b"]) * plan_shard.emask[0]

    sharded = jax.shard_map(
        partial(device_fn, flip=False),
        mesh=mesh,
        in_specs=(P_(), P_(), P_(GRAPH_AXIS), P_(GRAPH_AXIS)),
        out_specs=P_(GRAPH_AXIS),
    )
    return jax.jit(sharded)


def to_device_edges(plan: HaloPlan, host_edge_array: np.ndarray,
                    gt: GraphTensors) -> np.ndarray:
    """[Ep, ...] host-edge-order array -> [P, Emax, ...] per-device layout."""
    sm = plan.slot_map.a
    slots = np.asarray(host_edge_array)[np.asarray(gt.eid_of_slot)]
    out = np.zeros((plan.P, plan.Emax) + slots.shape[1:], dtype=slots.dtype)
    out[sm[:, 0], sm[:, 1]] = slots
    # padded slots all map to (0, 0); restore the real edge that owns it
    first = np.nonzero((sm[:, 0] == 0) & (sm[:, 1] == 0))[0]
    if first.size:
        out[0, 0] = slots[first[0]]
    return out


def make_halo_train_step(cfg: Config, mesh, plan: HaloPlan, n_nodes_real: int):
    """jit'd graph-parallel training step over the halo layout.

    Symmetry loss (two directional passes, reference train.py:159-185) with
    replicated parameters; gradients flow through the ppermutes (their
    transpose is the reverse ppermute) and come out replicated.
    Returns (tx, train_step) where train_step(params, state, opt_state,
    plan_dev, x_blocks, x_rev_blocks, labels_dev, pos_weight, rng).
    """
    from jax.sharding import PartitionSpec as P_
    import optax
    from ..models.nn import mlp2
    from ..train.step import make_optimizer

    model_cfg = cfg.model
    num_layers = model_cfg.num_gnn_layers
    alpha = cfg.train.alpha
    use_sym = cfg.train.use_symmetry_loss
    if model_cfg.normalization != "batch":
        raise NotImplementedError("halo path implements batch norm only")

    def one_pass(params, state, plan_shard, x, nmask, flip, training, rng):
        h = mlp2(params["node_encoder"], x)
        e_dev = mlp2(params["edge_encoder"], plan_shard.e_feat[0])
        new_layers = []
        for i in range(num_layers):
            p_l = jax.tree_util.tree_map(lambda a: a[i], params["gnn"])
            s_l = jax.tree_util.tree_map(lambda a: a[i], state["gnn"])
            h, e_dev, ns = _halo_layer(p_l, s_l, plan_shard, h, e_dev, nmask,
                                       n_nodes_real, training=training,
                                       flip=flip)
            if training and model_cfg.dropout > 0.0 and rng is not None:
                from ..models.nn import dropout as _dropout
                key = jax.random.fold_in(
                    jax.random.fold_in(rng, i),
                    jax.lax.axis_index(GRAPH_AXIS))
                h = _dropout(key, h, model_cfg.dropout)
            new_layers.append(ns)
        new_state = {"gnn": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, 0), *new_layers)}

        K, Nb, Pn = plan_shard.K, plan_shard.Nb, plan_shard.P
        h_ext = halo_extend(h, K, Pn)
        hu = jnp.take(h_ext, plan_shard.src_ext[0], axis=0, fill_value=0.0,
                      mode="fill")
        hv = jnp.take(jnp.pad(h, ((0, 1), (0, 0))), plan_shard.dst_loc[0],
                      axis=0)
        if flip:
            hu, hv = hv, hu
        pp = params["predictor"]
        z = jnp.concatenate([hu, hv, e_dev], axis=1)
        z = jax.nn.relu(z @ pp["W1"]["w"] + pp["W1"]["b"])
        z = jax.nn.relu(z @ pp["W2"]["w"] + pp["W2"]["b"])
        logits = (z @ pp["W3"]["w"] + pp["W3"]["b"])[:, 0]
        return logits, new_state

    def device_loss(params, state, plan_shard, x_blk, xr_blk, labels, pw, rng):
        from ..train.loss import _bce_elementwise
        nmask = plan_shard.nmask[0]
        emask = plan_shard.emask[0][:, 0]
        y = labels[0][:, 0]
        k1, k2 = jax.random.split(rng)
        logits_org, state = one_pass(params, state, plan_shard, x_blk[0],
                                     nmask, False, True, k1)
        if use_sym:
            logits_rev, state = one_pass(params, state, plan_shard, xr_blk[0],
                                         nmask, True, True, k2)
            per_edge = (_bce_elementwise(logits_org, y, pw)
                        + _bce_elementwise(logits_rev, y, pw)
                        + alpha * jnp.abs(logits_org - logits_rev))
        else:
            per_edge = _bce_elementwise(logits_org, y, pw)
        loss = jax.lax.psum((per_edge * emask).sum(), GRAPH_AXIS) / plan.n_edges
        return loss, (logits_org[None], state)

    sm_loss = jax.shard_map(
        device_loss, mesh=mesh,
        in_specs=(P_(), P_(), P_(GRAPH_AXIS), P_(GRAPH_AXIS), P_(GRAPH_AXIS),
                  P_(GRAPH_AXIS), P_(), P_()),
        out_specs=(P_(), (P_(GRAPH_AXIS), P_())),
        check_vma=False,
    )

    tx = make_optimizer(cfg.train.lr)

    @jax.jit
    def train_step(params, state, opt_state, plan_dev, x_blocks, xr_blocks,
                   labels_dev, pos_weight, rng):
        (loss, (logits, new_state)), grads = jax.value_and_grad(
            sm_loss, has_aux=True)(params, state, plan_dev, x_blocks,
                                   xr_blocks, labels_dev, pos_weight, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss, logits

    return tx, train_step


def halo_scores_to_host(plan: HaloPlan, scores_dev: np.ndarray,
                        gt: GraphTensors) -> np.ndarray:
    """Device scores ([P*Emax, 1] as returned by the shard_map, or
    [P, Emax, 1]) -> [n_edges] in host edge order."""
    scores_dev = np.asarray(scores_dev).reshape(plan.P, plan.Emax)
    sm = plan.slot_map.a
    out = scores_dev[sm[:, 0], sm[:, 1]]
    slot_of_eid = np.asarray(gt.slot_of_eid)
    return out[slot_of_eid[: gt.n_edges]]
