"""Model zoo: the reference's non-flagship variants
(models/full_graph.py:33-119 + layers/processor.py:22-83).

All share the encoder -> processor -> ScorePredictor composition.  Graph
transforms (``add_self_loop``, ``add_reverse_edges``, full_graph.py:48,69-72)
are host-side array ops producing a second GraphTensors; the predictor always
runs on the *original* graph (full_graph.py:52,74).

Conv semantics follow DGL 0.8 (the reference's backend):

* GatedGCN — the non-symmetric half of SymGatedGCN: forward-direction gated
  mean only, ``h = bn(A1h + h_fwd)`` (layers/gated_gcn_full.py:182-230);
* GCN — ``GraphConv(norm='both')``: symmetric-normalised sum over in-edges,
  ReLU between layers except after the last (processor.py:35-46);
* GAT — multi-head attention over in-edges with LeakyReLU(0.2) logits and
  per-destination softmax; heads concatenated then projected per layer
  (processor.py:49-70);
* SAGE — mean aggregator: ``fc_self(h) + fc_neigh(mean_in(h))``
  (processor.py:73-83).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.graph_tensors import GraphTensors
from .nn import linear, linear_init, mlp2, mlp2_init, dropout
from .norm import norm_init, bn_state_init, apply_norm
from .sym_gated_gcn import (GATE_EPS, _ne, _nn, _stack, _predictor_init,
                            score_edges)


# ------------------------------------------------------------ graph transforms
def add_reverse_edges(src: np.ndarray, dst: np.ndarray):
    """Append reversed edges (dgl.add_reverse_edges, full_graph.py:48)."""
    return np.concatenate([src, dst]), np.concatenate([dst, src])


def add_self_loop(src: np.ndarray, dst: np.ndarray, n_nodes: int):
    """Append one self-loop per node (dgl.add_self_loop, full_graph.py:69)."""
    loops = np.arange(n_nodes, dtype=src.dtype)
    return np.concatenate([src, loops]), np.concatenate([dst, loops])


def transformed_graph_tensors(graph, directed: bool, self_loops: bool,
                              edge_pad_multiple=512, node_pad_multiple=128,
                              divisible_by=1) -> GraphTensors:
    """GraphTensors for the zoo models' processor graph."""
    src, dst = graph.src, graph.dst
    if not directed:
        src, dst = add_reverse_edges(src, dst)
    if self_loops:
        src, dst = add_self_loop(src, dst, graph.num_nodes)
    return GraphTensors.build(src.astype(np.int32), dst.astype(np.int32),
                              graph.num_nodes, edge_pad_multiple,
                              node_pad_multiple, divisible_by)


# ------------------------------------------------------------- shared plumbing
def _agg_sum(gt: GraphTensors, edge_vals):
    """Segment-sum into destinations (edge_vals in slot order; sorted hint
    only when the gt kept the canonical dst order)."""
    return jax.ops.segment_sum(edge_vals, gt.dst,
                               num_segments=gt.n_nodes_pad,
                               indices_are_sorted=gt.dst_sorted)


def _in_degrees(gt: GraphTensors):
    return _agg_sum(gt, gt.edge_mask)


def _out_degrees(gt: GraphTensors):
    return jax.ops.segment_sum(gt.edge_mask, gt.src,
                               num_segments=gt.n_nodes_pad)


# ==================================================================== GatedGCN
def gated_gcn_init(rng: jax.Array, cfg: ModelConfig):
    d = cfg.dim_latent
    keys = jax.random.split(rng, 4 + cfg.num_gnn_layers)

    def layer(k):
        ks = jax.random.split(k, 5)
        p = {n: linear_init(kk, d, d)
             for n, kk in zip(("A1", "A2", "B1", "B2", "B3"), ks)}
        p["bn_h"] = norm_init(d)
        p["bn_e"] = norm_init(d)
        return p

    params = {
        "node_encoder": mlp2_init(keys[0], cfg.node_features,
                                  cfg.hidden_ne_features, d),
        "edge_encoder": mlp2_init(keys[1], cfg.edge_features,
                                  cfg.hidden_ne_features, d),
        "gnn": _stack([layer(keys[4 + i]) for i in range(cfg.num_gnn_layers)]),
        "predictor": _predictor_init(keys[2], d, cfg.hidden_edge_scores),
    }
    state = {"gnn": _stack([{"bn_h": bn_state_init(d), "bn_e": bn_state_init(d)}
                            for _ in range(cfg.num_gnn_layers)])}
    return params, state


def _gated_gcn_layer(p, s, gt, h, e, *, training, norm, drop_rate, rng):
    """Non-symmetric GatedGCN layer (reference gated_gcn_full.py:182-230)."""
    h_in, e_in = h, e
    d = h.shape[1]
    w = jnp.concatenate([p["B1"]["w"], p["A2"]["w"], p["B2"]["w"],
                         p["A1"]["w"]], axis=1)
    b = jnp.concatenate([p["B1"]["b"], p["A2"]["b"], p["B2"]["b"],
                         p["A1"]["b"]])
    proj = h @ w + b
    a1h = proj[:, 3 * d:]
    g_u = jnp.take(proj[:, : 2 * d], gt.src, axis=0)   # [B1h_u | A2h_u]
    b2h_v = jnp.take(proj[:, 2 * d: 3 * d], gt.dst, axis=0)
    b1h_u, a2h_u = g_u[:, :d], g_u[:, d:]
    gate = b1h_u + b2h_v + linear(p["B3"], e)
    gate, s_bn_e = apply_norm(norm, p["bn_e"], s["bn_e"], gate, gt.edge_mask,
                              _ne(gt), training, repeat_updates=1)
    gate = jax.nn.relu(gate)
    e_out = gate + e_in
    sigma = jax.nn.sigmoid(e_out) * gt.edge_mask
    summed = _agg_sum(gt, jnp.concatenate([sigma * a2h_u, sigma], axis=1))
    h_fwd = summed[:, :d] / (summed[:, d:] + GATE_EPS)
    h_new = a1h + h_fwd
    h_new, s_bn_h = apply_norm(norm, p["bn_h"], s["bn_h"], h_new, gt.node_mask,
                               _nn(gt), training, repeat_updates=1)
    h_new = jax.nn.relu(h_new) + h_in
    if training and drop_rate > 0.0 and rng is not None:
        h_new = dropout(rng, h_new, drop_rate)
    return h_new, e_out, {"bn_h": s_bn_h, "bn_e": s_bn_e}


def gated_gcn_forward(params, state, gt: GraphTensors, x, e, cfg: ModelConfig,
                      *, training=False, rng=None,
                      gt_proc: Optional[GraphTensors] = None, **_):
    """GatedGCNModel forward (reference full_graph.py:42-53).

    ``gt_proc`` is the (possibly undirected) processor graph; the score
    predictor runs on ``gt``.  For the undirected mode the caller builds
    ``gt_proc`` with reversed edges appended in host order, so slicing the
    first ``gt.n_edges`` edge states matches full_graph.py:51.
    """
    gtp = gt_proc or gt
    h = mlp2(params["node_encoder"], x)
    e_enc = mlp2(params["edge_encoder"], e)
    if gtp is not gt:
        # duplicated edge features for the reversed copies (full_graph.py:49)
        e_proc = jnp.concatenate([e_enc[: gt.n_edges]] * 2 +
                                 [jnp.zeros((gtp.n_edges_pad - 2 * gt.n_edges,
                                             e_enc.shape[1]), e_enc.dtype)], 0)
    else:
        e_proc = e_enc
    e_slots = gtp.edges_to_slots(e_proc)

    num_layers = jax.tree_util.tree_leaves(params["gnn"])[0].shape[0]
    keys = (jax.random.split(rng, num_layers) if rng is not None
            else jnp.zeros((num_layers, 2), jnp.uint32))

    def body(carry, inp):
        h, ee = carry
        p_l, s_l, k_l = inp
        h, ee, new_s = _gated_gcn_layer(p_l, s_l, gtp, h, ee,
                                        training=training,
                                        norm=cfg.normalization,
                                        drop_rate=cfg.dropout, rng=k_l)
        return (h, ee), new_s

    (h, e_fin), new_state = jax.lax.scan(body, (h, e_slots),
                                         (params["gnn"], state["gnn"], keys))
    e_host = gtp.slots_to_edges(e_fin)[: gt.n_edges]
    e_pad = jnp.concatenate([e_host, jnp.zeros(
        (gt.n_edges_pad - gt.n_edges, e_host.shape[1]), e_host.dtype)], 0)
    scores = score_edges(params["predictor"], gt, h,
                         gt.edges_to_slots(e_pad))
    return gt.slots_to_edges(scores), {"gnn": new_state}


# ========================================================================= GCN
def gcn_init(rng: jax.Array, cfg: ModelConfig):
    d = cfg.dim_latent
    keys = jax.random.split(rng, 4 + cfg.num_gnn_layers)
    params = {
        "node_encoder": mlp2_init(keys[0], cfg.node_features,
                                  cfg.hidden_ne_features, d),
        "edge_encoder": mlp2_init(keys[1], cfg.edge_features,
                                  cfg.hidden_ne_features, d),
        "gnn": _stack([linear_init(keys[4 + i], d, d)
                       for i in range(cfg.num_gnn_layers)]),
        "predictor": _predictor_init(keys[2], d, cfg.hidden_edge_scores),
    }
    return params, {}


def gcn_forward(params, state, gt: GraphTensors, x, e, cfg: ModelConfig, *,
                training=False, rng=None, gt_proc: Optional[GraphTensors] = None,
                **_):
    """GCNModel forward (full_graph.py:65-75): GraphConv(norm='both') stack,
    ReLU between layers except the last (processor.py:41-45)."""
    gtp = gt_proc or gt
    h = mlp2(params["node_encoder"], x)
    e_enc = mlp2(params["edge_encoder"], e)

    deg_in = jnp.clip(_in_degrees(gtp), 1.0)[:, 0]
    deg_out = jnp.clip(_out_degrees(gtp), 1.0)[:, 0]
    c_src = jax.lax.rsqrt(deg_out)[:, None]
    c_dst = jax.lax.rsqrt(deg_in)[:, None]

    num_layers = jax.tree_util.tree_leaves(params["gnn"])[0].shape[0]
    for i in range(num_layers):
        p_l = jax.tree_util.tree_map(lambda a: a[i], params["gnn"])
        hs = jnp.take(h * c_src, gtp.src, axis=0) * gtp.edge_mask
        agg = _agg_sum(gtp, hs) * c_dst
        h_new = linear(p_l, agg)
        h = jax.nn.relu(h_new) if i < num_layers - 1 else h_new
    scores = score_edges(params["predictor"], gt, h, gt.edges_to_slots(e_enc))
    return gt.slots_to_edges(scores), state


# ========================================================================= GAT
def gat_init(rng: jax.Array, cfg: ModelConfig):
    d = cfg.dim_latent
    heads = cfg.gat_num_heads
    keys = jax.random.split(rng, 4 + 2 * cfg.num_gnn_layers)

    def layer(k):
        k1, k2, k3 = jax.random.split(k, 3)
        # DGL GATConv: xavier-normal fc (no bias) + attention vectors + bias
        std = float(np.sqrt(2.0 / (d + d * heads)))
        return {
            "fc": jax.random.normal(k1, (d, heads * d)) * std,
            "attn_l": jax.random.normal(k2, (heads, d)) * std,
            "attn_r": jax.random.normal(k3, (heads, d)) * std,
            "bias": jnp.zeros((heads * d,)),
        }

    params = {
        "node_encoder": mlp2_init(keys[0], cfg.node_features,
                                  cfg.hidden_ne_features, d),
        "edge_encoder": mlp2_init(keys[1], cfg.edge_features,
                                  cfg.hidden_ne_features, d),
        "gnn": _stack([layer(keys[4 + i]) for i in range(cfg.num_gnn_layers)]),
        "proj": _stack([linear_init(keys[4 + cfg.num_gnn_layers + i],
                                    heads * d, d)
                        for i in range(cfg.num_gnn_layers)]),
        "predictor": _predictor_init(keys[2], d, cfg.hidden_edge_scores),
    }
    return params, {}


def _gat_layer(p, gt: GraphTensors, h, heads: int, *, training, feat_drop,
               rng):
    """One GATConv (DGL semantics): per-head attention over in-edges."""
    n, d = h.shape
    if training and feat_drop > 0.0 and rng is not None:
        h = dropout(rng, h, feat_drop)
    feat = (h @ p["fc"]).reshape(n, heads, d)             # [N, H, D]
    el = (feat * p["attn_l"][None]).sum(-1)                # [N, H]
    er = (feat * p["attn_r"][None]).sum(-1)                # [N, H]
    logit = jax.nn.leaky_relu(jnp.take(el, gt.src, axis=0)
                              + jnp.take(er, gt.dst, axis=0), 0.2)
    # per-destination softmax over in-edges (sorted segment ops)
    seg_max = jax.ops.segment_max(jnp.where(gt.edge_mask > 0, logit, -jnp.inf),
                                  gt.dst, num_segments=gt.n_nodes_pad,
                                  indices_are_sorted=gt.dst_sorted)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    expv = jnp.exp(logit - jnp.take(seg_max, gt.dst, axis=0)) * gt.edge_mask
    denom = jax.ops.segment_sum(expv, gt.dst, num_segments=gt.n_nodes_pad,
                                indices_are_sorted=gt.dst_sorted)
    alpha = expv / jnp.clip(jnp.take(denom, gt.dst, axis=0), 1e-9)
    msg = jnp.take(feat, gt.src, axis=0) * alpha[:, :, None]  # [E, H, D]
    out = jax.ops.segment_sum(msg.reshape(-1, heads * d), gt.dst,
                              num_segments=gt.n_nodes_pad,
                              indices_are_sorted=gt.dst_sorted)
    return out + p["bias"]                                  # [N, H*D]


def gat_forward(params, state, gt: GraphTensors, x, e, cfg: ModelConfig, *,
                training=False, rng=None, gt_proc: Optional[GraphTensors] = None,
                **_):
    """GATModel forward (full_graph.py:87-97 + processor.py:62-70):
    heads concat -> linear; ReLU between layers except after the last."""
    gtp = gt_proc or gt
    h = mlp2(params["node_encoder"], x)
    e_enc = mlp2(params["edge_encoder"], e)
    num_layers = jax.tree_util.tree_leaves(params["gnn"])[0].shape[0]
    keys = (jax.random.split(rng, num_layers) if rng is not None
            else [None] * num_layers)
    for i in range(num_layers):
        p_l = jax.tree_util.tree_map(lambda a: a[i], params["gnn"])
        pr_l = jax.tree_util.tree_map(lambda a: a[i], params["proj"])
        heads_out = _gat_layer(p_l, gtp, h, cfg.gat_num_heads,
                               training=training, feat_drop=cfg.dropout,
                               rng=keys[i])
        h = linear(pr_l, heads_out)
        if i < num_layers - 1:
            h = jax.nn.relu(h)
    scores = score_edges(params["predictor"], gt, h, gt.edges_to_slots(e_enc))
    return gt.slots_to_edges(scores), state


# ======================================================================== SAGE
def sage_init(rng: jax.Array, cfg: ModelConfig):
    d = cfg.dim_latent
    keys = jax.random.split(rng, 4 + 2 * cfg.num_gnn_layers)
    params = {
        "node_encoder": mlp2_init(keys[0], cfg.node_features,
                                  cfg.hidden_ne_features, d),
        "edge_encoder": mlp2_init(keys[1], cfg.edge_features,
                                  cfg.hidden_ne_features, d),
        "gnn": _stack([{"fc_self": linear_init(keys[4 + 2 * i], d, d),
                        "fc_neigh": linear_init(keys[5 + 2 * i], d, d)}
                       for i in range(cfg.num_gnn_layers)]),
        "predictor": _predictor_init(keys[2], d, cfg.hidden_edge_scores),
    }
    return params, {}


def sage_forward(params, state, gt: GraphTensors, x, e, cfg: ModelConfig, *,
                 training=False, rng=None, gt_proc: Optional[GraphTensors] = None,
                 **_):
    """SAGEModel forward (full_graph.py:109-119): mean aggregator,
    ReLU between layers except the last (processor.py:79-83)."""
    gtp = gt_proc or gt
    h = mlp2(params["node_encoder"], x)
    e_enc = mlp2(params["edge_encoder"], e)
    deg_in = jnp.clip(_in_degrees(gtp), 1.0)
    num_layers = jax.tree_util.tree_leaves(params["gnn"])[0].shape[0]
    keys = (jax.random.split(rng, num_layers) if rng is not None
            else [None] * num_layers)
    for i in range(num_layers):
        p_l = jax.tree_util.tree_map(lambda a: a[i], params["gnn"])
        hi = h
        if training and cfg.dropout > 0.0 and keys[i] is not None:
            hi = dropout(keys[i], hi, cfg.dropout)
        msg = jnp.take(hi, gtp.src, axis=0) * gtp.edge_mask
        mean_neigh = _agg_sum(gtp, msg) / deg_in
        h_new = linear(p_l["fc_self"], hi) + linear(p_l["fc_neigh"], mean_neigh)
        h = jax.nn.relu(h_new) if i < num_layers - 1 else h_new
    scores = score_edges(params["predictor"], gt, h, gt.edges_to_slots(e_enc))
    return gt.slots_to_edges(scores), state


# ==================================================================== registry
ZOO = {
    "gatedgcn": (gated_gcn_init, gated_gcn_forward,
                 dict(self_loops=False)),
    "gcn": (gcn_init, gcn_forward, dict(self_loops=True)),
    "gat": (gat_init, gat_forward, dict(self_loops=True)),
    "sage": (sage_init, sage_forward, dict(self_loops=True)),
}


def get_model(name: str):
    """(init_fn, forward_fn) for a model name; the flagship 'sym_gatedgcn'
    comes from models.sym_gated_gcn."""
    if name in ("sym_gatedgcn", "sym_gated_gcn"):
        from . import sym_gated_gcn
        return sym_gated_gcn.init_params, sym_gated_gcn.forward
    if name in ZOO:
        init_fn, fwd_fn, _ = ZOO[name]
        return init_fn, fwd_fn
    raise KeyError(f"Unknown model: {name}; choose from "
                   f"['sym_gatedgcn'] + {sorted(ZOO)}")


def processor_graph_for(name: str, graph, cfg: ModelConfig,
                        edge_pad_multiple=512, node_pad_multiple=128,
                        divisible_by=1):
    """The transformed GraphTensors a zoo model's processor runs on, or None
    when the processor uses the original graph (full_graph.py:45-51,68-72)."""
    if name in ("sym_gatedgcn", "sym_gated_gcn"):
        return None
    self_loops = ZOO[name][2]["self_loops"]
    if cfg.directed and not self_loops:
        return None
    return transformed_graph_tensors(graph, cfg.directed, self_loops,
                                     edge_pad_multiple, node_pad_multiple,
                                     divisible_by)
