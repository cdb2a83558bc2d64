"""jit-compiled train/eval steps + host-side example preparation.

Maps the reference's four loss paths (train.py:138-185: bce/symmetry x
full/partition) onto one padded, shape-bucketed TPU step:

* masking and partitioning happen on host (numpy) exactly as in the reference
  (strandwise masking train.py:91-100; METIS-style clustering train.py:335 via
  graphs/partition.py), producing ``TrainExample``s;
* node degree features always come from the pre-mask graph and are z-scored
  per unit (train.py:112-135); edge features are z-scored once on the full
  graph and gathered (utils/data_utils.py:34-40, train.py:134);
* the symmetry loss runs the model twice (org + flipped) with chained BN
  state, as two sequential torch forwards would (train.py:159-185).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

from ..config import Config
from ..ops.graph_tensors import GraphTensors


@dataclass
class TrainExample:
    gt: GraphTensors
    x: "object"          # [Np, 2] device
    x_rev: "object"      # [Np, 2] device (reversed-graph degree features)
    e: "object"          # [Ep, F] device
    labels: "object"     # [Ep] device
    mask: "object"       # [Ep] device float32
    n_edges: int
    gt_proc: "object" = None   # transformed processor graph (zoo models only)
    slot_io: bool = False      # e/labels pre-permuted to slot order on host


def _zscore(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.float32)
    std = v.std(ddof=1) if v.size > 1 else 1.0
    return (v - v.mean()) / (std if std > 0 else 1.0)


def effective_pads(cfg: Config) -> tuple[int, int]:
    """(edge_pad, node_pad) honouring the Pallas kernels' tiling needs."""
    import math
    epad, npad = cfg.compute.edge_pad_multiple, cfg.compute.node_pad_multiple
    if cfg.compute.backend == "pallas":
        from ..ops.windowed import TILE_E, WINDOW
        epad, npad = math.lcm(epad, TILE_E), math.lcm(npad, WINDOW)
    return epad, npad


def make_example(cfg: Config, in_deg, out_deg, e_feat, y, src, dst,
                 n_nodes: int, bucket_growth: float = 0.0) -> TrainExample:
    """Device-ready padded example from host arrays.  ``bucket_growth`` > 1
    rounds padded sizes up geometrically (bounded compile count over
    variable-size masked/clustered units)."""
    import jax.numpy as jnp

    epad, npad = effective_pads(cfg)
    gt = GraphTensors.build(src, dst, n_nodes,
                            edge_pad_multiple=epad, node_pad_multiple=npad,
                            divisible_by=max(1, cfg.compute.mesh),
                            bucket_growth=bucket_growth)
    if cfg.compute.backend == "pallas":
        from ..ops.graph_tensors import with_windowed_plans
        from ..models.sym_gated_gcn import DUAL_FULL_REMAT_MAX_EDGES
        # the dual-pass fused mode (sym_gated_gcn.forward_dual) runs both
        # symmetry passes against the ORG plan — flip plans are only needed
        # when the fused path declines (non-batch normalization, or
        # remat='full' beyond the dual carry budget) and the sequential
        # flip=True pass runs its own windowed kernels
        dual_declines = (
            cfg.model.normalization != "batch"
            or (cfg.compute.remat == "full"
                and gt.n_edges_pad > DUAL_FULL_REMAT_MAX_EDGES))
        gt = with_windowed_plans(
            gt, flip_too=(cfg.train.use_symmetry_loss and dual_declines),
            divisible_by=max(1, cfg.compute.mesh))
    zi, zo = _zscore(in_deg), _zscore(out_deg)
    x = gt.pad_nodes(np.stack([zi, zo], axis=1))
    x_rev = gt.pad_nodes(np.stack([zo, zi], axis=1))
    e_np = np.zeros((gt.n_edges_pad, e_feat.shape[1]), np.float32)
    e_np[: e_feat.shape[0]] = e_feat
    y_np = np.pad(y.astype(np.float32), (0, gt.n_edges_pad - y.shape[0]))
    # flagship model: permute edge arrays to slot order ON THE HOST so the
    # jitted step pays zero device permutation gathers (forward slot_io=True);
    # padded slots sort last, so masks/truncation behave identically
    slot_io = cfg.model.model in ("sym_gatedgcn", "sym_gated_gcn")
    if slot_io:
        eid_of_slot = gt.host("eid_of_slot")
        e_np = e_np[eid_of_slot]
        y_np = y_np[eid_of_slot]
    # the loss mask must ride the SAME ordering as labels/logits: slot-order
    # edge_mask with slot_io, host-order prefix otherwise (the two differ
    # under the tail-overflow layout — see GraphTensors.host_prefix_mask)
    mask = jnp.asarray(gt.host("edge_mask")[:, 0] if slot_io
                       else gt.host_prefix_mask(y.shape[0]))
    if slot_io:
        # round the gt's STATIC real counts up to the padded sizes: masked/
        # clustered units then share one compiled program per shape bucket.
        # All jit-side real-count math reads the traced nn_valid/ne_valid
        # leaves (exact); host-side consumers use ex.n_edges.  (The zoo path
        # keeps exact statics: its undirected transforms slice by gt.n_edges.)
        import dataclasses
        host_cache = getattr(gt, "_host", None)
        gt = dataclasses.replace(gt, n_nodes=gt.n_nodes_pad,
                                 n_edges=gt.n_edges_pad)
        if host_cache is not None:
            object.__setattr__(gt, "_host", host_cache)
    return TrainExample(gt=gt, x=x, x_rev=x_rev, e=jnp.asarray(e_np),
                        labels=jnp.asarray(y_np), mask=mask,
                        n_edges=int(y.shape[0]), slot_io=slot_io)


def logits_to_host(ex: TrainExample, logits) -> np.ndarray:
    """Step logits -> host edge order, truncated to real edges (undoes the
    example builder's host-side slot permutation when ``ex.slot_io``)."""
    a = np.asarray(logits)
    if ex.slot_io:
        a = a[ex.gt.host("slot_of_eid")]
    return a[: ex.n_edges]


def mask_graph_strandwise(graph, fraction: float, rng: np.random.Generator):
    """Random strand-pair node subsampling (reference train.py:91-100).
    Returns (subgraph, orig_nodes, orig_edges)."""
    keep_half = rng.random(graph.num_nodes // 2) < fraction
    keep = np.repeat(keep_half, 2)
    return graph.node_subgraph(keep)


@dataclass
class HostUnit:
    """One host-side training unit (masked and/or clustered subgraph) before
    device layout: degree features from the pre-mask graph, z-scoring and
    padding still pending."""
    in_deg: np.ndarray
    out_deg: np.ndarray
    e_feat: np.ndarray
    y: np.ndarray
    src: np.ndarray
    dst: np.ndarray
    n_nodes: int
    graph: object              # the subgraph (zoo processor-graph builds)
    bucket_growth: float = 0.0


def host_units(graph, cfg: Config, rng: np.random.Generator,
               shuffle_parts: bool = True) -> list[HostUnit]:
    """Mask + (maybe) partition one dataset graph into host units
    (reference train.py:311-348).  Shared by the single-chip and halo
    (multi-chip) example builders."""
    from ..models.features import edge_features
    from ..graphs.partition import partition_graph

    in_deg_full = graph.in_degrees()
    out_deg_full = graph.out_degrees()
    e_full = edge_features(graph, cfg.data.use_similarities)
    y_full = graph.y

    if cfg.train.masking:
        fraction = rng.integers(cfg.train.mask_frac_low,
                                cfg.train.mask_frac_high + 1) / 100
        sub, nid, eid = mask_graph_strandwise(graph, fraction, rng)
    else:
        sub, nid, eid = graph, np.arange(graph.num_nodes), np.arange(graph.num_edges)

    in_deg, out_deg = in_deg_full[nid], out_deg_full[nid]
    e_feat, y = e_full[eid], y_full[eid]

    # variable-size units (random masking / clustering) get geometric shape
    # buckets so an epoch compiles a bounded number of programs
    growth = cfg.compute.bucket_growth if cfg.train.masking else 0.0

    if sub.num_nodes <= cfg.train.num_nodes_per_cluster:
        return [HostUnit(in_deg, out_deg, e_feat, y, sub.src, sub.dst,
                         sub.num_nodes, sub, growth)]

    num_clusters = sub.num_nodes // cfg.train.num_nodes_per_cluster + 1
    parts = partition_graph(sub, num_clusters, k_hops=cfg.train.k_extra_hops)
    if shuffle_parts:
        rng.shuffle(parts)
    growth = cfg.compute.bucket_growth  # clusters vary in size regardless
    return [HostUnit(in_deg[p.orig_nodes], out_deg[p.orig_nodes],
                     e_feat[p.orig_edges], y[p.orig_edges],
                     p.graph.src, p.graph.dst, p.graph.num_nodes, p.graph,
                     growth)
            for p in parts]


def prepare_units(graph, cfg: Config, rng: np.random.Generator,
                  shuffle_parts: bool = True) -> list[TrainExample]:
    """Device-ready padded examples for the single-chip (or GSPMD) step."""
    def attach_proc(ex, sub_graph):
        from ..models.zoo import processor_graph_for
        gt_proc = processor_graph_for(cfg.model.model, sub_graph, cfg.model,
                                      cfg.compute.edge_pad_multiple,
                                      cfg.compute.node_pad_multiple)
        if gt_proc is not None:
            import dataclasses
            ex = dataclasses.replace(ex, gt_proc=gt_proc)
        return ex

    return [attach_proc(
        make_example(cfg, u.in_deg, u.out_deg, u.e_feat, u.y, u.src, u.dst,
                     u.n_nodes, bucket_growth=u.bucket_growth),
        u.graph)
            for u in host_units(graph, cfg, rng, shuffle_parts)]


def make_optimizer(lr: float):
    import optax
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    import jax.numpy as jnp
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def make_steps(cfg: Config):
    """Build (train_step, eval_step) jitted closures.

    The flagship sym_gatedgcn gets the reference's symmetry loss (two
    directional passes, train.py:159-185); zoo models (which have no flip
    semantics in the reference either — train.py hardcodes SymGatedGCNModel)
    train with plain pos-weighted BCE.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from ..models.zoo import get_model
    from .loss import bce_with_logits, symmetry_loss

    model_cfg = cfg.model
    alpha = cfg.train.alpha
    is_sym = model_cfg.model in ("sym_gatedgcn", "sym_gated_gcn")
    use_sym = cfg.train.use_symmetry_loss and is_sym
    backend = None if cfg.compute.backend == "auto" else cfg.compute.backend
    remat = cfg.compute.remat
    dtype = jnp.bfloat16 if cfg.compute.dtype == "bfloat16" else jnp.float32
    tx = make_optimizer(cfg.train.lr)
    _, fwd = get_model(model_cfg.model)

    def loss_fn(params, state, gt, gt_proc, x, x_rev, e, labels, mask,
                pos_weight, rng, training):
        # the flagship forward does its edge IO in slot order (the example
        # builder pre-permuted e/labels on host); losses are order-invariant
        # as long as logits/labels/mask agree, and they do
        if use_sym:
            # both symmetry passes in ONE dual-width fused pass (halves the
            # kernel calls; falls back to two passes off the fused path) —
            # models/sym_gated_gcn.forward_dual
            from ..models.sym_gated_gcn import forward_dual
            logits_org, logits_rev, state = forward_dual(
                params, state, gt, x, x_rev, e, model_cfg,
                training=training, rng=rng, backend=backend,
                remat=(remat if training else False), dtype=dtype,
                slot_io=is_sym)
            logits_org = logits_org[:, 0]
            loss = symmetry_loss(logits_org, logits_rev[:, 0], labels,
                                 pos_weight, alpha=alpha, mask=mask)
        else:
            k1, _ = jax.random.split(rng)
            logits_org, state = fwd(params, state, gt, x, e, model_cfg,
                                    training=training, flip=False, rng=k1,
                                    backend=backend,
                                    remat=(remat if training else False),
                                    dtype=dtype, gt_proc=gt_proc,
                                    slot_io=is_sym)
            logits_org = logits_org[:, 0]
            loss = bce_with_logits(logits_org, labels, pos_weight, mask=mask)
        return loss, (logits_org, state)

    # "memory" drops XLA's latency-hiding scheduler: it extends buffer live
    # ranges for overlap, which costs ~45% HBM fragmentation on the
    # full-remat multi-million-edge step (measured; the step is HBM-capacity
    # bound there, not latency bound)
    sched = cfg.compute.scheduler
    if sched == "auto":
        sched = "memory" if remat == "full" else "latency"
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        plat = "cpu"
    # TPU-only compile option — CPU/GPU compilers reject unknown options
    copts = ({"xla_tpu_enable_latency_hiding_scheduler": "false"}
             if sched == "memory" and plat in ("tpu", "axon") else None)

    @partial(jax.jit, static_argnames=(), compiler_options=copts)
    def train_step(params, state, opt_state, gt, x, x_rev, e, labels, mask,
                   pos_weight, rng, gt_proc=None):
        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, gt, gt_proc, x, x_rev, e,
                                   labels, mask, pos_weight, rng, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss, logits

    @partial(jax.jit, static_argnames=())
    def eval_step(params, state, gt, x, x_rev, e, labels, mask, pos_weight,
                  gt_proc=None):
        loss, (logits, _) = loss_fn(params, state, gt, gt_proc, x, x_rev, e,
                                    labels, mask, pos_weight,
                                    jax.random.PRNGKey(0), False)
        return loss, logits

    return tx, train_step, eval_step
