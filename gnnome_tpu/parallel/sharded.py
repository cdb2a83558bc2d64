"""Sharded (multi-chip) forward and train step.

Strategy: **graph parallelism** — node-feature and edge arrays are sharded on
their leading axis across the ``graph`` mesh axis; parameters and optimizer
state are replicated.  The model code is *unchanged*: gathers (``h[src]``)
and sorted segment-sums cross shard boundaries, and GSPMD lowers them to ICI
collectives; replicated-parameter gradients come out psum'd automatically.

Node ordering makes this efficient: assembly graphs are band-ordered (see
graphs/partition.py), so contiguous equal node blocks per device mean most
edges are shard-local and the collective volume is the halo, not the graph.

This module is exercised on any machine via an N-virtual-device CPU mesh
(tests/conftest.py) and by ``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import numpy as np

from ..config import Config
from ..ops.graph_tensors import GraphTensors
from .mesh import graph_sharding, replicated_sharding


def shard_graph_tensors(gt: GraphTensors, mesh) -> GraphTensors:
    """device_put every leaf with leading-axis sharding over the mesh."""
    gshard = graph_sharding(mesh)
    rshard = replicated_sharding(mesh)
    leaves = {}
    for f in dataclasses.fields(gt):
        v = getattr(gt, f.name)
        if isinstance(v, jax.Array):
            # 0-d leaves (real-count scalars) replicate; arrays shard
            leaves[f.name] = jax.device_put(v, gshard if v.ndim else rshard)
        else:
            leaves[f.name] = v
    return GraphTensors(**leaves)


def shard_example(ex, mesh):
    """Shard a train.step.TrainExample across the mesh."""
    gshard = graph_sharding(mesh)
    return dataclasses.replace(
        ex,
        gt=shard_graph_tensors(ex.gt, mesh),
        x=jax.device_put(ex.x, gshard),
        x_rev=jax.device_put(ex.x_rev, gshard),
        e=jax.device_put(ex.e, gshard),
        labels=jax.device_put(ex.labels, gshard),
        mask=jax.device_put(ex.mask, gshard),
    )


def replicate(tree, mesh):
    rshard = replicated_sharding(mesh)
    return jax.device_put(tree, rshard)


def make_sharded_forward(cfg: Config, mesh):
    """jit'd eval forward over the mesh; inputs must be pre-sharded.

    Dispatches through the model registry so every zoo variant
    (reference models/full_graph.py:33-119) runs multi-chip, not just the
    flagship SymGatedGCN."""
    from ..models.zoo import get_model

    model_cfg = cfg.model
    backend = None if cfg.compute.backend == "auto" else cfg.compute.backend
    _, model_fwd = get_model(model_cfg.model)

    @jax.jit
    def fwd(params, state, gt, x, e, gt_proc=None):
        scores, _ = model_fwd(params, state, gt, x, e, model_cfg,
                              training=False, backend=backend,
                              gt_proc=gt_proc)
        return scores

    return fwd


def make_sharded_train_step(cfg: Config, mesh):
    """Sharded counterpart of train.step.make_steps: same loss, same
    semantics, graph-parallel arrays + replicated params."""
    from ..train.step import make_steps

    tx, train_step, eval_step = make_steps(cfg)

    def init_opt(params):
        return replicate(tx.init(replicate(params, mesh)), mesh)

    return tx, train_step, eval_step, init_opt


def sharded_score_graph(graph, params, state, cfg: Config, mesh) -> np.ndarray:
    """Multi-chip version of infer.score_graph (any registry model)."""
    from ..models import edge_features, node_features
    from ..models.zoo import processor_graph_for

    P = mesh.devices.size
    gt = GraphTensors.build(graph.src, graph.dst, graph.num_nodes,
                            cfg.compute.edge_pad_multiple,
                            cfg.compute.node_pad_multiple,
                            divisible_by=P)
    x = gt.pad_nodes(node_features(graph))
    e = gt.pad_edges(edge_features(graph, cfg.data.use_similarities))
    # zoo models run their processor on a transformed graph (self-loops /
    # reversed edges, reference full_graph.py:45-51,68-72) — shard it too
    gt_proc = processor_graph_for(cfg.model.model, graph, cfg.model,
                                  cfg.compute.edge_pad_multiple,
                                  cfg.compute.node_pad_multiple,
                                  divisible_by=P)
    gt = shard_graph_tensors(gt, mesh)
    if gt_proc is not None:
        gt_proc = shard_graph_tensors(gt_proc, mesh)
    x = jax.device_put(x, graph_sharding(mesh))
    e = jax.device_put(e, graph_sharding(mesh))
    params = replicate(params, mesh)
    state = replicate(state, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    scores = fwd(params, state, gt, x, e, gt_proc)
    from .halo import fetch_global   # multi-process-safe device->host copy
    return fetch_global(scores).reshape(-1)[: graph.num_edges]
