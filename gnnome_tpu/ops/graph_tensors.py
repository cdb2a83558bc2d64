"""Device-resident graph representation for TPU message passing.

This is the TPU-first replacement for ``dgl.DGLGraph`` on the compute path
(reference layers/gated_gcn_full.py:82-142 drives everything through DGL's
``apply_edges``/``update_all``):

* static, padded shapes — edge/node arrays padded to configurable multiples so
  XLA compiles one program per shape bucket;
* **dst-sorted canonical edge slots**: edges live on device grouped by
  destination, so the forward gated aggregation is a *sorted* segment-sum with
  no runtime permutation, and the backward direction is an unsorted segment-sum
  over src ids (measured cheaper than permute+sorted on TPU); the mapping
  to/from the host's edge-id order is two cheap narrow gathers at the model
  boundary;
* both traversal directions come from the same arrays — the reference
  re-materialises ``dgl.reverse(g)`` inside every layer (gated_gcn_full.py:99);
* padded edges carry a zero mask and point at a dummy node row, so they are
  numerically inert everywhere (gates are masked, batch-norm statistics are
  mask-corrected).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def _permute_rows(perm, inv_perm, x):
    """Row permutation ``x[perm]`` whose adjoint is a GATHER by the inverse
    permutation.  XLA's default transpose of ``jnp.take`` is a scatter-add,
    which lowers to a serial per-row loop on TPU — measured 270 ms per
    [1.57M, 64] application in the train-step backward vs ~5 ms for the
    equivalent gather (the permutation is a bijection, so no adds occur)."""
    return jnp.take(x, perm, axis=0)


def _permute_rows_fwd(perm, inv_perm, x):
    return jnp.take(x, perm, axis=0), inv_perm


def _permute_rows_bwd(inv_perm, g):
    return None, None, jnp.take(g, inv_perm, axis=0)


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class GraphTensors:
    """Padded COO graph in dst-sorted slot order + host-order maps.

    All per-edge device arrays (``src``/``dst``/``edge_mask``) are in *slot*
    order; ``slot_of_eid``/``eid_of_slot`` translate host edge-id order <->
    slot order (the model applies them at its boundary, so callers only ever
    see host edge-id order).
    """
    # --- leaves (device arrays) ---
    src: jax.Array              # int32 [Ep] slot order (padded -> dummy node)
    dst: jax.Array              # int32 [Ep] slot order, ascending
    slot_of_eid: jax.Array      # int32 [Ep]: slot holding host edge id k
    eid_of_slot: jax.Array      # int32 [Ep]: host edge id in slot i
    edge_mask: jax.Array        # float32 [Ep, 1] slot order, 1 = real edge
    node_mask: jax.Array        # float32 [Np, 1] 1 = real node
    # optional Pallas windowed-kernel plans (ops/windowed.py); None = XLA path
    wplan: object = None
    wplan_flip: object = None
    # exact REAL counts as 0-d f32 DATA leaves: normalisation math (BatchNorm
    # statistics, unbiased-variance correction) must use the real counts, but
    # as traced values — static ints would key the jit cache and recompile
    # every masked/clustered unit (tests/test_compile_buckets.py).  Exact in
    # f32 up to 2^24 (16.7M) nodes/edges.
    nn_valid: object = None     # f32 [] = n_nodes (traced)
    ne_valid: object = None     # f32 [] = n_edges (traced)
    # --- static aux (metadata, not traced) ---
    # NOTE: the flagship example builder (train/step.make_example) rounds
    # n_nodes/n_edges up to the padded sizes on the gt it feeds the jitted
    # step, so one program serves every unit in a shape bucket; jit-side code
    # must use nn_valid/ne_valid (or the masks) for real-count math.
    n_nodes: int = 0
    n_edges: int = 0
    n_nodes_pad: int = 0
    n_edges_pad: int = 0
    # False after the tail-overflow reslot (windowed plans): dst is then
    # sorted except for the overflow tail region, so sorted-segment-sum
    # hints must be dropped (wrong results otherwise, not just slow)
    dst_sorted: bool = True

    # ------------------------------------------------------------------ build
    @classmethod
    def build(cls, src: np.ndarray, dst: np.ndarray, n_nodes: int,
              edge_pad_multiple: int = 512, node_pad_multiple: int = 128,
              divisible_by: int = 1, bucket_growth: float = 0.0):
        """Host-side construction from COO arrays in host edge-id order.

        ``divisible_by``: additionally round padded sizes to this multiple
        (set to the mesh size so sharded arrays split evenly across devices).
        ``bucket_growth`` > 1: round padded sizes up geometrically (powers of
        the factor) so variable-size training units (random masking,
        clustering) land in a bounded set of compiled shape buckets.
        """
        import math
        edge_pad_multiple = math.lcm(edge_pad_multiple, divisible_by)
        node_pad_multiple = math.lcm(node_pad_multiple, divisible_by)
        E = int(src.shape[0])
        # always at least one padded edge (it doubles as the inert fill slot)
        Ep = max(_round_up(E + 1, edge_pad_multiple), edge_pad_multiple)
        # dummy node must exist: pad nodes to >= n_nodes + 1
        Np = max(_round_up(n_nodes + 1, node_pad_multiple), node_pad_multiple)
        if bucket_growth and bucket_growth > 1.0:
            g = math.log(bucket_growth)
            Ep = _round_up(int(math.ceil(
                bucket_growth ** math.ceil(math.log(Ep) / g))),
                edge_pad_multiple)
            Np = _round_up(int(math.ceil(
                bucket_growth ** math.ceil(math.log(Np) / g))),
                node_pad_multiple)
        dummy = n_nodes

        # nn_valid/ne_valid ride the jit as 0-d f32 leaves, and the K8
        # backward masks padded slots via an f32 compare (slot < n_edges) —
        # both exact only up to 2^24.  Beyond that a graph would silently get
        # wrong BatchNorm statistics and wrong gradient masks, so refuse
        # loudly (the decode path has the analogous explicit 2^24 fallback).
        if Ep > 2 ** 24 or Np > 2 ** 24:
            raise ValueError(
                f"GraphTensors supports at most 2^24 padded nodes/edges "
                f"(f32-exact count leaves); got Np={Np}, Ep={Ep}. "
                f"Partition the graph (parallel/) before building.")

        src_p = np.full(Ep, dummy, dtype=np.int32)
        dst_p = np.full(Ep, dummy, dtype=np.int32)
        src_p[:E] = src
        dst_p[:E] = dst

        # slot order: stable sort by dst; padded edges (dst=dummy=max id)
        # land at the tail
        order = np.argsort(dst_p, kind="stable").astype(np.int32)  # eid per slot
        slot_of_eid = np.empty(Ep, dtype=np.int32)
        slot_of_eid[order] = np.arange(Ep, dtype=np.int32)

        edge_mask = np.zeros((Ep, 1), dtype=np.float32)
        edge_mask[slot_of_eid[:E]] = 1.0
        node_mask = np.zeros((Np, 1), dtype=np.float32)
        node_mask[:n_nodes] = 1.0

        gt = cls(
            src=jnp.asarray(src_p[order]), dst=jnp.asarray(dst_p[order]),
            slot_of_eid=jnp.asarray(slot_of_eid),
            eid_of_slot=jnp.asarray(order),
            edge_mask=jnp.asarray(edge_mask),
            node_mask=jnp.asarray(node_mask),
            nn_valid=jnp.asarray(np.float32(n_nodes)),
            ne_valid=jnp.asarray(np.float32(E)),
            n_nodes=n_nodes, n_edges=E, n_nodes_pad=Np, n_edges_pad=Ep,
        )
        # host-side copies for the windowed/halo planners and the example
        # builders: fetching arrays back from a tunneled TPU costs seconds
        # (worst case minutes) per array.  Not a pytree field — carried on
        # built instances and preserved by with_windowed_plans.
        object.__setattr__(gt, "_host", {
            "src": src_p[order], "dst": dst_p[order], "edge_mask": edge_mask,
            "node_mask": node_mask,
            "eid_of_slot": order, "slot_of_eid": slot_of_eid,
        })
        return gt

    def host(self, name: str) -> np.ndarray:
        """Host copy of a per-edge field (``src``/``dst``/``edge_mask``/
        ``eid_of_slot``/``slot_of_eid``), avoiding a device->host transfer
        when the build-time cache is present."""
        cache = getattr(self, "_host", None)
        if cache is not None and name in cache:
            return cache[name]
        return np.asarray(getattr(self, name))

    @classmethod
    def from_graph(cls, graph, edge_pad_multiple: int = 512,
                   node_pad_multiple: int = 128,
                   divisible_by: int = 1) -> "GraphTensors":
        return cls.build(graph.src, graph.dst, graph.num_nodes,
                         edge_pad_multiple, node_pad_multiple, divisible_by)

    def host_prefix_mask(self, n_real: int | None = None) -> np.ndarray:
        """Float32 [Ep] validity mask for HOST-edge-order arrays, where real
        edges are exactly the ``[:n_edges]`` prefix.

        This is THE mask to pair with host-ordered labels/logits
        (``slot_io=False``).  ``edge_mask`` is slot order, and since the
        tail-overflow reslot the two orderings differ (real edges live in
        the interior AND the tail region) — mixing them silently leaks pad
        logits into a loss.  ``n_real`` overrides ``self.n_edges`` for
        callers that rounded the static count up to the padded size (shape
        bucketing)."""
        n = self.n_edges if n_real is None else n_real
        return (np.arange(self.n_edges_pad) < n).astype(np.float32)

    # ----------------------------------------------------- edge-order mapping
    def edges_to_slots(self, x: jax.Array) -> jax.Array:
        """Host-edge-order [Ep, ...] -> slot order (device, one narrow gather)."""
        return _permute_rows(self.eid_of_slot, self.slot_of_eid, x)

    def slots_to_edges(self, x: jax.Array) -> jax.Array:
        """Slot order [Ep, ...] -> host edge order."""
        return _permute_rows(self.slot_of_eid, self.eid_of_slot, x)

    # ------------------------------------------------------------- transforms
    def pad_nodes(self, x: np.ndarray, fill: float = 0.0) -> jnp.ndarray:
        """Pad a [n_nodes, D] host feature array to [Np, D]."""
        out = np.full((self.n_nodes_pad,) + x.shape[1:], fill, dtype=np.float32)
        out[: self.n_nodes] = x
        return jnp.asarray(out)

    def pad_edges(self, x: np.ndarray, fill: float = 0.0) -> jnp.ndarray:
        """Pad a host-edge-order [n_edges, D] array to [Ep, D] (still host
        edge order — the model converts to slots at its boundary)."""
        out = np.full((self.n_edges_pad,) + x.shape[1:], fill, dtype=np.float32)
        out[: self.n_edges] = x
        return jnp.asarray(out)


jax.tree_util.register_dataclass(
    GraphTensors,
    data_fields=["src", "dst", "slot_of_eid", "eid_of_slot", "edge_mask",
                 "node_mask", "wplan", "wplan_flip", "nn_valid", "ne_valid"],
    meta_fields=["n_nodes", "n_edges", "n_nodes_pad", "n_edges_pad",
                 "dst_sorted"],
)


def _tailed_layout(gt: GraphTensors, ovf_slot_mask: np.ndarray,
                   Ep2: int, R: int) -> GraphTensors:
    """New GraphTensors with the overflow edges moved into the contiguous
    region ``[Ep2 - R, Ep2)`` and their old interior slots turned into pad
    slots — interior slot POSITIONS are preserved (crucial: shifting them
    would re-plan every tile and spawn new overflow), and the edge padding
    grows from ``n_edges_pad`` to ``Ep2`` to make room.

    Marks ``dst_sorted=False`` (the region breaks global dst order)."""
    import dataclasses

    Ep, E = gt.n_edges_pad, gt.n_edges
    dummy = gt.n_nodes
    src = gt.host("src")
    dst = gt.host("dst")
    emask = gt.host("edge_mask")
    eos = gt.host("eid_of_slot")
    ovf_pos = np.nonzero(ovf_slot_mask)[0]
    n_ovf = int(ovf_pos.shape[0])
    E0 = Ep2 - R

    src2 = np.full(Ep2, dummy, dtype=src.dtype)
    dst2 = np.full(Ep2, dummy, dtype=dst.dtype)
    em2 = np.zeros((Ep2, 1), dtype=np.float32)
    eid2 = np.empty(Ep2, dtype=eos.dtype)
    src2[:Ep], dst2[:Ep], em2[:Ep], eid2[:Ep] = src, dst, emask, eos
    # region: the overflow edges in their original relative order, then pads
    src2[E0:E0 + n_ovf] = src[ovf_pos]
    dst2[E0:E0 + n_ovf] = dst[ovf_pos]
    em2[E0:E0 + n_ovf] = 1.0
    eid2[E0:E0 + n_ovf] = eos[ovf_pos]
    # vacated interior slots become pads; forward-fill their endpoint values
    # so the tile-median window planning is not skewed by dummy ids (the
    # values are never read with a non-zero mask)
    em2[ovf_pos] = 0.0
    ffill = np.maximum.accumulate(
        np.where(ovf_slot_mask, -1, np.arange(Ep)))
    ffill = np.maximum(ffill, 0)
    src2[ovf_pos] = src[ffill[ovf_pos]]
    dst2[ovf_pos] = dst[ffill[ovf_pos]]
    # pad edge-ids: vacated slots + the new middle/region pads take the
    # fresh ids [Ep, Ep2) (any bijection works for pad ids)
    new_ids = np.arange(Ep, Ep2, dtype=eos.dtype)
    eid2[ovf_pos] = new_ids[:n_ovf]
    rest = np.concatenate([np.arange(Ep, E0), np.arange(E0 + n_ovf, Ep2)])
    eid2[rest] = new_ids[n_ovf:]
    soe2 = np.empty_like(eid2)
    soe2[eid2] = np.arange(Ep2, dtype=eid2.dtype)

    out = dataclasses.replace(
        gt, src=jnp.asarray(src2), dst=jnp.asarray(dst2),
        slot_of_eid=jnp.asarray(soe2), eid_of_slot=jnp.asarray(eid2),
        edge_mask=jnp.asarray(em2), n_edges_pad=Ep2, dst_sorted=False)
    object.__setattr__(out, "_host", {
        "src": src2, "dst": dst2, "edge_mask": em2,
        "node_mask": gt.host("node_mask"),
        "eid_of_slot": eid2, "slot_of_eid": soe2,
    })
    return out


def with_windowed_plans(gt: GraphTensors, flip_too: bool = True,
                        tile_e: int | None = None,
                        window: int | None = None,
                        window_v: int | None = None,
                        divisible_by: int = 1) -> GraphTensors:
    """Attach Pallas windowed-kernel plans (enables backend='pallas').

    With no explicit ``window``/``window_v``, each side of each plan
    auto-selects its cheapest (block rows, block count) config from the
    graph's measured endpoint spans (ops/windowed.py); module overrides
    (``windowed.WINDOW``/``WINDOW_V``, set by the perf probes) force
    explicit 2-block configs.  The v (slot-sort-key) side is the narrow one
    — in the flip plan the roles swap, so there the narrow side is u (still
    the sort key)."""
    import dataclasses
    from . import windowed as W

    wu, wv = window, window_v
    if wu is None and wv is None and not W.AUTO_SELECT:
        wu, wv = W.WINDOW, W.WINDOW_V
    elif wu is not None and wv is None:
        wv = wu
    elif wu is None and wv is not None:
        wu = W.WINDOW
    te = tile_e or W.TILE_E
    build_plan = W.build_windowed_plan
    plan = build_plan(gt, flip=False, tile_e=te, window=wu, window_v=wv)
    plan_flip = (build_plan(gt, flip=True, tile_e=te, window=wv,
                            window_v=wu) if flip_too else None)
    # tail-overflow reslot: patched edges move into one contiguous region so
    # the XLA patch paths are slices, not gathers + full-array scatters
    gt, plan, plan_flip = W.plan_tail_overflow(gt, plan, plan_flip, flip_too,
                                               te, wu, wv,
                                               divisible_by=divisible_by)
    out = dataclasses.replace(gt, wplan=plan, wplan_flip=plan_flip)
    host = getattr(gt, "_host", None)
    if host is not None:      # dataclasses.replace drops non-field attrs
        object.__setattr__(out, "_host", host)
    return out
