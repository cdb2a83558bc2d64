"""Device-resident graph representation for TPU message passing.

This is the TPU-first replacement for ``dgl.DGLGraph`` on the compute path
(reference layers/gated_gcn_full.py:82-142 drives everything through DGL's
``apply_edges``/``update_all``):

* static, padded shapes — edge/node arrays padded to configurable multiples so
  XLA compiles one program per shape bucket;
* both traversal directions precomputed **once** (the reference re-materialises
  ``dgl.reverse(g)`` inside every layer, gated_gcn_full.py:99);
* aggregation uses sorted segment ids + a host-precomputed permutation so the
  device-side scatter is a sorted segment-sum (fast path on TPU);
* padded edges carry a zero mask and point at a dummy node row, so they are
  numerically inert everywhere (gates are masked, batch-norm statistics are
  mask-corrected).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class GraphTensors:
    """Padded COO graph + permutations for both aggregation directions.

    Edge-id order of ``src``/``dst`` matches the host ``AssemblyGraph`` edge
    order, so per-edge model outputs line up with labels/decoder arrays.
    """
    # --- leaves (device arrays) ---
    src: jax.Array              # int32 [Ep]  (padded entries -> dummy node)
    dst: jax.Array              # int32 [Ep]
    fwd_src: jax.Array          # int32 [Ep]  = src[perm_fwd]
    fwd_seg: jax.Array          # int32 [Ep]  = dst[perm_fwd]   (sorted)
    fwd_perm: jax.Array         # int32 [Ep]  permutation edge-order -> by-dst
    bwd_dst: jax.Array          # int32 [Ep]  = dst[perm_bwd]
    bwd_seg: jax.Array          # int32 [Ep]  = src[perm_bwd]   (sorted)
    bwd_perm: jax.Array         # int32 [Ep]
    edge_mask: jax.Array        # float32 [Ep, 1]  1 for real edges
    node_mask: jax.Array        # float32 [Np, 1]  1 for real nodes
    # --- static aux (metadata, not traced) ---
    n_nodes: int = 0
    n_edges: int = 0
    n_nodes_pad: int = 0
    n_edges_pad: int = 0

    # ------------------------------------------------------------------ build
    @classmethod
    def build(cls, src: np.ndarray, dst: np.ndarray, n_nodes: int,
              edge_pad_multiple: int = 512, node_pad_multiple: int = 128):
        """Host-side construction from COO arrays (numpy)."""
        E = int(src.shape[0])
        Ep = max(_round_up(E, edge_pad_multiple), edge_pad_multiple)
        # dummy node must exist: pad nodes to >= n_nodes + 1
        Np = max(_round_up(n_nodes + 1, node_pad_multiple), node_pad_multiple)
        dummy = n_nodes  # first padded row

        src_p = np.full(Ep, dummy, dtype=np.int32)
        dst_p = np.full(Ep, dummy, dtype=np.int32)
        src_p[:E] = src
        dst_p[:E] = dst

        perm_fwd = np.argsort(dst_p, kind="stable").astype(np.int32)
        perm_bwd = np.argsort(src_p, kind="stable").astype(np.int32)

        edge_mask = np.zeros((Ep, 1), dtype=np.float32)
        edge_mask[:E] = 1.0
        node_mask = np.zeros((Np, 1), dtype=np.float32)
        node_mask[:n_nodes] = 1.0

        return cls(
            src=jnp.asarray(src_p), dst=jnp.asarray(dst_p),
            fwd_src=jnp.asarray(src_p[perm_fwd]),
            fwd_seg=jnp.asarray(dst_p[perm_fwd]),
            fwd_perm=jnp.asarray(perm_fwd),
            bwd_dst=jnp.asarray(dst_p[perm_bwd]),
            bwd_seg=jnp.asarray(src_p[perm_bwd]),
            bwd_perm=jnp.asarray(perm_bwd),
            edge_mask=jnp.asarray(edge_mask),
            node_mask=jnp.asarray(node_mask),
            n_nodes=n_nodes, n_edges=E, n_nodes_pad=Np, n_edges_pad=Ep,
        )

    @classmethod
    def from_graph(cls, graph, edge_pad_multiple: int = 512,
                   node_pad_multiple: int = 128) -> "GraphTensors":
        return cls.build(graph.src, graph.dst, graph.num_nodes,
                         edge_pad_multiple, node_pad_multiple)

    # ------------------------------------------------------------- transforms
    def pad_nodes(self, x: np.ndarray, fill: float = 0.0) -> jnp.ndarray:
        """Pad a [n_nodes, D] host feature array to [Np, D]."""
        out = np.full((self.n_nodes_pad,) + x.shape[1:], fill, dtype=np.float32)
        out[: self.n_nodes] = x
        return jnp.asarray(out)

    def pad_edges(self, x: np.ndarray, fill: float = 0.0) -> jnp.ndarray:
        out = np.full((self.n_edges_pad,) + x.shape[1:], fill, dtype=np.float32)
        out[: self.n_edges] = x
        return jnp.asarray(out)


jax.tree_util.register_dataclass(
    GraphTensors,
    data_fields=["src", "dst", "fwd_src", "fwd_seg", "fwd_perm",
                 "bwd_dst", "bwd_seg", "bwd_perm", "edge_mask", "node_mask"],
    meta_fields=["n_nodes", "n_edges", "n_nodes_pad", "n_edges_pad"],
)
