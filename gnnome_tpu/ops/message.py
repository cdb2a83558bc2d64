"""Message-passing primitives: SDDMM (per-edge) and gated SpMM (per-node).

These replace DGL's ``apply_edges``/``update_all`` kernel dispatches
(reference layers/gated_gcn_full.py:104-127, layers/score_predictor.py:23).

Two backends:

``xla``     gathers + sorted segment-sums.  XLA lowers these to its native TPU
            gather/scatter emitters; with the host-precomputed sort permutation
            the scatter becomes a sorted segment reduction (deterministic,
            fixed-order — required for run-to-run bitwise reproducibility).
``pallas``  hand-written Mosaic kernels (ops/pallas_kernels.py) for the fused
            gate+aggregate hot path; falls back to ``xla`` on unsupported
            shapes.

Autodiff: both paths are differentiable.  Gather's VJP is a scatter-add and
segment-sum's VJP is a gather, so the backward pass has the same cost shape as
the forward pass.
"""
from __future__ import annotations

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


# ---------------------------------------------------------------------- SDDMM
def sddmm_add(a_nodes: jax.Array, b_nodes: jax.Array, e_edges: jax.Array,
              src: jax.Array, dst: jax.Array) -> jax.Array:
    """Per-edge ``a[src] + b[dst] + e`` — the gate input of GatedGCN
    (reference gated_gcn_full.py:104-105 ``u_add_v('B1h','B2h') + B3e``)."""
    return jnp.take(a_nodes, src, axis=0) + jnp.take(b_nodes, dst, axis=0) + e_edges


def gather_src_dst(h: jax.Array, src: jax.Array, dst: jax.Array):
    """(h[src], h[dst]) for edge-wise ops (score predictor concat,
    reference score_predictor.py:13)."""
    return jnp.take(h, src, axis=0), jnp.take(h, dst, axis=0)


# ------------------------------------------------------------------ gated SpMM
def segment_sum_sorted(values: jax.Array, seg_ids: jax.Array,
                       num_segments: int) -> jax.Array:
    """Fixed-order segment sum over pre-sorted segment ids."""
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments,
                               indices_are_sorted=True)


def gated_mean_aggregate(sigma: jax.Array, values: jax.Array,
                         take_idx: jax.Array, seg_ids: jax.Array,
                         perm: jax.Array, num_segments: int,
                         eps: float = 1e-6, backend: str | None = None) -> jax.Array:
    """Gated-mean neighbourhood aggregation.

    out[v] = sum_{edges e with seg(e)=v} sigma[e] * values[take_idx[e]]
             / (sum sigma[e] + eps)

    (reference gated_gcn_full.py:112-114: two ``update_all`` SpMMs +
    normalisation, fused here into one segment reduction over a 65-wide
    payload.)

    ``take_idx``/``seg_ids`` are permuted index arrays (see GraphTensors);
    ``perm`` maps edge order -> sorted-by-segment order for ``sigma``.
    ``sigma`` must already be zero on padded edges.
    """
    backend = backend or _DEFAULT_BACKEND
    if backend == "pallas":
        from .pallas_kernels import gated_mean_aggregate_pallas
        out = gated_mean_aggregate_pallas(sigma, values, take_idx, seg_ids,
                                          perm, num_segments, eps)
        if out is not None:
            return out
    g = jnp.take(sigma, perm, axis=0)
    vals = jnp.take(values, take_idx, axis=0) * g
    payload = jnp.concatenate([vals, g], axis=1)
    summed = segment_sum_sorted(payload, seg_ids, num_segments)
    d = values.shape[1]
    return summed[:, :d] / (summed[:, d:] + eps)


def sym_gated_aggregate(gt: GraphTensors, sigma: jax.Array,
                        a2h: jax.Array, a3h: jax.Array,
                        flip: bool = False, eps: float = 1e-6,
                        backend: str | None = None):
    """Both directions of the symmetric GatedGCN aggregation.

    Returns (h_fwd, h_bwd):
      h_fwd[i] = gated mean over in-edges  (src -> i)  of a2h[src]
      h_bwd[i] = gated mean over out-edges (i -> dst)  of a3h[dst]
    (reference gated_gcn_full.py:111-127.)

    ``flip=True`` computes the same on the edge-reversed graph (used by the
    symmetry loss, reference train.py:165,180) without rebuilding anything:
    roles of the two precomputed directions swap.
    """
    if not flip:
        h_fwd = gated_mean_aggregate(sigma, a2h, gt.fwd_src, gt.fwd_seg,
                                     gt.fwd_perm, gt.n_nodes_pad, eps, backend)
        h_bwd = gated_mean_aggregate(sigma, a3h, gt.bwd_dst, gt.bwd_seg,
                                     gt.bwd_perm, gt.n_nodes_pad, eps, backend)
    else:
        h_fwd = gated_mean_aggregate(sigma, a2h, gt.bwd_dst, gt.bwd_seg,
                                     gt.bwd_perm, gt.n_nodes_pad, eps, backend)
        h_bwd = gated_mean_aggregate(sigma, a3h, gt.fwd_src, gt.fwd_seg,
                                     gt.fwd_perm, gt.n_nodes_pad, eps, backend)
    return h_fwd, h_bwd
