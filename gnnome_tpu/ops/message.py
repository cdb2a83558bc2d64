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
def gather_endpoints(values: jax.Array, gt: GraphTensors, flip: bool = False):
    """(values[src], values[dst]) in slot order — ONE gather per endpoint;
    callers slice columns out of the fused result."""
    if flip:
        return jnp.take(values, gt.dst, axis=0), jnp.take(values, gt.src, axis=0)
    return jnp.take(values, gt.src, axis=0), jnp.take(values, gt.dst, axis=0)


def sddmm_add(a_nodes, b_nodes, e_edges, src, dst):
    """Per-edge ``a[src] + b[dst] + e`` (reference gated_gcn_full.py:104-105).
    Kept for generic use; the SymGatedGCN layer uses fused endpoint gathers."""
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
    if backend == "pallas":
        from .pallas_kernels import gated_mean_pair_pallas
        out = gated_mean_pair_pallas(gt, sigma, a2h_src, a3h_dst, flip, eps)
        if out is not None:
            return out

    n = gt.n_nodes_pad
    acc = jnp.float32
    pay_f = jnp.concatenate([sigma * a2h_src, sigma], axis=1).astype(acc)
    pay_b = jnp.concatenate([sigma * a3h_dst, sigma], axis=1).astype(acc)
    d = a2h_src.shape[1]
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
