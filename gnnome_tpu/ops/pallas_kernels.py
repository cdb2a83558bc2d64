"""Pallas/Mosaic TPU kernels for the message-passing hot path.

Placeholder backend for round-1: returns None (caller falls back to the XLA
path).  The planned kernel is a block-sparse gated SpMM: nodes are band-ordered
(assembly graphs are nearly path-shaped, so a genome ordering concentrates
edges near the diagonal), edges are grouped into (dst_tile, src_tile) blocks,
and within a block both the gather (one-hot(src_local) @ h_tile) and the
scatter (one-hot(dst_local)^T @ messages) run on the MXU.
"""
from __future__ import annotations


def gated_mean_pair_pallas(gt, sigma, a2h_src, a3h_dst, flip, eps):
    return None
