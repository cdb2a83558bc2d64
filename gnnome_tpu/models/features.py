"""Input featurisation (host-side, numpy).

Reproduces the reference's feature pipeline:

* edge features ``e = [z(overlap_length), overlap_similarity]`` with the
  z-score over the graph using the *unbiased* std (torch ``.std()``,
  reference utils/data_utils.py:34-40);
* node features ``x = [z(in_deg), z(out_deg)]`` (reference train.py:112-122,
  inference.py:414-420); the reversed-graph pass swaps the two columns
  (train.py:117-118).
"""
from __future__ import annotations

import numpy as np


def _zscore(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.float32)
    std = v.std(ddof=1) if v.size > 1 else 1.0
    return (v - v.mean()) / std


def edge_features(graph, use_similarities: bool = True) -> np.ndarray:
    ol = _zscore(graph.overlap_length)
    if use_similarities:
        if graph.overlap_similarity is None:
            raise ValueError("graph has no overlap_similarity; parse with "
                             "get_similarities=True or set use_similarities=False")
        return np.stack([ol, graph.overlap_similarity.astype(np.float32)], axis=1)
    return ol[:, None]


def node_features(graph, reverse: bool = False) -> np.ndarray:
    pe_in = _zscore(graph.in_degrees())
    pe_out = _zscore(graph.out_degrees())
    if reverse:
        return np.stack([pe_out, pe_in], axis=1)
    return np.stack([pe_in, pe_out], axis=1)
