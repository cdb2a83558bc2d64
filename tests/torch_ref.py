"""Torch oracle for golden-parity tests.

An independent re-implementation of the reference SymGatedGCNModel
(models/full_graph.py:9-30, layers/gated_gcn_full.py:82-142,
layers/score_predictor.py:12-24) with the same parameter names, so the shipped
``weights.pt`` loads directly.  DGL's ``update_all``/``apply_edges`` message
passing is expressed with index_select/index_add — bit-equal math on CPU.

Used only by tests; the framework itself never imports torch for compute.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def _scatter_sum(values: torch.Tensor, index: torch.Tensor, n: int) -> torch.Tensor:
    out = torch.zeros((n,) + values.shape[1:], dtype=values.dtype)
    return out.index_add_(0, index, values)


class RefSymGatedGCNLayer(nn.Module):
    def __init__(self, d, normalization="batch", dropout=0.0):
        super().__init__()
        self.dropout = dropout or 0.0
        self.normalization = normalization
        for name in ("A_1", "A_2", "A_3", "B_1", "B_2", "B_3"):
            setattr(self, name, nn.Linear(d, d))
        if normalization == "batch":
            self.bn_h = nn.BatchNorm1d(d, track_running_stats=True)
            self.bn_e = nn.BatchNorm1d(d, track_running_stats=True)
        elif normalization == "layer":
            self.bn_h = nn.LayerNorm(d)
            self.bn_e = nn.LayerNorm(d)

    def forward(self, src, dst, h, e):
        n = h.shape[0]
        h_in, e_in = h.clone(), e.clone()
        A1h, A2h, A3h = self.A_1(h), self.A_2(h), self.A_3(h)
        B1h, B2h, B3e = self.B_1(h), self.B_2(h), self.B_3(e)

        # forward direction (gated_gcn_full.py:104-114)
        e_ji = B1h[src] + B2h[dst] + B3e
        if self.normalization != "none":
            e_ji = self.bn_e(e_ji)
        e_ji = F.relu(e_ji) + e_in
        sigma_f = torch.sigmoid(e_ji)
        num = _scatter_sum(sigma_f * A2h[src], dst, n)
        den = _scatter_sum(sigma_f, dst, n)
        h_forward = num / (den + 1e-6)

        # backward direction on the reversed graph (gated_gcn_full.py:117-127)
        e_ik = B2h[dst] + B1h[src] + B3e
        if self.normalization != "none":
            e_ik = self.bn_e(e_ik)
        e_ik = F.relu(e_ik) + e_in
        sigma_b = torch.sigmoid(e_ik)
        num_b = _scatter_sum(sigma_b * A3h[dst], src, n)
        den_b = _scatter_sum(sigma_b, src, n)
        h_backward = num_b / (den_b + 1e-6)

        h = A1h + h_forward + h_backward
        if self.normalization != "none":
            h = self.bn_h(h)
        h = F.relu(h) + h_in
        h = F.dropout(h, self.dropout, training=self.training)
        return h, e_ji


class RefScorePredictor(nn.Module):
    def __init__(self, in_features, hidden_edge_scores):
        super().__init__()
        self.W1 = nn.Linear(3 * in_features, hidden_edge_scores)
        self.W2 = nn.Linear(hidden_edge_scores, 32)
        self.W3 = nn.Linear(32, 1)

    def forward(self, src, dst, x, e):
        data = torch.cat((x[src], x[dst], e), dim=1)
        h = torch.relu(self.W1(data))
        return self.W3(torch.relu(self.W2(h)))


class _Convs(nn.Module):
    def __init__(self, num_layers, d, normalization, dropout):
        super().__init__()
        self.convs = nn.ModuleList(
            [RefSymGatedGCNLayer(d, normalization, dropout) for _ in range(num_layers)])

    def forward(self, src, dst, h, e):
        for conv in self.convs:
            h, e = conv(src, dst, h, e)
        return h, e


class RefSymGatedGCNModel(nn.Module):
    """State-dict compatible with reference weights.pt."""

    def __init__(self, node_features=2, edge_features=2, hidden_features=64,
                 hidden_ne_features=16, num_layers=8, hidden_edge_scores=64,
                 normalization="batch", dropout=0.0):
        super().__init__()
        self.linear1_node = nn.Linear(node_features, hidden_ne_features)
        self.linear2_node = nn.Linear(hidden_ne_features, hidden_features)
        self.linear1_edge = nn.Linear(edge_features, hidden_ne_features)
        self.linear2_edge = nn.Linear(hidden_ne_features, hidden_features)
        self.gnn = _Convs(num_layers, hidden_features, normalization, dropout)
        self.predictor = RefScorePredictor(hidden_features, hidden_edge_scores)

    def forward(self, src, dst, x, e):
        x = self.linear2_node(torch.relu(self.linear1_node(x)))
        e = self.linear2_edge(torch.relu(self.linear1_edge(e)))
        x, e = self.gnn(src, dst, x, e)
        return self.predictor(src, dst, x, e)

    def forward_flipped(self, src, dst, x, e):
        """Model applied to the edge-reversed graph (train.py:165-168)."""
        return self.forward(dst, src, x, e)
