"""Analytic multi-chip scaling projection from measured quantities.

The BASELINE target is >=80% edges/s scaling efficiency from 1 chip -> 1 host
-> >=2 hosts, but only ONE real chip is reachable here, so the efficiency is
*projected* from quantities this host can measure exactly:

* the halo plan's strip width ``K`` and overflow row count ``Rpad`` for the
  actual graph at each device count (host-side numpy, exact);
* the measured single-chip train/eval step time (bench.py, real TPU);
* published TPU interconnect figures (assumptions below).

Wire traffic per device per layer per direction-pass (parallel/halo.py):

  - raw boundary strips OUT, 2 ppermutes x [K, d] in the compute dtype
    (layer-tail, double-buffered across the scan back-edge);
  - src-side partial sums BACK, 2 ppermutes x [K, 2d] f32;
  - overflow rows, psum of [Rpad, 2d] dtype + [Rpad, 2d] f32 (ring
    all-reduce moves ~2*(P-1)/P of the payload through each link).

A symmetry train step runs ``passes=2`` directional passes, each with a
forward and a backward traversal (backward moves the same strip volume as
forward: grad-of-ppermute is the reverse ppermute), plus one grad psum of the
replicated ~220k-param model.  Efficiency is reported both assuming the
structural overlap hides communication under compute (``eff_overlap`` —
step = max(compute, wire)) and assuming none of it overlaps
(``eff_serial`` — step = compute + wire); the truth lies between, nearer the
overlap bound because the exchange is double-buffered by construction
(tests/test_halo.py pins the 6-collective-permute structure).

Interconnect assumptions (public figures): v5e moves 1600 Gbps/chip over the
2D-torus ICI => ~25 GB/s per link direction; v5p 4800 Gbps => ~50 GB/s.  DCN
(inter-host for v5e pods over data-center network) ~6.25 GB/s/host each way.
Reference scaling analogue: the reference has no distributed execution at all
(SURVEY.md section 2c); METIS cluster minibatching (train.py:335) is its only
big-graph mechanism.
"""
from __future__ import annotations

from dataclasses import dataclass

ICI_GBPS = {"v5e": 25.0, "v5p": 50.0}
DCN_GBPS_PER_HOST = 6.25
HOP_LATENCY_S = 1e-6
PARAM_BYTES = 220_529 * 4  # replicated model grads, f32

# Measured v5e op costs on the 1.57M-edge bench graph, normalised per edge
# (IMPLEMENTATION_NOTES "Measured v5e cost model" — real-chip measurements,
# round 2).  These size the OVERLAP WINDOWS of the halo schedule: the ops
# that XLA's latency-hiding scheduler runs while each transfer is in flight
# (parallel/halo.py _halo_layer ordering).
SEC_PER_EDGE = {
    "gather_f32": 20e-3 / 1_572_864,        # row gather [E, 64] f32
    "segsum_sorted_f32": 14e-3 / 1_572_864,  # sorted segment-sum [E, 65]
}
# BatchNorm statistics psums (training): 2 per BN per layer, 2 BNs; their
# payload is [d] — pure latency, NOT hideable (the affine needs the result)
BN_PSUMS_PER_LAYER_TRAIN = 4


@dataclass(frozen=True)
class ScalingPoint:
    P: int                 # device count
    K: int                 # halo strip rows (from the real plan)
    Rpad: int              # padded overflow rows (from the real plan)
    t_compute_s: float     # projected per-device compute time per step
    t_wire_s: float        # projected per-device wire time per step
    eff_overlap: float     # step = max(compute, wire) — structural bound
    eff_serial: float      # step = compute + wire — zero-overlap bound
    # step = compute + (wire - hidden): each transfer hides under the
    # MEASURED cost of the specific ops the halo schedule interleaves it
    # with (see overlap_windows) — the justified operating point
    eff_overlap_measured: float = 0.0
    t_hidden_s: float = 0.0

    def as_dict(self):
        return {"P": self.P, "K": self.K, "Rpad": self.Rpad,
                "t_compute_s": round(self.t_compute_s, 6),
                "t_wire_s": round(self.t_wire_s, 6),
                "t_hidden_s": round(self.t_hidden_s, 6),
                "eff_overlap": round(self.eff_overlap, 4),
                "eff_overlap_measured": round(self.eff_overlap_measured, 4),
                "eff_serial": round(self.eff_serial, 4)}


def layer_wire_bytes(K: int, Rpad: int, P: int, d: int = 64,
                     dtype_bytes: int = 2) -> float:
    """Bytes through one device's busiest link for ONE layer, one direction
    pass (forward).  Strips ride left/right links concurrently, so the raw
    strip and the returning partial are serial on a link but the two
    directions are not summed."""
    strips_out = K * d * dtype_bytes          # raw [K, d] boundary strip
    partials_back = K * 2 * d * 4             # [K, 2d] f32 partial sums
    ring = 2.0 * (P - 1) / P if P > 1 else 0.0
    overflow = ring * (Rpad * 2 * d * dtype_bytes + Rpad * 2 * d * 4)
    return strips_out + partials_back + overflow


def overlap_windows(n_edges_shard: float, K: int, Rpad: int, P: int,
                    d: int = 64, dtype_bytes: int = 2,
                    link_gbps: float = ICI_GBPS["v5e"]):
    """(hideable wire seconds, total wire seconds) for ONE layer, one
    traversal, from the MEASURED per-op costs.

    The halo schedule (parallel/halo.py _halo_layer) interleaves each
    transfer with a specific strip-independent op; a transfer hides up to
    that op's measured duration on the shard:

      * raw [K, d] strips ride the scan back-edge: issued at the previous
        layer's tail, consumed by the receiver-side projection at this
        layer's head — window = the dst-side LOCAL gather ([Eb, 2d]),
        which never depends on the strips (a strict under-estimate of the
        true window, which also spans the node stage and projections);
      * returning [K, 2d] partial sums — window = the dst-side sorted
        segment-sum (into_dst), explicitly scheduled between issue and use;
      * overflow psum ([Rpad, 2d]) — window = the same local gather.
    """
    bw = link_gbps * 1e9
    t_gather = SEC_PER_EDGE["gather_f32"] * n_edges_shard * 2  # [Eb, 2d]
    t_segsum = SEC_PER_EDGE["segsum_sorted_f32"] * n_edges_shard
    ring = 2.0 * (P - 1) / P if P > 1 else 0.0
    t_raw = K * d * dtype_bytes / bw
    t_part = K * 2 * d * 4 / bw
    t_ovf = ring * (Rpad * 2 * d * dtype_bytes + Rpad * 2 * d * 4) / bw
    # raw strips and the overflow psum hide under the SAME gather op, so
    # they share its duration (summing two min(.., t_gather) terms would
    # let 2x the gather's seconds hide under one op and overstate overlap
    # exactly in the transfer-dominated regime this estimate exists to
    # bound)
    hidden = min(t_raw + t_ovf, t_gather) + min(t_part, t_segsum)
    return hidden, t_raw + t_part + t_ovf


def project_step(t_step_1chip_s: float, P: int, K: int, Rpad: int,
                 num_layers: int = 8, d: int = 64, dtype_bytes: int = 2,
                 link_gbps: float = ICI_GBPS["v5e"], passes: int = 2,
                 train: bool = True, n_edges: float = 0.0) -> ScalingPoint:
    """Project one train/eval step at device count P from a measured
    single-chip step time on the SAME graph."""
    if P <= 1:
        return ScalingPoint(1, K, Rpad, t_step_1chip_s, 0.0, 1.0, 1.0,
                            1.0, 0.0)
    bw = link_gbps * 1e9
    per_layer = layer_wire_bytes(K, Rpad, P, d, dtype_bytes)
    traversals = 2 if train else 1            # backward re-moves the strips
    wire_bytes = passes * traversals * num_layers * per_layer
    n_coll = passes * traversals * num_layers * 6
    if train:
        n_coll += passes * num_layers * 2 * BN_PSUMS_PER_LAYER_TRAIN
    t_wire = wire_bytes / bw + n_coll * HOP_LATENCY_S
    if train:  # grad psum of the replicated params (ring all-reduce)
        t_wire += 2.0 * (P - 1) / P * PARAM_BYTES / bw
    t_comp = t_step_1chip_s / P
    t_overlap = max(t_comp, t_wire)
    t_serial = t_comp + t_wire
    # measured-window overlap: wire beyond each transfer's hiding window
    # serialises; latency terms and the grad psum never hide
    hid_layer, _ = overlap_windows(max(n_edges, 1.0) / P, K, Rpad, P, d,
                                   dtype_bytes, link_gbps)
    t_hidden = passes * traversals * num_layers * hid_layer
    t_measured = t_comp + max(t_wire - t_hidden, 0.0)
    # efficiency: aggregate edges/s at P devices vs P * single-chip rate
    return ScalingPoint(P, K, Rpad, t_comp, t_wire,
                        t_step_1chip_s / (P * t_overlap),
                        t_step_1chip_s / (P * t_serial),
                        t_step_1chip_s / (P * t_measured),
                        min(t_hidden, t_wire))


def project_curve(gt, e_feat_host, t_step_1chip_s: float,
                  device_counts=(2, 4, 8, 16, 32),
                  num_layers: int = 8, d: int = 64, dtype_bytes: int = 2,
                  link_gbps: float = ICI_GBPS["v5e"], passes: int = 2,
                  train: bool = True) -> list[ScalingPoint]:
    """Build the REAL halo plan at each device count (exact K/Rpad for this
    graph) and project the efficiency curve.  Skips counts whose plan fails
    (graph not banded enough / indivisible padding)."""
    from .halo import build_halo_plan

    out = [ScalingPoint(1, 0, 0, t_step_1chip_s, 0.0, 1.0, 1.0, 1.0, 0.0)]
    for P in device_counts:
        plan = (build_halo_plan(gt, e_feat_host, P)
                if gt.n_nodes_pad % P == 0 else None)
        if plan is None:
            continue
        out.append(project_step(t_step_1chip_s, P, plan.K, plan.Rpad,
                                num_layers, d, dtype_bytes, link_gbps,
                                passes, train, n_edges=float(gt.n_edges)))
    return out
