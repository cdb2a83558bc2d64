"""Host-side planning for the windowed Pallas message-passing kernels.

Assembly graphs are banded (reads ordered along the genome), so for a tile of
``tile_e`` consecutive dst-sorted edge slots, both endpoints' node ids fall in
a narrow window.  The plan quantises those windows to runs of ``k``
consecutive ``window``-row blocks per endpoint (coverage = k*window rows) so
Pallas block specs can prefetch them; edges whose endpoints escape the window
are routed to a small XLA overflow path.

The select/scatter MAC cost of every kernel is proportional to the coverage,
but the coverage a tile NEEDS is its endpoint span plus the block-alignment
slack (anchors are quantised to ``window`` rows): guaranteed coverage of a
``(window, k)`` config is ``(k-1)*window + 1``.  More, smaller blocks buy the
same guarantee at less coverage — e.g. 4x128 covers any 385-row span at
coverage 512 where 2x384 needs 768.  ``build_windowed_plan`` auto-selects the
cheapest per-endpoint config whose EXACT (host-counted) overflow stays under
a budget; the v (slot-sort-key) side typically lands far narrower than the
u side, whose span is the graph's overlap-band width.

Per-edge local indices are stored **lane-major** ``[Ep/chunk, chunk]`` (slot
``s`` lives at row ``s // chunk``, lane ``s % chunk``): a column-vector
``[Ep, 1]`` layout tiles to 128 lanes in HBM, so each kernel would stream
128x the index bytes (measured: ~1 MB/tile/array of pure padding — the
dominant kernel cost before this layout).  Lane-major rows feed the
transposed one-hot build directly (iota over sublanes vs a broadcast lane
row), no in-kernel relayout.

Built once per GraphTensors on host (numpy).  All shapes static.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

TILE_E = 2048    # edges per kernel tile (amortises window DMA + partial rows)
AUTO_SELECT = True   # pick per-side (window, k) from the graph's spans
WINDOW = 512     # fallback u-side block rows (k=2) when auto-select is off
WINDOW_V = 384   # fallback v-side block rows
CHUNK = 1024     # edge rows per in-kernel step (one-hot lane width).
                 # Bigger chunks = fewer, larger select/scatter dots: 1024
                 # beats 512 by ~2% and 256 by ~12% on the bench train step
                 # (same MACs — per-dot overhead is what varies)
# (TILE_E, coverage) trade one-hot flops (~4*cov*d per edge per kernel)
# against overflow AND per-tile pipeline overhead: on the bench graph
# 2048-edge tiles with ~1024-row u coverage -> 0.26% overflow; halving
# tile_e halves the flops but DOUBLES the tile count and measured ~15%
# SLOWER end-to-end (scripts/k3_ablate.py).
# auto-select cost model: per-side cost = coverage * n_tiles (select/scatter
# MACs + window DMA) + OVF_ROWTILES * n_ovf (the XLA patch path).  The weight
# comes from v5e measurements on the 1.57M-edge bench graph: one coverage row
# costs ~0.33 us/tile across the training step's kernels, one overflow edge
# ~12 us/step => ~36 row-tiles per overflow edge.
OVF_ROWTILES = 36.0
# per-block-ref overhead, in coverage-row equivalents: each extra block in a
# run adds a select dot, a scatter partial array (zeroing + write-back DMA)
# and pipeline latency.  Calibrated on the v5e bench-graph sweep: a 4x128 run
# matches a 2x384 run (cover 512 vs 768) and a 4x256 run loses ~46 ms/step to
# 2x512 at equal coverage => overhead ~= 128 rows per block.
K_ROWS = 128
# candidate (window, k) configs; windows dividing 512 are always legal for
# the padded node counts (multiples of 512, train/step.py effective_pads),
# 384-row windows whenever Np % 384 == 0 (the builder checks)
_CONFIGS = ((128, 2), (128, 3), (256, 2), (128, 4), (384, 2), (256, 3),
            (512, 2), (256, 4), (384, 3), (512, 3), (512, 4))
# probe overrides: force one side's (window, k) in auto mode; settable via
# env for on-chip sweeps (GN_FORCE_U="256,3" GN_FORCE_V="128,4")
def _force_env(name):
    import os
    s = os.environ.get(name, "")
    if not s:
        return None
    try:
        w, k = s.split(",")
        return int(w), int(k)
    except ValueError:
        raise ValueError(
            f"{name} must be 'W,K' (e.g. '256,3'), got {s!r}") from None


FORCE_U: tuple[int, int] | None = _force_env("GN_FORCE_U")
FORCE_V: tuple[int, int] | None = _force_env("GN_FORCE_V")


@dataclass(frozen=True)
class WindowedPlan:
    # --- leaves ---
    u_blk: jax.Array        # int32 [T]  first u-window block per tile,
    v_blk: jax.Array        # int32 [T]  NON-DECREASING (monotone => kernels
                            #            accumulate partials per block run)
    u_local: jax.Array      # int32 [T*rows_p, chunk] lane-major: tile t's
                            #   chunk c lives at row t*rows_p + c (rows_p =
                            #   tile_e/chunk padded up to a multiple of 8 for
                            #   the sublane tiling; pad rows hold sentinels);
                            #   value = src - u_blk*W, sentinel k*W if
                            #   overflow/padded
    v_local: jax.Array      # int32 [T*rows_p, chunk]
    # parity-split locals for the PACKED edge layout (edge 2r in lanes 0:d of
    # packed row r, edge 2r+1 in lanes d:2d — [Ep/2, 2d] arrays have no
    # 128-lane padding): column j of the even/odd array is edge 2j / 2j+1 of
    # the chunk, so the packed kernels build one one-hot per parity against
    # the SAME node windows (adjacent slots share windows)
    u_local_e: jax.Array    # int32 [T*rows_p, chunk//2]
    u_local_o: jax.Array    # int32 [T*rows_p, chunk//2]
    v_local_e: jax.Array    # int32 [T*rows_p, chunk//2]
    v_local_o: jax.Array    # int32 [T*rows_p, chunk//2]
    u_visited: jax.Array    # float32 [NB] 1 where some tile wrote block b
    v_visited: jax.Array    # float32 [NB]
    ovf_slots: jax.Array    # int32 [n_ovf_pad] overflow edge slots (pad: Ep-1*)
                            #   tail mode: ovf_start + arange(R), contiguous
    ovf_mask: jax.Array     # float32 [n_ovf_pad, 1] 1 for real overflow rows
    # exact valid-edge degree per node by endpoint role (host bincount; the
    # batch-stat backward's c1*deg term needs it exactly — the kernel's
    # summed counts may ride bf16 partials)
    deg_u: jax.Array = None  # float32 [n_pad]
    deg_v: jax.Array = None  # float32 [n_pad]
    # --- static ---
    tile_e: int = TILE_E
    window: int = WINDOW    # u-side block rows
    chunk: int = CHUNK
    n_tiles: int = 0
    n_pad: int = 0          # padded node count of the owning GraphTensors
    u_all: bool = False     # every u block visited => combine can skip the
    v_all: bool = False     #   visited-mask pass (one full [NB*W, D] sweep)
    window_v: int = 0       # v-side block rows (0 => same as ``window``)
    k_u: int = 2            # u-side blocks per tile (coverage = k_u*window)
    k_v: int = 2            # v-side blocks per tile
    # tail-overflow mode: every patched edge lives in the contiguous slot
    # region [ovf_start, ovf_start + len(ovf_slots)) at the very end of the
    # padded slot space, so the XLA patch paths are static slices instead of
    # gathers + full-array scatters (round-5; ovf_start < 0 = scatter mode)
    ovf_start: int = -1

    @property
    def n_ovf(self) -> int:
        """Exact overflow-edge count (HOST-side diagnostic — ovf_mask's 1s).
        Not a static field: exact counts vary per masked unit and would key
        the jit cache, recompiling every unit (bounded-compile regression,
        tests/test_compile_buckets.py)."""
        import numpy as np
        return int(np.asarray(self.ovf_mask).sum())

    @property
    def win_v(self) -> int:
        return self.window_v or self.window

    @property
    def sentinel(self) -> int:
        """u-side sentinel local index (all-zero one-hot column)."""
        return self.k_u * self.window

    @property
    def sentinel_v(self) -> int:
        return self.k_v * self.win_v

    @property
    def cover_u(self) -> int:
        return self.k_u * self.window

    @property
    def cover_v(self) -> int:
        return self.k_v * self.win_v

    @property
    def n_blocks(self) -> int:
        """Distinct u window-block positions (= Np/W - (k-1)); the
        aggregation kernels emit one (W, D) partial block per position per
        in-run offset."""
        return self.n_pad // self.window - (self.k_u - 1)

    @property
    def n_blocks_v(self) -> int:
        return self.n_pad // self.win_v - (self.k_v - 1)

    @property
    def rows_p(self) -> int:
        """Sublane-padded local-index rows per tile."""
        r = self.tile_e // self.chunk
        return ((r + 7) // 8) * 8


jax.tree_util.register_dataclass(
    WindowedPlan,
    data_fields=["u_blk", "v_blk", "u_local", "v_local",
                 "u_local_e", "u_local_o", "v_local_e", "v_local_o",
                 "u_visited", "v_visited", "ovf_slots", "ovf_mask",
                 "deg_u", "deg_v"],
    meta_fields=["tile_e", "window", "chunk", "n_tiles", "n_pad",
                 "u_all", "v_all", "window_v", "k_u", "k_v", "ovf_start"],
)


def _plan_side(idx: np.ndarray, n_tiles: int, tile_e: int, window: int,
               k: int, max_blk: int, med: np.ndarray | None = None):
    """(blk [T], local [Ep], overflow bool [Ep]) for one endpoint array.
    ``med`` caches the per-tile median (config-independent — the auto-select
    loop hoists it)."""
    tiles = idx.reshape(n_tiles, tile_e)
    cover = k * window
    # choose the k-block window that covers the most edges: anchor on the
    # median endpoint, clamp into range
    if med is None:
        med = np.median(tiles, axis=1).astype(np.int64)
    # centre the k-block run on the median: the median's offset into the
    # [0, cover) window lands in [cover/2 - W/2, cover/2 + W/2)
    blk = np.clip((med - (cover - window) // 2) // window,
                  0, max_blk).astype(np.int32)
    # monotone non-decreasing blocks: lets the kernels keep window partials
    # in VMEM across consecutive tiles (and makes the combine a reshape+add
    # instead of a segment-sum).  Assembly graphs are banded, so the running
    # max displaces almost nothing; edges a displaced window no longer covers
    # go to the overflow path.
    blk = np.maximum.accumulate(blk)
    base = (blk.astype(np.int64) * window)[:, None]
    local = tiles - base
    ovf = (local < 0) | (local >= cover)
    local = np.where(ovf, cover, local)
    return blk, local.reshape(-1).astype(np.int32), ovf.reshape(-1)


def _auto_side(idx: np.ndarray, valid: np.ndarray, n_tiles: int, tile_e: int,
               n_pad: int):
    """Pick the cheapest (window, k) for one endpoint array by the measured
    cost model: coverage * n_tiles + OVF_ROWTILES * exact_overflow_count.
    Long-range edges no window catches (repeats, false overlaps) charge
    every config equally, so they never force a uselessly wide window."""
    best = None
    med = np.median(idx.reshape(n_tiles, tile_e), axis=1).astype(np.int64)
    for w, k in sorted(_CONFIGS,
                       key=lambda c: ((c[0] + K_ROWS) * c[1], c[1])):
        if n_pad % w != 0 or n_pad < (k + 1) * w:
            continue
        cov_cost = (w + K_ROWS) * k * n_tiles
        if best is not None and cov_cost >= best[0]:
            break       # ascending cost floor: nothing cheaper can follow
        blk, local, ovf = _plan_side(idx, n_tiles, tile_e, w, k,
                                     n_pad // w - k, med=med)
        cost = cov_cost + OVF_ROWTILES * int((ovf & valid).sum())
        if best is None or cost < best[0]:
            best = (cost, (w, k, blk, local, ovf))
    return None if best is None else best[1]


def _forced_side(idx: np.ndarray, n_tiles: int, tile_e: int, n_pad: int,
                 force: tuple[int, int]):
    w, k = force
    blk, local, ovf = _plan_side(idx, n_tiles, tile_e, w, k, n_pad // w - k)
    return w, k, blk, local, ovf


def build_windowed_plan(gt, flip: bool = False, tile_e: int = TILE_E,
                        window: int | None = None,
                        chunk: int | None = None,
                        window_v: int | None = None,
                        k_u: int = 2, k_v: int = 2,
                        forced_region: tuple[int, int] | None = None):
    """Plan for the (src->dst) direction, or the reversed roles if ``flip``.

    ``window``/``window_v`` (with ``k_u``/``k_v`` blocks) size the u- and
    v-side coverage explicitly; ``window=None`` auto-selects each side's
    cheapest config from the graph's measured spans (exact overflow counts).
    Returns None when the graph is too small to be worth tiling.

    ``forced_region=(start, R)`` (internal, tail-overflow mode): slots in
    the region are unconditionally sentinel and the plan's patch path covers
    exactly that contiguous region; returns ``(plan, stragglers)`` instead —
    ``plan`` is None when interior edges still escape their windows
    (``stragglers`` bool mask, caller iterates the reslot).
    """
    Ep, Np = gt.n_edges_pad, gt.n_nodes_pad
    chunk = min(chunk or CHUNK, tile_e)
    auto = window is None
    wu = window or WINDOW
    wv = window_v or wu
    if Ep % tile_e != 0 or tile_e % chunk != 0 or chunk % 2 != 0 \
            or Np < (max(k_u, k_v) + 1) * max(wu, wv) \
            or Np % wu != 0 or Np % wv != 0:
        if not auto:
            return None
        if Ep % tile_e != 0 or tile_e % chunk != 0 or chunk % 2 != 0 \
                or Np < 3 * 128 or Np % 128 != 0:
            return None
    # host copies avoid 3 device->host round trips through the TPU tunnel
    src, dst, emask = gt.host("src"), gt.host("dst"), gt.host("edge_mask")
    u, v = (src, dst) if not flip else (dst, src)
    n_tiles = Ep // tile_e
    valid = emask[:, 0] > 0
    cost_valid = valid
    if forced_region is not None:
        # region edges are patched regardless — don't let them charge the
        # auto-select's overflow cost (they would only widen windows)
        _start, _R = forced_region
        cost_valid = valid.copy()
        cost_valid[_start:_start + _R] = False

    if auto:
        fu, fv = (FORCE_U, FORCE_V) if not flip else (FORCE_V, FORCE_U)
        u64, v64 = u.astype(np.int64), v.astype(np.int64)
        got_u = (_forced_side(u64, n_tiles, tile_e, Np, fu) if fu
                 else _auto_side(u64, cost_valid, n_tiles, tile_e, Np))
        got_v = (_forced_side(v64, n_tiles, tile_e, Np, fv) if fv
                 else _auto_side(v64, cost_valid, n_tiles, tile_e, Np))
        if got_u is None or got_v is None:
            return None
        wu, k_u, u_blk, u_local, u_ovf = got_u
        wv, k_v, v_blk, v_local, v_ovf = got_v
    else:
        u_blk, u_local, u_ovf = _plan_side(u.astype(np.int64), n_tiles,
                                           tile_e, wu, k_u, Np // wu - k_u)
        v_blk, v_local, v_ovf = _plan_side(v.astype(np.int64), n_tiles,
                                           tile_e, wv, k_v, Np // wv - k_v)
    ovf = (u_ovf | v_ovf)
    # padded slots are inert regardless; never treat them as overflow
    ovf &= valid
    # an edge handled by overflow must contribute NOTHING in-kernel; padded
    # slots likewise: sentinel one-hot columns (all-zero) make them inert in
    # every select AND scatter — kernels need no edge mask
    pad = ~valid
    ovf_start = -1
    if forced_region is not None:
        start, R = forced_region
        region = np.zeros(Ep, dtype=bool)
        region[start:start + R] = True
        stragglers = ovf & ~region
        if stragglers.any():
            return None, stragglers
        sentinel = region | pad
        u_local = np.where(sentinel, k_u * wu, u_local).astype(np.int32)
        v_local = np.where(sentinel, k_v * wv, v_local).astype(np.int32)
        ovf_slots = (start + np.arange(R)).astype(np.int32)
        ovf_mask = valid[start:start + R].astype(np.float32)[:, None].copy()
        n_ovf = int(ovf_mask.sum())
        ovf_start = start
    else:
        u_local = np.where(ovf | pad, k_u * wu, u_local).astype(np.int32)
        v_local = np.where(ovf | pad, k_v * wv, v_local).astype(np.int32)

        ovf_ids = np.nonzero(ovf)[0].astype(np.int32)
        n_ovf = int(ovf_ids.shape[0])
        # next power of two: bounds the number of distinct overflow SHAPES
        # (and hence compiled programs) across masked/clustered units
        n_ovf_pad = max(8, 1 << (max(n_ovf, 1) - 1).bit_length())
        ovf_slots = np.full(n_ovf_pad, Ep - 1, dtype=np.int32)  # Ep-1 = pad
        ovf_slots[:n_ovf] = ovf_ids
        ovf_mask = np.zeros((n_ovf_pad, 1), dtype=np.float32)
        ovf_mask[:n_ovf] = 1.0

    u_visited = np.zeros(Np // wu - (k_u - 1), dtype=np.float32)
    v_visited = np.zeros(Np // wv - (k_v - 1), dtype=np.float32)
    u_visited[u_blk] = 1.0     # unvisited partial blocks hold uninitialised
    v_visited[v_blk] = 1.0     # HBM; the combine masks them out

    def _lane_major(local: np.ndarray, sentinel: int,
                    parity: int | None = None) -> np.ndarray:
        """[Ep] slot order -> [T*rows_p, chunk(/2)] with sentinel pad rows;
        ``parity`` selects every other slot (the packed-layout index split)."""
        rows = tile_e // chunk
        rows_p = ((rows + 7) // 8) * 8
        c = chunk
        a = local.reshape(n_tiles, rows, chunk)
        if parity is not None:
            a = a[:, :, parity::2]
            c = chunk // 2
        if rows_p != rows:
            padr = np.full((n_tiles, rows_p - rows, c), sentinel,
                           dtype=np.int32)
            a = np.concatenate([a, padr], axis=1)
        return a.reshape(n_tiles * rows_p, c)

    plan = WindowedPlan(
        u_blk=jnp.asarray(u_blk), v_blk=jnp.asarray(v_blk),
        u_local=jnp.asarray(_lane_major(u_local, k_u * wu)),
        v_local=jnp.asarray(_lane_major(v_local, k_v * wv)),
        u_local_e=jnp.asarray(_lane_major(u_local, k_u * wu, 0)),
        u_local_o=jnp.asarray(_lane_major(u_local, k_u * wu, 1)),
        v_local_e=jnp.asarray(_lane_major(v_local, k_v * wv, 0)),
        v_local_o=jnp.asarray(_lane_major(v_local, k_v * wv, 1)),
        u_visited=jnp.asarray(u_visited), v_visited=jnp.asarray(v_visited),
        ovf_slots=jnp.asarray(ovf_slots), ovf_mask=jnp.asarray(ovf_mask),
        deg_u=jnp.asarray(np.bincount(
            u[valid], minlength=Np).astype(np.float32)),
        deg_v=jnp.asarray(np.bincount(
            v[valid], minlength=Np).astype(np.float32)),
        tile_e=tile_e, window=wu, chunk=chunk, n_tiles=n_tiles,
        n_pad=Np, window_v=wv, k_u=k_u, k_v=k_v,
        u_all=bool(u_visited.all()), v_all=bool(v_visited.all()),
        ovf_start=ovf_start,
    )
    return (plan, None) if forced_region is not None else plan


# ------------------------------------------------------------- tail overflow
def _tail_enabled() -> bool:
    import os
    return os.environ.get("GN_TAIL_OVF", "1") not in ("0", "false")


def plan_tail_overflow(gt, plan, plan_flip, flip_too: bool,
                       tile_e: int, wu, wv, divisible_by: int = 1):
    """Move every patched (overflow) edge into ONE contiguous region at the
    very end of a GROWN padded slot space, then rebuild the plans in
    forced-region mode: the XLA patch paths become static slices instead of
    gathers + full-array scatter-adds (round-5 perf lever; measured ~22 ms
    of scatter ops per bench train step in scatter mode).

    Interior slot positions are PRESERVED — vacated overflow slots become
    pad slots and the padding grows by a tile multiple to hold the region —
    so re-planning cannot spawn overflow in tiles the move never touched,
    and the straggler iteration (window medians shift slightly where pads
    replaced edges) converges in one or two rounds.

    Returns (gt, plan, plan_flip) — the originals when tail mode is
    infeasible or stragglers persist after 4 rounds.
    """
    if (not _tail_enabled() or plan is None
            or (flip_too and plan_flip is None)):
        return gt, plan, plan_flip
    from .graph_tensors import _tailed_layout

    Ep, E = gt.n_edges_pad, gt.n_edges
    orig = (gt, plan, plan_flip)

    def host_ovf(p, n_slots):
        m = np.zeros(n_slots, dtype=bool)
        sl = np.asarray(p.ovf_slots)
        mk = np.asarray(p.ovf_mask)[:, 0] > 0
        m[sl[mk]] = True
        return m

    # overflow mask in ORIGINAL slot coordinates (stable across rounds)
    ovf = host_ovf(plan, Ep)
    if plan_flip is not None:
        ovf |= host_ovf(plan_flip, Ep)
    if 2 * int(ovf.sum()) > E or not ovf.any():
        return orig            # degenerate graph (or nothing to move)
    for _ in range(4):
        n_ovf = int(ovf.sum())
        # power-of-two region bounds the number of compiled shapes across
        # masked/clustered units (same rationale as the scatter-mode pad);
        # the padding grows by a tile multiple so Ep2 stays tile-aligned
        R = max(8, 1 << (max(n_ovf, 1) - 1).bit_length())
        import math
        unit = math.lcm(tile_e, max(1, divisible_by))
        grow = -(-R // unit) * unit
        Ep2 = Ep + grow
        gt2 = _tailed_layout(gt, ovf, Ep2, R)
        E0 = Ep2 - R
        p2, s2 = build_windowed_plan(gt2, flip=False, tile_e=tile_e,
                                     window=wu, window_v=wv,
                                     forced_region=(E0, R))
        pf2 = sf2 = None
        if flip_too:
            pf2, sf2 = build_windowed_plan(gt2, flip=True, tile_e=tile_e,
                                           window=wv, window_v=wu,
                                           forced_region=(E0, R))
        if ((p2 is not None or not _any(s2))
                and (not flip_too or pf2 is not None or not _any(sf2))):
            if p2 is not None and (not flip_too or pf2 is not None):
                return gt2, p2, pf2
            return orig        # a forced plan failed for a non-straggler reason
        # stragglers: map their gt2 slots back to ORIGINAL slots via edge id
        # (interior slots are position-identical, so the eid map is enough)
        soe = gt.host("slot_of_eid")
        for s_mask in (s2, sf2):
            if s_mask is None or not s_mask.any():
                continue
            eids = gt2.host("eid_of_slot")[np.nonzero(s_mask)[0]]
            eids = eids[eids < E]
            ovf[soe[eids]] = True
    return orig


def _any(mask):
    return mask is not None and bool(mask.any())
