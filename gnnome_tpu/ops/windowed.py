"""Host-side planning for the windowed Pallas message-passing kernels.

Assembly graphs are banded (reads ordered along the genome), so for a tile of
``tile_e`` consecutive dst-sorted edge slots, both endpoints' node ids fall in
a narrow window.  The plan quantises those windows to ``window``-row blocks
(two consecutive blocks per tile => 2*window coverage) so Pallas block specs
can prefetch them; edges whose endpoints escape the window are routed to a
small XLA overflow path.

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
WINDOW = 512     # u-side node rows per window block (coverage = 2 blocks)
WINDOW_V = 384   # v-side (slot-sort key) block rows — see below
CHUNK = 512      # edge rows per in-kernel step (one-hot lane width)
# (TILE_E, WINDOW) trade one-hot flops (~4*W*d per edge per kernel) against
# overflow AND per-tile pipeline overhead: on the bench graph 2048/512 ->
# 0.26% overflow; 1024/256 halves the flops but DOUBLES the tile count and
# measured ~15% SLOWER end-to-end (scripts/k3_ablate.py).
#
# Windows are PER ENDPOINT: slots are v(dst)-sorted, so a tile's v values
# span only ~tile_e/avg_degree consecutive rows, while its u values spread
# across the graph's overlap band (~2x wider on the bench graph).  A narrow
# v window halves that side's select/scatter MACs and window DMA bytes at
# the SAME tile count (512/256: 4k u-ovf + 29k v-ovf = 2% overflow vs 0.26%
# symmetric — the patch path absorbs it).  Flip plans swap roles (u becomes
# the sort key), so the narrow side swaps with them.


@dataclass(frozen=True)
class WindowedPlan:
    # --- leaves ---
    u_blk: jax.Array        # int32 [T]  u-window block per tile, NON-DECREASING
    v_blk: jax.Array        # int32 [T]  (monotone => kernels can accumulate
                            #            partials per block, not per tile)
    u_local: jax.Array      # int32 [T*rows_p, chunk] lane-major: tile t's
                            #   chunk c lives at row t*rows_p + c (rows_p =
                            #   tile_e/chunk padded up to a multiple of 8 for
                            #   the sublane tiling; pad rows hold sentinels);
                            #   value = src - u_blk*W, sentinel 2W if
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
    n_ovf: int = 0
    n_pad: int = 0          # padded node count of the owning GraphTensors
    u_all: bool = False     # every u block visited => combine can skip the
    v_all: bool = False     #   visited-mask pass (one full [NB*W, D] sweep)
    window_v: int = 0       # v-side block rows (0 => same as ``window``)

    @property
    def win_v(self) -> int:
        return self.window_v or self.window

    @property
    def sentinel(self) -> int:
        return 2 * self.window

    @property
    def n_blocks(self) -> int:
        """Distinct u window-block positions (= Np/W - 1); the aggregation
        kernels emit one (2W, D) partial block per position."""
        return self.n_pad // self.window - 1

    @property
    def n_blocks_v(self) -> int:
        return self.n_pad // self.win_v - 1

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
    meta_fields=["tile_e", "window", "chunk", "n_tiles", "n_ovf", "n_pad",
                 "u_all", "v_all", "window_v"],
)


def _plan_side(idx: np.ndarray, n_tiles: int, tile_e: int, window: int,
               max_blk: int):
    """(blk [T], local [Ep], overflow bool [Ep]) for one endpoint array."""
    tiles = idx.reshape(n_tiles, tile_e)
    # choose the 2-block window that covers the most edges: anchor on the
    # median endpoint, clamp into range
    med = np.median(tiles, axis=1).astype(np.int64)
    # centre the 2-block window on the median: med - blk*W in [W/2, 3W/2)
    blk = np.clip((med - window // 2) // window, 0, max_blk).astype(np.int32)
    # monotone non-decreasing blocks: lets the kernels keep one (2W, D)
    # accumulator per block position in VMEM across consecutive tiles (and
    # makes the combine a reshape+add instead of a segment-sum).  Assembly
    # graphs are banded, so the running max displaces almost nothing; edges a
    # displaced window no longer covers go to the overflow path.
    blk = np.maximum.accumulate(blk)
    base = (blk.astype(np.int64) * window)[:, None]
    local = tiles - base
    ovf = (local < 0) | (local >= 2 * window)
    local = np.where(ovf, 2 * window, local)
    return blk, local.reshape(-1).astype(np.int32), ovf.reshape(-1)


def build_windowed_plan(gt, flip: bool = False, tile_e: int = TILE_E,
                        window: int = WINDOW,
                        chunk: int | None = None,
                        window_v: int | None = None) -> WindowedPlan | None:
    """Plan for the (src->dst) direction, or the reversed roles if ``flip``.

    ``window`` / ``window_v`` size the u- and v-side blocks independently
    (``window_v=None`` => symmetric).  Returns None when the graph is too
    small to be worth tiling.
    """
    Ep, Np = gt.n_edges_pad, gt.n_nodes_pad
    chunk = min(chunk or CHUNK, tile_e)
    wv = window_v or window
    if Ep % tile_e != 0 or Np < 2 * max(window, wv) or Np % window != 0 \
            or Np % wv != 0 or tile_e % chunk != 0 or chunk % 2 != 0:
        return None
    src = np.asarray(gt.src)
    dst = np.asarray(gt.dst)
    u, v = (src, dst) if not flip else (dst, src)
    n_tiles = Ep // tile_e

    u_blk, u_local, u_ovf = _plan_side(u.astype(np.int64), n_tiles, tile_e,
                                       window, Np // window - 2)
    v_blk, v_local, v_ovf = _plan_side(v.astype(np.int64), n_tiles, tile_e,
                                       wv, Np // wv - 2)
    ovf = (u_ovf | v_ovf)
    # padded slots are inert regardless; never treat them as overflow
    ovf &= np.asarray(gt.edge_mask)[:, 0] > 0
    # an edge handled by overflow must contribute NOTHING in-kernel; padded
    # slots likewise: sentinel one-hot columns (all-zero) make them inert in
    # every select AND scatter — kernels need no edge mask
    pad = np.asarray(gt.edge_mask)[:, 0] == 0
    u_local = np.where(ovf | pad, 2 * window, u_local).astype(np.int32)
    v_local = np.where(ovf | pad, 2 * wv, v_local).astype(np.int32)

    ovf_ids = np.nonzero(ovf)[0].astype(np.int32)
    n_ovf = int(ovf_ids.shape[0])
    n_ovf_pad = max(8, -(-max(n_ovf, 1) // 8) * 8)
    ovf_slots = np.full(n_ovf_pad, Ep - 1, dtype=np.int32)  # Ep-1 is padding
    ovf_slots[:n_ovf] = ovf_ids
    ovf_mask = np.zeros((n_ovf_pad, 1), dtype=np.float32)
    ovf_mask[:n_ovf] = 1.0

    u_visited = np.zeros(Np // window - 1, dtype=np.float32)
    v_visited = np.zeros(Np // wv - 1, dtype=np.float32)
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

    return WindowedPlan(
        u_blk=jnp.asarray(u_blk), v_blk=jnp.asarray(v_blk),
        u_local=jnp.asarray(_lane_major(u_local, 2 * window)),
        v_local=jnp.asarray(_lane_major(v_local, 2 * wv)),
        u_local_e=jnp.asarray(_lane_major(u_local, 2 * window, 0)),
        u_local_o=jnp.asarray(_lane_major(u_local, 2 * window, 1)),
        v_local_e=jnp.asarray(_lane_major(v_local, 2 * wv, 0)),
        v_local_o=jnp.asarray(_lane_major(v_local, 2 * wv, 1)),
        u_visited=jnp.asarray(u_visited), v_visited=jnp.asarray(v_visited),
        ovf_slots=jnp.asarray(ovf_slots), ovf_mask=jnp.asarray(ovf_mask),
        deg_u=jnp.asarray(np.bincount(
            u[np.asarray(gt.edge_mask)[:, 0] > 0],
            minlength=Np).astype(np.float32)),
        deg_v=jnp.asarray(np.bincount(
            v[np.asarray(gt.edge_mask)[:, 0] > 0],
            minlength=Np).astype(np.float32)),
        tile_e=tile_e, window=window, chunk=chunk, n_tiles=n_tiles,
        n_ovf=n_ovf, n_pad=Np, window_v=wv,
        u_all=bool(u_visited.all()), v_all=bool(v_visited.all()),
    )
