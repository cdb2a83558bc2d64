"""Decoder tests: greedy-walk oracle equality, label-oracle decoding on a known
genome, end-to-end decode -> FASTA (SURVEY.md §4 items 3 and 5)."""
import numpy as np

from gnnome_tpu.config import DecodeConfig
from gnnome_tpu.decode import decode_greedy, walks_to_contigs, quick_evaluation
from gnnome_tpu.decode.greedy import _Walker
from gnnome_tpu.graphs import synthetic_assembly_graph


def _graph(seed=0, n_reads=150, genome_len=12000, read_len=500):
    return synthetic_assembly_graph(n_reads=n_reads, genome_len=genome_len,
                                    read_len=read_len, seed=seed,
                                    with_sequences=True)


def test_native_walker_matches_python():
    g, _, _, _ = _graph(seed=4)
    rng = np.random.default_rng(0)
    log_probs = np.log(rng.uniform(0.1, 1.0, size=g.num_edges)).astype(np.float32)

    w_native = _Walker(g, log_probs)
    w_py = _Walker(g, log_probs)
    w_py.lib = None  # force the Python oracle

    visited = np.zeros(g.num_nodes, dtype=np.uint8)
    assert w_native.lib is not None, "native library must be available in CI"
    for start in [0, 5, 11, 40, 77]:
        e1 = w_native.next_epoch()
        e2 = w_py.next_epoch()
        walk_n, slp_n = w_native.walk(start, visited, e1)
        walk_p, slp_p = w_py.walk(start, visited, e2)
        np.testing.assert_array_equal(walk_n, walk_p)
        assert abs(slp_n - slp_p) < 1e-4


def test_walk_edge_ids():
    g, _, _, _ = _graph(seed=5)
    log_probs = np.zeros(g.num_edges, dtype=np.float32)
    w = _Walker(g, log_probs)
    visited = np.zeros(g.num_nodes, dtype=np.uint8)
    walk, _ = w.walk(0, visited, w.next_epoch())
    if len(walk) > 1:
        eids = w.edge_ids(walk)
        np.testing.assert_array_equal(g.src[eids], walk[:-1])
        np.testing.assert_array_equal(g.dst[eids], walk[1:])


def test_label_oracle_decode_reconstructs_genome():
    """Decoding with GT labels (decode_with_labels oracle,
    reference hyperparameters.py:47) must recover most of the genome."""
    genome_len = 15000
    # clean layout graph: synthetic false edges are random node pairs with no
    # sequence agreement (unlike real assembler artifacts), so a contig that
    # crosses one is not a genome substring — exclude them for this oracle
    g, reads, _, genome = synthetic_assembly_graph(
        n_reads=200, genome_len=genome_len, read_len=500, seed=6,
        with_sequences=True, false_edge_frac=0.0)
    cfg = DecodeConfig(num_decoding_paths=30, len_threshold=2000)
    res = decode_greedy(g, np.asarray(g.y), cfg, use_labels=True,
                        rng=np.random.default_rng(1))
    assert len(res.walks) >= 1
    contigs = walks_to_contigs(res.walks, g, reads)
    ev = quick_evaluation(contigs, ref_length=genome_len)
    # the longest contig should cover a large part of the genome
    assert ev["longest_contig"] > 0.5 * genome_len
    # contig must be an exact substring of the genome or its RC
    from gnnome_tpu.utils.fastx import reverse_complement
    top = max(contigs, key=lambda c: len(c.seq))
    assert top.seq in genome or top.seq in reverse_complement(genome)


def test_decode_respects_len_threshold_and_visited():
    g, _, _, _ = _graph(seed=7)
    scores = np.random.default_rng(2).normal(size=g.num_edges).astype(np.float32)
    cfg = DecodeConfig(num_decoding_paths=10, len_threshold=10**9)
    res = decode_greedy(g, scores, cfg, rng=np.random.default_rng(3))
    assert res.walks == []  # nothing can pass an absurd threshold

    cfg = DecodeConfig(num_decoding_paths=10, len_threshold=1000)
    res = decode_greedy(g, scores, cfg, rng=np.random.default_rng(3))
    for walk in res.walks:
        # every decoded node and its RC pair are marked visited
        assert all(res.visited[n] and res.visited[n ^ 1] for n in walk)
    # no node appears in two walks
    seen = set()
    for walk in res.walks:
        for n in walk:
            assert n not in seen
            seen.add(n)
            seen.add(n ^ 1)


def test_decode_checkpoint_resume(tmp_path):
    import os
    import pickle

    g, _, _, _ = _graph(seed=8, n_reads=300, genome_len=30000)
    scores = np.full(g.num_edges, 5.0, dtype=np.float32)
    cfg = DecodeConfig(num_decoding_paths=5, len_threshold=800,
                       load_checkpoint=True)
    ckdir = str(tmp_path)
    ckfile = os.path.join(ckdir, "checkpoint.pkl")
    res1 = decode_greedy(g, scores, cfg, checkpoint_dir=ckdir,
                         rng=np.random.default_rng(4))
    # a COMPLETED decode removes its resume snapshot — a re-run must start
    # fresh, never "resume" an already-finished result
    assert not os.path.isfile(ckfile)

    if len(res1.walks) >= 10:
        # simulate an interrupted run: hand-write the mid-run snapshot a
        # crash would have left behind (exact on-disk schema)
        k = (len(res1.walks) // 10) * 10
        vis = set()
        for w in res1.walks[:k]:
            vis.update(w)
            vis.update(x ^ 1 for x in w)
        ck = {"walks": res1.walks[:k],
              "visited": np.array(sorted(vis), dtype=np.int64),
              "all_walks_len": res1.walks_len[:k],
              "all_contigs_len": res1.contigs_len[:k]}
        with open(ckfile, "wb") as f:
            pickle.dump(ck, f)
        res2 = decode_greedy(g, scores, cfg, checkpoint_dir=ckdir,
                             rng=np.random.default_rng(4))
        # resumed run keeps the checkpointed walks as its prefix and cleans
        # up once complete
        assert res2.walks[:k] == res1.walks[:k]
        assert len(res2.walks) >= k
        assert not os.path.isfile(ckfile)
        # per-graph keying: a foreign-named checkpoint is ignored
        with open(ckfile, "wb") as f:
            pickle.dump(ck, f)
        res3 = decode_greedy(g, scores, cfg, checkpoint_dir=ckdir,
                             rng=np.random.default_rng(4),
                             checkpoint_name="checkpoint_7.pkl")
        assert os.path.isfile(ckfile)       # untouched: different key
        assert res3.walks == res1.walks


def test_batch_candidate_walks_match_python():
    """The native parallel batch walker must produce identical candidate
    walks to the sequential Python path."""
    from gnnome_tpu.decode.greedy import _Walker, _candidate_walks

    g, _, _, _ = _graph(seed=9, n_reads=200, genome_len=16000)
    rng = np.random.default_rng(3)
    log_probs = np.log(rng.uniform(0.05, 1.0, size=g.num_edges)).astype(np.float32)
    visited = np.zeros(g.num_nodes, dtype=np.uint8)
    visited[rng.integers(0, g.num_nodes, 40)] = 1  # some pre-visited nodes
    seeds = rng.integers(0, g.num_edges, size=16)

    w_nat = _Walker(g, log_probs)
    assert w_nat.lib is not None
    nat = list(_candidate_walks(w_nat, g, seeds, visited, n_threads=4))

    w_py = _Walker(g, log_probs)
    w_py.lib = None
    py = list(_candidate_walks(w_py, g, seeds, visited, n_threads=1))

    assert len(nat) == len(py)
    for (wn, sn), (wp, sp) in zip(nat, py):
        if wn is None or wp is None:
            assert wn is None and wp is None
            continue
        np.testing.assert_array_equal(wn, wp)
        assert abs(sn - sp) < 1e-4


def test_native_decode_round_matches_python():
    """gn_decode_round (parallel walks + contig scoring + first-max pick)
    must reproduce the Python candidate loop's winner exactly."""
    import ctypes
    from gnnome_tpu.decode.greedy import _Walker, _candidate_walks

    g, _, _, _ = _graph(seed=11, n_reads=250, genome_len=20000)
    rng = np.random.default_rng(5)
    log_probs = np.log(rng.uniform(0.05, 1.0, size=g.num_edges)).astype(np.float32)
    prefix = np.maximum(np.asarray(g.prefix_length, dtype=np.int64), 0)
    read_len = np.asarray(g.read_length, dtype=np.int64)
    visited = np.zeros(g.num_nodes, dtype=np.uint8)
    visited[rng.integers(0, g.num_nodes, 30)] = 1

    w = _Walker(g, log_probs)
    assert w.lib is not None
    w_py = _Walker(g, log_probs)
    w_py.lib = None

    for trial in range(4):
        seeds = rng.integers(0, g.num_edges, size=12)

        # python oracle: first strict-max candidate
        best = None
        for walk_c, slp in _candidate_walks(w_py, g, seeds, visited, 1):
            if walk_c is None:
                clen, walk_c = 0, np.zeros(0, np.int32)
            else:
                eids = w_py.edge_ids(walk_c)
                clen = int(prefix[eids].sum() + read_len[walk_c[-1]])
            if best is None or clen > best[0]:
                best = (clen, walk_c, slp)

        src32 = np.ascontiguousarray(g.src, dtype=np.int32)
        dst32 = np.ascontiguousarray(g.dst, dtype=np.int32)
        walk_buf = np.empty(g.num_nodes, dtype=np.int32)
        # fresh scratch per trial (equivalent to persistent + advancing epoch)
        stamp = np.zeros(4 * g.num_nodes, dtype=np.int32)
        wbuf = np.empty(4 * 2 * g.num_nodes, dtype=np.int32)
        clen_out = ctypes.c_int64(0)
        slp_out = ctypes.c_double(0.0)
        wlen = w.lib.gn_decode_round(
            w.row_ptr, w.col, w.eid, w.log_probs, prefix, read_len,
            visited, g.num_nodes,
            np.ascontiguousarray(src32[seeds]),
            np.ascontiguousarray(dst32[seeds]),
            len(seeds), 0, 0.0, 4, stamp, wbuf, 0,
            walk_buf, ctypes.byref(clen_out), ctypes.byref(slp_out))
        assert wlen == len(best[1])
        np.testing.assert_array_equal(walk_buf[:wlen], best[1])
        assert int(clen_out.value) == best[0]
        assert abs(float(slp_out.value) - best[2]) < 1e-4
        # advance visited as decode would, to vary the next trial
        visited[best[1]] = 1
        visited[best[1] ^ 1] = 1


import pytest


@pytest.mark.parametrize("n_edges", [1000, 5000])
def test_native_seed_sampler_matches_numpy_cdf(n_edges):
    """gn_sample_seed_edges must equal a float64 cumsum + searchsorted oracle.
    n_edges=1000 stays inside one 1024-edge sampling block (summation order
    identical); n_edges=5000 exercises the block prefix sums + binary search
    + in-block rescan — the path every real graph takes."""
    from gnnome_tpu.native import get_lib

    lib = get_lib()
    assert lib is not None
    rng = np.random.default_rng(7)
    n_nodes = 256
    src = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    probs = rng.uniform(0, 1, n_edges).astype(np.float32)
    probs[rng.integers(0, n_edges, n_edges // 20)] = 0.0   # the 1e-9 clamp
    visited = np.zeros(n_nodes, dtype=np.uint8)
    visited[rng.integers(0, n_nodes, 60)] = 1
    uniforms = rng.random(64)
    out = np.empty(64, dtype=np.int64)
    got = lib.gn_sample_seed_edges(src, dst, probs, visited, n_edges,
                                   uniforms, 64, 4, out)
    assert got == 64

    alive = (visited[src] == 0) & (visited[dst] == 0)
    w = np.where(alive, np.maximum(probs.astype(np.float64), 1e-9), 0.0)
    cdf = np.cumsum(w)
    expect = np.searchsorted(cdf, uniforms * cdf[-1], side="right")
    np.testing.assert_array_equal(out, expect)

    # all-visited -> 0 samples
    visited[:] = 1
    assert lib.gn_sample_seed_edges(src, dst, probs, visited, n_edges,
                                    uniforms, 64, 4, out) == 0


def test_incremental_sampler_matches_oneshot():
    """The incremental per-block sampler (init -> absorb-driven updates ->
    sample) must equal the one-shot gn_sample_seed_edges bitwise right after
    init; after subtraction updates, every sample must still be an ALIVE
    edge and the alive bookkeeping must match the visited arrays exactly."""
    from gnnome_tpu.native import get_lib

    lib = get_lib()
    assert lib is not None
    g, _, _, _ = _graph(seed=21, n_reads=400, genome_len=30000)
    E, n = g.num_edges, g.num_nodes
    assert E > 2048                 # multi-block regime
    rng = np.random.default_rng(3)
    probs = rng.uniform(0, 1, E).astype(np.float32)
    visited = np.zeros(n, dtype=np.uint8)

    csr_ptr, csr_col, csr_eid = g.csr()
    csc_ptr, csc_row, csc_eid = g.csc()
    csr_ptr = np.ascontiguousarray(csr_ptr, np.int64)
    csr_col = np.ascontiguousarray(csr_col, np.int32)
    csr_eid = np.ascontiguousarray(csr_eid, np.int64)
    csc_ptr = np.ascontiguousarray(csc_ptr, np.int64)
    csc_row = np.ascontiguousarray(csc_row, np.int32)
    csc_eid = np.ascontiguousarray(csc_eid, np.int64)
    src32 = np.ascontiguousarray(g.src, np.int32)
    dst32 = np.ascontiguousarray(g.dst, np.int32)

    n_blocks = (E + 1023) // 1024
    ealive = np.empty(E, np.uint8)
    weight = np.empty(E, np.float64)
    bsum = np.empty(n_blocks, np.float64)
    blast = np.empty(n_blocks, np.int64)
    count = np.empty(1, np.int64)
    lib.gn_sampler_init(src32, dst32, probs, visited, E, 4,
                        ealive, weight, bsum, blast, count)
    assert count[0] == E

    stamp = np.zeros(n, np.int32)
    newly = np.empty(n, np.int32)
    epoch = 0
    out_inc = np.empty(32, np.int64)
    out_ref = np.empty(32, np.int64)
    for it in range(8):
        uniforms = rng.random(32)
        gi = lib.gn_sample_seed_edges_inc(ealive, weight, bsum, blast, count,
                                          E, uniforms, 32, out_inc)
        gr = lib.gn_sample_seed_edges(src32, dst32, probs, visited, E,
                                      uniforms, 32, 4, out_ref)
        assert gi == gr
        if gi == 0:
            break
        if it == 0:   # pristine state: bitwise-identical to the one-shot path
            np.testing.assert_array_equal(out_inc, out_ref)
        # every incremental sample must be alive
        assert (visited[src32[out_inc]] == 0).all()
        assert (visited[dst32[out_inc]] == 0).all()
        # visit a fake walk through some sampled edges' endpoints + absorb
        walk = np.concatenate([[src32[out_inc[0]]],
                               dst32[out_inc[:5]]]).astype(np.int32)
        n_new = lib.gn_absorb_walk(csr_ptr, csr_col, csc_ptr, csc_row,
                                   walk, len(walk), visited, stamp,
                                   epoch + 1, newly)
        epoch += len(walk)
        if n_new:
            lib.gn_sampler_update(csr_ptr, csr_col, csr_eid, csc_ptr,
                                  csc_row, csc_eid, newly, n_new, E,
                                  ealive, weight, bsum, blast, count)
    # consistency: alive bits, count and per-block last-alive stay exact
    alive_ref = (visited[src32] == 0) & (visited[dst32] == 0)
    np.testing.assert_array_equal(ealive.astype(bool), alive_ref)
    assert count[0] == int(alive_ref.sum())
    for b in range(n_blocks):
        ids = np.nonzero(alive_ref[b * 1024:(b + 1) * 1024])[0]
        expect_last = b * 1024 + ids[-1] if ids.size else -1
        assert blast[b] == expect_last


def test_native_absorb_matches_python():
    from gnnome_tpu.native import get_lib

    lib = get_lib()
    assert lib is not None
    g, _, _, _ = _graph(seed=13)
    csr_ptr, csr_col, _ = g.csr()
    csc_ptr, csc_row, _ = g.csc()
    rng = np.random.default_rng(9)
    # a random node sequence is fine: absorption only reads adjacency
    walk = rng.integers(0, g.num_nodes, 25).astype(np.int32)

    vis_py = np.zeros(g.num_nodes, dtype=np.uint8)
    vis_py[walk] = 1
    vis_py[walk ^ 1] = 1
    for u, v in zip(walk[:-1].tolist(), walk[1:].tolist()):
        trans = np.intersect1d(csr_col[csr_ptr[u]:csr_ptr[u + 1]],
                               csc_row[csc_ptr[v]:csc_ptr[v + 1]])
        if trans.size:
            vis_py[trans] = 1
            vis_py[trans ^ 1] = 1

    vis_nat = np.zeros(g.num_nodes, dtype=np.uint8)
    stamp = np.zeros(g.num_nodes, dtype=np.int32)
    newly = np.empty(g.num_nodes, dtype=np.int32)
    n_new = lib.gn_absorb_walk(np.ascontiguousarray(csr_ptr, np.int64),
                               np.ascontiguousarray(csr_col, np.int32),
                               np.ascontiguousarray(csc_ptr, np.int64),
                               np.ascontiguousarray(csc_row, np.int32),
                               walk, len(walk), vis_nat, stamp, 1, newly)
    np.testing.assert_array_equal(vis_nat, vis_py)
    # newly-visited list covers exactly the set bits, each node once
    assert n_new == int(vis_py.sum())
    np.testing.assert_array_equal(np.sort(newly[:n_new]),
                                  np.nonzero(vis_py)[0])
