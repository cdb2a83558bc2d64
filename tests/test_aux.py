"""Auxiliary-subsystem tests: walk diagnostics, interval union, positional
encodings, MAF parsing, early-stopping decode, determinism."""
import numpy as np

from gnnome_tpu.config import DecodeConfig
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.graphs.analyze import (assert_strand, assert_chromosome,
                                       assert_overlap, interval_union,
                                       print_pairwise)
from gnnome_tpu.models.features import positional_encoding


def _graph(**kw):
    return synthetic_assembly_graph(n_reads=80, genome_len=8000, read_len=400,
                                    with_sequences=False, **kw)


def test_walk_diagnostics():
    g, _, _, _ = _graph(seed=40)
    # a genuine forward chain from the labels
    eids = np.nonzero(g.y == 1)[0]
    e0 = eids[g.read_strand[g.src[eids]] == 1][0]
    walk = [int(g.src[e0]), int(g.dst[e0])]
    assert assert_strand(g, walk) == []
    assert assert_chromosome(g, walk) == []
    assert assert_overlap(g, walk) == []
    # corrupt: jump to an RC node
    bad_walk = walk + [int(g.dst[e0]) ^ 1]
    assert assert_strand(g, bad_walk) != []


def test_interval_union_covers_genome():
    g, _, _, _ = _graph(seed=41)
    iv = interval_union(g)
    assert len(iv) >= 1
    starts = [a for a, _ in iv]
    assert starts == sorted(starts)
    # intervals are disjoint
    for (a1, b1), (a2, b2) in zip(iv[:-1], iv[1:]):
        assert a2 > b1


def test_print_pairwise(tmp_path):
    g, _, _, _ = _graph(seed=42)
    p = str(tmp_path / "g.txt")
    print_pairwise(g, p)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == g.num_edges
    u, v = lines[0].split("\t")
    assert int(u) == g.src[0] and int(v) == g.dst[0]


def test_positional_encodings():
    g, _, _, _ = _graph(seed=43)
    for kind in ("RW", "PR"):
        pe = positional_encoding(g, dim=4, kind=kind)
        assert pe.shape == (g.num_nodes, 4)
        assert np.isfinite(pe).all()
    pr = positional_encoding(g, dim=2, kind="PR")
    # PageRank mass leaks only through dangling nodes (same as the
    # reference's formulation, data_utils.py:74-89): 0 < sum <= 1
    assert 0.0 < pr[:, -1].sum() <= 1.0 + 1e-6


def test_maf_parsing(tmp_path):
    from gnnome_tpu.data.simulate import parse_maf_positions
    maf = tmp_path / "x.maf"
    maf.write_text(
        "a\ns ref 100 50 + 1000 ACGT\ns S1_1 0 50 + 50 ACGT\n\n"
        "a\ns ref 300 40 + 1000 ACGT\ns S1_2 0 40 - 40 ACGT\n")
    pos = parse_maf_positions(str(maf))
    assert pos["S1_1"] == ("+", 100, 150)
    assert pos["S1_2"] == ("-", 300, 340)


def test_early_stopping_decode():
    g, _, _, _ = _graph(seed=44)
    rng = np.random.default_rng(0)
    # low scores everywhere -> with early stopping, walks should be shorter
    scores = np.full(g.num_edges, -4.0, dtype=np.float32)  # sigmoid ~ 0.018
    base = DecodeConfig(num_decoding_paths=10, len_threshold=10**9)
    es = DecodeConfig(num_decoding_paths=10, len_threshold=10**9,
                      early_stopping=True, p_threshold=0.06)
    from gnnome_tpu.decode import decode_greedy
    from gnnome_tpu.decode.greedy import _Walker
    w_base = _Walker(g, np.log(1 / (1 + np.exp(-scores))))
    w_es = _Walker(g, np.log(1 / (1 + np.exp(-scores))),
                   early_stop_logp=float(np.log(0.06)))
    visited = np.zeros(g.num_nodes, dtype=np.uint8)
    lens_base, lens_es = [], []
    for s in range(0, 40, 4):
        wb, _ = w_base.walk(s, visited, w_base.next_epoch())
        we, _ = w_es.walk(s, visited, w_es.next_epoch())
        lens_base.append(len(wb))
        lens_es.append(len(we))
    assert sum(lens_es) <= sum(lens_base)
    assert sum(lens_es) < sum(lens_base) or max(lens_base) <= 2


def test_scoring_determinism():
    """Same seed, same graph => bitwise-identical logits (SURVEY.md §5
    'determinism checks')."""
    from gnnome_tpu.config import Config
    from gnnome_tpu.infer import score_graph
    from gnnome_tpu.models.checkpoint import load_model_weights

    g, _, _, _ = synthetic_assembly_graph(n_reads=60, genome_len=5000,
                                          read_len=300, seed=45,
                                          with_sequences=True)
    params, state = load_model_weights("/root/repo/weights/weights.npz")
    cfg = Config()
    s1 = score_graph(g, params, state, cfg)
    s2 = score_graph(g, params, state, cfg)
    np.testing.assert_array_equal(s1, s2)
