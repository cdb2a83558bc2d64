"""Real-assembler-format GFA fixtures, parsed byte-for-byte.

The fixtures under tests/fixtures/ reproduce the exact output formats of the
assemblers the reference consumes (hifiasm 0.18 `--prt-raw -l0`
`.bp.raw.r_utg.gfa` with ranged 7-field L records + full aux-tag surface,
newer 8-field hifiasm, Raven `graph_1.gfa` 6-field, and the `*`-sequence
splice case — reference graph_parser.py:153-341) over a 6 kb mini-genome, so
every link is a REAL exact sequence overlap.  Provenance:
scripts/make_real_format_fixtures.py; the files are committed bytes, never
regenerated at test time."""
import os

import numpy as np
import pytest

from gnnome_tpu.graphs import parse_gfa

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
_COMP = str.maketrans("ACGT", "TGCA")


def _rc(s):
    return s.translate(_COMP)[::-1]


def _genome():
    with open(os.path.join(FIX, "mini_genome.txt")) as f:
        return f.read().strip()


def _check_rc_twins(g):
    """Every edge (u, v) has its RC twin (v^1, u^1) with equal attrs."""
    pairs = {(int(u), int(v)): i for i, (u, v) in enumerate(zip(g.src, g.dst))}
    for (u, v), i in pairs.items():
        j = pairs[(v ^ 1, u ^ 1)]
        assert g.overlap_length[i] == g.overlap_length[j]


def _check_real_overlaps(g, reads):
    """GFA-semantics check: suffix of src node's sequence == prefix of dst's,
    for every edge — the fixtures encode real overlaps."""
    for i in range(g.num_edges):
        u, v = int(g.src[i]), int(g.dst[i])
        ol = int(g.overlap_length[i])
        su, sv = reads.get(u), reads.get(v)
        assert su[-ol:] == sv[:ol], f"edge {u}->{v} overlap mismatch"


def test_hifiasm_raw_r_utg():
    parsed = parse_gfa(os.path.join(FIX, "hifiasm_bp_raw_r_utg.gfa"),
                       reads_path=os.path.join(FIX, "hifi_reads.fasta"),
                       training=True, get_similarities=True)
    g = parsed.graph
    assert g.num_nodes == 12              # 6 unitigs x (real, virtual)
    assert g.num_edges == 10              # 5 links x RC twin
    _check_rc_twins(g)
    _check_real_overlaps(g, parsed.reads)
    # exact overlaps => similarity 1.0 on every edge
    np.testing.assert_allclose(g.overlap_similarity, 1.0, atol=1e-6)
    # ranged L ids were stripped back to S ids: prefix = src len - ol
    np.testing.assert_array_equal(
        g.prefix_length, g.read_length[g.src] - g.overlap_length)
    # multi-read unitig collapsing: utg1 = reads at genome 0-900 + 500-1400
    assert g.read_start[0] == 0 and g.read_end[0] == 1400
    assert g.read_chr[0] == 1
    # utg3 is the '-'-strand unitig (reads' strand x A-orient consensus)
    assert g.read_strand[4] == -1 and g.read_strand[5] == 1
    # read_to_node remaps through A lines (reference graph_parser.py:205)
    assert parsed.read_to_node["m64011_190830_220126/4000/ccs"] == (0, 1)
    # all labels on the true tiling path are 1 (consistent genome layout)
    assert g.y is not None and g.y.sum() == g.num_edges


def test_hifiasm_raw_r_utg_sequences_match_genome():
    parsed = parse_gfa(os.path.join(FIX, "hifiasm_bp_raw_r_utg.gfa"))
    genome = _genome()
    # '+' unitigs store the genome substring; '-' unitigs its RC; virtual
    # nodes always the RC of their real twin
    assert parsed.reads.get(0) == genome[0:1400]
    assert parsed.reads.get(1) == _rc(genome[0:1400])
    assert parsed.reads.get(4) == _rc(genome[2200:3600])     # utg3 is '-'


def test_hifiasm_8col():
    parsed = parse_gfa(os.path.join(FIX, "hifiasm_8col_r_utg.gfa"))
    g = parsed.graph
    assert g.num_nodes == 12 and g.num_edges == 10
    _check_rc_twins(g)
    _check_real_overlaps(g, parsed.reads)


def test_raven_graph_1():
    parsed = parse_gfa(os.path.join(FIX, "raven_graph_1.gfa"),
                       reads_path=os.path.join(FIX, "ont_reads.fasta"),
                       training=True, get_similarities=True)
    g = parsed.graph
    assert g.num_nodes == 20 and g.num_edges == 18
    _check_rc_twins(g)
    _check_real_overlaps(g, parsed.reads)
    np.testing.assert_allclose(g.overlap_similarity, 1.0, atol=1e-6)
    # reads 5 and 9 (1-based) are '-' strand
    assert g.read_strand[8] == -1 and g.read_strand[16] == -1
    assert g.read_strand[0] == 1


def test_raven_noseq_splices_reads_file():
    """`*` S records force the sequence splice from the reads FASTA
    (reference graph_parser.py:344-360)."""
    withseq = parse_gfa(os.path.join(FIX, "raven_graph_1.gfa"))
    noseq = parse_gfa(os.path.join(FIX, "raven_graph_1_noseq.gfa"),
                      reads_path=os.path.join(FIX, "ont_reads.fasta"))
    for n in range(withseq.graph.num_nodes):
        assert withseq.reads.get(n) == noseq.reads.get(n)
    np.testing.assert_array_equal(withseq.graph.src, noseq.graph.src)
    np.testing.assert_array_equal(withseq.graph.overlap_length,
                                  noseq.graph.overlap_length)


def test_noseq_without_reads_path_raises():
    with pytest.raises(ValueError, match="no reads_path"):
        parse_gfa(os.path.join(FIX, "raven_graph_1_noseq.gfa"))


def test_hifiasm_fixture_decodes_to_genome(tmp_path):
    """End-to-end: score with the shipped weights and greedy-decode the
    hifiasm-format fixture; the best contig must be an exact substring of
    the mini-genome (or its RC)."""
    from gnnome_tpu.config import DecodeConfig
    from gnnome_tpu.decode.assembly import walks_to_contigs
    from gnnome_tpu.decode.greedy import decode_greedy

    parsed = parse_gfa(os.path.join(FIX, "hifiasm_bp_raw_r_utg.gfa"),
                       get_similarities=True)
    g = parsed.graph
    # uniform scores: on a clean tiling graph the walk follows the chain
    scores = np.zeros(g.num_edges, dtype=np.float32)
    cfg = DecodeConfig(len_threshold=2000, num_decoding_paths=10,
                       load_checkpoint=False)
    res = decode_greedy(g, scores, cfg)
    contigs = walks_to_contigs(res.walks, g, parsed.reads)
    genome = _genome()
    best = max((str(c.seq) for c in contigs), key=len)
    assert len(best) >= 5000
    assert best in genome or _rc(best) in genome
