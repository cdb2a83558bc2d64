"""GFA dialect corners: multi-chromosome training headers with a planted
false repeat link, contained-read A-lines, circular unitigs, gzipped reads
input, and hifiasm p_ctg contig extraction.

Fixtures are committed bytes from scripts/make_real_format_fixtures.py
(provenance + format model documented there); reference semantics under test:
graph_parser.py:124-128 (gz reads), :189-266 (A-line collapse), :300-326
(L records incl. self-links), utils/labels.py:80-93,152-179 (multi-chr GT),
utils/data_utils.py:13-27 (p_ctg extraction).
"""
import os

import numpy as np
import pytest

from gnnome_tpu.graphs import parse_gfa

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
_COMP = str.maketrans("ACGT", "TGCA")


def _rc(s):
    return s.translate(_COMP)[::-1]


def _read(name):
    with open(os.path.join(FIX, name)) as f:
        return f.read().strip()


def _check_real_overlaps(g, reads):
    for i in range(g.num_edges):
        u, v = int(g.src[i]), int(g.dst[i])
        ol = int(g.overlap_length[i])
        assert reads.get(u)[-ol:] == reads.get(v)[:ol], \
            f"edge {u}->{v} overlap mismatch"


def _parse_multichr(reads_file="hifi_reads_multichr.fasta"):
    return parse_gfa(os.path.join(FIX, "hifiasm_multichr_r_utg.gfa"),
                     reads_path=os.path.join(FIX, reads_file),
                     training=True, get_similarities=True)


def test_multichr_structure_and_overlaps():
    parsed = _parse_multichr()
    g = parsed.graph
    assert g.num_nodes == 10              # 5 unitigs x (real, virtual)
    assert g.num_edges == 8               # 4 links x RC twin
    _check_real_overlaps(g, parsed.reads)
    np.testing.assert_allclose(g.overlap_similarity, 1.0, atol=1e-6)


def test_multichr_labels_kill_cross_chromosome_link():
    """The planted-repeat link utg3(chr1)->utg4(chr2) is sequence-exact but
    positionally false: its label (and its RC twin's) must be 0, while both
    per-chromosome chains stay fully 1 (reference labels.py:80-93: candidate
    edges require same chr; process_graph_combo iterates per chr)."""
    parsed = _parse_multichr()
    g = parsed.graph
    assert g.read_chr[4] == 1 and g.read_chr[6] == 2     # utg3 / utg4
    cross = [(4, 6), (7, 5)]              # utg3->utg4 real + RC twin
    for i in range(g.num_edges):
        uv = (int(g.src[i]), int(g.dst[i]))
        if uv in cross:
            assert g.y[i] == 0, f"cross-chr edge {uv} labelled true"
        else:
            assert g.y[i] == 1, f"chain edge {uv} labelled false"
    assert int(g.y.sum()) == 6


def test_contained_read_collapse():
    """utg1 carries a contained '-'-orientation read (400..1000 strictly
    inside 0..1400): strand consensus is the vote sum (+1 + -1 = 0 -> '+'),
    positions are the min/max union — so the contained read must not shrink
    or shift the unitig's span (reference graph_parser.py:231-266)."""
    parsed = _parse_multichr()
    g = parsed.graph
    assert g.read_strand[0] == 1 and g.read_strand[1] == -1
    assert g.read_start[0] == 0 and g.read_end[0] == 1400
    # both reads remap to the unitig's node pair through the A lines
    assert parsed.read_to_node["m64012_200430_101212/5000/ccs"] == (0, 1)
    assert parsed.read_to_node["m64012_200430_101212/5003/ccs"] == (0, 1)


def test_gzipped_reads_match_plain():
    """Training parse with a .fasta.gz reads file is identical to the plain
    parse (reference graph_parser.py:124-128 opens gz transparently)."""
    plain = _parse_multichr()
    gz = _parse_multichr("hifi_reads_multichr.fasta.gz")
    for attr in ("read_strand", "read_start", "read_end", "read_chr", "y",
                 "src", "dst", "overlap_length"):
        np.testing.assert_array_equal(getattr(plain.graph, attr),
                                      getattr(gz.graph, attr), err_msg=attr)


def test_circular_unitig_self_link():
    """A circular unitig (hifiasm ``utg%06dc``) links to itself; the parser
    must emit the self-loop edge pair with the usual prefix/overlap attrs
    (reference graph_parser.py:300-326 adds the L record unconditionally)."""
    parsed = parse_gfa(os.path.join(FIX, "hifiasm_circular_utg.gfa"),
                       get_similarities=True)
    g = parsed.graph
    assert g.num_nodes == 2 and g.num_edges == 2
    assert set(zip(g.src.tolist(), g.dst.tolist())) == {(0, 0), (1, 1)}
    np.testing.assert_array_equal(g.overlap_length, [300, 300])
    np.testing.assert_array_equal(g.prefix_length, [1200, 1200])
    np.testing.assert_allclose(g.overlap_similarity, 1.0, atol=1e-6)
    plasmid = _read("mini_plasmid.txt")
    assert parsed.reads.get(0) == plasmid + plasmid[:300]
    assert parsed.reads.get(1) == _rc(plasmid + plasmid[:300])


def test_circular_unitig_decodes_without_looping():
    """Greedy decode on a pure self-loop graph must TERMINATE with no
    contigs: the reference scores self-loop candidates len_contig=0
    (inference.py:289-294 "SELF-LOOP!"), so the best candidate always falls
    below the length threshold and the loop exits on the first iteration."""
    from gnnome_tpu.config import DecodeConfig
    from gnnome_tpu.decode.greedy import decode_greedy

    parsed = parse_gfa(os.path.join(FIX, "hifiasm_circular_utg.gfa"),
                       get_similarities=True)
    g = parsed.graph
    scores = np.zeros(g.num_edges, dtype=np.float32)
    res = decode_greedy(g, scores, DecodeConfig(len_threshold=500,
                                                num_decoding_paths=4,
                                                load_checkpoint=False))
    assert res.walks == []


def test_p_ctg_extraction(tmp_path):
    """hifiasm primary-contig extraction: S-record sequences -> FASTA
    (reference utils/data_utils.py:13-27)."""
    import shutil
    from gnnome_tpu.config import Config
    from gnnome_tpu.data.dataset import AssemblyGraphDatasetHiFi
    from gnnome_tpu.utils.fastx import read_fastx

    cfg = Config()
    ds = AssemblyGraphDatasetHiFi(str(tmp_path), threads=1, config=cfg,
                                  generate=False)
    shutil.copy(os.path.join(FIX, "hifiasm_p_ctg.gfa"),
                os.path.join(ds.output_dir, "0_asm.bp.p_ctg.gfa"))
    ds._extract_hifiasm_contigs(0)
    out = os.path.join(ds.output_dir, "0_assembly.fasta")
    recs = list(read_fastx(out))
    genome = _read("mini_genome.txt")
    assert [r.id for r in recs] == ["contig_0", "contig_1"]
    assert recs[0].seq == genome[0:3500]
    assert recs[1].seq == genome[3200:6000]
