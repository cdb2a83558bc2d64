"""hifiasm unitig (utg + A-line) GFA parsing: collapsed multi-read unitigs
with majority-vote strand/chr and min/max positions (reference
graph_parser.py:189-266)."""
import numpy as np

from gnnome_tpu.graphs import parse_gfa


def _write(tmp_path, gfa_text, fasta_text):
    gfa = tmp_path / "g.gfa"
    reads = tmp_path / "r.fasta"
    gfa.write_text(gfa_text)
    reads.write_text(fasta_text)
    return str(gfa), str(reads)


def test_utg_collapsing_and_training_attrs(tmp_path):
    # utg1 = reads r1(+), r2(-); utg2 = read r3(+)
    gfa_text = (
        "S\tutg1\tACGTACGTAC\tLN:i:10\n"
        "A\tutg1\t0\t+\tr1\t0\t6\n"
        "A\tutg1\t4\t-\tr2\t0\t6\n"
        "S\tutg2\tGGCCGGCC\tLN:i:8\n"
        "A\tutg2\t0\t+\tr3\t0\t8\n"
        "L\tutg1:0-10\t+\tutg2:0-8\t+\t4M\tL1:i:0\n"
    )
    fasta_text = (
        ">r1 strand=+ start=0 end=6 chr=1\nACGTAC\n"
        ">r2 strand=+ start=4 end=10 chr=1\nGTACGT\n"
        ">r3 strand=+ start=6 end=14 chr=1\nGTACGGCC\n"
    )
    gfa, reads = _write(tmp_path, gfa_text, fasta_text)
    parsed = parse_gfa(gfa, reads_path=reads, training=True,
                       get_similarities=False)
    g = parsed.graph
    assert g.num_nodes == 4  # 2 unitigs x (real, virtual)
    # edge utg1+ -> utg2+ => real (0 -> 2) and twin (3 -> 1)
    pairs = set(zip(g.src.tolist(), g.dst.tolist()))
    assert (0, 2) in pairs and (3, 1) in pairs
    assert g.num_edges == 2
    np.testing.assert_array_equal(g.overlap_length, [4, 4])
    # prefix = len - ol
    np.testing.assert_array_equal(g.prefix_length, [10 - 4, 8 - 4])
    # unitig 1: strands [+ (r1,+=+1), - (r2,+=-1)] -> sum 0 -> strand +1;
    # start=min(0,4)=0, end=max(6,10)=10, chr=1
    assert g.read_strand[0] == 1 and g.read_strand[1] == -1
    assert g.read_start[0] == 0 and g.read_end[0] == 10
    assert g.read_chr[0] == 1
    # read_to_node maps reads (not unitigs) after A-line collapsing
    # (reference graph_parser.py:413-414)
    assert parsed.read_to_node["r1"] == (0, 1)
    assert parsed.read_to_node["r2"] == (0, 1)
    assert parsed.read_to_node["r3"] == (2, 3)
    assert parsed.node_to_read[0] == [("r1", "+"), ("r2", "-")]


def test_utg_majority_chromosome(tmp_path):
    gfa_text = (
        "S\tutg1\tACGTACGT\tLN:i:8\n"
        "A\tutg1\t0\t+\tr1\t0\t4\n"
        "A\tutg1\t2\t+\tr2\t0\t4\n"
        "A\tutg1\t4\t+\tr3\t0\t4\n"
    )
    fasta_text = (
        ">r1 strand=+ start=0 end=4 chr=2\nACGT\n"
        ">r2 strand=+ start=2 end=6 chr=2\nGTAC\n"
        ">r3 strand=- start=4 end=8 chr=X\nACGT\n"
    )
    gfa, reads = _write(tmp_path, gfa_text, fasta_text)
    parsed = parse_gfa(gfa, reads_path=reads, training=True,
                       get_similarities=False)
    g = parsed.graph
    assert g.read_chr[0] == 2          # majority vote (2, 2, X->-1)
    assert g.read_strand[0] == 1       # sum(+1, +1, -1) >= 0
    assert g.read_start[0] == 0 and g.read_end[0] == 8


def test_8_column_hifiasm_L_line(tmp_path):
    gfa_text = (
        "S\tr1\tACGTACGT\tLN:i:8\n"
        "S\tr2\tGTACGTAC\tLN:i:8\n"
        "L\tr1\t+\tr2\t+\t4M\tx\ty\n"
    )
    fasta_text = ">r1\nACGTACGT\n>r2\nGTACGTAC\n"
    gfa, reads = _write(tmp_path, gfa_text, fasta_text)
    parsed = parse_gfa(gfa, reads_path=reads)
    assert parsed.graph.num_edges == 2
    assert parsed.graph.overlap_length[0] == 4
