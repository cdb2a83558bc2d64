"""PAF overlap-annotation tests (reference graph_parser.py:417-583 dormant
path)."""
import numpy as np

from gnnome_tpu.graphs.container import AssemblyGraph
from gnnome_tpu.graphs.paf import parse_paf, edge_paf_info


def _tiny_graph():
    # reads r0 (nodes 0/1) and r1 (nodes 2/3); edge 0->2 plus RC twin 3->1
    return AssemblyGraph(
        num_nodes=4,
        src=np.array([0, 3], dtype=np.int32),
        dst=np.array([2, 1], dtype=np.int32),
        read_length=np.array([100, 100, 120, 120], dtype=np.int64),
        prefix_length=np.array([60, 80], dtype=np.int64),
        overlap_length=np.array([40, 40], dtype=np.int64),
    )


def test_parse_paf(tmp_path):
    p = tmp_path / "x.paf"
    p.write_text("r0\t100\t60\t100\t+\tr1\t120\t0\t40\t40\t40\t60\n"
                 "rX\tbad\n")
    paf = parse_paf(str(p))
    assert paf[("r0", "r1")] == (100, 60, 100, "+", 120, 0, 40)
    assert len(paf) == 1


def test_edge_paf_info_forward_and_twin(tmp_path):
    p = tmp_path / "x.paf"
    # suffix of r0 overlaps prefix of r1 (proper suffix-prefix)
    p.write_text("r0\t100\t60\t100\t+\tr1\t120\t0\t40\t40\t40\t60\n")
    paf = parse_paf(str(p))
    g = _tiny_graph()
    node_to_read = {0: "r0", 1: "r0", 2: "r1", 3: "r1"}
    info = edge_paf_info(g, paf, node_to_read)
    # forward edge: coordinates pass through
    assert info[(0, 2)] == (100, 60, 100, 120, 0, 40)
    # RC twin edge: both intervals flipped and roles swapped
    assert (3, 1) in info
    sl, ss, se, dl, ds, de = info[(3, 1)]
    assert (sl, dl) == (120, 100)
    assert se - ss == 40 and de - ds == 40
