"""GFA -> AssemblyGraph parser.

Array-based redesign of reference ``graph_parser.only_from_gfa``
(graph_parser.py:120-600): same graph semantics — every read becomes a
real/virtual RC node pair (``i`` / ``i^1``, graph_parser.py:174-181), every GFA
``L`` link becomes a real edge and its RC-twin edge (graph_parser.py:300-326),
with ``prefix_length = src_len - ol_len`` and shared ``overlap_length`` between
twins (graph_parser.py:336-340) — but built directly into numpy COO arrays with
a packed ReadStore, skipping the networkx -> DGL detour entirely.

Supported GFA dialects (graph_parser.py:275-288):
  * raven:    ``L id1 o1 id2 o2 cigar``           (6 fields)
  * hifiasm:  ``L id1 o1 id2 o2 cigar x``          (7 fields, ids carry ranges)
  * hifiasm': ``L id1 o1 id2 o2 cigar x x``        (8 fields)
Unitig ``S`` records followed by ``A`` lines (hifiasm ``utg``) are collapsed
with majority-vote strand/chr and min/max positions (graph_parser.py:189-266).

Edge id order: edges grouped by src node (stable within a node by L-line
order), matching ``dgl.from_networkx`` iteration order so per-edge arrays are
directly comparable with the reference pipeline.
"""
from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..utils.fastx import read_fastx, detect_filetype, parse_training_header
from .container import AssemblyGraph, ReadStore
from .labels import compute_gt_labels
from .similarity import overlap_similarities

_HIFIASM_ID_RE = re.compile(r"(.*):\d-\d*")


@dataclass
class ParsedGraph:
    graph: AssemblyGraph
    reads: ReadStore
    read_to_node: dict            # read id -> (real, virt) node pair
    node_to_read: dict            # node -> read id (or list of (id, orient))


def parse_gfa(gfa_path: str, reads_path: Optional[str] = None,
              training: bool = False, get_similarities: bool = False,
              n_threads: Optional[int] = None) -> ParsedGraph:
    if training and reads_path is None:
        raise ValueError("training=True requires reads_path with position annotations "
                         "(reference graph_parser.py:136-138)")

    read_headers: dict[str, str] = {}
    if training:
        read_headers = {r.id: r.description
                        for r in read_fastx(reads_path, detect_filetype(reads_path))}

    node_seqs: list[Optional[str]] = []   # sequence of real node 2t (None if GFA has '*')
    node_lengths: list[int] = []          # per read (pair shares length)
    read_to_node: dict = {}
    read_to_node2: dict = {}
    node_to_read: dict = {}
    no_seqs = False

    strands: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    chrs: list[int] = []

    with open(gfa_path) as f:
        all_lines = f.readlines()

    # ---------------------------------------------------------------- S/A pass
    line_idx = 0
    n_lines = len(all_lines)
    while line_idx < n_lines:
        line = all_lines[line_idx].strip().split()
        line_idx += 1
        if not line or line[0] != "S":
            continue
        _, rid, sequence, length = line[:4]
        if sequence == "*":
            no_seqs = True
        length = int(length[5:])  # 'LN:i:<len>'

        t = len(node_lengths)
        real_idx, virt_idx = 2 * t, 2 * t + 1
        read_to_node[rid] = (real_idx, virt_idx)
        node_to_read[real_idx] = rid
        node_to_read[virt_idx] = rid
        node_seqs.append(None if sequence == "*" else sequence)
        node_lengths.append(length)

        gfa_id = rid
        ids: list[tuple[str, str]] = []
        if rid.startswith("utg"):
            # unitig: consume following 'A' lines (graph_parser.py:189-211)
            while line_idx < n_lines:
                aline = all_lines[line_idx].strip().split()
                if not aline or aline[0] != "A":
                    break
                line_idx += 1
                utg_to_read, read_orientation = aline[4], aline[3]
                ids.append((utg_to_read, read_orientation))
                read_to_node2[utg_to_read] = (real_idx, virt_idx)
            node_to_read[real_idx] = ids
            node_to_read[virt_idx] = ids

        if training:
            if not ids:
                strand, start, end, chrom = parse_training_header(read_headers[gfa_id])
            else:
                # collapse multi-read unitig (graph_parser.py:231-266)
                c_strands, c_starts, c_ends, c_chrs = [], [], [], []
                for id_r, id_o in ids:
                    s_f, st, en, ch = parse_training_header(read_headers[id_r])
                    s_g = 1 if id_o == "+" else -1
                    c_strands.append(s_f * s_g)
                    c_starts.append(st)
                    c_ends.append(en)
                    c_chrs.append(ch)
                strand = 1 if sum(c_strands) >= 0 else -1
                start, end = min(c_starts), max(c_ends)
                chrom = Counter(c_chrs).most_common()[0][0]
            strands.extend((strand, -strand))
            starts.extend((start, start))
            ends.extend((end, end))
            chrs.extend((chrom, chrom))

    num_reads = len(node_lengths)
    num_nodes = 2 * num_reads

    # ------------------------------------------------------------------ L pass
    # first-occurrence order with last-wins attributes, matching networkx
    # add_edge semantics in the reference (graph_parser.py:321-340)
    pair_slot: dict[tuple[int, int], int] = {}
    e_src: list[int] = []
    e_dst: list[int] = []
    e_ol: list[int] = []

    def add_edge(u: int, v: int, ol: int):
        slot = pair_slot.get((u, v))
        if slot is None:
            pair_slot[(u, v)] = len(e_src)
            e_src.append(u)
            e_dst.append(v)
            e_ol.append(ol)
        else:
            e_ol[slot] = ol

    for raw in all_lines:
        line = raw.strip().split()
        if not line or line[0] != "L":
            continue
        if len(line) == 6:                      # raven / GFA-1
            _, id1, o1, id2, o2, cigar = line
        elif len(line) == 7:                    # hifiasm (ids carry :start-end)
            _, id1, o1, id2, o2, cigar, _x = line
            id1 = _HIFIASM_ID_RE.findall(id1)[0]
            id2 = _HIFIASM_ID_RE.findall(id2)[0]
        elif len(line) == 8:                    # newer hifiasm
            _, id1, o1, id2, o2, cigar, _x, _y = line
        else:
            raise ValueError("Unknown GFA format (L record with "
                             f"{len(line)} fields)")
        ol_length = int(cigar[:-1])             # '1234M'
        if ol_length == 0:                      # degenerate (graph_parser.py:297)
            continue
        n1, n2 = read_to_node[id1], read_to_node[id2]
        if o1 == "+" and o2 == "+":
            src_real, dst_real, src_virt, dst_virt = n1[0], n2[0], n2[1], n1[1]
        elif o1 == "+" and o2 == "-":
            src_real, dst_real, src_virt, dst_virt = n1[0], n2[1], n2[0], n1[1]
        elif o1 == "-" and o2 == "+":
            src_real, dst_real, src_virt, dst_virt = n1[1], n2[0], n2[1], n1[0]
        else:
            src_real, dst_real, src_virt, dst_virt = n1[1], n2[1], n2[0], n1[0]
        add_edge(src_real, dst_real, ol_length)
        add_edge(src_virt, dst_virt, ol_length)

    src = np.asarray(e_src, dtype=np.int32)
    dst = np.asarray(e_dst, dtype=np.int32)
    ol = np.asarray(e_ol, dtype=np.int64)

    # canonical edge order: grouped by src (stable), see module docstring
    order = np.argsort(src, kind="stable")
    src, dst, ol = src[order], dst[order], ol[order]

    # ------------------------------------------------------------- sequences
    if no_seqs:
        if reads_path is None:
            raise ValueError("GFA has no sequences ('*') and no reads_path given")
        seq_by_id = {r.id: r.seq for r in read_fastx(reads_path)}
        for t in range(num_reads):
            rid = node_to_read[2 * t]
            if node_seqs[t] is None:
                if isinstance(rid, list):
                    raise ValueError("'*' sequences with unitig graphs need the "
                                     "GFA to carry unitig sequences")
                node_seqs[t] = seq_by_id[rid]
    reads = ReadStore.from_sequences([s if s is not None else "" for s in node_seqs])

    read_length_pairs = np.asarray(node_lengths, dtype=np.int64)
    read_length = np.repeat(read_length_pairs, 2)
    prefix_length = read_length[src] - ol

    graph = AssemblyGraph(
        num_nodes=num_nodes, src=src, dst=dst,
        read_length=read_length, prefix_length=prefix_length, overlap_length=ol,
    )

    if training:
        graph.read_strand = np.asarray(strands, dtype=np.int8)
        graph.read_start = np.asarray(starts, dtype=np.int64)
        graph.read_end = np.asarray(ends, dtype=np.int64)
        graph.read_chr = np.asarray(chrs, dtype=np.int16)
        graph.y = compute_gt_labels(src, dst, graph.read_strand,
                                    graph.read_start, graph.read_end,
                                    graph.read_chr)

    if get_similarities:
        graph.overlap_similarity = overlap_similarities(src, dst, ol, reads,
                                                        n_threads=n_threads)

    if read_to_node2:
        read_to_node = read_to_node2

    return ParsedGraph(graph=graph, reads=reads,
                       read_to_node=read_to_node, node_to_read=node_to_read)
