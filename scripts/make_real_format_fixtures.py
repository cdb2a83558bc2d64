#!/usr/bin/env python
"""Generate the committed real-format GFA fixtures under tests/fixtures/.

The environment has no network access, so the real assemblers (hifiasm,
Raven) cannot run here.  These fixtures instead reproduce the assemblers'
OUTPUT FORMATS byte-for-byte as the reference parses them
(graph_parser.py:153-341):

  hifiasm `.bp.raw.r_utg.gfa` (hifiasm 0.18.x `--prt-raw -l0`, the file
  graph_dataset.py:119-122 consumes):
    S  utg%06dl  <seq>      LN:i:<len>  rd:i:<cov>
    A  utg%06dl  <utg-off>  +/-  <read-name>  0  <read-len>  id:i:<n>  HG:A:a
    L  utg%06dl:<s>-<e>  +/-  utg%06dl:<s>-<e>  +/-  <ol>M  L1:i:<span>
  (7-field L records whose ids carry `:start-end` ranges — the reference
  strips them with `re.findall(r'(.*):\\d-\\d*', id)`, graph_parser.py:280-283.)

  newer hifiasm (8-field L records, graph_parser.py:284-286): same, plus one
  more tag and UN-ranged ids.

  Raven `graph_1.gfa` (print_graphs branch, graph_dataset.py:107-108):
    S  <read-name>  <seq>  LN:i:<len>
    L  <read-name>  +/-  <read-name>  +/-  <ol>M
  (6-field L records, GFA-1 standard, graph_parser.py:276-278.)

  Raven noseq variant: S records carry `*` so the parser must splice
  sequences from the reads FASTA (graph_parser.py:344-360).

All sequences are substrings (or reverse complements) of one 6 kb
mini-genome, so every link's overlap is a REAL exact sequence overlap:
similarity featurization, GT labels, and greedy decode all behave as they
would on assembler output.  Read headers carry the training annotations the
pipeline writes after PBSIM (`strand= start= end= chr=`, generate_data
change_description_pbsim, reference generate_data.py:43-60).

Run once; outputs are committed. Regenerate only if the format model changes.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnnome_tpu.graphs.synthetic import random_genome  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")

_COMP = str.maketrans("ACGT", "TGCA")


def rc(s: str) -> str:
    return s.translate(_COMP)[::-1]


def wrap(seq: str, width: int = 60) -> str:
    return "\n".join(seq[i:i + width] for i in range(0, len(seq), width))


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260819)
    genome = random_genome(6000, rng)

    # ------------------------------------------------------------- hifiasm
    # 6 raw unitigs tiling the genome with ~400 bp overlaps; utg3 on the
    # '-' strand; utg1/utg4 are multi-read (A-line collapsing).
    utg_iv = [(0, 1400), (1000, 2600), (2200, 3600),
              (3200, 4600), (4200, 5400), (5000, 6000)]
    utg_strand = ["+", "+", "-", "+", "+", "-"]
    # reads inside each unitig: (utg-relative start, length, a_orient)
    utg_reads = [
        [(0, 900, "+"), (500, 900, "-")],
        [(0, 1600, "+")],
        [(0, 1400, "+")],
        [(0, 1000, "+"), (600, 500, "+"), (900, 500, "-")],
        [(0, 1200, "+")],
        [(0, 1000, "+")],
    ]

    hifi_name = "m64011_190830_220126/{}/ccs".format
    gfa = []
    gfa8 = []
    reads_fa = []
    rid = 0
    read_names = []
    for t, ((g0, g1), us) in enumerate(zip(utg_iv, utg_reads)):
        useq = genome[g0:g1]
        if utg_strand[t] == "-":
            useq = rc(useq)
        name = f"utg{t + 1:06d}l"
        cov = int(rng.integers(28, 64))
        s_line = f"S\t{name}\t{useq}\tLN:i:{len(useq)}\trd:i:{cov}\n"
        gfa.append(s_line)
        gfa8.append(s_line)
        for off, ln, a_o in utg_reads[t]:
            rname = hifi_name(4000 + 7 * rid)
            read_names.append(rname)
            # genome coordinates of the read (unitig-relative offsets are on
            # the unitig's OWN orientation; map back to genome space)
            if utg_strand[t] == "+":
                r0, r1 = g0 + off, g0 + off + ln
            else:
                r1, r0 = g1 - off, g1 - off - ln
            # the read's own strand in genome space: unitig strand x A orient
            s_g = 1 if utg_strand[t] == "+" else -1
            s_a = 1 if a_o == "+" else -1
            strand = "+" if s_g * s_a > 0 else "-"
            rseq = genome[r0:r1]
            a_line = (f"A\t{name}\t{off}\t{a_o}\t{rname}\t0\t{ln}"
                      f"\tid:i:{rid}\tHG:A:a\n")
            gfa.append(a_line)
            gfa8.append(a_line)
            reads_fa.append(
                f">{rname} strand={strand} start={r0} end={r1} chr=1\n"
                f"{wrap(rseq if strand == '+' else rc(rseq))}\n")
            rid += 1

    # links between genome-adjacent unitigs; ol = interval overlap
    for t in range(5):
        g0a, g1a = utg_iv[t]
        g0b, g1b = utg_iv[t + 1]
        ol = g1a - g0b
        la, lb = g1a - g0a, g1b - g0b
        na, nb = f"utg{t + 1:06d}l", f"utg{t + 2:06d}l"
        oa, ob = utg_strand[t], utg_strand[t + 1]
        span = la - ol                    # hifiasm L1:i: = src span
        gfa.append(f"L\t{na}:0-{la}\t{oa}\t{nb}:0-{lb}\t{ob}\t{ol}M"
                   f"\tL1:i:{span}\n")
        gfa8.append(f"L\t{na}\t{oa}\t{nb}\t{ob}\t{ol}M"
                    f"\tL1:i:{span}\tL2:i:{ol}\n")

    with open(os.path.join(OUT, "hifiasm_bp_raw_r_utg.gfa"), "w") as f:
        f.writelines(gfa)
    with open(os.path.join(OUT, "hifiasm_8col_r_utg.gfa"), "w") as f:
        f.writelines(gfa8)
    with open(os.path.join(OUT, "hifi_reads.fasta"), "w") as f:
        f.writelines(reads_fa)

    # --------------------------------------------------------------- raven
    # ONT-style: every read is its own S record (no unitigs); 10 reads
    # tiling the genome, reads 4 and 8 reversed.
    n_reads = 10
    step = (6000 - 1200) // (n_reads - 1)
    r_iv = [(i * step, i * step + 1200) for i in range(n_reads)]
    r_strand = ["-" if i in (4, 8) else "+" for i in range(n_reads)]
    raven = []
    raven_noseq = []
    raven_fa = []
    for i, (r0, r1) in enumerate(r_iv):
        rname = f"read_{i + 1:05d}"
        rseq = genome[r0:r1]
        sseq = rseq if r_strand[i] == "+" else rc(rseq)
        raven.append(f"S\t{rname}\t{sseq}\tLN:i:{len(sseq)}\n")
        raven_noseq.append(f"S\t{rname}\t*\tLN:i:{len(sseq)}\n")
        # raven S sequences are as-assembled; the reads file carries the
        # sequencer's orientation (here: the S orientation, so the noseq
        # splice reproduces the same node sequences)
        raven_fa.append(f">{rname} strand={r_strand[i]} start={r0} "
                        f"end={r1} chr=1\n{wrap(sseq)}\n")
    for i in range(n_reads - 1):
        r0a, r1a = r_iv[i]
        r0b, r1b = r_iv[i + 1]
        ol = r1a - r0b
        na, nb = f"read_{i + 1:05d}", f"read_{i + 2:05d}"
        l_line = f"L\t{na}\t{r_strand[i]}\t{nb}\t{r_strand[i + 1]}\t{ol}M\n"
        raven.append(l_line)
        raven_noseq.append(l_line)

    with open(os.path.join(OUT, "raven_graph_1.gfa"), "w") as f:
        f.writelines(raven)
    with open(os.path.join(OUT, "raven_graph_1_noseq.gfa"), "w") as f:
        f.writelines(raven_noseq)
    with open(os.path.join(OUT, "ont_reads.fasta"), "w") as f:
        f.writelines(raven_fa)
    with open(os.path.join(OUT, "mini_genome.txt"), "w") as f:
        f.write(genome)

    make_multichr(rng)
    make_circular(rng)
    make_p_ctg(genome)
    print("fixtures written to", OUT)


def make_multichr(rng):
    """Multi-chromosome training fixture with a planted-repeat FALSE link.

    chr1: three '+' unitigs tiling a 4 kb genome; utg1 additionally carries a
    CONTAINED '-'-orientation read (A-line whose interval sits strictly inside
    the unitig — exercises the majority-vote strand collapse and the min/max
    position union, reference graph_parser.py:231-266).  chr2: a 3 kb genome
    whose first 350 bp are a REPEAT copied from the tail of chr1's last
    unitig, tiled by two '+' unitigs.  The repeat makes the cross-chromosome
    link utg3->utg4 sequence-exact (a real assembler would emit it) while its
    GT label must be 0 (different chromosome, reference labels.py:80-93 /
    process_graph_combo labels.py:152-179).  Reads FASTA is written both
    plain and gzipped (reference graph_parser.py:124-128 reads .gz directly).
    """
    import gzip

    g1 = random_genome(4000, rng)
    # chr2 begins with the 350 bp repeat that ends chr1's utg3
    g2 = g1[3650:4000] + random_genome(2650, rng)

    utgs = [  # (chr, genome, g0, g1)
        (1, g1, 0, 1400), (1, g1, 1000, 2600), (1, g1, 2200, 4000),
        (2, g2, 0, 1600), (2, g2, 1200, 3000),
    ]
    # reads per unitig: (utg-relative start, length, A orient); utg1's second
    # read is CONTAINED (400..1000 strictly inside 0..1400) on '-'
    reads_per_utg = [
        [(0, 1400, "+"), (400, 600, "-")],
        [(0, 1600, "+")],
        [(0, 1800, "+")],
        [(0, 1600, "+")],
        [(0, 1000, "+"), (700, 1100, "+")],
    ]
    hifi_name = "m64012_200430_101212/{}/ccs".format
    gfa, fa = [], []
    rid = 0
    for t, (chrom, gg, a0, a1) in enumerate(utgs):
        name = f"utg{t + 1:06d}l"
        useq = gg[a0:a1]
        gfa.append(f"S\t{name}\t{useq}\tLN:i:{len(useq)}\trd:i:"
                   f"{int(rng.integers(28, 64))}\n")
        for off, ln, a_o in reads_per_utg[t]:
            rname = hifi_name(5000 + 3 * rid)
            r0, r1 = a0 + off, a0 + off + ln
            strand = a_o                        # all unitigs are '+' strand
            rseq = gg[r0:r1]
            gfa.append(f"A\t{name}\t{off}\t{a_o}\t{rname}\t0\t{ln}"
                       f"\tid:i:{rid}\tHG:A:a\n")
            fa.append(f">{rname} strand={strand} start={r0} end={r1} "
                      f"chr={chrom}\n{wrap(rseq if strand == '+' else rc(rseq))}\n")
            rid += 1

    def link(a, b, ol):
        la = utgs[a][3] - utgs[a][2]
        lb = utgs[b][3] - utgs[b][2]
        gfa.append(f"L\tutg{a + 1:06d}l:0-{la}\t+\tutg{b + 1:06d}l:0-{lb}\t+"
                   f"\t{ol}M\tL1:i:{la - ol}\n")

    link(0, 1, 1400 - 1000)       # chr1 chain
    link(1, 2, 2600 - 2200)
    link(3, 4, 1600 - 1200)       # chr2 chain
    link(2, 3, 350)               # FALSE cross-chromosome repeat link

    with open(os.path.join(OUT, "hifiasm_multichr_r_utg.gfa"), "w") as f:
        f.writelines(gfa)
    reads = "".join(fa)
    with open(os.path.join(OUT, "hifi_reads_multichr.fasta"), "w") as f:
        f.write(reads)
    # deterministic gzip bytes (mtime=0) so the fixture is stable
    with open(os.path.join(OUT, "hifi_reads_multichr.fasta.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as z:
            z.write(reads.encode("ascii"))
    with open(os.path.join(OUT, "mini_genome_chr1.txt"), "w") as f:
        f.write(g1)
    with open(os.path.join(OUT, "mini_genome_chr2.txt"), "w") as f:
        f.write(g2)


def make_circular(rng):
    """Circular-unitig fixture: hifiasm names circular unitigs ``utg%06dc``
    and links them to themselves (end-to-start overlap).  The unitig sequence
    is a 1.2 kb plasmid plus its own first 300 bp, so the self-link's overlap
    is sequence-exact (suffix == prefix).  The reference parser treats the
    self-link like any L record — it becomes a self-loop edge pair
    (graph_parser.py:300-326)."""
    plasmid = random_genome(1200, rng)
    useq = plasmid + plasmid[:300]
    name = "utg000001c"
    gfa = [f"S\t{name}\t{useq}\tLN:i:{len(useq)}\trd:i:41\n"]
    for i, (off, ln) in enumerate([(0, 800), (600, 900)]):
        gfa.append(f"A\t{name}\t{off}\t+\tplasmid_read_{i}\t0\t{ln}"
                   f"\tid:i:{i}\tHG:A:a\n")
    gfa.append(f"L\t{name}:0-{len(useq)}\t+\t{name}:0-{len(useq)}\t+\t300M"
               f"\tL1:i:{len(useq) - 300}\n")
    with open(os.path.join(OUT, "hifiasm_circular_utg.gfa"), "w") as f:
        f.writelines(gfa)
    with open(os.path.join(OUT, "mini_plasmid.txt"), "w") as f:
        f.write(plasmid)


def make_p_ctg(genome):
    """hifiasm primary-contig file (``*.bp.p_ctg.gfa``): S records only, as
    consumed by the contig extraction (reference utils/data_utils.py:13-27)."""
    with open(os.path.join(OUT, "hifiasm_p_ctg.gfa"), "w") as f:
        for n, (a, b) in enumerate([(0, 3500), (3200, 6000)]):
            seq = genome[a:b]
            f.write(f"S\tptg{n + 1:06d}l\t{seq}\tLN:i:{len(seq)}"
                    f"\trd:i:33\n")
            f.write(f"A\tptg{n + 1:06d}l\t0\t+\tm64011_190830_220126/"
                    f"{4000 + n}/ccs\t0\t{b - a}\tid:i:{n}\tHG:A:a\n")


if __name__ == "__main__":
    main()
