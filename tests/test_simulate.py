"""Read-simulation orchestration (reference generate_data.py:88-135) tested
against a fake pbsim binary that emits deterministic FASTQ+MAF output."""
import os
import stat

import numpy as np
import pytest

from gnnome_tpu.config import Config
from gnnome_tpu.data.simulate import simulate_reads_hifi, change_description_seqreq
from gnnome_tpu.utils.fastx import read_fastx, write_fasta, FastxRecord


FAKE_PBSIM = r'''#!/usr/bin/env python3
"""Fake pbsim: reads --genome/--prefix/--depth, emits <prefix>_0001.fastq/.maf/.ref
in PBSIM3's conventions (enough reads for a couple per genome)."""
import sys

args = sys.argv[1:]
opt = {args[i]: args[i + 1] for i in range(0, len(args) - 1)
       if args[i].startswith("--")}
genome_path, prefix = opt["--genome"], opt["--prefix"]
with open(genome_path) as f:
    lines = [l.strip() for l in f if not l.startswith(">")]
genome = "".join(lines)

reads = [(0, 60, "+"), (40, 100, "-"), (80, len(genome), "+")]
with open(prefix + "_0001.fastq", "w") as fq, open(prefix + "_0001.maf", "w") as maf:
    for i, (s, e, strand) in enumerate(reads):
        seq = genome[s:e]
        if strand == "-":
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            seq = "".join(comp[c] for c in reversed(seq))
        rid = f"S1_{i+1}"
        fq.write(f"@{rid}\n{seq}\n+\n{'I'*len(seq)}\n")
        maf.write("a\n")
        maf.write(f"s ref {s} {e-s} + {len(genome)} {genome[s:e]}\n")
        maf.write(f"s {rid} 0 {len(seq)} {strand} {len(seq)} {seq}\n\n")
open(prefix + "_0001.ref", "w").write("ref\n")
'''


@pytest.fixture
def fake_pbsim_env(tmp_path):
    pbsim_dir = tmp_path / "pbsim3"
    (pbsim_dir / "src").mkdir(parents=True)
    exe = pbsim_dir / "src" / "pbsim"
    exe.write_text(FAKE_PBSIM)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    # a sample profile file marker so no --sample arg is required
    (pbsim_dir / "sample_profile_test.fastq").write_text("")
    cfg = Config()
    cfg.paths.pbsim3_dir = str(pbsim_dir)
    cfg.data.sample_profile_id = "test"
    return cfg


def test_simulate_reads_hifi(tmp_path, fake_pbsim_env):
    cfg = fake_pbsim_env
    chrs = tmp_path / "chrs"
    chrs.mkdir()
    rng = np.random.default_rng(0)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    write_fasta([FastxRecord("chr21", "chr21", genome)],
                str(chrs / "chr21.fasta"))

    datadir = tmp_path / "data"
    simulate_reads_hifi(str(datadir), str(chrs), {"chr21_hg002": 2},
                        "hifiasm", cfg)

    raw = datadir / "chr21" / "raw"
    files = sorted(os.listdir(raw))
    assert files == ["0.fasta", "1.fasta"]  # fastq+maf consumed and removed
    recs = list(read_fastx(str(raw / "0.fasta")))
    assert len(recs) == 3
    # ground truth annotated from the MAF (strand/start/end/chr)
    from gnnome_tpu.utils.fastx import parse_training_header
    strand, start, end, chrom = parse_training_header(recs[1].description)
    assert (strand, start, end, chrom) == (-1, 40, 100, 21)
    # negative-strand read sequence is the RC of the genome slice
    from gnnome_tpu.utils.fastx import reverse_complement
    assert recs[1].seq == reverse_complement(genome[40:100])

    # idempotence: rerun needs nothing new
    simulate_reads_hifi(str(datadir), str(chrs), {"chr21_hg002": 2},
                        "hifiasm", cfg)
    assert sorted(os.listdir(raw)) == ["0.fasta", "1.fasta"]


def test_change_description_seqreq(tmp_path):
    p = str(tmp_path / "r.fasta")
    write_fasta([FastxRecord("x", "read=7,forward,position=10-60", "ACGT"),
                 FastxRecord("y", "read=8,reverse,position=5-25", "GGTT")], p)
    change_description_seqreq(p)
    recs = list(read_fastx(p))
    assert recs[0].description == "7 strand=+ start=10 end=60"
    assert recs[1].description == "8 strand=- start=5 end=25"
