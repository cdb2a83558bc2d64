"""End-to-end smoke test: GFA -> parse -> score (shipped weights) -> decode ->
FASTA, through the CLI surface (SURVEY.md §4 item 5; stands in for the
reference's E. coli example, README.md:85-109)."""
import os

import numpy as np
import pytest

from gnnome_tpu import cli
from gnnome_tpu.graphs.synthetic import (random_genome, simulate_reads_from_genome,
                                         write_synthetic_gfa)

WEIGHTS = "/root/repo/weights/weights.npz"


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(11)
    genome = random_genome(30_000, rng)
    records, starts, ends, strands = simulate_reads_from_genome(
        genome, 300, 700, rng)
    gfa = str(root / "g.gfa")
    reads = str(root / "reads.fasta")
    write_synthetic_gfa(records, starts, ends, strands, gfa, reads,
                        dialect="hifiasm")
    return root, gfa, reads, genome


def test_cli_build_graph_and_infer(synthetic_dataset):
    root, gfa, reads, genome = synthetic_dataset
    out = str(root / "ds")
    cli.main(["build-graph", "--gfa", gfa, "--reads", reads,
              "--asm", "hifiasm", "--out", out, "--threads", "2"])
    assert os.path.isfile(os.path.join(out, "hifiasm", "processed", "0.npz"))

    savedir = os.path.join(out, "hifiasm")
    cli.main(["infer", "--data", out, "--asm", "hifiasm", "--out", savedir,
              "--model", WEIGHTS,
              "--set", "decode.len_threshold=3000",
              "--set", "decode.num_decoding_paths=20"])
    asm = os.path.join(savedir, "assembly", "0_assembly.fasta")
    assert os.path.isfile(asm)
    # logits cache written and reused
    assert os.path.isfile(os.path.join(savedir, "decode", "0_predicts.npy"))
    from gnnome_tpu.utils.fastx import read_fastx
    contigs = list(read_fastx(asm))
    assert len(contigs) >= 1
    longest = max(len(c.seq) for c in contigs)
    assert longest >= 3000  # decoded something genome-scale


def test_label_decode_cli(synthetic_dataset):
    """decode_with_labels oracle through the pipeline (training-mode graph)."""
    root, gfa, reads, genome = synthetic_dataset
    out = str(root / "ds_gt")
    cli.main(["build-graph", "--gfa", gfa, "--reads", reads, "--asm", "hifiasm",
              "--out", out, "--training", "--threads", "2"])
    savedir = os.path.join(out, "hifiasm")
    cli.main(["infer", "--data", out, "--asm", "hifiasm", "--out", savedir,
              "--model", WEIGHTS,
              "--set", "decode.decode_with_labels=true",
              "--set", "decode.len_threshold=3000",
              "--set", "decode.num_decoding_paths=20"])
    from gnnome_tpu.utils.fastx import read_fastx, reverse_complement
    contigs = list(read_fastx(os.path.join(savedir, "assembly",
                                           "0_assembly.fasta")))
    top = max(contigs, key=lambda c: len(c.seq))
    # perfect-label decode on an error-free layout graph: exact reconstruction
    assert top.seq in genome or top.seq in reverse_complement(genome)
    assert len(top.seq) > 0.5 * len(genome)
