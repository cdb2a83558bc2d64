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


def test_multi_graph_dataset_inference(tmp_path):
    """run_inference iterates every graph in the dataset (inference.py:408)."""
    from gnnome_tpu.config import Config
    from gnnome_tpu.infer import run_inference
    from gnnome_tpu.graphs import synthetic_assembly_graph

    root = tmp_path / "ds"
    (root / "hifiasm" / "processed").mkdir(parents=True)
    (root / "hifiasm" / "info").mkdir(parents=True)
    for i in range(2):
        g, reads, _, _ = synthetic_assembly_graph(
            n_reads=60, genome_len=5000, read_len=400, seed=80 + i,
            with_sequences=True)
        g.save(str(root / "hifiasm" / "processed" / f"{i}.npz"))
        reads.save(str(root / "hifiasm" / "info" / f"{i}_reads.npz"))

    cfg = Config()
    cfg.decode.len_threshold = 1000
    cfg.decode.num_decoding_paths = 10
    out = str(root / "hifiasm")
    summary = run_inference(str(root), WEIGHTS, "hifiasm", out, cfg,
                            verbose=False)
    assert [g["idx"] for g in summary["graphs"]] == [0, 1]
    for i in range(2):
        assert os.path.isfile(os.path.join(out, "assembly",
                                           f"{i}_assembly.fasta"))
        assert os.path.isfile(os.path.join(out, "reports", f"{i}_report.txt"))
