"""Real-external-tool integration tests (``pytest -m external``).

The reference pipeline shells out to hifiasm / Raven / PBSIM3 binaries
(reference graph_dataset.py:107,119; generate_data.py:129-134).  These tests
exercise our drivers against the REAL binaries when they are present (vendor/
as installed by ``gnnome-tpu install-tools``, or on PATH) and skip with an
explicit reason otherwise — this environment is offline, so on CI machines
with the tools installed they validate the full install-tools -> assemble ->
build-graph -> infer chain (VERDICT round-1 item 8).

Deselected by default (``-m "not external"`` is the default addopts); run
with ``pytest -m external tests/test_external.py``.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

from gnnome_tpu.config import Config

pytestmark = pytest.mark.external


def _find_tool(rel_path: str, path_name: str) -> str | None:
    cfg = Config()
    cand = os.path.join(getattr(cfg.paths, rel_path[0]), *rel_path[1:])
    if os.path.isfile(cand) and os.access(cand, os.X_OK):
        return cand
    return shutil.which(path_name)


def _require(tool: str | None, name: str, how: str) -> str:
    if tool is None:
        pytest.skip(f"{name} binary not available (install with {how}); "
                    "offline environments cannot fetch it")
    return tool


@pytest.fixture(scope="module")
def hifiasm_bin():
    return _require(_find_tool(("hifiasm_dir", "hifiasm"), "hifiasm"),
                    "hifiasm", "'gnnome-tpu install-tools'")


@pytest.fixture(scope="module")
def pbsim_bin():
    return _require(_find_tool(("pbsim3_dir", "src", "pbsim"), "pbsim"),
                    "PBSIM3", "'gnnome-tpu install-tools'")


@pytest.fixture(scope="module")
def tiny_reads(tmp_path_factory):
    """Overlapping synthetic HiFi-like reads from a 60 kb genome — enough for
    hifiasm to produce a raw unitig graph."""
    from gnnome_tpu.graphs.synthetic import (random_genome,
                                             simulate_reads_from_genome)
    rng = np.random.default_rng(7)
    genome = random_genome(60_000, rng)
    records = simulate_reads_from_genome(genome, n_reads=120, read_len=3_000,
                                         rng=rng)
    d = tmp_path_factory.mktemp("ext_reads")
    reads = d / "reads.fasta"
    with open(reads, "w") as f:
        for r in records:
            f.write(f">{r.id} {r.description}\n{r.seq}\n")
    return str(reads), genome


def test_install_tools_idempotent_when_present():
    """install_tools must no-op (not re-clone) when binaries exist."""
    cfg = Config()
    hifi = os.path.join(cfg.paths.hifiasm_dir, "hifiasm")
    if not os.path.isfile(hifi):
        pytest.skip("hifiasm not installed under vendor/ "
                    "(offline environment); nothing to verify")
    from gnnome_tpu.data.tools import install_tools
    install_tools(cfg)  # prints "Found hifiasm! ..." and must not rebuild


def test_hifiasm_to_graph_to_infer(hifiasm_bin, tiny_reads, tmp_path):
    """Real hifiasm -> GFA -> parse_gfa -> score with shipped weights
    (the reference run.py:29-38 chain)."""
    reads, _genome = tiny_reads
    out = tmp_path / "asm"
    out.mkdir()
    r = subprocess.run(
        f"{hifiasm_bin} --prt-raw -o {out}/asm -t4 -l0 {reads}",
        shell=True, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    gfa = f"{out}/asm.bp.raw.r_utg.gfa"
    assert os.path.isfile(gfa)

    from gnnome_tpu.graphs.gfa import parse_gfa
    parsed = parse_gfa(gfa, reads_path=reads, get_similarities=True)
    g = parsed.graph
    assert g.num_nodes > 0 and g.num_nodes % 2 == 0
    # RC-twin invariant on a real hifiasm graph
    assert np.array_equal(np.sort(np.unique(g.src ^ 1)),
                          np.sort(np.unique(g.dst)))

    from gnnome_tpu.infer import score_graph
    from gnnome_tpu.models.checkpoint import load_model_weights
    params, state = load_model_weights(
        os.path.join(os.path.dirname(__file__), "..", "weights",
                     "weights.npz"))
    cfg = Config()
    scores = score_graph(g, params, state, cfg)
    assert scores.shape[0] == g.num_edges
    assert np.isfinite(scores).all()


def test_pbsim_simulation(pbsim_bin, tmp_path):
    """Real PBSIM3 wgs/sample run via our driver (simulate.py mirrors
    reference generate_data.py:129-134)."""
    cfg = Config()
    profile_fastq = os.path.join(
        cfg.paths.pbsim3_dir,
        f"sample_profile_{cfg.data.sample_profile_id}.fastq")
    if not os.path.isfile(profile_fastq) and not cfg.data.sample_file:
        pytest.skip("PBSIM3 sample profile missing — run "
                    "'gnnome-tpu download-profile' first")
    from gnnome_tpu.graphs.synthetic import random_genome
    from gnnome_tpu.data.simulate import simulate_reads_hifi
    rng = np.random.default_rng(3)
    chrs = tmp_path / "chrs"
    chrs.mkdir()
    (chrs / "chr19.fasta").write_text(f">chr19\n{random_genome(200_000, rng)}\n")
    datadir = tmp_path / "data"
    simulate_reads_hifi(str(datadir), str(chrs), {"chr19_hg002": 1},
                        "hifiasm", cfg)
    fq = datadir / "chr19" / "raw" / "0.fastq"
    assert fq.is_file()
    # headers rewritten with ground-truth positions (generate_data.py:43-60)
    first = fq.read_text().splitlines()[0]
    assert "start=" in first and "end=" in first and "chr=" in first
