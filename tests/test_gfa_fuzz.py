"""GFA parser robustness fuzzing (round-5 verdict ask #6).

Real assembler output can arrive truncated (killed run, partial download) or
corrupted; the reference parser dies with bare unpack/KeyError on such input
(reference graph_parser.py:153-341).  Contract tested here: for ANY
truncation or field-level corruption of a valid GFA, ``parse_gfa`` either
parses successfully (benign corruption, e.g. whole-line truncation) or
raises ``GFAFormatError``/``ValueError`` with the offending location — never
IndexError/KeyError/UnboundLocalError, and never silently-wrong numbers
(e.g. a cigar '1234' without the M suffix used to parse as 123).
"""
import os

import numpy as np
import pytest

from gnnome_tpu.graphs.gfa import parse_gfa, GFAFormatError
from gnnome_tpu.graphs.synthetic import (simulate_reads_from_genome,
                                         random_genome, write_synthetic_gfa)
from gnnome_tpu.utils.fastx import write_fasta


@pytest.fixture(scope="module")
def valid_gfa(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fuzz")
    rng = np.random.default_rng(11)
    genome = random_genome(6000, rng)
    records, starts, ends, strands = simulate_reads_from_genome(
        genome, 40, 600, rng)
    gfa = os.path.join(tmp, "g.gfa")
    reads = os.path.join(tmp, "reads.fasta")
    write_synthetic_gfa(records, starts, ends, strands, gfa, reads,
                        dialect="raven")
    with open(gfa) as f:
        text = f.read()
    return tmp, gfa, reads, text


def _expect_parse_or_format_error(path, reads_path=None, training=False):
    try:
        parse_gfa(path, reads_path=reads_path, training=training)
        return "ok"
    except (GFAFormatError, ValueError):
        return "format-error"
    # anything else (IndexError, KeyError, UnboundLocalError...) propagates
    # and fails the test


def test_valid_baseline(valid_gfa):
    _, gfa, reads, _ = valid_gfa
    pg = parse_gfa(gfa, reads_path=reads, training=True)
    assert pg.graph.num_edges > 0
    assert pg.graph.y is not None


def test_byte_truncations(valid_gfa, tmp_path):
    """Truncate the file at many byte offsets: whole-line truncations parse
    (fewer records), mid-line truncations raise a format error."""
    _, _, reads, text = valid_gfa
    rng = np.random.default_rng(0)
    # random mid-line cuts + explicit line-boundary cuts (benign: whole
    # trailing records vanish)
    newlines = [i + 1 for i, ch in enumerate(text) if ch == "\n"]
    offsets = sorted(set(rng.integers(1, len(text), size=40).tolist()
                         + newlines[:: max(1, len(newlines) // 8)]))
    outcomes = set()
    for i, off in enumerate(offsets):
        p = str(tmp_path / f"trunc_{i}.gfa")
        with open(p, "w") as f:
            f.write(text[:off])
        outcomes.add(_expect_parse_or_format_error(p))
    # both outcomes must actually occur across the cut points
    assert outcomes == {"ok", "format-error"}


def test_line_truncations(valid_gfa, tmp_path):
    """Drop 1..k trailing fields from every line kind."""
    _, _, reads, text = valid_gfa
    lines = text.splitlines()
    for li in (0, len(lines) // 2, len(lines) - 1):
        fields = lines[li].split("\t")
        for keep in range(1, len(fields)):
            p = str(tmp_path / "cut.gfa")
            mutated = lines.copy()
            mutated[li] = "\t".join(fields[:keep])
            with open(p, "w") as f:
                f.write("\n".join(mutated) + "\n")
            _expect_parse_or_format_error(p)


@pytest.mark.parametrize("mutation,expect", [
    # cigar without M must NOT silently parse as int(cigar[:-1])
    (lambda l: l.replace("M", "", 1), "format-error"),
    (lambda l: l.replace("M", "xM", 1), "format-error"),
    # bad orientation char
    (lambda l: "\t".join(
        f if i != 2 else "*" for i, f in enumerate(l.split("\t"))),
     "format-error"),
    # unknown segment id
    (lambda l: "\t".join(
        f if i != 1 else "nosuchread" for i, f in enumerate(l.split("\t"))),
     "format-error"),
])
def test_l_record_corruptions(valid_gfa, tmp_path, mutation, expect):
    _, _, reads, text = valid_gfa
    lines = text.splitlines()
    li = next(i for i, l in enumerate(lines) if l.startswith("L"))
    lines[li] = mutation(lines[li])
    p = str(tmp_path / "mut.gfa")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    assert _expect_parse_or_format_error(p) == expect


def test_s_record_corruptions(valid_gfa, tmp_path):
    _, _, reads, text = valid_gfa
    lines = text.splitlines()
    si = next(i for i, l in enumerate(lines) if l.startswith("S"))
    for mut in (
        lambda f: f[:3],                              # missing LN tag
        lambda f: f[:3] + ["LN:x:12"],                # wrong tag name
        lambda f: f[:3] + ["LN:i:abc"],               # non-numeric length
    ):
        p = str(tmp_path / "muts.gfa")
        mutated = lines.copy()
        mutated[si] = "\t".join(mut(lines[si].split("\t")))
        with open(p, "w") as f:
            f.write("\n".join(mutated) + "\n")
        assert _expect_parse_or_format_error(p) == "format-error"


def test_error_messages_carry_location(valid_gfa, tmp_path):
    _, _, reads, text = valid_gfa
    lines = text.splitlines()
    li = next(i for i, l in enumerate(lines) if l.startswith("L"))
    lines[li] = lines[li].replace("M", "Q")
    p = str(tmp_path / "loc.gfa")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    with pytest.raises(GFAFormatError) as ei:
        parse_gfa(p)
    assert f":{li + 1}:" in str(ei.value)         # 1-based line number
    assert "cigar" in str(ei.value)


def test_training_missing_read_header(valid_gfa, tmp_path):
    """GFA references a read absent from the reads file -> clear error."""
    _, gfa, reads, text = valid_gfa
    from gnnome_tpu.utils.fastx import read_fastx
    recs = [r for r in read_fastx(reads)][:-1]     # drop the last read
    short = str(tmp_path / "short.fasta")
    write_fasta(recs, short)
    with pytest.raises(GFAFormatError) as ei:
        parse_gfa(gfa, reads_path=short, training=True)
    assert "no record" in str(ei.value)
