"""Data-pipeline tests: train/valid splitting, config round-trip/overrides,
dataset cache semantics."""
import json
import os

import numpy as np
import pytest

from gnnome_tpu.config import Config
from gnnome_tpu.data.split import train_valid_split
from gnnome_tpu.data.chromosomes import get_train_valid_chrs, merge_dicts
from gnnome_tpu.graphs import synthetic_assembly_graph


def _make_chr_dataset(root, chrN, n_graphs, assembler="hifiasm"):
    prc = root / chrN / assembler / "processed"
    info = root / chrN / assembler / "info"
    prc.mkdir(parents=True)
    info.mkdir(parents=True)
    for i in range(n_graphs):
        g, reads, _, _ = synthetic_assembly_graph(
            n_reads=30, genome_len=3000, read_len=300, seed=i,
            with_sequences=True)
        g.save(str(prc / f"{i}.npz"))
        reads.save(str(info / f"{i}_reads.npz"))


def test_train_valid_split(tmp_path):
    data = tmp_path / "data"
    _make_chr_dataset(data, "chr19", 3)
    _make_chr_dataset(data, "chr20", 2)
    train_dict = {"chr19_hg002": 2, "chr20_hg002": 1}
    valid_dict = {"chr19_hg002": 1, "chr20_hg002": 1}
    tdir, vdir = train_valid_split(str(data), str(tmp_path / "sets"),
                                   "hifiasm", train_dict, valid_dict, "run")
    t_prc = os.path.join(tdir, "hifiasm", "processed")
    v_prc = os.path.join(vdir, "hifiasm", "processed")
    assert sorted(os.listdir(t_prc)) == ["0.npz", "1.npz", "2.npz"]
    assert sorted(os.listdir(v_prc)) == ["0.npz", "1.npz"]
    # valid picks up AFTER the train offset per chromosome (split_data.py:86-89)
    import pickle
    with open(os.path.join(vdir, "hifiasm", "info", "g_to_org_g.pkl"), "rb") as f:
        g_to_org = pickle.load(f)
    with open(os.path.join(vdir, "hifiasm", "info", "g_to_chr.pkl"), "rb") as f:
        g_to_chr = pickle.load(f)
    assert g_to_chr == {0: "chr19", 1: "chr20"}
    assert g_to_org == {0: 2, 1: 1}
    # reads stores copied alongside
    assert os.path.isfile(os.path.join(tdir, "hifiasm", "info", "0_reads.npz"))


def test_chromosome_config(tmp_path):
    t, v = get_train_valid_chrs()
    assert t and v
    p = tmp_path / "chrs.json"
    p.write_text(json.dumps({"train": {"chr1_hg002": 2}, "valid": {"chr2_hg002": 1}}))
    t2, v2 = get_train_valid_chrs(str(p))
    assert t2 == {"chr1_hg002": 2}
    assert merge_dicts(t2, v2) == {"chr1_hg002": 2, "chr2_hg002": 1}


def test_config_roundtrip_and_overrides(tmp_path):
    cfg = Config()
    cfg.apply_overrides(["train.lr=0.01", "decode.len_threshold=5000",
                         "model.normalization=layer", "train.masking=false",
                         "compute.remat=full"])
    assert cfg.train.lr == 0.01
    assert cfg.decode.len_threshold == 5000
    assert cfg.model.normalization == "layer"
    assert cfg.train.masking is False
    assert cfg.compute.remat == "full"

    p = str(tmp_path / "c.json")
    cfg.save(p)
    cfg2 = Config.load(p)
    assert cfg2.train.lr == 0.01
    assert cfg2.compute.remat == "full"

    with pytest.raises(KeyError):
        cfg.apply_overrides(["nope.key=1"])
    with pytest.raises(AttributeError):
        cfg.apply_overrides(["train.nope=1"])


def test_dataset_cache_and_lazy_loading(tmp_path):
    from gnnome_tpu.data.dataset import dataset_for
    root = tmp_path / "ds"
    (root / "hifiasm" / "processed").mkdir(parents=True)
    (root / "hifiasm" / "info").mkdir(parents=True)
    for i in range(2):
        g, _, _, _ = synthetic_assembly_graph(n_reads=20, genome_len=2000,
                                              read_len=300, seed=i,
                                              with_sequences=False)
        g.save(str(root / "hifiasm" / "processed" / f"{i}.npz"))
    ds = dataset_for("hifiasm", str(root), n_need=2)
    assert len(ds) == 2
    assert ds.has_cache()
    idx, g0 = ds[0]
    assert idx == 0 and g0.num_nodes == 40
    ds3 = dataset_for("hifiasm", str(root), n_need=3)
    assert not ds3.has_cache()

    # epoch 2+ does zero disk reads: repeated access returns the in-memory
    # graph (reference keeps graphs loaded for the run, graph_dataset.py:47-56)
    _, again = ds[0]
    assert again is g0
    import gnnome_tpu.data.dataset as dsmod
    calls = []
    orig = dsmod.AssemblyGraph.load
    dsmod.AssemblyGraph.load = classmethod(
        lambda cls, p: calls.append(p) or orig(p))
    try:
        ds[0], ds[1], ds[0], ds[1]
        assert len(calls) == 1  # only ds[1]'s first-ever access hits disk
    finally:
        dsmod.AssemblyGraph.load = orig
