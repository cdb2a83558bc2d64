"""Training-layer tests: loss parity vs torch, metrics vs sklearn, plateau
scheduler vs torch, partitioner invariants, end-to-end overfit + resume."""
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gnnome_tpu.config import Config
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.graphs.partition import partition_graph, partition_edge_cut
from gnnome_tpu.train.loss import bce_with_logits, symmetry_loss
from gnnome_tpu.train import metrics as M
from gnnome_tpu.train.scheduler import ReduceLROnPlateau


def test_bce_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=257).astype(np.float32)
    labels = (rng.random(257) < 0.3).astype(np.float32)
    for pw in (1.0, 7.3):
        ref = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(labels),
            pos_weight=torch.tensor([pw])).item()
        ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels),
                                     pos_weight=pw))
        assert abs(ours - ref) < 1e-6


def test_symmetry_loss_matches_reference_formula():
    """reference train.py:103-109."""
    rng = np.random.default_rng(1)
    org = rng.normal(size=100).astype(np.float32)
    rev = rng.normal(size=100).astype(np.float32)
    labels = (rng.random(100) < 0.5).astype(np.float32)
    pw, alpha = 2.0, 0.1
    bce_o = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(org), torch.from_numpy(labels),
        pos_weight=torch.tensor([pw]), reduction="none")
    bce_r = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(rev), torch.from_numpy(labels),
        pos_weight=torch.tensor([pw]), reduction="none")
    ref = (bce_o + bce_r + alpha * (torch.from_numpy(org) - torch.from_numpy(rev)).abs()).mean().item()
    ours = float(symmetry_loss(jnp.asarray(org), jnp.asarray(rev),
                               jnp.asarray(labels), pos_weight=pw, alpha=alpha))
    assert abs(ours - ref) < 1e-6


def test_masked_loss_equals_unpadded():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=100).astype(np.float32)
    labels = (rng.random(100) < 0.5).astype(np.float32)
    lp = np.concatenate([logits, rng.normal(size=28).astype(np.float32)])
    yp = np.concatenate([labels, np.zeros(28, np.float32)])
    mask = np.concatenate([np.ones(100, np.float32), np.zeros(28, np.float32)])
    a = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels), 3.0))
    b = float(bce_with_logits(jnp.asarray(lp), jnp.asarray(yp), 3.0,
                              mask=jnp.asarray(mask)))
    assert abs(a - b) < 1e-6


def test_metrics_match_sklearn():
    from sklearn.metrics import precision_recall_curve, average_precision_score
    rng = np.random.default_rng(3)
    logits = rng.normal(size=500)
    labels = (rng.random(500) < 0.4).astype(np.float32)
    probs = 1 / (1 + np.exp(-logits))

    p_ref, r_ref, t_ref = precision_recall_curve(labels, probs)
    p, r, t = M.precision_recall_curve(probs, labels)
    np.testing.assert_allclose(p, p_ref, atol=1e-12)
    np.testing.assert_allclose(r, r_ref, atol=1e-12)
    np.testing.assert_allclose(t, t_ref, atol=1e-12)

    ap_ref = average_precision_score(labels, probs)
    assert abs(M.get_aps(logits, labels) - ap_ref) < 1e-12
    ap_inv_ref = average_precision_score(labels, 1 - probs, pos_label=0)
    assert abs(M.get_aps_inverse(logits, labels) - ap_inv_ref) < 1e-12


def test_tfpn_and_f1():
    logits = np.array([3.0, -3.0, 3.0, -3.0])
    labels = np.array([1.0, 0.0, 0.0, 1.0])
    tp, tn, fp, fn = M.calculate_tfpn(logits, labels)
    assert (tp, tn, fp, fn) == (1, 1, 1, 1)
    acc, prec, rec, f1 = M.calculate_metrics(tp, tn, fp, fn)
    assert acc == 0.5 and prec == 0.5 and rec == 0.5 and f1 == 0.5


def test_plateau_scheduler_matches_torch():
    torch_opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1e-4)
    torch_sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        torch_opt, mode="min", factor=0.95, patience=2)
    ours = ReduceLROnPlateau(1e-4, factor=0.95, patience=2)
    rng = np.random.default_rng(4)
    losses = [1.0]
    for _ in range(30):
        losses.append(max(0.01, losses[-1] + rng.normal(0, 0.05) - 0.01))
    for l in losses:
        torch_sched.step(l)
        lr_ours = ours.step(l)
        assert abs(lr_ours - torch_opt.param_groups[0]["lr"]) < 1e-12


def test_partition_invariants():
    g, _, _, _ = synthetic_assembly_graph(n_reads=400, genome_len=40000,
                                          read_len=500, seed=10,
                                          with_sequences=False)
    parts = partition_graph(g, 4, k_hops=1)
    core_union = np.zeros(g.num_nodes, dtype=int)
    for p in parts:
        core_union[p.orig_nodes[p.core_mask]] += 1
        # edge maps valid: parent endpoints match
        np.testing.assert_array_equal(g.src[p.orig_edges],
                                      p.orig_nodes[p.graph.src])
        np.testing.assert_array_equal(g.dst[p.orig_edges],
                                      p.orig_nodes[p.graph.dst])
        # RC pairs co-assigned in the core
        core_nodes = p.orig_nodes[p.core_mask]
        assert set(core_nodes.tolist()) == {x ^ 1 for x in core_nodes.tolist()}
    # cores exactly partition the node set
    assert (core_union == 1).all()
    # banded graph -> modest edge cut
    assert partition_edge_cut(g, parts) < 0.35


@pytest.mark.slow
def test_overfit_training_learns(tmp_path):
    """Overfit mode: loss must drop and AP must beat the untrained model
    (the reference's de-facto 'does it learn' harness, train.py:361-372)."""
    from gnnome_tpu.train.loop import train
    from gnnome_tpu.models.checkpoint import load_model_weights
    from gnnome_tpu.infer import score_graph

    root = tmp_path / "ds"
    (root / "hifiasm" / "processed").mkdir(parents=True)
    (root / "hifiasm" / "info").mkdir(parents=True)
    g, reads, _, _ = synthetic_assembly_graph(n_reads=120, genome_len=10000,
                                              read_len=400, seed=12,
                                              with_sequences=True)
    g.save(str(root / "hifiasm" / "processed" / "0.npz"))
    reads.save(str(root / "hifiasm" / "info" / "0_reads.npz"))

    cfg = Config()
    cfg.train.num_epochs = 12
    cfg.train.lr = 1e-3
    cfg.train.masking = False
    cfg.train.num_nodes_per_cluster = 10000  # full-graph path
    cfg.compute.remat = False
    cfg.paths.models_path = str(tmp_path / "models")
    cfg.paths.checkpoints_path = str(tmp_path / "ckpts")
    cfg.wandb_mode = "disabled"

    model_path = train(str(root), str(root), "hifiasm", out_name="t",
                       overfit=True, cfg=cfg)
    assert os.path.isfile(model_path)

    import json
    log_path = os.path.join(cfg.paths.checkpoints_path, "log_t_seed1.jsonl")
    losses = [json.loads(l)["train/loss"] for l in open(log_path)]
    assert losses[-1] < losses[0] * 0.9

    params, state = load_model_weights(model_path)
    logits = score_graph(g, params, state, cfg)
    ap_trained = M.get_aps(logits, g.y)
    assert ap_trained > 0.75


@pytest.mark.slow
def test_train_partition_path_and_resume(tmp_path):
    """Clustered training path + checkpoint resume."""
    from gnnome_tpu.train.loop import train

    root = tmp_path / "ds"
    (root / "hifiasm" / "processed").mkdir(parents=True)
    g, _, _, _ = synthetic_assembly_graph(n_reads=300, genome_len=25000,
                                          read_len=400, seed=13,
                                          with_sequences=True)
    g.save(str(root / "hifiasm" / "processed" / "0.npz"))

    cfg = Config()
    cfg.train.num_epochs = 2
    cfg.train.num_nodes_per_cluster = 200   # force partitioning (600 nodes)
    cfg.train.masking = True
    cfg.paths.models_path = str(tmp_path / "models")
    cfg.paths.checkpoints_path = str(tmp_path / "ckpts")
    train(str(root), str(root), "hifiasm", out_name="p", overfit=True, cfg=cfg)
    ckpt = os.path.join(cfg.paths.checkpoints_path, "ckpt_p_seed1.npz")
    assert os.path.isfile(ckpt)

    cfg.train.num_epochs = 3
    train(str(root), str(root), "hifiasm", out_name="p", overfit=True,
          resume=True, cfg=cfg)
    log_path = os.path.join(cfg.paths.checkpoints_path, "log_p_seed1.jsonl")
    import json
    epochs = [json.loads(l)["epoch"] for l in open(log_path)]
    assert epochs == [0, 1, 2]


def test_backend_auto_resolves_concrete():
    """'auto' must resolve to a concrete backend at the train/infer entries —
    unresolved 'auto' silently meant the XLA path even on TPU (round-4 fix).
    On the CPU test platform it must resolve to 'xla'."""
    from gnnome_tpu.config import ComputeConfig, resolve_backend

    c = ComputeConfig()
    assert c.backend == "auto"
    assert resolve_backend(c) == "xla"          # tests pin JAX_PLATFORMS=cpu
    c.backend = "pallas"
    assert resolve_backend(c) == "pallas"       # explicit wins
