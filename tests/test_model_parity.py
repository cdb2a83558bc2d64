"""Golden-parity tests: gnnome_tpu SymGatedGCN vs the torch oracle
(state-dict-compatible with the reference), including the shipped weights.pt
(SURVEY.md §4 test pyramid, item 2)."""
import numpy as np
import pytest
import torch

from gnnome_tpu.config import ModelConfig
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.models import (sym_gated_gcn_forward, torch_to_pytree,
                               pytree_to_torch, edge_features, node_features,
                               sym_gated_gcn_init)
from gnnome_tpu.ops import GraphTensors

from torch_ref import RefSymGatedGCNModel

WEIGHTS_PT = "/root/reference/weights/weights.pt"
CFG = ModelConfig()


def _setup(seed=0, n_reads=80):
    g, _, _, _ = synthetic_assembly_graph(n_reads=n_reads, genome_len=6000,
                                          read_len=400, seed=seed,
                                          with_sequences=True)
    gt = GraphTensors.from_graph(g, edge_pad_multiple=256, node_pad_multiple=64)
    x = node_features(g)
    e = edge_features(g)
    return g, gt, x, e


def _torch_logits(model, g, x, e, flip=False):
    src = torch.from_numpy(g.src.astype(np.int64))
    dst = torch.from_numpy(g.dst.astype(np.int64))
    xt = torch.from_numpy(x)
    et = torch.from_numpy(e)
    with torch.no_grad():
        if flip:
            return model.forward_flipped(src, dst, xt, et).numpy()
        return model(src, dst, xt, et).numpy()


def _jax_logits(params, state, gt, g, x, e, training=False, flip=False):
    scores, new_state = sym_gated_gcn_forward(
        params, state, gt, gt.pad_nodes(x), gt.pad_edges(e), CFG,
        training=training, flip=flip)
    return np.asarray(scores)[: g.num_edges], new_state


@pytest.fixture(scope="module")
def setup():
    return _setup()


def test_eval_parity_random_weights(setup):
    g, gt, x, e = setup
    model = RefSymGatedGCNModel()
    torch.manual_seed(0)
    model.eval()
    params, state = torch_to_pytree(
        {k: v.numpy() for k, v in model.state_dict().items()})
    ours = _jax_logits(params, state, gt, g, x, e)[0]
    ref = _torch_logits(model, g, x, e)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_eval_parity_shipped_weights(setup):
    """Edge logits with the reference's released weights.pt must match."""
    g, gt, x, e = setup
    model = RefSymGatedGCNModel()
    sd = torch.load(WEIGHTS_PT, map_location="cpu")
    model.load_state_dict(sd)
    model.eval()
    params, state = torch_to_pytree(WEIGHTS_PT)
    ours = _jax_logits(params, state, gt, g, x, e)[0]
    ref = _torch_logits(model, g, x, e)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)
    # probabilities must match even tighter
    np.testing.assert_allclose(1 / (1 + np.exp(-ours)), 1 / (1 + np.exp(-ref)),
                               atol=1e-5)


def test_flip_parity_shipped_weights(setup):
    """Reversed-graph pass (symmetry loss) parity (train.py:165-168)."""
    g, gt, x, e = setup
    model = RefSymGatedGCNModel()
    model.load_state_dict(torch.load(WEIGHTS_PT, map_location="cpu"))
    model.eval()
    params, state = torch_to_pytree(WEIGHTS_PT)
    x_rev = node_features(g, reverse=True)
    ours = _jax_logits(params, state, gt, g, x_rev, e, flip=True)[0]
    ref = _torch_logits(model, g, x_rev, e, flip=True)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_training_mode_parity_and_bn_stats(setup):
    """Training-mode forward + BatchNorm running-stat updates must match torch
    (incl. the shared bn_e double update, gated_gcn_full.py:106,119)."""
    g, gt, x, e = setup
    model = RefSymGatedGCNModel(dropout=0.0)
    torch.manual_seed(1)
    model.train()
    params, state = torch_to_pytree(
        {k: v.numpy() for k, v in model.state_dict().items()})

    cfg = ModelConfig(dropout=0.0)
    scores, new_state = sym_gated_gcn_forward(
        params, state, gt, gt.pad_nodes(x), gt.pad_edges(e), cfg, training=True)
    ours = np.asarray(scores)[: g.num_edges]
    ref = _torch_logits(model, g, x, e)  # train-mode forward updates stats
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-3)

    sd_after = {k: v.numpy() for k, v in model.state_dict().items()}
    for i in range(8):
        for bn in ("bn_h", "bn_e"):
            np.testing.assert_allclose(
                np.asarray(new_state["gnn"][bn]["mean"])[i],
                sd_after[f"gnn.convs.{i}.{bn}.running_mean"], atol=1e-5,
                err_msg=f"layer {i} {bn} running_mean")
            np.testing.assert_allclose(
                np.asarray(new_state["gnn"][bn]["var"])[i],
                sd_after[f"gnn.convs.{i}.{bn}.running_var"], atol=1e-5,
                err_msg=f"layer {i} {bn} running_var")
            assert int(np.asarray(new_state["gnn"][bn]["count"])[i]) == int(
                sd_after[f"gnn.convs.{i}.{bn}.num_batches_tracked"])


def test_convert_roundtrip():
    params, state = torch_to_pytree(WEIGHTS_PT)
    sd = pytree_to_torch(params, state)
    orig = torch.load(WEIGHTS_PT, map_location="cpu")
    assert set(sd) == set(orig)
    for k in orig:
        np.testing.assert_allclose(sd[k].numpy(), orig[k].numpy(), atol=0,
                                   err_msg=k)


def test_param_count_matches_reference():
    """Reference weights.pt holds 220,529 tensor elements (SURVEY.md §6):
    218,465 trainable parameters + 2,064 BatchNorm buffer elements."""
    import jax
    params, state = sym_gated_gcn_init(jax.random.PRNGKey(0), CFG)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    n_buffers = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state))
    assert n_params == 218_465
    assert n_params + n_buffers == 220_529


def test_padding_invariance(setup):
    """Results must not depend on the padding bucket."""
    g, _, x, e = setup
    params, state = torch_to_pytree(WEIGHTS_PT)
    outs = []
    for epad, npad in ((256, 64), (1024, 512)):
        gt = GraphTensors.from_graph(g, edge_pad_multiple=epad,
                                     node_pad_multiple=npad)
        outs.append(_jax_logits(params, state, gt, g, x, e)[0])
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
