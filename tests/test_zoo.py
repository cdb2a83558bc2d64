"""Model-zoo tests: dense numpy oracles for GCN/GAT/SAGE conv semantics,
torch oracle for GatedGCN, smoke train-step for every variant."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnnome_tpu.config import Config, ModelConfig
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.models import edge_features, node_features
from gnnome_tpu.models.zoo import (get_model, processor_graph_for,
                                   add_self_loop, add_reverse_edges,
                                   transformed_graph_tensors)
from gnnome_tpu.ops import GraphTensors


def _setup(model_name, seed=30, directed=True):
    g, _, _, _ = synthetic_assembly_graph(n_reads=60, genome_len=5000,
                                          read_len=300, seed=seed,
                                          with_sequences=True)
    cfg = ModelConfig(model=model_name, num_gnn_layers=3, dropout=0.0,
                      directed=directed)
    gt = GraphTensors.from_graph(g, 256, 64)
    gt_proc = processor_graph_for(model_name, g, cfg, 256, 64)
    x = node_features(g)
    e = edge_features(g)
    init_fn, fwd_fn = get_model(model_name)
    params, state = init_fn(jax.random.PRNGKey(seed), cfg)
    return g, cfg, gt, gt_proc, x, e, params, state, fwd_fn


@pytest.mark.parametrize("name", ["gatedgcn", "gcn", "gat", "sage"])
@pytest.mark.parametrize("directed", [True, False])
def test_zoo_forward_shapes(name, directed):
    g, cfg, gt, gt_proc, x, e, params, state, fwd = _setup(name,
                                                           directed=directed)
    scores, _ = fwd(params, state, gt, gt.pad_nodes(x), gt.pad_edges(e), cfg,
                    gt_proc=gt_proc)
    s = np.asarray(scores)[: g.num_edges]
    assert s.shape == (g.num_edges, 1)
    assert np.isfinite(s).all()


def _extract(p):
    return jax.tree_util.tree_map(np.asarray, p)


def test_gcn_matches_dense_oracle():
    g, cfg, gt, gt_proc, x, e, params, state, fwd = _setup("gcn")
    scores, _ = fwd(params, state, gt, gt.pad_nodes(x), gt.pad_edges(e), cfg,
                    gt_proc=gt_proc)
    got = np.asarray(scores)[: g.num_edges, 0]

    # dense oracle: GraphConv(norm='both') over graph + self loops
    P = _extract(params)
    n = g.num_nodes
    src, dst = add_self_loop(g.src.astype(np.int64), g.dst.astype(np.int64), n)
    A = np.zeros((n, n), dtype=np.float64)
    A[dst, src] += 1.0  # A[v, u] = edge u->v
    deg_out = np.maximum(A.sum(0), 1.0)
    deg_in = np.maximum(A.sum(1), 1.0)

    def mlp(pp, v):
        h = np.maximum(v @ pp["lin1"]["w"] + pp["lin1"]["b"], 0)
        return h @ pp["lin2"]["w"] + pp["lin2"]["b"]

    h = mlp(P["node_encoder"], x.astype(np.float64))
    e_enc = mlp(P["edge_encoder"], e.astype(np.float64))
    L = P["gnn"]["w"].shape[0]
    for i in range(L):
        hn = (A @ (h / np.sqrt(deg_out)[:, None])) / np.sqrt(deg_in)[:, None]
        h = hn @ P["gnn"]["w"][i] + P["gnn"]["b"][i]
        if i < L - 1:
            h = np.maximum(h, 0)
    z = np.concatenate([h[g.src], h[g.dst], e_enc], axis=1)
    z = np.maximum(z @ P["predictor"]["W1"]["w"] + P["predictor"]["W1"]["b"], 0)
    z = np.maximum(z @ P["predictor"]["W2"]["w"] + P["predictor"]["W2"]["b"], 0)
    ref = (z @ P["predictor"]["W3"]["w"] + P["predictor"]["W3"]["b"])[:, 0]
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_sage_matches_dense_oracle():
    g, cfg, gt, gt_proc, x, e, params, state, fwd = _setup("sage")
    scores, _ = fwd(params, state, gt, gt.pad_nodes(x), gt.pad_edges(e), cfg,
                    gt_proc=gt_proc)
    got = np.asarray(scores)[: g.num_edges, 0]

    P = _extract(params)
    n = g.num_nodes
    src, dst = add_self_loop(g.src.astype(np.int64), g.dst.astype(np.int64), n)
    A = np.zeros((n, n))
    A[dst, src] += 1.0
    deg_in = np.maximum(A.sum(1), 1.0)

    def mlp(pp, v):
        h = np.maximum(v @ pp["lin1"]["w"] + pp["lin1"]["b"], 0)
        return h @ pp["lin2"]["w"] + pp["lin2"]["b"]

    h = mlp(P["node_encoder"], x.astype(np.float64))
    e_enc = mlp(P["edge_encoder"], e.astype(np.float64))
    L = P["gnn"]["fc_self"]["w"].shape[0]
    for i in range(L):
        mean_n = (A @ h) / deg_in[:, None]
        h_new = (h @ P["gnn"]["fc_self"]["w"][i] + P["gnn"]["fc_self"]["b"][i]
                 + mean_n @ P["gnn"]["fc_neigh"]["w"][i]
                 + P["gnn"]["fc_neigh"]["b"][i])
        h = np.maximum(h_new, 0) if i < L - 1 else h_new
    z = np.concatenate([h[g.src], h[g.dst], e_enc], axis=1)
    z = np.maximum(z @ P["predictor"]["W1"]["w"] + P["predictor"]["W1"]["b"], 0)
    z = np.maximum(z @ P["predictor"]["W2"]["w"] + P["predictor"]["W2"]["b"], 0)
    ref = (z @ P["predictor"]["W3"]["w"] + P["predictor"]["W3"]["b"])[:, 0]
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_gat_attention_normalises():
    """GAT alphas must sum to 1 per destination (with self loops every node
    has in-edges)."""
    from gnnome_tpu.models.zoo import _gat_layer
    g, cfg, gt, gt_proc, x, e, params, state, fwd = _setup("gat")
    P = params
    p0 = jax.tree_util.tree_map(lambda a: a[0], P["gnn"])
    h = jnp.asarray(np.random.default_rng(0).normal(
        size=(gt_proc.n_nodes_pad, cfg.dim_latent)).astype(np.float32))
    out = _gat_layer(p0, gt_proc, h, cfg.gat_num_heads, training=False,
                     feat_drop=0.0, rng=None)
    assert np.isfinite(np.asarray(out)).all()

    # dense-oracle comparison on the first head
    n = g.num_nodes
    src, dst = add_self_loop(g.src.astype(np.int64), g.dst.astype(np.int64), n)
    Pn = _extract(P)
    feat = (np.asarray(h)[:n] @ Pn["gnn"]["fc"][0]).reshape(n, cfg.gat_num_heads, -1)
    el = (feat * Pn["gnn"]["attn_l"][0][None]).sum(-1)
    er = (feat * Pn["gnn"]["attn_r"][0][None]).sum(-1)
    logit = el[src] + er[dst]
    logit = np.where(logit > 0, logit, 0.2 * logit)
    ref = np.zeros((n, cfg.gat_num_heads, feat.shape[2]))
    for v in range(n):
        mask = dst == v
        if not mask.any():
            continue
        a = np.exp(logit[mask] - logit[mask].max(0))
        a = a / a.sum(0)
        ref[v] = (feat[src[mask]] * a[:, :, None]).sum(0)
    ref = ref.reshape(n, -1) + Pn["gnn"]["bias"][0]
    np.testing.assert_allclose(np.asarray(out)[:n], ref, atol=1e-4, rtol=1e-3)


def test_gatedgcn_matches_torch_oracle():
    import torch
    import torch.nn.functional as F
    from torch_ref import _scatter_sum

    g, cfg, gt, gt_proc, x, e, params, state, fwd = _setup("gatedgcn")
    assert gt_proc is None  # directed: processor runs on the original graph
    scores, _ = fwd(params, state, gt, gt.pad_nodes(x), gt.pad_edges(e), cfg)
    got = np.asarray(scores)[: g.num_edges, 0]

    # torch oracle mirroring reference gated_gcn_full.py:182-230 (eval mode)
    P = _extract(params)
    src = torch.from_numpy(g.src.astype(np.int64))
    dst = torch.from_numpy(g.dst.astype(np.int64))

    def lin(pp, i, v):
        return v @ torch.from_numpy(pp["w"][i]) + torch.from_numpy(pp["b"][i])

    def mlp(pp, v):
        h = torch.relu(v @ torch.from_numpy(pp["lin1"]["w"])
                       + torch.from_numpy(pp["lin1"]["b"]))
        return h @ torch.from_numpy(pp["lin2"]["w"]) + torch.from_numpy(pp["lin2"]["b"])

    h = mlp(P["node_encoder"], torch.from_numpy(x))
    ee = mlp(P["edge_encoder"], torch.from_numpy(e))
    L = P["gnn"]["A1"]["w"].shape[0]
    for i in range(L):
        h_in, e_in = h.clone(), ee.clone()
        A1h = lin(P["gnn"]["A1"], i, h)
        A2h = lin(P["gnn"]["A2"], i, h)
        B1h = lin(P["gnn"]["B1"], i, h)
        B2h = lin(P["gnn"]["B2"], i, h)
        B3e = lin(P["gnn"]["B3"], i, ee)
        gate = B1h[src] + B2h[dst] + B3e
        # eval-mode BN with fresh stats (mean 0, var 1)
        gate = gate * torch.from_numpy(P["gnn"]["bn_e"]["scale"][i]) / np.sqrt(1 + 1e-5) \
            + torch.from_numpy(P["gnn"]["bn_e"]["bias"][i])
        gate = F.relu(gate)
        ee = gate + e_in
        sigma = torch.sigmoid(ee)
        num = _scatter_sum(sigma * A2h[src], dst, g.num_nodes)
        den = _scatter_sum(sigma, dst, g.num_nodes)
        hf = num / (den + 1e-6)
        h = A1h + hf
        h = h * torch.from_numpy(P["gnn"]["bn_h"]["scale"][i]) / np.sqrt(1 + 1e-5) \
            + torch.from_numpy(P["gnn"]["bn_h"]["bias"][i])
        h = F.relu(h) + h_in
    z = torch.cat([h[src], h[dst], ee], dim=1)
    z = torch.relu(z @ torch.from_numpy(P["predictor"]["W1"]["w"])
                   + torch.from_numpy(P["predictor"]["W1"]["b"]))
    z = torch.relu(z @ torch.from_numpy(P["predictor"]["W2"]["w"])
                   + torch.from_numpy(P["predictor"]["W2"]["b"]))
    ref = (z @ torch.from_numpy(P["predictor"]["W3"]["w"])
           + torch.from_numpy(P["predictor"]["W3"]["b"])).numpy()[:, 0]
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("name", ["gatedgcn", "gcn", "gat", "sage"])
def test_zoo_train_step_runs(name):
    """Every zoo model can take a BCE gradient step through make_steps."""
    from gnnome_tpu.train.step import make_steps, prepare_units

    cfg = Config()
    cfg.model = ModelConfig(model=name, num_gnn_layers=2, dropout=0.1)
    cfg.train.masking = False
    cfg.compute.edge_pad_multiple = 256
    cfg.compute.node_pad_multiple = 64
    g, _, _, _ = synthetic_assembly_graph(n_reads=50, genome_len=4000,
                                          read_len=300, seed=31,
                                          with_sequences=True)
    rng = np.random.default_rng(0)
    (ex,) = prepare_units(g, cfg, rng)
    init_fn, _ = get_model(name)
    params, state = init_fn(jax.random.PRNGKey(0), cfg.model)
    tx, train_step, eval_step = make_steps(cfg)
    opt_state = tx.init(params)
    pw = jnp.asarray(1.0, jnp.float32)
    p2, s2, o2, loss, logits = train_step(params, state, opt_state, ex.gt,
                                          ex.x, ex.x_rev, ex.e, ex.labels,
                                          ex.mask, pw, jax.random.PRNGKey(1),
                                          gt_proc=ex.gt_proc)
    assert np.isfinite(float(loss))
    # a second step with updated params must also run (shapes stable)
    p3, *_ = train_step(p2, s2, o2, ex.gt, ex.x, ex.x_rev, ex.e, ex.labels,
                        ex.mask, pw, jax.random.PRNGKey(2), gt_proc=ex.gt_proc)
    diff = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
               for a, b in zip(jax.tree_util.tree_leaves(params),
                               jax.tree_util.tree_leaves(p3)))
    assert diff > 0


@pytest.mark.parametrize("name", ["gatedgcn", "gcn", "gat", "sage"])
def test_zoo_mesh_score_matches_single_device(name):
    """Every zoo model scores identically through the multi-chip path
    (compute.mesh=8 routes zoo configs to the GSPMD fallback — reference
    capability models/full_graph.py:33-119 on any device count)."""
    from gnnome_tpu.infer import score_graph

    g, _, _, _ = synthetic_assembly_graph(n_reads=60, genome_len=5000,
                                          read_len=300, seed=33,
                                          with_sequences=True)
    cfg = Config()
    cfg.model = ModelConfig(model=name, num_gnn_layers=2, dropout=0.0)
    cfg.compute.edge_pad_multiple = 256
    cfg.compute.node_pad_multiple = 64
    init_fn, _ = get_model(name)
    params, state = init_fn(jax.random.PRNGKey(7), cfg.model)
    ref = score_graph(g, params, state, cfg)
    cfg.compute.mesh = 8
    got = score_graph(g, params, state, cfg)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
