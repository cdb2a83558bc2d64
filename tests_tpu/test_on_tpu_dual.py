"""On-TPU parity for the DUAL-PASS training path (round-3 core).

``train/step.py`` routes symmetry training through ``forward_dual`` — both
symmetry passes fused into ONE kernel pass at doubled feature width
(block-diagonal dual weights, ``batch_norm_dual``).  The interpreter tests
(tests/test_model_dual.py) prove the math; this suite proves the MOSAIC
LOWERING of the dual-width shapes on real hardware, at the PRODUCTION depth
of 8 layers (reference hyperparameters.py:23) and in both remat modes.  The
two round-2 miscompiles and the round-3 sublane-concat crash all appeared in
exactly this kind of newly-widened kernel shape.

Compared paths, all computing the symmetry loss + grads on the same inputs
(reference train.py:159-185):

* fused dual pass (pallas, the production path);
* two sequential single-pass fused pallas forwards (the fallback
  ``forward_dual`` takes when the dual path is unavailable);
* two sequential XLA segment-sum forwards (kernel-free ground truth).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from gnnome_tpu.config import ModelConfig
from gnnome_tpu.graphs.synthetic import synthetic_assembly_graph
from gnnome_tpu.models import edge_features, node_features
from gnnome_tpu.models.sym_gated_gcn import forward, forward_dual, init_params
from gnnome_tpu.ops import GraphTensors
from gnnome_tpu.ops.graph_tensors import with_windowed_plans
from gnnome_tpu.train.loss import symmetry_loss


@pytest.fixture(scope="module")
def setup():
    g, _, _, _ = synthetic_assembly_graph(n_reads=600, genome_len=50000,
                                          read_len=500, seed=7,
                                          with_sequences=True)
    # PRODUCTION depth (8 layers); dropout off so the one-dual-draw vs
    # two-per-pass-draws RNG difference can't enter the comparison
    cfg = ModelConfig(num_gnn_layers=8, dropout=0.0)
    gt = GraphTensors.build(g.src, g.dst, g.num_nodes, 2048, 512)
    gt = with_windowed_plans(gt, flip_too=True)
    # keep the production tail-overflow layout under Mosaic coverage (see
    # test_on_tpu_parity._setup)
    assert gt.wplan.ovf_start >= 0 and not gt.dst_sorted
    x = node_features(g)
    x_rev = x[:, ::-1].copy()          # swapped in/out degrees (train.py:165)
    e = gt.pad_edges(edge_features(g))
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    y = jnp.asarray(
        gt.pad_edges(np.random.default_rng(3)
                     .integers(0, 2, g.num_edges)[:, None]
                     .astype(np.float32)))[:, 0]
    return (cfg, gt, jnp.asarray(gt.pad_nodes(x)),
            jnp.asarray(gt.pad_nodes(x_rev)), jnp.asarray(e), params, state,
            y, g)


def _run(setup, path, dtype, remat):
    """One symmetry-loss value_and_grad evaluation.

    path: 'dual'    — forward_dual fused (backend='pallas');
          'two_pal' — two sequential fused single passes (the fallback body);
          'two_xla' — two sequential XLA passes (ground truth).
    """
    cfg, gt, x, x_rev, e, params, state, y, g = setup
    # e/y/logits ride HOST edge order here (slot_io=False) — the mask must
    # too, or pad-slot logits leak into the loss and the grads become
    # backend-dependent (see GraphTensors.host_prefix_mask)
    mask = jnp.asarray(gt.host_prefix_mask(g.num_edges))

    def loss_fn(p):
        if path == "dual":
            lo, lr, st = forward_dual(p, state, gt, x, x_rev, e, cfg,
                                      training=True, rng=None,
                                      backend="pallas", remat=remat,
                                      dtype=dtype)
        else:
            backend = "pallas" if path == "two_pal" else "xla"
            lo, st = forward(p, state, gt, x, e, cfg, training=True,
                             flip=False, rng=None, backend=backend,
                             remat=remat, dtype=dtype)
            lr, st = forward(p, st, gt, x_rev, e, cfg, training=True,
                             flip=True, rng=None, backend=backend,
                             remat=remat, dtype=dtype)
        loss = symmetry_loss(lo[:, 0], lr[:, 0], y, pos_weight=1.0,
                             alpha=0.1, mask=mask)
        return loss, (lo, lr)

    prec = "highest" if dtype == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        (loss, (lo, lr)), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(params)
    flat = np.asarray(ravel_pytree(grads)[0], np.float32)
    return (np.asarray(loss, np.float64), np.asarray(lo, np.float32),
            np.asarray(lr, np.float32), flat)


def _compare(ref, got, n, tol_logit, tol_grad, label):
    l_r, lo_r, lr_r, g_r = ref
    l_g, lo_g, lr_g, g_g = got
    for name, a, b in (("org", lo_r, lo_g), ("rev", lr_r, lr_g)):
        scale = np.abs(a[:n]).mean() + 1e-6
        err = np.abs(b[:n] - a[:n]).max() / scale
        assert np.isfinite(b[:n]).all(), f"{label}/{name}: non-finite logits"
        assert err < tol_logit, f"{label}/{name} logit rel err {err}"
    assert abs(l_g - l_r) / (abs(l_r) + 1e-9) < tol_logit, \
        f"{label} loss {l_g} vs {l_r}"
    rms = float(np.sqrt((g_r ** 2).mean())) + 1e-8
    denom = np.maximum(np.abs(g_r), rms)
    gerr = (np.abs(g_g - g_r) / denom).max()
    cos = float((g_g * g_r).sum()
                / (np.linalg.norm(g_g) * np.linalg.norm(g_r) + 1e-12))
    assert cos > 0.999, f"{label} grad cosine {cos}"
    assert gerr < tol_grad, f"{label} grad rel err {gerr}"


@pytest.mark.parametrize("remat", [True, "full"])
def test_dual_matches_fallback_and_xla_f32(setup, remat):
    n = setup[-1].num_edges
    xla = _run(setup, "two_xla", jnp.float32, remat)
    dual = _run(setup, "dual", jnp.float32, remat)
    _compare(xla, dual, n, 5e-4, 5e-3, f"dual-vs-xla remat={remat}")
    two_pal = _run(setup, "two_pal", jnp.float32, remat)
    _compare(two_pal, dual, n, 5e-4, 5e-3, f"dual-vs-2pass remat={remat}")


def test_dual_bf16_lowering(setup):
    """bf16 dual shapes: the cosine check is the miscompile detector (the
    round-2 Mosaic bugs produced garbage, not noise)."""
    n = setup[-1].num_edges
    xla = _run(setup, "two_xla", jnp.bfloat16, True)
    dual = _run(setup, "dual", jnp.bfloat16, True)
    _compare(xla, dual, n, 0.15, 0.5, "dual-vs-xla bf16")
