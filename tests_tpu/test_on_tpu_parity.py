"""On-TPU Pallas-vs-XLA parity: the interpreter-mode kernel tests (tests/)
prove the math; this suite proves the MOSAIC LOWERING on real hardware —
a miscompile (two were found and worked around in round 2: bf16 logistic,
bf16 cmpf) would otherwise ship undetected, since the only hardware signal
used to be "bench loss is finite".

Covers the full training-mode model forward + gradients (K6/K7/K3/K8/K9 and
the windowed custom VJPs) against the XLA segment-sum path on the same
inputs, at f32 (tight tolerance — one-hot selects are exact at HIGHEST
precision; BN affine folding and aggregation order differ by ULPs) and bf16
(loose tolerance).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnnome_tpu.config import ModelConfig
from gnnome_tpu.graphs.synthetic import synthetic_assembly_graph
from gnnome_tpu.models import edge_features, node_features
from gnnome_tpu.models.sym_gated_gcn import forward, init_params
from gnnome_tpu.ops import GraphTensors
from gnnome_tpu.ops.graph_tensors import with_windowed_plans


def _setup():
    g, _, _, _ = synthetic_assembly_graph(n_reads=600, genome_len=50000,
                                          read_len=500, seed=7,
                                          with_sequences=True)
    cfg = ModelConfig(num_gnn_layers=3, dropout=0.0)
    gt = GraphTensors.build(g.src, g.dst, g.num_nodes, 2048, 512)
    gt = with_windowed_plans(gt, flip_too=True)
    # this suite must exercise the production tail-overflow layout — if plan
    # building ever stops activating it here, the Mosaic coverage of the
    # slice-mode patch paths silently vanishes
    assert gt.wplan.ovf_start >= 0 and not gt.dst_sorted
    x = gt.pad_nodes(node_features(g))
    e = gt.pad_edges(edge_features(g))
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    y = jnp.asarray(
        gt.pad_edges(np.random.default_rng(3)
                     .integers(0, 2, g.num_edges)[:, None]
                     .astype(np.float32)))
    return cfg, gt, jnp.asarray(x), jnp.asarray(e), params, state, y, g


def _run(cfg, gt, x, e, params, state, y, backend, dtype, training):
    # e/y/logits are host-ordered here — so must the mask be (see
    # GraphTensors.host_prefix_mask)
    n_real = int(np.asarray(gt.edge_mask).sum())
    mask = jnp.asarray(gt.host_prefix_mask(n_real))[:, None]

    def loss_fn(p):
        logits, _ = forward(p, state, gt, x, e, cfg, training=training,
                            rng=None, backend=backend, dtype=dtype)
        z = logits * mask
        per = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
        return (per * mask).sum() / gt.n_edges, logits

    # f32 parity runs at HIGHEST matmul precision: the TPU default for f32
    # dots is bf16-pass approximation, which would swamp the comparison with
    # precision noise unrelated to the kernels under test
    prec = "highest" if dtype == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        if training:
            (loss, logits), grads = jax.jit(
                jax.value_and_grad(loss_fn, has_aux=True))(params)
        else:
            # the fused eval stage is deliberately non-differentiable
            # (inference path; training wraps the same kernels in a custom
            # VJP)
            loss, logits = jax.jit(loss_fn)(params)
            grads = None
    return (np.asarray(loss, np.float64), np.asarray(logits, np.float32),
            None if grads is None else jax.tree_util.tree_map(
                lambda a: np.asarray(a, np.float32), grads))


@pytest.mark.parametrize("dtype,tol_logit,tol_grad", [
    (jnp.float32, 2e-4, 2e-3),
    # bf16: the cosine check is the miscompile detector (the two round-2
    # Mosaic bugs produced garbage values, not noise); the max-element bound
    # allows for 7-bit-mantissa accumulation differences between the fused
    # and XLA reduction structures (measured ~0.38 worst element across
    # ~200k parameters at cosine 0.9999)
    (jnp.bfloat16, 0.15, 0.5),
])
@pytest.mark.parametrize("training", [False, True])
def test_pallas_matches_xla_on_tpu(dtype, tol_logit, tol_grad, training):
    cfg, gt, x, e, params, state, y, g = _setup()
    l_x, lo_x, g_x = _run(cfg, gt, x, e, params, state, y, "xla", dtype,
                          training)
    l_p, lo_p, g_p = _run(cfg, gt, x, e, params, state, y, "pallas", dtype,
                          training)
    n = g.num_edges
    scale = np.abs(lo_x[:n]).mean() + 1e-6
    err = np.abs(lo_p[:n] - lo_x[:n]).max() / scale
    assert np.isfinite(lo_p[:n]).all()
    assert err < tol_logit, f"logit rel err {err}"
    assert abs(l_p - l_x) / (abs(l_x) + 1e-9) < tol_logit

    if training:
        from jax.flatten_util import ravel_pytree
        flat_x = np.asarray(ravel_pytree(g_x)[0])
        flat_p = np.asarray(ravel_pytree(g_p)[0])
        # per-element relative error against the element's own magnitude
        # (clamped to the RMS scale): robust to tiny-denominator outliers,
        # still catches any systematically wrong gradient
        rms = float(np.sqrt((flat_x ** 2).mean())) + 1e-8
        denom = np.maximum(np.abs(flat_x), rms)
        gerr = (np.abs(flat_p - flat_x) / denom).max()
        cos = float((flat_p * flat_x).sum()
                    / (np.linalg.norm(flat_p) * np.linalg.norm(flat_x)
                       + 1e-12))
        assert cos > 0.999, f"grad cosine {cos}"
        assert gerr < tol_grad, f"grad rel err {gerr}"


def test_backend_auto_resolves_pallas_on_this_hardware():
    """backend='auto' must resolve to the Pallas kernels on the attached
    accelerator — tunneled TPUs register platform 'axon', not 'tpu', and a
    default_backend() check silently picked XLA here (advisor finding,
    round 4)."""
    from gnnome_tpu.config import ComputeConfig, resolve_backend

    assert resolve_backend(ComputeConfig()) == "pallas"
