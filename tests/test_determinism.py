"""Determinism checks (SURVEY.md §5: "same seed => bitwise-same logits" is the
TPU-world replacement for the reference's nonexistent race detection; BASELINE
asks for bit-matched edge probabilities).

Covers: repeated forward on identical inputs, a fresh re-build of the whole
pipeline from the same seed, both kernel backends (XLA and the windowed
Pallas kernels in interpret mode), and the train step (fixed RNG key =>
bitwise-identical updated parameters).
"""
import numpy as np
import jax
import pytest

from gnnome_tpu.config import Config
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.models import (sym_gated_gcn_forward, sym_gated_gcn_init,
                               node_features)
from gnnome_tpu.ops import GraphTensors, with_windowed_plans


def _bitwise_equal(a, b) -> bool:
    a, b = np.asarray(a), np.asarray(b)
    return a.shape == b.shape and np.array_equal(
        a.view(np.uint8), b.view(np.uint8))


def _build(seed: int, backend: str):
    g, _, _, _ = synthetic_assembly_graph(n_reads=200, genome_len=20_000,
                                          read_len=900, seed=3,
                                          with_sequences=False)
    gt = GraphTensors.from_graph(g, edge_pad_multiple=512,
                                 node_pad_multiple=64)
    if backend == "pallas":
        gt = with_windowed_plans(gt, flip_too=True, tile_e=128, window=64)
        assert gt.wplan is not None
    x = node_features(g)
    rng = np.random.default_rng(17)   # fixed features; content is irrelevant
    e = rng.normal(size=(g.num_edges, 2)).astype(np.float32)
    params, state = sym_gated_gcn_init(jax.random.PRNGKey(seed), Config().model)
    return g, gt, x, e, params, state


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_same_seed_bitwise_logits(backend):
    if backend == "pallas":
        from gnnome_tpu.ops.pallas_kernels import set_interpret
        set_interpret(True)
    try:
        runs = []
        for _ in range(2):  # full rebuild from the seed, not just a re-call
            g, gt, x, e, params, state = _build(11, backend)
            logits, _ = sym_gated_gcn_forward(
                params, state, gt, gt.pad_nodes(x), gt.pad_edges(e),
                Config().model, training=False, backend=backend)
            runs.append(np.asarray(logits[: g.num_edges]))
        assert np.isfinite(runs[0]).all()
        assert _bitwise_equal(runs[0], runs[1])
    finally:
        if backend == "pallas":
            from gnnome_tpu.ops.pallas_kernels import set_interpret
            set_interpret(False)


def test_same_seed_bitwise_train_step():
    from gnnome_tpu.train.step import make_steps, make_example

    cfg = Config()
    cfg.train.masking = False
    g, gt, x, e, params, state = _build(5, "xla")
    rng = np.random.default_rng(0)
    y = (rng.random(g.num_edges) < 0.5).astype(np.float32)
    outs = []
    for _ in range(2):
        ex = make_example(cfg, g.in_degrees(), g.out_degrees(), e, y,
                          g.src, g.dst, g.num_nodes)
        tx, train_step, _ = make_steps(cfg)
        opt_state = tx.init(params)
        p2, _, _, loss, logits = train_step(
            params, state, opt_state, ex.gt, ex.x, ex.x_rev, ex.e, ex.labels,
            ex.mask, np.float32(1.0), jax.random.PRNGKey(7))
        outs.append((np.asarray(logits),
                     np.concatenate([np.ravel(l) for l in
                                     jax.tree_util.tree_leaves(p2)])))
    assert _bitwise_equal(outs[0][0], outs[1][0])
    assert _bitwise_equal(outs[0][1], outs[1][1])
