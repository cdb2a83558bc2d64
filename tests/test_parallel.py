"""Multi-chip tests on the 8-virtual-device CPU mesh (SURVEY.md §4 item 4):
sharded forward equals single-device forward; sharded train step runs and
matches the single-device step."""
import numpy as np
import jax

from gnnome_tpu.config import Config
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.infer import score_graph
from gnnome_tpu.models.checkpoint import load_model_weights
from gnnome_tpu.parallel import make_mesh, shard_example
from gnnome_tpu.parallel.sharded import (sharded_score_graph, replicate,
                                         make_sharded_train_step)
from gnnome_tpu.train.step import prepare_units

WEIGHTS = "/root/repo/weights/weights.npz"


def _cfg():
    cfg = Config()
    cfg.compute.edge_pad_multiple = 256
    cfg.compute.node_pad_multiple = 64
    return cfg


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_forward_matches_single_device():
    g, _, _, _ = synthetic_assembly_graph(n_reads=150, genome_len=12000,
                                          read_len=400, seed=21,
                                          with_sequences=True)
    cfg = _cfg()
    params, state = load_model_weights(WEIGHTS)
    ref = score_graph(g, params, state, cfg)

    mesh = make_mesh(8)
    got = sharded_score_graph(g, params, state, cfg, mesh)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_sharded_train_step_matches_single_device():
    g, _, _, _ = synthetic_assembly_graph(n_reads=120, genome_len=9000,
                                          read_len=400, seed=22,
                                          with_sequences=True)
    cfg = _cfg()
    cfg.train.masking = False
    cfg.model.dropout = 0.0

    from gnnome_tpu.models.sym_gated_gcn import init_params
    from gnnome_tpu.train.step import make_steps
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    params, state = init_params(jax.random.PRNGKey(0), cfg.model)
    tx, train_step, _ = make_steps(cfg)
    opt_state = tx.init(params)
    (ex,) = prepare_units(g, cfg, rng)
    pw = jnp.asarray(1.7, jnp.float32)
    key = jax.random.PRNGKey(5)

    p1, s1, o1, loss1, logits1 = train_step(params, state, opt_state, ex.gt,
                                            ex.x, ex.x_rev, ex.e, ex.labels,
                                            ex.mask, pw, key)

    mesh = make_mesh(8)
    # rebuild the example with mesh-divisible padding, then shard
    cfg2 = _cfg()
    cfg2.train.masking = False
    cfg2.model.dropout = 0.0
    rng2 = np.random.default_rng(0)
    (ex2,) = prepare_units(g, cfg2, rng2)
    ex2 = shard_example(ex2, mesh)
    tx2, train_step2, eval_step2, init_opt2 = make_sharded_train_step(cfg2, mesh)
    params_r = replicate(params, mesh)
    state_r = replicate(state, mesh)
    opt_r = init_opt2(params_r)
    p2, s2, o2, loss2, logits2 = train_step2(params_r, state_r, opt_r, ex2.gt,
                                             ex2.x, ex2.x_rev, ex2.e,
                                             ex2.labels, ex2.mask, pw, key)
    assert abs(float(loss1) - float(loss2)) < 1e-5
    np.testing.assert_allclose(np.asarray(logits1)[: ex.n_edges],
                               np.asarray(logits2)[: ex.n_edges],
                               atol=5e-5, rtol=1e-3)
    # updated parameters agree (Adam's first step normalises by sqrt(v) with
    # v ~ grad^2, amplifying benign cross-shard reduction-order noise — so a
    # looser tolerance than for the loss/logits)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_graft_entry_contract():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, example_args = mod.entry()
    out = jax.jit(fn)(*example_args)
    assert np.isfinite(np.asarray(out)).all()
    mod.dryrun_multichip(8)


def test_cli_infer_with_mesh(tmp_path):
    """compute.mesh=N routes CLI inference through the sharded path."""
    from gnnome_tpu import cli
    from gnnome_tpu.graphs.synthetic import (random_genome,
                                             simulate_reads_from_genome,
                                             write_synthetic_gfa)
    rng = np.random.default_rng(90)
    genome = random_genome(20000, rng)
    recs, st, en, sd = simulate_reads_from_genome(genome, 200, 500, rng)
    gfa = str(tmp_path / "g.gfa")
    reads = str(tmp_path / "r.fasta")
    write_synthetic_gfa(recs, st, en, sd, gfa, reads, dialect="hifiasm")
    out = str(tmp_path / "ds")
    cli.main(["build-graph", "--gfa", gfa, "--reads", reads, "--asm",
              "hifiasm", "--out", out, "--threads", "2"])
    import os
    savedir = os.path.join(out, "hifiasm")
    cli.main(["infer", "--data", out, "--asm", "hifiasm", "--out", savedir,
              "--model", WEIGHTS, "--set", "compute.mesh=8",
              "--set", "decode.len_threshold=2000"])
    asm = os.path.join(savedir, "assembly", "0_assembly.fasta")
    assert os.path.isfile(asm)
    from gnnome_tpu.utils.fastx import read_fastx, reverse_complement
    top = max(read_fastx(asm), key=lambda c: len(c.seq))
    assert top.seq in genome or top.seq in reverse_complement(genome)
