"""Bounded-compile-count regression: masked + clustered training units must
land in a bounded set of geometric shape buckets (compute.bucket_growth), so
a multi-epoch run compiles O(buckets) programs, not O(units)."""
import jax
import numpy as np

from gnnome_tpu.config import Config
from gnnome_tpu.graphs import synthetic_assembly_graph
from gnnome_tpu.models.sym_gated_gcn import init_params
from gnnome_tpu.train.step import make_steps, prepare_units


def test_bounded_compile_count_masked_clustered():
    # ~3600 nodes with masking to 80-100% and 1000-node clusters: every epoch
    # draws different mask fractions and cluster sizes
    g, _, _, _ = synthetic_assembly_graph(n_reads=1800, genome_len=160_000,
                                          read_len=600, seed=3,
                                          with_sequences=True)
    cfg = Config()
    cfg.compute.device = "cpu"
    cfg.compute.backend = "xla"
    cfg.compute.remat = False
    cfg.model.num_gnn_layers = 2
    cfg.train.masking = True

    params, state = init_params(jax.random.PRNGKey(0), cfg.model)
    tx, train_step, eval_step = make_steps(cfg)
    opt_state = tx.init(params)
    pw = jax.numpy.asarray(1.0, jax.numpy.float32)
    key = jax.random.PRNGKey(1)

    rng = np.random.default_rng(5)
    raw_shapes, buckets = set(), set()
    n_units = 0
    for _epoch in range(3):
        for ex in prepare_units(g, cfg, rng):
            key, sub = jax.random.split(key)
            params, state, opt_state, loss, _ = train_step(
                params, state, opt_state, ex.gt, ex.x, ex.x_rev, ex.e,
                ex.labels, ex.mask, pw, sub, gt_proc=ex.gt_proc)
            raw_shapes.add((ex.n_edges, ex.gt.n_nodes))
            buckets.add((ex.gt.n_nodes_pad, ex.gt.n_edges_pad))
            n_units += 1
            assert np.isfinite(float(loss))

    # masking + clustering really produced varied raw sizes...
    assert n_units >= 9
    assert len(raw_shapes) > 2 * len(buckets), (raw_shapes, buckets)
    # ...but the compiled-program count is the bucket count, not the unit
    # count (one jit cache entry per (Np, Ep) bucket)
    assert train_step._cache_size() == len(buckets)
    assert len(buckets) <= 6, buckets


def test_pallas_plan_treedefs_share_buckets():
    """The windowed-plan statics (exact overflow counts, real edge counts)
    must not key the jit cache: two different masked units landing in the
    same (Np, Ep) bucket must produce gt pytrees with IDENTICAL treedefs."""
    import jax.tree_util as jtu

    g, _, _, _ = synthetic_assembly_graph(n_reads=2600, genome_len=230_000,
                                          read_len=600, seed=4,
                                          with_sequences=True)
    cfg = Config()
    cfg.compute.device = "cpu"
    cfg.compute.backend = "pallas"
    cfg.train.masking = True
    cfg.train.num_nodes_per_cluster = 10**9      # no clustering: whole-graph

    from gnnome_tpu.train.step import prepare_units
    rng = np.random.default_rng(7)
    by_bucket = {}
    for _ in range(6):
        for ex in prepare_units(g, cfg, rng):
            key = (ex.gt.n_nodes_pad, ex.gt.n_edges_pad,
                   None if ex.gt.wplan is None else
                   (ex.gt.wplan.window, ex.gt.wplan.k_u,
                    ex.gt.wplan.win_v, ex.gt.wplan.k_v,
                    ex.gt.wplan.ovf_slots.shape[0]))
            td = jtu.tree_structure(ex.gt)
            by_bucket.setdefault(key, []).append((td, ex.n_edges))
    multi = {k: v for k, v in by_bucket.items() if len(v) > 1}
    assert multi, f"mask draws never shared a bucket: {list(by_bucket)}"
    varied_real = False
    for k, items in multi.items():
        tds = {td for td, _ in items}
        assert len(tds) == 1, f"bucket {k} fragments the jit cache"
        varied_real |= len({ne for _, ne in items}) > 1
    assert varied_real, "test graphs must differ in real edge count"


def test_halo_plan_treedefs_share_buckets():
    """Halo plans for different masked units in the same (Nb, K, Emax, Rpad)
    bucket must flatten to identical treedefs (slot_map and exact counts are
    cache-neutral host metadata)."""
    import jax.tree_util as jtu
    from gnnome_tpu.parallel import make_mesh
    from gnnome_tpu.parallel.halo import halo_example_from_unit
    from gnnome_tpu.train.step import host_units

    g, _, _, _ = synthetic_assembly_graph(n_reads=2600, genome_len=230_000,
                                          read_len=600, seed=4,
                                          with_sequences=True,
                                          false_edge_frac=0.005)
    cfg = Config()
    cfg.compute.device = "cpu"
    cfg.train.masking = True
    cfg.train.num_nodes_per_cluster = 10**9
    mesh = make_mesh(8)

    rng = np.random.default_rng(9)
    by_bucket = {}
    for _ in range(6):
        for unit in host_units(g, cfg, rng):
            ex = halo_example_from_unit(cfg, mesh, unit)
            assert ex is not None
            plan = ex.plan
            key = (plan.Nb, plan.K, plan.Emax, plan.Rpad)
            by_bucket.setdefault(key, []).append(
                (jtu.tree_structure(plan), ex.n_edges))
    multi = {k: v for k, v in by_bucket.items() if len(v) > 1}
    assert multi, f"mask draws never shared a halo bucket: {list(by_bucket)}"
    for k, items in multi.items():
        assert len({td for td, _ in items}) == 1, \
            f"halo bucket {k} fragments the jit cache"
