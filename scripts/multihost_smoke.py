#!/usr/bin/env python
"""Multi-host (multi-process) smoke worker: proves the halo-exchange train
step runs unchanged across process boundaries via ``jax.distributed``
(SURVEY.md §2d; VERDICT round-1 item 5).

Each process contributes ``--local-devices`` CPU devices to the global mesh
(gloo cross-process collectives).  Both processes build the same graph from
the same seed, shard it over the GLOBAL mesh and run one halo-exchange train
step; the printed loss must match across processes (it is a psum'd global).

Run two workers by hand:

    python scripts/multihost_smoke.py --process-id 0 &
    python scripts/multihost_smoke.py --process-id 1

or let tests/test_multihost.py drive it.  On a real TPU pod the same code
path runs with ``jax.distributed.initialize()`` (no arguments — TPU metadata
supplies the topology) and the axon/TPU platform instead of CPU.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:9911")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--n-nodes", type=int, default=16_384)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    import numpy as np
    from gnnome_tpu.config import Config
    from gnnome_tpu.graphs.synthetic import random_bench_graph
    from gnnome_tpu.models.sym_gated_gcn import init_params
    from gnnome_tpu.parallel import make_mesh
    from gnnome_tpu.parallel.halo import (halo_example_from_unit,
                                          make_halo_train_step)
    from gnnome_tpu.parallel.sharded import replicate
    from gnnome_tpu.train.step import HostUnit

    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)

    cfg = Config()
    cfg.compute.mesh = n_global
    cfg.train.masking = False

    # identical inputs on every process (seeded); banded like a real
    # position-ordered assembly graph so a halo plan exists
    src, dst = random_bench_graph(args.n_nodes, 6.0, seed=0)
    n_nodes = args.n_nodes
    n_edges = int(src.shape[0])
    rng = np.random.default_rng(0)
    in_deg = np.bincount(dst, minlength=n_nodes).astype(np.float32)
    out_deg = np.bincount(src, minlength=n_nodes).astype(np.float32)
    e_feat = rng.normal(size=(n_edges, 2)).astype(np.float32)
    y = (rng.random(n_edges) < 0.5).astype(np.float32)
    unit = HostUnit(in_deg, out_deg, e_feat, y, src, dst, n_nodes, None, 0.0)

    mesh = make_mesh(n_global)
    ex = halo_example_from_unit(cfg, mesh, unit)
    assert ex is not None, "graph yielded no halo plan"

    params, state = init_params(jax.random.PRNGKey(1), cfg.model)
    tx, train_step = make_halo_train_step(cfg, mesh)
    params = replicate(params, mesh)
    state = replicate(state, mesh)
    opt_state = replicate(tx.init(params), mesh)

    params, state, opt_state, loss, _ = train_step(
        params, state, opt_state, ex.plan, ex.x, ex.x_rev, ex.labels,
        np.float32(1.0), jax.random.PRNGKey(2), ex.scalars)
    print(f"MULTIHOST_OK process={args.process_id} "
          f"ndev={len(jax.devices())} nlocal={len(jax.local_devices())} "
          f"loss={float(loss):.8f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
