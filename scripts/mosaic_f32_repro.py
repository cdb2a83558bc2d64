"""Minimal repro hunt for the fused-f32 Mosaic remote-compile failure.

Round 2 and the round-3 on-TPU parity suite both see `tpu_compile_helper
subprocess exit code 1` (error text swallowed by the remote-compile tunnel)
when the fused K3/K7/K8 kernels compile at f32.  bf16 compiles and runs.
This script compiles a ladder of progressively smaller kernels at f32 to
isolate which construct kills the compiler.  Run: python scripts/mosaic_f32_repro.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HP = jax.lax.Precision.HIGHEST
D = 64


def compile_one(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"PASS {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def run(name, kernel, out_shape, *args, grid=None):
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )
    compile_one(name, fn, *args)


def main():
    w = 256
    chunk = 512
    hc = chunk // 2

    # 1. plain f32 HIGHEST dot
    def k1(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32, precision=HP)
    run("f32 HIGHEST dot [512,256]@[256,128]", k1, (chunk, 2 * D),
        jnp.ones((chunk, w), jnp.float32), jnp.ones((w, 2 * D), jnp.float32))

    # 2. one-hot select: iota-eq one-hot, then HIGHEST dot (transposed)
    def k2(idx_ref, w_ref, o_ref):
        io2 = jax.lax.broadcasted_iota(jnp.int32, (w, chunk), 0)
        oh = (io2 == idx_ref[0, :][None, :]).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            oh, w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HP)
    run("one-hot select f32 HIGHEST", k2, (chunk, 2 * D),
        jnp.zeros((1, chunk), jnp.int32), jnp.ones((w, 2 * D), jnp.float32))

    # 3. accumulating scatter into an output ref (+=) via transposed dot
    def k3(idx_ref, pay_ref, o_ref):
        io2 = jax.lax.broadcasted_iota(jnp.int32, (w, chunk), 0)
        oh = (io2 == idx_ref[0, :][None, :]).astype(jnp.float32)
        o_ref[:] += jnp.dot(oh, pay_ref[:],
                            preferred_element_type=jnp.float32, precision=HP)
    run("one-hot scatter accum f32 HIGHEST", k3, (w, 2 * D),
        jnp.zeros((1, chunk), jnp.int32), jnp.ones((chunk, 2 * D), jnp.float32))

    # 4. row-stack concat (the _stack_p shape change) feeding a dot
    def k4(a_ref, w_ref, o_ref):
        a = a_ref[:]
        st = jnp.concatenate([a[:, :D], a[:, D:]], axis=0)   # [2hc, D]
        o_ref[:] = jnp.dot(st, w_ref[:],
                           preferred_element_type=jnp.float32, precision=HP)
    run("row-stack concat + dot f32", k4, (chunk, D),
        jnp.ones((hc, 2 * D), jnp.float32), jnp.ones((D, D), jnp.float32))

    # 5. sigmoid f32 then row-stack then scatter (K3's failing line shape)
    def k5(idx_ref, g_ref, o_ref):
        io2 = jax.lax.broadcasted_iota(jnp.int32, (w, chunk), 0)
        oh = (io2 == idx_ref[0, :][None, :]).astype(jnp.float32)
        sigma = jax.nn.sigmoid(g_ref[:])
        sig2 = jnp.concatenate([sigma[:, :D], sigma[:, D:]], axis=0)
        o_ref[:] += jnp.dot(oh, jnp.concatenate([sig2, sig2], 1),
                            preferred_element_type=jnp.float32, precision=HP)
    run("sigmoid+stack+scatter f32", k5, (w, 2 * D),
        jnp.zeros((1, chunk), jnp.int32), jnp.ones((hc, 2 * D), jnp.float32))

    # 6. the actual K3 kernel at f32 on a tiny plan
    sys.path.insert(0, ".")
    import numpy as np
    from gnnome_tpu.graphs.synthetic import synthetic_assembly_graph
    from gnnome_tpu.ops import GraphTensors
    from gnnome_tpu.ops.graph_tensors import with_windowed_plans
    from gnnome_tpu.ops.pallas_kernels import k3_fused_edge_stage
    g, _, _, _ = synthetic_assembly_graph(n_reads=600, genome_len=50000,
                                          read_len=500, seed=7)
    gt = GraphTensors.build(g.src, g.dst, g.num_nodes, 2048, 512)
    gt = with_windowed_plans(gt, flip_too=True)
    plan = gt.plan
    nw = plan.window * plan.n_blocks_u
    pu = jnp.ones((plan.n_blocks_u * plan.window, 2 * D), jnp.float32)
    pv = jnp.ones((plan.n_blocks_v * plan.window, 2 * D), jnp.float32)
    ep = gt.n_edges_padded // 2
    b3e = jnp.zeros((ep, 2 * D), jnp.float32)
    e_in = jnp.zeros((ep, 2 * D), jnp.float32)
    aff = jnp.ones((2, 2 * D), jnp.float32)
    def full(pu, pv, b3e, e_in, aff):
        return k3_fused_edge_stage(plan, pu, pv, b3e, e_in, aff)
    compile_one("full K3 f32", full, pu, pv, b3e, e_in, aff)


if __name__ == "__main__":
    main()
