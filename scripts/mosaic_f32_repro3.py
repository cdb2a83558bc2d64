"""Find a Mosaic-compiling workaround for packed->row-stacked relayout.

The failing construct (repro2 case C/D): concat(axis=0) of two LANE-sliced
halves of one array: concat([a[:, :64], a[:, 64:]], 0).  Variants tested:
  H  unstack direction: concat([a[:hc], a[hc:]], axis=1)
  I  stack via two stores into the out ref
  J  stack via dynamic_update_slice into zeros
  K  stack via reshape/transpose [hc,2d]->[hc,2,d]->[2,hc,d]->[2hc,d]
  L  materialize the offset half through a scratch ref, then concat
  M  pltpu.roll the odd half into lanes 0:64, then concat rows
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 64
hc = 256


def compile_one(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"PASS {name}")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e).splitlines()[0][:100]}")


def run(name, kernel, out_shape, out_dtype, *args, scratch=()):
    fn = pl.pallas_call(kernel,
                        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
                        scratch_shapes=list(scratch))
    compile_one(name, fn, *args)


def main():
    for dt in (jnp.float32, jnp.bfloat16):
        tag = dt.__name__

        def kH(a_ref, o_ref):
            a = a_ref[:]
            o_ref[:] = jnp.concatenate([a[:hc], a[hc:]], axis=1)
        run(f"H unstack slice-rows concat-lanes {tag}", kH, (hc, 2 * D), dt,
            jnp.ones((2 * hc, D), dt))

        def kI(a_ref, o_ref):
            a = a_ref[:]
            o_ref[0:hc, :] = a[:, :D]
            o_ref[hc:2 * hc, :] = a[:, D:]
        run(f"I stack via two stores {tag}", kI, (2 * hc, D), dt,
            jnp.ones((hc, 2 * D), dt))

        def kJ(a_ref, o_ref):
            a = a_ref[:]
            z = jnp.zeros((2 * hc, D), dt)
            z = jax.lax.dynamic_update_slice(z, a[:, :D], (0, 0))
            z = jax.lax.dynamic_update_slice(z, a[:, D:], (hc, 0))
            o_ref[:] = z
        run(f"J stack via dyn-update-slice {tag}", kJ, (2 * hc, D), dt,
            jnp.ones((hc, 2 * D), dt))

        def kK(a_ref, o_ref):
            a = a_ref[:].reshape(hc, 2, D)
            o_ref[:] = jnp.transpose(a, (1, 0, 2)).reshape(2 * hc, D)
        run(f"K stack via reshape-transpose {tag}", kK, (2 * hc, D), dt,
            jnp.ones((hc, 2 * D), dt))

        def kL(a_ref, o_ref, s_ref):
            a = a_ref[:]
            s_ref[:] = a[:, D:]
            o_ref[:] = jnp.concatenate([a[:, :D], s_ref[:]], axis=0)
        run(f"L stack via scratch materialize {tag}", kL, (2 * hc, D), dt,
            jnp.ones((hc, 2 * D), dt),
            scratch=(pltpu.VMEM((hc, D), dt),))

        def kM(a_ref, o_ref):
            a = a_ref[:]
            rolled = pltpu.roll(a, -D, 1)
            o_ref[:] = jnp.concatenate([a[:, :D], rolled[:, :D]], axis=0)
        run(f"M stack via roll {tag}", kM, (2 * hc, D), dt,
            jnp.ones((hc, 2 * D), dt))

        # N: I-variant but into a scratch, then read back for a dot
        def kN(a_ref, w_ref, o_ref, s_ref):
            a = a_ref[:]
            s_ref[0:hc, :] = a[:, :D]
            s_ref[hc:2 * hc, :] = a[:, D:]
            o_ref[:] = jnp.dot(s_ref[:], w_ref[:],
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST
                               if dt == jnp.float32
                               else jax.lax.Precision.DEFAULT
                               ).astype(dt)
        run(f"N stack via scratch stores + dot {tag}", kN, (2 * hc, D), dt,
            jnp.ones((hc, 2 * D), dt), jnp.ones((D, D), dt),
            scratch=(pltpu.VMEM((2 * hc, D), dt),))


if __name__ == "__main__":
    main()
