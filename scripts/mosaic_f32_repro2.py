"""Bisect the row-stack f32 Mosaic failure: slice vs concat vs dtype."""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

HP = jax.lax.Precision.HIGHEST
D = 64
hc = 256


def compile_one(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"PASS {name}")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e).splitlines()[0][:120]}")


def run(name, kernel, out_shape, out_dtype, *args):
    fn = pl.pallas_call(kernel,
                        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype))
    compile_one(name, fn, *args)


def main():
    for dt, prec in ((jnp.float32, HP), (jnp.bfloat16,
                                         jax.lax.Precision.DEFAULT)):
        tag = dt.__name__

        # A: lane slice then dot, no concat
        def kA(a_ref, w_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:][:, :D], w_ref[:],
                               preferred_element_type=jnp.float32,
                               precision=prec).astype(o_ref.dtype)
        run(f"A slice+dot {tag}", kA, (hc, D), dt,
            jnp.ones((hc, 2 * D), dt), jnp.ones((D, D), dt))

        # B: concat axis=0 of two UNSLICED arrays, then dot
        def kB(a_ref, b_ref, w_ref, o_ref):
            st = jnp.concatenate([a_ref[:], b_ref[:]], axis=0)
            o_ref[:] = jnp.dot(st, w_ref[:],
                               preferred_element_type=jnp.float32,
                               precision=prec).astype(o_ref.dtype)
        run(f"B concat0+dot {tag}", kB, (2 * hc, D), dt,
            jnp.ones((hc, D), dt), jnp.ones((hc, D), dt),
            jnp.ones((D, D), dt))

        # C: concat axis=0 of two lane-sliced halves, write out (no dot)
        def kC(a_ref, o_ref):
            a = a_ref[:]
            o_ref[:] = jnp.concatenate([a[:, :D], a[:, D:]], axis=0)
        run(f"C slice+concat0 write {tag}", kC, (2 * hc, D), dt,
            jnp.ones((hc, 2 * D), dt))

        # D: slice + concat0 + dot (the failing k4)
        def kD(a_ref, w_ref, o_ref):
            a = a_ref[:]
            st = jnp.concatenate([a[:, :D], a[:, D:]], axis=0)
            o_ref[:] = jnp.dot(st, w_ref[:],
                               preferred_element_type=jnp.float32,
                               precision=prec).astype(o_ref.dtype)
        run(f"D slice+concat0+dot {tag}", kD, (2 * hc, D), dt,
            jnp.ones((hc, 2 * D), dt), jnp.ones((D, D), dt))

        # E: as D but pad lanes to 128 before dot (concat zeros on lanes)
        def kE(a_ref, w_ref, o_ref):
            a = a_ref[:]
            st = jnp.concatenate([a[:, :D], a[:, D:]], axis=0)
            stp = jnp.pad(st, ((0, 0), (0, D)))
            o_ref[:] = jnp.dot(stp, w_ref[:],
                               preferred_element_type=jnp.float32,
                               precision=prec).astype(o_ref.dtype)
        run(f"E slice+concat0+pad+dot {tag}", kE, (2 * hc, D), dt,
            jnp.ones((hc, 2 * D), dt), jnp.ones((2 * D, D), dt))

        # F: as D but dot at DEFAULT precision (f32 only distinction)
        def kF(a_ref, w_ref, o_ref):
            a = a_ref[:]
            st = jnp.concatenate([a[:, :D], a[:, D:]], axis=0)
            o_ref[:] = jnp.dot(st, w_ref[:],
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT
                               ).astype(o_ref.dtype)
        run(f"F slice+concat0+dot DEFAULT {tag}", kF, (2 * hc, D), dt,
            jnp.ones((hc, 2 * D), dt), jnp.ones((D, D), dt))

        # G: dot where the STACKED array is the rhs of a transposed dot
        # (the actual kernel shape: oh[w, 2hc] @ pay[2hc, D])
        def kG(idx_ref, a_ref, o_ref):
            io2 = jax.lax.broadcasted_iota(jnp.int32, (256, 2 * hc), 0)
            oh = (io2 == idx_ref[0, :][None, :]).astype(dt)
            a = a_ref[:]
            st = jnp.concatenate([a[:, :D], a[:, D:]], axis=0)
            o_ref[:] += jnp.dot(oh, st, preferred_element_type=jnp.float32,
                                precision=prec).astype(o_ref.dtype)
        run(f"G scatter stacked rhs {tag}", kG, (256, D), dt,
            jnp.zeros((1, 2 * hc), jnp.int32), jnp.ones((hc, 2 * D), dt))


if __name__ == "__main__":
    main()
