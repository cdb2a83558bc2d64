"""Confirm roll-based stack workaround compiles AND computes correctly."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 64
hc = 256


def main():
    for dt in (jnp.float32, jnp.bfloat16):
        tag = dt.__name__

        # roll(+D) brings lanes D:2D to lanes 0:D with a normalized layout
        def kM2(a_ref, o_ref):
            a = a_ref[:]
            hi = pltpu.roll(a, D, 1)[:, :D]
            o_ref[:] = jnp.concatenate([a[:, :D], hi], axis=0)
        a = np.arange(hc * 2 * D, dtype=np.float32).reshape(hc, 2 * D)
        a = a.astype(dt)
        try:
            out = pl.pallas_call(
                kM2, out_shape=jax.ShapeDtypeStruct((2 * hc, D), dt))(a)
            want = np.concatenate([np.asarray(a)[:, :D],
                                   np.asarray(a)[:, D:]], axis=0)
            ok = np.array_equal(np.asarray(out), want)
            print(f"{'PASS' if ok else 'WRONG'} M2 roll-stack {tag}")
        except Exception as e:
            print(f"FAIL M2 roll-stack {tag}: "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:100]}")

        # also runtime-verify L (scratch materialize)
        def kL(a_ref, o_ref, s_ref):
            a = a_ref[:]
            s_ref[:] = a[:, D:]
            o_ref[:] = jnp.concatenate([a[:, :D], s_ref[:]], axis=0)
        try:
            out = pl.pallas_call(
                kL, out_shape=jax.ShapeDtypeStruct((2 * hc, D), dt),
                scratch_shapes=[pltpu.VMEM((hc, D), dt)])(a)
            want = np.concatenate([np.asarray(a)[:, :D],
                                   np.asarray(a)[:, D:]], axis=0)
            ok = np.array_equal(np.asarray(out), want)
            print(f"{'PASS' if ok else 'WRONG'} L scratch-stack {tag}")
        except Exception as e:
            print(f"FAIL L scratch-stack {tag}: "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
