"""Verify the roll-based stack with bf16 round-tripped through f32, plus
optimization_barrier as a no-scratch alternative."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 64
hc = 256


def check(name, kernel, a, want):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2 * hc, D), a.dtype))(a)
        ok = np.array_equal(np.asarray(out, np.float32),
                            np.asarray(want, np.float32))
        print(f"{'PASS' if ok else 'WRONG'} {name}")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}")


def main():
    for dt in (jnp.float32, jnp.bfloat16):
        tag = dt.__name__
        a = np.arange(hc * 2 * D, dtype=np.float32).reshape(hc, 2 * D)
        a = jnp.asarray(a).astype(dt)
        want = np.concatenate([np.asarray(a, np.float32)[:, :D],
                               np.asarray(a, np.float32)[:, D:]], axis=0)

        def k_roll_f32(a_ref, o_ref):
            x = a_ref[:].astype(jnp.float32)
            hi = pltpu.roll(x, D, 1)[:, :D]
            st = jnp.concatenate([x[:, :D], hi], axis=0)
            o_ref[:] = st.astype(o_ref.dtype)
        check(f"roll-stack via f32 {tag}", k_roll_f32, a, want)

        def k_barrier(a_ref, o_ref):
            x = a_ref[:]
            hi = jax.lax.optimization_barrier(x[:, D:])
            o_ref[:] = jnp.concatenate([x[:, :D], hi], axis=0)
        check(f"opt-barrier stack {tag}", k_barrier, a, want)


if __name__ == "__main__":
    main()
