#!/usr/bin/env python
"""Measure Pallas per-tile block-DMA overhead: a copy kernel with K extra
input blocks, swept over K and over grid size at constant total bytes."""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(T, ET, K, d=64, reps=20, dtype=jnp.bfloat16):
    Ep = T * ET

    def kern(*refs):
        ins = refs[:-1]
        out = refs[-1]
        acc = ins[0][:]
        for r in ins[1:]:
            acc = acc + r[:]
        out[:] = acc

    spec = [pl.BlockSpec((ET, d), lambda t: (t, 0))] * K
    xs = [jnp.ones((Ep, d), dtype) for _ in range(K)]

    f = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=spec,
        out_specs=pl.BlockSpec((ET, d), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((Ep, d), dtype),
    )

    @jax.jit
    def loop(*xs):
        def it(i, a):
            return f(a, *xs[1:])
        return jax.lax.fori_loop(0, reps, it, xs[0])

    r = loop(*xs)
    float(r.reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    r = loop(*xs)
    float(r.reshape(-1)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / reps
    gb = Ep * d * (2 if dtype == jnp.bfloat16 else 4) * (K + 1) / 1e9
    print(f"T={T:5d} ET={ET:5d} K={K:2d}  {dt*1e3:7.2f} ms  "
          f"{gb/dt:6.1f} GB/s  {dt/T*1e6:6.2f} us/tile "
          f"{dt/T/(K+1)*1e6:6.2f} us/tile/block", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    print("--- K sweep at T=769-ish, ET=2048 (bench geometry) ---")
    for K in (1, 2, 4, 8, 12):
        run(768, 2048, K, reps=args.reps)
    print("--- grid sweep at constant bytes (K=4) ---")
    for T, ET in ((192, 8192), (384, 4096), (768, 2048), (1536, 1024),
                  (3072, 512)):
        run(T, ET, 4, reps=args.reps)


if __name__ == "__main__":
    main()
