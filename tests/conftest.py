"""Test harness config.

Forces the CPU platform with 8 virtual devices so (a) tests never contend for
the machine's single tunneled TPU, and (b) multi-chip sharding paths run on
any machine (SURVEY.md §4 item 4).

Note: the environment's sitecustomize registers the TPU ("axon") PJRT plugin
and pins ``jax_platforms`` at interpreter startup, so a plain JAX_PLATFORMS
env var is not enough — the config must be overridden before first backend use.
"""
import os

os.environ["OMP_NUM_THREADS"] = "1"  # keep the torch oracle off the thread pool

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
