"""Deterministic seeding (reference utils/utils.py:10-30).

JAX uses explicit PRNG keys, so unlike the torch/dgl reference there is no
global framework state to seed; we seed Python's and numpy's global RNGs for
the CPU-side pipeline (decode sampling, masking, shuffling) and hand out a
root ``jax.random`` key for device-side randomness.
"""
from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 42):
    """Seed host RNGs and return (numpy Generator, jax root key)."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return np.random.default_rng(seed), jax.random.PRNGKey(seed)
