"""Minimal functional NN building blocks (pytree params, no framework).

Initialisation matches torch defaults (``nn.Linear``: weight and bias
~ U(±1/sqrt(fan_in))) so training dynamics are comparable with the reference.
Weights are stored as [in, out] (transposed vs torch's [out, in]) to feed
``x @ w`` directly on the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(rng, in_features: int, out_features: int) -> dict:
    kw, kb = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(jnp.float32(in_features))
    return {
        "w": jax.random.uniform(kw, (in_features, out_features), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(kb, (out_features,), jnp.float32, -bound, bound),
    }


def linear(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def mlp2(p: dict, x: jax.Array) -> jax.Array:
    """2-layer MLP with ReLU: lin2(relu(lin1(x)))
    (reference layers/node_encoder.py:29-34 / models/full_graph.py:26-27)."""
    return linear(p["lin2"], jax.nn.relu(linear(p["lin1"], x)))


def mlp2_init(rng, in_f: int, hidden_f: int, out_f: int) -> dict:
    k1, k2 = jax.random.split(rng)
    return {"lin1": linear_init(k1, in_f, hidden_f),
            "lin2": linear_init(k2, hidden_f, out_f)}


def dropout(rng, x: jax.Array, rate: float) -> jax.Array:
    """Inverted dropout (torch F.dropout semantics, gated_gcn_full.py:139)."""
    if rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
