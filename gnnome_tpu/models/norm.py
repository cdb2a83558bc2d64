"""Normalisation layers with torch-compatible semantics.

BatchNorm1d parity requirements (reference gated_gcn_full.py:37-42 uses
``nn.BatchNorm1d(track_running_stats=True)``):

* training: normalise with the *biased* batch variance, update running stats
  with the *unbiased* variance at momentum 0.1;
* eval: normalise with running stats;
* the reference applies one shared ``bn_e`` to the same gate tensor twice per
  layer (forward + backward direction, gated_gcn_full.py:106,119) — outputs are
  identical but training-mode running stats advance twice, reproduced here via
  ``repeat_updates``.

Because device tensors are padded, statistics are computed under a mask with a
static valid count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unbiased_factor(n_valid):
    """``n / (n - 1)`` accepting a python int OR a traced scalar (real counts
    ride the pytree as 0-d f32 leaves so masked units share compiled
    programs — GraphTensors.nn_valid/ne_valid)."""
    if isinstance(n_valid, (int, float)):
        return n_valid / (n_valid - 1) if n_valid > 1 else 1.0
    return n_valid / jnp.maximum(n_valid - 1.0, 1.0)


def norm_init(features: int) -> dict:
    return {"scale": jnp.ones((features,), jnp.float32),
            "bias": jnp.zeros((features,), jnp.float32)}


def bn_state_init(features: int) -> dict:
    return {"mean": jnp.zeros((features,), jnp.float32),
            "var": jnp.ones((features,), jnp.float32),
            "count": jnp.zeros((), jnp.int32)}


def batch_norm(p: dict, s: dict, x: jax.Array, mask: jax.Array, n_valid: int,
               training: bool, momentum: float = 0.1, eps: float = 1e-5,
               repeat_updates: int = 1):
    """Masked BatchNorm1d.  Returns (y, new_state).  Statistics and
    normalisation always run in float32 (bf16 inputs are cast through)."""
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    if training:
        xm = x * mask
        mean = xm.sum(axis=0) / n_valid
        var = (((x - mean) ** 2) * mask).sum(axis=0) / n_valid  # biased
        inv = jax.lax.rsqrt(var + eps)
        y = (x - mean) * inv
        unbiased = var * _unbiased_factor(n_valid)
        rm, rv = s["mean"], s["var"]
        for _ in range(repeat_updates):
            rm = (1.0 - momentum) * rm + momentum * mean
            rv = (1.0 - momentum) * rv + momentum * unbiased
        new_s = {"mean": rm, "var": rv,
                 "count": s["count"] + repeat_updates}
    else:
        inv = jax.lax.rsqrt(s["var"] + eps)
        y = (x - s["mean"]) * inv
        new_s = s
    return (y * p["scale"] + p["bias"]).astype(in_dtype), new_s


def batch_norm_dual(p: dict, s: dict, x2: jax.Array, mask: jax.Array,
                    n_valid: int, training: bool, momentum: float = 0.1,
                    eps: float = 1e-5, repeat_updates: int = 1):
    """Masked BatchNorm over a feature-CONCATENATED ``[*, 2d]`` tensor whose
    halves are the symmetry loss's org / flip passes through ONE shared
    [d]-feature BN module (the dual-pass fused mode).

    Normalisation matches two independent training-mode passes exactly (each
    half normalises with its own batch statistics).  The running-stat chain
    is SEQUENTIAL — org's ``repeat_updates`` updates, then flip's — matching
    two consecutive torch forwards through the same module (reference
    train.py:159-185 + the shared-bn_e double update,
    gated_gcn_full.py:106,119)."""
    in_dtype = x2.dtype
    d = x2.shape[1] // 2
    x = x2.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    scale2 = jnp.concatenate([p["scale"], p["scale"]])
    bias2 = jnp.concatenate([p["bias"], p["bias"]])
    if training:
        xm = x * mask
        mean = xm.sum(axis=0) / n_valid
        var = (((x - mean) ** 2) * mask).sum(axis=0) / n_valid  # biased
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        unbiased = var * _unbiased_factor(n_valid)
        rm, rv = s["mean"], s["var"]
        for half in (slice(0, d), slice(d, 2 * d)):     # org THEN flip
            for _ in range(repeat_updates):
                rm = (1.0 - momentum) * rm + momentum * mean[half]
                rv = (1.0 - momentum) * rv + momentum * unbiased[half]
        new_s = {"mean": rm, "var": rv,
                 "count": s["count"] + 2 * repeat_updates}
    else:
        rm2 = jnp.concatenate([s["mean"], s["mean"]])
        rv2 = jnp.concatenate([s["var"], s["var"]])
        y = (x - rm2) * jax.lax.rsqrt(rv2 + eps)
        new_s = s
    return (y * scale2 + bias2).astype(in_dtype), new_s


def layer_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-row LayerNorm (torch nn.LayerNorm defaults)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def apply_norm(kind: str, p: dict, s: dict | None, x: jax.Array,
               mask: jax.Array, n_valid: int, training: bool,
               repeat_updates: int = 1):
    """Dispatch over the reference's normalization choices
    (gated_gcn_full.py:37-42, 'batch' | 'layer' | 'none')."""
    if kind == "batch":
        return batch_norm(p, s, x, mask, n_valid, training,
                          repeat_updates=repeat_updates)
    if kind == "layer":
        return layer_norm(p, x), s
    return x, s
