"""Training losses (reference train.py:103-185).

All losses are mask-aware: padded edges contribute zero and the mean divides
by the real edge count, so results match the reference's unpadded means.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_elementwise(logits, labels, pos_weight):
    """torch ``binary_cross_entropy_with_logits`` with pos_weight:
    ``-[pw * y * log σ(x) + (1-y) * log(1-σ(x))]`` via the stable log-sigmoid."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)


def bce_with_logits(logits, labels, pos_weight=1.0, mask=None):
    """Masked-mean BCE (reference train.py:144)."""
    loss = _bce_elementwise(logits, labels, pos_weight)
    if mask is None:
        return loss.mean()
    return (loss * mask).sum() / mask.sum()


def symmetry_loss(org_scores, rev_scores, labels, pos_weight=1.0, alpha=1.0,
                  mask=None):
    """BCE(org) + BCE(rev) + alpha * |org - rev|, masked mean
    (reference train.py:103-109)."""
    loss = (_bce_elementwise(org_scores, labels, pos_weight)
            + _bce_elementwise(rev_scores, labels, pos_weight)
            + alpha * jnp.abs(org_scores - rev_scores))
    if mask is None:
        return loss.mean()
    return (loss * mask).sum() / mask.sum()
