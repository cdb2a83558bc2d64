"""Flat-npz pytree persistence for model params/state and train checkpoints.

Native checkpoint format of the framework (orbax is also supported for train
state via train/loop.py).  Layout: one npz with ``/``-joined key paths.
Also reads the reference's torch ``weights.pt``/``ckpt_*.pt`` transparently
(via models/convert.py), so reference users can bring their checkpoints.
"""
from __future__ import annotations

import os

import numpy as np


def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}/{k}" if prefix else str(k), out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/{i}", out)
    else:
        out[prefix] = np.asarray(tree)


def flatten_pytree(tree, prefix="") -> dict:
    out: dict[str, np.ndarray] = {}
    _flatten(tree, prefix, out)
    return out


def unflatten_pytree(flat: dict) -> dict:
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return root


def save_pytrees(path: str, **trees) -> None:
    flat = {}
    for name, tree in trees.items():
        flat.update(flatten_pytree(tree, name))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_pytrees(path: str) -> dict:
    with np.load(path) as z:
        return unflatten_pytree({k: z[k] for k in z.files})


def load_model_weights(path: str):
    """(params, state) from either the native npz or a torch checkpoint
    (reference weights/weights.pt or train.py:62-70 ckpt dicts)."""
    if path.endswith(".pt") or path.endswith(".pth"):
        from .convert import torch_to_pytree
        return torch_to_pytree(path)
    trees = load_pytrees(path)
    return trees["params"], trees["state"]


def save_model_weights(path: str, params, state) -> None:
    save_pytrees(path, params=params, state=state)


# --------------------------------------------------------------------- orbax
def save_orbax(directory: str, tree) -> None:
    """Orbax checkpoint (async-capable, multi-host-safe) — the TPU-idiomatic
    alternative to the flat npz for large train states (SURVEY.md §5)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(directory), tree, force=True)


def load_orbax(directory: str):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(directory))
