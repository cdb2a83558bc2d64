"""On-hardware test suite config.

Unlike tests/ (which pins an 8-virtual-device CPU platform), this suite runs
on the REAL accelerator and is skipped entirely when none is attached.  Run it
alone (`python -m pytest tests_tpu/ -q`) — the TPU is single-client here, and
first-compile through a remote-compile tunnel can take minutes per program.
"""
import pytest


def _have_tpu() -> bool:
    try:
        import jax
        return any(d.platform.lower() in ("tpu", "axon")
                   for d in jax.devices())
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if _have_tpu():
        return
    skip = pytest.mark.skip(reason="no TPU attached")
    for item in items:
        item.add_marker(skip)
