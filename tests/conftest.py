"""Test harness config: force an 8-device virtual CPU mesh so multi-chip
sharding paths run on any machine (SURVEY.md §4 item 4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
