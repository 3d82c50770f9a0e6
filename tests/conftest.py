"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; the JAX analog of the
reference's missing multi-node test story (SURVEY.md §4) is a virtual
device mesh on CPU. Environment must be set before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
