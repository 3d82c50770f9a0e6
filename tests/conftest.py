"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; the JAX analog of the
reference's missing multi-node test story (SURVEY.md §4) is a virtual
device mesh on CPU. Environment must be set before jax imports.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel), where eager per-op dispatch makes tests pathologically
# slow. Tests are numerics/structure checks; TPU runs happen via bench.py
# and the verify drive.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient axon sitecustomize forces jax_platforms="axon,cpu" via
# jax.config (env vars are ignored); override it back to CPU-only.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
