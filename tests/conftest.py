"""Test harness config: force an 8-device virtual CPU mesh.

The environment's sitecustomize force-registers a TPU backend and pins
JAX_PLATFORMS, so plain env vars are not enough — we override the platform
via jax.config before the backend initialises. Multi-chip sharding is
validated on virtual CPU devices (SURVEY.md §4:
--xla_force_host_platform_device_count=8); numerics tests compare against
torch CPU.
"""

import os
import sys

# disable torch.jit scripting so the reference's jit.ScriptModules
# (geometry_utils, losses) import under the dependency stubs used by
# tests/test_reference_parity.py; numerics are unchanged
os.environ.setdefault("PYTORCH_JIT", "0")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
