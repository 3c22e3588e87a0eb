"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU — they run on CPU with
``xla_force_host_platform_device_count=8`` so the data-parallel mesh
path is exercised exactly as SURVEY.md §4 prescribes (the TPU-world
analog of a fake distributed backend). Must run before jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
