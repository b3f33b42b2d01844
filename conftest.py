"""Root pytest config: run every test on a virtual 8-device CPU mesh.

Multi-chip sharding (data/sequence/tensor parallel) is validated without real
TPU hardware, per the test strategy designed in SURVEY.md §4.

Note: in this environment the interpreter preimports jax (PYTHONPATH
sitecustomize) with JAX_PLATFORMS=axon, so env vars set here are too late.
``jax.config.update`` still works as long as no backend has been initialized.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))
