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

# persistent compilation cache: the suite is dominated by whole-model XLA
# compiles that are identical run to run; warm runs skip them entirely
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(__file__))
