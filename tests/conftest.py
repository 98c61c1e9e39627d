"""Test harness: run everything on CPU with 8 virtual devices.

This is the idiomatic JAX replacement for the reference's
device-placement-string multi-GPU tests (reference
deployment/model_deploy_test.py): multi-chip sharding logic is exercised for
real on a virtual 8-device host mesh (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# The env var alone is not enough in this image (the session exports
# JAX_PLATFORMS=axon and the plugin wins); force it through the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound accumulated compiled-executable state.

    Full-suite runs (280+ tests, ~600 XLA-CPU compilations in one process)
    sporadically segfault inside jaxlib's backend_compile around the ~250th
    compile — every file is green in isolation, and the crash follows the
    suite POSITION, not a specific test. Dropping the jit caches at module
    boundaries keeps the live-executable count at per-file levels. Cross-file
    cache reuse is minimal (files compile distinct shapes), so runtime cost
    is small."""
    yield
    import jax

    jax.clear_caches()


def pytest_collection_modifyitems(items):
    """Run the TensorFlow cross-golden file LAST.

    Executing TF eager kernels (oneDNN/its bundled LLVM) and then compiling
    large XLA-CPU programs in the same process segfaults sporadically in
    jaxlib's backend_compile (observed three times, always in the first
    jit-heavy file after test_tf_parity; every file passes in isolation).
    Ordering TF after everything that still needs to compile sidesteps the
    in-process conflict without losing the goldens."""
    items.sort(key=lambda it: "test_tf_parity" in str(it.fspath))
