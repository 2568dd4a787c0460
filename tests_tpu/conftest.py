"""TPU smoke tier: runs on real TPU hardware (the bench environment).

Unlike tests/conftest.py this does NOT force the CPU platform. Run with:
    python -m pytest tests_tpu/ -q
Every test skips itself when no TPU is attached, so the tier is safe to
collect anywhere.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() == "cpu":
        pytest.skip("no TPU attached", allow_module_level=False)
