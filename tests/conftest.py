"""Test harness: force an 8-virtual-device CPU platform.

Multi-device sharding tests run on a virtual CPU mesh (the reference could
only test multi-GPU paths on real GPUs; JAX lets us validate GSPMD sharding
host-side — SURVEY.md §4).

Note: this environment pre-imports jax at interpreter startup (sitecustomize)
with JAX_PLATFORMS pointing at the TPU, so env vars alone are too late —
we override via jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: this box has ONE core, so suite wall-clock is
# compile-dominated — a warm cache keeps the default (-m "not slow") lane
# fast across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def randomize_head(params, seed=123):
    """The reference zero-inits head.head (model.py:680), making random-init
    outputs identically zero; tests that compare outputs need signal."""
    import numpy as _np
    import jax.numpy as _jnp

    w = params["head"]["head"]["w"]
    rng = _np.random.default_rng(seed)
    params["head"]["head"]["w"] = _jnp.asarray(
        (rng.standard_normal(w.shape) * 0.02).astype(_np.float32), dtype=w.dtype
    )
    return params
