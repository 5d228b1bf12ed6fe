import os

# Tests run on CPU with 8 virtual devices so mesh/pjit paths are exercised
# without TPU hardware. Must be set before jax import. (JAX_PLATFORMS alone is
# not enough in this image: the axon TPU plugin registers regardless, so also
# force via jax.config below.)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 parity tests need real fp32 matmuls, not bf16 passes
jax.config.update("jax_default_matmul_precision", "highest")

# Suite wall time is dominated by XLA CPU compiles of the per-variant train
# steps (this image has ONE cpu core). The persistent compilation cache
# makes every run after the first fast (~10 min cold -> ~2 min warm); the
# cache dir is gitignored and safe to delete any time.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def fixtures():
    """Load golden fixtures exported from the torch reference."""
    def load(name):
        path = os.path.join(FIXTURE_DIR, f"{name}.npz")
        if not os.path.exists(path):
            pytest.skip(f"fixture {name} missing; run tools/export_fixtures.py")
        data = np.load(path)
        sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}
        ins = {k[4:]: data[k] for k in data.files if k.startswith("in::")}
        outs = {k[5:]: data[k] for k in data.files if k.startswith("out::")}
        return sd, ins, outs
    return load
