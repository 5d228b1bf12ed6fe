"""afft_tpu: TPU-native multi-modal action-anticipation framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the AFFT
reference (WACV 2023): multi-modal feature fusion (SA/T-SA/CA/MATT fusers),
an AVT-style causal future predictor, EPIC-Kitchens / EGTEA data pipelines,
data-parallel training over a TPU mesh, and the full evaluation/challenge
tooling (MT5R, marginalization, h5 logits, late fusion).
"""

__version__ = "0.1.0"

import os as _os

# Honor an explicit platform override BEFORE any backend initializes: on
# this image the TPU plugin registers (and pings its worker) even under
# JAX_PLATFORM(S)=cpu, so a CPU-forced CLI run can hang whenever the TPU
# worker is wedged; jax.config.update bypasses plugin discovery.
# JAX_PLATFORM_NAME takes precedence because the image's shell profile
# exports JAX_PLATFORMS=axon globally — that is the default, not a
# per-run override.
_plat = _os.environ.get("JAX_PLATFORM_NAME") or _os.environ.get(
    "JAX_PLATFORMS")
if _plat and "axon" not in _plat.split(","):
    import jax as _jax
    from jax._src import xla_bridge as _xb
    if getattr(_xb, "_backends", None):
        # a backend already initialized before afft_tpu was imported —
        # the config update below would silently not apply
        import warnings as _w
        _w.warn(f"afft_tpu: JAX backends initialized before import; "
                f"platform override '{_plat}' may not take effect "
                "(import afft_tpu before running any jax computation)")
    _jax.config.update("jax_platforms", _plat)
    del _xb
del _os, _plat
