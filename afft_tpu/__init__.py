"""afft_tpu: TPU-native multi-modal action-anticipation framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the AFFT
reference (WACV 2023): multi-modal feature fusion (SA/T-SA/CA/MATT fusers),
an AVT-style causal future predictor, EPIC-Kitchens / EGTEA data pipelines,
data-parallel training over a TPU mesh, and the full evaluation/challenge
tooling (MT5R, marginalization, h5 logits, late fusion).
"""

__version__ = "0.1.0"
