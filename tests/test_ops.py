"""Pallas attention kernel vs the XLA reference path (interpret mode on CPU;
the same comparison runs bit-exact on real TPU hardware)."""

import jax.numpy as jnp
import numpy as np
import pytest

from afft_tpu.models.layers import neg_inf_causal_mask, \
    cross_attention_diag_mask
from afft_tpu.ops.attention import attention_reference
from afft_tpu.ops.pallas_attn import fused_attention, supported


@pytest.mark.parametrize("shape,mask_kind", [
    ((8, 5, 4, 256), None),        # SA-Fuser tokens
    ((8, 5, 4, 256), "diag"),      # cross_attn mask variant
    ((4, 16, 4, 512), "causal"),   # GPT-2 predictor
    ((5, 18, 4, 256), "causal"),   # uneven batch vs block
])
def test_fused_attention_matches_reference(shape, mask_kind):
    B, N, H, hd = shape
    assert supported(H, hd)
    rng = np.random.default_rng(0)
    q, k, v = [jnp.asarray(rng.standard_normal(shape), jnp.float32)
               for _ in range(3)]
    mask = {"causal": neg_inf_causal_mask(N),
            "diag": cross_attention_diag_mask(N),
            None: None}[mask_kind]
    ref, _ = attention_reference(q, k, v, mask)
    out = fused_attention(q, k, v, mask, interpret=True, block_b=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unsupported_head_dim_falls_back():
    from afft_tpu.ops.attention import multihead_attention
    rng = np.random.default_rng(0)
    q, k, v = [jnp.asarray(rng.standard_normal((2, 5, 4, 16)), jnp.float32)
               for _ in range(3)]
    out, _ = multihead_attention(q, k, v)  # hd=16: must use the XLA path
    ref, _ = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
