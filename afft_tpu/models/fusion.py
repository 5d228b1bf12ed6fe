"""Multi-modal fusion modules (the paper's fuser zoo).

Behavioural reference: models/fusion.py in the upstream repo —
MATT :35-58, CMFuser (SA-Fuser w/o token) :61-118, TemporalCMFuser
(T-SA-Fuser) :121-215, TemporalCrossAttentFuser (CA-Fuser) :218-270,
ModalTokenCMFuser (SA-Fuser) :273-365. All variants share the same block /
attention kernels, switched by masks and token handling rather than separate
compute paths; device placement is wherever XLA puts the program (the
reference hardcodes CUDA masks, fusion.py:99,170,187).

Apply signature (all fusers):
    apply(params, modal_feats: {mod: (B,T,C)}, feats_order: [mod, ...],
          *, train, rng, need_weights) -> (fused (B,T,C), attn_weights)
except MATT, which returns modality weights (B,T,n).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from . import layers as L
from . import blocks as B


def _ordered(modal_feats: Dict, feats_order: List[str]):
    return [modal_feats[m] for m in feats_order]


def _check_same_shape(modal_feats: Dict):
    shapes = {tuple(v.shape) for v in modal_feats.values()}
    assert len(shapes) == 1, f"fuser inputs must share a shape, got {shapes}"
    return next(iter(shapes))


class _BlockStack:
    """Shared helper: a depth-N stack of pre-LN blocks + final norm."""

    def __init__(self, dim, depth, num_heads, mlp_ratio=4.0, qkv_bias=False,
                 drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
                 norm_affine=True, norm_eps=1e-6):
        self.dim = dim
        self.depth = depth
        self.num_heads = num_heads
        self.mlp_ratio = mlp_ratio
        self.qkv_bias = qkv_bias
        self.drop_rate = drop_rate
        self.attn_drop_rate = attn_drop_rate
        self.dpr = B.drop_path_schedule(drop_path_rate, depth)
        self.norm_affine = norm_affine
        self.norm_eps = norm_eps

    def init(self, rng):
        keys = jax.random.split(rng, self.depth)
        return {
            "blocks": [
                B.block_init(k, self.dim, self.num_heads, self.mlp_ratio,
                             self.qkv_bias, self.norm_affine) for k in keys
            ],
            "norm": L.layernorm_init(self.dim, self.norm_affine),
        }

    def apply(self, params, x, attn_mask=None, *, train=False, rng=None,
              need_weights=True):
        from ..ops import pallas_block as PB
        from ..ops import pallas_block_train as PBT
        if (train and not need_weights and
                PBT.use_fused_train_block(x, self.dim, self.num_heads,
                                          int(self.dim * self.mlp_ratio),
                                          rng)):
            # training fast path: one Pallas kernel per block with in-kernel
            # PRNG dropout/drop-path and a custom VJP whose backward is two
            # Pallas kernels (recompute-from-residual). Masks are a pure
            # function of the seeds drawn here, so the step stays
            # deterministic under jax.random semantics.
            seeds = jax.random.randint(rng.next(), (2,), 0, 2 ** 31 - 1,
                                       dtype=jnp.int32)
            x = jnp.transpose(x, (1, 0, 2))
            for bi, (blk_p, dp) in enumerate(zip(params["blocks"],
                                                 self.dpr)):
                x = PBT.fused_block_train(
                    x, blk_p, attn_mask, seeds, num_heads=self.num_heads,
                    block_idx=bi, attn_rate=self.attn_drop_rate,
                    drop_rate=self.drop_rate, dp_rate=dp,
                    eps=self.norm_eps)
            x = jnp.transpose(x, (1, 0, 2))
            x = L.layernorm_apply(params["norm"], x, self.norm_eps)
            return x, [None] * self.depth
        from ..ops import pallas_seq_block as PS
        if (not need_weights and not train and
                PS.use_fused_seq_block(x, self.dim, self.num_heads,
                                       int(self.dim * self.mlp_ratio))):
            # temporal-fuser serving path (T-SA: S = n*T tokens): one
            # whole-block kernel per block with MXU-batched attention
            for blk_p in params["blocks"]:
                x = PS.fused_seq_block(x, blk_p, attn_mask,
                                       num_heads=self.num_heads,
                                       eps=self.norm_eps)
            x = L.layernorm_apply(params["norm"], x, self.norm_eps)
            return x, [None] * self.depth
        if (not need_weights and not train and
                PB.use_fused_block(x, self.dim, self.num_heads,
                                   int(self.dim * self.mlp_ratio))):
            # inference fast path: each block is ONE Pallas kernel (LN+qkv+
            # n-token attention+proj+MLP, VMEM-resident) — ~30% faster than
            # the XLA op-by-op path on the (B*T, n<=6, C) fusion shapes.
            # Tokens-major layout: ONE transpose on each side of the stack
            # makes the kernels' token gather/scatter free reshapes
            # (measured 24.6 -> 22.3 ms on the flagship 6-block stack)
            x = jnp.transpose(x, (1, 0, 2))
            for blk_p in params["blocks"]:
                x = PB.fused_block(x, blk_p, attn_mask,
                                   num_heads=self.num_heads,
                                   eps=self.norm_eps, tokens_major=True)
            x = jnp.transpose(x, (1, 0, 2))
            x = L.layernorm_apply(params["norm"], x, self.norm_eps)
            return x, [None] * self.depth
        attn_weights = []
        for blk_p, dp in zip(params["blocks"], self.dpr):
            x, w = B.block_apply(
                blk_p, x, self.num_heads, attn_mask, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate, drop_path_rate=dp,
                norm_eps=self.norm_eps, train=train, rng=rng,
                need_weights=need_weights)
            attn_weights.append(w)
        x = L.layernorm_apply(params["norm"], x, self.norm_eps)
        return x, attn_weights


class MATT:
    """RULSTM modality-attention MLP: 3 linear layers (/4, /8 shrink) with
    ReLU + Dropout, softmax over modalities (reference models/fusion.py:35-58).
    """

    def __init__(self, modal_dims: Dict[str, int], dim=None, drop_rate=0.8,
                 **_ignored):
        self.num_modality = len(modal_dims)
        self.in_size = dim * self.num_modality if dim else sum(modal_dims.values())
        self.drop_rate = drop_rate

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        h1, h2 = self.in_size // 4, self.in_size // 8
        return {
            "fc1": L.torch_linear_init(k1, self.in_size, h1),
            "fc2": L.torch_linear_init(k2, h1, h2),
            "fc3": L.torch_linear_init(k3, h2, self.num_modality),
        }

    def apply(self, params, modal_feats, feats_order, *, train=False, rng=None,
              need_weights=True):
        x = jnp.concatenate(_ordered(modal_feats, feats_order), axis=2)
        x = jax.nn.relu(L.linear_apply(params["fc1"], x))
        x = L.dropout(x, self.drop_rate, train, rng)
        x = jax.nn.relu(L.linear_apply(params["fc2"], x))
        x = L.dropout(x, self.drop_rate, train, rng)
        x = L.linear_apply(params["fc3"], x)
        return jax.nn.softmax(x, axis=-1)


class CMFuser:
    """SA-Fuser without modality token: per-timestep self-attention over the
    modality axis, fused output = mean over modalities
    (reference models/fusion.py:61-118)."""

    def __init__(self, dim, depth=1, num_heads=4, mlp_ratio=4.0, qkv_bias=False,
                 qk_scale=None, embd_drop_rate=0.0, drop_rate=0.0,
                 attn_drop_rate=0.0, drop_path_rate=0.0, cross_attn=False,
                 **_ignored):
        del qk_scale
        self.stack = _BlockStack(dim, depth, num_heads, mlp_ratio, qkv_bias,
                                 drop_rate, attn_drop_rate, drop_path_rate)
        self.embd_drop_rate = embd_drop_rate
        self.cross_attn = cross_attn
        self.depth = depth

    def init(self, rng):
        return self.stack.init(rng)

    def apply(self, params, modal_feats, feats_order, *, train=False, rng=None,
              need_weights=True):
        Bsz, T, C = _check_same_shape(modal_feats)
        n = len(feats_order)
        mask = L.cross_attention_diag_mask(n) if self.cross_attn else None

        # n * (B, T, C) -> (B*T, n, C)
        x = jnp.stack(_ordered(modal_feats, feats_order), axis=2)
        x = x.reshape(Bsz * T, n, C)
        x = L.dropout(x, self.embd_drop_rate, train, rng)

        x, attn_ws = self.stack.apply(params, x, mask, train=train, rng=rng,
                                      need_weights=need_weights)
        fused = jnp.mean(x, axis=1).reshape(Bsz, T, C)
        attn = _stack_modal_attn(attn_ws, Bsz, T) if need_weights else None
        return fused, attn


def _stack_modal_attn(attn_ws, Bsz, T):
    # each: (B*T, H, n, n) -> (B, depth, T, H, n, n)
    ws = [w.reshape(Bsz, T, *w.shape[1:]) for w in attn_ws]
    return jnp.stack(ws, axis=1)


class ModalTokenCMFuser:
    """SA-Fuser: per-timestep self-attention over [modal_token, m1..mn];
    fused output is the token slot (reference models/fusion.py:273-365)."""

    def __init__(self, dim, depth=1, num_heads=4, mlp_ratio=4.0, qkv_bias=False,
                 qk_scale=None, embd_drop_rate=0.0, drop_rate=0.0,
                 attn_drop_rate=0.0, drop_path_rate=0.0, norm_elementwise=True,
                 cross_attn=False, modalities=None, modal_encoding=False,
                 frame_level_token=False, temporal_sequence_length=None,
                 **_ignored):
        del qk_scale
        self.dim = dim
        self.stack = _BlockStack(dim, depth, num_heads, mlp_ratio, qkv_bias,
                                 drop_rate, attn_drop_rate, drop_path_rate,
                                 norm_affine=norm_elementwise)
        self.embd_drop_rate = embd_drop_rate
        self.cross_attn = cross_attn
        self.num_mods = len(modalities) + 1  # + the modality-agnostic token
        self.modal_encoding = modal_encoding
        self.frame_level_token = frame_level_token
        self.temporal_sequence_length = temporal_sequence_length
        if frame_level_token:
            assert temporal_sequence_length is not None, \
                "Temporal sequence length must be provided!"

    def init(self, rng):
        k_stack, k_tok, k_emb = jax.random.split(rng, 3)
        p = self.stack.init(k_stack)
        tok_len = (self.temporal_sequence_length if self.frame_level_token
                   else 1)
        p["modal_token"] = L.trunc_normal_init(k_tok, (1, tok_len, self.dim))
        if self.modal_encoding:
            p["modality_embedding"] = L.trunc_normal_init(
                k_emb, (1, self.num_mods, self.dim))
        return p

    def apply(self, params, modal_feats, feats_order, *, train=False, rng=None,
              need_weights=True):
        Bsz, T, C = _check_same_shape(modal_feats)
        mask = (L.cross_attention_diag_mask(self.num_mods)
                if self.cross_attn else None)

        x = jnp.stack(_ordered(modal_feats, feats_order), axis=2)
        x = x.reshape(Bsz * T, len(feats_order), C)

        if not self.frame_level_token:
            tokens = jnp.broadcast_to(params["modal_token"], (Bsz * T, 1, C))
        else:
            assert self.temporal_sequence_length == T, \
                f"Temporal sequence length not valid " \
                f"{self.temporal_sequence_length} vs {T}"
            tokens = jnp.broadcast_to(params["modal_token"], (Bsz, T, C))
            tokens = tokens.reshape(Bsz * T, 1, C)
        x = jnp.concatenate([tokens, x], axis=1)

        if self.modal_encoding:
            x = x + params["modality_embedding"]

        x = L.dropout(x, self.embd_drop_rate, train, rng)
        x, attn_ws = self.stack.apply(params, x, mask, train=train, rng=rng,
                                      need_weights=need_weights)
        fused = x[:, 0, :].reshape(Bsz, T, C)
        attn = _stack_modal_attn(attn_ws, Bsz, T) if need_weights else None
        return fused, attn


class TemporalCMFuser:
    """T-SA-Fuser: joint temporal + modal attention over (B, n*T, C) with a
    causal mask tiled across modalities (reference models/fusion.py:121-215)."""

    def __init__(self, dim, depth=1, num_heads=4, mlp_ratio=4.0, qkv_bias=False,
                 qk_scale=None, embd_drop_rate=0.0, drop_rate=0.0,
                 attn_drop_rate=0.0, drop_path_rate=0.0, modalities=None,
                 modal_encoding=True, frame_level_token=False,
                 temporal_sequence_length=None, max_position_embeddings=64,
                 **_ignored):
        del qk_scale
        self.dim = dim
        self.stack = _BlockStack(dim, depth, num_heads, mlp_ratio, qkv_bias,
                                 drop_rate, attn_drop_rate, drop_path_rate)
        self.embd_drop_rate = embd_drop_rate
        self.num_mods = len(modalities) + 1 if frame_level_token else len(modalities)
        self.modal_encoding = modal_encoding
        self.frame_level_token = frame_level_token
        self.temporal_sequence_length = temporal_sequence_length
        self.max_position_embeddings = max_position_embeddings
        if frame_level_token:
            assert temporal_sequence_length is not None, \
                "Temporal sequence length must be provided!"

    def init(self, rng):
        k_stack, k_pos, k_tok, k_emb = jax.random.split(rng, 4)
        p = self.stack.init(k_stack)
        p["position_embeddings"] = L.embedding_init(
            k_pos, self.max_position_embeddings, self.dim)
        if self.frame_level_token:
            p["modal_token"] = L.trunc_normal_init(
                k_tok, (1, self.temporal_sequence_length, self.dim))
        if self.modal_encoding:
            p["modality_embedding"] = L.trunc_normal_init(
                k_emb, (self.num_mods, self.dim))
        return p

    def apply(self, params, modal_feats, feats_order, *, train=False, rng=None,
              need_weights=True):
        Bsz, T, C = _check_same_shape(modal_feats)
        causal = L.neg_inf_causal_mask(T)
        mask = jnp.tile(causal, (self.num_mods, self.num_mods))

        # n * (B, T, C) -> (B, n*T, C)
        x = jnp.concatenate(_ordered(modal_feats, feats_order), axis=1)

        if self.frame_level_token:
            assert self.temporal_sequence_length == T, \
                f"Temporal sequence length not valid " \
                f"{self.temporal_sequence_length} vs {T}"
            tokens = jnp.broadcast_to(params["modal_token"], (Bsz, T, C))
            x = jnp.concatenate([tokens, x], axis=1)

        pos = L.embedding_apply(params["position_embeddings"],
                                jnp.arange(T))          # (T, C)
        x = x + jnp.tile(pos, (self.num_mods, 1))[None]

        if self.modal_encoding:
            memb = jnp.repeat(params["modality_embedding"], T, axis=0)  # (n*T, C)
            x = x + memb[None]

        x = L.dropout(x, self.embd_drop_rate, train, rng)
        x, attn_ws = self.stack.apply(params, x, mask, train=train, rng=rng,
                                      need_weights=need_weights)

        if self.frame_level_token:
            fused = x[:, :T, :]
        else:
            # mean over the modality copies of each frame slot
            fused = x.reshape(Bsz, self.num_mods, T, C).mean(axis=1)
        attn = jnp.stack(attn_ws, axis=1) if need_weights else None
        return fused, attn


class TemporalCrossAttentFuser:
    """CA-Fuser: first modality (rgb) is the query stream; decoder block i
    cross-attends into modality i+1 with a causal mask
    (reference models/fusion.py:218-270)."""

    def __init__(self, dim, modalities=None, num_heads=4, mlp_ratio=4.0,
                 qkv_bias=False, qk_scale=None, embd_drop_rate=0.0,
                 drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
                 max_position_embeddings=128, **_ignored):
        del qk_scale
        self.dim = dim
        self.depth = len(modalities) - 1
        self.num_heads = num_heads
        self.mlp_ratio = mlp_ratio
        self.qkv_bias = qkv_bias
        self.drop_rate = drop_rate
        self.attn_drop_rate = attn_drop_rate
        self.dpr = B.drop_path_schedule(drop_path_rate, self.depth)
        self.embd_drop_rate = embd_drop_rate
        self.max_position_embeddings = max_position_embeddings

    def init(self, rng):
        k_pos, *keys = jax.random.split(rng, self.depth + 1)
        return {
            "blocks": [
                B.decoder_block_init(k, self.dim, None, self.num_heads,
                                     self.mlp_ratio, self.qkv_bias)
                for k in keys
            ],
            "norm": L.layernorm_init(self.dim),
            "position_embeddings": L.embedding_init(
                k_pos, self.max_position_embeddings, self.dim),
        }

    def apply(self, params, modal_feats, feats_order, *, train=False, rng=None,
              need_weights=True):
        Bsz, T, C = _check_same_shape(modal_feats)
        causal = L.neg_inf_causal_mask(T)
        pos = L.embedding_apply(params["position_embeddings"], jnp.arange(T))

        feats = [
            L.dropout(f + pos[None], self.embd_drop_rate, train, rng)
            for f in _ordered(modal_feats, feats_order)
        ]
        x, mems = feats[0], feats[1:]
        from ..ops import pallas_seq_block as PS
        use_fused = (not train and mems
                     and PS.use_fused_decoder_block(
                         x, mems[0], self.dim, self.num_heads,
                         int(self.dim * self.mlp_ratio)))
        for blk_p, mem, dp in zip(params["blocks"], mems, self.dpr):
            if use_fused:
                # serving path: the whole DecoderBlock (self-attn +
                # cross-attn + MLP) is ONE kernel
                x = PS.fused_decoder_block(x, mem, blk_p, causal,
                                           num_heads=self.num_heads)
            else:
                x = B.decoder_block_apply(
                    blk_p, x, mem, self.num_heads, causal,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path_rate=dp, train=train, rng=rng)
        x = L.layernorm_apply(params["norm"], x, 1e-6)
        dummy_attention = jnp.zeros((Bsz,))
        return x, dummy_attention
