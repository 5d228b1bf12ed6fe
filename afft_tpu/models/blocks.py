"""Transformer primitives for the fuser stacks.

Behavioural reference: models/transformerblock.py in the upstream repo
(Attention :7-36, CrossAttention :39-76, MLP :79-93, Block :118-135,
DecoderBlock :138-162). Redesigned as pure functions over parameter pytrees;
attention is computed through :mod:`afft_tpu.ops.attention`, which dispatches
to a Pallas TPU kernel for the hot shapes and an XLA einsum path otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import layers as L
from ..ops import attention as _attention_ops


def attention_init(rng, dim, num_heads, qkv_bias=False):
    k1, k2 = jax.random.split(rng)
    return {
        "qkv": L.fuser_linear_init(k1, dim, dim * 3, bias=qkv_bias),
        "proj": L.fuser_linear_init(k2, dim, dim),
    }


def attention_apply(p, x, num_heads, attn_mask=None, *, attn_drop=0.0,
                    proj_drop=0.0, train=False, rng: Optional[L.RngStream] = None,
                    need_weights=True):
    """Fused-qkv self attention; returns (out, attn_weights).

    Matches reference models/transformerblock.py:19-36: softmax((q k^T) * hd^-0.5
    + mask), dropout on the weights, weights returned post-dropout.
    ``need_weights=False`` frees the op to use the Pallas fused kernel.
    """
    B, N, C = x.shape
    qkv = L.linear_apply(p["qkv"], x).reshape(B, N, 3, num_heads, C // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
    out, attn = _attention_ops.multihead_attention(
        q, k, v, mask=attn_mask, attn_drop=attn_drop, train=train, rng=rng,
        return_weights=need_weights)
    out = out.reshape(B, N, C)
    out = L.linear_apply(p["proj"], out)
    out = L.dropout(out, proj_drop, train, rng)
    return out, attn


def cross_attention_init(rng, dim, mem_dim=None, qkv_bias=False):
    mem_dim = mem_dim or dim
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "w_q": L.fuser_linear_init(k1, dim, dim, bias=qkv_bias),
        "w_k": L.fuser_linear_init(k2, mem_dim, dim, bias=qkv_bias),
        "w_v": L.fuser_linear_init(k3, mem_dim, dim, bias=qkv_bias),
        "proj": L.fuser_linear_init(k4, dim, dim),
    }


def cross_attention_apply(p, x, mem, num_heads, attn_mask=None, *,
                          attn_drop=0.0, proj_drop=0.0, train=False,
                          rng: Optional[L.RngStream] = None):
    B, N, C = x.shape
    M = mem.shape[1]  # the reference hardcodes N here (transformerblock.py
    # :62-63, accidental — all its call sites pass equal lengths);
    # generalized to mem's own length, identical when M == N
    hd = C // num_heads
    q = L.linear_apply(p["w_q"], x).reshape(B, N, num_heads, hd)
    k = L.linear_apply(p["w_k"], mem).reshape(B, M, num_heads, hd)
    v = L.linear_apply(p["w_v"], mem).reshape(B, M, num_heads, hd)
    out, _ = _attention_ops.multihead_attention(
        q, k, v, mask=attn_mask, attn_drop=attn_drop, train=train, rng=rng,
        return_weights=False)
    out = out.reshape(B, N, C)
    out = L.linear_apply(p["proj"], out)
    out = L.dropout(out, proj_drop, train, rng)
    return out


def mlp_init(rng, in_features, hidden_features):
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": L.fuser_linear_init(k1, in_features, hidden_features),
        "fc2": L.fuser_linear_init(k2, hidden_features, in_features),
    }


def mlp_apply(p, x, act=L.gelu_exact, drop=0.0, *, train=False,
              rng: Optional[L.RngStream] = None):
    # single dropout AFTER fc2 only: the reference's custom MLP is
    # Linear->GELU->Linear->Dropout (transformerblock.py:84-89), NOT
    # timm's two-dropout variant
    x = act(L.linear_apply(p["fc1"], x))
    x = L.linear_apply(p["fc2"], x)
    return L.dropout(x, drop, train, rng)


def block_init(rng, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
               norm_affine=True):
    k1, k2 = jax.random.split(rng)
    return {
        "norm1": L.layernorm_init(dim, norm_affine),
        "attn": attention_init(k1, dim, num_heads, qkv_bias),
        "norm2": L.layernorm_init(dim, norm_affine),
        "mlp": mlp_init(k2, dim, int(dim * mlp_ratio)),
    }


def block_apply(p, x, num_heads, attn_mask=None, *, drop=0.0, attn_drop=0.0,
                drop_path_rate=0.0, norm_eps=1e-6, train=False,
                rng: Optional[L.RngStream] = None, need_weights=True):
    """Pre-LN block: x + DropPath(attn(LN(x))); x + DropPath(mlp(LN(x)))."""
    attn_out, attn_w = attention_apply(
        p["attn"], L.layernorm_apply(p["norm1"], x, norm_eps), num_heads,
        attn_mask, attn_drop=attn_drop, proj_drop=drop, train=train, rng=rng,
        need_weights=need_weights)
    x = x + L.drop_path(attn_out, drop_path_rate, train, rng)
    mlp_out = mlp_apply(p["mlp"], L.layernorm_apply(p["norm2"], x, norm_eps),
                        drop=drop, train=train, rng=rng)
    x = x + L.drop_path(mlp_out, drop_path_rate, train, rng)
    return x, attn_w


def decoder_block_init(rng, dim, mem_dim=None, num_heads=4, mlp_ratio=4.0,
                       qkv_bias=False, norm_affine=True):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "norm_self": L.layernorm_init(dim, norm_affine),
        "attn": attention_init(k1, dim, num_heads, qkv_bias),
        "norm_q": L.layernorm_init(dim, norm_affine),
        "norm_kv": L.layernorm_init(mem_dim or dim, norm_affine),
        "cross_attn": cross_attention_init(k2, dim, mem_dim, qkv_bias),
        "norm_mlp": L.layernorm_init(dim, norm_affine),
        "mlp": mlp_init(k3, dim, int(dim * mlp_ratio)),
    }


def decoder_block_apply(p, x, mem, num_heads, attn_mask=None, *, drop=0.0,
                        attn_drop=0.0, drop_path_rate=0.0, norm_eps=1e-6,
                        train=False, rng: Optional[L.RngStream] = None):
    """Self-attn + cross-attn + MLP decoder block
    (reference models/transformerblock.py:157-162; the same mask gates both
    attention stages)."""
    attn_out, _ = attention_apply(
        p["attn"], L.layernorm_apply(p["norm_self"], x, norm_eps), num_heads,
        attn_mask, attn_drop=attn_drop, proj_drop=drop, train=train, rng=rng,
        need_weights=False)
    x = x + L.drop_path(attn_out, drop_path_rate, train, rng)
    cross_out = cross_attention_apply(
        p["cross_attn"], L.layernorm_apply(p["norm_q"], x, norm_eps),
        L.layernorm_apply(p["norm_kv"], mem, norm_eps), num_heads, attn_mask,
        attn_drop=attn_drop, proj_drop=drop, train=train, rng=rng)
    x = x + L.drop_path(cross_out, drop_path_rate, train, rng)
    mlp_out = mlp_apply(p["mlp"], L.layernorm_apply(p["norm_mlp"], x, norm_eps),
                        drop=drop, train=train, rng=rng)
    x = x + L.drop_path(mlp_out, drop_path_rate, train, rng)
    return x


def drop_path_schedule(drop_path_rate: float, depth: int):
    """Stochastic-depth decay: linspace(0, rate, depth) per block
    (reference models/fusion.py:68)."""
    if depth == 1:
        return [0.0]
    return [drop_path_rate * i / (depth - 1) for i in range(depth)]
