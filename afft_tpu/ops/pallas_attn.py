"""Pallas TPU fused attention for short sequences.

AFFT attention sites are tiny in sequence (modality fusion: n<=5 tokens per
timestep over a B*T batch; GPT-2 predictor: T<=18) and large in batch, so the
op is HBM-bandwidth-bound. XLA's generic path materializes the
(B, H, N, N) softmax weights in HBM; this kernel keeps qk^T, the softmax and
the value contraction in VMEM per batch tile, writing only the output — one
HBM round-trip instead of three.

Layout: q/k/v stay (B, N, H*hd) exactly as the fused qkv matmul produces
them (no transpose); the grid tiles the batch, each block carries the full
(N, C) plane (satisfying the Mosaic "equal to the array dims" rule for tiny
N), and heads are a static in-kernel loop over 128-aligned lane slices.
Requires hd % 128 == 0 (true for every shipped config: C/H = 256 or 512);
other shapes fall back to the XLA path in ops.attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


BLOCK_B = 16  # batch-tile rows; keep in sync with ops.attention dispatch


def supported(num_heads: int, head_dim: int, batch: int = None) -> bool:
    ok = head_dim % 128 == 0
    if batch is not None:
        # the batch must fill whole tiles: a grid tile larger than the
        # array wedges the Mosaic pipeline on this toolchain (hung
        # compile/execution observed, taking the TPU worker down). Small /
        # ragged batches take the XLA path — they're dispatch-bound anyway.
        ok = ok and batch % BLOCK_B == 0
    return ok


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float,
                 num_heads: int, head_dim: int):
    # blocks: (TB, Nq, C) q/o, (TB, Nk, C) k/v, (Nq, Nk) mask
    # precision pinned per-dtype: an ambient default_matmul_precision
    # ("highest") context otherwise leaks in, and Mosaic rejects
    # HIGHEST-precision bf16 dots ("Bad lhs type")
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[:, :, sl]
        kh = k_ref[:, :, sl]
        vh = v_ref[:, :, sl]
        prec = None if qh.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
        attn = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        attn = attn + mask_ref[:]
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            attn.astype(vh.dtype), vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=(None if vh.dtype == jnp.float32
                       else jax.lax.Precision.DEFAULT),
        )
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_b"))
def fused_attention(q, k, v, mask=None, *, interpret=False, block_b=BLOCK_B):
    """softmax((q k^T) * hd^-0.5 + mask) v  without materializing weights.

    Args:
      q: (B, Nq, H, hd); k, v: (B, Nk, H, hd); mask: additive (Nq, Nk) or
      None. Returns (B, Nq, H, hd), dtype of q.
    """
    B, Nq, H, hd = q.shape
    Nk = k.shape[1]
    scale = float(hd) ** -0.5
    assert supported(H, hd), f"pallas path needs hd%128==0, got {hd}"
    assert interpret or B % block_b == 0, \
        f"fused_attention batch B={B} must fill whole {block_b}-row tiles " \
        f"(partial tiles wedge the Mosaic pipeline); use the XLA path"

    # (B, N, H, hd) -> (B, N, C): contiguous reshape, no data movement
    C = H * hd
    qr = q.reshape(B, Nq, C)
    kr = k.reshape(B, Nk, C)
    vr = v.reshape(B, Nk, C)

    full_mask = jnp.zeros((Nq, Nk), jnp.float32) if mask is None \
        else mask.astype(jnp.float32)

    grid = (pl.cdiv(B, block_b),)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, num_heads=H,
                          head_dim=hd),
        out_shape=jax.ShapeDtypeStruct((B, Nq, C), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, Nq, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Nk, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Nk, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nq, Nk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, Nq, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Nq * Nk * C,
            bytes_accessed=(B * Nq * C * 2 + 2 * B * Nk * C)
            * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
        interpret=interpret,
    )(qr, kr, vr, full_mask)
    return out.reshape(B, Nq, H, hd)
