"""Pallas TPU fused attention for short sequences.

AFFT attention sites are tiny in sequence (modality fusion: n<=5 tokens per
timestep over a B*T batch; GPT-2 predictor: T<=18) and large in batch, so the
op is HBM-bandwidth-bound. XLA's generic path materializes the
(B, H, N, N) softmax weights in HBM; this kernel keeps qk^T, the softmax and
the value contraction in VMEM per batch tile, writing only the (B, N, H, hd)
output — one HBM round-trip instead of three.

Layout: q/k/v stay (B, N, H, hd); the grid runs (batch tiles, heads) so no
host-visible transpose is needed. N and hd are padded to sublane/lane
multiples in the wrapper; padded key columns are masked with -inf before the
softmax, padded query rows are sliced off after.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # blocks: (TB, Nq, 1, hd) for q/o, (TB, Nk, 1, hd) for k/v, (Nq, Nk) mask
    q = q_ref[:, :, 0, :]
    k = k_ref[:, :, 0, :]
    v = v_ref[:, :, 0, :]
    # (TB, Nq, Nk) = (TB, Nq, hd) @ (TB, Nk, hd)^T
    attn = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    attn = attn + mask_ref[:]
    attn = attn - jnp.max(attn, axis=-1, keepdims=True)
    attn = jnp.exp(attn)
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    # (TB, Nq, hd) = (TB, Nq, Nk) @ (TB, Nk, hd)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:, :, 0, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_b"))
def fused_attention(q, k, v, mask=None, *, interpret=False, block_b=16):
    """softmax((q k^T) * hd^-0.5 + mask) v  without materializing the weights.

    Args:
      q: (B, Nq, H, hd); k, v: (B, Nk, H, hd); mask: additive (Nq, Nk) or None.
    Returns:
      (B, Nq, H, hd), same dtype as q.
    """
    B, Nq, H, hd = q.shape
    Nk = k.shape[1]
    scale = float(hd) ** -0.5

    sub = 8 if q.dtype == jnp.float32 else 16
    Nqp, Nkp = _round_up(Nq, sub), _round_up(Nk, 128)
    hdp = _round_up(hd, 128)
    Bp = _round_up(B, block_b)

    full_mask = jnp.zeros((Nqp, Nkp), jnp.float32)
    if mask is not None:
        full_mask = full_mask.at[:Nq, :Nk].set(mask.astype(jnp.float32))
    if Nkp > Nk:  # padded key columns never receive weight
        full_mask = full_mask.at[:, Nk:].set(-jnp.inf)

    def pad(x, n_to):
        return jnp.pad(x, ((0, Bp - B), (0, n_to - x.shape[1]), (0, 0),
                           (0, hdp - hd)))

    qp, kp, vp = pad(q, Nqp), pad(k, Nkp), pad(v, Nkp)

    grid = (Bp // block_b, H)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((Bp, Nqp, H, hdp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, Nqp, 1, hdp), lambda i, h: (i, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Nkp, 1, hdp), lambda i, h: (i, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Nkp, 1, hdp), lambda i, h: (i, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nqp, Nkp), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, Nqp, 1, hdp),
                               lambda i, h: (i, 0, h, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bp * H * Nqp * Nkp * hdp,
            bytes_accessed=(Bp * Nqp * H * hdp + 2 * Bp * Nkp * H * hdp
                            + Bp * Nqp * H * hdp) * q.dtype.itemsize,
            transcendentals=Bp * H * Nqp * Nkp,
        ),
        interpret=interpret,
    )(qp, kp, vp, full_mask)
    return out[:B, :Nq, :, :hd]
