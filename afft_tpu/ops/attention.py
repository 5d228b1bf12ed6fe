"""Multi-head attention op with XLA and Pallas TPU paths.

One attention implementation serves every attention site in the framework:
the per-timestep modality fusion (n<=5 tokens over a B*T batch), the joint
temporal-modal fuser (n*T tokens), the cross-attention fuser and the GPT-2
future predictor (T<=18 causal) — the reference implements these four times
over (models/transformerblock.py, HF GPT2Attention); here masks and shapes
are arguments, not copies of the code.

The sequences are tiny, so the op is HBM-bandwidth-bound, not MXU-bound.
The Pallas path (ops/pallas_attn.py) fuses softmax(qk^T)v per batch tile and
never materializes the (B, H, N, N) weight tensor in HBM; the XLA path is the
reference semantics and the fallback for CPU tests, weight returns, and
training-time attention dropout.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import layers as L


def pallas_enabled() -> bool:
    """Shared kernel-dispatch gate: Pallas engages only on a TPU backend
    and can be globally disabled with AFFT_DISABLE_PALLAS=1 (every fused
    op in afft_tpu.ops routes through this one check)."""
    if os.environ.get("AFFT_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


_use_pallas = pallas_enabled


def attention_reference(q, k, v, mask=None, *, attn_drop=0.0, train=False,
                        rng: Optional[L.RngStream] = None,
                        return_weights=True):
    """XLA einsum attention. q/k/v: (B, N, H, hd). Returns (out (B,N,H,hd),
    attn (B,H,N,Nk) or None)."""
    hd = q.shape[-1]
    scale = hd ** -0.5
    # (B, H, Nq, Nk)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if mask is not None:
        attn = attn + mask
    attn = jax.nn.softmax(attn, axis=-1)
    attn = L.dropout(attn, attn_drop, train, rng)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out, (attn if return_weights else None)


@jax.custom_vjp
def _fused_attention_ad(q, k, v, mask):
    from .pallas_attn import fused_attention
    return fused_attention(q, k, v, mask)


def _fused_attention_fwd(q, k, v, mask):
    from .pallas_attn import fused_attention
    return fused_attention(q, k, v, mask), (q, k, v, mask)


def _fused_attention_bwd(residuals, g):
    # backward through the XLA reference formulation (identical math); the
    # Pallas kernel stays the forward fast path
    q, k, v, mask = residuals
    def f(q, k, v):
        return attention_reference(q, k, v, mask, return_weights=False)[0]
    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_fused_attention_ad.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def multihead_attention(q, k, v, mask=None, *, attn_drop=0.0, train=False,
                        rng: Optional[L.RngStream] = None,
                        return_weights=False) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Dispatch between the Pallas TPU kernel and the XLA reference path.

    The Pallas kernel does not return weights and has no dropout, so any
    request for either falls back to XLA (XLA still fuses well there). The
    Pallas path is differentiable via a custom VJP whose backward runs the
    XLA formulation.
    """
    from . import pallas_attn as PA
    needs_fallback = (
        return_weights
        or (train and attn_drop > 0.0)
        or not PA.supported(q.shape[2], q.shape[-1], batch=q.shape[0])
        or not _use_pallas()
    )
    if needs_fallback:
        return attention_reference(
            q, k, v, mask, attn_drop=attn_drop, train=train, rng=rng,
            return_weights=return_weights)
    if mask is None:
        mask = jnp.zeros((q.shape[1], k.shape[1]), q.dtype)
    return _fused_attention_ad(q, k, v, mask), None
