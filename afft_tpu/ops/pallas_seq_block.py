"""Pallas TPU fused blocks for the TEMPORAL fusers (serving path).

The per-timestep fusers get ops/pallas_block.py (n<=8 tokens, VPU
attention). The temporal fusers run real sequences:

- T-SA-Fuser (models.fusion.TemporalCMFuser, reference models/fusion.py:
  121-215): pre-LN Blocks over (B, S=n*T<=~80, C) with an n x n-tiled
  causal mask — same Block weights layout as the SA-Fuser.
- CA-Fuser (models.fusion.TemporalCrossAttentFuser, reference :218-270):
  DecoderBlocks (self-attn + cross-attn + MLP) over (B, T, C) querying a
  per-block memory stream.

Both use MXU-batched per-head attention (the pallas_gpt2 pattern) instead
of the n-token VPU loops: at S up to 128 the (TB, S, S) score tensors ride
the MXU and the whole block's weights (~25-32 MB bf16 at C=1024) stay
VMEM-resident, so each block (or decoder block) is ONE kernel with one x
read and one write. Inference-only: training and weight-returning paths
stay on XLA (the gradient path), exactly like pallas_block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_block import _as_row, _const, _dot, _gelu_exact, _layernorm


def default_block_b(dtype, seq: int) -> int:
    # keep the per-tile row count (TB*S) near the serving fuser kernel's
    # working set; S<=32 gets bigger batch tiles
    base = 2048 if dtype == jnp.bfloat16 else 1024
    return max(base // max(seq, 1) // 8 * 8, 8)


def supported(batch, seq, dim, num_heads, mlp_hidden,
              dtype=jnp.bfloat16) -> bool:
    head_dim = dim // num_heads
    ok = (
        8 < seq <= 128
        and dim % 128 == 0
        and head_dim * num_heads == dim
        and head_dim % 128 == 0
        and mlp_hidden % 128 == 0
    )
    if batch is not None:
        ok = ok and batch % default_block_b(dtype, seq) == 0
    return ok


def _use(x, dim, num_heads, mlp_hidden, seq_check=supported) -> bool:
    from .attention import pallas_enabled
    if not pallas_enabled():
        return False
    return (x.ndim == 3 and x.dtype in (jnp.bfloat16, jnp.float32)
            and seq_check(x.shape[0], x.shape[1], dim, num_heads,
                          mlp_hidden, dtype=x.dtype))


def use_fused_seq_block(x, dim, num_heads, mlp_hidden) -> bool:
    return _use(x, dim, num_heads, mlp_hidden)


def use_fused_decoder_block(x, mem, dim, num_heads, mlp_hidden) -> bool:
    # decoder kernel assumes equal query/memory lengths (true for the
    # CA-Fuser: all modality streams share T)
    return (_use(x, dim, num_heads, mlp_hidden)
            and mem.shape == x.shape and mem.dtype == x.dtype)


def _mha(x_2d, wqkv, bqkv, mask_ref, *, tb, seq, num_heads, head_dim,
         in_dtype):
    """Packed-qkv multi-head attention over (TB*S, C) rows: returns
    (TB*S, C) fp32. qkv packing is [q|k|v] (fuser Linear layout)."""
    C = num_heads * head_dim
    scale = float(head_dim) ** -0.5
    qkv = (_dot(x_2d.astype(in_dtype), wqkv[:])
           + bqkv[0].astype(jnp.float32)).astype(in_dtype)
    qkv3 = qkv.reshape(tb, seq, 3 * C)
    prec = None if in_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    outs = []
    for h in range(num_heads):
        q = qkv3[:, :, h * head_dim:(h + 1) * head_dim]
        k = qkv3[:, :, C + h * head_dim:C + (h + 1) * head_dim]
        v = qkv3[:, :, 2 * C + h * head_dim:2 * C + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec) * scale
        s = s + mask_ref[:]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(in_dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec))
    return jnp.concatenate(outs, axis=-1).reshape(tb * seq, C)


def _cross_mha(q_2d, kv_2d, wq, bq, wk, bk, wv, bv, mask_ref, *, tb, seq,
               num_heads, head_dim, in_dtype):
    """Separate-projection cross attention (blocks.cross_attention_apply):
    q from q_2d rows, k/v from kv_2d rows; (TB*S, C) fp32 out."""
    C = num_heads * head_dim
    scale = float(head_dim) ** -0.5
    q = (_dot(q_2d.astype(in_dtype), wq[:])
         + bq[0].astype(jnp.float32)).astype(in_dtype).reshape(tb, seq, C)
    k = (_dot(kv_2d.astype(in_dtype), wk[:])
         + bk[0].astype(jnp.float32)).astype(in_dtype).reshape(tb, seq, C)
    v = (_dot(kv_2d.astype(in_dtype), wv[:])
         + bv[0].astype(jnp.float32)).astype(in_dtype).reshape(tb, seq, C)
    prec = None if in_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    outs = []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec) * scale
        s = s + mask_ref[:]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(in_dtype), v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec))
    return jnp.concatenate(outs, axis=-1).reshape(tb * seq, C)


def _seq_block_kernel(x_ref, ln1g, ln1b, wqkv, bqkv, wproj, bproj,
                      ln2g, ln2b, wfc1, bfc1, wfc2, bfc2, mask_ref, o_ref, *,
                      seq, num_heads, head_dim, eps):
    TB = x_ref.shape[0]
    C = num_heads * head_dim
    M = TB * seq
    in_dtype = x_ref.dtype
    x32 = x_ref[...].reshape(M, C).astype(jnp.float32)
    xn = _layernorm(x32, ln1g, ln1b, eps)
    attn = _mha(xn, wqkv, bqkv, mask_ref, tb=TB, seq=seq,
                num_heads=num_heads, head_dim=head_dim, in_dtype=in_dtype)
    proj = _dot(attn.astype(in_dtype), wproj[:]) + \
        bproj[0].astype(jnp.float32)
    y = x32 + proj
    yn = _layernorm(y, ln2g, ln2b, eps)
    h1 = _gelu_exact(_dot(yn.astype(in_dtype), wfc1[:])
                     + bfc1[0].astype(jnp.float32))
    h2 = _dot(h1.astype(in_dtype), wfc2[:]) + bfc2[0].astype(jnp.float32)
    o_ref[...] = (y + h2).astype(o_ref.dtype).reshape(TB, seq, C)


def _decoder_block_kernel(x_ref, mem_ref, lnsg, lnsb, wqkv, bqkv, wsproj,
                          bsproj, lnqg, lnqb, lnkg, lnkb, wq, bq, wk, bk,
                          wv, bv, wcproj, bcproj, lnmg, lnmb, wfc1, bfc1,
                          wfc2, bfc2, mask_ref, o_ref, *,
                          seq, num_heads, head_dim, eps):
    """DecoderBlock (blocks.decoder_block_apply): self-attn + cross-attn +
    MLP, the same causal mask gating both attention stages."""
    TB = x_ref.shape[0]
    C = num_heads * head_dim
    M = TB * seq
    in_dtype = x_ref.dtype
    x32 = x_ref[...].reshape(M, C).astype(jnp.float32)
    mem32 = mem_ref[...].reshape(M, C).astype(jnp.float32)

    xn = _layernorm(x32, lnsg, lnsb, eps)
    attn = _mha(xn, wqkv, bqkv, mask_ref, tb=TB, seq=seq,
                num_heads=num_heads, head_dim=head_dim, in_dtype=in_dtype)
    sproj = _dot(attn.astype(in_dtype), wsproj[:]) + \
        bsproj[0].astype(jnp.float32)
    x1 = x32 + sproj

    qn = _layernorm(x1, lnqg, lnqb, eps)
    kn = _layernorm(mem32, lnkg, lnkb, eps)
    cross = _cross_mha(qn, kn, wq, bq, wk, bk, wv, bv, mask_ref, tb=TB,
                       seq=seq, num_heads=num_heads, head_dim=head_dim,
                       in_dtype=in_dtype)
    cproj = _dot(cross.astype(in_dtype), wcproj[:]) + \
        bcproj[0].astype(jnp.float32)
    x2 = x1 + cproj

    mn = _layernorm(x2, lnmg, lnmb, eps)
    h1 = _gelu_exact(_dot(mn.astype(in_dtype), wfc1[:])
                     + bfc1[0].astype(jnp.float32))
    h2 = _dot(h1.astype(in_dtype), wfc2[:]) + bfc2[0].astype(jnp.float32)
    o_ref[...] = (x2 + h2).astype(o_ref.dtype).reshape(TB, seq, C)


def _vmem():
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret",
                                             "block_b"))
def fused_seq_block(x, params, mask=None, *, num_heads: int,
                    eps: float = 1e-6, interpret: bool = False,
                    block_b: int = 0):
    """One pre-LN Block over (B, S, C) sequences in one kernel.

    ``params``: the afft_tpu block pytree (models.blocks.block_init);
    ``mask``: additive (S, S) mask or None. Serves the T-SA-Fuser stack
    (reference models/fusion.py:121-215)."""
    B, S, C = x.shape
    dt = x.dtype
    if not block_b:
        block_b = default_block_b(dt, S)
    head_dim = C // num_heads
    wfc1 = params["mlp"]["fc1"]["w"]
    mlp_hidden = wfc1.shape[1]
    assert supported(None, S, C, num_heads, mlp_hidden, dt), \
        f"fused_seq_block unsupported S={S} C={C} H={num_heads}"
    assert interpret or B % block_b == 0, \
        f"batch {B} must fill {block_b}-sample tiles"

    full_mask = jnp.zeros((S, S), jnp.float32) if mask is None \
        else mask.astype(jnp.float32)
    grid = (pl.cdiv(B, block_b),)
    x_spec = pl.BlockSpec((block_b, S, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_seq_block_kernel, seq=S, num_heads=num_heads,
                          head_dim=head_dim, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, S, C), dt),
        grid=grid,
        in_specs=[
            x_spec,
            _const((1, C)), _const((1, C)),
            _const((C, 3 * C)), _const((1, 3 * C)),
            _const((C, C)), _const((1, C)),
            _const((1, C)), _const((1, C)),
            _const((C, mlp_hidden)), _const((1, mlp_hidden)),
            _const((mlp_hidden, C)), _const((1, C)),
            _const((S, S)),
        ],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * C * (4 * C + 2 * mlp_hidden)
            + 4 * B * S * S * C,
            bytes_accessed=2 * B * S * C * dt.itemsize
            + (4 * C * C + 2 * C * mlp_hidden) * dt.itemsize,
            transcendentals=B * S * (num_heads * S + mlp_hidden),
        ),
        compiler_params=_vmem(),
        interpret=interpret,
    )(x,
      _as_row(params["norm1"].get("g"), C, dt) if params["norm1"]
      else jnp.ones((1, C), dt),
      _as_row(params["norm1"].get("b"), C, dt),
      params["attn"]["qkv"]["w"].astype(dt),
      _as_row(params["attn"]["qkv"].get("b"), 3 * C, dt),
      params["attn"]["proj"]["w"].astype(dt),
      _as_row(params["attn"]["proj"].get("b"), C, dt),
      _as_row(params["norm2"].get("g"), C, dt) if params["norm2"]
      else jnp.ones((1, C), dt),
      _as_row(params["norm2"].get("b"), C, dt),
      wfc1.astype(dt), _as_row(params["mlp"]["fc1"].get("b"), mlp_hidden, dt),
      params["mlp"]["fc2"]["w"].astype(dt),
      _as_row(params["mlp"]["fc2"].get("b"), C, dt),
      full_mask)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret",
                                             "block_b"))
def fused_decoder_block(x, mem, params, mask=None, *, num_heads: int,
                        eps: float = 1e-6, interpret: bool = False,
                        block_b: int = 0):
    """One DecoderBlock over (B, T, C) with memory (B, T, C) in one kernel
    (serves the CA-Fuser, reference models/fusion.py:218-270)."""
    B, S, C = x.shape
    dt = x.dtype
    if not block_b:
        block_b = default_block_b(dt, S)
    head_dim = C // num_heads
    wfc1 = params["mlp"]["fc1"]["w"]
    mlp_hidden = wfc1.shape[1]
    assert supported(None, S, C, num_heads, mlp_hidden, dt), \
        f"fused_decoder_block unsupported S={S} C={C}"
    assert interpret or B % block_b == 0, \
        f"batch {B} must fill {block_b}-sample tiles"

    full_mask = jnp.zeros((S, S), jnp.float32) if mask is None \
        else mask.astype(jnp.float32)
    grid = (pl.cdiv(B, block_b),)
    x_spec = pl.BlockSpec((block_b, S, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    ca = params["cross_attn"]
    return pl.pallas_call(
        functools.partial(_decoder_block_kernel, seq=S,
                          num_heads=num_heads, head_dim=head_dim, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, S, C), dt),
        grid=grid,
        in_specs=[
            x_spec, x_spec,
            _const((1, C)), _const((1, C)),
            _const((C, 3 * C)), _const((1, 3 * C)),
            _const((C, C)), _const((1, C)),
            _const((1, C)), _const((1, C)),
            _const((1, C)), _const((1, C)),
            _const((C, C)), _const((1, C)),
            _const((C, C)), _const((1, C)),
            _const((C, C)), _const((1, C)),
            _const((C, C)), _const((1, C)),
            _const((1, C)), _const((1, C)),
            _const((C, mlp_hidden)), _const((1, mlp_hidden)),
            _const((mlp_hidden, C)), _const((1, C)),
            _const((S, S)),
        ],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * C * (8 * C + 2 * mlp_hidden)
            + 8 * B * S * S * C,
            bytes_accessed=3 * B * S * C * dt.itemsize
            + (8 * C * C + 2 * C * mlp_hidden) * dt.itemsize,
            transcendentals=2 * B * S * (num_heads * S + mlp_hidden),
        ),
        compiler_params=_vmem(),
        interpret=interpret,
    )(x, mem,
      _as_row(params["norm_self"].get("g"), C, dt),
      _as_row(params["norm_self"].get("b"), C, dt),
      params["attn"]["qkv"]["w"].astype(dt),
      _as_row(params["attn"]["qkv"].get("b"), 3 * C, dt),
      params["attn"]["proj"]["w"].astype(dt),
      _as_row(params["attn"]["proj"].get("b"), C, dt),
      _as_row(params["norm_q"].get("g"), C, dt),
      _as_row(params["norm_q"].get("b"), C, dt),
      _as_row(params["norm_kv"].get("g"), C, dt),
      _as_row(params["norm_kv"].get("b"), C, dt),
      ca["w_q"]["w"].astype(dt), _as_row(ca["w_q"].get("b"), C, dt),
      ca["w_k"]["w"].astype(dt), _as_row(ca["w_k"].get("b"), C, dt),
      ca["w_v"]["w"].astype(dt), _as_row(ca["w_v"].get("b"), C, dt),
      ca["proj"]["w"].astype(dt), _as_row(ca["proj"].get("b"), C, dt),
      _as_row(params["norm_mlp"].get("g"), C, dt),
      _as_row(params["norm_mlp"].get("b"), C, dt),
      wfc1.astype(dt), _as_row(params["mlp"]["fc1"].get("b"), mlp_hidden, dt),
      params["mlp"]["fc2"]["w"].astype(dt),
      _as_row(params["mlp"]["fc2"].get("b"), C, dt),
      full_mask)
