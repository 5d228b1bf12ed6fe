"""Pallas TPU fused GPT-2 block (two kernels per layer).

The future predictor's hot path is a 6-layer GPT-2 over (B=256, T=16,
C=2048) (reference models/future_prediction.py:354-415; ours
afft_tpu/models/predictor.py). On the XLA path the stack runs at ~154
TFLOPS — the matmuls are near peak but LayerNorms, the (B, H, T, T)
softmax round-trip, bias adds and the gelu_new tail each re-read HBM.

A single whole-block kernel cannot work here: one layer's weights are
~100 MB bf16 (qkv 25 + proj 8 + fc1/fc2 67), which cannot stay
VMEM-resident next to activations. Instead each layer runs as TWO
kernels with nothing in between (so XLA has nothing to schedule around,
which is what sank the earlier half-fused attempt recorded in DESIGN.md):

- ``attn half``: LN1 -> fused qkv (heads-major packing, see
  predictor._block) -> per-head causal attention (MXU batched dots, the
  pallas_attn pattern) -> proj -> +residual.  Weights ~34 MB.
- ``mlp half``: LN2 -> fc1 -> gelu_new -> fc2 -> +residual.
  Weights ~67 MB; the fc1 activation tile is held in the input dtype
  (bf16 in serving), exactly like the XLA path's matmul output.

Both kernels keep LN statistics, softmax and residual accumulation in
fp32; matmuls run in the input dtype with fp32 accumulation on the MXU.
Inference-only (dropout-free path); training and the KV-cache decode stay
on the XLA path, which is also the gradient path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def default_block_b(dtype) -> int:
    """Batch-tile size (samples per grid step). The MLP half holds a
    (TB*T, 4C) hidden tile; bf16 at TB=64, T=16 is ~17 MB which fits with
    the 67 MB of weights. fp32 (parity-test path) halves it."""
    return 64 if dtype == jnp.bfloat16 else 32


def supported(batch, n_tokens: int, dim: int, num_heads: int,
              mlp_hidden: int, dtype=jnp.bfloat16) -> bool:
    head_dim = dim // num_heads
    tb = default_block_b(dtype)
    # VMEM budget: the MLP half holds both weight matrices, the hidden
    # tile and (double-buffered) in/out tiles; the attention half is
    # smaller. The flagship (T=16) sits at ~101 MB under the 110 MB
    # vmem_limit; longer temporal contexts grow the tiles linearly and
    # must fall back to XLA instead of failing the Mosaic compile.
    itemsize = 2  # bf16-only path, see below
    mlp_bytes = (2 * dim * mlp_hidden + tb * n_tokens * mlp_hidden
                 + 4 * tb * n_tokens * dim) * itemsize
    ok = (
        # bf16 only: at C=2048 the MLP half's fp32 weights alone are
        # 2 * C * 4C * 4B = 134 MB — over the whole VMEM. The fp32
        # (parity-test) path stays on XLA.
        dtype == jnp.bfloat16
        and dim % 128 == 0
        and head_dim * num_heads == dim
        and head_dim % 128 == 0
        and mlp_hidden % 128 == 0
        and mlp_bytes < 105 * 1024 * 1024
    )
    if batch is not None:
        # batches must fill whole tiles (partial grid tiles wedge Mosaic
        # on this toolchain — see ops/pallas_block.py); ragged batches
        # take the XLA path
        ok = ok and batch % default_block_b(dtype) == 0
    return ok


def use_fused_gpt2(x, num_heads: int, mlp_hidden: int) -> bool:
    """Trace-time dispatch: engage on TPU inference for tile-aligned
    batches (the XLA path remains the train / CPU / ragged-batch path)."""
    from .attention import pallas_enabled
    if not pallas_enabled():
        return False
    return (x.ndim == 3
            and x.dtype in (jnp.bfloat16, jnp.float32)
            and supported(x.shape[0], x.shape[1], x.shape[2], num_heads,
                          mlp_hidden, dtype=x.dtype))


# shared Mosaic helpers (incl. the per-dtype precision-pinning rule and
# fp32 LN statistics) — single source of truth in pallas_block
from .pallas_block import _as_row, _const, _dot, _layernorm  # noqa: E402


def _gelu_new(x32):
    # HF GPT-2 "gelu_new": 0.5 x (1 + tanh(sqrt(2/pi) (x + 0.044715 x^3)))
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x32 * (1.0 + jnp.tanh(c * (x32 + 0.044715 * x32 * x32 * x32)))


def _attn_half_kernel(x_ref, ln1g, ln1b, wqkv, bqkv, wproj, bproj, mask_ref,
                      o_ref, *, n_tokens: int, num_heads: int, head_dim: int,
                      eps: float):
    """One grid step: (TB, T, C) -> x + proj(causal_attn(LN1(x)))."""
    TB = x_ref.shape[0]
    C = num_heads * head_dim
    scale = float(head_dim) ** -0.5
    in_dtype = x_ref.dtype

    x32 = x_ref[...].reshape(TB * n_tokens, C).astype(jnp.float32)
    xn = _layernorm(x32, ln1g, ln1b, eps)
    qkv = (_dot(xn.astype(in_dtype), wqkv[:])
           + bqkv[0].astype(jnp.float32)).astype(in_dtype)
    qkv3 = qkv.reshape(TB, n_tokens, 3 * C)

    prec = None if in_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    outs = []
    for h in range(num_heads):
        off = h * 3 * head_dim  # heads-major packing: [h: (q, k, v)]
        q = qkv3[:, :, off:off + head_dim]
        k = qkv3[:, :, off + head_dim:off + 2 * head_dim]
        v = qkv3[:, :, off + 2 * head_dim:off + 3 * head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec) * scale
        s = s + mask_ref[:]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            attn.astype(in_dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec))
    attn_out = jnp.concatenate(outs, axis=-1).reshape(TB * n_tokens, C)
    proj = _dot(attn_out.astype(in_dtype), wproj[:]) + \
        bproj[0].astype(jnp.float32)
    y = x32 + proj
    o_ref[...] = y.astype(o_ref.dtype).reshape(TB, n_tokens, C)


def _mlp_half_kernel(y_ref, ln2g, ln2b, wfc1, bfc1, wfc2, bfc2, o_ref, *,
                     n_tokens: int, eps: float):
    """One grid step: (TB, T, C) -> y + fc2(gelu_new(fc1(LN2(y))))."""
    TB = y_ref.shape[0]
    C = y_ref.shape[2]
    in_dtype = y_ref.dtype
    y32 = y_ref[...].reshape(TB * n_tokens, C).astype(jnp.float32)
    yn = _layernorm(y32, ln2g, ln2b, eps)
    h1 = _dot(yn.astype(in_dtype), wfc1[:]) + bfc1[0].astype(jnp.float32)
    h1 = _gelu_new(h1).astype(in_dtype)
    h2 = _dot(h1, wfc2[:]) + bfc2[0].astype(jnp.float32)
    o_ref[...] = (y32 + h2).astype(o_ref.dtype).reshape(TB, n_tokens, C)




@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret",
                                             "block_b"))
def fused_gpt2_block(x, params, mask, *, num_heads: int, eps: float = 1e-5,
                     interpret: bool = False, block_b: int = 0):
    """One GPT-2 pre-LN block on (B, T, C): two kernels, zero XLA ops.

    ``params`` is the predictor block pytree (ln_1/c_attn/c_proj/ln_2/
    c_fc/mlp_c_proj, afft_tpu/models/predictor.py init); ``c_attn`` must
    use the heads-major qkv packing (predictor._block). ``mask`` is the
    additive (T, T) causal mask. Returns (B, T, C) in x.dtype.
    """
    B, T, C = x.shape
    head_dim = C // num_heads
    if not block_b:
        block_b = default_block_b(x.dtype)
    mlp_hidden = params["c_fc"]["w"].shape[1]
    # interpret mode (CPU tests) has no VMEM, so the bf16-only restriction
    # does not apply there
    assert supported(None, T, C, num_heads, mlp_hidden,
                     jnp.bfloat16 if interpret else x.dtype), \
        f"fused_gpt2_block unsupported shape B={B} T={T} C={C} {x.dtype}"
    assert interpret or B % block_b == 0, \
        f"fused_gpt2_block batch B={B} must fill whole {block_b}-row " \
        f"tiles (partial tiles wedge the Mosaic pipeline); use the XLA path"

    dt = x.dtype
    mask32 = mask.astype(jnp.float32)
    grid = (pl.cdiv(B, block_b),)
    x_spec = pl.BlockSpec((block_b, T, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        functools.partial(_attn_half_kernel, n_tokens=T,
                          num_heads=num_heads, head_dim=head_dim, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, T, C), dt),
        grid=grid,
        in_specs=[
            x_spec,
            _const((1, C)), _const((1, C)),
            _const((C, 3 * C)), _const((1, 3 * C)),
            _const((C, C)), _const((1, C)),
            _const((T, T)),
        ],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * C * 4 * C + 2 * 2 * B * T * T * C,
            bytes_accessed=2 * B * T * C * dt.itemsize
            + 4 * C * C * dt.itemsize,
            transcendentals=B * num_heads * T * T,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x,
      _as_row(params["ln_1"]["g"], C, dt), _as_row(params["ln_1"]["b"], C, dt),
      params["c_attn"]["w"].astype(dt), _as_row(params["c_attn"]["b"], 3 * C, dt),
      params["c_proj"]["w"].astype(dt), _as_row(params["c_proj"]["b"], C, dt),
      mask32)

    out = pl.pallas_call(
        functools.partial(_mlp_half_kernel, n_tokens=T, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, T, C), dt),
        grid=grid,
        in_specs=[
            x_spec,
            _const((1, C)), _const((1, C)),
            _const((C, mlp_hidden)), _const((1, mlp_hidden)),
            _const((mlp_hidden, C)), _const((1, C)),
        ],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * C * 2 * mlp_hidden,
            bytes_accessed=2 * B * T * C * dt.itemsize
            + 2 * C * mlp_hidden * dt.itemsize,
            transcendentals=B * T * mlp_hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(y,
      _as_row(params["ln_2"]["g"], C, dt), _as_row(params["ln_2"]["b"], C, dt),
      params["c_fc"]["w"].astype(dt), _as_row(params["c_fc"]["b"], mlp_hidden,
                                           dt),
      params["mlp_c_proj"]["w"].astype(dt),
      _as_row(params["mlp_c_proj"]["b"], C, dt))
    return out
