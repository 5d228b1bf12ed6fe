"""Pallas TPU fully-fused transformer block for the per-timestep fusers.

The SA-Fuser's hot loop is a pre-LN block over (B*T, n<=5+1, C=1024) tokens
(reference models/transformerblock.py:118-135 run per timestep from
models/fusion.py:273-365). On the XLA path the block decomposes into ~10
HBM-round-tripping ops; measured on v5e, the matmuls run near peak (~200
TFLOPS) but LayerNorm (~0.86 ms), the 5-token attention (~0.75 ms) and the
exact-erf GELU dominate — ~60% of block time is elementwise ops re-reading
HBM.

This kernel executes the ENTIRE block — LN1 -> fused qkv -> n-token
multi-head attention -> proj -> residual -> LN2 -> MLP(GELU) -> residual —
in one pallas_call: activations live in VMEM for the whole block, weights
(~25 MB bf16 at C=1024) stay resident across grid steps, and HBM traffic
drops to one x read + one output write per block.

Shape contract (checked by ``supported``): tokens n <= 8 (the per-timestep
fusion sites; the temporal fusers with n*T tokens keep the XLA path), C and
head_dim multiples of 128. Attention scores/softmax and residuals compute in
fp32; matmuls run in the input dtype on the MXU with fp32 accumulation.
Inference-only by design: dropout/drop-path and attention-weight returns
stay on the XLA path (afft_tpu.models.blocks), which is also the gradient
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def default_block_r(dtype, tokens_major: bool = False) -> int:
    """Row-tile size: fp32 tiles at HIGHEST matmul precision spill far more
    registers than bf16; halve the row tile to stay inside VMEM. The
    tokens-major fp32 layout needs one more halving (its whole-block
    reshape keeps the full fp32 tile live: 100.84M > the 100M scoped-vmem
    limit at r=128). fp32 is the parity-test path only, so the smaller
    tile costs nothing in serving."""
    if dtype == jnp.bfloat16:
        return 256
    return 64 if tokens_major else 128


def supported(n_tokens: int, dim: int, num_heads: int, mlp_hidden: int,
              n_rows: int = None, dtype=jnp.bfloat16) -> bool:
    head_dim = dim // num_heads
    ok = (
        n_tokens <= 8
        and dim % 128 == 0
        and head_dim * num_heads == dim
        and head_dim % 128 == 0
        and mlp_hidden % 128 == 0
    )
    if n_rows is not None:
        # rows must fill whole tiles: a grid tile larger than the array
        # wedges the Mosaic pipeline on this toolchain (observed as a hung
        # compile/execution at R=16 with block_r=256, taking the TPU worker
        # down with it). Ragged/small row counts take the XLA path — they
        # are dispatch-bound anyway (serving pads batches, so the hot path
        # is always tile-aligned: R = B*T = 256*16).
        ok = ok and n_rows % default_block_r(dtype) == 0
    return ok


def use_fused_block(x, dim: int, num_heads: int, mlp_hidden: int) -> bool:
    """Trace-time dispatch: engage the fused kernel for the per-timestep
    fusion shapes on TPU in inference (the XLA path stays the train /
    weight-returning / CPU / odd-shape path)."""
    from .attention import pallas_enabled
    if not pallas_enabled():
        return False
    return (x.ndim == 3
            and x.dtype in (jnp.bfloat16, jnp.float32)
            and supported(x.shape[1], dim, num_heads, mlp_hidden,
                          n_rows=x.shape[0], dtype=x.dtype))


def _dot(a, b, out_dtype=jnp.float32):
    # fp32 operands inherit the ambient matmul precision, exactly like the
    # XLA path (so jax.default_matmul_precision("highest") makes both sides
    # true-fp32). bf16 operands pin DEFAULT: Mosaic rejects
    # HIGHEST-precision bf16 dots ("Bad lhs type") if the ambient context
    # leaks in.
    prec = None if a.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype, precision=prec)


def _layernorm(x32, g_ref, b_ref, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf, max abs error 1.5e-7
    (lax.erf has no Mosaic lowering; this error is ~4 decades below bf16
    resolution, so the serving output is unchanged)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x32):
    # torch nn.GELU default: 0.5 x (1 + erf(x / sqrt(2)))
    return 0.5 * x32 * (1.0 + _erf(x32 * (2.0 ** -0.5)))


def _block_kernel(x_ref, ln1g, ln1b, wqkv, bqkv, wproj, bproj,
                  ln2g, ln2b, wfc1, bfc1, wfc2, bfc2, mask_ref, o_ref, *,
                  n_tokens: int, num_heads: int, head_dim: int, eps: float,
                  tokens_major: bool):
    """One grid step = one (TR, N, C) row tile through the whole block
    (or (N, TR, C) when ``tokens_major``)."""
    C = num_heads * head_dim
    TR = x_ref.shape[1] if tokens_major else x_ref.shape[0]
    scale = float(head_dim) ** -0.5
    in_dtype = x_ref.dtype

    # ---- phase A: LN1 + fused qkv, ALL tokens in one matmul ----------------
    # Tokens are concatenated along rows so every MXU dot runs at
    # M = N*TR instead of N separate M = TR dots (small-M dots dominated
    # the earlier per-token variant). q/k/v held in the input dtype (bf16
    # in serving): halves the live VMEM set and matches the XLA path's
    # numerics (its einsum also runs on the bf16 qkv matmul output).
    if tokens_major:
        # (N, TR, C) -> (N*TR, C) is a free row-major collapse: the caller
        # pre-transposed once for the whole block stack, so no in-kernel
        # token-gather copy happens at all
        x_all = x_ref[...].reshape(n_tokens * TR, C).astype(jnp.float32)
    else:
        x_all = jnp.concatenate([x_ref[:, t, :] for t in range(n_tokens)],
                                axis=0).astype(jnp.float32)  # (N*TR, C)
    xn = _layernorm(x_all, ln1g, ln1b, eps)
    qkv = (_dot(xn.astype(in_dtype), wqkv[:])
           + bqkv[0].astype(jnp.float32)).astype(in_dtype)  # (N*TR, 3C)
    q = [qkv[t * TR:(t + 1) * TR, :C] for t in range(n_tokens)]
    k = [qkv[t * TR:(t + 1) * TR, C:2 * C] for t in range(n_tokens)]
    v = [qkv[t * TR:(t + 1) * TR, 2 * C:] for t in range(n_tokens)]

    # ---- phase B: n-token attention (VPU row-wise reductions) -------------
    attn_parts = []
    for tq in range(n_tokens):
        scores = []  # [tk][h] -> (TR, 1) fp32
        for tk in range(n_tokens):
            prod = q[tq].astype(jnp.float32) * k[tk].astype(jnp.float32)
            scores.append([
                jnp.sum(prod[:, h * head_dim:(h + 1) * head_dim],
                        axis=-1, keepdims=True) * scale
                + mask_ref[tq, tk]
                for h in range(num_heads)
            ])
        out_heads = []
        for h in range(num_heads):
            s_h = [scores[tk][h] for tk in range(n_tokens)]
            m = functools.reduce(jnp.maximum, s_h)
            e_h = [jnp.exp(s - m) for s in s_h]
            denom = functools.reduce(jnp.add, e_h)
            acc = None
            for tk in range(n_tokens):
                contrib = (e_h[tk] / denom) * \
                    v[tk][:, h * head_dim:(h + 1) * head_dim].astype(
                        jnp.float32)
                acc = contrib if acc is None else acc + contrib
            out_heads.append(acc)
        attn_parts.append(jnp.concatenate(out_heads, axis=-1))

    # ---- phase C: proj + residual + LN2 + MLP, again all tokens at once ---
    attn_all = jnp.concatenate(attn_parts, axis=0)          # (N*TR, C) f32
    proj = _dot(attn_all.astype(in_dtype), wproj[:]) + \
        bproj[0].astype(jnp.float32)
    y = x_all + proj
    yn = _layernorm(y, ln2g, ln2b, eps)
    h1 = _dot(yn.astype(in_dtype), wfc1[:]) + bfc1[0].astype(jnp.float32)
    h1 = _gelu_exact(h1)
    h2 = _dot(h1.astype(in_dtype), wfc2[:]) + bfc2[0].astype(jnp.float32)
    out = (y + h2).astype(o_ref.dtype)
    if tokens_major:
        o_ref[...] = out.reshape(n_tokens, TR, C)
    else:
        for t in range(n_tokens):
            o_ref[:, t, :] = out[t * TR:(t + 1) * TR, :]


def _as_row(x, dim, dtype):
    """(dim,) param or None -> (1, dim) operand."""
    if x is None:
        return jnp.zeros((1, dim), dtype)
    return x.reshape(1, dim).astype(dtype)


def _const(shape):
    """BlockSpec for an operand replicated across all grid steps (weights,
    biases): stays VMEM-resident instead of being refetched per step."""
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret",
                                             "block_r", "tokens_major"))
def fused_block(x, params, mask=None, *, num_heads: int, eps: float = 1e-6,
                interpret: bool = False, block_r: int = 0,
                tokens_major: bool = False):
    """Run one pre-LN transformer block on (R, N, C) tokens in one kernel.

    ``params`` is the afft_tpu block pytree: norm1/attn{qkv,proj}/norm2/
    mlp{fc1,fc2} (see models.blocks.block_init); ``mask`` is an additive
    (N, N) attention mask or None. Returns (R, N, C) in x.dtype.

    ``tokens_major=True`` takes/returns (N, R, C) instead: the caller
    transposes ONCE around the whole block stack and the kernel's token
    gather/scatter becomes a free reshape (saves two full-array VMEM
    copies per block).
    """
    if tokens_major:
        N, R, C = x.shape
    else:
        R, N, C = x.shape
    if not block_r:
        block_r = default_block_r(x.dtype, tokens_major)
    head_dim = C // num_heads
    wqkv = params["attn"]["qkv"]["w"]
    wfc1 = params["mlp"]["fc1"]["w"]
    mlp_hidden = wfc1.shape[1]
    assert supported(N, C, num_heads, mlp_hidden), \
        f"fused_block unsupported shape N={N} C={C} H={num_heads}"
    assert interpret or R % block_r == 0, \
        f"fused_block rows R={R} must fill whole {block_r}-row tiles " \
        f"(partial tiles wedge the Mosaic pipeline); use the XLA path"

    dt = x.dtype
    full_mask = jnp.zeros((N, N), jnp.float32) if mask is None \
        else mask.astype(jnp.float32)
    operands = [
        x,
        _as_row(params["norm1"].get("g"), C, dt) if params["norm1"]
        else jnp.ones((1, C), dt),
        _as_row(params["norm1"].get("b"), C, dt),
        wqkv.astype(dt),
        _as_row(params["attn"]["qkv"].get("b"), 3 * C, dt),
        params["attn"]["proj"]["w"].astype(dt),
        _as_row(params["attn"]["proj"].get("b"), C, dt),
        _as_row(params["norm2"].get("g"), C, dt) if params["norm2"]
        else jnp.ones((1, C), dt),
        _as_row(params["norm2"].get("b"), C, dt),
        wfc1.astype(dt),
        _as_row(params["mlp"]["fc1"].get("b"), mlp_hidden, dt),
        params["mlp"]["fc2"]["w"].astype(dt),
        _as_row(params["mlp"]["fc2"].get("b"), C, dt),
        full_mask,
    ]

    grid = (pl.cdiv(R, block_r),)
    flops_mm = 2 * R * N * C * (3 * C + C + 2 * mlp_hidden)
    flops_attn = 2 * 2 * R * N * N * C
    x_spec = pl.BlockSpec((N, block_r, C), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM) if tokens_major else \
        pl.BlockSpec((block_r, N, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    out_shape = (N, R, C) if tokens_major else (R, N, C)
    out = pl.pallas_call(
        functools.partial(_block_kernel, n_tokens=N, num_heads=num_heads,
                          head_dim=head_dim, eps=eps,
                          tokens_major=tokens_major),
        out_shape=jax.ShapeDtypeStruct(out_shape, dt),
        grid=grid,
        in_specs=[
            x_spec,
            _const((1, C)), _const((1, C)),
            _const((C, 3 * C)), _const((1, 3 * C)),
            _const((C, C)), _const((1, C)),
            _const((1, C)), _const((1, C)),
            _const((C, mlp_hidden)), _const((1, mlp_hidden)),
            _const((mlp_hidden, C)), _const((1, C)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops_mm + flops_attn,
            bytes_accessed=2 * R * N * C * dt.itemsize
            + (4 * C * C + 2 * C * mlp_hidden) * dt.itemsize,
            transcendentals=R * N * (num_heads * N + mlp_hidden),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the default scoped-vmem stack limit (16 MB on this toolchain)
            # is too small for the block's live set (q/k/v for all tokens +
            # the MLP hidden); weights + double-buffered x/out tiles live
            # outside this budget
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out
