"""Training-path fused GPT-2 block: custom VJP, hybrid Pallas/XLA backward.

Extends the serving two-kernel layer (ops/pallas_gpt2.py) to training.
Unlike the fuser train block (ops/pallas_block_train.py), the C=2048 layer
cannot keep fp32 weight-grad accumulators in VMEM (the MLP's would be
134 MB), so the backward is HYBRID:

- three Pallas kernels produce the input-side cotangent chains — the ops
  XLA runs badly (LN recompute + LN backward, softmax backward, dropout
  mask regeneration, gelu') — and EXPORT the intermediate cotangents and
  rebuilt activations (dqkv, dproj, attn_out, xn, dh2, dpre1, h1, g)
  in the compute dtype. Neither big forward matmul is re-run: the
  forward stashes its qkv and pre1 products as residuals (round 4;
  the fuser train block does the same);
- XLA then runs the eight dW/db matmuls over those exports, which it
  already executes at near-peak MXU rates.

Dropout (attn_pdrop on softmax weights, resid_pdrop after both
projections; reference HF GPT2Block semantics, models/predictor.py
_block) uses the same PRNG-stream discipline as the fuser train kernel:
every site reseeds prng_seed(seed0, mix(layer, site, tile)) and draws one
fixed-shape bits array, so the backward regenerates identical masks and
draw_masks_gpt2 can replay them for the pure-JAX reference used in tests.

The attention keep-bits layout packs (head, key) into the 128-lane axis:
bit for (b, tq, h, tk) = bits[b*T + tq, h*T + tk] (T=16, H=4 -> 64 of 128
lanes used).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_block import _as_row, _const, _dot, _layernorm
from .pallas_gpt2 import _gelu_new, supported as _supported_serving
from .pallas_block_train import (_bits24, _interpret_params, _keep,
                                 _ln_bwd_input, _ln_stats, _rates_operands,
                                 _seed, _seeds_operand)

SITE_ATTN, SITE_PROJ, SITE_MLP = 0, 1, 3


def default_train_block_b(dtype) -> int:
    # backward kernels hold one 33.5 MB bf16 weight (+ its transpose use)
    # next to fp32 activation tiles; 32 samples (M=512 rows at T=16) fits
    return 32 if dtype == jnp.bfloat16 else 8


def supported(batch, n_tokens, dim, num_heads, mlp_hidden,
              dtype=jnp.bfloat16) -> bool:
    ok = _supported_serving(None, n_tokens, dim, num_heads, mlp_hidden,
                            dtype=dtype)
    ok = ok and num_heads * n_tokens <= 128  # attn keep-bit packing
    if batch is not None:
        ok = ok and batch % default_train_block_b(dtype) == 0
    return ok


def use_fused_gpt2_train(x, num_heads, mlp_hidden, rng) -> bool:
    from .attention import pallas_enabled
    if rng is None or not pallas_enabled():
        return False
    return (x.ndim == 3 and x.dtype == jnp.bfloat16
            and supported(x.shape[0], x.shape[1], x.shape[2], num_heads,
                          mlp_hidden, dtype=x.dtype))


def _attn_keep(bits, thr_ref, inv_ref, tb, n_tokens, h):
    """(TB, T, T) scaled keep-mask for head h from the (M, 128) draw."""
    b3 = bits.reshape(tb, n_tokens, 128)
    sl = b3[:, :, h * n_tokens:(h + 1) * n_tokens]
    return (sl < thr_ref[0]).astype(jnp.float32) * inv_ref[0]


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _attn_half_train_kernel(x_ref, ln1g, ln1b, wqkv, bqkv, wproj, bproj,
                            mask_ref, seeds_ref, thr_ref, inv_ref, y_ref,
                            qkv_ref, *, n_tokens, num_heads, head_dim, eps):
    TB = x_ref.shape[0]
    C = num_heads * head_dim
    M = TB * n_tokens
    scale = float(head_dim) ** -0.5
    in_dtype = x_ref.dtype

    x32 = x_ref[...].reshape(M, C).astype(jnp.float32)
    xn = _layernorm(x32, ln1g, ln1b, eps)
    qkv = (_dot(xn.astype(in_dtype), wqkv[:])
           + bqkv[0].astype(jnp.float32)).astype(in_dtype)
    qkv3 = qkv.reshape(TB, n_tokens, 3 * C)

    _seed(seeds_ref, SITE_ATTN)
    abits = _bits24((M, 128))

    prec = None if in_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    outs = []
    for h in range(num_heads):
        off = h * 3 * head_dim
        q = qkv3[:, :, off:off + head_dim]
        k = qkv3[:, :, off + head_dim:off + 2 * head_dim]
        v = qkv3[:, :, off + 2 * head_dim:off + 3 * head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec) * scale
        s = s + mask_ref[:]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pd = p * _attn_keep(abits, thr_ref, inv_ref, TB, n_tokens, h)
        outs.append(jax.lax.dot_general(
            pd.astype(in_dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec))
    attn_out = jnp.concatenate(outs, axis=-1).reshape(M, C)
    proj = _dot(attn_out.astype(in_dtype), wproj[:]) + \
        bproj[0].astype(jnp.float32)
    _seed(seeds_ref, SITE_PROJ)
    mres = _keep(_bits24((M, C)), thr_ref, 1) * inv_ref[1]
    y = x32 + proj * mres
    y_ref[...] = y.astype(y_ref.dtype).reshape(TB, n_tokens, C)
    # backward residual: the qkv product exactly as cast above, so the
    # backward's attention rebuild stays bit-identical without re-running
    # the (M, C) x (C, 3C) matmul
    qkv_ref[...] = qkv


def _mlp_half_train_kernel(y_ref, ln2g, ln2b, wfc1, bfc1, wfc2, bfc2,
                           seeds_ref, thr_ref, inv_ref, o_ref, pre1_ref, *,
                           n_tokens, eps):
    TB = y_ref.shape[0]
    C = y_ref.shape[2]
    M = TB * n_tokens
    in_dtype = y_ref.dtype
    y32 = y_ref[...].reshape(M, C).astype(jnp.float32)
    yn = _layernorm(y32, ln2g, ln2b, eps)
    pre1 = _dot(yn.astype(in_dtype), wfc1[:]) + bfc1[0].astype(jnp.float32)
    h1 = _gelu_new(pre1).astype(in_dtype)
    h2 = _dot(h1, wfc2[:]) + bfc2[0].astype(jnp.float32)
    _seed(seeds_ref, SITE_MLP)
    mres = _keep(_bits24((M, C)), thr_ref, 1) * inv_ref[1]
    out = y32 + h2 * mres
    o_ref[...] = out.astype(o_ref.dtype).reshape(TB, n_tokens, C)
    pre1_ref[...] = pre1.astype(pre1_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _gelu_new_grad(x32):
    # d/dx [0.5 x (1 + tanh(u))], u = c (x + 0.044715 x^3)
    import math
    c = math.sqrt(2.0 / math.pi)
    u = c * (x32 + 0.044715 * x32 * x32 * x32)
    t = jnp.tanh(u)
    du = c * (1.0 + 3 * 0.044715 * x32 * x32)
    return 0.5 * (1.0 + t) + 0.5 * x32 * (1.0 - t * t) * du


def _mlp_bwd1_kernel(do_ref, pre1_ref, wfc2, seeds_ref, thr_ref, inv_ref,
                     dh2_ref, dpre1_ref, h1_ref, *, n_tokens):
    """W2-resident half: dout -> dh2 (masked), h1, dpre1."""
    TB = do_ref.shape[0]
    C = do_ref.shape[2]
    M = TB * n_tokens
    in_dtype = do_ref.dtype
    do32 = do_ref[...].reshape(M, C).astype(jnp.float32)
    pre1 = pre1_ref[...].astype(jnp.float32)
    _seed(seeds_ref, SITE_MLP)
    mres = _keep(_bits24((M, C)), thr_ref, 1) * inv_ref[1]
    dh2 = (do32 * mres).astype(in_dtype)
    h1 = _gelu_new(pre1)
    dh1 = jax.lax.dot_general(
        dh2, wfc2[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpre1 = dh1 * _gelu_new_grad(pre1)
    dh2_ref[...] = dh2
    dpre1_ref[...] = dpre1.astype(dpre1_ref.dtype)
    h1_ref[...] = h1.astype(h1_ref.dtype)


def _mlp_bwd2_kernel(y_ref, do_ref, dpre1_ref, ln2g, ln2b, wfc1,
                     dy_ref, g_ref, dg2_ref, db2_ref, *, n_tokens, eps):
    """W1-resident half: (y, dout, dpre1) -> dy, g (for XLA dW1), LN2 grads."""
    TB = y_ref.shape[0]
    C = y_ref.shape[2]
    M = TB * n_tokens

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    y32 = y_ref[...].reshape(M, C).astype(jnp.float32)
    do32 = do_ref[...].reshape(M, C).astype(jnp.float32)
    xhat2, rstd2 = _ln_stats(y32, eps)
    g2_32 = ln2g[0].astype(jnp.float32)
    g = xhat2 * g2_32 + ln2b[0].astype(jnp.float32)
    dg = jax.lax.dot_general(
        dpre1_ref[...], wfc1[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dg2_ref[...] += jnp.sum(dg * xhat2, axis=0, keepdims=True)
    db2_ref[...] += jnp.sum(dg, axis=0, keepdims=True)
    dy = do32 + _ln_bwd_input(dg, xhat2, rstd2, g2_32)
    dy_ref[...] = dy.astype(dy_ref.dtype).reshape(TB, n_tokens, C)
    g_ref[...] = g.astype(g_ref.dtype)


def _attn_bwd_kernel(x_ref, dy_ref, qkv_stash_ref, ln1g, ln1b, wqkv, wproj,
                     mask_ref, seeds_ref, thr_ref, inv_ref,
                     dx_ref, dqkv_ref, dproj_ref, ao_ref, xn_ref,
                     dg1_ref, db1_ref, *, n_tokens, num_heads, head_dim,
                     eps):
    """(x, dy, stashed qkv) -> dx + exports (dqkv, dproj, attn_out, xn)
    for XLA dW. wqkv is only read for dxn = dqkv @ Wqkv^T."""
    TB = x_ref.shape[0]
    C = num_heads * head_dim
    M = TB * n_tokens
    scale = float(head_dim) ** -0.5
    in_dtype = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    x32 = x_ref[...].reshape(M, C).astype(jnp.float32)
    dy32 = dy_ref[...].reshape(M, C).astype(jnp.float32)

    # rebuild forward attention state (identical ops + regenerated masks;
    # the qkv matmul product comes stashed from the forward, bit-identical)
    xhat1, rstd1 = _ln_stats(x32, eps)
    g1_32 = ln1g[0].astype(jnp.float32)
    xn = xhat1 * g1_32 + ln1b[0].astype(jnp.float32)
    xn_c = xn.astype(in_dtype)
    qkv3 = qkv_stash_ref[...].reshape(TB, n_tokens, 3 * C)
    _seed(seeds_ref, SITE_ATTN)
    abits = _bits24((M, 128))
    _seed(seeds_ref, SITE_PROJ)
    mres = _keep(_bits24((M, C)), thr_ref, 1) * inv_ref[1]

    prec = None if in_dtype == jnp.float32 else jax.lax.Precision.DEFAULT

    def bdot(a, b, dims):
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    heads = []
    for h in range(num_heads):
        off = h * 3 * head_dim
        q = qkv3[:, :, off:off + head_dim]
        k = qkv3[:, :, off + head_dim:off + 2 * head_dim]
        v = qkv3[:, :, off + 2 * head_dim:off + 3 * head_dim]
        s = bdot(q, k, (((2,), (2,)), ((0,), (0,)))) * scale + mask_ref[:]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        keep = _attn_keep(abits, thr_ref, inv_ref, TB, n_tokens, h)
        pd = p * keep
        o = bdot(pd.astype(in_dtype), v, (((2,), (1,)), ((0,), (0,))))
        heads.append((q, k, v, p, keep, pd, o))
    attn_out = jnp.concatenate([hd[6] for hd in heads], axis=-1) \
        .reshape(M, C).astype(in_dtype)

    # backward
    dproj = (dy32 * mres).astype(in_dtype)              # (M, C)
    dattn = jax.lax.dot_general(
        dproj, wproj[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (M, C) fp32
    dattn3 = dattn.reshape(TB, n_tokens, C)

    dqkv_parts = []
    for h, (q, k, v, p, keep, pd, _o) in enumerate(heads):
        dao = dattn3[:, :, h * head_dim:(h + 1) * head_dim] \
            .astype(in_dtype)                           # (TB, T, hd)
        dv = bdot(pd.astype(in_dtype), dao, (((1,), (1,)), ((0,), (0,))))
        dpd = bdot(dao, v, (((2,), (2,)), ((0,), (0,))))  # (TB, Tq, Tk)
        dp = dpd * keep
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_c = ds.astype(in_dtype)
        dq = bdot(ds_c, k, (((2,), (1,)), ((0,), (0,)))) * scale
        dk = bdot(ds_c, q, (((1,), (1,)), ((0,), (0,)))) * scale
        dqkv_parts.append((dq, dk, dv))
    # heads-major packed dqkv: [h: (dq, dk, dv)]
    dqkv = jnp.concatenate(
        [jnp.concatenate(part, axis=-1) for part in dqkv_parts],
        axis=-1).reshape(M, 3 * C).astype(in_dtype)

    dxn = jax.lax.dot_general(
        dqkv, wqkv[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dg1_ref[...] += jnp.sum(dxn * xhat1, axis=0, keepdims=True)
    db1_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
    dx = dy32 + _ln_bwd_input(dxn, xhat1, rstd1, g1_32)

    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(TB, n_tokens, C)
    dqkv_ref[...] = dqkv
    dproj_ref[...] = dproj
    ao_ref[...] = attn_out
    xn_ref[...] = xn_c


def _masks_gpt2_kernel(seeds_ref, thr_ref, inv_ref, attn_ref, proj_ref,
                       mlp_ref, *, n_tokens):
    M = proj_ref.shape[1]
    _seed(seeds_ref, SITE_ATTN)
    attn_ref[0] = _keep(_bits24((M, 128)), thr_ref, 0) * inv_ref[0]
    _seed(seeds_ref, SITE_PROJ)
    proj_ref[0] = _keep(_bits24((M, proj_ref.shape[2])), thr_ref, 1) \
        * inv_ref[1]
    _seed(seeds_ref, SITE_MLP)
    mlp_ref[0] = _keep(_bits24((M, mlp_ref.shape[2])), thr_ref, 1) \
        * inv_ref[1]


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------

def _vmem(n=110 * 1024 * 1024):
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                vmem_limit_bytes=n)


def _specs(TB, T, C):
    return pl.BlockSpec((TB, T, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(TB, T, W):
    """(M_total, W) arrays tiled by grid step: block (TB*T, W)."""
    return pl.BlockSpec((TB * T, W), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _acc_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _smem():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_calls(x, flat, mask, seeds_op, thr, inv, *, num_heads, eps,
               block_b, interpret):
    B, T, C = x.shape
    dt = x.dtype
    (ln1g, ln1b, wqkv, bqkv, wproj, bproj,
     ln2g, ln2b, wfc1, bfc1, wfc2, bfc2) = flat
    Hmlp = wfc1.shape[1]
    grid = (pl.cdiv(B, block_b),)
    xs = _specs(block_b, T, C)
    y, qkv = pl.pallas_call(
        functools.partial(_attn_half_train_kernel, n_tokens=T,
                          num_heads=num_heads, head_dim=C // num_heads,
                          eps=eps),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), dt),
                   jax.ShapeDtypeStruct((B * T, 3 * C), dt)),
        grid=grid,
        in_specs=[xs, _const((1, C)), _const((1, C)),
                  _const((C, 3 * C)), _const((1, 3 * C)),
                  _const((C, C)), _const((1, C)), _const((T, T)),
                  _smem(), _smem(), _smem()],
        out_specs=(xs, _row_spec(block_b, T, 3 * C)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * C * 4 * C + 4 * B * T * T * C,
            bytes_accessed=(B * T * 5 * C + 4 * C * C) * dt.itemsize,
            transcendentals=B * num_heads * T * T,
        ),
        compiler_params=_vmem(),
        interpret=interpret,
    )(x, ln1g, ln1b, wqkv, bqkv, wproj, bproj, mask, seeds_op, thr, inv)
    out, pre1 = pl.pallas_call(
        functools.partial(_mlp_half_train_kernel, n_tokens=T, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), dt),
                   jax.ShapeDtypeStruct((B * T, Hmlp), dt)),
        grid=grid,
        in_specs=[xs, _const((1, C)), _const((1, C)),
                  _const((C, Hmlp)), _const((1, Hmlp)),
                  _const((Hmlp, C)), _const((1, C)),
                  _smem(), _smem(), _smem()],
        out_specs=(xs, _row_spec(block_b, T, Hmlp)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * C * Hmlp,
            bytes_accessed=(B * T * (2 * C + Hmlp)
                            + 2 * C * Hmlp) * dt.itemsize,
            transcendentals=B * T * Hmlp,
        ),
        compiler_params=_vmem(),
        interpret=interpret,
    )(y, ln2g, ln2b, wfc1, bfc1, wfc2, bfc2, seeds_op, thr, inv)
    return y, qkv, out, pre1


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _core(x, flat, mask, seeds_op, rates, num_heads, eps, block_b,
          interpret):
    thr, inv = rates
    _y, _qkv, out, _pre1 = _fwd_calls(x, flat, mask, seeds_op, thr, inv,
                                      num_heads=num_heads, eps=eps,
                                      block_b=block_b, interpret=interpret)
    return out


def _core_fwd(x, flat, mask, seeds_op, rates, num_heads, eps, block_b,
              interpret):
    thr, inv = rates
    y, qkv, out, pre1 = _fwd_calls(x, flat, mask, seeds_op, thr, inv,
                                   num_heads=num_heads, eps=eps,
                                   block_b=block_b, interpret=interpret)
    return out, (x, y, qkv, pre1, flat, mask, seeds_op, rates)


def _core_bwd(num_heads, eps, block_b, interpret, res, dout):
    x, y, qkv_stash, pre1, flat, mask, seeds_op, (thr, inv) = res
    B, T, C = x.shape
    dt = x.dtype
    (ln1g, ln1b, wqkv, bqkv, wproj, bproj,
     ln2g, ln2b, wfc1, bfc1, wfc2, bfc2) = flat
    Hmlp = wfc1.shape[1]
    grid = (pl.cdiv(B, block_b),)
    xs = _specs(block_b, T, C)
    f32 = jnp.float32

    dh2, dpre1, h1 = pl.pallas_call(
        functools.partial(_mlp_bwd1_kernel, n_tokens=T),
        out_shape=(jax.ShapeDtypeStruct((B * T, C), dt),
                   jax.ShapeDtypeStruct((B * T, Hmlp), dt),
                   jax.ShapeDtypeStruct((B * T, Hmlp), dt)),
        grid=grid,
        in_specs=[xs, _row_spec(block_b, T, Hmlp), _const((Hmlp, C)),
                  _smem(), _smem(), _smem()],
        out_specs=(_row_spec(block_b, T, C), _row_spec(block_b, T, Hmlp),
                   _row_spec(block_b, T, Hmlp)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * C * Hmlp,
            bytes_accessed=(B * T * (2 * C + 3 * Hmlp)
                            + C * Hmlp) * dt.itemsize,
            transcendentals=B * T * Hmlp,
        ),
        compiler_params=_vmem(),
        interpret=interpret,
    )(dout, pre1, wfc2, seeds_op, thr, inv)

    dy, g, dln2g, dln2b = pl.pallas_call(
        functools.partial(_mlp_bwd2_kernel, n_tokens=T, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), dt),
                   jax.ShapeDtypeStruct((B * T, C), dt),
                   jax.ShapeDtypeStruct((1, C), f32),
                   jax.ShapeDtypeStruct((1, C), f32)),
        grid=grid,
        in_specs=[xs, xs, _row_spec(block_b, T, Hmlp),
                  _const((1, C)), _const((1, C)), _const((C, Hmlp))],
        out_specs=(xs, _row_spec(block_b, T, C),
                   _acc_spec((1, C)), _acc_spec((1, C))),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * C * Hmlp,
            bytes_accessed=(B * T * (4 * C + Hmlp)
                            + C * Hmlp) * dt.itemsize,
            transcendentals=0,
        ),
        compiler_params=_vmem(),
        interpret=interpret,
    )(y, dout, dpre1, ln2g, ln2b, wfc1)

    dx, dqkv, dproj, attn_out, xn, dln1g, dln1b = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, n_tokens=T,
                          num_heads=num_heads, head_dim=C // num_heads,
                          eps=eps),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), dt),
                   jax.ShapeDtypeStruct((B * T, 3 * C), dt),
                   jax.ShapeDtypeStruct((B * T, C), dt),
                   jax.ShapeDtypeStruct((B * T, C), dt),
                   jax.ShapeDtypeStruct((B * T, C), dt),
                   jax.ShapeDtypeStruct((1, C), f32),
                   jax.ShapeDtypeStruct((1, C), f32)),
        grid=grid,
        in_specs=[xs, xs, _row_spec(block_b, T, 3 * C),
                  _const((1, C)), _const((1, C)),
                  _const((C, 3 * C)), _const((C, C)),
                  _const((T, T)), _smem(), _smem(), _smem()],
        out_specs=(xs, _row_spec(block_b, T, 3 * C),
                   _row_spec(block_b, T, C), _row_spec(block_b, T, C),
                   _row_spec(block_b, T, C),
                   _acc_spec((1, C)), _acc_spec((1, C))),
        cost_estimate=pl.CostEstimate(
            # dproj + dxn matmuls (8*M*C^2) + ~3x-forward attention bwd
            flops=8 * B * T * C * C + 12 * B * T * T * C,
            bytes_accessed=(B * T * 12 * C + 4 * C * C) * dt.itemsize,
            transcendentals=B * num_heads * T * T,
        ),
        compiler_params=_vmem(),
        interpret=interpret,
    )(x, dy, qkv_stash, ln1g, ln1b, wqkv, wproj, mask, seeds_op, thr, inv)

    # dW/db matmuls on the exports — XLA runs these at near-peak MXU
    def mm_t(a, b):  # a^T @ b with fp32 accumulation
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def like(v, ref):
        return v.reshape(ref.shape).astype(ref.dtype)

    dwqkv = mm_t(xn, dqkv)
    dbqkv = jnp.sum(dqkv.astype(f32), axis=0, keepdims=True)
    dwproj = mm_t(attn_out, dproj)
    dbproj = jnp.sum(dproj.astype(f32), axis=0, keepdims=True)
    dw1 = mm_t(g, dpre1)
    db1 = jnp.sum(dpre1.astype(f32), axis=0, keepdims=True)
    dw2 = mm_t(h1, dh2)
    db2 = jnp.sum(dh2.astype(f32), axis=0, keepdims=True)

    dflat = (like(dln1g, flat[0]), like(dln1b, flat[1]),
             like(dwqkv, flat[2]), like(dbqkv, flat[3]),
             like(dwproj, flat[4]), like(dbproj, flat[5]),
             like(dln2g, flat[6]), like(dln2b, flat[7]),
             like(dw1, flat[8]), like(db1, flat[9]),
             like(dw2, flat[10]), like(db2, flat[11]))
    return dx, dflat, None, None, None


_core.defvjp(_core_fwd, _core_bwd)


def _flat_params(p, C, Hmlp, dt):
    return (
        _as_row(p["ln_1"]["g"], C, dt), _as_row(p["ln_1"]["b"], C, dt),
        p["c_attn"]["w"].astype(dt), _as_row(p["c_attn"]["b"], 3 * C, dt),
        p["c_proj"]["w"].astype(dt), _as_row(p["c_proj"]["b"], C, dt),
        _as_row(p["ln_2"]["g"], C, dt), _as_row(p["ln_2"]["b"], C, dt),
        p["c_fc"]["w"].astype(dt), _as_row(p["c_fc"]["b"], Hmlp, dt),
        p["mlp_c_proj"]["w"].astype(dt),
        _as_row(p["mlp_c_proj"]["b"], C, dt),
    )


def fused_gpt2_block_train(x, params, mask, seeds, *, num_heads,
                           layer_idx=0, attn_rate=0.0, resid_rate=0.0,
                           eps=1e-5, block_b=0, interpret=False):
    """One GPT-2 pre-LN block in training mode with in-kernel dropout.

    x: (B, T, C); ``params`` the predictor block pytree (heads-major
    c_attn); ``seeds``: (2,) int32. Differentiable in x and params.
    """
    B, T, C = x.shape
    dt = x.dtype
    if not block_b:
        block_b = default_train_block_b(dt)
    Hmlp = params["c_fc"]["w"].shape[1]
    assert supported(None, T, C, num_heads, Hmlp,
                     jnp.bfloat16 if interpret else dt), \
        f"fused_gpt2_block_train unsupported B={B} T={T} C={C} {dt}"
    assert interpret or B % block_b == 0, \
        f"batch {B} must fill {block_b}-sample tiles"
    interp = _interpret_params(interpret)
    flat = _flat_params(params, C, Hmlp, dt)
    seeds_op = _seeds_operand(seeds, layer_idx)
    rates = _rates_operands(attn_rate, resid_rate, 0.0)
    return _core(x, flat, mask.astype(jnp.float32), seeds_op, rates,
                 num_heads, eps, block_b, interp)


def draw_masks_gpt2(B, T, C, Hmlp, seeds, layer_idx, attn_rate, resid_rate,
                    *, block_b, interpret=False):
    """Replay the three PRNG streams; per-tile arrays stacked on axis 0:
    (G, M, 128) attn keep-bits, (G, M, C) proj resid, (G, M, Hmlp->C) mlp
    resid (mlp mask is (M, C))."""
    thr, inv = _rates_operands(attn_rate, resid_rate, 0.0)
    seeds_op = _seeds_operand(seeds, layer_idx)
    interp = _interpret_params(interpret)
    G = pl.cdiv(B, block_b)
    M = block_b * T
    f32 = jnp.float32

    def spec(rows, cols):
        return pl.BlockSpec((1, rows, cols), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_masks_gpt2_kernel, n_tokens=T),
        out_shape=(jax.ShapeDtypeStruct((G, M, 128), f32),
                   jax.ShapeDtypeStruct((G, M, C), f32),
                   jax.ShapeDtypeStruct((G, M, C), f32)),
        grid=(G,),
        in_specs=[_smem()] * 3,
        out_specs=(spec(M, 128), spec(M, C), spec(M, C)),
        compiler_params=_vmem(),
        interpret=interp,
    )(seeds_op, thr, inv)


def gpt2_block_reference_with_masks(x, params, mask, masks, *, num_heads,
                                    eps=1e-5):
    """Pure-JAX oracle of the train block given replayed masks
    (single-tile: B == block_b)."""
    B, T, C = x.shape
    H = num_heads
    hd = C // H
    mattn, mproj, mmlp = (m[0] for m in masks)
    f32 = jnp.float32
    dt = x.dtype
    M = B * T
    x32 = x.reshape(M, C).astype(f32)

    def ln(z, p):
        mu = z.mean(-1, keepdims=True)
        var = ((z - mu) ** 2).mean(-1, keepdims=True)
        return ((z - mu) * jax.lax.rsqrt(var + eps)) * p["g"].astype(f32) \
            + p["b"].astype(f32)

    xn = ln(x32, params["ln_1"])
    qkv = (jnp.dot(xn.astype(dt), params["c_attn"]["w"].astype(dt),
                   preferred_element_type=f32)
           + params["c_attn"]["b"].astype(f32)).astype(dt)
    qkv3 = qkv.reshape(B, T, 3 * C)
    scale = float(hd) ** -0.5
    outs = []
    for h in range(H):
        off = h * 3 * hd
        q = qkv3[:, :, off:off + hd]
        k = qkv3[:, :, off + hd:off + 2 * hd]
        v = qkv3[:, :, off + 2 * hd:off + 3 * hd]
        s = jnp.einsum("bqd,bkd->bqk", q.astype(f32), k.astype(f32)) \
            * scale + mask.astype(f32)
        p = jax.nn.softmax(s, axis=-1)
        keep = mattn.reshape(B, T, 128)[:, :, h * T:(h + 1) * T]
        pd = p * keep
        outs.append(jnp.einsum("bqk,bkd->bqd", pd,
                               v.astype(f32)))
    attn_out = jnp.concatenate(outs, axis=-1).reshape(M, C)
    proj = jnp.dot(attn_out.astype(dt), params["c_proj"]["w"].astype(dt),
                   preferred_element_type=f32) \
        + params["c_proj"]["b"].astype(f32)
    y = x32 + proj * mproj
    gz = ln(y, params["ln_2"])
    pre1 = jnp.dot(gz.astype(dt), params["c_fc"]["w"].astype(dt),
                   preferred_element_type=f32) \
        + params["c_fc"]["b"].astype(f32)
    h1 = _gelu_new(pre1).astype(dt)
    h2 = jnp.dot(h1, params["mlp_c_proj"]["w"].astype(dt),
                 preferred_element_type=f32) \
        + params["mlp_c_proj"]["b"].astype(f32)
    out = y + h2 * mmlp
    return out.astype(dt).reshape(B, T, C)
