"""Training-path fully-fused fuser block: custom VJP + in-kernel PRNG dropout.

The serving kernel (ops/pallas_block.py) is inference-only: flagship configs
train with dropout 0.1 at every site (expts/01: embd/drop/attn_drop/
drop_path all 0.1), so training fell back to the XLA op-by-op path at
~0.46 MFU vs 0.82 serving (VERDICT r2 weak #1). This module closes that gap:

- ``_fwd_kernel``: the whole pre-LN block — LN1 → qkv → n-token attention
  (+attn-weight dropout) → proj (+dropout, +drop-path) → residual → LN2 →
  MLP(GELU) (+dropout, +drop-path) → residual — in ONE kernel, with every
  dropout mask drawn by the on-core PRNG (pltpu.prng_*). Besides the block
  output it emits the backward residuals: ``y`` (the mid-block residual)
  plus the two big matmul products ``qkv`` and ``pre1`` in the compute
  dtype. Stashing those trades ~75 GFLOP/block of backward recompute (the
  qkv and fc1 matmuls, 16% of the block's total) for ~73 MB/block of HBM
  traffic whose DMAs hide under the matmuls — measured faster at flagship
  shapes (round 4). ``qkv`` is stashed exactly as the forward cast it, so
  the backward stays bit-identical to the recompute version; ``pre1`` is
  fp32 in-kernel and stashed in the compute dtype, so at bf16 only the
  gelu-grad/h1 terms see one extra rounding (grads, never primals).
- ``_bwd_mlp_kernel`` / ``_bwd_attn_kernel``: rebuild the cheap elementwise
  state (LayerNorms) from (y, x) in VMEM, reuse the stashed qkv/pre1,
  regenerate the identical dropout masks from the same (seed, block, site,
  grid-step) PRNG streams, and produce input and parameter gradients.
  Parameter grads accumulate across grid steps in fp32 VMEM (output blocks
  pinned to index 0).

Dropout semantics match afft_tpu.models.layers exactly (keep-prob masks,
1/keep scaling; drop-path per B*T row); behavioural reference for the block
compute in training mode: reference models/transformerblock.py:118-135.

Masks regenerate identically because every site reseeds
``prng_seed(seed0, seed1, block_idx, site, pid)`` and draws one bits array
of a fixed shape; ``draw_masks`` reuses the same streams so tests can
replay the exact masks through a pure-JAX reference block and check the
custom VJP against ``jax.grad`` of it.

Rates are baked trace-time into small SMEM operands (24-bit keep
thresholds + 1/keep scales), so one compiled kernel serves every block of
every fuser stack regardless of its drop-path schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_block import _as_row, _const, _dot, _gelu_exact, _layernorm, _erf
from .pallas_block import supported as _supported_shape

# PRNG sites (reseed before each draw; fixed draw shape per site)
SITE_ATTN, SITE_PROJ, SITE_DP1, SITE_MLP, SITE_DP2 = range(5)

_TWO24 = 1 << 24


def _interpret_params(interpret):
    """True -> the TPU interpreter (the HLO interpreter has no PRNG
    lowering); pass an InterpretParams through unchanged."""
    if interpret is True:
        return pltpu.InterpretParams()
    return interpret


def default_train_block_r(dtype) -> int:
    # smaller than serving tiles: the backward kernels hold fp32 weight-grad
    # accumulators (up to 2*C*4C) on top of the weights and activations.
    # measured on hardware at C=1024/N=5: bf16 128 compiles within the
    # 100MB scoped-vmem budget and is ~3% faster than 64 (21.9 vs 22.6 ms
    # on the 6-block flagship stack); 256 would put the MLP-half backward
    # (~48MB weights+grads + ~90MB activations) over the limit
    return 128 if dtype == jnp.bfloat16 else 32


def supported(n_tokens: int, dim: int, num_heads: int, mlp_hidden: int,
              n_rows: int = None, dtype=jnp.bfloat16) -> bool:
    ok = _supported_shape(n_tokens, dim, num_heads, mlp_hidden)
    if n_rows is not None:
        ok = ok and n_rows % default_train_block_r(dtype) == 0
    return ok


def use_fused_train_block(x, dim, num_heads, mlp_hidden, rng) -> bool:
    from .attention import pallas_enabled
    if rng is None or not pallas_enabled():
        return False
    return (x.ndim == 3 and x.dtype in (jnp.bfloat16, jnp.float32)
            and supported(x.shape[1], dim, num_heads, mlp_hidden,
                          n_rows=x.shape[0], dtype=x.dtype))


def _attn_bits_width(num_heads: int, n_tokens: int) -> int:
    need = num_heads * n_tokens * n_tokens
    return ((need + 127) // 128) * 128


def _bits24(shape):
    """24-bit uniform ints in [0, 2^24) as int32 (unsigned-compare-safe)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    shifted = jax.lax.shift_right_logical(
        bits, jnp.asarray(8, jnp.uint32))
    return pltpu.bitcast(shifted, jnp.int32)


def _seed(seeds_ref, site):
    # Mosaic accepts at most 2 seed words: fold (block, site, tile) into
    # the second one injectively — (block*8 + site) << 16 | tile, for
    # tile < 2^16 and block < 2^12 (int32 wraparound is fine beyond)
    mixed = seeds_ref[1] + (
        (seeds_ref[2] * 8 + site) * 65536
        + seeds_ref[3] + pl.program_id(0))
    pltpu.prng_seed(seeds_ref[0], mixed)


def _keep(bits, thr_ref, site):
    """Boolean keep-mask as fp32 0/1 from 24-bit uniforms."""
    return (bits < thr_ref[site]).astype(jnp.float32)


def _dp_row_mask(seeds_ref, thr_ref, inv_ref, site, tr, n_tokens):
    """Per-(B*T)-row drop-path multiplier, tiled across tokens-major rows:
    (N*TR, 1) fp32 in {0, 1/keep}."""
    _seed(seeds_ref, site)
    bits = _bits24((tr, 128))
    m = _keep(bits[:, :1], thr_ref, 2) * inv_ref[2]
    return jnp.concatenate([m] * n_tokens, axis=0)


def _gelu_grad(x32):
    # d/dx [0.5 x (1 + erf(x/sqrt(2)))]
    c = 0.3989422804014327  # 1/sqrt(2*pi)
    return (0.5 * (1.0 + _erf(x32 * (2.0 ** -0.5)))
            + x32 * c * jnp.exp(-0.5 * x32 * x32))


def _ln_stats(x32, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * rstd
    return xhat, rstd


def _ln_bwd_input(dout, xhat, rstd, gamma32):
    """dx of LayerNorm given upstream dout at the LN output."""
    dxhat = dout * gamma32
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return rstd * (dxhat - m1 - xhat * m2)


def _attention_fwd(q, k, v, mask_ref, abits, thr_ref, inv_ref, *,
                   n_tokens, num_heads, head_dim):
    """n-token attention with attn-weight dropout; returns per-query-token
    (TR, C) fp32 outputs. q/k/v: lists of (TR, C) in compute dtype."""
    scale = float(head_dim) ** -0.5
    outs = []
    for tq in range(n_tokens):
        scores = []
        for tk in range(n_tokens):
            prod = q[tq].astype(jnp.float32) * k[tk].astype(jnp.float32)
            scores.append([
                jnp.sum(prod[:, h * head_dim:(h + 1) * head_dim],
                        axis=-1, keepdims=True) * scale + mask_ref[tq, tk]
                for h in range(num_heads)])
        out_heads = []
        for h in range(num_heads):
            s_h = [scores[tk][h] for tk in range(n_tokens)]
            m = functools.reduce(jnp.maximum, s_h)
            e_h = [jnp.exp(s - m) for s in s_h]
            denom = functools.reduce(jnp.add, e_h)
            acc = None
            for tk in range(n_tokens):
                p = e_h[tk] / denom
                col = (tq * n_tokens + tk) * num_heads + h
                keep = _keep(abits[:, col:col + 1], thr_ref, 0) * inv_ref[0]
                pd = p * keep
                contrib = pd * v[tk][:, h * head_dim:(h + 1) * head_dim] \
                    .astype(jnp.float32)
                acc = contrib if acc is None else acc + contrib
            out_heads.append(acc)
        outs.append(jnp.concatenate(out_heads, axis=-1))
    return outs


def _fwd_kernel(x_ref, ln1g, ln1b, wqkv, bqkv, wproj, bproj,
                ln2g, ln2b, wfc1, bfc1, wfc2, bfc2, mask_ref, seeds_ref,
                thr_ref, inv_ref, o_ref, y_ref, qkv_ref, pre1_ref, *,
                n_tokens, num_heads, head_dim, eps):
    """Tokens-major (N, TR, C) tile through the whole training block."""
    C = num_heads * head_dim
    TR = x_ref.shape[1]
    M = n_tokens * TR
    in_dtype = x_ref.dtype

    x_all = x_ref[...].reshape(M, C).astype(jnp.float32)
    xhat1, _ = _ln_stats(x_all, eps)
    xn = xhat1 * ln1g[0].astype(jnp.float32) + ln1b[0].astype(jnp.float32)
    qkv = (_dot(xn.astype(in_dtype), wqkv[:])
           + bqkv[0].astype(jnp.float32)).astype(in_dtype)
    q = [qkv[t * TR:(t + 1) * TR, :C] for t in range(n_tokens)]
    k = [qkv[t * TR:(t + 1) * TR, C:2 * C] for t in range(n_tokens)]
    v = [qkv[t * TR:(t + 1) * TR, 2 * C:] for t in range(n_tokens)]

    _seed(seeds_ref, SITE_ATTN)
    abits = _bits24((TR, _attn_bits_width(num_heads, n_tokens)))
    attn = _attention_fwd(q, k, v, mask_ref, abits, thr_ref, inv_ref,
                          n_tokens=n_tokens, num_heads=num_heads,
                          head_dim=head_dim)
    attn_all = jnp.concatenate(attn, axis=0)  # (M, C) fp32

    proj = _dot(attn_all.astype(in_dtype), wproj[:]) + \
        bproj[0].astype(jnp.float32)
    _seed(seeds_ref, SITE_PROJ)
    mproj = _keep(_bits24((M, C)), thr_ref, 1) * inv_ref[1]
    dp1 = _dp_row_mask(seeds_ref, thr_ref, inv_ref, SITE_DP1, TR, n_tokens)
    y = x_all + dp1 * (proj * mproj)

    xhat2, _ = _ln_stats(y, eps)
    g = xhat2 * ln2g[0].astype(jnp.float32) + ln2b[0].astype(jnp.float32)
    pre1 = _dot(g.astype(in_dtype), wfc1[:]) + bfc1[0].astype(jnp.float32)
    h1 = _gelu_exact(pre1)
    h2 = _dot(h1.astype(in_dtype), wfc2[:]) + bfc2[0].astype(jnp.float32)
    _seed(seeds_ref, SITE_MLP)
    mmlp = _keep(_bits24((M, C)), thr_ref, 1) * inv_ref[1]
    dp2 = _dp_row_mask(seeds_ref, thr_ref, inv_ref, SITE_DP2, TR, n_tokens)
    out = y + dp2 * (h2 * mmlp)

    o_ref[...] = out.astype(o_ref.dtype).reshape(n_tokens, TR, C)
    y_ref[...] = y.astype(y_ref.dtype).reshape(n_tokens, TR, C)
    # backward residuals: qkv exactly as cast above (bit-identical replay);
    # pre1 rounded to the compute dtype (backward-only precision)
    qkv_ref[...] = qkv.reshape(n_tokens, TR, 3 * C)
    pre1_ref[...] = pre1.astype(pre1_ref.dtype).reshape(
        n_tokens, TR, pre1.shape[-1])


def _bwd_mlp_kernel(y_ref, do_ref, pre1_ref, ln2g, ln2b, wfc1, wfc2,
                    seeds_ref, thr_ref, inv_ref,
                    dy_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dg2_ref, db2ln_ref, *,
                    n_tokens, num_heads, head_dim, eps):
    """MLP-half backward: (y, dout, stashed pre1) -> dy + {fc1, fc2, ln2}
    grads. wfc1 is only read for dg = dpre1 @ W1^T."""
    C = num_heads * head_dim
    TR = y_ref.shape[1]
    M = n_tokens * TR
    in_dtype = y_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        db2ln_ref[...] = jnp.zeros_like(db2ln_ref)

    y_all = y_ref[...].reshape(M, C).astype(jnp.float32)
    do_all = do_ref[...].reshape(M, C).astype(jnp.float32)

    # rebuild the elementwise MLP-half state; the fc1 matmul product comes
    # stashed from the forward
    xhat2, rstd2 = _ln_stats(y_all, eps)
    g2_32 = ln2g[0].astype(jnp.float32)
    g = xhat2 * g2_32 + ln2b[0].astype(jnp.float32)
    g_c = g.astype(in_dtype)
    pre1 = pre1_ref[...].reshape(M, -1).astype(jnp.float32)
    h1 = _gelu_exact(pre1).astype(in_dtype)

    # regenerate masks (same streams as _fwd_kernel)
    _seed(seeds_ref, SITE_MLP)
    mmlp = _keep(_bits24((M, C)), thr_ref, 1) * inv_ref[1]
    dp2 = _dp_row_mask(seeds_ref, thr_ref, inv_ref, SITE_DP2, TR, n_tokens)

    dh2 = (do_all * dp2 * mmlp).astype(in_dtype)  # (M, C)
    # dW2 = h1^T @ dh2 ; dh1 = dh2 @ W2^T
    dw2_ref[...] += jax.lax.dot_general(
        h1, dh2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dh2.astype(jnp.float32), axis=0, keepdims=True)
    dh1 = jax.lax.dot_general(
        dh2, wfc2[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpre1 = (dh1 * _gelu_grad(pre1)).astype(in_dtype)
    dw1_ref[...] += jax.lax.dot_general(
        g_c, dpre1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dpre1.astype(jnp.float32), axis=0, keepdims=True)
    dg = jax.lax.dot_general(
        dpre1, wfc1[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dg2_ref[...] += jnp.sum(dg * xhat2, axis=0, keepdims=True)
    db2ln_ref[...] += jnp.sum(dg, axis=0, keepdims=True)
    dy = do_all + _ln_bwd_input(dg, xhat2, rstd2, g2_32)
    dy_ref[...] = dy.astype(dy_ref.dtype).reshape(n_tokens, TR, C)


def _bwd_attn_kernel(x_ref, dy_ref, qkv_stash_ref, ln1g, ln1b, wqkv, wproj,
                     mask_ref, seeds_ref, thr_ref, inv_ref,
                     dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                     dg1_ref, db1ln_ref, *,
                     n_tokens, num_heads, head_dim, eps):
    """Attention-half backward: (x, dy, stashed qkv) -> dx + {qkv, proj,
    ln1} grads. wqkv is only read for dxn = dqkv @ Wqkv^T."""
    C = num_heads * head_dim
    TR = x_ref.shape[1]
    M = n_tokens * TR
    in_dtype = x_ref.dtype
    scale = float(head_dim) ** -0.5

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        db1ln_ref[...] = jnp.zeros_like(db1ln_ref)

    x_all = x_ref[...].reshape(M, C).astype(jnp.float32)
    dy_all = dy_ref[...].reshape(M, C).astype(jnp.float32)

    # ---- rebuild forward attention-half state (bit-identical: the qkv
    # product is stashed exactly as the forward cast it; only the cheap
    # LayerNorm is recomputed) ----------------------------------------------
    xhat1, rstd1 = _ln_stats(x_all, eps)
    g1_32 = ln1g[0].astype(jnp.float32)
    xn = xhat1 * g1_32 + ln1b[0].astype(jnp.float32)
    xn_c = xn.astype(in_dtype)
    qkv = qkv_stash_ref[...].reshape(M, 3 * C)
    q = [qkv[t * TR:(t + 1) * TR, :C] for t in range(n_tokens)]
    k = [qkv[t * TR:(t + 1) * TR, C:2 * C] for t in range(n_tokens)]
    v = [qkv[t * TR:(t + 1) * TR, 2 * C:] for t in range(n_tokens)]

    _seed(seeds_ref, SITE_ATTN)
    abits = _bits24((TR, _attn_bits_width(num_heads, n_tokens)))

    # p (pre-dropout softmax) and keep masks per (tq, h, tk)
    p_all, keep_all = [], []
    for tq in range(n_tokens):
        scores = []
        for tk in range(n_tokens):
            prod = q[tq].astype(jnp.float32) * k[tk].astype(jnp.float32)
            scores.append([
                jnp.sum(prod[:, h * head_dim:(h + 1) * head_dim],
                        axis=-1, keepdims=True) * scale + mask_ref[tq, tk]
                for h in range(num_heads)])
        p_q, keep_q = [], []
        for h in range(num_heads):
            s_h = [scores[tk][h] for tk in range(n_tokens)]
            m = functools.reduce(jnp.maximum, s_h)
            e_h = [jnp.exp(s - m) for s in s_h]
            denom = functools.reduce(jnp.add, e_h)
            p_q.append([e / denom for e in e_h])
            keep_q.append([
                _keep(abits[:, (tq * n_tokens + tk) * num_heads + h:
                            (tq * n_tokens + tk) * num_heads + h + 1],
                      thr_ref, 0) * inv_ref[0]
                for tk in range(n_tokens)])
        p_all.append(p_q)
        keep_all.append(keep_q)

    attn = []  # recomputed attention outputs per tq, (TR, C) fp32
    for tq in range(n_tokens):
        heads = []
        for h in range(num_heads):
            acc = None
            for tk in range(n_tokens):
                pd = p_all[tq][h][tk] * keep_all[tq][h][tk]
                contrib = pd * v[tk][:, h * head_dim:(h + 1) * head_dim] \
                    .astype(jnp.float32)
                acc = contrib if acc is None else acc + contrib
            heads.append(acc)
        attn.append(jnp.concatenate(heads, axis=-1))
    attn_all = jnp.concatenate(attn, axis=0).astype(in_dtype)

    _seed(seeds_ref, SITE_PROJ)
    mproj = _keep(_bits24((M, C)), thr_ref, 1) * inv_ref[1]
    dp1 = _dp_row_mask(seeds_ref, thr_ref, inv_ref, SITE_DP1, TR, n_tokens)

    # ---- backward ---------------------------------------------------------
    dproj = (dy_all * dp1 * mproj).astype(in_dtype)  # (M, C)
    dwproj_ref[...] += jax.lax.dot_general(
        attn_all, dproj, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbproj_ref[...] += jnp.sum(dproj.astype(jnp.float32), axis=0,
                               keepdims=True)
    dattn = jax.lax.dot_general(
        dproj, wproj[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (M, C) fp32

    # per-(token, head) gradient accumulators as nested lists (no value
    # scatter ops — Mosaic-friendly adds + one concatenate at the end)
    dq_acc = [[None] * num_heads for _ in range(n_tokens)]
    dk_acc = [[None] * num_heads for _ in range(n_tokens)]
    dv_acc = [[None] * num_heads for _ in range(n_tokens)]

    def _add(acc_list, t, h, val):
        acc_list[t][h] = val if acc_list[t][h] is None else \
            acc_list[t][h] + val

    for tq in range(n_tokens):
        dao = dattn[tq * TR:(tq + 1) * TR, :]
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            dao_h = dao[:, sl]
            dp_list = []
            for tk in range(n_tokens):
                v_h = v[tk][:, sl].astype(jnp.float32)
                pd = p_all[tq][h][tk] * keep_all[tq][h][tk]
                _add(dv_acc, tk, h, pd * dao_h)
                dpd = jnp.sum(dao_h * v_h, axis=-1, keepdims=True)
                dp_list.append(dpd * keep_all[tq][h][tk])
            # softmax backward: ds = p * (dp - sum_k dp*p)
            s_dot = None
            for tk in range(n_tokens):
                term = dp_list[tk] * p_all[tq][h][tk]
                s_dot = term if s_dot is None else s_dot + term
            for tk in range(n_tokens):
                ds = p_all[tq][h][tk] * (dp_list[tk] - s_dot)  # (TR, 1)
                _add(dq_acc, tq, h,
                     ds * k[tk][:, sl].astype(jnp.float32) * scale)
                _add(dk_acc, tk, h,
                     ds * q[tq][:, sl].astype(jnp.float32) * scale)

    dqkv = jnp.concatenate(
        [jnp.concatenate([jnp.concatenate(dq_acc[t], axis=-1),
                          jnp.concatenate(dk_acc[t], axis=-1),
                          jnp.concatenate(dv_acc[t], axis=-1)], axis=-1)
         for t in range(n_tokens)], axis=0).astype(in_dtype)  # (M, 3C)
    dwqkv_ref[...] += jax.lax.dot_general(
        xn_c, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                              keepdims=True)
    dxn = jax.lax.dot_general(
        dqkv, wqkv[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dg1_ref[...] += jnp.sum(dxn * xhat1, axis=0, keepdims=True)
    db1ln_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
    dx = dy_all + _ln_bwd_input(dxn, xhat1, rstd1, g1_32)
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(n_tokens, TR, C)


def _masks_kernel(seeds_ref, thr_ref, inv_ref, attn_ref, proj_ref, dp1_ref,
                  mlp_ref, dp2_ref, *, n_tokens, num_heads):
    """Replays the five PRNG streams and exports keep-masks (already
    1/keep-scaled) so tests can feed the exact masks to a jax reference.
    Refs are (1, rows, cols) tiles; dp masks export all 128 drawn columns
    (the compute kernels and the reference consume column 0 only)."""
    TR = dp1_ref.shape[1]
    M = proj_ref.shape[1]
    _seed(seeds_ref, SITE_ATTN)
    attn_ref[0] = _keep(
        _bits24((TR, _attn_bits_width(num_heads, n_tokens))), thr_ref, 0) \
        * inv_ref[0]
    _seed(seeds_ref, SITE_PROJ)
    proj_ref[0] = _keep(_bits24((M, proj_ref.shape[2])), thr_ref, 1) \
        * inv_ref[1]
    _seed(seeds_ref, SITE_DP1)
    dp1_ref[0] = _keep(_bits24((TR, 128)), thr_ref, 2) * inv_ref[2]
    _seed(seeds_ref, SITE_MLP)
    mlp_ref[0] = _keep(_bits24((M, mlp_ref.shape[2])), thr_ref, 1) \
        * inv_ref[1]
    _seed(seeds_ref, SITE_DP2)
    dp2_ref[0] = _keep(_bits24((TR, 128)), thr_ref, 2) * inv_ref[2]


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _rates_operands(attn_rate, drop_rate, dp_rate):
    """Static python rates -> SMEM operands (24-bit keep thresholds +
    1/keep scales). Index 0 = attn weights, 1 = proj & mlp dropout,
    2 = drop-path."""
    keeps = [1.0 - attn_rate, 1.0 - drop_rate, 1.0 - dp_rate]
    thr = jnp.asarray([min(_TWO24, int(round(k * _TWO24))) for k in keeps],
                      jnp.int32)
    inv = jnp.asarray([1.0 / k if k > 0 else 0.0 for k in keeps],
                      jnp.float32)
    return thr, inv


def _seeds_operand(seeds, block_idx, pid_offset=0):
    seeds = jnp.asarray(seeds, jnp.int32).reshape(2)
    return jnp.concatenate([
        seeds, jnp.asarray([block_idx, pid_offset], jnp.int32)])


def _param_operands(params, C, mlp_hidden, dt):
    return [
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
        params["mlp"]["fc1"]["w"].astype(dt),
        _as_row(params["mlp"]["fc1"].get("b"), mlp_hidden, dt),
        params["mlp"]["fc2"]["w"].astype(dt),
        _as_row(params["mlp"]["fc2"].get("b"), C, dt),
    ]


def _vmem_params(n_bytes=100 * 1024 * 1024):
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                vmem_limit_bytes=n_bytes)


def _fwd_call(x, flat, mask, seeds_op, thr, inv, *, num_heads, eps, block_r,
              interpret):
    N, R, C = x.shape
    dt = x.dtype
    mlp_hidden = flat[8].shape[1]
    grid = (pl.cdiv(R, block_r),)
    x_spec = pl.BlockSpec((N, block_r, C), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    qkv_spec = pl.BlockSpec((N, block_r, 3 * C), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    pre1_spec = pl.BlockSpec((N, block_r, mlp_hidden), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    out, y, qkv, pre1 = pl.pallas_call(
        functools.partial(_fwd_kernel, n_tokens=N, num_heads=num_heads,
                          head_dim=C // num_heads, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((N, R, C), dt),
                   jax.ShapeDtypeStruct((N, R, C), dt),
                   jax.ShapeDtypeStruct((N, R, 3 * C), dt),
                   jax.ShapeDtypeStruct((N, R, mlp_hidden), dt)),
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
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(x_spec, x_spec, qkv_spec, pre1_spec),
        cost_estimate=pl.CostEstimate(
            # qkv + proj + fc1 + fc2 matmuls over M=N*R tokens, plus the
            # two (N x N)-per-row attention matmuls
            flops=2 * N * R * C * (4 * C + 2 * mlp_hidden)
            + 4 * N * N * R * C,
            bytes_accessed=(N * R * (6 * C + mlp_hidden)
                            + 4 * C * C + 2 * C * mlp_hidden) * dt.itemsize,
            transcendentals=N * R * (num_heads * N + mlp_hidden),
        ),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(x, *flat, mask, seeds_op, thr, inv)
    return out, y, qkv, pre1


def _acc_spec(shape):
    """Weight-grad accumulator: every grid step maps to block 0."""
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _bwd_mlp_call(y, dout, pre1, flat, seeds_op, thr, inv, *, num_heads,
                  eps, block_r, interpret):
    N, R, C = y.shape
    dt = y.dtype
    ln2g, ln2b = flat[6], flat[7]
    wfc1, wfc2 = flat[8], flat[10]
    H = wfc1.shape[1]
    grid = (pl.cdiv(R, block_r),)
    x_spec = pl.BlockSpec((N, block_r, C), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    pre1_spec = pl.BlockSpec((N, block_r, H), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_bwd_mlp_kernel, n_tokens=N, num_heads=num_heads,
                          head_dim=C // num_heads, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((N, R, C), dt),      # dy
                   jax.ShapeDtypeStruct((C, H), f32),        # dW1
                   jax.ShapeDtypeStruct((1, H), f32),        # db1
                   jax.ShapeDtypeStruct((H, C), f32),        # dW2
                   jax.ShapeDtypeStruct((1, C), f32),        # db2
                   jax.ShapeDtypeStruct((1, C), f32),        # dln2g
                   jax.ShapeDtypeStruct((1, C), f32)),       # dln2b
        grid=grid,
        in_specs=[
            x_spec, x_spec, pre1_spec,
            _const((1, C)), _const((1, C)),
            _const((C, H)), _const((H, C)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(x_spec, _acc_spec((C, H)), _acc_spec((1, H)),
                   _acc_spec((H, C)), _acc_spec((1, C)),
                   _acc_spec((1, C)), _acc_spec((1, C)),),
        cost_estimate=pl.CostEstimate(
            # dh2 + dW2 + dW1 + dg matmuls (each 2*M*C*H) over M=N*R rows
            flops=8 * N * R * C * H,
            bytes_accessed=(N * R * (3 * C + H) + 2 * C * H) * dt.itemsize
            + 2 * C * H * 4,
            transcendentals=N * R * H,
        ),
        compiler_params=_vmem_params(n_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(y, dout, pre1, ln2g, ln2b, wfc1, wfc2, seeds_op, thr, inv)


def _bwd_attn_call(x, dy, qkv, flat, mask, seeds_op, thr, inv, *, num_heads,
                   eps, block_r, interpret):
    N, R, C = x.shape
    dt = x.dtype
    ln1g, ln1b = flat[0], flat[1]
    wqkv, wproj = flat[2], flat[4]
    grid = (pl.cdiv(R, block_r),)
    x_spec = pl.BlockSpec((N, block_r, C), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    qkv_spec = pl.BlockSpec((N, block_r, 3 * C), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_bwd_attn_kernel, n_tokens=N, num_heads=num_heads,
                          head_dim=C // num_heads, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((N, R, C), dt),      # dx
                   jax.ShapeDtypeStruct((C, 3 * C), f32),    # dWqkv
                   jax.ShapeDtypeStruct((1, 3 * C), f32),    # dbqkv
                   jax.ShapeDtypeStruct((C, C), f32),        # dWproj
                   jax.ShapeDtypeStruct((1, C), f32),        # dbproj
                   jax.ShapeDtypeStruct((1, C), f32),        # dln1g
                   jax.ShapeDtypeStruct((1, C), f32)),       # dln1b
        grid=grid,
        in_specs=[
            x_spec, x_spec, qkv_spec,
            _const((1, C)), _const((1, C)),
            _const((C, 3 * C)), _const((C, C)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(x_spec, _acc_spec((C, 3 * C)), _acc_spec((1, 3 * C)),
                   _acc_spec((C, C)), _acc_spec((1, C)),
                   _acc_spec((1, C)), _acc_spec((1, C))),
        cost_estimate=pl.CostEstimate(
            # dproj (dx + dW), dqkv (dxn + dW) matmuls = 16*M*C^2, plus the
            # ~3x-forward attention backward over N-length rows
            flops=16 * N * R * C * C + 12 * N * N * R * C,
            bytes_accessed=(N * R * 6 * C + 4 * C * C) * dt.itemsize
            + 4 * C * C * 4,
            transcendentals=N * R * num_heads * N,
        ),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(x, dy, qkv, ln1g, ln1b, wqkv, wproj, mask, seeds_op, thr, inv)


def draw_masks(R, N, C, num_heads, seeds, block_idx, attn_rate, drop_rate,
               dp_rate, *, block_r, interpret=False, pid_offset=0):
    """Replay the kernel PRNG streams; returns per-tile mask arrays stacked
    on a leading grid axis: (G, TR, Wa), (G, N*TR, C), (G, TR, 1) x2 ..."""
    thr, inv = _rates_operands(attn_rate, drop_rate, dp_rate)
    seeds_op = _seeds_operand(seeds, block_idx, pid_offset)
    interpret = _interpret_params(interpret)
    G = pl.cdiv(R, block_r)
    TR = block_r
    M = N * TR
    Wa = _attn_bits_width(num_heads, N)
    f32 = jnp.float32

    def spec(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda i: (i,) + tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_masks_kernel, n_tokens=N, num_heads=num_heads),
        out_shape=(jax.ShapeDtypeStruct((G, TR, Wa), f32),
                   jax.ShapeDtypeStruct((G, M, C), f32),
                   jax.ShapeDtypeStruct((G, TR, 128), f32),
                   jax.ShapeDtypeStruct((G, M, C), f32),
                   jax.ShapeDtypeStruct((G, TR, 128), f32)),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=(spec((TR, Wa)), spec((M, C)), spec((TR, 128)),
                   spec((M, C)), spec((TR, 128))),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(seeds_op, thr, inv)


# ---------------------------------------------------------------------------
# custom VJP
# ---------------------------------------------------------------------------

_FLAT_KEYS = [("norm1", "g"), ("norm1", "b"),
              ("attn", "qkv", "w"), ("attn", "qkv", "b"),
              ("attn", "proj", "w"), ("attn", "proj", "b"),
              ("norm2", "g"), ("norm2", "b"),
              ("mlp", "fc1", "w"), ("mlp", "fc1", "b"),
              ("mlp", "fc2", "w"), ("mlp", "fc2", "b")]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _core(x, flat, mask, seeds_op, rates, num_heads, eps, block_r,
          interpret):
    thr, inv = rates
    out, _, _, _ = _fwd_call(x, flat, mask, seeds_op, thr, inv,
                             num_heads=num_heads, eps=eps, block_r=block_r,
                             interpret=interpret)
    return out


def _core_fwd(x, flat, mask, seeds_op, rates, num_heads, eps, block_r,
              interpret):
    thr, inv = rates
    out, y, qkv, pre1 = _fwd_call(x, flat, mask, seeds_op, thr, inv,
                                  num_heads=num_heads, eps=eps,
                                  block_r=block_r, interpret=interpret)
    return out, (x, y, qkv, pre1, flat, mask, seeds_op, rates)


def _core_bwd(num_heads, eps, block_r, interpret, res, dout):
    x, y, qkv, pre1, flat, mask, seeds_op, (thr, inv) = res
    dy, dw1, db1, dw2, db2, dg2, db2ln = _bwd_mlp_call(
        y, dout, pre1, flat, seeds_op, thr, inv, num_heads=num_heads,
        eps=eps, block_r=block_r, interpret=interpret)
    dx, dwqkv, dbqkv, dwproj, dbproj, dg1, db1ln = _bwd_attn_call(
        x, dy, qkv, flat, mask, seeds_op, thr, inv, num_heads=num_heads,
        eps=eps, block_r=block_r, interpret=interpret)

    def like(g, ref):
        return g.reshape(ref.shape).astype(ref.dtype)

    dflat = (like(dg1, flat[0]), like(db1ln, flat[1]),
             like(dwqkv, flat[2]), like(dbqkv, flat[3]),
             like(dwproj, flat[4]), like(dbproj, flat[5]),
             like(dg2, flat[6]), like(db2ln, flat[7]),
             like(dw1, flat[8]), like(db1, flat[9]),
             like(dw2, flat[10]), like(db2, flat[11]))
    return dx, dflat, None, None, None


_core.defvjp(_core_fwd, _core_bwd)


def fused_block_train(x, params, mask, seeds, *, num_heads, block_idx=0,
                      attn_rate=0.0, drop_rate=0.0, dp_rate=0.0, eps=1e-6,
                      block_r=0, interpret=False):
    """One pre-LN transformer block in training mode, tokens-major.

    x: (N, R, C) activations (caller transposes once around the stack, like
    the serving path). ``params``: afft_tpu block pytree. ``seeds``: (2,)
    int32 array; masks are a pure function of (seeds, block_idx, site,
    grid step). Differentiable in x and params via Pallas backward kernels.
    """
    N, R, C = x.shape
    dt = x.dtype
    if not block_r:
        block_r = default_train_block_r(dt)
    mlp_hidden = params["mlp"]["fc1"]["w"].shape[1]
    assert supported(N, C, num_heads, mlp_hidden), \
        f"fused_block_train unsupported shape N={N} C={C} H={num_heads}"
    assert interpret or R % block_r == 0, \
        f"rows R={R} must fill whole {block_r}-row tiles"
    interpret = _interpret_params(interpret)

    flat = tuple(_param_operands(params, C, mlp_hidden, dt))
    full_mask = jnp.zeros((N, N), jnp.float32) if mask is None \
        else mask.astype(jnp.float32)
    seeds_op = _seeds_operand(seeds, block_idx)
    rates = _rates_operands(attn_rate, drop_rate, dp_rate)
    out = _core(x, flat, full_mask, seeds_op, rates, num_heads, eps,
                block_r, interpret)

    # re-route grads of the padded flat operands back onto the pytree: the
    # zeros fabricated for absent biases have no pytree slot and their
    # cotangents vanish with them (custom_vjp already computed them; the
    # closure below exists only at trace time)
    return out


def block_reference_with_masks(x, params, mask, masks, *, num_heads,
                               eps=1e-6):
    """Pure-JAX replica of _fwd_kernel given explicit (already-scaled)
    masks from draw_masks — the differentiable oracle for VJP tests.

    x: (N, R, C); masks: the draw_masks tuple; R must equal one tile."""
    N, R, C = x.shape
    H = num_heads
    hd = C // H
    mattn, mproj, d1, mmlp, d2 = masks
    assert mattn.shape[0] == 1, "reference oracle is single-tile"
    mattn, mproj, d1, mmlp, d2 = (mattn[0], mproj[0], d1[0][:, :1],
                                  mmlp[0], d2[0][:, :1])
    f32 = jnp.float32
    x_all = x.reshape(N * R, C).astype(f32)

    def ln(z, p):
        mu = z.mean(-1, keepdims=True)
        var = ((z - mu) ** 2).mean(-1, keepdims=True)
        zh = (z - mu) * jax.lax.rsqrt(var + eps)
        return zh * p["g"].astype(f32) + p["b"].astype(f32)

    dt = x.dtype
    xn = ln(x_all, params["norm1"])
    qkv_w = params["attn"]["qkv"]["w"].astype(dt)
    qkv_b = params["attn"]["qkv"].get("b")
    qkv = jnp.dot(xn.astype(dt), qkv_w, preferred_element_type=f32)
    if qkv_b is not None:
        qkv = qkv + qkv_b.astype(f32)
    qkv = qkv.astype(dt)
    q = [qkv[t * R:(t + 1) * R, :C] for t in range(N)]
    k = [qkv[t * R:(t + 1) * R, C:2 * C] for t in range(N)]
    v = [qkv[t * R:(t + 1) * R, 2 * C:] for t in range(N)]
    scale = float(hd) ** -0.5
    attn_parts = []
    for tq in range(N):
        heads = []
        for h in range(H):
            sl = slice(h * hd, (h + 1) * hd)
            s_h = [jnp.sum(q[tq].astype(f32)[:, sl] *
                           k[tk].astype(f32)[:, sl], -1, keepdims=True)
                   * scale + mask[tq, tk] for tk in range(N)]
            m = functools.reduce(jnp.maximum, s_h)
            e_h = [jnp.exp(s - m) for s in s_h]
            den = functools.reduce(jnp.add, e_h)
            acc = 0.
            for tk in range(N):
                col = (tq * N + tk) * H + h
                pd = e_h[tk] / den * mattn[:, col:col + 1]
                acc = acc + pd * v[tk].astype(f32)[:, sl]
            heads.append(acc)
        attn_parts.append(jnp.concatenate(heads, -1))
    attn_all = jnp.concatenate(attn_parts, 0)
    proj = jnp.dot(attn_all.astype(dt),
                   params["attn"]["proj"]["w"].astype(dt),
                   preferred_element_type=f32) \
        + params["attn"]["proj"]["b"].astype(f32)
    d1_full = jnp.concatenate([d1] * N, 0)
    y = x_all + d1_full * (proj * mproj)
    g = ln(y, params["norm2"])
    pre1 = jnp.dot(g.astype(dt), params["mlp"]["fc1"]["w"].astype(dt),
                   preferred_element_type=f32) \
        + params["mlp"]["fc1"]["b"].astype(f32)
    h1 = _gelu_exact(pre1)
    h2 = jnp.dot(h1.astype(dt), params["mlp"]["fc2"]["w"].astype(dt),
                 preferred_element_type=f32) \
        + params["mlp"]["fc2"]["b"].astype(f32)
    d2_full = jnp.concatenate([d2] * N, 0)
    out = y + d2_full * (h2 * mmlp)
    return out.astype(dt).reshape(N, R, C)
