"""On-TPU validation + timing of the training-path fused block
(ops/pallas_block_train.py).

Hardware-only checks the CPU suite cannot do (interpret-mode PRNG draws are
all-zero):
  1. mask statistics: keep-fractions match the configured rates; draws are
     deterministic, distinct across blocks and across grid tiles
  2. forward == pure-JAX reference fed the replayed masks (bf16 + fp32)
  3. custom-VJP grads == jax.grad of the masked reference (bf16 + fp32)
  4. timing: 6-block flagship-fuser stack fwd+bwd, Pallas vs XLA path

Run stages separately to bound remote-AOT compile risk:
  python tools/tpu_train_kernel_check.py masks|fwd|grads|time|all
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afft_tpu.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()  # repo-local persistent XLA cache (.jax_cache)

N, C, H = 5, 1024, 4
RATES = dict(attn_rate=0.1, drop_rate=0.1, dp_rate=0.08)


def _sync(x):
    import jax.numpy as jnp
    return np.asarray(x.reshape(-1)[:8].astype(jnp.float32))


def check_masks():
    import jax.numpy as jnp
    from afft_tpu.ops import pallas_block_train as PBT
    seeds = jnp.asarray([11, 22], jnp.int32)
    br = PBT.default_train_block_r(jnp.bfloat16)
    R = 4 * br
    masks = PBT.draw_masks(R, N, C, H, seeds, 0, **_rate_args(),
                           block_r=br)
    names = ["attn", "proj", "dp", "mlp", "dp2"]
    keeps = [0.9, 0.9, 0.92, 0.9, 0.92]
    for name, keep, m in zip(names, keeps, masks):
        m = np.asarray(m)
        frac = (m > 0).mean()
        assert abs(frac - keep) < 0.01, f"{name}: keep {frac} vs {keep}"
        nz = m[m > 0]
        assert np.allclose(nz, 1.0 / keep, atol=1e-5), f"{name}: bad scale"
    again = PBT.draw_masks(R, N, C, H, seeds, 0, **_rate_args(),
                           block_r=br)
    for a, b in zip(masks, again):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            "masks must be deterministic"
    other_block = PBT.draw_masks(R, N, C, H, seeds, 1, **_rate_args(),
                                 block_r=br)
    assert not np.array_equal(np.asarray(masks[1]),
                              np.asarray(other_block[1])), \
        "masks must differ across blocks"
    m1 = np.asarray(masks[1])
    assert not np.array_equal(m1[0], m1[1]), "masks must differ across tiles"
    print(f"OK masks: stats/determinism/distinctness (R={R}, block_r={br})")


def _rate_args():
    return dict(attn_rate=RATES["attn_rate"], drop_rate=RATES["drop_rate"],
                dp_rate=RATES["dp_rate"])


def _setup(dt, R):
    import jax
    import jax.numpy as jnp
    from afft_tpu.models import blocks as BL
    p = BL.block_init(jax.random.key(0), C, H)
    p = jax.tree.map(lambda a: a.astype(dt), p)
    x = jax.random.normal(jax.random.key(1), (N, R, C), jnp.float32) \
        .astype(dt)
    seeds = jnp.asarray([11, 22], jnp.int32)
    return p, x, seeds


def _reference(x, p, masks, block_r):
    import jax.numpy as jnp
    from afft_tpu.ops import pallas_block_train as PBT
    outs = []
    G = x.shape[1] // block_r
    for g in range(G):
        tile = x[:, g * block_r:(g + 1) * block_r, :]
        mk = tuple(m[g:g + 1] for m in masks)
        outs.append(PBT.block_reference_with_masks(
            tile, p, jnp.zeros((N, N), jnp.float32), mk, num_heads=H))
    return jnp.concatenate(outs, axis=1)


def check_fwd():
    import jax
    import jax.numpy as jnp
    from afft_tpu.ops import pallas_block_train as PBT
    from contextlib import nullcontext
    for dt, tol in [(jnp.bfloat16, 3e-2), (jnp.float32, 1e-4)]:
        br = PBT.default_train_block_r(dt)
        R = 2 * br
        p, x, seeds = _setup(dt, R)
        # fp32 under 'highest' so both sides run true-fp32 matmuls (with
        # ambient default, TPU fp32 dots are bf16 passes with different
        # pass structure in Mosaic vs XLA)
        prec = jax.default_matmul_precision("highest") \
            if dt == jnp.float32 else nullcontext()
        with prec:
            out = jax.jit(lambda x, p: PBT.fused_block_train(
                x, p, None, seeds, num_heads=H, block_idx=3,
                **_rate_args()))(x, p)
            masks = PBT.draw_masks(R, N, C, H, seeds, 3, **_rate_args(),
                                   block_r=br)
            ref = _reference(x, p, masks, br)
        err = float(jnp.abs(out.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        scale = float(jnp.abs(ref.astype(jnp.float32)).max())
        assert err / scale < tol, f"fwd {dt}: rel err {err / scale}"
        print(f"OK train-fwd=={'ref':s} on TPU ({dt.__name__}, "
              f"max|diff|/max={err / scale:.2e})")


def check_grads():
    import jax
    import jax.numpy as jnp
    from afft_tpu.ops import pallas_block_train as PBT
    for dt, rtol in [(jnp.float32, 2e-3), (jnp.bfloat16, 6e-2)]:
        br = PBT.default_train_block_r(dt)
        R = 2 * br
        p, x, seeds = _setup(dt, R)
        masks = PBT.draw_masks(R, N, C, H, seeds, 3, **_rate_args(),
                               block_r=br)
        cot = jax.random.normal(jax.random.key(7), (N, R, C), jnp.float32) \
            .astype(dt)

        def loss_fused(x, p):
            out = PBT.fused_block_train(x, p, None, seeds, num_heads=H,
                                        block_idx=3, **_rate_args())
            return jnp.sum(out.astype(jnp.float32)
                           * cot.astype(jnp.float32))

        def loss_ref(x, p):
            return jnp.sum(_reference(x, p, masks, br).astype(jnp.float32)
                           * cot.astype(jnp.float32))

        from contextlib import nullcontext
        prec = jax.default_matmul_precision("highest") \
            if dt == jnp.float32 else nullcontext()
        with prec:
            gx_f, gp_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, p)
            gx_r, gp_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, p)

        def relerr(a, b):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            den = np.abs(b).max() + 1e-20
            return np.abs(a - b).max() / den

        worst = ("dx", relerr(gx_f.astype(jnp.float32),
                              gx_r.astype(jnp.float32)))
        ref_flat = {jax.tree_util.keystr(k): v
                    for k, v in jax.tree.leaves_with_path(gp_r)}
        for k, gf in jax.tree.leaves_with_path(gp_f):
            k = jax.tree_util.keystr(k)
            e = relerr(gf.astype(jnp.float32),
                       ref_flat[k].astype(jnp.float32))
            if e > worst[1]:
                worst = (k, e)
        assert worst[1] < rtol, f"grads {dt}: worst {worst}"
        print(f"OK train-grads==ref on TPU ({dt.__name__}, "
              f"worst {worst[0]} rel={worst[1]:.2e})")


def check_time(block_r=0):
    import jax
    import jax.numpy as jnp
    from afft_tpu.models import blocks as BL
    from afft_tpu.models import layers as L
    from afft_tpu.ops import pallas_block_train as PBT
    R, depth = 1024, 6  # flagship: B=64, T=16
    dt = jnp.bfloat16
    params = [jax.tree.map(lambda a: a.astype(dt),
                           BL.block_init(jax.random.key(i), C, H))
              for i in range(depth)]
    x = jax.random.normal(jax.random.key(1), (R, N, C), jnp.float32) \
        .astype(dt)
    seeds = jnp.asarray([11, 22], jnp.int32)
    dpr = BL.drop_path_schedule(0.1, depth)

    def stack_pallas(x, params):
        xt = jnp.transpose(x, (1, 0, 2))
        for bi, p in enumerate(params):
            xt = PBT.fused_block_train(
                xt, p, None, seeds, num_heads=H, block_idx=bi,
                attn_rate=0.1, drop_rate=0.1, dp_rate=dpr[bi],
                block_r=block_r)
        return jnp.transpose(xt, (1, 0, 2))

    def stack_xla(x, params, key):
        rng = L.RngStream(key)
        for bi, p in enumerate(params):
            x, _ = BL.block_apply(p, x, H, None, drop=0.1, attn_drop=0.1,
                                  drop_path_rate=dpr[bi], train=True,
                                  rng=rng, need_weights=False)
        return x

    key = jax.random.key(5)
    loss_p = jax.jit(jax.grad(
        lambda pp, x: jnp.sum(stack_pallas(x, pp).astype(jnp.float32) ** 2)))
    loss_x = jax.jit(jax.grad(
        lambda pp, x: jnp.sum(stack_xla(x, pp, key).astype(jnp.float32)
                              ** 2)))

    for name, fn in [("pallas", lambda: loss_p(params, x)),
                     ("xla", lambda: loss_x(params, x))]:
        g = fn()
        _sync(g[0]["attn"]["qkv"]["w"])
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            g = fn()
        _sync(g[0]["attn"]["qkv"]["w"])
        dt_ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"train stack fwd+bwd ({name}): {dt_ms:.2f} ms "
              f"(R={R}, depth={depth})")


def main():
    import jax
    assert jax.default_backend() == "tpu", \
        f"needs TPU, got {jax.default_backend()}"
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if stage in ("masks", "all"):
        check_masks()
    if stage in ("fwd", "all"):
        check_fwd()
    if stage in ("grads", "all"):
        check_grads()
    if stage in ("time", "all"):
        check_time(int(sys.argv[2]) if len(sys.argv) > 2 else 0)
    print("DONE", stage)


if __name__ == "__main__":
    main()
