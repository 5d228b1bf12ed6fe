"""Micro-benchmarks for the hot serving kernels on the real chip.

Usage: python tools/microbench.py [fuser_block] [gpt2] [flagship]

Times each variant with the forced-readback sync (block_until_ready is a
no-op on this platform, see afft_tpu/utils/sync.py) and amortizes dispatch
overhead over an in-graph lax.fori_loop where possible, else over many
dispatches.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _time_fn(fn, *args, iters=30, warmup=3):
    import jax
    from afft_tpu.utils.sync import force_device_sync
    out = None
    for _ in range(warmup):
        out = fn(*args)
    force_device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_device_sync(out)
    return (time.perf_counter() - t0) / iters


def bench_fuser_block():
    import jax
    import jax.numpy as jnp
    from afft_tpu.models import blocks as B
    from afft_tpu.ops import pallas_block as PB

    R, N, C, H = 4096, 5, 1024, 4
    params = B.block_init(jax.random.key(0), C, H, 4.0, True, True)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.key(1), (R, N, C), jnp.bfloat16)
    flops = 2 * R * N * C * (3 * C + C + 8 * C) + 2 * 2 * R * N * N * C

    @jax.jit
    def xla_block(p, x):
        y, _ = B.block_apply(p, x, H, None, norm_eps=1e-6, train=False,
                             need_weights=False)
        return y

    dt = _time_fn(xla_block, params, x)
    print(f"fuser block XLA:          {dt * 1e3:7.2f} ms  "
          f"{flops / dt / 1e12:6.1f} TFLOPS")

    for block_r in (256, 512):
        if R % block_r:
            continue
        fn = jax.jit(functools.partial(PB.fused_block, num_heads=H,
                                       eps=1e-6, block_r=block_r))
        try:
            dt = _time_fn(fn, x, params)
            print(f"fuser block pallas r={block_r:4d}: {dt * 1e3:7.2f} ms  "
                  f"{flops / dt / 1e12:6.1f} TFLOPS")
        except Exception as e:  # noqa
            print(f"fuser block pallas r={block_r}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")

    # 6-block stacks: what the model actually runs. tokens-major pays two
    # XLA transposes TOTAL around the stack instead of per-block in-kernel
    # token gather/scatter copies.
    depth = 6
    stack = [jax.tree.map(lambda a: a, params) for _ in range(depth)]

    @jax.jit
    def stack_xla(ps, x):
        for p in ps:
            x, _ = B.block_apply(p, x, H, None, norm_eps=1e-6, train=False,
                                 need_weights=False)
        return x

    dt = _time_fn(stack_xla, stack, x, iters=10)
    print(f"stack6 XLA:               {dt * 1e3:7.2f} ms  "
          f"{depth * flops / dt / 1e12:6.1f} TFLOPS")

    for block_r in (256, 512):
        @jax.jit
        def stack_pallas(ps, x, block_r=block_r):
            for p in ps:
                x = PB.fused_block(x, p, None, num_heads=H, eps=1e-6,
                                   block_r=block_r)
            return x

        dt = _time_fn(stack_pallas, stack, x, iters=10)
        print(f"stack6 pallas r={block_r:4d}:     {dt * 1e3:7.2f} ms  "
              f"{depth * flops / dt / 1e12:6.1f} TFLOPS")

        @jax.jit
        def stack_tm(ps, x, block_r=block_r):
            x = jnp.transpose(x, (1, 0, 2))
            for p in ps:
                x = PB.fused_block(x, p, None, num_heads=H, eps=1e-6,
                                   block_r=block_r, tokens_major=True)
            return jnp.transpose(x, (1, 0, 2))

        try:
            dt = _time_fn(stack_tm, stack, x, iters=10)
            print(f"stack6 pallas-tm r={block_r:4d}:  {dt * 1e3:7.2f} ms  "
                  f"{depth * flops / dt / 1e12:6.1f} TFLOPS")
        except Exception as e:  # noqa
            print(f"stack6 pallas-tm r={block_r}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")


def bench_gpt2():
    import jax
    import jax.numpy as jnp
    from afft_tpu.models.predictor import BaseFuturePredictor

    Bsz, T, C = 256, 16, 2048
    fp = BaseFuturePredictor(in_features=1024, inter_dim=C, n_layer=6,
                             n_head=4)
    params = fp.init(jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.key(1), (Bsz, T, C), jnp.bfloat16)
    flops = 6 * (2 * Bsz * T * C * 12 * C + 2 * 2 * Bsz * T * T * C)

    import os
    os.environ["AFFT_DISABLE_PALLAS"] = "1"

    @jax.jit
    def run_xla(p, x):
        h, _ = fp.forward_hidden(p, x, jnp.arange(T), train=False)
        return h

    dt = _time_fn(run_xla, params, x)
    print(f"gpt2 6L XLA:              {dt * 1e3:7.2f} ms  "
          f"{flops / dt / 1e12:6.1f} TFLOPS")
    del os.environ["AFFT_DISABLE_PALLAS"]

    @jax.jit
    def run_fused(p, x):
        h, _ = fp.forward_hidden(p, x, jnp.arange(T), train=False)
        return h

    try:
        dt = _time_fn(run_fused, params, x)
        print(f"gpt2 6L pallas 2-kernel:  {dt * 1e3:7.2f} ms  "
              f"{flops / dt / 1e12:6.1f} TFLOPS")
    except Exception as e:  # noqa
        print(f"gpt2 6L pallas: FAILED {type(e).__name__}: {str(e)[:160]}")


def bench_flagship():
    import jax
    import jax.numpy as jnp
    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:1024, objects:352, audio:1024, flow:1024}",
        "model.common_dim=1024", "model.fuser.depth=6",
        "model.common.fp_layers=6"])
    model = BaseModel(cfg.model, num_classes={"action": 3806})
    params = model.init(jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    feats = {m: jax.random.normal(jax.random.key(i), (256, 16, d),
                                  jnp.bfloat16)
             for i, (m, d) in enumerate(
                 {"rgb": 1024, "objects": 352, "audio": 1024,
                  "flow": 1024}.items())}

    @jax.jit
    def fwd(p, f):
        out, _ = model.apply(p, f, train=False)
        return out["logits/action"]["all-fused"][:, 0, :]

    dt = _time_fn(fwd, params, feats, iters=20)
    clips = 256 / dt
    print(f"flagship fwd B=256:       {dt * 1e3:7.2f} ms  "
          f"{clips:7.0f} clips/s  mfu {clips * 23e9 / 197e12:.3f}")


if __name__ == "__main__":
    which = sys.argv[1:] or ["fuser_block", "gpt2", "flagship"]
    for name in which:
        dict(fuser_block=bench_fuser_block, gpt2=bench_gpt2,
             flagship=bench_flagship)[name]()
