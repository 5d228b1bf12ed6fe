"""On-TPU validation + timing of the GPT-2 training kernels
(ops/pallas_gpt2_train.py). Stages: masks | fwd | grads | time | all
(run separately to bound remote-AOT compile risk)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afft_tpu.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()  # repo-local persistent XLA cache (.jax_cache)

T, C, H = 16, 2048, 4
HM = 4 * C
RATES = dict(attn_rate=0.1, resid_rate=0.1)


def _sync(x):
    import jax.numpy as jnp
    return np.asarray(x.reshape(-1)[:8].astype(jnp.float32))


def _params(dt):
    import jax
    from afft_tpu.models import layers as L
    k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
    p = {
        "ln_1": L.layernorm_init(C),
        "c_attn": L.normal_linear_init(k1, C, 3 * C, 0.02),
        "c_proj": L.normal_linear_init(k2, C, C, 0.02),
        "ln_2": L.layernorm_init(C),
        "c_fc": L.normal_linear_init(k3, C, HM, 0.02),
        "mlp_c_proj": L.normal_linear_init(k4, HM, C, 0.02),
    }
    import jax as j
    return j.tree.map(lambda a: a.astype(dt), p)


def _setup(dt, B):
    import jax
    import jax.numpy as jnp
    p = _params(dt)
    x = jax.random.normal(jax.random.key(1), (B, T, C), jnp.float32) \
        .astype(dt)
    mask = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)
    seeds = jnp.asarray([31, 41], jnp.int32)
    return p, x, mask, seeds


def check_masks():
    import jax.numpy as jnp
    from afft_tpu.ops import pallas_gpt2_train as PGT
    bb = PGT.default_train_block_b(jnp.bfloat16)
    B = 2 * bb
    seeds = jnp.asarray([31, 41], jnp.int32)
    masks = PGT.draw_masks_gpt2(B, T, C, HM, seeds, 0, 0.1, 0.1,
                                block_b=bb)
    for name, m, keep, cols in [("attn", masks[0], 0.9, H * T),
                                ("proj", masks[1], 0.9, C),
                                ("mlp", masks[2], 0.9, C)]:
        m = np.asarray(m)[:, :, :cols]
        frac = (m > 0).mean()
        assert abs(frac - keep) < 0.01, f"{name}: keep {frac}"
        nz = m[m > 0]
        assert np.allclose(nz, 1.0 / keep, atol=1e-5), f"{name}: scale"
    again = PGT.draw_masks_gpt2(B, T, C, HM, seeds, 0, 0.1, 0.1,
                                block_b=bb)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(masks, again)), "determinism"
    other = PGT.draw_masks_gpt2(B, T, C, HM, seeds, 3, 0.1, 0.1,
                                block_b=bb)
    assert not np.array_equal(np.asarray(masks[1]), np.asarray(other[1])), \
        "layer distinctness"
    print(f"OK gpt2 masks (B={B}, block_b={bb})")


def _reference(x, p, mask, masks, bb):
    import jax.numpy as jnp
    from afft_tpu.ops import pallas_gpt2_train as PGT
    outs = []
    for g in range(x.shape[0] // bb):
        tile = x[g * bb:(g + 1) * bb]
        mk = tuple(m[g:g + 1] for m in masks)
        outs.append(PGT.gpt2_block_reference_with_masks(
            tile, p, mask, mk, num_heads=H))
    return jnp.concatenate(outs, axis=0)


def check_fwd():
    import jax
    import jax.numpy as jnp
    from afft_tpu.ops import pallas_gpt2_train as PGT
    dt = jnp.bfloat16
    bb = PGT.default_train_block_b(dt)
    B = 2 * bb
    p, x, mask, seeds = _setup(dt, B)
    out = jax.jit(lambda x, p: PGT.fused_gpt2_block_train(
        x, p, mask, seeds, num_heads=H, layer_idx=2, **RATES))(x, p)
    masks = PGT.draw_masks_gpt2(B, T, C, HM, seeds, 2, **{
        "attn_rate": RATES["attn_rate"], "resid_rate": RATES["resid_rate"]},
        block_b=bb)
    ref = _reference(x, p, mask, masks, bb)
    err = float(jnp.abs(out.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max())
    scale = float(jnp.abs(ref.astype(jnp.float32)).max())
    assert err / scale < 3e-2, f"fwd rel err {err / scale}"
    print(f"OK gpt2 train-fwd==ref (bf16, rel={err / scale:.2e})")


def check_grads():
    import jax
    import jax.numpy as jnp
    from afft_tpu.ops import pallas_gpt2_train as PGT
    dt = jnp.bfloat16
    bb = PGT.default_train_block_b(dt)
    B = 2 * bb
    p, x, mask, seeds = _setup(dt, B)
    masks = PGT.draw_masks_gpt2(B, T, C, HM, seeds, 2,
                                RATES["attn_rate"], RATES["resid_rate"],
                                block_b=bb)
    cot = jax.random.normal(jax.random.key(7), (B, T, C), jnp.float32) \
        .astype(dt)

    def loss_fused(x, p):
        out = PGT.fused_gpt2_block_train(x, p, mask, seeds, num_heads=H,
                                         layer_idx=2, **RATES)
        return jnp.sum(out.astype(jnp.float32) * cot.astype(jnp.float32))

    def loss_ref(x, p):
        return jnp.sum(_reference(x, p, mask, masks, bb)
                       .astype(jnp.float32) * cot.astype(jnp.float32))

    gx_f, gp_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, p)
    gx_r, gp_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, p)

    def relerr(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-20)

    worst = ("dx", relerr(gx_f.astype(jnp.float32),
                          gx_r.astype(jnp.float32)))
    ref_flat = {jax.tree_util.keystr(k): v
                for k, v in jax.tree.leaves_with_path(gp_r)}
    for k, gf in jax.tree.leaves_with_path(gp_f):
        k = jax.tree_util.keystr(k)
        e = relerr(gf.astype(jnp.float32), ref_flat[k].astype(jnp.float32))
        if e > worst[1]:
            worst = (k, e)
    assert worst[1] < 6e-2, f"worst {worst}"
    print(f"OK gpt2 train-grads==ref (bf16, worst {worst[0]} "
          f"rel={worst[1]:.2e})")


def check_time():
    import jax
    import jax.numpy as jnp
    from afft_tpu.models import layers as L
    from afft_tpu.models.predictor import BaseFuturePredictor
    from afft_tpu.ops import pallas_gpt2_train as PGT
    B, depth = 64, 6
    dt = jnp.bfloat16
    params = [_params(dt) for _ in range(depth)]
    x = jax.random.normal(jax.random.key(1), (B, T, C), jnp.float32) \
        .astype(dt)
    mask = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)
    seeds = jnp.asarray([31, 41], jnp.int32)
    mod = BaseFuturePredictor(in_features=C, inter_dim=C, n_layer=depth,
                              n_head=H, embd_pdrop=0.1, resid_pdrop=0.1,
                              attn_pdrop=0.1)

    def stack_pallas(ps, x):
        for li, p in enumerate(ps):
            x = PGT.fused_gpt2_block_train(x, p, mask, seeds, num_heads=H,
                                           layer_idx=li, **RATES)
        return x

    key = jax.random.key(5)

    def stack_xla(ps, x):
        rng = L.RngStream(key)
        for p in ps:
            x, _ = mod._block(p, x, mask, train=True, rng=rng,
                              collect_attn=False)
        return x

    g_p = jax.jit(jax.grad(
        lambda ps, x: jnp.sum(stack_pallas(ps, x).astype(jnp.float32)
                              ** 2)))
    g_x = jax.jit(jax.grad(
        lambda ps, x: jnp.sum(stack_xla(ps, x).astype(jnp.float32) ** 2)))
    for name, fn in [("pallas", lambda: g_p(params, x)),
                     ("xla", lambda: g_x(params, x))]:
        out = fn()
        _sync(out[0]["c_attn"]["w"])
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn()
        _sync(out[0]["c_attn"]["w"])
        dt_ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"gpt2 train stack fwd+bwd ({name}): {dt_ms:.2f} ms "
              f"(B={B}, depth={depth})")


def main():
    import jax
    assert jax.default_backend() == "tpu"
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if stage in ("masks", "all"):
        check_masks()
    if stage in ("fwd", "all"):
        check_fwd()
    if stage in ("grads", "all"):
        check_grads()
    if stage in ("time", "all"):
        check_time()
    print("DONE", stage)


if __name__ == "__main__":
    main()
