"""Decompose the flagship train step cost on TPU: times each stage
(fuser stack fwd+bwd, GPT-2 predictor fwd+bwd, mapping+cls+loss, optimizer
update) as standalone jitted programs with honest forced-readback syncs.
Numbers won't sum exactly to the full step (fusion boundaries differ) but
show where the remaining milliseconds live.

Usage: python tools/train_step_profile.py [opt|gpt2|fuser|all]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afft_tpu.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()  # repo-local persistent XLA cache (.jax_cache)

B, T, C, H = 64, 16, 1024, 4


def _sync(tree):
    import jax
    import jax.numpy as jnp
    leaf = jax.tree.leaves(tree)[0]
    return np.asarray(leaf.reshape(-1)[:8].astype(jnp.float32))


def _time(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_optimizer():
    """SGD+nesterov update over a flagship-sized fp32 pytree."""
    import jax
    import jax.numpy as jnp
    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel
    from afft_tpu.train import optim as O

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:1024, objects:352, audio:1024, flow:1024}",
        "model.common_dim=1024", "model.fuser.depth=6",
        "model.common.fp_inter_dim=2048", "model.common.fp_layers=6"])
    model = BaseModel(cfg.model, num_classes={"action": 3806})
    params = model.init(jax.random.key(0))
    n = sum(x.size for x in jax.tree.leaves(params))
    opt = O.sgd(momentum=0.9, nesterov=True)
    groups = O.build_group_tree(params, None, 0.001, 1e-6)
    state = opt.init(params, groups)
    grads = jax.tree.map(lambda x: jnp.ones_like(x) * 1e-4, params)

    @jax.jit
    def update(state, grads, params):
        state, updates = opt.update(state, grads, params, groups,
                                    jnp.float32(1.0))
        return O.apply_updates(params, updates), state

    dt = _time(lambda s, g, p: update(s, g, p)[0], state, grads, params)
    print(f"optimizer update ({n / 1e6:.0f}M params): {dt:7.2f} ms")


def bench_gpt2_train():
    import jax
    import jax.numpy as jnp
    from afft_tpu.models import predictor as P

    mod = P.BaseFuturePredictor(
        in_features=2048, inter_dim=2048, n_layer=6, n_head=4,
        embd_pdrop=0.1, resid_pdrop=0.1, attn_pdrop=0.1)
    params = mod.init(jax.random.key(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    x = jax.random.normal(jax.random.key(1), (B, T, 2048), jnp.bfloat16)

    from afft_tpu.models import layers as L

    def loss(p, x, key):
        out, _ = mod.apply(p, x, train=True, rng=L.RngStream(key))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    key = jax.random.key(3)
    g = jax.jit(jax.grad(loss))
    dt = _time(lambda p: g(p, x, key), params)
    print(f"gpt2 predictor train fwd+bwd (B={B}): {dt:7.2f} ms")


def bench_fuser_train():
    import jax
    import jax.numpy as jnp
    from afft_tpu.models import blocks as BL
    from afft_tpu.models import layers as L
    from afft_tpu.ops import pallas_block_train as PBT

    depth = 6
    params = [jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                           BL.block_init(jax.random.key(i), C, H))
              for i in range(depth)]
    x = jax.random.normal(jax.random.key(1), (B * T, 5, C), jnp.bfloat16)
    seeds = jnp.asarray([11, 22], jnp.int32)
    dpr = BL.drop_path_schedule(0.1, depth)

    def stack(x, ps):
        xt = jnp.transpose(x, (1, 0, 2))
        for bi, p in enumerate(ps):
            xt = PBT.fused_block_train(xt, p, None, seeds, num_heads=H,
                                       block_idx=bi, attn_rate=0.1,
                                       drop_rate=0.1, dp_rate=dpr[bi])
        return jnp.transpose(xt, (1, 0, 2))

    g = jax.jit(jax.grad(
        lambda ps, x: jnp.sum(stack(x, ps).astype(jnp.float32) ** 2)))
    dt = _time(lambda ps: g(ps, x), params)
    print(f"fuser stack train fwd+bwd (pallas, R={B * T}): {dt:7.2f} ms")


def main():
    import jax
    assert jax.default_backend() == "tpu"
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("opt", "all"):
        bench_optimizer()
    if which in ("gpt2", "all"):
        bench_gpt2_train()
    if which in ("fuser", "all"):
        bench_fuser_train()


if __name__ == "__main__":
    main()
