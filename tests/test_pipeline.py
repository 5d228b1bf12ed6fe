"""Pipeline parallelism: GPipe schedule == sequential stack, fwd + grad.

Runs on the 8-device virtual CPU mesh (conftest). The block functions
under test are the REAL model blocks (GPT-2 predictor block, fuser
block), not toys — the pipeline must reproduce their sequential
composition exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afft_tpu.parallel.pipeline import (make_mesh_pipe, pipeline_blocks,
                                        stack_layer_params)


def _gpt2_setup(L=4, B=8, T=6, C=32, heads=2):
    from afft_tpu.models.predictor import BaseFuturePredictor

    fp = BaseFuturePredictor(in_features=C, inter_dim=C, n_layer=L,
                             n_head=heads)
    params = fp.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((B, T, C)).astype(np.float32))
    mask = jnp.triu(jnp.full((T, T), -1e9, x.dtype), k=1)

    def block_fn(p, h):
        return fp._block(p, h, mask, train=False, rng=None,
                         collect_attn=False)[0]

    return fp, params, x, block_fn


@pytest.mark.parametrize("stages,micro", [(2, 4), (4, 2)])
def test_pipeline_matches_sequential_gpt2(stages, micro):
    fp, params, x, block_fn = _gpt2_setup()
    seq = x
    for p in params["blocks"]:
        seq = block_fn(p, seq)

    mesh = make_mesh_pipe(stages)
    stacked = stack_layer_params(params["blocks"])
    out = pipeline_blocks(block_fn, stacked, x, mesh, microbatches=micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential():
    """Reverse-mode through the schedule (scan + ppermute + scatter) must
    equal sequential-stack gradients — the training path."""
    fp, params, x, block_fn = _gpt2_setup(L=4, B=8)
    stacked = stack_layer_params(params["blocks"])
    mesh = make_mesh_pipe(2)

    def loss_seq(stacked_p, x):
        h = x
        for i in range(4):
            h = block_fn(jax.tree.map(lambda a: a[i], stacked_p), h)
        return jnp.sum(h ** 2)

    def loss_pipe(stacked_p, x):
        h = pipeline_blocks(block_fn, stacked_p, x, mesh, microbatches=4)
        return jnp.sum(h ** 2)

    l_s, g_s = jax.value_and_grad(loss_seq)(stacked, x)
    l_p, g_p = jax.value_and_grad(loss_pipe)(stacked, x)
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pipeline_fuser_blocks():
    """Same schedule over the fuser transformer blocks (models/blocks.py,
    the stack every fuser variant shares)."""
    from afft_tpu.models import blocks as B

    L_, n, C, heads = 4, 3, 32, 2
    keys = jax.random.split(jax.random.key(1), L_)
    blocks = [B.block_init(k, C, heads, 4.0, False, True) for k in keys]
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((48, n, C)).astype(np.float32))

    def block_fn(p, h):
        return B.block_apply(p, h, num_heads=heads, train=False,
                             need_weights=False)[0]

    seq = x
    for p in blocks:
        seq = block_fn(p, seq)
    mesh = make_mesh_pipe(4)
    out = pipeline_blocks(block_fn, stack_layer_params(blocks), x, mesh,
                          microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_train_mode_dropout():
    """Train-mode pipelining: per-layer dropout keys are pre-split and
    stacked INTO the layer params (randomness must ride the scanned
    pytree — a stateful stream can't thread through lax.scan), with the
    microbatch index folded in so masks decorrelate across microbatches.
    The schedule reproduces the per-microbatch sequential application
    exactly (full-batch masks are unreproducible under ANY pipelining —
    dropout shapes follow the microbatch)."""
    from afft_tpu.models import blocks as B
    from afft_tpu.models import layers as L

    L_, n, C, heads, M = 4, 3, 32, 2, 4
    keys = jax.random.split(jax.random.key(2), L_)
    blocks = [B.block_init(k, C, heads, 4.0, False, True) for k in keys]
    layer_keys = jax.random.split(jax.random.key(7), L_)
    stacked = {"block": stack_layer_params(blocks), "rng": layer_keys}
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((48, n, C)).astype(np.float32))

    def block_fn(p, h, m):
        rng = L.RngStream(jax.random.fold_in(p["rng"], m))
        return B.block_apply(p["block"], h, num_heads=heads, train=True,
                             drop=0.3, attn_drop=0.2, rng=rng,
                             need_weights=False)[0]

    micro = x.reshape(M, 48 // M, n, C)
    seq = []
    for m in range(M):
        h = micro[m]
        for i in range(L_):
            h = block_fn({"block": blocks[i], "rng": layer_keys[i]}, h,
                         jnp.asarray(m))
        seq.append(h)
    seq = jnp.concatenate(seq, axis=0)

    mesh = make_mesh_pipe(2)
    out = pipeline_blocks(block_fn, stacked, x, mesh, microbatches=M,
                          block_takes_micro_index=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)
    # masks really differ across microbatches (fold_in(m) decorrelates)
    assert not np.allclose(np.asarray(out[:12]), np.asarray(out[12:24]))


def test_native_stacked_predictor_storage_roundtrip():
    """stack_predictor_blocks targets GPT-2 predictor subtrees only
    (blocks + wpe): fuser block LISTS are untouched, and unstack restores
    the canonical tree exactly (VERDICT r4 next #6)."""
    from afft_tpu.models.predictor import BaseFuturePredictor
    from afft_tpu.parallel.pipeline import (stack_predictor_blocks,
                                            unstack_predictor_blocks)

    fp = BaseFuturePredictor(in_features=32, inter_dim=32, n_layer=4,
                             n_head=2)
    pred = fp.init(jax.random.key(0))
    fuser = {"blocks": [{"w": jnp.ones((3, 3))}, {"w": jnp.zeros((3, 3))}],
             "token": jnp.ones((1, 32))}
    tree = {"future_predictor": {"fuser": fuser,
                                 "future_predictor": pred}}

    stacked = stack_predictor_blocks(tree)
    # predictor blocks: list -> stacked dict with leading layer dim
    sb = stacked["future_predictor"]["future_predictor"]["blocks"]
    assert isinstance(sb, dict)
    assert sb["c_attn"]["w"].shape[0] == 4
    # fuser blocks: still a list (no wpe sibling)
    assert isinstance(stacked["future_predictor"]["fuser"]["blocks"], list)

    restored = unstack_predictor_blocks(stacked)
    assert jax.tree.structure(restored) == jax.tree.structure(tree)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stack_on_host_trees_stays_on_host():
    """Resume restacks GiB-scale checkpoint state from host numpy trees:
    stacking must produce numpy (host) arrays, not device-placed jnp
    arrays — otherwise resume materializes the full predictor params AND
    momentum in device-0 HBM before the sharded placement."""
    from afft_tpu.parallel.pipeline import (stack_predictor_blocks,
                                            unstack_predictor_blocks)

    blocks = [{"w": np.full((3, 3), float(i))} for i in range(4)]
    tree = {"fp": {"wpe": np.zeros((5, 3)), "blocks": blocks}}
    stacked = stack_predictor_blocks(tree)
    assert type(stacked["fp"]["blocks"]["w"]) is np.ndarray
    assert stacked["fp"]["blocks"]["w"].shape == (4, 3, 3)
    # device trees still stack to device arrays
    dev = jax.tree.map(jnp.asarray, tree)
    sdev = stack_predictor_blocks(dev)
    assert isinstance(sdev["fp"]["blocks"]["w"], jax.Array)
    restored = unstack_predictor_blocks(stacked)
    for i, blk in enumerate(restored["fp"]["blocks"]):
        np.testing.assert_array_equal(blk["w"], blocks[i]["w"])


def test_per_layer_lr_wd_rejected_under_stacked_storage():
    """A per-layer opt.lr_wd rule (freeze blocks.0) is inexpressible in
    the stacked layout: check_uniform_layer_groups must raise instead of
    letting the rule silently stop matching its '.blocks.0.' path."""
    import pytest
    from afft_tpu.parallel.pipeline import check_uniform_layer_groups
    from afft_tpu.train import optim as O

    blocks = [{"w": np.ones((3, 3))} for _ in range(4)]
    params = {"future_predictor": {"wpe": np.zeros((5, 3)),
                                   "blocks": blocks}}
    # uniform rules (or none) pass
    check_uniform_layer_groups(
        O.build_group_tree(params, None, 0.1, 0.01))
    check_uniform_layer_groups(O.build_group_tree(
        params, [["future_predictor", 0.01, 0.0]], 0.1, 0.01))
    # a rule that singles out one layer must raise
    groups = O.build_group_tree(
        params, [["future_predictor.blocks.0", 0.0, 0.0]], 0.1, 0.01)
    with pytest.raises(ValueError, match="inexpressible"):
        check_uniform_layer_groups(groups)


def test_pipelined_forward_consumes_stacked_storage_directly():
    """With natively stacked block storage the pipelined forward_hidden
    (a) matches the canonical sequential forward and (b) contains NO
    stack/concatenate of the per-layer weights in its jaxpr — the per-step
    HBM re-stack the canonical list layout paid is gone."""
    from afft_tpu.models.predictor import BaseFuturePredictor
    from afft_tpu.parallel.pipeline import (PipelineCtx,
                                            stack_predictor_blocks)

    L_, B, T, C = 4, 8, 6, 32
    fp = BaseFuturePredictor(in_features=C, inter_dim=C, n_layer=L_,
                             n_head=2)
    params = fp.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((B, T, C)).astype(np.float32))
    pos = jnp.arange(T)

    seq, _ = fp.forward_hidden(params, x, pos, train=False)

    fp.pipeline_ctx = PipelineCtx(make_mesh_pipe(2), microbatches=2)
    try:
        stacked = stack_predictor_blocks(params)
        out, _ = fp.forward_hidden(stacked, x, pos, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                                   rtol=1e-5, atol=1e-5)

        jaxpr_stacked = str(jax.make_jaxpr(
            lambda p, h: fp.forward_hidden(p, h, pos, train=False)[0]
        )(stacked, x))
        jaxpr_canon = str(jax.make_jaxpr(
            lambda p, h: fp.forward_hidden(p, h, pos, train=False)[0]
        )(params, x))
        assert "concatenate" in jaxpr_canon, \
            "canonical list layout should re-stack inside the program"
        assert "concatenate" not in jaxpr_stacked, \
            "stacked storage must not re-stack the block weights per step"

        # the sequential fallbacks (eval/export/collect_attn) slice the
        # stacked storage transparently
        fp.pipeline_ctx = None
        out_sliced, _ = fp.forward_hidden(stacked, x, pos, train=False)
        np.testing.assert_allclose(np.asarray(out_sliced), np.asarray(seq),
                                   rtol=1e-6, atol=1e-6)
    finally:
        fp.pipeline_ctx = None
