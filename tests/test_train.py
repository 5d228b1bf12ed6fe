"""Training-stack parity: losses, mixup, optimizers, schedules."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afft_tpu.train import losses as LO
from afft_tpu.train import optim as O
from afft_tpu.train.mixup import MixUp
from afft_tpu.train.optim import GroupSpec


def _load(name):
    path = os.path.join(os.path.dirname(__file__), "fixtures", f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{name} missing; run tools/export_fixtures.py")
    return np.load(path)


def _outputs_from_fixture(d):
    return {
        "logits/action": {"all-fused": jnp.asarray(
            d["in::logits/action::all-fused"])},
        "past_logits/action": {"all-fused": jnp.asarray(
            d["in::past_logits/action::all-fused"])},
        "orig_past": {"all-fused": jnp.asarray(d["in::orig_past::all-fused"])},
        "past_futures": {"all-fused": jnp.asarray(
            d["in::past_futures::all-fused"])},
    }


def test_losses_match_reference():
    d = _load("loss_basic")
    outputs = _outputs_from_fixture(d)
    losses, metrics = LO.compute_losses_metrics(
        outputs, {"action": jnp.asarray(d["in::target"])},
        {"action": jnp.asarray(d["in::subclips"])}, mixup_enable=False)
    for key in ("cls_action_all-fused", "past_cls_action_all-fused",
                "past_reg_all-fused"):
        np.testing.assert_allclose(losses[key], d[f"loss::{key}"],
                                   rtol=1e-5, atol=1e-6, err_msg=key)
    np.testing.assert_allclose(metrics["acc1_action_all-fused"],
                               d["metric::acc1"], rtol=1e-6)
    np.testing.assert_allclose(metrics["acc5_action_all-fused"],
                               d["metric::acc5"], rtol=1e-6)
    # the device-side MT5R payload carries top-5 ids; no ties in the fixture
    # logits, so argsort order is exact
    expected_top5 = np.argsort(-d["mt5r::logits"], axis=1)[:, :5]
    np.testing.assert_array_equal(
        np.asarray(metrics["mt5r_action_all-fused"]["top5"]), expected_top5)
    np.testing.assert_array_equal(
        np.asarray(metrics["mt5r_action_all-fused"]["labels"]).reshape(-1),
        d["mt5r::labels"].reshape(-1))


def test_mixup_and_losses_match_reference():
    d = _load("loss_mixup")
    mix = MixUp(alpha=0.5, label_smoothing={"action": 0.4},
                num_classes={"action": 11})
    feats = {"rgb": jnp.asarray(d["in::feats"])}
    x_out, labels_out, subclips_out, ignore = mix.mix(
        0.3, feats, {"action": jnp.asarray(d["in::target"])},
        {"action": jnp.asarray(d["in::subclips"])})
    np.testing.assert_allclose(x_out["rgb"], d["out::feats"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(labels_out["action"], d["out::labels"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(subclips_out["action"],
                               d["out::subclips"].reshape(
                                   subclips_out["action"].shape),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(ignore["action"]).reshape(-1),
        d["out::ignore"].reshape(-1))

    outputs = _outputs_from_fixture(d) if "in::logits/action::all-fused" in d \
        else None
    if outputs is None:
        d2 = _load("loss_basic")
        outputs = _outputs_from_fixture(d2)
    losses, metrics = LO.compute_losses_metrics(
        outputs, {"action": labels_out["action"]},
        {"action": subclips_out["action"]}, mixup_enable=True,
        target_subclips_ignore_index={"action": jnp.asarray(
            ignore["action"])})
    for key in ("cls_action_all-fused", "past_cls_action_all-fused"):
        np.testing.assert_allclose(losses[key], d[f"loss::{key}"],
                                   rtol=1e-5, atol=1e-6, err_msg=key)
    np.testing.assert_allclose(metrics["acc1_action_all-fused"],
                               d["metric::acc1"], rtol=1e-6)
    # rows whose past labels contain the ignore class stay unmixed; their
    # smoothed one-hots tie on every non-target class and torch.topk breaks
    # the tie by heap order while jax.lax.top_k picks the lowest index. The
    # affected entries only shuffle which tied class is zeroed in the metric
    # payload — compare the unambiguous (mixed) rows exactly.
    mixed_rows = ~np.asarray(d["out::ignore"]).reshape(6, -1).any(axis=1)
    expected_top5 = np.argsort(-d["mt5r::logits"], axis=1,
                               kind="stable")[:, :5]
    np.testing.assert_array_equal(
        np.asarray(metrics["mt5r_action_all-fused"]["top5"])[mixed_rows],
        expected_top5[mixed_rows])


@pytest.mark.parametrize("nesterov", [False, True])
def test_sgd_matches_torch(nesterov):
    import torch
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((4, 3)).astype(np.float32)
    tgt = rng.standard_normal((4, 3)).astype(np.float32)
    lr, wd, mu = 0.1, 0.01, 0.9

    tp = torch.nn.Parameter(torch.from_numpy(x0.copy()))
    topt = torch.optim.SGD([tp], lr=lr, momentum=mu, weight_decay=wd,
                           nesterov=nesterov)
    jp = {"w": jnp.asarray(x0)}
    groups = {"w": GroupSpec(lr=lr, wd=wd, frozen=False)}
    opt = O.sgd(momentum=mu, nesterov=nesterov)
    state = opt.init(jp, groups)
    for _ in range(5):
        topt.zero_grad()
        ((tp - torch.from_numpy(tgt)) ** 2).sum().backward()
        topt.step()
        g = {"w": 2 * (jp["w"] - jnp.asarray(tgt))}
        state, upd = opt.update(state, g, jp, groups, 1.0)
        jp = O.apply_updates(jp, upd)
    np.testing.assert_allclose(np.asarray(jp["w"]), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("decoupled", [False, True])
def test_adam_matches_torch(decoupled):
    import torch
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((4, 3)).astype(np.float32)
    tgt = rng.standard_normal((4, 3)).astype(np.float32)
    lr, wd = 0.05, 0.01

    tp = torch.nn.Parameter(torch.from_numpy(x0.copy()))
    cls = torch.optim.AdamW if decoupled else torch.optim.Adam
    topt = cls([tp], lr=lr, weight_decay=wd)
    jp = {"w": jnp.asarray(x0)}
    groups = {"w": GroupSpec(lr=lr, wd=wd, frozen=False)}
    opt = O.adamw() if decoupled else O.adam()
    state = opt.init(jp, groups)
    for _ in range(5):
        topt.zero_grad()
        ((tp - torch.from_numpy(tgt)) ** 2).sum().backward()
        topt.step()
        g = {"w": 2 * (jp["w"] - jnp.asarray(tgt))}
        state, upd = opt.update(state, g, jp, groups, 1.0)
        jp = O.apply_updates(jp, upd)
    np.testing.assert_allclose(np.asarray(jp["w"]), tp.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_warmup_cosine_schedule_matches_reference():
    """Step-by-step lr trajectory vs the reference Warmup+CosineLR wrappers
    (imported from /root/reference; they depend only on torch)."""
    import torch
    sys.path.insert(0, "/root/reference")
    try:
        from common.scheduler import CosineLR, Warmup
    finally:
        sys.path.remove("/root/reference")

    iters, warm_ep, cos_ep, base_lr, eta = 7, 2, 3, 0.02, 1e-6
    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=base_lr)
    cos = CosineLR(topt, num_epochs=cos_ep, iters_per_epoch=iters,
                   world_size=2, eta_min=eta)
    sched = Warmup(topt, cos, init_lr_ratio=0.01, num_epochs=warm_ep,
                   iters_per_epoch=iters)

    mine = O.warmup_wrap(
        O.cosine_schedule(cos_ep, iters, world_size=2, eta_min=eta),
        init_lr_ratio=0.01, num_epochs=warm_ep, iters_per_epoch=iters)

    total = (warm_ep + cos_ep) * iters + 3  # run past T_max
    for t in range(total):
        torch_lr = topt.param_groups[0]["lr"]
        np.testing.assert_allclose(mine(t, base_lr), torch_lr, rtol=1e-6,
                                   atol=1e-9, err_msg=f"step {t}")
        sched.step()


def test_frozen_group_receives_no_update():
    jp = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
    groups = {"a": GroupSpec(0.1, 0.0, False), "b": GroupSpec(0.0, 0.0, True)}
    opt = O.sgd(momentum=0.9)
    state = opt.init(jp, groups)
    g = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
    state, upd = opt.update(state, g, jp, groups, 1.0)
    assert np.all(np.asarray(upd["a"]) != 0)
    assert np.all(np.asarray(upd["b"]) == 0)


def test_build_group_tree_prefix_rules():
    params = {"future_predictor": {"fuser": {"w": jnp.ones(1)},
                                   "mapping": {"w": jnp.ones(1)}}}
    groups = O.build_group_tree(
        params, [[["future_predictor.fuser"], 0.5, 0.1]], 0.1, 0.01)
    assert groups["future_predictor"]["fuser"]["w"].lr == 0.5
    assert groups["future_predictor"]["mapping"]["w"].lr == 0.1


def test_plateau_matches_torch():
    """ReduceLROnPlateau trajectory vs torch on a noisy metric sequence
    (reference common/scheduler.py:78-85 passthrough)."""
    import torch

    from afft_tpu.train.optim import plateau_schedule

    base_lr = 0.5
    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=base_lr)
    kw = dict(mode="min", factor=0.5, patience=2, threshold=1e-4,
              threshold_mode="rel", cooldown=1, min_lr=1e-3)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(topt, **kw)
    mine = plateau_schedule(**kw)

    rng = np.random.default_rng(0)
    metric = 10.0
    for epoch in range(40):
        # improves sometimes, stalls in stretches
        if epoch % 7 in (0, 1):
            metric *= 0.9
        metric_obs = metric * (1 + 1e-6 * rng.standard_normal())
        tsched.step(metric_obs)
        mine.observe(metric_obs)
        np.testing.assert_allclose(
            mine(epoch, base_lr), topt.param_groups[0]["lr"],
            rtol=1e-9, err_msg=f"epoch {epoch}")

    # state roundtrip (resume path)
    state = mine.state_dict()
    fresh = plateau_schedule(**kw)
    fresh.load_state_dict(state)
    assert fresh(0, base_lr) == mine(0, base_lr)


def test_warmup_forwards_plateau_observe():
    from afft_tpu.train.optim import plateau_schedule, warmup_wrap
    base = plateau_schedule(mode="min", factor=0.1, patience=0)
    wrapped = warmup_wrap(base, init_lr_ratio=0.1, num_epochs=1,
                          iters_per_epoch=10)
    assert wrapped.observe.__self__ is base
    wrapped.observe(1.0)
    wrapped.observe(2.0)  # worse, patience 0 -> reduce
    assert base.scale == 0.1
    # post-warmup lr reflects the reduction
    np.testing.assert_allclose(wrapped(50, 1.0), 0.1)


def test_watch_gradients_metrics():
    """watch_gradients=True surfaces grad/param norms through the metric
    stream (wandb.watch equivalent, reference train.py:416)."""
    import jax
    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel
    from afft_tpu.train import optim as O
    from afft_tpu.train.runner import Runner

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:16, flow:16}", "model.common_dim=16",
        "model.common.fp_inter_dim=32", "model.common.fp_layers=1",
        "model.common.fp_heads=2", "model.fuser.depth=1",
        "model.fuser.num_heads=2",
    ])
    model = BaseModel(cfg.model, num_classes={"action": 5})
    params = model.init(jax.random.key(0))
    groups = O.build_group_tree(params, None, 0.01, 0.0)
    opt = O.sgd(momentum=0.9)
    runner = Runner(model, opt, groups,
                    loss_wts={"cls_action": 1.0, "past_cls_action": 1.0,
                              "past_reg": 1.0},
                    watch_gradients=True, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "data_dict": {m: rng.standard_normal((4, 6, 16)).astype(np.float32)
                      for m in ("rgb", "flow")},
        "target": {"action": rng.integers(0, 5, (4,))},
        "valid": np.ones((4,), bool),
    }
    _, _, _, metrics, _ = runner.train_step(
        params, opt.init(params, groups), batch, 0.01, 0.01,
        jax.random.key(1))
    gn = float(metrics["grad_norm"])
    pn = float(metrics["param_norm"])
    assert np.isfinite(gn) and gn > 0
    assert np.isfinite(pn) and pn > 0
    assert any(k.startswith("grad_norm_") for k in metrics)


# ---------------------------------------------------------------------------
# class-weighted future-action CE (new capability; afft_tpu/data/stats.py)
# ---------------------------------------------------------------------------

def test_class_weighted_ce_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    B, Tp, C = 12, 1, 7
    logits = rng.standard_normal((B, Tp, C)).astype(np.float32)
    tgt = rng.integers(0, C, (B,))
    w = rng.uniform(0.2, 3.0, (C,)).astype(np.float32)
    valid = np.ones((B,), bool)

    loss, *_ = LO.future_action_terms(
        jnp.asarray(logits), jnp.asarray(tgt), False, jnp.asarray(valid),
        class_weights=jnp.asarray(w))
    ref = F.cross_entropy(torch.tensor(logits[:, 0]), torch.tensor(tgt),
                          weight=torch.tensor(w))
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)

    # soft/one-hot (mixup) path: torch scales class terms, count denominator
    soft = rng.uniform(0, 1, (B, C)).astype(np.float32)
    soft /= soft.sum(axis=1, keepdims=True)
    loss_soft, *_ = LO.future_action_terms(
        jnp.asarray(logits), jnp.asarray(soft), True, jnp.asarray(valid),
        class_weights=jnp.asarray(w))
    logp = torch.log_softmax(torch.tensor(logits[:, 0]), dim=-1)
    ref_soft = -(torch.tensor(soft * w[None]) * logp).sum(-1).mean()
    np.testing.assert_allclose(float(loss_soft), float(ref_soft), rtol=1e-5)

    # None reproduces the unweighted reference loss exactly
    loss_none, *_ = LO.future_action_terms(
        jnp.asarray(logits), jnp.asarray(tgt), False, jnp.asarray(valid))
    ref_unw = F.cross_entropy(torch.tensor(logits[:, 0]), torch.tensor(tgt))
    np.testing.assert_allclose(float(loss_none), float(ref_unw), rtol=1e-5)


def test_class_weighted_ce_respects_valid_mask():
    rng = np.random.default_rng(4)
    B, C = 8, 5
    logits = rng.standard_normal((B, 1, C)).astype(np.float32)
    tgt = rng.integers(0, C, (B,))
    w = rng.uniform(0.5, 2.0, (C,)).astype(np.float32)
    valid = np.array([True] * 6 + [False] * 2)

    loss_masked, *_ = LO.future_action_terms(
        jnp.asarray(logits), jnp.asarray(tgt), False, jnp.asarray(valid),
        class_weights=jnp.asarray(w))
    loss_trunc, *_ = LO.future_action_terms(
        jnp.asarray(logits[:6]), jnp.asarray(tgt[:6]), False,
        jnp.ones((6,), bool), class_weights=jnp.asarray(w))
    np.testing.assert_allclose(float(loss_masked), float(loss_trunc),
                               rtol=1e-6)


def test_runner_class_weights_train_only():
    """Weights bias the TRAIN loss toward rare classes; eval stays
    unweighted (reference-comparable)."""
    from afft_tpu.train.runner import Runner
    from afft_tpu.models import BaseModel
    from afft_tpu.config import compose

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb: 16, flow: 16}", "model.common_dim=16",
        "model.fuser.depth=1", "model.fuser.num_heads=2",
        "model.common.fp_inter_dim=16", "model.common.fp_layers=1",
        "model.common.fp_heads=2", "model.dropout=0.0"])
    model = BaseModel(cfg.model, num_classes={"action": 5})
    params = model.init(jax.random.key(0))
    groups = O.build_group_tree(params, {}, 0.01, 0.0)
    opt = O.sgd(momentum=0.9)
    w = np.array([10.0, 0.1, 0.1, 0.1, 0.1], np.float32)
    kwargs = dict(loss_wts={"cls_action": 1.0, "past_cls_action": 1.0,
                            "past_reg": 1.0}, donate=False)
    r_w = Runner(model, opt, groups, class_weights={"action": w}, **kwargs)
    r_u = Runner(model, opt, groups, **kwargs)

    rng = np.random.default_rng(0)
    batch = {
        "data_dict": {m: rng.standard_normal((4, 6, 16)).astype(np.float32)
                      for m in ("rgb", "flow")},
        "target": {"action": np.zeros((4,), np.int64)},  # all rare class 0
        "valid": np.ones((4,), bool),
    }
    _, _, losses_w, _, _ = r_w.train_step(
        params, opt.init(params, groups), batch, 0.0, 0.01, jax.random.key(1))
    _, _, losses_u, _, _ = r_u.train_step(
        params, opt.init(params, groups), batch, 0.0, 0.01, jax.random.key(1))
    # weighted mean over a single class equals the unweighted mean...
    np.testing.assert_allclose(float(losses_w["cls_action_all-fused"]),
                               float(losses_u["cls_action_all-fused"]),
                               rtol=1e-5)
    # ...but eval never sees the weights even when set
    ev_w, _, _, _ = r_w.eval_step(params, batch)
    ev_u, _, _, _ = r_u.eval_step(params, batch)
    np.testing.assert_allclose(float(ev_w["cls_action_all-fused"]),
                               float(ev_u["cls_action_all-fused"]),
                               rtol=1e-6)
    # mixed-class batch: weighted != unweighted
    batch["target"] = {"action": np.array([0, 1, 2, 3], np.int64)}
    _, _, lw, _, _ = r_w.train_step(
        params, opt.init(params, groups), batch, 0.0, 0.01, jax.random.key(1))
    _, _, lu, _, _ = r_u.train_step(
        params, opt.init(params, groups), batch, 0.0, 0.01, jax.random.key(1))
    assert abs(float(lw["cls_action_all-fused"])
               - float(lu["cls_action_all-fused"])) > 1e-4


def test_class_weighted_ce_ignore_index_matches_torch():
    """-1 targets are excluded from BOTH numerator and denominator
    (torch CrossEntropyLoss(weight=..., ignore_index=-1) semantics)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(7)
    B, C = 10, 6
    logits = rng.standard_normal((B, 1, C)).astype(np.float32)
    tgt = rng.integers(0, C, (B,))
    tgt[[1, 4, 7]] = -1
    w = rng.uniform(0.2, 5.0, (C,)).astype(np.float32)

    loss, *_ = LO.future_action_terms(
        jnp.asarray(logits), jnp.asarray(tgt), False,
        jnp.ones((B,), bool), class_weights=jnp.asarray(w))
    ref = F.cross_entropy(torch.tensor(logits[:, 0]), torch.tensor(tgt),
                          weight=torch.tensor(w), ignore_index=-1)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)


def test_multistep_schedule_matches_reference():
    """Step-by-step lr trajectory vs the reference WarmupMultiStepLR
    (imported from /root/reference; depends only on torch)."""
    import torch
    sys.path.insert(0, "/root/reference")
    try:
        from common.scheduler import WarmupMultiStepLR
    finally:
        sys.path.remove("/root/reference")

    iters, base_lr = 5, 0.04
    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=base_lr)
    sched = WarmupMultiStepLR(
        topt, milestone_epochs=[3, 6], gamma=0.1, warmup_factor=0.25,
        warmup_epochs=2, warmup_method="linear", iters_per_epoch=iters,
        world_size=2)

    mine = O.multistep_schedule(
        milestone_epochs=[3, 6], gamma=0.1, warmup_factor=0.25,
        warmup_epochs=2, warmup_method="linear", iters_per_epoch=iters,
        world_size=2)

    for t in range(8 * iters):
        torch_lr = topt.param_groups[0]["lr"]
        np.testing.assert_allclose(mine(t, base_lr), torch_lr, rtol=1e-6,
                                   atol=1e-9, err_msg=f"step {t}")
        sched.step()

    # the torch-style 'milestones' alias resolves to the same schedule
    alias = O.multistep_schedule(milestones=[3, 6], gamma=0.1,
                                 warmup_factor=0.25, warmup_epochs=2,
                                 iters_per_epoch=iters, world_size=2)
    assert alias(31, base_lr) == mine(31, base_lr)
    with pytest.raises(ValueError, match="milestone"):
        O.multistep_schedule(iters_per_epoch=iters, world_size=2)


def test_mixed_precision_persistent_params_c():
    """bf16 training keeps a persistent compute-dtype copy in opt_state:
    grads flow in bf16, the copy tracks updated fp32 masters, master params
    stay fp32, and the loss decreases like the fp32 path."""
    import jax
    import jax.numpy as jnp
    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel
    from afft_tpu.train import optim as O
    from afft_tpu.train.runner import Runner

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:16, flow:16}", "model.common_dim=16",
        "model.common.fp_inter_dim=32", "model.common.fp_layers=1",
        "model.common.fp_heads=2", "model.fuser.depth=1",
        "model.fuser.num_heads=2",
    ])
    model = BaseModel(cfg.model, num_classes={"action": 5})
    params = model.init(jax.random.key(0))
    groups = O.build_group_tree(params, None, 0.05, 0.0)
    opt = O.sgd(momentum=0.9, nesterov=True)
    runner = Runner(model, opt, groups,
                    loss_wts={"cls_action": 1.0, "past_cls_action": 1.0,
                              "past_reg": 1.0},
                    donate=False, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "data_dict": {m: rng.standard_normal((4, 6, 16)).astype(np.float32)
                      for m in ("rgb", "flow")},
        "target": {"action": rng.integers(0, 5, (4,))},
        "valid": np.ones((4,), bool),
    }
    state = opt.init(params, groups)
    losses_seq = []
    for i in range(8):
        params, state, losses, _, _ = runner.train_step(
            params, state, batch, 0.05, 0.05, jax.random.key(i))
        losses_seq.append(float(losses["total_loss"]))
    assert "params_c" in state
    # master params stay fp32; the persistent copy is bf16 and tracks them
    leaf = jax.tree.leaves(params)[0]
    assert leaf.dtype == jnp.float32
    leaf_c = jax.tree.leaves(state["params_c"])[0]
    assert leaf_c.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(leaf_c, np.float32), np.asarray(leaf).astype(np.float32),
        rtol=1e-2, atol=1e-2)
    assert losses_seq[-1] < losses_seq[0], losses_seq

    # checkpoints must not carry the derived copy
    import tempfile
    from afft_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(f"{d}/ck", params, state, epoch=0, step=8,
                        best_metric=0.0)
        ck = load_checkpoint(f"{d}/ck")
        assert "params_c" not in ck["optimizer"]


# ---------------------------------------------------------------------------
# low-precision optimizer state / bf16 master weights (beyond-reference)
# ---------------------------------------------------------------------------

def test_stochastic_round_bf16_unbiased_and_exact():
    """Exactly-representable values pass through; in-between values round
    unbiasedly (mean over many draws ~ the fp32 value)."""
    exact = jnp.asarray([0.0, 1.0, -2.5, 3.140625, 65280.0], jnp.float32)
    out = O.stochastic_round_bf16(exact, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)),
                                  np.asarray(exact))
    x = jnp.full((200_000,), 1.0 + 1e-3, jnp.float32)  # between bf16 ticks
    y = O.stochastic_round_bf16(x, jax.random.key(1))
    mean = float(np.asarray(y.astype(jnp.float32)).mean())
    assert abs(mean - (1.0 + 1e-3)) < 2e-4, mean
    vals = np.unique(np.asarray(y.astype(jnp.float32)))
    assert len(vals) == 2  # only the two neighbouring bf16 ticks


def test_sgd_state_dtype_bf16_tracks_fp32():
    """state_dtype=bfloat16 momentum follows the fp32 trajectory on a
    quadratic within bf16 tolerance; fp32 math is otherwise unchanged."""
    target = jnp.asarray(np.linspace(-2, 2, 64), jnp.float32)

    def run(opt):
        p = {"w": jnp.zeros((64,), jnp.float32)}
        groups = {"w": GroupSpec(0.1, 0.0, False)}
        st = opt.init(p, groups)
        for _ in range(50):
            g = {"w": p["w"] - target}
            st, upd = opt.update(st, g, p, groups, 1.0)
            p = O.apply_updates(p, upd)
        return np.asarray(p["w"])

    w32 = run(O.sgd(momentum=0.9, nesterov=True))
    w16 = run(O.sgd(momentum=0.9, nesterov=True, state_dtype="bfloat16"))
    np.testing.assert_allclose(w16, w32, atol=0.05)
    assert not np.allclose(w16, w32, atol=1e-7)  # state really is reduced


def test_adam_state_dtype_bf16_tracks_fp32():
    target = jnp.asarray(np.linspace(-1, 3, 64), jnp.float32)

    def run(opt):
        p = {"w": jnp.zeros((64,), jnp.float32)}
        groups = {"w": GroupSpec(0.05, 0.0, False)}
        st = opt.init(p, groups)
        for _ in range(80):
            g = {"w": p["w"] - target}
            st, upd = opt.update(st, g, p, groups, 1.0)
            p = O.apply_updates(p, upd)
        return np.asarray(p["w"])

    w32 = run(O.adamw())
    w16 = run(O.adamw(state_dtype="bfloat16"))
    np.testing.assert_allclose(w16, w32, atol=0.1)


def test_apply_updates_bf16_master_stochastic():
    """bf16 master + sr_key: a sub-ulp update survives in expectation
    (deterministic rounding would drop it to zero every step)."""
    p = {"w": jnp.full((50_000,), 256.0, jnp.bfloat16)}  # ulp = 2.0
    u = {"w": jnp.full((50_000,), 0.125, jnp.float32)}   # 1/16 ulp
    det = O.apply_updates(p, u)  # round-to-nearest: unchanged
    assert float(np.asarray(det["w"].astype(jnp.float32)).mean()) == 256.0
    sto = O.apply_updates(p, u, sr_key=jax.random.key(0))
    mean = float(np.asarray(sto["w"].astype(jnp.float32)).mean())
    assert abs(mean - 256.125) < 0.03, mean


class TestSlurmRendezvous:
    """init_distributed's SLURM fallback (reference common/utils.py:157-172:
    submitit JobEnvironment / SLURM_PROCID rendezvous)."""

    def test_not_slurm(self, monkeypatch):
        from afft_tpu.parallel.mesh import _slurm_rendezvous
        for k in ("SLURM_PROCID", "SLURM_NTASKS", "SLURM_JOB_ID",
                  "SLURM_STEP_NODELIST", "SLURM_JOB_NODELIST"):
            monkeypatch.delenv(k, raising=False)
        assert _slurm_rendezvous() is None

    def test_single_task_is_not_distributed(self, monkeypatch):
        from afft_tpu.parallel.mesh import _slurm_rendezvous
        monkeypatch.setenv("SLURM_PROCID", "0")
        monkeypatch.setenv("SLURM_NTASKS", "1")
        assert _slurm_rendezvous() is None

    @pytest.mark.parametrize("nodelist,first", [
        ("node07,node09", "node07"),
        ("gpu[3-5]", "gpu3"),
        ("tpu-host[017-020,031]", "tpu-host017"),
        ("single-node", "single-node"),
    ])
    def test_nodelist_coordinator(self, monkeypatch, nodelist, first):
        import subprocess
        from afft_tpu.parallel import mesh as M
        monkeypatch.setenv("SLURM_PROCID", "3")
        monkeypatch.setenv("SLURM_NTASKS", "4")
        monkeypatch.setenv("SLURM_JOB_ID", "123456")
        monkeypatch.setenv("SLURM_STEP_NODELIST", nodelist)
        # force the regex fallback (scontrol absent in containers)
        real_run = subprocess.run

        def no_scontrol(cmd, **kw):
            if cmd[0] == "scontrol":
                raise FileNotFoundError("scontrol")
            return real_run(cmd, **kw)

        monkeypatch.setattr(subprocess, "run", no_scontrol)
        coord, n, pid = M._slurm_rendezvous()
        host, port = coord.rsplit(":", 1)
        assert host == first and n == 4 and pid == 3
        assert int(port) == 12300 + 123456 % 20000
