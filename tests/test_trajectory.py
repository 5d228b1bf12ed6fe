"""End-to-end train-trajectory parity vs the reference training loop.

The fixture (tools/export_train_trajectory.py) drives the reference's REAL
composition — run_one_epoch (/root/reference/train.py:228-290), Runner
(common/runner.py:171-270), prepare_params (train.py:189-225),
SGD + Warmup(CosineLR) (train.py:336-362), MixUp with recorded Beta draws —
for 3 epochs x 10 iterations on synthetic batches with dropout off, plus a
4-batch validation pass per epoch.

Here the SAME batches replay through afft_tpu's own loop
(afft_tpu/train/loop.py:run_one_epoch + train/runner.py Runner) from the
imported initial weights, and must reproduce:

  * the per-iteration loss components and total loss,
  * the per-iteration learning-rate trace,
  * the per-epoch train/val tracker metrics (acc1/acc5/mt5r/losses),
  * the final weights after 30 optimizer steps.

Unlike the per-module golden fixtures (test_parity) and the isolated
optimizer/schedule/mixup trajectory tests (test_train), this asserts the
whole train stack COMPOSED — a divergence in any subsystem (loss weighting,
grad clipping, group lr/wd assignment, schedule stepping order, mixup
pairing, metric accumulation) shows up as a localized failure here.
"""

import os

import jax
import numpy as np
import pytest

from afft_tpu.models.base_model import BaseModel
from afft_tpu.parallel.mesh import make_mesh
from afft_tpu.train import loop as LP
from afft_tpu.train import optim as O
from afft_tpu.train import torch_import as TI
from afft_tpu.train.metrics import MetricTracker
from afft_tpu.train.mixup import MixUp
from afft_tpu.train.runner import Runner

B, T = 6, 6
EPOCHS, ITERS, VAL_ITERS = 3, 10, 4
MODS = ["rgb", "objects", "flow"]
DIMS = {"rgb": 48, "objects": 20, "flow": 48}
NUM_CLASSES = {"action": 17, "verb": 7, "noun": 9}
LR, WD = 0.02, 1e-4
LOSS_WTS = {"cls_action": 1.0, "cls_verb": 1.0, "cls_noun": 1.0,
            "past_cls_action": 1.0, "past_cls_verb": 1.0,
            "past_cls_noun": 1.0, "past_reg": 1.0}

def _fixture_path(variant):
    name = ("train_trajectory.npz" if variant == "early"
            else f"train_trajectory_{variant}.npz")
    return os.path.join(os.path.dirname(__file__), "fixtures", name)


def _model_cfg(variant="early"):
    """Mirror of tools/export_train_trajectory.py:model_cfg (dropouts 0)."""
    if variant == "individual":
        # expt-00: single rgb modality, IndividualFuturePrediction — no
        # mapping/fuser config keys (the reference skips both via
        # instantiate=False, future_prediction.py:196-199)
        return {
            "modal_dims": {"rgb": DIMS["rgb"]},
            "modal_feature_order": ["rgb", "objects", "audio", "poses",
                                    "flow"],
            "dropout": 0.0,
            "common": {
                "in_features": 48, "fp_inter_dim": 64, "fp_output_len": 1,
                "share_classifiers": False, "share_predictors": False,
                "modality_cls": True, "fusion_cls": False,
                "backbones": {"rgb": {"_target_": "torch.nn.Identity"}},
            },
            "future_predictor": {
                "_target_": "models.future_prediction.BaseFuturePredictor",
                "in_features": 48, "inter_dim": 64, "n_layer": 2,
                "n_head": 2, "embd_pdrop": 0.0, "resid_pdrop": 0.0,
                "attn_pdrop": 0.0, "output_attentions": False},
            "CMFP": {"_target_":
                     "models.future_prediction.IndividualFuturePrediction",
                     "model_cfg": None},
        }
    if variant == "matt":
        # expts/05_MATT composition: CMFPScoreFusion + MATT, per-modality
        # predictors/classifiers, no fusion token
        return {
            "modal_dims": dict(DIMS),
            "modal_feature_order": ["rgb", "objects", "audio", "poses",
                                    "flow"],
            "dropout": 0.0,
            "common": {
                "in_features": 48, "fp_inter_dim": 64, "fp_output_len": 1,
                "share_classifiers": False, "share_predictors": False,
                "modality_cls": True, "fusion_cls": False,
                "backbones": {m: {"_target_": "torch.nn.Identity"}
                              for m in MODS},
            },
            "mapping": {"_target_": "models.feature_mapping.Linear",
                        "use_layernorm": False, "sparse_mapping": True},
            "fuser": {"_target_": "models.fusion.MATT",
                      "modal_dims": dict(DIMS), "dim": 48,
                      "drop_rate": 0.0},
            "future_predictor": {
                "_target_": "models.future_prediction.BaseFuturePredictor",
                "in_features": 48, "inter_dim": 64, "n_layer": 2,
                "n_head": 2, "embd_pdrop": 0.0, "resid_pdrop": 0.0,
                "attn_pdrop": 0.0, "output_attentions": False},
            "CMFP": {"_target_": "models.future_prediction.CMFPScoreFusion",
                     "model_cfg": None},
        }
    # early/temporal/ca share the CMFPEarly shared-head stack and differ
    # only in the fuser group, exactly like reference expts 01/03/04
    fuser = {"_target_": "models.fusion.ModalTokenCMFuser", "dim": 48,
             "depth": 2, "num_heads": 4, "drop_rate": 0.0,
             "attn_drop_rate": 0.0, "drop_path_rate": 0.0,
             "modalities": dict(DIMS)}
    if variant == "temporal":
        fuser = {"_target_": "models.fusion.TemporalCMFuser", "dim": 48,
                 "depth": 2, "num_heads": 2, "embd_drop_rate": 0.0,
                 "drop_rate": 0.0, "attn_drop_rate": 0.0,
                 "drop_path_rate": 0.0, "modalities": dict(DIMS),
                 "modal_encoding": True, "frame_level_token": True,
                 "temporal_sequence_length": T}
    elif variant == "ca":
        fuser = {"_target_": "models.fusion.TemporalCrossAttentFuser",
                 "dim": 48, "num_heads": 2, "embd_drop_rate": 0.0,
                 "drop_rate": 0.0, "attn_drop_rate": 0.0,
                 "drop_path_rate": 0.0, "modalities": dict(DIMS)}
    return {
        "modal_dims": dict(DIMS),
        "modal_feature_order": ["rgb", "objects", "audio", "poses", "flow"],
        "dropout": 0.0,
        "common": {
            "in_features": 48, "fp_inter_dim": 64, "fp_output_len": 1,
            "share_classifiers": True, "share_predictors": True,
            "modality_cls": False, "fusion_cls": True,
            "backbones": {m: {"_target_": "torch.nn.Identity"}
                          for m in MODS},
        },
        "mapping": {"_target_": "models.feature_mapping.Linear",
                    "use_layernorm": False, "sparse_mapping": True},
        "fuser": fuser,
        "future_predictor": {
            "_target_": "models.future_prediction.BaseFuturePredictor",
            "in_features": 48, "inter_dim": 64, "n_layer": 2, "n_head": 2,
            "embd_pdrop": 0.0, "resid_pdrop": 0.0, "attn_pdrop": 0.0,
            "output_attentions": False},
        "CMFP": {"_target_": "models.future_prediction.CMFPEarly",
                 "model_cfg": None},
    }


def _batches(d, tag, n, lam=None, mods=MODS, pad_to=None):
    out = []
    for i in range(n):
        p = f"{tag}{i}::"
        batch = {
            "data_dict": {m: d[p + f"data::{m}"] for m in mods},
            "target": {t: d[p + f"target::{t}"] for t in NUM_CLASSES},
            "target_subclips": {t: d[p + f"sub::{t}"] for t in NUM_CLASSES},
            "valid": np.ones((B,), bool),
        }
        if lam is not None:
            # NaN = the reference's <=1-mixable-rows shortcut skipped the
            # draw (mixup.py:155-157); afft's lam:=1 shortcut makes the
            # injected value irrelevant there
            batch["mixup_lam"] = np.float32(
                1.0 if np.isnan(lam[i]) else lam[i])
        if pad_to is not None and pad_to > B:
            # the BatchLoader pad_final policy: fixed-shape batch, trailing
            # rows flagged invalid (never mixed, zero loss weight)
            pad = pad_to - B

            def _pad(x, fill):
                shape = (pad,) + x.shape[1:]
                return np.concatenate(
                    [x, np.full(shape, fill, x.dtype)], axis=0)
            batch["data_dict"] = {m: _pad(v, 0.0)
                                  for m, v in batch["data_dict"].items()}
            batch["target"] = {t: _pad(v, 0)
                               for t, v in batch["target"].items()}
            batch["target_subclips"] = {
                t: _pad(v, -1) for t, v in batch["target_subclips"].items()}
            batch["valid"] = np.concatenate(
                [batch["valid"], np.zeros((pad,), bool)])
        out.append(batch)
    return out


@pytest.fixture(scope="module",
                params=["early", "matt", "individual", "temporal", "ca",
                        "early-dp8"])
def trajectory(request):
    """Replay the fixture's batches through afft_tpu's loop; return both
    the reference records and the afft records. Five reference
    compositions: ``early`` (expt-01/02: CMFPEarly + ModalTokenCMFuser,
    shared heads, plain SGD), ``matt`` (expt-05: CMFPScoreFusion +
    MATT, per-modality heads, nesterov, past_cls_action weight 0),
    ``individual`` (expt-00: single-rgb IndividualFuturePrediction,
    lr_wd=null single group, nesterov, cosine T_max < total steps so the
    zero-lr tail branch runs through the loop), ``temporal`` (expt-03:
    CMFPEarly + TemporalCMFuser with pos/modality embeddings, n x n tiled
    causal mask, frame-level token slots) and ``ca`` (expt-04: CMFPEarly +
    TemporalCrossAttentFuser, rgb query stream over depth
    num_modalities-1 cross-attention DecoderBlocks).

    ``early-dp8`` replays the early leg DATA-PARALLEL on the full 8-device
    CPU mesh with B=6 batches padded to 8 rows (the BatchLoader pad_final
    policy), closing the DP==reference chain DIRECTLY instead of
    transitively via the 1-vs-8 equivalence in test_integration
    (VERDICT r4 next #5; reference DDP semantics, train.py:364-368)."""
    variant = request.param
    ndev = 1
    if variant.endswith("-dp8"):
        variant, ndev = variant[:-4], 8
        if len(jax.devices()) < ndev:
            pytest.skip("needs the 8-device CPU mesh (conftest XLA_FLAGS)")
    path = _fixture_path(variant)
    if not os.path.exists(path):
        pytest.skip(f"{os.path.basename(path)} missing; "
                    "run tools/export_train_trajectory.py")
    d = np.load(path)
    assert list(d["meta"]) == [B, T, EPOCHS, ITERS, VAL_ITERS]
    nesterov = variant != "early"
    mods = ["rgb"] if variant == "individual" else MODS
    loss_wts = dict(LOSS_WTS)
    if variant == "matt":
        loss_wts["past_cls_action"] = 0.0

    model = BaseModel(_model_cfg(variant), num_classes=NUM_CLASSES,
                      class_mappings={})
    sd0 = {k[5:]: d[k] for k in d.files if k.startswith("sd0::")}
    params = TI.import_base_model(model, sd0)

    if variant in ("individual", "temporal", "ca"):
        # expt-00/03/04's opt.lr_wd=null: one overall group
        # (train.py:196-199)
        groups = O.build_group_tree(params, None, LR, WD)
        group_lrs = {g.lr for g in jax.tree.leaves(groups)}
        assert group_lrs == {LR}, f"lr_wd=None must be one group: {group_lrs}"
    else:
        groups = O.build_group_tree(
            params, [["future_predictor.fuser", 0.01, 0.0]], LR, WD)
        group_lrs = {g.lr for g in jax.tree.leaves(groups)}
        assert group_lrs == {0.01, LR}, \
            f"lr_wd prefix rule failed to split groups: {group_lrs}"

    cos_epochs = 2 if variant == "individual" else EPOCHS
    optimizer = O.sgd(momentum=0.9, nesterov=nesterov)
    opt_state = optimizer.init(params, groups)
    lr_schedule = O.warmup_wrap(
        O.cosine_schedule(cos_epochs, ITERS, world_size=1, eta_min=1e-6),
        init_lr_ratio=0.01, num_epochs=1, iters_per_epoch=ITERS)
    mixup = MixUp(alpha=0.1,
                  label_smoothing={"action": 0.4, "verb": 0.01,
                                   "noun": 0.03},
                  num_classes=NUM_CLASSES)
    runner = Runner(model, optimizer, groups, loss_wts=loss_wts,
                    mixup=mixup, mixup_backbone=True, grad_clip=1.0)

    iter_losses, lr_trace = [], []
    orig_step = runner.train_step

    def recording_step(params, opt_state, batch, lr, base_lr, rng_key,
                       **kw):
        lr_trace.append(float(lr))
        out = orig_step(params, opt_state, batch, lr, base_lr, rng_key, **kw)
        iter_losses.append({k: float(v) for k, v in out[2].items()})
        return out

    runner.train_step = recording_step

    lam = d["lam"]
    pad_to = B + (-B % ndev) if ndev > 1 else None  # 6 -> 8 rows on dp8
    train_batches = _batches(d, "batch", EPOCHS * ITERS, lam=lam, mods=mods,
                             pad_to=pad_to)
    val_batches = _batches(d, "val", VAL_ITERS, mods=mods, pad_to=pad_to)

    mesh = make_mesh(jax.devices()[:ndev])
    tracker = MetricTracker(NUM_CLASSES)
    rng = jax.random.key(0)
    step = 0
    epoch_metrics = []
    for epoch in range(EPOCHS):
        tracker.reset()
        loader = train_batches[epoch * ITERS:(epoch + 1) * ITERS]
        params, opt_state, step, rng = LP.run_one_epoch(
            runner, mesh, params, opt_state, loader, tracker,
            is_training=True, lr_schedule=lr_schedule, base_lr=LR,
            step_counter=step, rng=rng)
        params, opt_state, _, _ = LP.run_one_epoch(
            runner, mesh, params, opt_state, val_batches, tracker,
            is_training=False)
        ep = {}
        for split, metrics in (("train", tracker.training_metrics),
                               ("val", tracker.validation_metrics)):
            for name, meter in metrics.items():
                if "T " in name:
                    continue
                v = meter.value
                if v is not None:
                    ep[name] = float(v)
        epoch_metrics.append(ep)

    return {"d": d, "iter_losses": iter_losses, "lr_trace": lr_trace,
            "epoch_metrics": epoch_metrics, "params": params,
            "model": model, "variant": variant}


def test_lr_trace_matches(trajectory):
    """warmup+cosine composed through prepare_params/build_group_tree: the
    overall-group lr the loop fed each step vs the reference optimizer's
    live lr (recorded before each iteration)."""
    d = trajectory["d"]
    np.testing.assert_allclose(trajectory["lr_trace"], d["lr::rest"],
                               rtol=1e-6, atol=1e-9)
    if trajectory["variant"] == "individual":
        # the individual fixture is built with cosine T_max < total steps
        # PRECISELY so the reference's past-T_max zero-lr branch
        # (common/scheduler.py:70-75) runs through the real loop — if a
        # regenerated fixture stopped containing zeros, this coverage would
        # silently vanish, so require the zeros unconditionally
        assert (d["lr::rest"] == 0.0).any(), \
            "individual fixture lost its zero-lr tail (regenerate with " \
            "cos_epochs < EPOCHS in tools/export_train_trajectory.py)"
    if (d["lr::rest"] == 0.0).any():
        # the zero-lr branch must be reproduced exactly, not just within
        # tolerance
        zero = d["lr::rest"] == 0.0
        got = np.asarray(trajectory["lr_trace"])
        assert (got[zero] == 0.0).all(), "zero-lr tail not exactly zero"


def test_per_iteration_losses_match(trajectory):
    """Every loss component, every iteration. First step is pure-forward
    parity; later steps compound optimizer parity, so tolerance grows with
    accumulated fp32 divergence."""
    d = trajectory["d"]
    got = trajectory["iter_losses"]
    keys = [k[6:] for k in d.files if k.startswith("iter::")
            and "total_loss" not in k and "acc" not in k]
    # step 0: forward-only agreement, tight
    for k in keys:
        np.testing.assert_allclose(
            got[0][k], d[f"iter::{k}"][0], rtol=1e-4, atol=1e-5,
            err_msg=f"iter 0 loss {k}")
    np.testing.assert_allclose(got[0]["total_loss"],
                               d["iter::total_loss"][0],
                               rtol=1e-5, atol=1e-5)
    # full trajectory: divergence must stay within fp32-accumulation noise
    ref_total = d["iter::total_loss"]
    got_total = np.array([r["total_loss"] for r in got])
    np.testing.assert_allclose(got_total, ref_total, rtol=2e-3, atol=2e-3,
                               err_msg="total loss trajectory")
    for k in keys:
        np.testing.assert_allclose(
            np.array([r[k] for r in got]), d[f"iter::{k}"],
            rtol=5e-3, atol=5e-3, err_msg=f"loss trajectory {k}")


def test_epoch_metrics_match(trajectory):
    """Epoch-end MetricTracker values: accs, mt5r, mean losses, train+val.

    Train acc/mt5r are excluded: under mixup the reference's top-2 merge
    (runner.py:62-74) picks the "second" class of UNMIXED rows (rows with
    ignore labels, excluded from mixing) from a fully-tied smoothed one-hot,
    where torch.topk's tie-break is arbitrary heap order (verified: label 11
    -> 10, label 4 -> 11 on torch 2.x CPU) while lax.top_k is lowest-index.
    The reference value for those rows is implementation noise, not
    semantics; the val metrics (no mixup, deterministic) and every train
    LOSS meter assert strictly instead."""
    d = trajectory["d"]
    tie_sensitive = ("train_acc1_", "train_acc5_", "train_mt5r_")
    compared = 0
    for e, ep in enumerate(trajectory["epoch_metrics"]):
        for key in d.files:
            if not key.startswith(f"ep{e}::"):
                continue
            name = key.split("::", 1)[1]
            if name.startswith(tie_sensitive):
                continue
            assert name in ep, f"epoch {e}: afft tracker missing {name}"
            np.testing.assert_allclose(
                ep[name], float(d[key]), rtol=5e-3, atol=5e-3,
                err_msg=f"epoch {e} metric {name}")
            compared += 1
    # 3 epochs x (7 train loss meters + 1 train total + >=13 val meters)
    assert compared >= 60, f"only {compared} metrics compared"


def test_final_params_match(trajectory):
    """After 30 SGD steps the weights must agree with the reference's final
    state dict — the strongest composed assertion (any systematic lr/wd/
    momentum/clip/mixup deviation integrates into the weights)."""
    d = trajectory["d"]
    sdF = {k[5:]: d[k] for k in d.files if k.startswith("sdF::")}
    want = TI.import_base_model(trajectory["model"], sdF)
    got = trajectory["params"]
    flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_want = {jax.tree_util.keystr(p): v
                 for p, v in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert len(flat_got) == len(flat_want)
    for path, g in flat_got:
        w = flat_want[jax.tree_util.keystr(path)]
        g, w = np.asarray(g), np.asarray(w)
        denom = max(np.linalg.norm(w), 1e-8)
        rel = np.linalg.norm(g - w) / denom
        assert rel < 2e-4, \
            f"{jax.tree_util.keystr(path)}: rel L2 drift {rel:.2e}"
