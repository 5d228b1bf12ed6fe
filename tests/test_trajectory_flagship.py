"""Flagship-scale composed trajectory parity — opt-in slow leg
(VERDICT r4 next #7).

The toy-dim legs in test_trajectory.py assert the composed train stack
per-iteration, but at dims 48/64 they cannot surface accumulation-order
divergences (fp32 sums over 2048-wide reductions, 3806-class softmax
normalizers, grad-norm accumulation across 388M params). This leg runs the
REAL expts/01_SA-Fuser_ek100_train.txt shapes — 4 modalities at real dims,
dim-1024 depth-6 fuser, n_embd=2048 6-layer GPT-2, 3806 actions — through
the reference loop (tools/export_train_trajectory.py with
AFFT_TRAJ_FLAGSHIP=1, run in a subprocess so torch's ~5 GB stays out of
this process) for 1 epoch x 5 iterations at B=4, then replays through
afft_tpu's loop and asserts per-iteration losses, the lr trace, and final
weights.

Opt-in: AFFT_SLOW=1 (fixture export ~6 GB tmp disk + the flagship XLA CPU
compile; minutes warm, tens of minutes on a cold .jax_cache). Everything
runs fp32 on CPU (conftest pins highest matmul precision).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("AFFT_SLOW"),
    reason="flagship-scale trajectory leg: opt-in via AFFT_SLOW=1 "
           "(minutes of CPU, ~6 GB tmp disk)")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

B, T = 4, 16
EPOCHS, ITERS, VAL_ITERS = 1, 5, 1
MODS = ["rgb", "objects", "audio", "flow"]
DIMS = {"rgb": 1024, "objects": 352, "audio": 1024, "flow": 1024}
NUM_CLASSES = {"action": 3806}
LR, WD = 0.02, 1e-4


@pytest.fixture(scope="module")
def flagship_trajectory(tmp_path_factory):
    import jax
    from afft_tpu.models.base_model import BaseModel
    from afft_tpu.parallel.mesh import make_mesh
    from afft_tpu.train import loop as LP
    from afft_tpu.train import optim as O
    from afft_tpu.train import torch_import as TI
    from afft_tpu.train.metrics import MetricTracker
    from afft_tpu.train.mixup import MixUp
    from afft_tpu.train.runner import Runner

    outdir = os.environ.get("AFFT_TRAJ_FLAGSHIP_DIR") \
        or str(tmp_path_factory.mktemp("traj_flagship"))
    path = os.path.join(outdir, "train_trajectory_flagship.npz")
    if not os.path.exists(path):
        env = dict(os.environ, AFFT_TRAJ_FLAGSHIP="1")
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "export_train_trajectory.py"),
             outdir, "early"],
            check=True, env=env, cwd=REPO, timeout=3600)
    d = np.load(path)
    assert list(d["meta"]) == [B, T, EPOCHS, ITERS, VAL_ITERS]

    model_cfg = {
        "modal_dims": dict(DIMS),
        "modal_feature_order": ["rgb", "objects", "audio", "poses", "flow"],
        "dropout": 0.0,
        "common": {
            "in_features": 1024, "fp_inter_dim": 2048, "fp_output_len": 1,
            "share_classifiers": True, "share_predictors": True,
            "modality_cls": False, "fusion_cls": True,
            "backbones": {m: {"_target_": "torch.nn.Identity"}
                          for m in MODS},
        },
        "mapping": {"_target_": "models.feature_mapping.Linear",
                    "use_layernorm": False, "sparse_mapping": True},
        "fuser": {"_target_": "models.fusion.ModalTokenCMFuser",
                  "dim": 1024, "depth": 6, "num_heads": 4, "drop_rate": 0.0,
                  "attn_drop_rate": 0.0, "drop_path_rate": 0.0,
                  "modalities": dict(DIMS)},
        "future_predictor": {
            "_target_": "models.future_prediction.BaseFuturePredictor",
            "in_features": 1024, "inter_dim": 2048, "n_layer": 6,
            "n_head": 4, "embd_pdrop": 0.0, "resid_pdrop": 0.0,
            "attn_pdrop": 0.0, "output_attentions": False},
        "CMFP": {"_target_": "models.future_prediction.CMFPEarly",
                 "model_cfg": None},
    }
    model = BaseModel(model_cfg, num_classes=NUM_CLASSES, class_mappings={})
    sd0 = {k[5:]: d[k] for k in d.files if k.startswith("sd0::")}
    params = TI.import_base_model(model, sd0)
    del sd0

    groups = O.build_group_tree(
        params, [["future_predictor.fuser", 0.01, 0.0]], LR, WD)
    optimizer = O.sgd(momentum=0.9, nesterov=False)
    opt_state = optimizer.init(params, groups)
    lr_schedule = O.warmup_wrap(
        O.cosine_schedule(EPOCHS, ITERS, world_size=1, eta_min=1e-6),
        init_lr_ratio=0.01, num_epochs=1, iters_per_epoch=ITERS)
    mixup = MixUp(alpha=0.1, label_smoothing={"action": 0.4},
                  num_classes=NUM_CLASSES)
    runner = Runner(model, optimizer, groups,
                    loss_wts={"cls_action": 1.0, "past_cls_action": 1.0,
                              "past_reg": 1.0, "cls_verb": 1.0,
                              "cls_noun": 1.0, "past_cls_verb": 1.0,
                              "past_cls_noun": 1.0},
                    mixup=mixup, mixup_backbone=True, grad_clip=1.0)

    iter_losses, lr_trace = [], []
    orig_step = runner.train_step

    def recording_step(params, opt_state, batch, lr, base_lr, rng_key, **kw):
        lr_trace.append(float(lr))
        out = orig_step(params, opt_state, batch, lr, base_lr, rng_key, **kw)
        iter_losses.append({k: float(v) for k, v in out[2].items()})
        return out

    runner.train_step = recording_step

    lam = d["lam"]

    def batches(tag, n, with_lam):
        out = []
        for i in range(n):
            p = f"{tag}{i}::"
            batch = {
                "data_dict": {m: d[p + f"data::{m}"] for m in MODS},
                "target": {t: d[p + f"target::{t}"] for t in NUM_CLASSES},
                "target_subclips": {t: d[p + f"sub::{t}"]
                                    for t in NUM_CLASSES},
                "valid": np.ones((B,), bool),
            }
            if with_lam:
                batch["mixup_lam"] = np.float32(
                    1.0 if np.isnan(lam[i]) else lam[i])
            out.append(batch)
        return out

    mesh = make_mesh(jax.devices()[:1])
    tracker = MetricTracker(NUM_CLASSES)
    params, opt_state, _, _ = LP.run_one_epoch(
        runner, mesh, params, opt_state,
        batches("batch", ITERS, with_lam=True), tracker,
        is_training=True, lr_schedule=lr_schedule, base_lr=LR,
        step_counter=0, rng=jax.random.key(0))
    return {"d": d, "iter_losses": iter_losses, "lr_trace": lr_trace,
            "params": params, "model": model}


def test_flagship_lr_trace_matches(flagship_trajectory):
    d = flagship_trajectory["d"]
    np.testing.assert_allclose(flagship_trajectory["lr_trace"],
                               d["lr::rest"], rtol=1e-6, atol=1e-9)


def test_flagship_per_iteration_losses_match(flagship_trajectory):
    """Five composed optimizer steps at the real 388M-param shapes: loss
    components must track the reference within fp32-accumulation noise at
    these reduction widths (2048-wide sums, 3806-class normalizers)."""
    d = flagship_trajectory["d"]
    got = flagship_trajectory["iter_losses"]
    keys = [k[6:] for k in d.files if k.startswith("iter::")
            and "total_loss" not in k and "acc" not in k]
    for k in keys:
        np.testing.assert_allclose(
            got[0][k], d[f"iter::{k}"][0], rtol=3e-4, atol=3e-5,
            err_msg=f"iter 0 loss {k}")
    for i in range(ITERS):
        np.testing.assert_allclose(
            got[i]["total_loss"], d["iter::total_loss"][i],
            rtol=2e-3, atol=2e-3, err_msg=f"iter {i} total_loss")


def test_flagship_final_weights_match(flagship_trajectory):
    """Every weight leaf after 5 flagship-scale optimizer steps, compared
    by name through the same torch-import pairing the toy legs use.
    Tolerance reflects 5 steps of fp32 reduction-order divergence at
    2048-wide accumulations; an accumulation-order BUG (e.g. a bf16 pass
    hiding in the fp32 path) shows up orders of magnitude above this."""
    import jax
    from afft_tpu.train import torch_import as TI

    d = flagship_trajectory["d"]
    sdF = {k[5:]: d[k] for k in d.files if k.startswith("sdF::")}
    want = TI.import_base_model(flagship_trajectory["model"], sdF)
    got = flagship_trajectory["params"]
    flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_want = {jax.tree_util.keystr(p): v
                 for p, v in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert len(flat_got) == len(flat_want)
    for path, g in flat_got:
        w = flat_want[jax.tree_util.keystr(path)]
        g, w = np.asarray(g), np.asarray(w)
        denom = max(np.linalg.norm(w), 1e-8)
        rel = np.linalg.norm(g - w) / denom
        assert rel < 1e-3, \
            f"{jax.tree_util.keystr(path)}: rel L2 drift {rel:.2e}"
