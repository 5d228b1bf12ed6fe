"""Checkpoint round-trip, partial init, torch import merge, grad clip,
multi-step rollout config."""

import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from afft_tpu.config import compose
from afft_tpu.models import BaseModel
from afft_tpu.train import optim as O
from afft_tpu.train.checkpoint import (init_from_model, load_checkpoint,
                                       merge_matching, save_checkpoint)

CONF = "afft_tpu/conf"


def _tiny_model():
    cfg = compose(CONF, [
        "model.modal_dims={rgb:32, flow:32}",
        "model.common_dim=32",
        "model.common.fp_inter_dim=64",
        "model.common.fp_layers=2",
        "model.common.fp_heads=2",
        "model.fuser.depth=2",
        "model.fuser.num_heads=2",
    ])
    model = BaseModel(cfg.model, num_classes={"action": 11})
    return cfg, model


def test_checkpoint_roundtrip_identical_logits(tmp_path):
    cfg, model = _tiny_model()
    params = model.init(jax.random.key(0))
    groups = O.build_group_tree(params, None, 0.01, 1e-6)
    opt = O.sgd(momentum=0.9)
    opt_state = opt.init(params, groups)

    path = tmp_path / "ckpt"
    save_checkpoint(path, params, opt_state, epoch=3, step=42,
                    best_metric=1.5)
    ckpt = load_checkpoint(path)
    assert int(ckpt["epoch"]) == 3 and int(ckpt["step"]) == 42
    assert float(ckpt["best_metric"]) == 1.5

    feats = {m: jnp.ones((2, 5, 32)) for m in ("rgb", "flow")}
    out1, _ = model.apply(params, feats)
    out2, _ = model.apply(ckpt["model"], feats)
    np.testing.assert_array_equal(
        np.asarray(out1["logits/action"]["all-fused"]),
        np.asarray(out2["logits/action"]["all-fused"]))
    # optimizer state round-trips too (working resume)
    m1 = jax.tree.leaves(opt_state["momentum"])[0]
    m2 = jax.tree.leaves(ckpt["optimizer"]["momentum"])[0]
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_partial_init_prefix_filter(tmp_path):
    """modules_to_keep prefix filtering + shape-mismatch tolerance
    (reference train.py:55-103 semantics)."""
    cfg, model = _tiny_model()
    src = model.init(jax.random.key(1))
    dst = model.init(jax.random.key(2))

    merged, used = merge_matching(dst, src,
                                  modules_to_keep=["future_predictor.fuser"])
    # fuser leaves copied, everything else untouched
    np.testing.assert_array_equal(
        np.asarray(merged["future_predictor"]["fuser"]["modal_token"]),
        np.asarray(src["future_predictor"]["fuser"]["modal_token"]))
    assert not np.allclose(
        np.asarray(merged["future_predictor"]["dim_encoder"]["w"]),
        np.asarray(src["future_predictor"]["dim_encoder"]["w"]))
    assert all(k.startswith("future_predictor.fuser") for k in used)


def test_init_from_torch_pth(tmp_path, fixtures):
    """A torch-format .pth loads straight into params via init_from_model."""
    import torch
    sd, ins, outs = fixtures("base_model")
    ckpt_path = tmp_path / "ref.pth"
    torch.save({"model": {k: torch.from_numpy(np.array(v))
                          for k, v in sd.items()}}, ckpt_path)

    cfg = {
        "modal_dims": {"rgb": 48, "objects": 20, "flow": 48},
        "modal_feature_order": ["rgb", "objects", "audio", "poses", "flow"],
        "dropout": 0.2,
        "common": {"in_features": 48, "fp_inter_dim": 64, "fp_output_len": 1,
                   "share_classifiers": True, "share_predictors": True,
                   "modality_cls": False, "fusion_cls": True,
                   "backbones": None},
        "mapping": {"_target_": "models.feature_mapping.Linear",
                    "use_layernorm": False, "sparse_mapping": True},
        "fuser": {"_target_": "models.fusion.ModalTokenCMFuser", "dim": 48,
                  "depth": 2, "num_heads": 4,
                  "modalities": {"rgb": 48, "objects": 20, "flow": 48}},
        "future_predictor": {
            "_target_": "models.future_prediction.BaseFuturePredictor",
            "in_features": 48, "inter_dim": 64, "n_layer": 2, "n_head": 2,
            "embd_pdrop": 0.1, "resid_pdrop": 0.1, "attn_pdrop": 0.1,
            "output_attentions": False},
        "CMFP": {"_target_": "models.future_prediction.CMFPEarly",
                 "model_cfg": None},
    }
    model = BaseModel(cfg, num_classes={"action": 17, "verb": 7, "noun": 9})
    params = model.init(jax.random.key(0))
    params, used = init_from_model(model, params, [str(ckpt_path)])
    assert len(used) > 30
    video = {m: jnp.asarray(ins[m]) for m in ("rgb", "objects", "flow")}
    out, _ = model.apply(params, video)
    np.testing.assert_allclose(
        np.asarray(out["logits/action"]["all-fused"]),
        outs["logits/action//all-fused"], rtol=1e-5, atol=2e-5)


def test_grad_clip_limits_update_norm():
    from afft_tpu.train.runner import clip_by_global_norm
    grads = {"a": jnp.full((10,), 100.0), "b": jnp.full((5,), -50.0)}
    clipped = clip_by_global_norm(grads, 1.0)
    total = np.sqrt(sum(float((np.asarray(g) ** 2).sum())
                        for g in jax.tree.leaves(clipped)))
    assert total <= 1.0 + 1e-4


def test_fp_output_len_rollout_config():
    """fp_output_len > 1: multi-step future rollout through CMFP
    (reference models/future_prediction.py:387-415)."""
    cfg, _ = _tiny_model()
    cfg.model.common.set("fp_output_len", 3)
    model = BaseModel(cfg.model, num_classes={"action": 11})
    params = model.init(jax.random.key(0))
    feats = {m: jnp.ones((2, 5, 32)) for m in ("rgb", "flow")}
    out, _ = model.apply(params, feats)
    # future = z_hat[:, T-1:] -> (B, output_len, C); logits follow
    assert out["future"]["all-fused"].shape == (2, 3, 32)
    assert out["logits/action"]["all-fused"].shape == (2, 3, 11)
    assert out["past_futures"]["all-fused"].shape == (2, 5, 32)


def test_training_resume_continues(tmp_path, monkeypatch):
    """train.resume=true restores params/optimizer/epoch and continues
    (the reference stores this state but never reloads it; SURVEY §5.3)."""
    import shutil
    from run import read_file_into_cli
    from afft_tpu.config import compose as compose_cfg
    from afft_tpu.train.loop import main as train_main

    monkeypatch.chdir(os.path.dirname(os.path.dirname(__file__)))
    shutil.rmtree("checkpoints/CMFPEarly_ModalTokenCMFuser_rgb_flow_resume-t",
                  ignore_errors=True)
    ov = read_file_into_cli("expts/99_synth_smoke_train.txt")
    ov = [o for o in ov if not o.startswith("train.num_epochs")
          and not o.startswith("experiment_name")]
    ov += ["experiment_name=resume-t", "use_wandb=false", "workers=2"]

    train_main(compose_cfg("afft_tpu/conf", ov + ["train.num_epochs=1"]),
               interactive=False)
    ckpt_dir = "checkpoints/CMFPEarly_ModalTokenCMFuser_rgb_flow_resume-t"
    from afft_tpu.train.checkpoint import load_checkpoint
    first = load_checkpoint(os.path.join(ckpt_dir, "checkpoint_last"))
    assert int(first["epoch"]) == 1

    train_main(compose_cfg("afft_tpu/conf",
                           ov + ["train.num_epochs=2", "train.resume=true"]),
               interactive=False)
    second = load_checkpoint(os.path.join(ckpt_dir, "checkpoint_last"))
    assert int(second["epoch"]) == 2
    assert int(second["step"]) > int(first["step"])
    shutil.rmtree(ckpt_dir, ignore_errors=True)


def test_checkpoint_carries_schedule_state(tmp_path):
    """ReduceLROnPlateau scale/best/patience survive a checkpoint
    roundtrip (resume must not revert prior lr reductions)."""
    import jax.numpy as jnp
    from afft_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from afft_tpu.train.optim import plateau_schedule, warmup_wrap

    sched = warmup_wrap(plateau_schedule(mode="min", factor=0.5, patience=0),
                        num_epochs=0, iters_per_epoch=1)
    sched.observe(1.0)
    sched.observe(2.0)  # worse -> reduce
    assert sched.state_dict()["scale"] == 0.5

    params = {"w": jnp.zeros((2,))}
    save_checkpoint(tmp_path / "ck", params, {"m": jnp.zeros((2,))},
                    epoch=3, step=30, best_metric=0.5,
                    schedule_state=sched.state_dict())
    ckpt = load_checkpoint(tmp_path / "ck")
    fresh = warmup_wrap(plateau_schedule(mode="min", factor=0.5, patience=0),
                        num_epochs=0, iters_per_epoch=1)
    fresh.load_state_dict({k: v.item() if hasattr(v, "item") else v
                           for k, v in ckpt["schedule"].items()})
    assert fresh(1, 1.0) == 0.5  # t=1: past the (degenerate) warmup window
    assert fresh.state_dict()["best"] == 1.0


def test_checkpoint_layout_version_guard(tmp_path):
    """A checkpoint without the current qkv-layout version tag (i.e. written
    before the heads-major c_attn packing) must fail loudly, not silently
    scramble q/k/v (ADVICE r2)."""
    import orbax.checkpoint as ocp
    import numpy as np
    from afft_tpu.train import checkpoint as C

    params = {"w": np.ones((2, 2), np.float32)}
    C.save_checkpoint(tmp_path / "ck", params, {"m": np.zeros(2)},
                      epoch=0, step=0, best_metric=0.0)
    ckpt = C.load_checkpoint(tmp_path / "ck")
    assert int(ckpt["format_version"]) == C.CKPT_FORMAT_VERSION

    # simulate a pre-versioning checkpoint: payload with no format_version
    legacy = {"model": params, "optimizer": {"m": np.zeros(2)},
              "epoch": 0, "step": 0, "best_metric": 0.0}
    ocp.PyTreeCheckpointer().save((tmp_path / "legacy").absolute(), legacy,
                                  force=True)
    with pytest.raises(ValueError, match="layout version"):
        C.load_checkpoint(tmp_path / "legacy")


def test_checkpoint_overwrite_is_atomic(tmp_path, monkeypatch):
    """Overwriting a checkpoint must never leave a window with no complete
    checkpoint on disk: the write goes to <path>.new-tmp and a failure
    mid-write leaves the previous save untouched (orbax force=True deletes
    the target first, which this wrapper exists to avoid)."""
    import numpy as np
    from afft_tpu.train import checkpoint as C

    path = tmp_path / "ck"
    C.save_checkpoint(path, {"w": np.ones(3, np.float32)}, {"m": np.zeros(3)},
                      epoch=1, step=10, best_metric=0.1)

    # a second save whose orbax write blows up must not harm the first
    class Boom:
        def save(self, *a, **k):
            raise IOError("disk gone")
    monkeypatch.setattr(C, "_checkpointer", lambda: Boom())
    with pytest.raises(IOError):
        C.save_checkpoint(path, {"w": np.full(3, 2.0, np.float32)},
                          {"m": np.zeros(3)}, epoch=2, step=20,
                          best_metric=0.2)
    monkeypatch.undo()
    ckpt = C.load_checkpoint(path)
    assert int(ckpt["epoch"]) == 1  # the original survived

    # successful overwrite swaps in the new one and leaves no tmp litter
    C.save_checkpoint(path, {"w": np.full(3, 3.0, np.float32)},
                      {"m": np.zeros(3)}, epoch=3, step=30, best_metric=0.3)
    assert int(C.load_checkpoint(path)["epoch"]) == 3
    litter = [p.name for p in tmp_path.iterdir() if p.name != "ck"]
    assert litter == []


def test_checkpoint_old_tmp_recovery(tmp_path):
    """Crash between the two swap renames leaves the previous complete
    checkpoint under <path>.old-tmp; load_checkpoint recovers it."""
    import numpy as np
    from afft_tpu.train import checkpoint as C

    path = tmp_path / "ck"
    C.save_checkpoint(path, {"w": np.ones(3, np.float32)}, {"m": np.zeros(3)},
                      epoch=7, step=70, best_metric=0.7)
    path.rename(tmp_path / "ck.old-tmp")  # simulate the crash window
    ckpt = C.load_checkpoint(path)
    assert int(ckpt["epoch"]) == 7
    assert path.exists()


def test_async_checkpoint_coalesces_and_waits(tmp_path):
    """block=False saves land on disk after wait_for_pending_saves();
    newest payload per path wins (resume checkpoint cadence can outpace a
    slow disk without unbounded queueing)."""
    import numpy as np
    from afft_tpu.train import checkpoint as C

    path = tmp_path / "ck"
    for epoch in range(1, 6):
        C.save_checkpoint(path, {"w": np.full(3, float(epoch), np.float32)},
                          {"m": np.zeros(3)}, epoch=epoch, step=epoch * 10,
                          best_metric=float(epoch), block=False)
    C.wait_for_pending_saves()
    ckpt = C.load_checkpoint(path)
    assert int(ckpt["epoch"]) == 5
    np.testing.assert_array_equal(np.asarray(ckpt["model"]["w"]),
                                  np.full(3, 5.0, np.float32))


def test_async_checkpoint_error_surfaces(tmp_path, monkeypatch):
    """A writer-thread failure must raise on wait, not vanish."""
    import numpy as np
    from afft_tpu.train import checkpoint as C

    def boom(path, payload, epoch):
        raise IOError("disk gone")
    monkeypatch.setattr(C, "_write_and_swap", boom)
    C.save_checkpoint(tmp_path / "ck", {"w": np.ones(2, np.float32)},
                      {"m": np.zeros(2)}, epoch=1, step=1, best_metric=0.0,
                      block=False)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        C.wait_for_pending_saves()


def test_async_checkpoint_error_does_not_strand_queue(tmp_path, monkeypatch):
    """One failed write must not deadlock wait() nor drop later queued
    saves to other paths: the writer keeps draining after an error."""
    import numpy as np
    from afft_tpu.train import checkpoint as C

    real = C._write_and_swap

    def flaky(path, payload, epoch):
        if "bad" in str(path):
            raise IOError("disk gone")
        return real(path, payload, epoch)

    monkeypatch.setattr(C, "_write_and_swap", flaky)
    C.save_checkpoint(tmp_path / "bad", {"w": np.ones(2, np.float32)},
                      {"m": np.zeros(2)}, epoch=1, step=1, best_metric=0.0,
                      block=False)
    # The failure surfaces at the NEXT interaction with the saver — which
    # one depends on whether the writer thread has already attempted "bad"
    # when the second submit runs. Either way the "good" payload must be
    # queued (submit queues before re-raising stale errors) and wait()
    # must terminate.
    raised = []
    try:
        C.save_checkpoint(tmp_path / "good", {"w": np.ones(2, np.float32)},
                          {"m": np.zeros(2)}, epoch=2, step=2,
                          best_metric=0.0, block=False)
    except RuntimeError as e:
        raised.append(e)
    try:
        C.wait_for_pending_saves()  # must terminate AND surface the error
    except RuntimeError as e:
        raised.append(e)
    assert len(raised) == 1 and "async checkpoint" in str(raised[0])
    ckpt = C.load_checkpoint(tmp_path / "good")  # later save still landed
    assert int(ckpt["epoch"]) == 2


def test_to_host_tree_shares_and_handles_bf16():
    """Host leaves pass through uncopied (one D2H per epoch shared by
    best+last) and bf16 device leaves read back via the fp32-cast path."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np
    from afft_tpu.train.checkpoint import to_host_tree

    host = {"a": np.arange(4, dtype=np.float32)}
    out = to_host_tree(host)
    assert out["a"] is host["a"]  # no copy

    dev = {"b": jnp.asarray([1.5, 2.5], jnp.bfloat16),
           "c": jnp.arange(3, dtype=jnp.int32)}
    out = to_host_tree(dev)
    assert out["b"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(out["b"].astype(np.float32), [1.5, 2.5])
    np.testing.assert_array_equal(out["c"], [0, 1, 2])


def test_resume_reconciles_master_dtype(monkeypatch):
    """Resuming an fp32-master checkpoint under train.master_dtype=bfloat16
    must cast the restored state (Runner keys its cast-skipping and
    stochastic rounding off the config, so a dtype mismatch would silently
    disable the bf16-master path)."""
    import shutil
    import ml_dtypes
    import numpy as np
    from run import read_file_into_cli
    from afft_tpu.config import compose as compose_cfg
    from afft_tpu.train.loop import main as train_main
    from afft_tpu.train.checkpoint import load_checkpoint

    monkeypatch.chdir(os.path.dirname(os.path.dirname(__file__)))
    ckpt_dir = "checkpoints/CMFPEarly_ModalTokenCMFuser_rgb_flow_resume-md"
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    ov = read_file_into_cli("expts/99_synth_smoke_train.txt")
    ov = [o for o in ov if not o.startswith("train.num_epochs")
          and not o.startswith("experiment_name")]
    ov += ["experiment_name=resume-md", "use_wandb=false", "workers=2"]

    # epoch 1 with fp32 masters
    train_main(compose_cfg("afft_tpu/conf", ov + ["train.num_epochs=1"]),
               interactive=False)
    first = load_checkpoint(os.path.join(ckpt_dir, "checkpoint_last"))
    leaf32 = next(x for x in jax.tree.leaves(first["model"])
                  if np.issubdtype(np.asarray(x).dtype, np.floating))
    assert np.asarray(leaf32).dtype == np.float32

    # epoch 2 resumed under bf16-master: saved checkpoint must be bf16
    train_main(compose_cfg("afft_tpu/conf", ov + [
        "train.num_epochs=2", "train.resume=true",
        "model.compute_dtype=bfloat16", "train.master_dtype=bfloat16"]),
        interactive=False)
    second = load_checkpoint(os.path.join(ckpt_dir, "checkpoint_last"))
    assert int(second["epoch"]) == 2
    leaf16 = next(x for x in jax.tree.leaves(second["model"])
                  if np.asarray(x).dtype != np.int32
                  and not np.issubdtype(np.asarray(x).dtype, np.integer))
    assert np.asarray(leaf16).dtype == np.dtype(ml_dtypes.bfloat16)
    shutil.rmtree(ckpt_dir, ignore_errors=True)


def test_sigterm_preemption_checkpoints_and_resumes(monkeypatch):
    """Graceful preemption: SIGTERM mid-training exits cleanly with a
    fresh resume checkpoint (production TPU VMs get ~30 s notice), and
    train.resume=true finishes the run."""
    import shutil
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(__file__))
    monkeypatch.chdir(repo)
    ckpt_dir = "checkpoints/CMFPEarly_ModalTokenCMFuser_rgb_flow_preempt-t"
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    from run import read_file_into_cli
    ov = read_file_into_cli("expts/99_synth_smoke_train.txt")
    ov = [o for o in ov if not o.startswith("train.num_epochs")
          and not o.startswith("experiment_name")]
    ov += ["experiment_name=preempt-t", "use_wandb=false", "workers=2",
           "train.num_epochs=200"]  # far more than can finish

    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["JAX_PLATFORM_NAME"] = "cpu"
    proc = subprocess.Popen([sys.executable, "train.py"] + ov,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env,
                            cwd=repo)
    # wait until training is inside the epoch loop, then preempt; a
    # watchdog kills the child if it never logs (readline would block)
    import threading
    watchdog = threading.Timer(300, proc.kill)
    watchdog.start()
    deadline = time.time() + 240
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if "Epoch 2 of" in line or time.time() > deadline:
            break
    watchdog.cancel()
    proc.send_signal(signal.SIGTERM)
    try:
        # communicate() (not read+wait): an unbounded read would hang
        # forever if the regression under test keeps the child training
        out_rest, _ = proc.communicate(timeout=180)
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        proc.kill()
        raise AssertionError("preempted training did not exit:\n"
                             + "".join(lines[-20:]))
    out = "".join(lines) + out_rest
    assert rc == 0, f"rc={rc}\n{out[-2000:]}"
    assert "preemption: checkpoint saved" in out, out[-2000:]

    from afft_tpu.train.checkpoint import load_checkpoint
    ckpt = load_checkpoint(os.path.join(ckpt_dir, "checkpoint_last"))
    saved_epoch = int(ckpt["epoch"])
    assert 0 < saved_epoch < 200

    # resume completes the (shortened) run from the preemption point
    from afft_tpu.config import compose as compose_cfg
    from afft_tpu.train.loop import main as train_main
    ov2 = [o for o in ov if not o.startswith("train.num_epochs")]
    train_main(compose_cfg("afft_tpu/conf",
                           ov2 + [f"train.num_epochs={saved_epoch + 1}",
                                  "train.resume=true"]),
               interactive=False)
    final = load_checkpoint(os.path.join(ckpt_dir, "checkpoint_last"))
    assert int(final["epoch"]) == saved_epoch + 1
    shutil.rmtree(ckpt_dir, ignore_errors=True)


def test_pipelined_training_checkpoints_canonical_and_resumes(monkeypatch):
    """Under train.pipeline_stages>1 the loop stores predictor blocks
    natively stacked in memory (no per-step re-stack; VERDICT r4 #6) —
    but checkpoints must stay CANONICAL (per-layer block lists, loadable
    under any parallelism config), and resume must restack params AND
    optimizer momentum."""
    import shutil
    from run import read_file_into_cli
    from afft_tpu.config import compose as compose_cfg
    from afft_tpu.train.checkpoint import load_checkpoint
    from afft_tpu.train.loop import main as train_main

    monkeypatch.chdir(os.path.dirname(os.path.dirname(__file__)))
    exp_dir = "checkpoints/CMFPEarly_ModalTokenCMFuser_rgb_flow_pipe-ckpt-t"
    shutil.rmtree(exp_dir, ignore_errors=True)
    ov = read_file_into_cli("expts/99_synth_smoke_train.txt")
    ov = [o for o in ov if not o.startswith("train.num_epochs")
          and not o.startswith("experiment_name")]
    ov += ["experiment_name=pipe-ckpt-t", "use_wandb=false", "workers=2",
           "train.pipeline_stages=2"]  # fp_layers=2 -> 1 layer per stage

    train_main(compose_cfg("afft_tpu/conf", ov + ["train.num_epochs=1"]),
               interactive=False)
    first = load_checkpoint(os.path.join(exp_dir, "checkpoint_last"))
    assert int(first["epoch"]) == 1
    blocks = first["model"]["future_predictor"]["future_predictor"][
        "shared"]["blocks"]
    assert isinstance(blocks, list) and len(blocks) == 2, type(blocks)
    mom_blocks = first["optimizer"]["momentum"]["future_predictor"][
        "future_predictor"]["shared"]["blocks"]
    assert isinstance(mom_blocks, list) and len(mom_blocks) == 2

    # resume restacks and continues pipelined
    train_main(compose_cfg("afft_tpu/conf",
                           ov + ["train.num_epochs=2", "train.resume=true"]),
               interactive=False)
    second = load_checkpoint(os.path.join(exp_dir, "checkpoint_last"))
    assert int(second["epoch"]) == 2
    assert int(second["step"]) > int(first["step"])
    # ...and the resumed checkpoint is canonical again
    blocks2 = second["model"]["future_predictor"]["future_predictor"][
        "shared"]["blocks"]
    assert isinstance(blocks2, list) and len(blocks2) == 2
    shutil.rmtree(exp_dir, ignore_errors=True)
