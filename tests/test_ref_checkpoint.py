"""Reference-format checkpoint drill (VERDICT r4 next #3).

Every prior import test fed `torch_import` golden state dicts or files
written by afft's own `torch_export`. This drill closes the last format gap
to the released zoo: it produces a `.pth` through the reference's OWN
`store_checkpoint` (/root/reference/train.py:156-167) — a DDP-wrapped
module whose state dict carries HuggingFace GPT-2 Conv1D/packed-qkv tensors
(models/transformerblock.py:21-22 layout inside the HF GPT2Model), plus
real SGD momentum and Warmup(CosineLR) scheduler states and the epoch
counter — and asserts that

  1. `torch_import.load_torch_checkpoint` + `import_base_model` reproduce
     the torch model's eval logits exactly (fp32 tolerance), and
  2. `tools/reproduce_reference.py` runs its import→evaluate→assert chain
     green on that reference-written file (the exact command a user of the
     released zoo would run).

The model is the 99_synth_smoke_val shape (rgb+flow dim 24, depth-2 fuser,
2-layer GPT-2) so the same checkpoint drives the real eval pipeline on the
synthetic packed dataset.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SYNTH = os.path.join(REPO, "tests", "fixtures", "synth")

B_EVAL, T = 4, 10
MODS = ("rgb", "flow")
DIM = 24


def _smoke_cfg_and_dataset():
    sys.path.insert(0, REPO)
    import run as run_mod
    from afft_tpu.config import compose
    from afft_tpu.data.loader import get_dataset
    from afft_tpu.train.loop import DATASET_EVAL_CFG_KEY, get_transforms

    overrides = run_mod.read_file_into_cli(
        os.path.join(REPO, "expts", "99_synth_smoke_val.txt"))
    cfg = compose(os.path.join(REPO, "afft_tpu", "conf"), overrides)
    ds = get_dataset(cfg[DATASET_EVAL_CFG_KEY], cfg.data_eval,
                     get_transforms(cfg, train=False), None)
    return cfg, ds


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    """Build the reference torch model at the smoke shape, run one real
    optimizer step (momentum buffers), wrap in DDP, and store through the
    reference's own store_checkpoint. Reference modules are imported behind
    a sys.path/sys.modules guard so the name-clashing `train`/`run` modules
    cannot leak into other tests."""
    if not os.path.exists(os.path.join(SYNTH, "annotations")):
        pytest.skip("synthetic dataset missing; run tools/synthetic.py")
    import torch

    cfg, ds = _smoke_cfg_and_dataset()
    num_classes = {k: len(v) for k, v in ds.classes.items()}
    class_mappings = {k: torch.from_numpy(np.asarray(v, np.float32))
                      for k, v in ds.class_mappings.items()}

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from export_fixtures import install_stubs, REFERENCE
    from export_train_trajectory import install_train_stubs
    install_stubs()
    install_train_stubs()

    # import the reference's train.py under a clash guard (the repo root
    # also has train.py/run.py and tests import `run`)
    saved_modules = dict(sys.modules)
    sys.path.insert(0, REFERENCE)
    try:
        for name in ("train", "run", "test"):
            m = sys.modules.get(name)
            if m is not None and not (getattr(m, "__file__", "") or "").startswith(
                    REFERENCE):
                del sys.modules[name]
        from omegaconf import DictConfig
        from models.base_model import BaseModel as RefBaseModel
        from common import scheduler as ref_sched
        import train as ref_train

        ref_cfg = DictConfig({
            # mirror of expts/99_synth_smoke_val.txt's model group
            "modal_dims": DictConfig({m: DIM for m in MODS}),
            "modal_feature_order": ["rgb", "objects", "audio", "poses",
                                    "flow"],
            "dropout": 0.2,
            "common": DictConfig({
                "in_features": DIM, "fp_inter_dim": 32, "fp_output_len": 1,
                "share_classifiers": True, "share_predictors": True,
                "modality_cls": False, "fusion_cls": True,
                "backbones": DictConfig({
                    m: {"_target_": "torch.nn.Identity"} for m in MODS}),
            }),
            "mapping": {"_target_": "models.feature_mapping.Linear",
                        "use_layernorm": False, "sparse_mapping": True},
            "fuser": {"_target_": "models.fusion.ModalTokenCMFuser",
                      "dim": DIM, "depth": 2, "num_heads": 2,
                      "drop_rate": 0.2, "attn_drop_rate": 0.2,
                      "drop_path_rate": 0.0,
                      "modalities": {m: DIM for m in MODS}},
            "future_predictor": {
                "_target_": "models.future_prediction.BaseFuturePredictor",
                "in_features": DIM, "inter_dim": 32, "n_layer": 2,
                "n_head": 2, "embd_pdrop": 0.1, "resid_pdrop": 0.1,
                "attn_pdrop": 0.1, "output_attentions": False},
            "CMFP": {"_target_": "models.future_prediction.CMFPEarly",
                     "model_cfg": None},
        })

        torch.manual_seed(1234)
        model = RefBaseModel(ref_cfg, num_classes=num_classes,
                             class_mappings=class_mappings)

        # the reference's real param-group construction + one genuine
        # backward/step so the stored optimizer state has momentum buffers
        param_groups = ref_train.prepare_params(
            model, [["future_predictor.fuser", 0.005, 0.0]], 0.01, 1e-6)
        optimizer = torch.optim.SGD(param_groups, lr=0.01, momentum=0.9,
                                    nesterov=True, weight_decay=1e-6)
        lr_scheduler = ref_sched.Warmup(
            optimizer,
            ref_sched.CosineLR(optimizer, num_epochs=1, eta_min=1e-6,
                               iters_per_epoch=5, world_size=1),
            init_lr_ratio=0.01, num_epochs=1, iters_per_epoch=5,
            world_size=1)
        g = torch.Generator().manual_seed(77)
        vid_train = {m: torch.randn(B_EVAL, T, DIM, 1, 1, 1, generator=g)
                     for m in MODS}
        model.train()
        outs, _ = model({k: v.clone() for k, v in vid_train.items()},
                        target=None, target_subclips=None,
                        target_subclips_ignore_index=None, mixup_fn=None)
        outs["logits/action"]["all-fused"].pow(2).mean().backward()
        optimizer.step()
        lr_scheduler.step()

        # DDP-unwrap path (train.py:157-159): prefer real DDP over gloo;
        # DataParallel hits the same unwrap branch if gloo is unavailable
        wrapped, pg = model, None
        try:
            import torch.distributed as tdist
            if not tdist.is_initialized():
                sync = tmp_path_factory.mktemp("pg") / "sync"
                tdist.init_process_group(
                    "gloo", init_method=f"file://{sync}", rank=0,
                    world_size=1)
                pg = tdist
            wrapped = torch.nn.parallel.DistributedDataParallel(model)
        except Exception:
            wrapped = torch.nn.DataParallel(model)
        assert isinstance(
            wrapped, (torch.nn.parallel.DistributedDataParallel,
                      torch.nn.DataParallel))

        path = tmp_path_factory.mktemp("refzoo") / "checkpoint_best.pth"
        ref_train.store_checkpoint(str(path), wrapped, optimizer,
                                   lr_scheduler, epoch=2)
        if pg is not None:
            pg.destroy_process_group()

        # reference eval logits on a fixed batch (dropout off via eval())
        model.eval()
        g = torch.Generator().manual_seed(33)
        vid = {m: torch.randn(B_EVAL, T, DIM, 1, 1, 1, generator=g)
               for m in MODS}
        with torch.no_grad():
            outs, _ = model({k: v.clone() for k, v in vid.items()},
                            target=None, target_subclips=None,
                            target_subclips_ignore_index=None,
                            mixup_fn=None)
        ref_logits = {
            t: outs[f"logits/{t}"]["all-fused"].numpy()
            for t in num_classes}
        feats = {m: vid[m][..., 0, 0, 0].numpy() for m in MODS}
    finally:
        # unwind the reference imports: drop every module loaded from
        # /root/reference and take REFERENCE back off sys.path
        sys.path.remove(REFERENCE)
        for name, mod in list(sys.modules.items()):
            if name not in saved_modules and (getattr(
                    mod, "__file__", "") or "").startswith(REFERENCE):
                del sys.modules[name]
        for name in ("train", "run", "test"):
            sys.modules.pop(name, None)
            if name in saved_modules and not (getattr(
                    saved_modules[name], "__file__", "") or "").startswith(
                    REFERENCE):
                sys.modules[name] = saved_modules[name]

    # raw torch verification the file really is reference-format: HF GPT-2
    # Conv1D tensors + optimizer/scheduler/epoch payload
    raw = torch.load(str(path), map_location="cpu", weights_only=False)
    assert set(raw) == {"model", "optimizer", "lr_scheduler", "epoch"}
    assert raw["epoch"] == 2
    qkv = [k for k in raw["model"] if k.endswith("attn.c_attn.weight")]
    assert qkv, f"no HF GPT-2 packed-qkv Conv1D keys in {list(raw['model'])[:8]}"
    # HF Conv1D stores (in, out) — packed qkv is (n_embd, 3*n_embd)
    w = raw["model"][qkv[0]]
    assert tuple(w.shape) == (32, 96)
    assert any("momentum_buffer" in v for v in
               raw["optimizer"]["state"].values()), "no momentum buffers"

    return {"path": str(path), "feats": feats, "ref_logits": ref_logits,
            "num_classes": num_classes}


def test_import_reference_checkpoint_logits_match(ref_ckpt):
    """torch_import on the reference-written .pth reproduces the torch
    eval logits for every target head."""
    _, ds = _smoke_cfg_and_dataset()
    from afft_tpu.config import compose
    import run as run_mod
    from afft_tpu.models import BaseModel
    from afft_tpu.train import torch_import as TI

    overrides = run_mod.read_file_into_cli(
        os.path.join(REPO, "expts", "99_synth_smoke_val.txt"))
    cfg = compose(os.path.join(REPO, "afft_tpu", "conf"), overrides)
    model = BaseModel(cfg.model, num_classes=ref_ckpt["num_classes"],
                      class_mappings=ds.class_mappings)
    sd = TI.load_torch_checkpoint(ref_ckpt["path"])
    params = TI.import_base_model(model, sd)
    out, _ = model.apply(params, dict(ref_ckpt["feats"]), train=False)
    for t, want in ref_ckpt["ref_logits"].items():
        got = np.asarray(out[f"logits/{t}"]["all-fused"])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"logits/{t}")


def test_reproduce_reference_runs_on_reference_written_pth(ref_ckpt):
    """The one-command parity tool consumes the reference-written file —
    the exact chain a released-zoo user runs."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import reproduce_reference as RR

    measured = RR.main([
        "--expt", "99_synth_smoke_val",
        "--ckpt", ref_ckpt["path"],
        "--metric", "atop1",
        "--expect", "0.0",
        "--tolerance", "1e9",
    ])
    assert np.isfinite(measured) and 0.0 <= measured <= 100.0
