"""Export golden parity fixtures from the PyTorch reference.

Runs the reference model code (/root/reference, read-only) on CPU with seeded
random weights and inputs, and saves (state_dict, inputs, outputs) npz
fixtures under tests/fixtures/. The afft_tpu parity tests import the same
weights and assert fp32 agreement.

The reference expects CUDA and has deps missing in this image (timm, hydra,
omegaconf); this script stubs them before import. Nothing here ships in the
framework — it is a test-data generator only.

Usage: python tools/export_fixtures.py [outdir]
"""

import sys
import types
from pathlib import Path

import numpy as np
import torch

REFERENCE = "/root/reference"
OUTDIR = Path(sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures")


# ---------------------------------------------------------------------------
# dependency stubs + cpu patches
# ---------------------------------------------------------------------------

def install_stubs():
    # timm: only trunc_normal_ is used (reference models/fusion.py:13)
    import importlib.machinery
    timm = types.ModuleType("timm")
    timm.__spec__ = importlib.machinery.ModuleSpec("timm", None)
    timm_models = types.ModuleType("timm.models")
    timm_models.__spec__ = importlib.machinery.ModuleSpec("timm.models", None)
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.__spec__ = importlib.machinery.ModuleSpec(
        "timm.models.layers", None)
    timm_layers.trunc_normal_ = lambda t, std=1.0: torch.nn.init.trunc_normal_(
        t, std=std, a=-2.0, b=2.0)
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers

    # omegaconf: DictConfig used in isinstance checks; OmegaConf.get_type
    class DictConfig(dict):
        def __getattr__(self, k):
            try:
                v = self[k]
            except KeyError as e:
                raise AttributeError(k) from e
            return v

        def __setattr__(self, k, v):
            self[k] = v

    class ListConfig(list):
        pass

    class OmegaConf:
        @staticmethod
        def get_type(obj):
            if isinstance(obj, (list, ListConfig)):
                return list
            if isinstance(obj, (dict, DictConfig)):
                return dict
            return type(obj)

    omegaconf = types.ModuleType("omegaconf")
    omegaconf.DictConfig = DictConfig
    omegaconf.ListConfig = ListConfig
    omegaconf.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = omegaconf

    # hydra: utils.instantiate for _target_ dicts within the reference tree
    import importlib

    def instantiate(cfg, *args, **kwargs):
        kwargs.pop("_recursive_", None)
        if cfg is None:
            return None
        cfg = dict(cfg)
        if "_target_" not in cfg:
            # dict of sub-configs (e.g. per-modality reader_fn)
            return {k: instantiate(v) if isinstance(v, dict) else v
                    for k, v in cfg.items()}
        target = cfg.pop("_target_")
        cfg.pop("_recursive_", None)
        mod_name, _, attr = target.rpartition(".")
        fn = getattr(importlib.import_module(mod_name), attr)
        cfg.update(kwargs)
        return fn(*args, **{k: _wrap(v) for k, v in cfg.items()})

    def _wrap(v):
        if isinstance(v, dict) and "_target_" not in v:
            return DictConfig({k: _wrap(x) for k, x in v.items()})
        return v

    hydra = types.ModuleType("hydra")
    hydra.utils = types.ModuleType("hydra.utils")
    hydra.utils.instantiate = instantiate
    hydra.utils.call = instantiate
    hydra.types = types.ModuleType("hydra.types")
    hydra.types.TargetConf = dict
    sys.modules["hydra"] = hydra
    sys.modules["hydra.utils"] = hydra.utils
    sys.modules["hydra.types"] = hydra.types

    # modules imported at reference module scope but unused in these paths
    for name in ("lmdb", "submitit", "cv2", "wandb"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod

    # route the reference's hardcoded .to('cuda') / device='cuda' to cpu
    _orig_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        args = tuple("cpu" if a in ("cuda",) or (isinstance(a, torch.device)
                     and a.type == "cuda") else a for a in args)
        if kwargs.get("device") in ("cuda",):
            kwargs["device"] = "cpu"
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to

    _orig_arange = torch.arange

    def _arange(*args, **kwargs):
        if kwargs.get("device") in ("cuda",):
            kwargs["device"] = "cpu"
        return _orig_arange(*args, **kwargs)

    torch.arange = _arange


def sd_to_np(module):
    return {f"sd::{k}": v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


def save(name, module, inputs: dict, outputs: dict):
    OUTDIR.mkdir(parents=True, exist_ok=True)
    payload = {}
    if module is not None:
        payload.update(sd_to_np(module))
    for k, v in inputs.items():
        payload[f"in::{k}"] = np.asarray(v)
    for k, v in outputs.items():
        payload[f"out::{k}"] = np.asarray(v)
    np.savez(OUTDIR / f"{name}.npz", **payload)
    print(f"saved {name}: {len(payload)} arrays")


def flatten_outputs(out, prefix="", store=None):
    store = {} if store is None else store
    if isinstance(out, dict):
        for k, v in out.items():
            flatten_outputs(v, f"{prefix}{k}//", store)
    elif isinstance(out, torch.Tensor):
        store[prefix.rstrip("/")] = out.detach().cpu().numpy()
    return store


def main():
    install_stubs()
    sys.path.insert(0, REFERENCE)
    torch.manual_seed(0)

    from omegaconf import DictConfig
    import models.transformerblock as tb
    import models.fusion as fusion
    import models.feature_mapping as fm
    import models.future_prediction as fp
    from models.base_model import BaseModel

    torch.set_grad_enabled(False)

    B, T, C = 3, 6, 64
    mods = ["rgb", "objects", "flow"]

    def modal_feats(c=C, t=T):
        g = torch.Generator().manual_seed(7)
        return {m: torch.randn(B, t, c, generator=g) for m in mods}

    # ---- transformer block -------------------------------------------------
    torch.manual_seed(1)
    blk = tb.Block(dim=C, num_heads=4).eval()
    x = torch.randn(B, 5, C, generator=torch.Generator().manual_seed(2))
    y, attn = blk(x)
    save("block", blk, {"x": x}, {"y": y, "attn": attn})

    # block with additive mask
    mask = fusion.generate_square_subsequent_mask(5)
    y2, attn2 = blk(x, mask)
    save("block_causal", blk, {"x": x, "mask": mask}, {"y": y2, "attn": attn2})

    # ---- decoder block ------------------------------------------------------
    torch.manual_seed(11)
    dblk = tb.DecoderBlock(dim=C, num_heads=4).eval()
    mem = torch.randn(B, 5, C, generator=torch.Generator().manual_seed(3))
    yd = dblk(x, mem, mask)
    save("decoder_block", dblk, {"x": x, "mem": mem, "mask": mask}, {"y": yd})

    # ---- mappings -----------------------------------------------------------
    torch.manual_seed(21)
    lin = fm.Linear(32, C, use_layernorm=True, sparse_mapping=False).eval()
    xm = torch.randn(B, T, 32, generator=torch.Generator().manual_seed(4))
    save("mapping_linear", lin, {"x": xm}, {"y": lin(xm)})
    torch.manual_seed(22)
    gl = fm.GatedLinear(32, C, use_layernorm=True).eval()
    save("mapping_gated", gl, {"x": xm}, {"y": gl(xm)})
    torch.manual_seed(23)
    nl = fm.NonLinear(32, C, use_layernorm=True, activation="relu").eval()
    save("mapping_nonlinear", nl, {"x": xm}, {"y": nl(xm)})

    # ---- fusers -------------------------------------------------------------
    order_fn = lambda d: [d[m] for m in mods]  # noqa: E731

    torch.manual_seed(31)
    f1 = fusion.ModalTokenCMFuser(dim=C, depth=3, num_heads=4,
                                  modalities={m: C for m in mods}).eval()
    feats = modal_feats()
    y, attn = f1(feats, order_fn)
    save("fuser_modal_token", f1, feats, {"y": y, "attn": attn})

    torch.manual_seed(32)
    f1b = fusion.ModalTokenCMFuser(dim=C, depth=2, num_heads=4,
                                   modalities={m: C for m in mods},
                                   modal_encoding=True, cross_attn=True,
                                   frame_level_token=True,
                                   temporal_sequence_length=T).eval()
    y, attn = f1b(feats, order_fn)
    save("fuser_modal_token_variants", f1b, feats, {"y": y, "attn": attn})

    torch.manual_seed(33)
    f2 = fusion.CMFuser(dim=C, depth=2, num_heads=4).eval()
    y, attn = f2(feats, order_fn)
    save("fuser_cm", f2, feats, {"y": y, "attn": attn})

    torch.manual_seed(34)
    f3 = fusion.TemporalCMFuser(dim=C, depth=2, num_heads=4,
                                modalities={m: C for m in mods},
                                modal_encoding=True).eval()
    y, attn = f3(feats, order_fn)
    save("fuser_temporal", f3, feats, {"y": y, "attn": attn})

    torch.manual_seed(35)
    f4 = fusion.TemporalCrossAttentFuser(dim=C, modalities={m: C for m in mods},
                                         num_heads=4).eval()
    y, _ = f4(feats, order_fn)
    save("fuser_ca", f4, feats, {"y": y})

    torch.manual_seed(36)
    f5 = fusion.MATT(modal_dims={m: C for m in mods}, dim=C).eval()
    w = f5(feats, order_fn)
    save("fuser_matt", f5, feats, {"w": w})

    # ---- GPT-2 future predictor ---------------------------------------------
    torch.manual_seed(41)
    pred = fp.BaseFuturePredictor(in_features=C, inter_dim=C, n_layer=2,
                                  n_head=2).eval()
    xp = torch.randn(B, T, C, generator=torch.Generator().manual_seed(5))
    y1, _ = pred(xp, output_len=1)
    y3, _ = pred(xp, output_len=3)
    save("predictor", pred, {"x": xp}, {"y1": y1, "y3": y3})

    # ---- CMFP variants (full stacks) -----------------------------------------
    def model_cfg(share_pred=True, share_cls=True, mod_cls=False,
                  fusion_cls=True, fuser=None, mapping_ln=False):
        return DictConfig({
            "modal_dims": DictConfig({"rgb": 48, "objects": 20, "flow": 48}),
            "modal_feature_order": ["rgb", "objects", "audio", "poses", "flow"],
            "dropout": 0.2,
            "common": DictConfig({
                "in_features": 48, "fp_inter_dim": 64, "fp_output_len": 1,
                "share_classifiers": share_cls, "share_predictors": share_pred,
                "modality_cls": mod_cls, "fusion_cls": fusion_cls,
            }),
            "mapping": {"_target_": "models.feature_mapping.Linear",
                        "use_layernorm": mapping_ln, "sparse_mapping": True},
            "fuser": fuser or {
                "_target_": "models.fusion.ModalTokenCMFuser", "dim": 48,
                "depth": 2, "num_heads": 4,
                "modalities": {"rgb": 48, "objects": 20, "flow": 48}},
            "future_predictor": {
                "_target_": "models.future_prediction.BaseFuturePredictor",
                "in_features": 48, "inter_dim": 64, "n_layer": 2, "n_head": 2,
                "embd_pdrop": 0.1, "resid_pdrop": 0.1, "attn_pdrop": 0.1,
                "output_attentions": False},
        })

    num_classes = {"action": 17, "verb": 7, "noun": 9}

    def cmfp_inputs():
        g = torch.Generator().manual_seed(9)
        return {"rgb": torch.randn(B, T, 48, generator=g),
                "objects": torch.randn(B, T, 20, generator=g),
                "flow": torch.randn(B, T, 48, generator=g)}

    torch.manual_seed(51)
    early = fp.CMFPEarly(model_cfg(), num_classes).eval()
    zin = cmfp_inputs()
    out = early(dict(zin))
    out.pop("attentions", None)
    save("cmfp_early", early, zin, flatten_outputs(out))

    torch.manual_seed(52)
    indiv = fp.IndividualFuturePrediction(
        model_cfg(share_pred=False, share_cls=False, mod_cls=True,
                  fusion_cls=False), num_classes).eval()
    out = indiv(dict(zin))
    save("cmfp_individual", indiv, zin, flatten_outputs(out))

    torch.manual_seed(53)
    matt_fuser = {"_target_": "models.fusion.MATT",
                  "modal_dims": {"rgb": 48, "objects": 20, "flow": 48},
                  "dim": 48}
    score = fp.CMFPScoreFusion(
        model_cfg(share_pred=False, share_cls=False, mod_cls=True,
                  fusion_cls=False, fuser=matt_fuser), num_classes).eval()
    out = score(dict(zin))
    save("cmfp_scorefusion", score, zin, flatten_outputs(out))

    # ---- full BaseModel with reference 6D input layout -----------------------
    torch.manual_seed(61)
    cfg = model_cfg()
    cfg["common"]["backbones"] = DictConfig({
        m: {"_target_": "torch.nn.Identity"} for m in ["rgb", "objects", "flow"]})
    cfg["CMFP"] = {"_target_": "models.future_prediction.CMFPEarly",
                   "model_cfg": None}
    bm = BaseModel(cfg, num_classes=num_classes, class_mappings={}).eval()
    g = torch.Generator().manual_seed(10)
    vid = {"rgb": torch.randn(B, T, 48, 1, 1, 1, generator=g),
           "objects": torch.randn(B, T, 20, 1, 1, 1, generator=g),
           "flow": torch.randn(B, T, 48, 1, 1, 1, generator=g)}
    kwargs = dict(target=None, target_subclips=None,
                  target_subclips_ignore_index=None, mixup_fn=None)
    outs, _ = bm({k: v.clone() for k, v in vid.items()}, **kwargs)
    outs.pop("attentions", None)
    save("base_model", bm, vid, flatten_outputs(outs))

    # ---- loss stack (BasicLossAccuracy) --------------------------------------
    from common.runner import BasicLossAccuracy
    loss_fn = BasicLossAccuracy()
    g = torch.Generator().manual_seed(12)
    Bl, Tl, Cl = 6, 4, 11
    outputs = {
        "logits/action": {"all-fused": torch.randn(Bl, 1, Cl, generator=g)},
        "past_logits/action": {"all-fused": torch.randn(Bl, Tl, Cl,
                                                        generator=g)},
        "orig_past": {"all-fused": torch.randn(Bl, Tl, 8, generator=g)},
        "past_futures": {"all-fused": torch.randn(Bl, Tl, 8, generator=g)},
    }
    target = {"action": torch.tensor([0, 3, 5, 1, 10, 7])}
    subclips = {"action": torch.tensor(
        [[0, 0, 1, 1], [3, -1, 3, 3], [5, 5, 5, 5], [1, 1, -1, -1],
         [10, 9, 9, 10], [7, 7, 7, 7]]).unsqueeze(-1)}
    losses, metrics = loss_fn(outputs, target, subclips, mixup_enable=False)
    payload = {}
    for k, v in losses.items():
        payload[f"loss::{k}"] = v.mean().numpy()  # _reduce_loss means
    payload["metric::acc1"] = metrics["acc1_action_all-fused"].numpy()
    payload["metric::acc5"] = metrics["acc5_action_all-fused"].numpy()
    payload["mt5r::logits"] = metrics["mt5r_action_all-fused"]["logits"]
    payload["mt5r::labels"] = metrics["mt5r_action_all-fused"]["labels"]
    for k, v in outputs.items():
        for mk, t in v.items():
            payload[f"in::{k}::{mk}"] = t.numpy()
    payload["in::target"] = target["action"].numpy()
    payload["in::subclips"] = subclips["action"].numpy()
    np.savez(OUTDIR / "loss_basic.npz", **payload)
    print("saved loss_basic")

    # mixup-enabled loss path: one-hot targets + ignore masks
    from common import mixup as ref_mixup
    mix = ref_mixup.MixUp(alpha=0.5,
                          label_smoothing={"action": 0.4},
                          num_classes={"action": Cl})
    mix.mixup_beta_sampler = type("S", (), {
        "sample": staticmethod(lambda: torch.tensor(0.3))})()
    feats = {"rgb": torch.randn(Bl, Tl, 8, generator=g)}
    x_out, labels_out, subclips_out, ignore_idx = mix(
        feats, {"action": target["action"]}, subclips)
    payload = {
        "in::feats": feats["rgb"].numpy(),
        "in::target": target["action"].numpy(),
        "in::subclips": subclips["action"].numpy(),
        "out::feats": x_out["rgb"].numpy(),
        "out::labels": labels_out["action"].numpy(),
        "out::subclips": subclips_out["action"].numpy(),
        "out::ignore": ignore_idx["action"].numpy(),
    }
    losses2, metrics2 = loss_fn(
        outputs, {"action": labels_out["action"]},
        {"action": subclips_out["action"]}, mixup_enable=True,
        target_subclips_ignore_index={"action": ignore_idx["action"]})
    for k, v in losses2.items():
        payload[f"loss::{k}"] = v.mean().numpy()
    payload["metric::acc1"] = metrics2["acc1_action_all-fused"].numpy()
    payload["mt5r::logits"] = metrics2["mt5r_action_all-fused"]["logits"]
    payload["mt5r::labels"] = metrics2["mt5r_action_all-fused"]["labels"]
    np.savez(OUTDIR / "loss_mixup.npz", **payload)
    print("saved loss_mixup")

    print("all fixtures exported to", OUTDIR)


if __name__ == "__main__":
    main()
