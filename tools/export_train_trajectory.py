"""Export an end-to-end TRAIN-TRAJECTORY fixture from the torch reference.

This drives the reference's REAL training composition — `run_one_epoch`
(/root/reference/train.py:228-290), `Runner` (common/runner.py:171-270),
`prepare_params` (train.py:189-225), SGD + Warmup(CosineLR) instantiation
(train.py:336-362), `MixUp` (common/mixup.py:90-182) and `MetricTracker`
(common/metric_tracking.py) — on synthetic batches for EPOCHS x ITERS
iterations with every dropout at 0 and deterministic mixup draws, and
records:

  * the initial and final state dicts,
  * every batch (features, targets, per-frame subclip labels with -1
    ignores),
  * the per-iteration lambda the mixup sampler actually drew (NaN when the
    <=1-mixable-rows shortcut skipped sampling, mixup.py:155-157),
  * per-iteration loss components + total and the per-group LR trace,
  * per-epoch train/val metric-tracker values (acc1/acc5/mt5r/losses).

tests/test_trajectory.py replays the identical batches through afft_tpu's
own loop (afft_tpu/train/loop.py:run_one_epoch + train/runner.py) from the
imported initial weights and asserts per-iteration and end-state agreement.
This is the one test that exercises the whole train stack COMPOSED, not
module-by-module.

Two variants (both exported by default):

  * ``early`` — CMFPEarly + ModalTokenCMFuser, shared predictor/classifier,
    fusion_cls, plain SGD (the expt-01/02 composition).
  * ``matt`` — CMFPScoreFusion + MATT, per-modality predictors and
    classifiers, modality_cls, nesterov SGD, past_cls_action weight 0
    (the expt-05 composition, reference expts/05_MATT_ek100_train.txt).
  * ``individual`` — IndividualFuturePrediction on a SINGLE rgb modality
    (no fuser, no mapping), per-modality heads, nesterov SGD with the
    `opt.lr_wd=null` single-group path (prepare_params :196-199), and a
    cosine horizon SHORTER than training (scheduler.num_epochs=2 vs 3
    epochs) so the reference CosineLR's past-T_max zero-lr branch
    (common/scheduler.py:70-75) runs through the real loop — the expt-00
    composition, reference expts/00_RGB_TSN_ek100_train.txt (warmup 20 <
    scheduler 30 < train 50 epochs there).
  * ``temporal`` — CMFPEarly + TemporalCMFuser with modal_encoding +
    frame_level_token + temporal_sequence_length=T (the expt-03 T-SA-Fuser
    composition: pos/modality embeddings, n x n tiled causal mask, token
    slots as output), lr_wd=null, nesterov.
  * ``ca`` — CMFPEarly + TemporalCrossAttentFuser (the expt-04 CA-Fuser
    composition: rgb query stream, depth = num_modalities - 1 cross-attent
    DecoderBlocks with causal masks), lr_wd=null, nesterov.

Usage: python tools/export_train_trajectory.py [outdir]
       [early|matt|individual|temporal|ca ...]
"""

import os
import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))
from export_fixtures import install_stubs  # noqa: E402

REFERENCE = "/root/reference"
ALL_VARIANTS = ("early", "matt", "individual", "temporal", "ca")
_args = [a for a in sys.argv[1:]]
VARIANTS = tuple(a for a in _args if a in ALL_VARIANTS) or ALL_VARIANTS
_dirs = [a for a in _args if a not in ALL_VARIANTS + ("all",)]
OUTDIR = Path(_dirs[0] if _dirs else "tests/fixtures")

# trajectory shape (toy: every leg asserts per-iteration, CI-fast)
B, T = 6, 6
EPOCHS, ITERS, VAL_ITERS = 3, 10, 4
MODS = ["rgb", "objects", "flow"]
DIMS = {"rgb": 48, "objects": 20, "flow": 48}
NUM_CLASSES = {"action": 17, "verb": 7, "noun": 9}
# model dims (model_cfg); overridden by the flagship block below
IN_F, FP_INTER, FP_LAYERS, FP_HEADS = 48, 64, 2, 2
FUSER_DEPTH = 2
FLAGSHIP = bool(os.environ.get("AFFT_TRAJ_FLAGSHIP"))
if FLAGSHIP:
    # AFFT_TRAJ_FLAGSHIP=1: the expts/01_SA-Fuser_ek100_train.txt shapes —
    # 4 modalities at real dims, dim-1024 depth-6 fuser, n_embd=2048
    # 6-layer GPT-2, 3806 actions — for ~5 iterations (the opt-in slow leg
    # in tests/test_trajectory_flagship.py: catches accumulation-order
    # divergences the toy dims can't). 'early' variant only; per-step
    # state-dict snapshots are skipped (3 x 1.5 GB).
    B, T = 4, 16
    EPOCHS, ITERS, VAL_ITERS = 1, 5, 1
    MODS = ["rgb", "objects", "audio", "flow"]
    DIMS = {"rgb": 1024, "objects": 352, "audio": 1024, "flow": 1024}
    NUM_CLASSES = {"action": 3806}
    IN_F, FP_INTER, FP_LAYERS, FP_HEADS = 1024, 2048, 6, 4
    FUSER_DEPTH = 6
    VARIANTS = ("early",)
LR, WD = 0.02, 1e-4
FUSER_LR, FUSER_WD = 0.01, 0.0
GRAD_CLIP = 1.0
MIXUP_ALPHA = 0.1
LABEL_SMOOTHING = {"action": 0.4, "verb": 0.01, "noun": 0.03}
LOSS_WTS = {"cls_action": 1.0, "cls_verb": 1.0, "cls_noun": 1.0,
            "past_cls_action": 1.0, "past_cls_verb": 1.0,
            "past_cls_noun": 1.0, "past_reg": 1.0}


def model_cfg(DictConfig, variant="early"):
    """Small CMFP stack, every dropout 0 (determinism)."""
    if variant == "individual":
        # expt-00: single rgb modality, IndividualFuturePrediction — no
        # mapping/fuser keys AT ALL (instantiate=False skips them,
        # future_prediction.py:196-199); rgb dim 48 != fp_inter_dim 64 so
        # the per-modality dim codec is a real Linear, not Identity
        return DictConfig({
            "modal_dims": DictConfig({"rgb": DIMS["rgb"]}),
            "modal_feature_order": ["rgb", "objects", "audio", "poses",
                                    "flow"],
            "dropout": 0.0,
            "common": DictConfig({
                "in_features": 48, "fp_inter_dim": 64, "fp_output_len": 1,
                "share_classifiers": False, "share_predictors": False,
                "modality_cls": True, "fusion_cls": False,
                "backbones": DictConfig(
                    {"rgb": {"_target_": "torch.nn.Identity"}}),
            }),
            "future_predictor": {
                "_target_": "models.future_prediction.BaseFuturePredictor",
                "in_features": 48, "inter_dim": 64, "n_layer": 2,
                "n_head": 2, "embd_pdrop": 0.0, "resid_pdrop": 0.0,
                "attn_pdrop": 0.0, "output_attentions": False},
            "CMFP": {"_target_":
                     "models.future_prediction.IndividualFuturePrediction",
                     "model_cfg": None},
        })
    if variant == "matt":
        return DictConfig({
            "modal_dims": DictConfig(dict(DIMS)),
            "modal_feature_order": ["rgb", "objects", "audio", "poses",
                                    "flow"],
            "dropout": 0.0,
            "common": DictConfig({
                "in_features": 48, "fp_inter_dim": 64, "fp_output_len": 1,
                "share_classifiers": False, "share_predictors": False,
                "modality_cls": True, "fusion_cls": False,
                "backbones": DictConfig({
                    m: {"_target_": "torch.nn.Identity"} for m in MODS}),
            }),
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
        })
    # early (expt-01/02) and the two temporal-fuser compositions (expt-03
    # T-SA-Fuser, expt-04 CA-Fuser) share the CMFPEarly shared-head stack
    # and differ only in the fuser group — exactly like the expt files
    fuser = {"_target_": "models.fusion.ModalTokenCMFuser", "dim": IN_F,
             "depth": FUSER_DEPTH, "num_heads": 4, "drop_rate": 0.0,
             "attn_drop_rate": 0.0, "drop_path_rate": 0.0,
             "modalities": dict(DIMS)}
    if variant == "temporal":
        # expts/03_T-SA-Fuser_ek100_train.txt fuser overrides at toy scale:
        # modal_encoding + frame_level_token + temporal_sequence_length=T
        fuser = {"_target_": "models.fusion.TemporalCMFuser", "dim": 48,
                 "depth": 2, "num_heads": 2, "embd_drop_rate": 0.0,
                 "drop_rate": 0.0, "attn_drop_rate": 0.0,
                 "drop_path_rate": 0.0, "modalities": dict(DIMS),
                 "modal_encoding": True, "frame_level_token": True,
                 "temporal_sequence_length": T}
    elif variant == "ca":
        # expts/04_CA-Fuser_ek100_train.txt: depth = num_modalities - 1,
        # rgb query stream (conf/model/fuser/CA-Fuser.yaml)
        fuser = {"_target_": "models.fusion.TemporalCrossAttentFuser",
                 "dim": 48, "num_heads": 2, "embd_drop_rate": 0.0,
                 "drop_rate": 0.0, "attn_drop_rate": 0.0,
                 "drop_path_rate": 0.0, "modalities": dict(DIMS)}
    return DictConfig({
        "modal_dims": DictConfig(dict(DIMS)),
        "modal_feature_order": ["rgb", "objects", "audio", "poses", "flow"],
        "dropout": 0.0,
        "common": DictConfig({
            "in_features": IN_F, "fp_inter_dim": FP_INTER,
            "fp_output_len": 1,
            "share_classifiers": True, "share_predictors": True,
            "modality_cls": False, "fusion_cls": True,
            "backbones": DictConfig({
                m: {"_target_": "torch.nn.Identity"} for m in MODS}),
        }),
        "mapping": {"_target_": "models.feature_mapping.Linear",
                    "use_layernorm": False, "sparse_mapping": True},
        "fuser": fuser,
        "future_predictor": {
            "_target_": "models.future_prediction.BaseFuturePredictor",
            "in_features": IN_F, "inter_dim": FP_INTER,
            "n_layer": FP_LAYERS, "n_head": FP_HEADS,
            "embd_pdrop": 0.0, "resid_pdrop": 0.0, "attn_pdrop": 0.0,
            "output_attentions": False},
        "CMFP": {"_target_": "models.future_prediction.CMFPEarly",
                 "model_cfg": None},
    })


def make_batches(n, seed, tag, mods=None):
    """Synthetic batches in the collated BaseVideoDataset output layout the
    reference Runner consumes (common/runner.py:226-236): 6D features, target
    dict, (B,T,1) subclip labels with -1 ignores shared across targets."""
    mods = MODS if mods is None else mods
    g = torch.Generator().manual_seed(seed)
    batches = []
    for i in range(n):
        data_dict = {m: torch.randn(B, T, DIMS[m], 1, 1, 1, generator=g)
                     for m in mods}
        target = {t: torch.randint(0, c, (B,), generator=g)
                  for t, c in NUM_CLASSES.items()}
        sub = {t: torch.randint(0, c, (B, T, 1), generator=g)
               for t, c in NUM_CLASSES.items()}
        # ignore (-1) pattern shared across targets, like real vidseg labels
        # (frames before any segment are -1 for every target)
        if tag == "train" and i % 10 == 5:
            # exercise the <=1-mixable-rows shortcut (mixup.py:155-157)
            ign = torch.ones(B, T, 1, dtype=torch.bool)
            ign[0] = False
        else:
            ign = torch.rand(B, T, 1, generator=g) < 0.15
        for t in sub:
            sub[t] = torch.where(ign, torch.tensor(-1), sub[t])
        batches.append({"data_dict": data_dict, "target": target,
                        "target_subclips": sub})
    return batches


class ListLoader(list):
    batch_size = B

    def __iter__(self):
        # reference run_one_epoch unpacks (data, timings) per item
        return iter([(b, {}) for b in list.__iter__(self)])


class RecordingRunner:
    """Transparent proxy over the real reference Runner that logs each
    iteration's loss scalars and live per-group LRs."""

    def __init__(self, inner, optimizer, lr_names):
        self.inner = inner
        self.optimizer = optimizer
        self.lr_names = lr_names
        self.records = []
        self.lrs = {n: [] for n in lr_names}

    def __call__(self, data, mixup_fn=None, mixup_backbone=True):
        if torch.is_grad_enabled():  # train iterations only
            by_name = {g["name"]: g["lr"] for g in self.optimizer.param_groups}
            for probe, match in self.lr_names.items():
                self.lrs[probe].append(
                    next(v for n, v in by_name.items() if n.startswith(match)))
        loss, metrics = self.inner(data, mixup_fn, mixup_backbone)
        if torch.is_grad_enabled():
            self.records.append({k: float(v) for k, v in metrics.items()
                                 if isinstance(v, (int, float))})
        return loss, metrics


def install_train_stubs():
    """Extra module-scope deps of /root/reference/train.py beyond what
    export_fixtures.install_stubs covers (train.py:10-15)."""
    import types
    import importlib.machinery
    import hydra

    for name in ("torchvision", "torchvision.io"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod

    # @hydra.main decorator (train.py:293) — pass-through, never invoked here
    hydra.main = lambda **kw: (lambda fn: fn)


def run_variant(variant):
    from omegaconf import DictConfig
    from models.base_model import BaseModel
    from common.runner import Runner
    from common.metric_tracking import MetricTracker
    from common import mixup as ref_mixup
    from common import scheduler as ref_sched
    import train as ref_train

    # expts/00,03,04,05 set opt.optimizer.nesterov=true; expt-01/02 keep
    # the sgd.yaml default false
    nesterov = variant != "early"
    mods = ["rgb"] if variant == "individual" else MODS
    loss_wts = dict(LOSS_WTS)
    if variant == "matt":                 # train.loss_wts.past_cls_action=0
        loss_wts["past_cls_action"] = 0.0

    torch.manual_seed(123)
    model = BaseModel(model_cfg(DictConfig, variant),
                      num_classes=NUM_CLASSES, class_mappings={})
    sd0 = {k: v.detach().clone() for k, v in model.state_dict().items()}

    # the reference's real param-group construction (train.py:336-338,352);
    # individual = expt-00's opt.lr_wd=null single-group path (:196-199)
    # expt-00/03/04 leave opt.lr_wd at the config default null (one lr/wd
    # for every param, train.py:196-199); early/matt exercise the grouped
    # path (train.py:201-225)
    lr_wd = None if variant in ("individual", "temporal", "ca") else \
        [["future_predictor.fuser", FUSER_LR, FUSER_WD]]
    param_groups = ref_train.prepare_params(model, lr_wd, LR, WD)
    optimizer = torch.optim.SGD(param_groups, lr=LR, momentum=0.9,
                                nesterov=nesterov, weight_decay=WD)
    # individual: cosine horizon shorter than training (expt-00 pattern) —
    # the trailing iterations run the past-T_max zero-lr branch
    cos_epochs = 2 if variant == "individual" else EPOCHS
    main_sched = ref_sched.CosineLR(optimizer, num_epochs=cos_epochs,
                                    eta_min=1e-6, iters_per_epoch=ITERS,
                                    world_size=1)
    lr_scheduler = ref_sched.Warmup(optimizer, main_sched, init_lr_ratio=0.01,
                                    num_epochs=1, iters_per_epoch=ITERS,
                                    world_size=1)

    mixup_fn = ref_mixup.MixUp(alpha=MIXUP_ALPHA,
                               label_smoothing=dict(LABEL_SMOOTHING),
                               num_classes=NUM_CLASSES)
    # deterministic mixup draws: pre-drawn Beta stream, popped per actual
    # sample() call so shortcut iterations (no draw) don't shift the stream
    lam_stream = torch.distributions.beta.Beta(
        MIXUP_ALPHA, MIXUP_ALPHA).sample((EPOCHS * ITERS + 8,))
    torch.manual_seed(7)  # independent of the stream above
    state = {"next": 0, "last": None}

    class Sampler:
        @staticmethod
        def sample():
            lam = lam_stream[state["next"]]
            state["next"] += 1
            state["last"] = float(lam)
            return lam

    mixup_fn.mixup_beta_sampler = Sampler()

    train_batches = make_batches(EPOCHS * ITERS, seed=1000, tag="train",
                                 mods=mods)
    val_batches = make_batches(VAL_ITERS, seed=2000, tag="val", mods=mods)

    # debugging probes: post-step param snapshots for the first steps and
    # the pre-clip global grad norm per iteration (clip_grad_norm_ returns
    # it), so a trajectory mismatch localizes to forward vs update
    snapshots = {}
    grad_norms = []
    _orig_step = optimizer.step

    def step_and_snapshot(*a, **kw):
        out = _orig_step(*a, **kw)
        i = len(grad_norms) - 1
        if i < 3 and not FLAGSHIP:  # flagship: 3 x 1.5 GB, skip
            snapshots[i] = {k: v.detach().clone()
                            for k, v in model.state_dict().items()}
        return out

    optimizer.step = step_and_snapshot
    _orig_clip = torch.nn.utils.clip_grad_norm_

    def clip_and_record(*a, **kw):
        norm = _orig_clip(*a, **kw)
        grad_norms.append(float(norm))
        return norm

    torch.nn.utils.clip_grad_norm_ = clip_and_record

    lr_names = {"rest": "future_predictor.dim_encoder."}
    if variant != "individual":           # individual has no fuser module
        lr_names["fuser"] = "future_predictor.fuser."
    runner = RecordingRunner(
        Runner(model, "cpu", loss_wts=loss_wts), optimizer, lr_names)
    tracker = MetricTracker(NUM_CLASSES)

    lam_used, epoch_metrics = [], []
    for epoch in range(EPOCHS):
        tracker.reset()
        model.train()
        loader = ListLoader(train_batches[epoch * ITERS:(epoch + 1) * ITERS])

        # wrap to log which lambda each iteration consumed
        n_before = len(lam_used)

        class LamProbe:
            def __call__(self, *a, **kw):
                state["last"] = None
                out = mixup_fn(*a, **kw)
                lam_used.append(np.nan if state["last"] is None
                                else state["last"])
                return out

            mixup_beta_sampler = mixup_fn.mixup_beta_sampler

        ref_train.run_one_epoch(runner, optimizer, lr_scheduler, loader,
                                tracker, is_training=True,
                                grad_clip=GRAD_CLIP, mixup_fn=LamProbe(),
                                mixup_backbone=True)
        assert len(lam_used) - n_before == ITERS, \
            f"expected one mixup call per iteration, got {len(lam_used)-n_before}"

        model.eval()
        with torch.no_grad():
            ref_train.run_one_epoch(runner, optimizer, lr_scheduler,
                                    ListLoader(val_batches), tracker,
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
        print(f"[{variant}] epoch {epoch}: train loss "
              f"{ep.get('train_total_loss'):.4f} val loss "
              f"{ep.get('val_total_loss'):.4f} val mt5r "
              f"{ep.get('val_mt5r_action_all-fused')}")

    payload = {}
    for k, v in sd0.items():
        payload[f"sd0::{k}"] = v.numpy()
    for k, v in model.state_dict().items():
        payload[f"sdF::{k}"] = v.detach().numpy()
    for i, b in enumerate(train_batches):
        for m, x in b["data_dict"].items():
            payload[f"batch{i}::data::{m}"] = x.numpy()
        for t, x in b["target"].items():
            payload[f"batch{i}::target::{t}"] = x.numpy()
        for t, x in b["target_subclips"].items():
            payload[f"batch{i}::sub::{t}"] = x.numpy()
    for i, b in enumerate(val_batches):
        for m, x in b["data_dict"].items():
            payload[f"val{i}::data::{m}"] = x.numpy()
        for t, x in b["target"].items():
            payload[f"val{i}::target::{t}"] = x.numpy()
        for t, x in b["target_subclips"].items():
            payload[f"val{i}::sub::{t}"] = x.numpy()

    payload["lam"] = np.asarray(lam_used, np.float64)
    payload["grad_norms"] = np.asarray(grad_norms, np.float64)
    for i, snap in snapshots.items():
        for k, v in snap.items():
            payload[f"step{i}::{k}"] = v.numpy()
    loss_keys = sorted(runner.records[0])
    for key in loss_keys:
        payload[f"iter::{key}"] = np.asarray(
            [r.get(key, np.nan) for r in runner.records], np.float64)
    for probe, trace in runner.lrs.items():
        payload[f"lr::{probe}"] = np.asarray(trace, np.float64)
    for e, ep in enumerate(epoch_metrics):
        for name, v in ep.items():
            payload[f"ep{e}::{name}"] = np.float64(v)
    payload["meta"] = np.asarray([B, T, EPOCHS, ITERS, VAL_ITERS])

    fname = ("train_trajectory_flagship.npz" if FLAGSHIP
             else "train_trajectory.npz" if variant == "early"
             else f"train_trajectory_{variant}.npz")
    OUTDIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUTDIR / fname, **payload)
    print(f"saved {fname}: {len(payload)} arrays, "
          f"{(OUTDIR / fname).stat().st_size/1e6:.2f} MB")


def main():
    install_stubs()
    install_train_stubs()
    sys.path.insert(0, REFERENCE)
    for variant in VARIANTS:
        torch.manual_seed(0)
        run_variant(variant)


if __name__ == "__main__":
    main()
