"""fp32 parity against golden fixtures exported from the torch reference.

Fixtures are produced by tools/export_fixtures.py (reference code run on CPU
with seeded weights). Every module's forward must agree with the reference to
float32 tolerance after importing the same weights.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from afft_tpu.models import blocks as B
from afft_tpu.models import fusion as F
from afft_tpu.models import mapping as M
from afft_tpu.models import layers as L
from afft_tpu.models.predictor import BaseFuturePredictor
from afft_tpu.models import cmfp as C
from afft_tpu.models.base_model import BaseModel
from afft_tpu.train import torch_import as TI

ATOL = 2e-5
RTOL = 1e-5

MODS = ["rgb", "objects", "flow"]


def assert_close(got, want, name, atol=ATOL):
    got, want = np.asarray(got), np.asarray(want)
    assert got.shape == want.shape, f"{name}: {got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=atol, err_msg=name)


def modal_inputs(ins):
    return {m: jnp.asarray(ins[m]) for m in MODS}


def test_block(fixtures):
    sd, ins, outs = fixtures("block")
    p = TI.import_block(sd, "")
    y, attn = B.block_apply(p, jnp.asarray(ins["x"]), num_heads=4,
                            norm_eps=1e-5)  # torch default LN eps
    assert_close(y, outs["y"], "block.y")
    assert_close(attn, outs["attn"], "block.attn")


def test_block_causal_mask(fixtures):
    sd, ins, outs = fixtures("block_causal")
    p = TI.import_block(sd, "")
    y, attn = B.block_apply(p, jnp.asarray(ins["x"]), num_heads=4,
                            attn_mask=jnp.asarray(ins["mask"]), norm_eps=1e-5)
    assert_close(y, outs["y"], "block_causal.y")
    assert_close(attn, outs["attn"], "block_causal.attn")


def test_decoder_block(fixtures):
    sd, ins, outs = fixtures("decoder_block")
    p = TI.import_decoder_block(sd, "")
    y = B.decoder_block_apply(p, jnp.asarray(ins["x"]), jnp.asarray(ins["mem"]),
                              num_heads=4, attn_mask=jnp.asarray(ins["mask"]),
                              norm_eps=1e-5)
    assert_close(y, outs["y"], "decoder_block.y")


@pytest.mark.parametrize("name,cls,kwargs", [
    ("mapping_linear", M.LinearMapping,
     dict(use_layernorm=True, sparse_mapping=False)),
    ("mapping_gated", M.GatedLinearMapping, dict(use_layernorm=True)),
    ("mapping_nonlinear", M.NonLinearMapping,
     dict(use_layernorm=True, activation="relu")),
])
def test_mappings(fixtures, name, cls, kwargs):
    sd, ins, outs = fixtures(name)
    mapping = cls(32, 64, **kwargs)
    p = TI.import_mapping(mapping, sd, "")
    y = mapping.apply(p, jnp.asarray(ins["x"]))
    assert_close(y, outs["y"], name)


def test_fuser_modal_token(fixtures):
    sd, ins, outs = fixtures("fuser_modal_token")
    fuser = F.ModalTokenCMFuser(dim=64, depth=3, num_heads=4,
                                modalities={m: 64 for m in MODS})
    p = TI.import_fuser(fuser, sd, "")
    y, attn = fuser.apply(p, modal_inputs(ins), MODS)
    assert_close(y, outs["y"], "sa_fuser.y")
    assert_close(attn, outs["attn"], "sa_fuser.attn")


def test_fuser_modal_token_variants(fixtures):
    sd, ins, outs = fixtures("fuser_modal_token_variants")
    fuser = F.ModalTokenCMFuser(dim=64, depth=2, num_heads=4,
                                modalities={m: 64 for m in MODS},
                                modal_encoding=True, cross_attn=True,
                                frame_level_token=True,
                                temporal_sequence_length=6)
    p = TI.import_fuser(fuser, sd, "")
    y, attn = fuser.apply(p, modal_inputs(ins), MODS)
    assert_close(y, outs["y"], "sa_fuser_variants.y")
    assert_close(attn, outs["attn"], "sa_fuser_variants.attn")


def test_fuser_cm(fixtures):
    sd, ins, outs = fixtures("fuser_cm")
    fuser = F.CMFuser(dim=64, depth=2, num_heads=4)
    p = TI.import_fuser(fuser, sd, "")
    y, attn = fuser.apply(p, modal_inputs(ins), MODS)
    assert_close(y, outs["y"], "cm_fuser.y")
    assert_close(attn, outs["attn"], "cm_fuser.attn")


def test_fuser_temporal(fixtures):
    sd, ins, outs = fixtures("fuser_temporal")
    fuser = F.TemporalCMFuser(dim=64, depth=2, num_heads=4,
                              modalities={m: 64 for m in MODS},
                              modal_encoding=True)
    p = TI.import_fuser(fuser, sd, "")
    y, attn = fuser.apply(p, modal_inputs(ins), MODS)
    assert_close(y, outs["y"], "t_sa_fuser.y")
    assert_close(attn, outs["attn"], "t_sa_fuser.attn")


def test_fuser_ca(fixtures):
    sd, ins, outs = fixtures("fuser_ca")
    fuser = F.TemporalCrossAttentFuser(dim=64, modalities={m: 64 for m in MODS},
                                       num_heads=4)
    p = TI.import_fuser(fuser, sd, "")
    y, _ = fuser.apply(p, modal_inputs(ins), MODS)
    assert_close(y, outs["y"], "ca_fuser.y")


def test_fuser_matt(fixtures):
    sd, ins, outs = fixtures("fuser_matt")
    fuser = F.MATT(modal_dims={m: 64 for m in MODS}, dim=64)
    p = TI.import_fuser(fuser, sd, "")
    w = fuser.apply(p, modal_inputs(ins), MODS)
    assert_close(w, outs["w"], "matt.w")


def test_predictor(fixtures):
    sd, ins, outs = fixtures("predictor")
    pred = BaseFuturePredictor(in_features=64, inter_dim=64, n_layer=2,
                               n_head=2)
    p = TI.import_gpt2(sd, "", n_head=2)
    y1, _ = pred.apply(p, jnp.asarray(ins["x"]), output_len=1)
    assert_close(y1, outs["y1"], "predictor.len1")
    y3, _ = pred.apply(p, jnp.asarray(ins["x"]), output_len=3)
    assert_close(y3, outs["y3"], "predictor.len3")


def _cmfp_cfg(share_pred=True, share_cls=True, mod_cls=False, fusion_cls=True,
              fuser=None):
    return {
        "modal_dims": {"rgb": 48, "objects": 20, "flow": 48},
        "modal_feature_order": ["rgb", "objects", "audio", "poses", "flow"],
        "dropout": 0.2,
        "common": {
            "in_features": 48, "fp_inter_dim": 64, "fp_output_len": 1,
            "share_classifiers": share_cls, "share_predictors": share_pred,
            "modality_cls": mod_cls, "fusion_cls": fusion_cls,
        },
        "mapping": {"_target_": "models.feature_mapping.Linear",
                    "use_layernorm": False, "sparse_mapping": True},
        "fuser": fuser or {
            "_target_": "models.fusion.ModalTokenCMFuser", "dim": 48,
            "depth": 2, "num_heads": 4,
            "modalities": {"rgb": 48, "objects": 20, "flow": 48}},
        "future_predictor": {
            "_target_": "models.future_prediction.BaseFuturePredictor",
            "in_features": 48, "inter_dim": 64, "n_layer": 2, "n_head": 2,
            "embd_pdrop": 0.1, "resid_pdrop": 0.1, "attn_pdrop": 0.1,
            "output_attentions": False},
    }


NUM_CLASSES = {"action": 17, "verb": 7, "noun": 9}


def _check_cmfp_outputs(out, outs, skip_prefixes=()):
    for key, want in outs.items():
        parts = [p for p in key.split("//") if p]
        if any(key.startswith(s) for s in skip_prefixes):
            continue
        got = out
        for p in parts:
            got = got[p]
        assert_close(got, want, key)


def test_cmfp_early(fixtures):
    sd, ins, outs = fixtures("cmfp_early")
    cmfp = C.CMFPEarly(_cmfp_cfg(), NUM_CLASSES, fuser_need_weights=True)
    p = TI.import_cmfp(cmfp, sd, "")
    out = cmfp.apply(p, modal_inputs(ins))
    _check_cmfp_outputs(out, outs)


def test_cmfp_individual(fixtures):
    sd, ins, outs = fixtures("cmfp_individual")
    cmfp = C.IndividualFuturePrediction(
        _cmfp_cfg(share_pred=False, share_cls=False, mod_cls=True,
                  fusion_cls=False), NUM_CLASSES)
    p = TI.import_cmfp(cmfp, sd, "")
    out = cmfp.apply(p, modal_inputs(ins))
    _check_cmfp_outputs(out, outs)


def test_cmfp_scorefusion(fixtures):
    sd, ins, outs = fixtures("cmfp_scorefusion")
    matt = {"_target_": "models.fusion.MATT",
            "modal_dims": {"rgb": 48, "objects": 20, "flow": 48}, "dim": 48}
    cmfp = C.CMFPScoreFusion(
        _cmfp_cfg(share_pred=False, share_cls=False, mod_cls=True,
                  fusion_cls=False, fuser=matt), NUM_CLASSES)
    p = TI.import_cmfp(cmfp, sd, "")
    out = cmfp.apply(p, modal_inputs(ins))
    _check_cmfp_outputs(out, outs)


def test_base_model(fixtures):
    sd, ins, outs = fixtures("base_model")
    cfg = _cmfp_cfg()
    cfg["common"]["backbones"] = {
        m: {"_target_": "torch.nn.Identity"} for m in MODS}
    cfg["CMFP"] = {"_target_": "models.future_prediction.CMFPEarly",
                   "model_cfg": None}
    model = BaseModel(cfg, num_classes=NUM_CLASSES, class_mappings={})
    p = TI.import_base_model(model, sd)
    video = {m: jnp.asarray(ins[m]) for m in MODS}  # (B,T,F,1,1,1)
    out, _ = model.apply(p, video)
    _check_cmfp_outputs(out, outs)
