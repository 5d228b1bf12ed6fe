"""Import PyTorch reference checkpoints into afft_tpu parameter pytrees.

Maps the reference's ``state_dict`` names (BaseModel/CMFP/fuser/GPT-2 layout,
see reference train.py:156-167 checkpoint payloads) onto our functional
params. Torch ``nn.Linear`` weights are (out, in) and transpose to our
(in, out) layout; HF GPT-2 ``Conv1D`` weights are already (in, out) and pass
through. Used both for loading released reference checkpoints and for the
golden parity tests.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


def _lin(sd: StateDict, prefix: str, bias=True):
    p = {"w": jnp.asarray(sd[_join(prefix, "weight")]).T}
    if bias and _join(prefix, "bias") in sd:
        p["b"] = jnp.asarray(sd[_join(prefix, "bias")])
    return p


def _conv1d(sd: StateDict, prefix: str):
    """HF Conv1D: weight already stored (in, out)."""
    return {"w": jnp.asarray(sd[_join(prefix, "weight")]),
            "b": jnp.asarray(sd[_join(prefix, "bias")])}


def _conv1d_qkv(sd: StateDict, prefix: str, n_head: int):
    """HF c_attn Conv1D (in, 3C) packed [q|k|v] with heads minor ->
    our heads-major packing [h0:(q,k,v), h1:(q,k,v), ...] (predictor._block):
    slicing the packed dim over a TP mesh axis is then head-aligned."""
    w = np.asarray(sd[_join(prefix, "weight")])
    b = np.asarray(sd[_join(prefix, "bias")])
    c_in, three_c = w.shape
    hd = three_c // 3 // n_head
    w = w.reshape(c_in, 3, n_head, hd).transpose(0, 2, 1, 3)
    b = b.reshape(3, n_head, hd).transpose(1, 0, 2)
    return {"w": jnp.asarray(w.reshape(c_in, three_c)),
            "b": jnp.asarray(b.reshape(three_c))}


def _ln(sd: StateDict, prefix: str):
    if _join(prefix, "weight") not in sd:  # elementwise_affine=False
        return {}
    return {"g": jnp.asarray(sd[_join(prefix, "weight")]),
            "b": jnp.asarray(sd[_join(prefix, "bias")])}


def import_attention(sd, prefix):
    return {"qkv": _lin(sd, _join(prefix, "qkv")),
            "proj": _lin(sd, _join(prefix, "proj"))}


def import_cross_attention(sd, prefix):
    return {"w_q": _lin(sd, _join(prefix, "w_q")),
            "w_k": _lin(sd, _join(prefix, "w_k")),
            "w_v": _lin(sd, _join(prefix, "w_v")),
            "proj": _lin(sd, _join(prefix, "proj"))}


def import_mlp(sd, prefix):
    return {"fc1": _lin(sd, _join(prefix, "mlp.0")),
            "fc2": _lin(sd, _join(prefix, "mlp.2"))}


def import_block(sd, prefix):
    return {
        "norm1": _ln(sd, _join(prefix, "norm1")),
        "attn": import_attention(sd, _join(prefix, "attn")),
        "norm2": _ln(sd, _join(prefix, "norm2")),
        "mlp": import_mlp(sd, _join(prefix, "mlp")),
    }


def import_decoder_block(sd, prefix):
    return {
        "norm_self": _ln(sd, _join(prefix, "norm_self")),
        "attn": import_attention(sd, _join(prefix, "attn")),
        "norm_q": _ln(sd, _join(prefix, "norm_q")),
        "norm_kv": _ln(sd, _join(prefix, "norm_kv")),
        "cross_attn": import_cross_attention(sd, _join(prefix, "cross_attn")),
        "norm_mlp": _ln(sd, _join(prefix, "norm_mlp")),
        "mlp": import_mlp(sd, _join(prefix, "mlp")),
    }


def _join(prefix, name):
    return f"{prefix}.{name}" if prefix else name


def _block_depth(sd, prefix):
    depth = 0
    while any(k.startswith(_join(prefix, f"blocks.{depth}.")) for k in sd):
        depth += 1
    return depth


def import_block_stack(sd, prefix):
    depth = _block_depth(sd, prefix)
    return {
        "blocks": [import_block(sd, _join(prefix, f"blocks.{i}"))
                   for i in range(depth)],
        "norm": _ln(sd, _join(prefix, "norm")),
    }


def import_fuser(fuser, sd, prefix=""):
    """Dispatch on the afft_tpu fuser class; ``prefix`` e.g. 'fuser'."""
    from ..models import fusion as F
    p = "" if prefix == "" else prefix + "."
    cls = type(fuser).__name__
    if cls in ("CMFuser",):
        return import_block_stack(sd, prefix)
    if cls == "ModalTokenCMFuser":
        params = import_block_stack(sd, prefix)
        params["modal_token"] = jnp.asarray(sd[f"{p}modal_token"])
        if fuser.modal_encoding:
            params["modality_embedding"] = jnp.asarray(
                sd[f"{p}modality_embedding"])
        return params
    if cls == "TemporalCMFuser":
        params = import_block_stack(sd, prefix)
        params["position_embeddings"] = {
            "w": jnp.asarray(sd[f"{p}position_embeddings.weight"])}
        if fuser.frame_level_token:
            params["modal_token"] = jnp.asarray(sd[f"{p}modal_token"])
        if fuser.modal_encoding:
            params["modality_embedding"] = jnp.asarray(
                sd[f"{p}modality_embedding"])
        return params
    if cls == "TemporalCrossAttentFuser":
        depth = _block_depth(sd, prefix)
        return {
            "blocks": [import_decoder_block(sd, f"{p}blocks.{i}")
                       for i in range(depth)],
            "norm": _ln(sd, f"{p}norm"),
            "position_embeddings": {
                "w": jnp.asarray(sd[f"{p}position_embeddings.weight"])},
        }
    if cls == "MATT":
        return {"fc1": _lin(sd, f"{p}matt.0"),
                "fc2": _lin(sd, f"{p}matt.3"),
                "fc3": _lin(sd, f"{p}matt.6")}
    raise ValueError(f"unknown fuser class {cls}")


def import_gpt2(sd, prefix, n_head=4):
    """BaseFuturePredictor: '{prefix}.gpt_model.*' HF GPT-2 weights.

    ``n_head`` drives the qkv head re-interleave (see _conv1d_qkv); the
    reference default is 4 (conf/model/common.yaml fp_heads)."""
    g = _join(prefix, "gpt_model")
    n_layer = 0
    while any(k.startswith(f"{g}.h.{n_layer}.") for k in sd):
        n_layer += 1
    blocks = []
    for i in range(n_layer):
        b = f"{g}.h.{i}"
        blocks.append({
            "ln_1": _ln(sd, f"{b}.ln_1"),
            "c_attn": _conv1d_qkv(sd, f"{b}.attn.c_attn", n_head),
            "c_proj": _conv1d(sd, f"{b}.attn.c_proj"),
            "ln_2": _ln(sd, f"{b}.ln_2"),
            "c_fc": _conv1d(sd, f"{b}.mlp.c_fc"),
            "mlp_c_proj": _conv1d(sd, f"{b}.mlp.c_proj"),
        })
    return {
        "wpe": jnp.asarray(sd[f"{g}.wpe.weight"]),
        "blocks": blocks,
        "ln_f": _ln(sd, f"{g}.ln_f"),
    }


def import_mapping(mapping, sd, prefix):
    """reference feature_mapping Sequential layouts."""
    cls = type(mapping).__name__
    if cls == "LinearMapping":
        p = {}
        if not mapping.identity:
            p["fc"] = _lin(sd, _join(prefix, "mapping.0"), bias=False)
        if mapping.use_layernorm:
            p["ln"] = _ln(sd, _join(prefix, "mapping.1"))
        return p
    if cls == "GatedLinearMapping":
        p = {"fc": _lin(sd, _join(prefix, "mapping.0")),
             "cg": {"fc": _lin(sd, _join(prefix, "mapping.1.fc"))}}
        if mapping.use_layernorm:
            p["ln"] = _ln(sd, _join(prefix, "mapping.2"))
        return p
    if cls == "NonLinearMapping":
        p = {"fc": _lin(sd, _join(prefix, "mapping.0"))}
        if mapping.use_layernorm:
            p["ln"] = _ln(sd, _join(prefix, "mapping.2"))
        return p
    if cls == "GatedEmbeddingUnit":
        return {"fc": _lin(sd, _join(prefix, "fc")),
                "cg": {"fc": _lin(sd, _join(prefix, "cg.fc"))}}
    raise ValueError(f"unknown mapping class {cls}")


def _maybe_codec(sd, prefix):
    """Linear-or-identity dim encoder/decoder (no bias)."""
    key = _join(prefix, "weight")
    return {"w": jnp.asarray(sd[key]).T} if key in sd else None


def import_cmfp(cmfp, sd, prefix=""):
    """Import a CrossModalFusionPrediction variant's weights."""
    p = "" if prefix == "" else prefix + "."
    cls = type(cmfp).__name__
    params = {}

    if cmfp.uses_mapping:
        params["mapping"] = {
            modk: import_mapping(cmfp.mapping[modk], sd, f"{p}mapping.{modk}")
            for modk in cmfp.modality_dims
        }
    if cmfp.uses_fuser:
        params["fuser"] = import_fuser(cmfp.fuser, sd, f"{p}fuser")

    if cls == "CMFPEarly":
        params["dim_encoder"] = _maybe_codec(sd, f"{p}dim_encoder")
        params["dim_decoder"] = _maybe_codec(sd, f"{p}dim_decoder")
    else:
        params["dim_encoder"] = {
            modk: _maybe_codec(sd, f"{p}dim_encoder.{modk}")
            for modk in cmfp.modality_dims}
        params["dim_decoder"] = {
            modk: _maybe_codec(sd, f"{p}dim_decoder.{modk}")
            for modk in cmfp.modality_dims}

    n_head = cmfp.predictor_proto.n_head
    if cmfp.common_predictor:
        params["future_predictor"] = {
            "shared": import_gpt2(sd, f"{p}future_predictor", n_head)}
    else:
        params["future_predictor"] = {
            modk: import_gpt2(sd, f"{p}future_predictor.{modk}", n_head)
            for modk in cmfp.modality_dims}

    clf = {}
    for cls_type in cmfp.num_classes:
        if cmfp.common_classifier:
            # shared Sequential(Dropout, Linear) registered under each head
            for headk in cmfp.classifier_keys[cls_type]:
                key = f"{p}classifiers.{cls_type}.{headk}.1"
                if f"{key}.weight" in sd:
                    clf[cls_type] = {"shared": _lin(sd, key)}
                    break
        else:
            clf[cls_type] = {
                headk: _lin(sd, f"{p}classifiers.{cls_type}.{headk}.1")
                for headk in cmfp.classifier_keys[cls_type]
                if f"{p}classifiers.{cls_type}.{headk}.1.weight" in sd}
    params["classifiers"] = clf
    return params


def import_base_model(model, sd: StateDict):
    """Full reference BaseModel state_dict -> afft_tpu params."""
    params = {"future_predictor": import_cmfp(model.future_predictor, sd,
                                              "future_predictor")}
    buffers = {k: jnp.asarray(v) for k, v in sd.items()
               if k.startswith("cls_map_")}
    if buffers:
        params["buffers"] = buffers
    return params


def load_torch_checkpoint(path: str) -> StateDict:
    """Load a reference .pth checkpoint into numpy (torch is optional at
    runtime; only needed when importing reference weights)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in ckpt:
        ckpt = ckpt["model"]
    elif "model_state" in ckpt:
        ckpt = ckpt["model_state"]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}
