"""Export afft_tpu parameter pytrees to reference-layout torch state dicts.

Exact inverse of :mod:`afft_tpu.train.torch_import`: every mapping there
(Linear transpose, HF Conv1D pass-through, the heads-major<->heads-minor
qkv re-interleave of ``_conv1d_qkv``, the Sequential index names of the
reference feature mappings, the shared-classifier aliasing) is reversed
here, producing a ``state_dict`` the reference code (models/base_model.py)
can ``load_state_dict`` directly. Uses:

  * shipping afft_tpu-trained weights to users of the reference repo
    (ensemble interchange, reference-side evaluation),
  * the export->import->export idempotence property test
    (tests/test_torch_export.py), which pins the qkv packing against
    future kernel re-packs (the checkpoint format_version guard,
    train/checkpoint.py).

State dicts are numpy-valued; wrap with ``torch.from_numpy`` to feed
torch. All functions mirror their torch_import counterparts by name.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


def _np(x):
    return np.asarray(x)


def _join(prefix, name):
    return f"{prefix}.{name}" if prefix else name


def _lin(out: StateDict, prefix: str, p):
    out[_join(prefix, "weight")] = _np(p["w"]).T
    if "b" in p:
        out[_join(prefix, "bias")] = _np(p["b"])


def _conv1d(out: StateDict, prefix: str, p):
    out[_join(prefix, "weight")] = _np(p["w"])
    out[_join(prefix, "bias")] = _np(p["b"])


def _conv1d_qkv(out: StateDict, prefix: str, p, n_head: int):
    """Inverse of torch_import._conv1d_qkv: heads-major [h0:(q,k,v), ...]
    back to HF's [q|k|v] packing with heads minor."""
    w = _np(p["w"])
    b = _np(p["b"])
    c_in, three_c = w.shape
    hd = three_c // 3 // n_head
    w = w.reshape(c_in, n_head, 3, hd).transpose(0, 2, 1, 3)
    b = b.reshape(n_head, 3, hd).transpose(1, 0, 2)
    out[_join(prefix, "weight")] = w.reshape(c_in, three_c)
    out[_join(prefix, "bias")] = b.reshape(three_c)


def _ln(out: StateDict, prefix: str, p):
    if not p:  # elementwise_affine=False
        return
    out[_join(prefix, "weight")] = _np(p["g"])
    out[_join(prefix, "bias")] = _np(p["b"])


def export_attention(out, prefix, p):
    _lin(out, _join(prefix, "qkv"), p["qkv"])
    _lin(out, _join(prefix, "proj"), p["proj"])


def export_cross_attention(out, prefix, p):
    for k in ("w_q", "w_k", "w_v", "proj"):
        _lin(out, _join(prefix, k), p[k])


def export_mlp(out, prefix, p):
    _lin(out, _join(prefix, "mlp.0"), p["fc1"])
    _lin(out, _join(prefix, "mlp.2"), p["fc2"])


def export_block(out, prefix, p):
    _ln(out, _join(prefix, "norm1"), p["norm1"])
    export_attention(out, _join(prefix, "attn"), p["attn"])
    _ln(out, _join(prefix, "norm2"), p["norm2"])
    export_mlp(out, _join(prefix, "mlp"), p["mlp"])


def export_decoder_block(out, prefix, p):
    _ln(out, _join(prefix, "norm_self"), p["norm_self"])
    export_attention(out, _join(prefix, "attn"), p["attn"])
    _ln(out, _join(prefix, "norm_q"), p["norm_q"])
    _ln(out, _join(prefix, "norm_kv"), p["norm_kv"])
    export_cross_attention(out, _join(prefix, "cross_attn"), p["cross_attn"])
    _ln(out, _join(prefix, "norm_mlp"), p["norm_mlp"])
    export_mlp(out, _join(prefix, "mlp"), p["mlp"])


def export_block_stack(out, prefix, p):
    for i, blk in enumerate(p["blocks"]):
        export_block(out, _join(prefix, f"blocks.{i}"), blk)
    _ln(out, _join(prefix, "norm"), p["norm"])


def export_fuser(fuser, out, p, prefix=""):
    pre = "" if prefix == "" else prefix + "."
    cls = type(fuser).__name__
    if cls == "CMFuser":
        export_block_stack(out, prefix, p)
        return
    if cls == "ModalTokenCMFuser":
        export_block_stack(out, prefix, p)
        out[f"{pre}modal_token"] = _np(p["modal_token"])
        if fuser.modal_encoding:
            out[f"{pre}modality_embedding"] = _np(p["modality_embedding"])
        return
    if cls == "TemporalCMFuser":
        export_block_stack(out, prefix, p)
        out[f"{pre}position_embeddings.weight"] = _np(
            p["position_embeddings"]["w"])
        if fuser.frame_level_token:
            out[f"{pre}modal_token"] = _np(p["modal_token"])
        if fuser.modal_encoding:
            out[f"{pre}modality_embedding"] = _np(p["modality_embedding"])
        return
    if cls == "TemporalCrossAttentFuser":
        for i, blk in enumerate(p["blocks"]):
            export_decoder_block(out, f"{pre}blocks.{i}", blk)
        _ln(out, f"{pre}norm", p["norm"])
        out[f"{pre}position_embeddings.weight"] = _np(
            p["position_embeddings"]["w"])
        return
    if cls == "MATT":
        _lin(out, f"{pre}matt.0", p["fc1"])
        _lin(out, f"{pre}matt.3", p["fc2"])
        _lin(out, f"{pre}matt.6", p["fc3"])
        return
    raise ValueError(f"unknown fuser class {cls}")


def export_gpt2(out, prefix, p, n_head=4):
    g = _join(prefix, "gpt_model")
    for i, blk in enumerate(p["blocks"]):
        b = f"{g}.h.{i}"
        _ln(out, f"{b}.ln_1", blk["ln_1"])
        _conv1d_qkv(out, f"{b}.attn.c_attn", blk["c_attn"], n_head)
        _conv1d(out, f"{b}.attn.c_proj", blk["c_proj"])
        _ln(out, f"{b}.ln_2", blk["ln_2"])
        _conv1d(out, f"{b}.mlp.c_fc", blk["c_fc"])
        _conv1d(out, f"{b}.mlp.c_proj", blk["mlp_c_proj"])
    out[f"{g}.wpe.weight"] = _np(p["wpe"])
    _ln(out, f"{g}.ln_f", p["ln_f"])


def export_mapping(mapping, out, p, prefix):
    cls = type(mapping).__name__
    if cls == "LinearMapping":
        if not mapping.identity:
            _lin(out, _join(prefix, "mapping.0"), p["fc"])
        if mapping.use_layernorm:
            _ln(out, _join(prefix, "mapping.1"), p["ln"])
        return
    if cls == "GatedLinearMapping":
        _lin(out, _join(prefix, "mapping.0"), p["fc"])
        _lin(out, _join(prefix, "mapping.1.fc"), p["cg"]["fc"])
        if mapping.use_layernorm:
            _ln(out, _join(prefix, "mapping.2"), p["ln"])
        return
    if cls == "NonLinearMapping":
        _lin(out, _join(prefix, "mapping.0"), p["fc"])
        if mapping.use_layernorm:
            _ln(out, _join(prefix, "mapping.2"), p["ln"])
        return
    if cls == "GatedEmbeddingUnit":
        _lin(out, _join(prefix, "fc"), p["fc"])
        _lin(out, _join(prefix, "cg.fc"), p["cg"]["fc"])
        return
    raise ValueError(f"unknown mapping class {cls}")


def _codec(out, prefix, p):
    if p is not None:
        out[_join(prefix, "weight")] = _np(p["w"]).T


def export_cmfp(cmfp, p, prefix="") -> StateDict:
    pre = "" if prefix == "" else prefix + "."
    cls = type(cmfp).__name__
    out: StateDict = {}

    if cmfp.uses_mapping:
        for modk in cmfp.modality_dims:
            export_mapping(cmfp.mapping[modk], out, p["mapping"][modk],
                           f"{pre}mapping.{modk}")
    if cmfp.uses_fuser:
        export_fuser(cmfp.fuser, out, p["fuser"], f"{pre}fuser")

    if cls == "CMFPEarly":
        _codec(out, f"{pre}dim_encoder", p["dim_encoder"])
        _codec(out, f"{pre}dim_decoder", p["dim_decoder"])
    else:
        for modk in cmfp.modality_dims:
            _codec(out, f"{pre}dim_encoder.{modk}", p["dim_encoder"][modk])
            _codec(out, f"{pre}dim_decoder.{modk}", p["dim_decoder"][modk])

    n_head = cmfp.predictor_proto.n_head
    if cmfp.common_predictor:
        export_gpt2(out, f"{pre}future_predictor",
                    p["future_predictor"]["shared"], n_head)
    else:
        for modk in cmfp.modality_dims:
            export_gpt2(out, f"{pre}future_predictor.{modk}",
                        p["future_predictor"][modk], n_head)

    for cls_type, heads in p["classifiers"].items():
        if cmfp.common_classifier:
            # the reference registers ONE shared Sequential under every
            # head key; its state_dict therefore carries the same tensors
            # once per head name (torch_import reads the first)
            shared = heads["shared"]
            for headk in cmfp.classifier_keys[cls_type]:
                _lin(out, f"{pre}classifiers.{cls_type}.{headk}.1", shared)
        else:
            for headk, lin_p in heads.items():
                _lin(out, f"{pre}classifiers.{cls_type}.{headk}.1", lin_p)
    return out


def export_base_model(model, params) -> StateDict:
    """afft_tpu BaseModel params -> reference-layout state_dict (numpy)."""
    out = export_cmfp(model.future_predictor, params["future_predictor"],
                      "future_predictor")
    for k, v in params.get("buffers", {}).items():
        out[k] = _np(v)
    return out
