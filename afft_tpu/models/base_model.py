"""Top-level model: backbones + CMFP + class-mapping buffers.

Behavioural reference: models/base_model.py in the upstream repo (BaseModel
:15-119). Handles backbone application (identity over pre-extracted
features), multi-crop averaging, optional feature-space mixup, and carries
the verb/noun<->action mapping matrices so checkpoints are self-contained.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from ..config.registry import instantiate

CLS_MAP_PREFIX = "cls_map_"
PAST_LOGITS_PREFIX = "past_"


class BaseModel:
    def __init__(self, model_cfg, num_classes: Dict[str, int],
                 class_mappings: Optional[Dict[Tuple[str, str], jnp.ndarray]] = None,
                 fuser_need_weights: bool = False):
        self.cfg = model_cfg
        self.num_classes = dict(num_classes)
        backbones_cfg = model_cfg["common"].get("backbones") or {}
        self.backbones = {mod: instantiate(bc)
                          for mod, bc in backbones_cfg.items()}
        kwargs = {}
        cmfp_target = model_cfg["CMFP"]["_target_"] if "_target_" in model_cfg["CMFP"] else ""
        if cmfp_target.endswith("CMFPEarly"):
            kwargs["fuser_need_weights"] = fuser_need_weights
        self.future_predictor = instantiate(
            model_cfg["CMFP"], model_cfg=model_cfg, num_classes=num_classes,
            _recursive_=False, **kwargs)
        self.class_mappings = {
            f"{CLS_MAP_PREFIX}{src}_{dst}": jnp.asarray(mapping)
            for (src, dst), mapping in (class_mappings or {}).items()
        }

    def init(self, rng):
        rng, fp_key = jax.random.split(rng)
        params = {"future_predictor": self.future_predictor.init(fp_key)}
        for mod, bb in self.backbones.items():
            rng, bb_key = jax.random.split(rng)
            bb_params = bb.init(bb_key)
            if bb_params:
                params.setdefault("backbone", {})[mod] = bb_params
        if self.class_mappings:
            params["buffers"] = dict(self.class_mappings)
        return params

    # ------------------------------------------------------------------
    @staticmethod
    def _features_from_video(data: jnp.ndarray) -> jnp.ndarray:
        """Backbone output -> (B, T, F): spatial mean, permute, flatten
        (reference models/base_model.py:41-46)."""
        if data.ndim == 3:  # already (B, T, F) — native loader path
            return data
        # (B, clips, C, T', H, W)
        feats = jnp.mean(data, axis=(-1, -2))          # (B, clips, C, T')
        feats = jnp.transpose(feats, (0, 1, 3, 2))     # (B, clips, T', C)
        if feats.ndim == 4:
            feats = feats.reshape(feats.shape[0], -1, feats.shape[-1])
        return feats

    def forward_singlecrop(self, params, data_dict, *, target=None,
                           target_subclips=None,
                           target_subclips_ignore_index=None,
                           mixup_fn: Optional[Callable] = None,
                           train=False, rng: Optional[L.RngStream] = None):
        feats_past = {}
        for mod, data in data_dict.items():
            bb = self.backbones.get(mod)
            if bb is not None:
                bb_params = params.get("backbone", {}).get(mod, {})
                data = bb.apply(bb_params, data)
            feats_past[mod] = self._features_from_video(data)

        if mixup_fn is not None:
            feats_past, target, target_subclips, target_subclips_ignore_index = \
                mixup_fn(feats_past, target, target_subclips)

        outputs = self.future_predictor.apply(
            params["future_predictor"], feats_past, train=train, rng=rng)
        outputs_target = {
            "target": target,
            "target_subclips": target_subclips,
            "target_subclips_ignore_index": target_subclips_ignore_index,
        }
        return outputs, outputs_target

    def apply(self, params, video_data: Dict, *, target=None,
              target_subclips=None, target_subclips_ignore_index=None,
              mixup_fn: Optional[Callable] = None, train=False,
              rng: Optional[L.RngStream] = None):
        """video_data: {mod: (B,T,F) | (B,clips,C,T,H,W) |
        (B,clips,crops,C,T,H,W)} — crops are unbound, forwarded separately and
        averaged (reference models/base_model.py:68-119)."""
        per_mod_crops = {}
        for mod, data in video_data.items():
            if data.ndim in (3, 6):
                per_mod_crops[mod] = [data]
            elif data.ndim == 7 and data.shape[2] == 1:
                per_mod_crops[mod] = [jnp.squeeze(data, axis=2)]
            elif data.ndim == 7:
                per_mod_crops[mod] = [data[:, :, i] for i in range(data.shape[2])]
            else:
                raise NotImplementedError(f"Unsupported size {data.shape}")

        all_mods = sorted(per_mod_crops)
        num_crops = max(len(per_mod_crops[m]) for m in all_mods)
        crop_dicts = []
        for ci in range(num_crops):
            crop_dicts.append({
                m: per_mod_crops[m][ci % len(per_mod_crops[m])]
                for m in all_mods
            })

        feats = [
            self.forward_singlecrop(
                params, el, target=target, target_subclips=target_subclips,
                target_subclips_ignore_index=target_subclips_ignore_index,
                mixup_fn=mixup_fn, train=train, rng=rng)
            for el in crop_dicts
        ]
        output_targets = feats[0][1]

        if num_crops == 1:
            return feats[0][0], output_targets

        # average logits/features over crops; attentions from crop 0
        merged = {}
        for key in feats[0][0]:
            if key == "attentions":
                merged[key] = feats[0][0][key]
                continue
            merged[key] = {
                k: jnp.mean(jnp.stack([f[0][key][k] for f in feats], axis=0),
                            axis=0)
                for k in feats[0][0][key]
            }
        return merged, output_targets
