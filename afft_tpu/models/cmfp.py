"""Cross-modal fusion + future prediction heads (CMFP variants).

Behavioural reference: models/future_prediction.py in the upstream repo —
CrossModalFusionPrediction :19-186, IndividualFuturePrediction :189-225,
CMFPEarly :228-291, CMFPScoreFusion :294-351. Each variant composes the
mapping layers, a fuser, the causal future predictor and classifier heads
into one pure ``apply`` that returns the reference's output dictionary
(``logits/*``, ``past_logits/*``, ``orig_past``, ``future``, ``past_futures``,
``all-fused``, ``attentions``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from . import layers as L
from ..config.registry import instantiate

PAST_LOGITS_PREFIX = "past_"


def _linear_or_identity(rng, in_dim, out_dim):
    """Bias-free torch-default Linear, or identity when dims match
    (reference models/future_prediction.py:62,248)."""
    if in_dim == out_dim:
        return None
    return L.torch_linear_init(rng, in_dim, out_dim, bias=False)


def _apply_linear_or_identity(p, x):
    return x if p is None else L.linear_apply(p, x)


class _CMFPBase:
    """Shared wiring: mapping layers, fuser, dim encoder/decoder, predictors,
    classifiers (reference CrossModalFusionPrediction)."""

    uses_fuser = True
    uses_mapping = True

    def __init__(self, model_cfg, num_classes: Dict[str, int]):
        self.cfg = model_cfg
        self.num_classes = dict(num_classes)
        common = model_cfg["common"]
        self.latent_dim = common["in_features"]
        self.fp_inter_dim = common["fp_inter_dim"]
        self.fp_output_len = common["fp_output_len"]
        self.modality_dims = dict(model_cfg["modal_dims"].items()) \
            if hasattr(model_cfg["modal_dims"], "items") else dict(model_cfg["modal_dims"])
        self.modal_feature_order = list(model_cfg["modal_feature_order"])
        self.dropout_rate = model_cfg["dropout"]
        self.common_predictor = common["share_predictors"]
        self.common_classifier = common["share_classifiers"]
        self.modality_cls = common["modality_cls"]
        self.fusion_cls = common["fusion_cls"]
        assert self.modality_cls or self.fusion_cls, \
            "Modality-level and / or fusion classification!"

        if self.uses_mapping:
            self.mapping = {
                mod: instantiate(model_cfg["mapping"],
                                 in_features=self.modality_dims[mod],
                                 out_features=self.latent_dim)
                for mod in self.modality_dims
            }
        if self.uses_fuser:
            self.fuser = instantiate(model_cfg["fuser"], _recursive_=False)

        self.predictor_proto = instantiate(
            model_cfg["future_predictor"], in_features=self.fp_inter_dim,
            dimension_mapping=False, _recursive_=False)

        # classifier table: cls_type -> list of head keys
        self.classifier_keys: Dict[str, list] = {}
        for cls_type in self.num_classes:
            heads = []
            if self.modality_cls:
                heads += list(self.modality_dims.keys())
            if self.fusion_cls:
                heads.append("all-fused")
            self.classifier_keys[cls_type] = heads

    # -- per-variant dim encoder/decoder ------------------------------------
    def _init_dim_codec(self, rng):
        """Per-modality encoder/decoder latent<->fp_inter_dim
        (reference :56-72)."""
        p_enc, p_dec = {}, {}
        for i, (modk, mod_dim) in enumerate(sorted(self.modality_dims.items())):
            k1 = jax.random.fold_in(rng, 2 * i)
            k2 = jax.random.fold_in(rng, 2 * i + 1)
            p_enc[modk] = _linear_or_identity(k1, mod_dim, self.fp_inter_dim)
            p_dec[modk] = _linear_or_identity(k2, self.fp_inter_dim, mod_dim)
        return p_enc, p_dec

    def _init_predictors(self, rng):
        if self.common_predictor:
            return {"shared": self.predictor_proto.init(rng)}
        return {
            modk: self.predictor_proto.init(jax.random.fold_in(rng, i))
            for i, modk in enumerate(sorted(self.modality_dims))
        }

    def _predict(self, params, modk, feats, *, train, rng):
        p = params["future_predictor"]["shared"] if self.common_predictor \
            else params["future_predictor"][modk]
        return self.predictor_proto.apply(
            p, feats, self.fp_output_len, train=train, rng=rng)

    def _init_classifiers(self, rng):
        """reference :97-122; shared classifier => one params set reused by
        every head key of that cls_type."""
        out = {}
        for i, (cls_type, cls_dim) in enumerate(sorted(self.num_classes.items())):
            k = jax.random.fold_in(rng, i)
            if self.common_classifier:
                out[cls_type] = {
                    "shared": L.torch_linear_init(k, self.latent_dim, cls_dim)}
            else:
                heads = {}
                for j, headk in enumerate(self.classifier_keys[cls_type]):
                    in_dim = (self.latent_dim if headk == "all-fused"
                              else self.modality_dims[headk])
                    heads[headk] = L.torch_linear_init(
                        jax.random.fold_in(k, j), in_dim, cls_dim)
                out[cls_type] = heads
        return out

    def apply_classifier(self, params, input_feat: Dict, outputs_prefix="",
                         *, train=False, rng=None):
        out = {}
        for cls_type in self.num_classes:
            heads = {}
            for headk in self.classifier_keys[cls_type]:
                if headk not in input_feat:
                    continue
                p = (params["classifiers"][cls_type]["shared"]
                     if self.common_classifier
                     else params["classifiers"][cls_type][headk])
                x = L.dropout(input_feat[headk], self.dropout_rate, train, rng)
                heads[headk] = L.linear_apply(p, x)
            out[f"{outputs_prefix}logits/{cls_type}"] = heads
        return out

    @staticmethod
    def prepare_output(z: Dict, z_hat: Dict, fusions: Dict):
        """Split the predicted sequence into teacher-forced past and future
        (reference :155-182)."""
        out = {"orig_past": z, "future": dict(z_hat), "all-fused": dict(fusions),
               "past_futures": {}}
        T = next(iter(z.values())).shape[1]
        for modk in out["future"]:
            out["past_futures"][modk] = jnp.concatenate(
                [z[modk][:, :1], out["future"][modk][:, :T - 1]], axis=1)
            out["future"][modk] = out["future"][modk][:, T - 1:]
        for modk in out["all-fused"]:
            out["all-fused"][modk] = out["all-fused"][modk][:, T - 1:]
        return out

    def feature_mapping(self, params, x_d: Dict, order=None):
        return {modk: self.mapping[modk].apply(params["mapping"][modk], x)
                for modk, x in x_d.items()}

    def feats_order(self, feats: Dict):
        return [m for m in self.modal_feature_order if m in feats]


class CMFPEarly(_CMFPBase):
    """Early fusion: map -> fuse -> predict on the fused sequence
    (reference models/future_prediction.py:228-291). Shared classifier and
    predictor are implied by early fusion (:235-242)."""

    def __init__(self, model_cfg, num_classes, fuser_need_weights=False):
        # in-place cfg mutation is reference parity (future_prediction.py
        # :235-242 sets the same flags on the SHARED OmegaConf object);
        # callers re-using one cfg for several variants inherit them there
        # too
        common = model_cfg["common"]
        common["share_classifiers"] = True
        common["share_predictors"] = True
        super().__init__(model_cfg, num_classes)
        self.fuser_need_weights = fuser_need_weights

    def _init_dim_codec(self, rng):
        """Fused features are already at latent dim: one codec
        (reference :245-255)."""
        k1, k2 = jax.random.split(rng)
        enc = _linear_or_identity(k1, self.latent_dim, self.fp_inter_dim)
        dec = _linear_or_identity(k2, self.fp_inter_dim, self.latent_dim)
        return enc, dec

    def init(self, rng):
        k_map, k_fuse, k_codec, k_pred, k_cls = jax.random.split(rng, 5)
        enc, dec = self._init_dim_codec(k_codec)
        return {
            "mapping": {
                modk: self.mapping[modk].init(jax.random.fold_in(k_map, i))
                for i, modk in enumerate(sorted(self.modality_dims))
            },
            "fuser": self.fuser.init(k_fuse),
            "dim_encoder": enc,
            "dim_decoder": dec,
            "future_predictor": self._init_predictors(k_pred),
            "classifiers": self._init_classifiers(k_cls),
        }

    def apply(self, params, feats: Dict, *, train=False,
              rng: Optional[L.RngStream] = None):
        order = self.feats_order(feats)
        x_hat = self.feature_mapping(params, feats)
        z, modality_attns = self.fuser.apply(
            params["fuser"], x_hat, order, train=train, rng=rng,
            need_weights=self.fuser_need_weights)

        z_enc = _apply_linear_or_identity(params["dim_encoder"], z)
        z_hat_enc, temporal_attns = self._predict(params, None, z_enc,
                                                  train=train, rng=rng)
        z_hat = _apply_linear_or_identity(params["dim_decoder"], z_hat_enc)

        z_d = {"all-fused": z}
        z_hat_d = {"all-fused": z_hat}
        attentions = {"all-fused": {"modality_attns": modality_attns,
                                    "temporal_attns": temporal_attns}}
        fusion = dict(z_d)

        out = self.prepare_output(z_d, z_hat_d, fusion)
        out.update(self.apply_classifier(params, out["past_futures"],
                                         PAST_LOGITS_PREFIX, train=train,
                                         rng=rng))
        out.update(self.apply_classifier(params, out["future"], train=train,
                                         rng=rng))
        out["attentions"] = attentions
        return out


class IndividualFuturePrediction(_CMFPBase):
    """Per-modality prediction, no fusion (reference :189-225)."""

    uses_fuser = False
    uses_mapping = False

    def __init__(self, model_cfg, num_classes):
        assert not model_cfg["common"]["fusion_cls"], \
            "fusion_cls must be off for individual prediction"
        super().__init__(model_cfg, num_classes)

    def init(self, rng):
        k_codec, k_pred, k_cls = jax.random.split(rng, 3)
        enc, dec = self._init_dim_codec(k_codec)
        return {
            "dim_encoder": enc,
            "dim_decoder": dec,
            "future_predictor": self._init_predictors(k_pred),
            "classifiers": self._init_classifiers(k_cls),
        }

    def apply(self, params, z: Dict, *, train=False,
              rng: Optional[L.RngStream] = None):
        z_hat, attentions = {}, {}
        for modk, z_unimod in z.items():
            z_enc = _apply_linear_or_identity(params["dim_encoder"][modk],
                                              z_unimod)
            z_hat_enc, atts = self._predict(params, modk, z_enc, train=train,
                                            rng=rng)
            z_hat[modk] = _apply_linear_or_identity(
                params["dim_decoder"][modk], z_hat_enc)
            attentions[modk] = atts

        out = self.prepare_output(z, z_hat, {})
        out.update(self.apply_classifier(params, out["past_futures"],
                                         PAST_LOGITS_PREFIX, train=train,
                                         rng=rng))
        out.update(self.apply_classifier(params, out["future"], train=train,
                                         rng=rng))
        return out


class CMFPScoreFusion(_CMFPBase):
    """RULSTM-style late fusion: per-modality predictions and logits, fused
    by MATT attention weights (reference :294-351)."""

    def __init__(self, model_cfg, num_classes):
        assert not model_cfg["common"]["fusion_cls"], \
            "fusion_cls not used: scores are fused directly"
        model_cfg["common"]["modality_cls"] = True
        super().__init__(model_cfg, num_classes)

    def init(self, rng):
        k_map, k_fuse, k_codec, k_pred, k_cls = jax.random.split(rng, 5)
        enc, dec = self._init_dim_codec(k_codec)
        return {
            "mapping": {
                modk: self.mapping[modk].init(jax.random.fold_in(k_map, i))
                for i, modk in enumerate(sorted(self.modality_dims))
            },
            "fuser": self.fuser.init(k_fuse),
            "dim_encoder": enc,
            "dim_decoder": dec,
            "future_predictor": self._init_predictors(k_pred),
            "classifiers": self._init_classifiers(k_cls),
        }

    def apply(self, params, z: Dict, *, train=False,
              rng: Optional[L.RngStream] = None):
        order = self.feats_order(z)

        z_hat = {}
        for modk, z_unimod in z.items():
            z_enc = _apply_linear_or_identity(params["dim_encoder"][modk],
                                              z_unimod)
            z_hat_enc, _ = self._predict(params, modk, z_enc, train=train,
                                         rng=rng)
            z_hat[modk] = _apply_linear_or_identity(
                params["dim_decoder"][modk], z_hat_enc)

        # first original frame + predicted frames, mapped to the common dim
        z_hat_cat = {modk: jnp.concatenate([z[modk][:, :1], z_hat[modk]],
                                           axis=1) for modk in z}
        z_hat_cat = self.feature_mapping(params, z_hat_cat)
        modality_attns = self.fuser.apply(params["fuser"], z_hat_cat, order,
                                          train=train, rng=rng)

        out = self.prepare_output(z, z_hat, {})
        logits_past = self.apply_classifier(params, out["past_futures"],
                                            PAST_LOGITS_PREFIX, train=train,
                                            rng=rng)
        logits_future = self.apply_classifier(params, out["future"],
                                              train=train, rng=rng)

        for cls_type in self.num_classes:
            lp = logits_past[f"{PAST_LOGITS_PREFIX}logits/{cls_type}"]
            lf = logits_future[f"logits/{cls_type}"]
            past_final = jnp.zeros_like(next(iter(lp.values())))
            future_final = jnp.zeros_like(next(iter(lf.values())))
            for i, modk in enumerate(order):
                past_final = past_final + \
                    modality_attns[:, :-1, i][..., None] * lp[modk]
                future_final = future_final + \
                    modality_attns[:, -1:, i][..., None] * lf[modk]
            out[f"{PAST_LOGITS_PREFIX}logits/{cls_type}"] = \
                {"all-fused": past_final}
            out[f"logits/{cls_type}"] = {"all-fused": future_final}
        return out
