"""``_target_`` instantiation registry.

The reference wires every pluggable component through
``hydra.utils.instantiate`` with ``_target_`` strings (reference
models/base_model.py:22-25, datasets/data.py:15). We keep the same strings in
our conf tree and expt files for interface compatibility, but resolve them
through an explicit alias table to afft_tpu implementations instead of
importing by module path — reference names like ``models.fusion.CMFuser`` or
``torch.nn.Identity`` therefore keep working against the TPU stack.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

from .config import Config

# reference target name -> "afft_tpu_module:attr"
_ALIASES: Dict[str, str] = {
    # fusers (reference models/fusion.py)
    "models.fusion.MATT": "afft_tpu.models.fusion:MATT",
    "models.fusion.CMFuser": "afft_tpu.models.fusion:CMFuser",
    "models.fusion.TemporalCMFuser": "afft_tpu.models.fusion:TemporalCMFuser",
    "models.fusion.TemporalCrossAttentFuser":
        "afft_tpu.models.fusion:TemporalCrossAttentFuser",
    "models.fusion.ModalTokenCMFuser": "afft_tpu.models.fusion:ModalTokenCMFuser",
    # CMFP variants (reference models/future_prediction.py)
    "models.future_prediction.CMFPEarly": "afft_tpu.models.cmfp:CMFPEarly",
    "models.future_prediction.IndividualFuturePrediction":
        "afft_tpu.models.cmfp:IndividualFuturePrediction",
    "models.future_prediction.CMFPScoreFusion":
        "afft_tpu.models.cmfp:CMFPScoreFusion",
    "models.future_prediction.BaseFuturePredictor":
        "afft_tpu.models.predictor:BaseFuturePredictor",
    # feature mappings (reference models/feature_mapping.py)
    "models.feature_mapping.Linear": "afft_tpu.models.mapping:LinearMapping",
    "models.feature_mapping.GatedLinear": "afft_tpu.models.mapping:GatedLinearMapping",
    "models.feature_mapping.NonLinear": "afft_tpu.models.mapping:NonLinearMapping",
    "models.feature_mapping.GatedEmbeddingUnit":
        "afft_tpu.models.mapping:GatedEmbeddingUnit",
    # backbones
    "torch.nn.Identity": "afft_tpu.models.backbones:Identity",
    # data layer (reference datasets/*)
    "datasets.epic_kitchens.EPICKitchens": "afft_tpu.data.epic:EPICKitchens",
    "datasets.base_video_dataset.convert_to_anticipation":
        "afft_tpu.data.anticipation:convert_to_anticipation",
    "datasets.reader_fns.EpicRULSTMFeatsReader":
        "afft_tpu.data.readers:EpicRULSTMFeatsReader",
    "datasets.reader_fns.DefaultReader": "afft_tpu.data.readers:DefaultReader",
    # optimizers / schedulers (reference conf/opt/**)
    "torch.optim.SGD": "afft_tpu.train.optim:sgd",
    "torch.optim.Adam": "afft_tpu.train.optim:adam",
    "torch.optim.AdamW": "afft_tpu.train.optim:adamw",
    "common.scheduler.CosineLR": "afft_tpu.train.optim:cosine_schedule",
    "common.scheduler.WarmupMultiStepLR": "afft_tpu.train.optim:multistep_schedule",
    "common.scheduler.Warmup": "afft_tpu.train.optim:warmup_wrap",
    "torch.optim.lr_scheduler.MultiStepLR": "afft_tpu.train.optim:multistep_schedule",
    "common.scheduler.ReduceLROnPlateau": "afft_tpu.train.optim:plateau_schedule",
    "torch.optim.lr_scheduler.ReduceLROnPlateau":
        "afft_tpu.train.optim:plateau_schedule",
}


def register(target: str, spec: str) -> None:
    _ALIASES[target] = spec


def resolve_target(target: str) -> Callable:
    spec = _ALIASES.get(target)
    if spec is None:
        # allow direct afft_tpu paths too: "afft_tpu.mod.sub:Attr" or dotted
        spec = target if ":" in target else None
        if spec is None:
            mod_name, _, attr = target.rpartition(".")
            try:
                mod = importlib.import_module(mod_name)
                return getattr(mod, attr)
            except (ImportError, AttributeError) as e:
                raise ValueError(f"Unknown _target_: {target!r}") from e
    mod_name, attr = spec.split(":")
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr)


def _to_plain(value: Any, recursive: bool) -> Any:
    if isinstance(value, Config):
        container = value.to_container(resolve=True)
        return _to_plain(container, recursive)
    if isinstance(value, dict):
        if recursive and "_target_" in value:
            return instantiate(value)
        return {k: _to_plain(v, recursive) for k, v in value.items()}
    if isinstance(value, list):
        return [_to_plain(v, recursive) for v in value]
    return value


def instantiate(cfg: Any, *args, **kwargs) -> Any:
    """hydra.utils.instantiate equivalent.

    ``_recursive_=False`` passes nested ``_target_`` dicts through unresolved
    (the reference relies on this for fuser/CMFP configs,
    models/base_model.py:24-25).
    """
    if cfg is None:
        return None
    if isinstance(cfg, Config):
        cfg = cfg.to_container(resolve=True)
    if not isinstance(cfg, dict):
        raise TypeError(f"instantiate needs a dict/Config, got {type(cfg)}")
    cfg = dict(cfg)
    target = cfg.pop("_target_", None)
    if target is None:
        raise ValueError("missing _target_")
    recursive = cfg.pop("_recursive_", True)
    recursive = kwargs.pop("_recursive_", recursive)
    cfg.pop("_convert_", None)

    fn = resolve_target(target)
    final_kwargs = {k: _to_plain(v, recursive) for k, v in cfg.items()}
    final_kwargs.update(kwargs)
    return fn(*args, **final_kwargs)


def call(cfg: Any, *args, **kwargs) -> Any:
    """hydra.utils.call equivalent (same as instantiate for functions)."""
    return instantiate(cfg, *args, **kwargs)

