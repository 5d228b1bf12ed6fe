"""EPIC-55 support: version-0.1 annotation parsing and many-shot subsets
(reference datasets/epic_kitchens.py:108-146)."""

import numpy as np

from afft_tpu.config import compose
from afft_tpu.config.registry import instantiate


def _build_ek55(split="val"):
    cfg = compose("afft_tpu/conf", [
        f"dataset@dataset_eval=epic_kitchens55/{split}",
    ])
    ds_cfg = cfg.dataset_eval.to_container(resolve=True)
    ds_cfg["reader_fn"] = {}
    return instantiate(ds_cfg, _recursive_=False, load_seg_labels=False)


def test_ek55_parses_and_builds_class_maps():
    ds = _build_ek55()
    assert ds.version == 0.1
    assert len(ds) > 1000
    assert len(ds.verb_classes) == 125
    assert len(ds.noun_classes) == 352
    assert len(ds.action_classes) > 2000
    cm = ds.class_mappings
    v = np.asarray(cm[("verb", "action")])
    assert v.shape[0] == len(ds.action_classes)
    # every action maps to exactly one verb and one noun
    assert np.all(v.sum(axis=1)[np.asarray(
        sorted(set(ds.verb_noun_to_action.values())))] == 1)


def test_ek55_manyshot_subsets():
    ds = _build_ek55()
    ms = ds.classes_manyshot
    assert set(ms) == {"verb", "noun", "action"}
    assert 0 < len(ms["verb"]) < len(ds.verb_classes)
    assert 0 < len(ms["noun"]) < len(ds.noun_classes)
    assert 0 < len(ms["action"]) < len(ds.action_classes)


def test_ek55_audio_fps_remap():
    """EK55 video names have 2-char suffixes -> native 59.94 fps for
    audio/pose features (reference reader_fns.py:148-156)."""
    from afft_tpu.data.readers import EpicRULSTMFeatsReader
    assert abs(EpicRULSTMFeatsReader._get_orig_video_fps("P01_02")
               - 59.94005994005994) < 1e-9
    assert EpicRULSTMFeatsReader._get_orig_video_fps("P01_102") == 50.0
