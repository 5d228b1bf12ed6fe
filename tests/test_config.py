"""Config system: composition, interpolation, overrides, value parsing."""

import os

import pytest

from afft_tpu.config.config import MissingKeyError, compose
from afft_tpu.config.values import parse_value

CONF = os.path.join(os.path.dirname(__file__), "..", "afft_tpu", "conf")


def test_parse_scalar_types():
    assert parse_value("null") is None
    assert parse_value("true") is True
    assert parse_value("16") == 16
    assert parse_value("1e-6") == 1e-6
    assert parse_value("last_clip") == "last_clip"
    assert parse_value("'quoted str'") == "quoted str"


def test_parse_flow_dicts_without_spaces():
    v = parse_value("{rgb:1024, objects:352, audio:1024, flow:1024}")
    assert v == {"rgb": 1024, "objects": 352, "audio": 1024, "flow": 1024}


def test_parse_nested_target_dicts():
    v = parse_value(
        "{rgb:{_target_:datasets.reader_fns.EpicRULSTMFeatsReader,"
        "lmdb_path:${dataset.epic_kitchens100.common.rulstm_feats_dir}/rgb/},"
        "flow:{_target_:datasets.reader_fns.EpicRULSTMFeatsReader,"
        "lmdb_path:/x/flow/,warn_if_using_closeby_frame:false}}")
    assert v["rgb"]["_target_"] == "datasets.reader_fns.EpicRULSTMFeatsReader"
    assert v["flow"]["warn_if_using_closeby_frame"] is False
    assert v["rgb"]["lmdb_path"].startswith("${dataset.")


def test_parse_lists():
    assert parse_value("[rgb, objects, flow]") == ["rgb", "objects", "flow"]
    assert parse_value("[[backbone, 0.0001, 0.000001]]") == \
        [["backbone", 0.0001, 0.000001]]


def test_compose_defaults_and_groups():
    cfg = compose(CONF, [])
    assert cfg.model.fuser._target_ == "models.fusion.ModalTokenCMFuser"
    assert cfg.opt.optimizer._target_ == "torch.optim.SGD"
    assert cfg.dataset_train._target_ == "datasets.epic_kitchens.EPICKitchens"
    # ${model.common_dim} interpolation through model.common.in_features
    assert cfg.model.fuser.dim == cfg.model.common_dim == 1024


def test_group_override_switches_choice():
    cfg = compose(CONF, ["model/fuser=T-SA-Fuser",
                         "dataset@dataset_train=egtea/train"])
    assert cfg.model.fuser._target_ == "models.fusion.TemporalCMFuser"
    assert "egtea" in cfg.dataset_train.annotation_path[0]


def test_interpolation_tracks_overrides():
    cfg = compose(CONF, ["dataset.epic_kitchens100.common.tau_o=16"])
    assert cfg.dataset_train.conv_to_anticipate_fn.tau_o == 16


def test_append_and_strict_overrides():
    cfg = compose(CONF, ["+save_name=test.h5"])
    assert cfg.save_name == "test.h5"
    with pytest.raises(MissingKeyError):
        compose(CONF, ["no.such.key=1"])


def test_modal_dims_flow_override():
    cfg = compose(CONF, ["model.modal_dims={rgb:1024, objects:352}"])
    assert cfg.model.modal_dims.to_container() == {"rgb": 1024, "objects": 352}
    # fuser's ${model.modal_dims} interpolation resolves to the same dict
    assert cfg.model.fuser.modalities.to_container() == \
        {"rgb": 1024, "objects": 352}
