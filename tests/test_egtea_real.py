"""Real-EGTEA annotation parsing (reference datasets/epic_kitchens.py
EGTEA path + conf/dataset/egtea/*): the REAL bundled split files
(annotations/egtea/{training,validation}1.csv, actions.csv — the exact
inputs of the reference's EGTEA experiments, README.md:85) must parse to
the published scale facts. The synthetic smoke/accept datasets already
exercise the EGTEA csv FORMAT end-to-end; this pins the real files, like
the real-EK100-csv leg in test_data.py."""

import numpy as np

from afft_tpu.config import compose
from afft_tpu.config.registry import instantiate


def _build(split):
    cfg = compose("afft_tpu/conf", [f"dataset@dataset_eval=egtea/{split}"])
    ds_cfg = cfg.dataset_eval.to_container(resolve=True)
    ds_cfg["reader_fn"] = {}  # annotations only; no feature stores needed
    return instantiate(ds_cfg, _recursive_=False, load_seg_labels=False)


def test_real_egtea_split1_scale_facts():
    train, val = _build("train"), _build("val")
    # SURVEY.md scale facts: 8,299 train / 2,022 val (split 1), 106 action
    # classes; with EGTEA's tau_a=0.5s/short tau_o no segment is dropped by
    # the anticipation conversion (every kept row keeps >=1 context frame)
    assert len(train) == 8299
    assert len(val) == 2022
    assert len(train.action_classes) == len(val.action_classes) == 106
    # EGTEA is action-only (the reference evaluates action top-1;
    # README.md:85) — no verb/noun class CSVs exist for it
    assert len(train.verb_classes) == 0 and len(train.noun_classes) == 0


def test_real_egtea_items_are_well_formed():
    val = _build("val")
    df = val.df
    # anticipation conversion ran: observed windows end tau_a before the
    # action start and are non-degenerate
    assert (df["end"] <= df["orig_start"]).all()
    assert (df["end"] - df["start"]).min() > 0
    labels = np.asarray(df["action_class"])
    assert labels.min() >= 0 and labels.max() < 106
    # every action class id used by the split exists in the class list
    assert set(np.unique(labels)) <= set(val.action_classes.values())
