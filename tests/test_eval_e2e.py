"""End-to-end evaluation: evaluate() through the real pipeline must agree
with independently-computed metrics from the same logits (SURVEY §4 plan
item e: metric-level integration on the synthetic set)."""

import os

import jax
import numpy as np
import pytest

from afft_tpu.config import compose
from afft_tpu.data.loader import BatchLoader
from afft_tpu.eval.evaluate import _forward_all, evaluate
from afft_tpu.models import BaseModel
from afft_tpu.parallel.mesh import make_mesh, replicate_tree
from afft_tpu.train.metrics import topk_accuracy, topk_recall

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
SYNTH = os.path.join(FIXTURES, "synth")
ANNOT = os.path.join(SYNTH, "annotations")


@pytest.fixture(scope="module")
def setup():
    from afft_tpu.data.epic import EPICKitchens
    if not os.path.exists(ANNOT):
        pytest.skip("synthetic dataset missing")
    ds = EPICKitchens(
        annotation_path=[os.path.join(ANNOT, "validation1.csv")],
        annotation_dir=ANNOT, rulstm_annotation_dir=ANNOT,
        action_labels_fpath=os.path.join(ANNOT, "actions.csv"),
        version=-1, label_type="action", sample_strategy="last_clip",
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 0.5, "tau_o": 10, "drop_style": "correct"},
        reader_fn={m: {
            "_target_": "datasets.reader_fns.EpicRULSTMFeatsReader",
            "lmdb_path": os.path.join(SYNTH, "features_packed", m)}
            for m in ("rgb", "flow")},
        frames_per_clip=10, frame_rate=1, load_seg_labels=False)
    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:24, flow:24}", "model.common_dim=24",
        "model.common.fp_inter_dim=48", "model.common.fp_layers=2",
        "model.common.fp_heads=2", "model.fuser.depth=2",
        "model.fuser.num_heads=2"])
    model = BaseModel(cfg.model,
                      num_classes={k: len(v) for k, v in ds.classes.items()},
                      class_mappings=ds.class_mappings)
    params = model.init(jax.random.key(7))
    mesh = make_mesh(jax.devices()[:1])
    params = replicate_tree(mesh, params)
    return ds, model, params, mesh


def test_evaluate_agrees_with_manual_metrics(setup):
    ds, model, params, mesh = setup
    loader = BatchLoader(ds, batch_size=6, shuffle=False, num_workers=2)
    accs = evaluate(model, params, ds,
                    BatchLoader(ds, batch_size=6, shuffle=False,
                                num_workers=2), mesh)

    # recompute independently from collected logits
    chunks = [c for c, _, _, _ in _forward_all(model, params, loader, mesh)]
    logits = np.concatenate(chunks, axis=0)
    labels = ds.df.action_class.values
    atop1, atop5 = topk_accuracy(logits, labels, ks=(1, 5))
    amt5r = topk_recall(logits, labels, k=5)
    np.testing.assert_allclose(accs["atop1"], atop1 * 100, rtol=1e-9)
    np.testing.assert_allclose(accs["atop5"], atop5 * 100, rtol=1e-9)
    np.testing.assert_allclose(accs["amt5r"], amt5r * 100, rtol=1e-9)

    # marginalized verb metrics use the mapping matrix: verify by hand
    from afft_tpu.eval.challenge import softmax
    cm = ds.class_mappings
    verb_scores = softmax(logits, -1) @ np.asarray(cm[("verb", "action")])
    vtop1 = topk_accuracy(verb_scores, ds.df.verb_class.values, ks=(1,))[0]
    np.testing.assert_allclose(accs["vtop1"], vtop1 * 100, rtol=1e-9)


def test_evaluate_order_matches_dataset_rows(setup):
    """Logit row i must correspond to dataset.df row i (uids align)."""
    ds, model, params, mesh = setup
    loader = BatchLoader(ds, batch_size=7, shuffle=False, num_workers=2)
    uids = np.concatenate(
        [u for _, u, _, _ in _forward_all(model, params, loader, mesh)])
    np.testing.assert_array_equal(uids.astype(np.int64),
                                  ds.df.uid.values.astype(np.int64))


def test_evaluate_from_device_cache_matches_host_loader(setup):
    """The data_on_device eval path (DeviceFeatureCache batches through
    _forward_all/evaluate) must produce the same metrics as the host
    loader — regression test for the cache batches lacking the 'idx' key."""
    ds, model, params, mesh = setup
    from afft_tpu.data.device_cache import DeviceFeatureCache
    cache = DeviceFeatureCache(ds)
    accs_cache = evaluate(model, params, ds,
                          cache.iter_batches(6, shuffle=False), mesh)
    accs_host = evaluate(model, params, ds,
                         BatchLoader(ds, batch_size=6, shuffle=False,
                                     num_workers=2), mesh)
    for key, val in accs_host.items():
        np.testing.assert_allclose(accs_cache[key], val, rtol=2e-4,
                                   err_msg=key)


def test_late_fusion_and_submission_packaging(setup, tmp_path):
    """End-to-end challenge tool: export two models' logits through the
    real save_logits path, late-fuse with weights, package the EK100
    submission (reference challenge.py:287-414 flow)."""
    import json
    import zipfile

    from afft_tpu.eval.challenge import (get_epic_marginalize_late_fuse,
                                         marginalize_verb_noun,
                                         package_results_for_submission_ek100)
    from afft_tpu.eval.evaluate import save_logits
    from afft_tpu.models import BaseModel
    from afft_tpu.config import compose

    ds, model, params, mesh = setup
    cfg2 = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:24, flow:24}", "model.common_dim=24",
        "model.common.fp_inter_dim=48", "model.common.fp_layers=2",
        "model.common.fp_heads=2", "model.fuser.depth=2",
        "model.fuser.num_heads=2"])
    model_b = BaseModel(cfg2.model,
                        num_classes={k: len(v) for k, v in ds.classes.items()},
                        class_mappings=ds.class_mappings)
    params_b = replicate_tree(mesh, model_b.init(jax.random.key(99)))

    dirs = []
    for name, (mdl, prm) in {"A": (model, params),
                             "B": (model_b, params_b)}.items():
        d = tmp_path / name
        loader = BatchLoader(ds, batch_size=6, shuffle=False, num_workers=2)
        save_logits(mdl, prm, loader, mesh, str(d), "test.h5")
        dirs.append(str(d))

    # single-model late fusion with weight [1, 0] == model A alone
    accs_a = evaluate(model, params, ds,
                      BatchLoader(ds, batch_size=6, shuffle=False,
                                  num_workers=2), mesh)
    accs_fused, _, _ = get_epic_marginalize_late_fuse(
        dirs, ds, weights=[1.0, 0.0], prefix_h5="test")
    np.testing.assert_allclose(accs_fused["amt5r"], accs_a["amt5r"],
                               rtol=1e-5)

    # weighted 2-model fusion runs and packages a valid submission
    out_dir = tmp_path / "sub"
    package_results_for_submission_ek100(
        dirs, ds, weights=[1.0, 0.5], output_dir=str(out_dir),
        prefix_h5="test")
    with open(out_dir / "test.json") as f:
        sub = json.load(f)
    assert sub["challenge"] == "action_anticipation"
    assert set(sub) >= {"version", "results", "sls_pt", "sls_tl", "sls_td"}
    n_total = len(ds) + (len(ds.discarded_df)
                         if ds.discarded_df is not None else 0)
    assert len(sub["results"]) == n_total
    one = next(iter(sub["results"].values()))
    assert set(one) == {"verb", "noun", "action"}
    assert all("," in k for k in one["action"])  # "verb,noun" keys
    with zipfile.ZipFile(out_dir / "submit.zip") as zf:
        assert zf.namelist() == ["test.json"]


def test_unseen_tail_empty_subset_yields_nan(setup, tmp_path, monkeypatch):
    """A split with no unseen/tail uids reports nan for those metrics
    instead of aborting the evaluation (the reference divides by zero,
    challenge.py:109-158)."""
    from afft_tpu.eval.challenge import epic100_unseen_tail_eval
    ds, *_ = setup
    for f in ("validation_unseen_participants_ids.csv",
              "validation_tail_verbs_ids.csv",
              "validation_tail_nouns_ids.csv",
              "validation_tail_actions_ids.csv"):
        (tmp_path / f).write_text("")  # no ids -> empty subsets
    monkeypatch.setattr(ds, "rulstm_annotation_dir", str(tmp_path))
    rng = np.random.default_rng(0)
    n = len(ds)
    probs = [rng.random((n, int(ds.df[c].max()) + 1))
             for c in ("verb_class", "noun_class", "action_class")]
    out = epic100_unseen_tail_eval(probs, ds)
    assert all(np.isnan(v) for v in out.values())


def test_unseen_tail_missing_rulstm_dir_warns(setup, monkeypatch, caplog):
    """No rulstm_annotation_dir: NaN breakdowns AND a WARNING naming the
    config kwarg, so a misconfigured real EK100 eval fails loudly in the
    log instead of silently degrading (the reference aborts here,
    challenge.py:109-158)."""
    import logging
    from afft_tpu.eval.challenge import epic100_unseen_tail_eval
    ds, *_ = setup
    monkeypatch.setattr(ds, "rulstm_annotation_dir", None)
    rng = np.random.default_rng(0)
    n = len(ds)
    probs = [rng.random((n, int(ds.df[c].max()) + 1))
             for c in ("verb_class", "noun_class", "action_class")]
    with caplog.at_level(logging.WARNING):
        out = epic100_unseen_tail_eval(probs, ds)
    assert all(np.isnan(v) for v in out.values())
    warned = [r for r in caplog.records if r.levelno >= logging.WARNING
              and "rulstm_annot_dir" in r.getMessage()]
    assert warned, "expected a WARNING naming the rulstm_annot_dir kwarg"
