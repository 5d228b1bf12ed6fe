"""Export data-pipeline golden fixtures from the PyTorch reference.

Runs the reference EPICKitchens/BaseVideoDataset stack (/root/reference) on:
  1. the synthetic EGTEA-style dataset (tools/synthetic.py) with a fake
     in-memory LMDB — pins item-level tensors (windows, padding, backward
     search, per-frame past labels);
  2. the real EK100 RULSTM validation csv with no readers — pins the
     anticipation conversion arithmetic and the class-mapping matrices.

Usage: python tools/export_data_fixtures.py
"""

import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from export_fixtures import install_stubs, REFERENCE  # noqa: E402

OUTDIR = Path("tests/fixtures")
SYNTH = OUTDIR / "synth"


def install_data_stubs():
    import importlib.machinery

    # torchvision: transforms.Compose + type-hint surface
    tv = types.ModuleType("torchvision")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for fn in self.fns:
                x = fn(x)
            return x

    tv.transforms = types.SimpleNamespace(Compose=Compose)
    tv.io = types.SimpleNamespace(read_video=None)
    tv.set_video_backend = lambda *_: None
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv.transforms  # type: ignore

    # fake lmdb backed by {path}/fake.npz
    lmdb = types.ModuleType("lmdb")
    lmdb.__spec__ = importlib.machinery.ModuleSpec("lmdb", None)

    class FakeTxn:
        def __init__(self, store):
            self.store = store

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def get(self, key):
            arr = self.store.get(key.decode("utf-8"))
            return None if arr is None else arr.tobytes()

    class FakeEnv:
        def __init__(self, path):
            data = np.load(Path(path) / "fake.npz")
            self.store = {k: data[k] for k in data.files}

        def begin(self):
            return FakeTxn(self.store)

    lmdb.open = lambda path, **kw: FakeEnv(path)
    sys.modules["lmdb"] = lmdb


def main():
    install_stubs()
    install_data_stubs()
    sys.path.insert(0, REFERENCE)

    import torch
    torch.set_grad_enabled(False)
    from omegaconf import DictConfig
    from datasets.epic_kitchens import EPICKitchens
    from common import transforms as T
    import torchvision

    # --- synthetic dataset must exist ------------------------------------
    if not (SYNTH / "annotations" / "actions.csv").exists():
        sys.path.insert(0, str(Path(__file__).parent.parent))
        from tools.synthetic import make_synthetic
        make_synthetic(SYNTH)

    annot = SYNTH / "annotations"
    mods = ["rgb", "flow"]
    tfm = {m: torchvision.transforms.Compose([T.PermuteRULSTMFeats()])
           for m in mods}

    common = dict(
        annotation_path=[str(annot / "validation1.csv")],
        annotation_dir=str(annot),
        rulstm_annotation_dir=str(annot),
        action_labels_fpath=str(annot / "actions.csv"),
        version=-1,
        label_type="action",
        sample_strategy="last_clip",
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 0.5, "tau_o": 10, "drop_style": "correct"},
        reader_fn={m: {
            "_target_": "datasets.reader_fns.EpicRULSTMFeatsReader",
            "lmdb_path": str(SYNTH / "features" / m)} for m in mods},
        frames_per_clip=10,
        frame_rate=1,
        frame_subclips_options={"num_frames": 1, "stride": 1},
        sec_subclips_options={"num_frames": 1, "stride": 1},
        load_seg_labels=True,
        transforms=tfm,
    )
    ds = EPICKitchens(**common)

    payload = {}
    payload["df::uid"] = ds.df.uid.values.astype(np.int64)
    payload["df::start"] = ds.df.start.values.astype(np.float64)
    payload["df::end"] = ds.df.end.values.astype(np.float64)
    payload["df::orig_start"] = ds.df.orig_start.values.astype(np.float64)
    payload["df::orig_end"] = ds.df.orig_end.values.astype(np.float64)
    payload["df::action_class"] = ds.df.action_class.values.astype(np.int64)
    payload["df::discarded_uid"] = \
        ds.discarded_df.uid.values.astype(np.int64)

    cm = ds.class_mappings
    payload["cm::verb_action"] = cm[("verb", "action")].numpy()
    payload["cm::noun_action"] = cm[("noun", "action")].numpy()

    for i in range(len(ds)):
        item, _ = ds[i]
        for m in mods:
            # (T, F, 1, 1, 1) -> (T, F)
            payload[f"item{i}::data::{m}"] = \
                item["data_dict"][m].squeeze(-1).squeeze(-1).squeeze(-1).numpy()
        payload[f"item{i}::target::action"] = np.int64(item["target"]["action"])
        payload[f"item{i}::subclips::action"] = \
            item["target_subclips"]["action"].numpy()
        payload[f"item{i}::frame_sec"] = \
            item["video_frame_sec"]["rgb"].numpy()
        payload[f"item{i}::uid"] = np.int64(item["uid"])
    payload["n_items"] = np.int64(len(ds))
    np.savez_compressed(OUTDIR / "data_synth.npz", **payload)
    print(f"saved data_synth: {len(ds)} items, {len(payload)} arrays")

    # --- EK100 real-annotation conversion fixture --------------------------
    ek = EPICKitchens(
        annotation_path=["/root/repo/annotations/ek100_rulstm/validation.csv"],
        annotation_dir="/root/repo/annotations/ek100_ori/",
        rulstm_annotation_dir="/root/repo/annotations/ek100_rulstm/",
        action_labels_fpath="/root/repo/annotations/ek100_rulstm/actions.csv",
        version=0.2,
        label_type="action",
        sample_strategy="last_clip",
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 1, "tau_o": 10, "drop_style": "correct"},
        reader_fn={},
        frames_per_clip=10, frame_rate=1,
        frame_subclips_options={"num_frames": 1, "stride": 1},
        sec_subclips_options={"num_frames": 1, "stride": 1},
        load_seg_labels=False, transforms={},
    )
    cm = ek.class_mappings
    np.savez_compressed(OUTDIR / "data_ek100.npz", **{
        "df::uid": np.asarray(ek.df.uid.tolist(), dtype="U"),
        "df::start": ek.df.start.values.astype(np.float64),
        "df::end": ek.df.end.values.astype(np.float64),
        "df::action_class": ek.df.action_class.values.astype(np.int64),
        "df::verb_class": ek.df.verb_class.values.astype(np.int64),
        "df::noun_class": ek.df.noun_class.values.astype(np.int64),
        "n_discarded": np.int64(len(ek.discarded_df)),
        "n_verbs": np.int64(len(ek.verb_classes)),
        "n_nouns": np.int64(len(ek.noun_classes)),
        "n_actions": np.int64(len(ek.action_classes)),
        "cm::verb_action": cm[("verb", "action")].numpy(),
        "cm::noun_action": cm[("noun", "action")].numpy(),
    })
    print(f"saved data_ek100: {len(ek.df)} rows kept, "
          f"{len(ek.discarded_df)} discarded")

    # --- EK100 original-pkl annotation path (the shipped val config) -------
    ek_pkl = EPICKitchens(
        annotation_path=["/root/repo/annotations/ek100_ori/"
                         "EPIC_100_validation.pkl"],
        annotation_dir="/root/repo/annotations/ek100_ori/",
        rulstm_annotation_dir="/root/repo/annotations/ek100_rulstm/",
        action_labels_fpath="/root/repo/annotations/ek100_rulstm/actions.csv",
        version=0.2, label_type="action", sample_strategy="last_clip",
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 1, "tau_o": 16, "drop_style": "correct"},
        reader_fn={}, frames_per_clip=16, frame_rate=1,
        frame_subclips_options={"num_frames": 1, "stride": 1},
        sec_subclips_options={"num_frames": 1, "stride": 1},
        load_seg_labels=False, transforms={},
    )
    np.savez_compressed(OUTDIR / "data_ek100_pkl.npz", **{
        "df::narration_id": np.asarray(ek_pkl.df.narration_id.tolist(),
                                       dtype="U"),
        "df::start": ek_pkl.df.start.values.astype(np.float64),
        "df::end": ek_pkl.df.end.values.astype(np.float64),
        "df::action_class": ek_pkl.df.action_class.values.astype(np.int64),
        "df::video_path": np.asarray(
            [str(p) for p in ek_pkl.df.video_path.tolist()], dtype="U"),
        "n_discarded": np.int64(len(ek_pkl.discarded_df)),
    })
    print(f"saved data_ek100_pkl: {len(ek_pkl.df)} rows, "
          f"{len(ek_pkl.discarded_df)} discarded")

    # --- challenge / marginalization eval fixture --------------------------
    # random logits on the synthetic dataset through the reference's
    # marginalize_verb_noun + compute_accuracies_epic (needs numpyencoder
    # stubbed; scipy is available)
    import types
    import importlib.machinery
    ne = types.ModuleType("numpyencoder")
    ne.__spec__ = importlib.machinery.ModuleSpec("numpyencoder", None)
    ne.NumpyEncoder = object
    sys.modules["numpyencoder"] = ne
    import challenge as ref_challenge

    rng = np.random.default_rng(42)
    n_actions = len(ds.action_classes)
    logits = rng.standard_normal((len(ds), n_actions)).astype(np.float32)
    accs, scores = ref_challenge.marginalize_verb_noun(
        logits, ds, to_prob=True, compute_manyshot_unseen_tail=False)
    np.savez_compressed(OUTDIR / "challenge_eval.npz", **{
        "logits": logits,
        "scores_verb": scores[0], "scores_noun": scores[1],
        **{f"acc::{k}": np.float64(v) for k, v in accs.items()},
    })
    print("saved challenge_eval:", {k: round(float(v), 3)
                                    for k, v in accs.items()
                                    if not np.isnan(v)})


if __name__ == "__main__":
    main()
