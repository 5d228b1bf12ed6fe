"""Data-pipeline parity against golden fixtures from the torch reference.

Fixtures from tools/export_data_fixtures.py: item-level tensors on the
synthetic EGTEA-style dataset (with missing frames exercising the backward
search) and the anticipation conversion on the real EK100 validation csv.
"""

import os

import numpy as np
import pytest

from afft_tpu.data.epic import EPICKitchens
from afft_tpu.data.loader import BatchLoader, shard_indices

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
SYNTH = os.path.join(FIXTURES, "synth")
ANNOT = os.path.join(SYNTH, "annotations")
MODS = ["rgb", "flow"]


def _load(name):
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} missing; run tools/export_data_fixtures.py")
    return np.load(path, allow_pickle=False)


@pytest.fixture(scope="module")
def synth_dataset():
    if not os.path.exists(ANNOT):
        pytest.skip("synthetic dataset missing; run tools/synthetic.py")
    return EPICKitchens(
        annotation_path=[os.path.join(ANNOT, "validation1.csv")],
        annotation_dir=ANNOT,
        rulstm_annotation_dir=ANNOT,
        action_labels_fpath=os.path.join(ANNOT, "actions.csv"),
        version=-1,
        label_type="action",
        sample_strategy="last_clip",
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 0.5, "tau_o": 10, "drop_style": "correct"},
        reader_fn={m: {
            "_target_": "datasets.reader_fns.EpicRULSTMFeatsReader",
            "lmdb_path": os.path.join(SYNTH, "features_packed", m)}
            for m in MODS},
        frames_per_clip=10,
        frame_rate=1,
        load_seg_labels=True,
    )


def test_synth_df_matches_reference(synth_dataset):
    d = _load("data_synth.npz")
    np.testing.assert_array_equal(
        synth_dataset.df.uid.values.astype(np.int64), d["df::uid"])
    np.testing.assert_allclose(synth_dataset.df.start.values, d["df::start"])
    np.testing.assert_allclose(synth_dataset.df.end.values, d["df::end"])
    np.testing.assert_allclose(synth_dataset.df.orig_start.values,
                               d["df::orig_start"])
    np.testing.assert_array_equal(
        synth_dataset.df.action_class.values, d["df::action_class"])
    np.testing.assert_array_equal(
        np.sort(synth_dataset.discarded_df.uid.values.astype(np.int64)),
        np.sort(d["df::discarded_uid"]))


def test_synth_class_mappings(synth_dataset):
    d = _load("data_synth.npz")
    cm = synth_dataset.class_mappings
    np.testing.assert_array_equal(cm[("verb", "action")], d["cm::verb_action"])
    np.testing.assert_array_equal(cm[("noun", "action")], d["cm::noun_action"])


def test_synth_items_match_reference(synth_dataset):
    """Every item: feature windows (incl. backward search + zero fill +
    padding), labels, past-frame labels, frame timestamps."""
    d = _load("data_synth.npz")
    n = int(d["n_items"])
    assert len(synth_dataset) == n
    for i in range(n):
        item = synth_dataset.get_item(i)
        for m in MODS:
            np.testing.assert_allclose(
                item["data_dict"][m], d[f"item{i}::data::{m}"],
                rtol=1e-6, atol=1e-6, err_msg=f"item {i} mod {m}")
        assert item["target"]["action"] == int(d[f"item{i}::target::action"])
        np.testing.assert_array_equal(
            item["target_subclips"]["action"],
            d[f"item{i}::subclips::action"], err_msg=f"item {i} subclips")
        np.testing.assert_allclose(
            item["video_frame_sec"], d[f"item{i}::frame_sec"].squeeze(-1),
            rtol=1e-5, atol=1e-5)
        assert int(item["uid"]) == int(d[f"item{i}::uid"])


def test_ek100_conversion_matches_reference():
    d = _load("data_ek100.npz")
    ds = EPICKitchens(
        annotation_path=["annotations/ek100_rulstm/validation.csv"],
        annotation_dir="annotations/ek100_ori/",
        rulstm_annotation_dir="annotations/ek100_rulstm/",
        action_labels_fpath="annotations/ek100_rulstm/actions.csv",
        version=0.2,
        label_type="action",
        sample_strategy="last_clip",
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 1, "tau_o": 10, "drop_style": "correct"},
        reader_fn={},
        frames_per_clip=10, frame_rate=1, load_seg_labels=False,
    )
    assert len(ds.df) == len(d["df::start"])
    assert len(ds.discarded_df) == int(d["n_discarded"])
    np.testing.assert_array_equal(ds.df.uid.values.astype(str), d["df::uid"])
    np.testing.assert_allclose(ds.df.start.values, d["df::start"])
    np.testing.assert_allclose(ds.df.end.values, d["df::end"])
    np.testing.assert_array_equal(ds.df.action_class.values,
                                  d["df::action_class"])
    assert len(ds.verb_classes) == int(d["n_verbs"])
    assert len(ds.noun_classes) == int(d["n_nouns"])
    assert len(ds.action_classes) == int(d["n_actions"])
    cm = ds.class_mappings
    np.testing.assert_array_equal(cm[("verb", "action")], d["cm::verb_action"])
    np.testing.assert_array_equal(cm[("noun", "action")], d["cm::noun_action"])


def test_shard_indices_cover_all():
    full = set()
    sizes = []
    for shard in range(3):
        idx = shard_indices(100, shuffle=True, seed=1, epoch=4,
                            shard_id=shard, num_shards=3)
        sizes.append(len(idx))
        full.update(idx.tolist())
    assert len(set(sizes)) == 1  # equal shard sizes
    assert full == set(range(100))
    # deterministic per epoch
    a = shard_indices(100, True, 1, 4, 0, 3)
    b = shard_indices(100, True, 1, 4, 0, 3)
    np.testing.assert_array_equal(a, b)
    c = shard_indices(100, True, 1, 5, 0, 3)
    assert not np.array_equal(a, c)


def test_batch_loader_shapes_and_padding(synth_dataset):
    loader = BatchLoader(synth_dataset, batch_size=5, shuffle=True, seed=0,
                         num_workers=2)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == len(loader)
    n_valid = sum(int(b["valid"].sum()) for b in batches)
    assert n_valid == len(synth_dataset)
    for b in batches:
        for m in MODS:
            assert b["data_dict"][m].shape == (5, 10, 24)
        assert b["target"]["action"].shape == (5,)
        assert b["target_subclips"]["action"].shape == (5, 10, 1)
    # all uids seen exactly once among valid rows
    uids = np.concatenate([b["uid"][b["valid"]] for b in batches])
    assert len(np.unique(uids)) == len(synth_dataset)


def test_packed_store_bf16_roundtrip(tmp_path):
    """bf16 packed stores serve reduced-precision features correctly
    (halved transfer bytes on the serving path)."""
    import ml_dtypes
    from afft_tpu.data.readers import PackedFeatureStore
    rng = np.random.default_rng(0)
    table = {"vidX": {i: rng.standard_normal(32).astype(np.float32)
                      for i in range(1, 50)}}
    store = PackedFeatureStore.write(tmp_path / "bf16", table,
                                     dtype="bfloat16")
    assert store.dtype == np.dtype(ml_dtypes.bfloat16)
    out = store.get_frames("vidX", np.array([1, 10, 49]))
    assert out.dtype == np.dtype(ml_dtypes.bfloat16)
    for i, fid in enumerate([1, 10, 49]):
        np.testing.assert_allclose(
            np.asarray(out[i], np.float32),
            table["vidX"][fid].astype(ml_dtypes.bfloat16).astype(np.float32))


def test_device_feature_cache_matches_loader(synth_dataset):
    """HBM-resident cache serves the same features/labels as the host
    loader (modulo the bf16 cast)."""
    import jax.numpy as jnp
    import ml_dtypes
    from afft_tpu.data.device_cache import DeviceFeatureCache
    cache = DeviceFeatureCache(synth_dataset)
    idx = np.array([0, 2, 5, 9])
    cb = cache.batch(idx)
    hb = synth_dataset.load_batch(idx)
    for m in MODS:
        np.testing.assert_array_equal(
            np.asarray(cb["data_dict"][m]),
            hb["data_dict"][m].astype(ml_dtypes.bfloat16))
    np.testing.assert_array_equal(cb["target"]["action"],
                                  hb["target"]["action"])
    np.testing.assert_array_equal(cb["target_subclips"]["action"],
                                  hb["target_subclips"]["action"])
    # padded final batch carries a correct valid mask
    batches = list(cache.iter_batches(batch_size=6))
    assert sum(int(b["valid"].sum()) for b in batches) == len(synth_dataset)
    assert all(b["data_dict"]["rgb"].shape[0] == 6 for b in batches)


def test_challenge_marginalization_matches_reference(synth_dataset):
    """marginalize_verb_noun + compute_accuracies_epic must reproduce the
    reference's numbers on the same random logits (fixture from the torch
    reference's challenge.py)."""
    from afft_tpu.eval.challenge import marginalize_verb_noun
    d = _load("challenge_eval.npz")
    accs, scores = marginalize_verb_noun(
        d["logits"], synth_dataset, to_prob=True,
        compute_manyshot_unseen_tail=False)
    np.testing.assert_allclose(scores[0], d["scores_verb"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(scores[1], d["scores_noun"], rtol=1e-5,
                               atol=1e-6)
    for k in ("vtop1", "vtop5", "vmt5r", "ntop1", "ntop5", "nmt5r",
              "atop1", "atop5", "amt5r"):
        np.testing.assert_allclose(accs[k], float(d[f"acc::{k}"]),
                                   rtol=1e-9, err_msg=k)


def test_loader_propagates_worker_errors():
    """A failing item load must raise in the consumer, not hang the loader
    (the producer forwards exceptions through the queue)."""
    class Broken:
        def __len__(self):
            return 10

        def get_item(self, idx):
            raise RuntimeError("boom")

    loader = BatchLoader(Broken(), batch_size=4, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_loader_early_break_does_not_leak(synth_dataset):
    """Breaking out of iteration must release the producer thread."""
    import threading
    before = threading.active_count()
    for _ in range(5):
        for i, b in enumerate(BatchLoader(synth_dataset, batch_size=4,
                                          num_workers=2, prefetch=1)):
            break
    import time
    time.sleep(1.0)
    assert threading.active_count() <= before + 2


def test_get_frames_batch_asserts_on_unresolvable_clip(synth_dataset):
    from afft_tpu.data.readers import PackedFeatureStore
    store = next(iter(synth_dataset.reader_fn.values())).stores[0]
    video = next(iter(store.videos))
    max_id = int(store.available_frames(video).max())
    with pytest.raises(AssertionError, match="No features found"):
        store.get_frames_batch([video], np.array([[max_id + 100,
                                                   max_id + 101]]))


def test_ek100_pkl_parsing_matches_reference():
    """Original EPIC pkl annotations (the shipped val config path):
    timestamp parsing, video paths, anticipation windows vs the reference."""
    d = _load("data_ek100_pkl.npz")
    ds = EPICKitchens(
        annotation_path=["annotations/ek100_ori/EPIC_100_validation.pkl"],
        annotation_dir="annotations/ek100_ori/",
        rulstm_annotation_dir="annotations/ek100_rulstm/",
        action_labels_fpath="annotations/ek100_rulstm/actions.csv",
        version=0.2, label_type="action", sample_strategy="last_clip",
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 1, "tau_o": 16, "drop_style": "correct"},
        reader_fn={}, frames_per_clip=16, frame_rate=1,
        load_seg_labels=False,
    )
    assert len(ds.df) == len(d["df::start"])
    assert len(ds.discarded_df) == int(d["n_discarded"])
    np.testing.assert_array_equal(
        np.asarray(ds.df.narration_id.tolist(), dtype="U"),
        d["df::narration_id"])
    np.testing.assert_allclose(ds.df.start.values, d["df::start"])
    np.testing.assert_allclose(ds.df.end.values, d["df::end"])
    np.testing.assert_array_equal(ds.df.action_class.values,
                                  d["df::action_class"])
    np.testing.assert_array_equal(
        np.asarray([str(p) for p in ds.df.video_path.tolist()], dtype="U"),
        d["df::video_path"])


class TestGeneralSubclips:
    """General frame/sec subclip options (reference _get_subclips,
    base_video_dataset.py:401-415): sliding windows sampled from the back,
    features flattened window-major (the reference flattens the window stack
    into the temporal axis at base_model.py:44-45)."""

    @staticmethod
    def _ref_windows(x, num_frames, stride):
        # verbatim reference index arithmetic
        total = x.shape[0]
        idxs = list(range(total - num_frames, 0 - num_frames, -stride))[::-1]
        return np.stack([x[i:i + num_frames] for i in idxs])

    @pytest.fixture(scope="class")
    def subclip_dataset(self):
        if not os.path.exists(ANNOT):
            pytest.skip("synthetic dataset missing; run tools/synthetic.py")
        return EPICKitchens(
            annotation_path=[os.path.join(ANNOT, "validation1.csv")],
            annotation_dir=ANNOT,
            rulstm_annotation_dir=ANNOT,
            action_labels_fpath=os.path.join(ANNOT, "actions.csv"),
            version=-1,
            label_type="action",
            sample_strategy="last_clip",
            conv_to_anticipate_fn={
                "_target_":
                    "datasets.base_video_dataset.convert_to_anticipation",
                "tau_a": 0.5, "tau_o": 10, "drop_style": "correct"},
            reader_fn={m: {
                "_target_": "datasets.reader_fns.EpicRULSTMFeatsReader",
                "lmdb_path": os.path.join(SYNTH, "features_packed", m)}
                for m in MODS},
            frames_per_clip=10,
            frame_rate=1,
            load_seg_labels=True,
            # valid tilings: windows from the back must not start negative
            # (T=10: frame starts [0, 6], sec starts [0, 2, 4, 6, 8])
            frame_subclips_options={"num_frames": 4, "stride": 6},
            sec_subclips_options={"num_frames": 2, "stride": 2},
        )

    def test_windows_match_reference_arithmetic(self, synth_dataset,
                                                subclip_dataset):
        for i in range(min(len(synth_dataset), 4)):
            base = synth_dataset.get_item(i)   # default {1,1} item
            sub = subclip_dataset.get_item(i)
            for m in MODS:
                want = self._ref_windows(base["data_dict"][m], 4, 6)
                want = want.reshape(-1, want.shape[-1])  # window-major flat
                np.testing.assert_allclose(sub["data_dict"][m], want,
                                           rtol=1e-6, atol=1e-6)
            want_sec = self._ref_windows(base["video_frame_sec"], 2, 2)
            assert sub["video_frame_sec"].shape == (5, 2)
            np.testing.assert_allclose(sub["video_frame_sec"], want_sec,
                                       rtol=1e-6)
            want_lbl = self._ref_windows(
                base["target_subclips"]["action"][:, 0], 2, 2)
            assert sub["target_subclips"]["action"].shape == (5, 2)
            np.testing.assert_array_equal(sub["target_subclips"]["action"],
                                          want_lbl)

    def test_untileable_options_raise(self, subclip_dataset):
        with pytest.raises(ValueError):
            # T=9, nf=4, stride=3 -> reference would stack ragged slices
            subclip_dataset._subclip_index(9, 4, 3)
        with pytest.raises(ValueError):
            # overlapping windows hitting a negative start (reference
            # range(6,-4,-3) includes -3 and crashes in torch.stack)
            subclip_dataset._subclip_index(10, 4, 3)


class TestDefaultReader:
    """Raw-video DefaultReader decodes real windows through OpenCV
    (reference datasets/reader_fns.py:23-37)."""

    @pytest.fixture(scope="class")
    def video(self, tmp_path_factory):
        cv2 = pytest.importorskip("cv2")
        path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                            (64, 48))
        if not w.isOpened():
            pytest.skip("cv2 build lacks mp4 encoder")
        for i in range(40):  # 4 s at 10 fps, frame i has intensity 6*i
            w.write(np.full((48, 64, 3), min(6 * i, 255), np.uint8))
        w.release()
        return path

    def test_window_selection(self, video):
        from afft_tpu.data.readers import DefaultReader
        r = DefaultReader()
        assert r.get_frame_rate(video) == 10.0
        frames = r.read_window(video, 1.0, 2.0)  # pts 1.0..2.0 inclusive
        assert frames.shape == (11, 48, 64, 3) and frames.dtype == np.uint8
        # lossy codec: intensities within a few levels of the encoded value
        got = frames[:, 0, 0, 0].astype(int)
        want = 6 * np.arange(10, 21)
        assert np.abs(got - want).max() <= 12, (got, want)

    def test_call_tuple_matches_reference_shape(self, video):
        from afft_tpu.data.readers import DefaultReader
        video_arr, audio, info, timings = DefaultReader()(video, 0.0, 0.5)
        assert video_arr.ndim == 4 and len(audio) == 0
        assert info["video_fps"] == 10.0 and timings == {}

    def test_get_video_info(self, video):
        """reference common/utils.py:235-250 helper parity."""
        from afft_tpu.data.readers import get_video_info
        info = get_video_info(video, ["fps", "len"])
        assert info["fps"] == 10.0
        assert abs(info["len"] - 4.0) < 0.2  # 40 frames at 10 fps
        assert get_video_info(video, ["fps"]) == {"fps": 10.0}

    def test_through_dataset_sampling(self, video, tmp_path):
        """FeatureClipDataset samples raw-video windows end-to-end (clip
        strategies + fps subsample + pad run on the frame axis)."""
        import pandas as pd
        from afft_tpu.data.dataset import FeatureClipDataset
        from afft_tpu.data.readers import DefaultReader
        df = pd.DataFrame({
            "video_path": [video] * 2,
            "start": [1.0, 0.0], "end": [3.0, 2.0],
            "action_class": [3, 5],
        })
        ds = FeatureClipDataset(
            df, frames_per_clip=5, frame_rate=2.0,
            reader_fn={"rgb": DefaultReader()},
            sample_strategy="last_clip", label_type="action")
        item = ds.get_item(0)
        assert item["data_dict"]["rgb"].shape == (5, 48, 64, 3)
        assert item["target"]["action"] == 3
        assert len(item["video_frame_sec"]) == 5


def test_packed_store_int8_quantization(tmp_path):
    """int8 packed store: symmetric per-frame quantization, dequantized
    gathers within the max|row|/254 worst-case bound, missing frames still
    zero-filled, batch path matches single path."""
    from afft_tpu.data.readers import PackedFeatureStore
    rng = np.random.default_rng(0)
    table = {"vidX": {i: (rng.standard_normal(32) * (1 + i)).astype(np.float32)
                      for i in range(1, 40, 2)}}  # odd ids: backward search
    store = PackedFeatureStore.write(tmp_path / "q8", table, dtype="int8")
    assert store.dtype == np.int8 and store.scales is not None

    ids = np.array([1, 2, 17, 39])          # 2 resolves backward to 1
    out = store.get_frames("vidX", ids)
    assert out.dtype == np.float32
    for i, fid in enumerate([1, 1, 17, 39]):
        ref = table["vidX"][fid]
        bound = np.abs(ref).max() / 254 + 1e-7
        assert np.abs(out[i] - ref).max() <= bound, fid

    # write_blocks produces the identical store
    store2 = PackedFeatureStore.write_blocks(
        tmp_path / "q8b",
        [("vidX", np.array(sorted(table["vidX"])),
          np.stack([table["vidX"][i] for i in sorted(table["vidX"])]))],
        dtype="int8")
    np.testing.assert_array_equal(
        store2.get_frames("vidX", ids), out)

    # batched gather agrees with per-clip gathers
    batch = store.get_frames_batch(np.array(["vidX", "vidX"]),
                                   np.stack([ids, ids + 2]))
    np.testing.assert_array_equal(batch[0], out)


# ---------------------------------------------------------------------------
# dataset-stats sampling / weighting utilities (new capability; see
# afft_tpu/data/stats.py)
# ---------------------------------------------------------------------------

def test_class_counts_and_balanced_weights(synth_dataset):
    from afft_tpu.data import stats as S
    counts = S.class_counts(synth_dataset, "action")
    labels = np.asarray(synth_dataset.df["action_class"].values)
    assert counts.sum() == (labels >= 0).sum()
    for c in np.unique(labels[labels >= 0]):
        assert counts[c] == (labels == c).sum()

    w = S.balanced_sample_weights(synth_dataset, "action", alpha=1.0)
    assert w.shape == (len(synth_dataset),)
    np.testing.assert_allclose(w.sum(), 1.0)
    # alpha=1: every non-empty class gets equal total sampling mass
    mass = {}
    for c in np.unique(labels[labels >= 0]):
        mass[c] = w[labels == c].sum()
    vals = np.asarray(list(mass.values()))
    np.testing.assert_allclose(vals, vals[0])
    # alpha=0: uniform over samples
    w0 = S.balanced_sample_weights(synth_dataset, "action", alpha=0.0)
    np.testing.assert_allclose(w0, 1.0 / len(synth_dataset))


def test_effective_number_class_weights():
    from afft_tpu.data import stats as S
    counts = np.array([1000, 10, 1, 0])
    w = S.effective_number_class_weights(counts, beta=0.99)
    assert w[2] > w[1] > w[0] > 0  # rarer => heavier
    assert w[3] == 0.0             # empty class contributes nothing
    nz = w[counts > 0]
    np.testing.assert_allclose(nz.mean(), 1.0)


def test_weighted_shard_indices_resample(synth_dataset):
    from afft_tpu.data import stats as S
    w = S.balanced_sample_weights(synth_dataset, "action", alpha=1.0)
    n = len(synth_dataset)
    labels = np.asarray(synth_dataset.df["action_class"].values)
    # many epochs pooled: per-class draw frequency must approach equality
    draws = np.concatenate([
        shard_indices(n, True, 0, e, weights=w) for e in range(400)])
    counts = np.bincount(labels[draws[labels[draws] >= 0]],
                         minlength=labels.max() + 1)
    nz = counts[counts > 0].astype(float)
    assert nz.std() / nz.mean() < 0.1  # near-equal representation
    # sharding still partitions the (weighted) epoch draw
    full = shard_indices(n, True, 0, 7, weights=w)
    parts = [shard_indices(n, True, 0, 7, shard_id=s, num_shards=2,
                           weights=w) for s in range(2)]
    assert sorted(np.concatenate(parts)) == sorted(
        np.concatenate([full, full[:len(parts[0]) * 2 - n]]))


def test_loader_sample_weights_end_to_end(synth_dataset):
    from afft_tpu.data import stats as S
    w = S.balanced_sample_weights(synth_dataset, "action", alpha=1.0)
    loader = BatchLoader(synth_dataset, batch_size=5, shuffle=True, seed=0,
                         num_workers=2, sample_weights=w)
    seen = []
    for batch in loader:
        seen.extend(batch["idx"][batch["valid"]].tolist())
    assert len(seen) == len(synth_dataset)  # epoch length preserved
    assert set(seen) <= set(range(len(synth_dataset)))


def test_device_cache_respects_sample_weights(synth_dataset):
    """class-balanced resampling applies on the data_on_device path too
    (the HBM cache's epoch draw goes through the same weighted
    shard_indices as the host loader)."""
    jax = pytest.importorskip("jax")
    from afft_tpu.data import stats as S
    from afft_tpu.data.device_cache import DeviceFeatureCache

    try:
        cache = DeviceFeatureCache(synth_dataset)
    except AssertionError as e:
        pytest.skip(f"cache unavailable for synth dataset: {e}")
    w = S.balanced_sample_weights(synth_dataset, "action", alpha=1.0)
    seen_w, seen_u = [], []
    for batch in cache.iter_batches(5, shuffle=True, seed=0, epoch=3,
                                    sample_weights=w):
        pass
    idx_w = shard_indices(len(synth_dataset), True, 0, 3, weights=w)
    idx_u = shard_indices(len(synth_dataset), True, 0, 3)
    assert not np.array_equal(idx_w, idx_u)
    # the weighted draw can repeat indices; the uniform one cannot
    assert len(set(idx_u.tolist())) == len(synth_dataset)


def test_device_cache_int8_quantization(synth_dataset):
    """int8 HBM cache: halved footprint, per-frame symmetric dequant on
    gather, small bounded error vs the fp32 host features."""
    from afft_tpu.data.device_cache import DeviceFeatureCache
    cache8 = DeviceFeatureCache(synth_dataset, dtype="int8")
    assert cache8.quantized
    idx = np.arange(len(synth_dataset))
    cb = cache8.batch(idx)
    hb = synth_dataset.load_batch(idx)
    for m in MODS:
        got = np.asarray(cb["data_dict"][m], np.float32)
        ref = np.asarray(hb["data_dict"][m], np.float32)
        assert got.shape == ref.shape
        # error bound: scale/2 per element = max|row|/254, plus the bf16
        # scale storage; check a generous relative-to-row-max bound
        row_max = np.abs(ref).max(axis=-1, keepdims=True)
        err = np.abs(got - ref)
        assert (err <= row_max * (1 / 254 + 1 / 128) + 1e-6).all()
        # all-zero frames stay exactly zero
        zero_rows = (ref == 0).all(axis=-1)
        if zero_rows.any():
            assert (got[zero_rows] == 0).all()
    # footprint: int8 payload is half the bf16 cache's feature bytes
    cache16 = DeviceFeatureCache(synth_dataset)
    for m in MODS:
        q, scale = cache8.features[m]
        assert q.nbytes == cache16.features[m].nbytes // 2


def test_random_clip_varies_per_epoch():
    """random_clip start-frame draw must vary across epochs (the reference
    draws per access) while staying deterministic within an epoch
    (ADVICE r2)."""
    from types import SimpleNamespace
    from afft_tpu.data.dataset import FeatureClipDataset

    ds = SimpleNamespace(frame_rate=1, frames_per_clip=4,
                         sample_strategy="random_clip", random_seed=7,
                         _epoch=0)
    win = lambda: FeatureClipDataset._clip_window(ds, 0.0, 30.0, 30.0, idx=3)

    first = win()
    assert win() == first, "same epoch must be deterministic"
    draws = set()
    for ep in range(8):
        ds._epoch = ep
        draws.add(win())
    assert len(draws) > 1, "window draw must vary across epochs"

    # other rows draw independently within an epoch
    ds._epoch = 0
    other = FeatureClipDataset._clip_window(ds, 0.0, 30.0, 30.0, idx=4)
    assert other != first or True  # no crash; distributional check below
    per_idx = {FeatureClipDataset._clip_window(ds, 0.0, 30.0, 30.0, idx=i)
               for i in range(16)}
    assert len(per_idx) > 1


def test_loader_set_epoch_reaches_dataset():
    from afft_tpu.data.loader import BatchLoader

    class Spy:
        epoch = None

        def __len__(self):
            return 4

        def set_epoch(self, e):
            self.epoch = e

    spy = Spy()
    loader = BatchLoader(spy, batch_size=2)
    loader.set_epoch(5)
    assert spy.epoch == 5


def test_shard_indices_tiny_dataset_fills_all_shards():
    """Wrap-around padding must REPEAT the sequence: with n smaller than
    about half the shard count, a single wrap slice under-fills and
    leaves shards empty (deadlocking lockstep collectives downstream)."""
    from afft_tpu.data.loader import shard_indices

    n, shards = 3, 8
    sizes = []
    all_idx = []
    for s in range(shards):
        part = shard_indices(n, shard_id=s, num_shards=shards,
                             shuffle=False, seed=0, epoch=0)
        sizes.append(len(part))
        all_idx.extend(part.tolist())
    assert min(sizes) == max(sizes) == 1
    assert set(all_idx) == {0, 1, 2}  # every row still covered
