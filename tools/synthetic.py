"""Synthetic EGTEA-style dataset for pipeline tests and benchmarks.

Generates annotations (RULSTM csv format), per-frame features with realistic
missing-frame patterns (random drops + a gap wider than the backward-search
radius), and materializes them both as a fake-LMDB npz (consumed by the
reference code under tools/export_data_fixtures.py) and as an afft_tpu packed
store.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

N_VERBS, N_NOUNS = 5, 6


def make_synthetic(root, seed=0, n_videos=4, segments_per_video=20,
                   feat_dim=24, modalities=("rgb", "flow"), fps=30.0):
    root = Path(root)
    rng = np.random.default_rng(seed)
    videos = [f"SYN-P{i:02d}-Video{i}" for i in range(1, n_videos + 1)]

    # action vocabulary: a subset of the verb x noun grid
    pairs = [(v, n) for v in range(N_VERBS) for n in range(N_NOUNS)]
    rng.shuffle(pairs)
    actions = pairs[:12]
    annot_dir = root / "annotations"
    annot_dir.mkdir(parents=True, exist_ok=True)
    with open(annot_dir / "actions.csv", "w") as f:
        for i, (v, n) in enumerate(actions):
            f.write(f"{i}, {v}_{n}, Verb{v}_Noun{n}\n")

    # segments: uid, video, start_frame, end_frame, verb, noun, action
    rows = []
    uid = 0
    video_len = {}
    for vid in videos:
        length = int(rng.integers(4000, 7000))
        video_len[vid] = length
        starts = np.sort(rng.integers(5, length - 300, segments_per_video))
        # a couple of segments right at the video start exercise the
        # drop rule and front padding
        starts[0], starts[1] = 8, 40
        for s in starts:
            dur = int(rng.integers(30, 200))
            a = int(rng.integers(len(actions)))
            v, n = actions[a]
            rows.append((uid, vid, int(s), int(s) + dur, v, n, a))
            uid += 1
    rng.shuffle(rows)
    split = int(0.8 * len(rows))
    for name, chunk in [("training1.csv", rows[:split]),
                        ("validation1.csv", rows[split:])]:
        with open(annot_dir / name, "w") as f:
            for r in chunk:
                f.write(",".join(str(x) for x in r) + "\n")

    # per-frame features with missing frames. Frames preceding each action
    # carry a class-dependent component so anticipation is actually
    # learnable (used by the end-to-end convergence test); base noise keeps
    # the task non-trivial.
    class_sig = {mod: np.random.default_rng(hash(("sig", mod)) % (2 ** 31))
                 .standard_normal((len(actions), feat_dim)).astype(np.float32)
                 for mod in modalities}
    rows_by_video = {}
    for r in rows:
        rows_by_video.setdefault(r[1], []).append(r)
    feats = {}
    for mod in modalities:
        table = {}
        for vid in videos:
            length = video_len[vid]
            frame_ids = np.arange(1, length + 1)
            keep = rng.random(length) > 0.08          # ~8% random drops
            gap_at = int(rng.integers(200, length - 200))
            keep[gap_at:gap_at + 15] = False          # gap > search radius
            frame_ids = frame_ids[keep]
            g = np.random.default_rng(hash((mod, vid)) % (2 ** 31))
            base = {int(fid): g.standard_normal(feat_dim).astype(np.float32)
                    for fid in frame_ids}
            for (_, _, s, _, _, _, a) in rows_by_video.get(vid, []):
                lo, hi = max(1, s - int(12 * fps)), s
                for fid in range(lo, hi + 1):
                    if fid in base:
                        base[fid] = base[fid] + 0.8 * class_sig[mod][a]
            table[vid] = base
        feats[mod] = table

        # fake-LMDB npz: key -> raw float32 bytes (as the reference reads)
        lmdb_dir = root / "features" / mod
        lmdb_dir.mkdir(parents=True, exist_ok=True)
        np.savez(lmdb_dir / "fake.npz", **{
            f"{vid}_frame_{fid:010d}.jpg": feat
            for vid, d in table.items() for fid, feat in d.items()})

        # afft_tpu packed store
        from afft_tpu.data.readers import PackedFeatureStore
        PackedFeatureStore.write(root / "features_packed" / mod, table)

    (root / "meta.json").write_text(json.dumps(
        {"videos": video_len, "modalities": list(modalities),
         "feat_dim": feat_dim, "fps": fps}))
    return root


if __name__ == "__main__":
    import sys
    make_synthetic(sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/synth")
    print("synthetic dataset written")
