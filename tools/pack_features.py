"""Pack RULSTM LMDB feature dirs into afft_tpu packed stores.

The reference serves features through per-frame LMDB random reads
(reference datasets/reader_fns.py:65-107) — the throughput bottleneck of its
input pipeline. This offline tool converts each modality's LMDB environment
into the packed memmap format (afft_tpu/data/readers.py PackedFeatureStore):
one contiguous float32 matrix + sorted per-video frame-id tables, so the hot
loader becomes a vectorized gather.

Reads LMDB via the `lmdb` package when installed, else the bundled native
reader (native/lmdb_reader.cpp).

Usage: python tools/pack_features.py SRC_LMDB_DIR DST_PACKED_DIR [...]
       python tools/pack_features.py --root FEATURES_ROOT OUT_ROOT  # all subdirs
"""

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

KEY_RE = re.compile(rb"^(.*)_frame_(\d+)\.jpg$")


def iter_lmdb(src):
    """Yield (video, frame_id, np feature) in cursor (key) order."""
    try:
        import lmdb

        env = lmdb.open(str(src), readonly=True, lock=False)
        with env.begin() as txn:
            for key, val in txn.cursor():
                yield key, val
        env.close()
        return
    except ImportError:
        pass
    from afft_tpu.data.lmdb_native import NativeLmdb

    env = NativeLmdb(str(src))
    yield from env.items()
    env.close()


def pack_one(src, dst, dtype="float32"):
    from afft_tpu.data.readers import PackedFeatureStore

    def rows():
        n = 0
        for key, val in iter_lmdb(src):
            m = KEY_RE.match(key)
            if not m:
                continue
            video = m.group(1).decode()
            fid = int(m.group(2))
            yield video, fid, np.frombuffer(val, np.float32)
            n += 1
            if n % 500000 == 0:
                print(f"  {n} rows...", flush=True)

    store = PackedFeatureStore.write_stream(dst, rows(), dtype=dtype)
    print(f"packed {src} -> {dst}: {len(store.frame_ids)} rows, "
          f"F={store.feature_dim}, {len(store.videos)} videos")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--root", action="store_true",
                    help="treat SRC as a root of modality subdirs")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"],
                    help="storage dtype; bfloat16 halves store size and "
                         "host->device transfer bytes; int8 (symmetric "
                         "per-frame quantization) quarters them")
    args = ap.parse_args()
    if args.root:
        for sub in sorted(Path(args.src).iterdir()):
            if sub.is_dir():
                pack_one(sub, Path(args.dst) / sub.name, args.dtype)
    else:
        pack_one(args.src, args.dst, args.dtype)


if __name__ == "__main__":
    main()
