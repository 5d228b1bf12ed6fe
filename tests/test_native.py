"""Native LMDB reader + packer: full chain against the format writer.

synthetic features -> data.mdb (tools/make_lmdb_fixture.py bulk writer)
-> native C++ reader (point get / cursor scan) -> streaming packer
-> PackedFeatureStore == direct in-memory build.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module")
def native_lib():
    try:
        subprocess.check_call(["make", "-C", NATIVE_DIR],
                              stdout=subprocess.DEVNULL,
                              stderr=subprocess.DEVNULL)
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("no C++ toolchain available")
    from afft_tpu.data import lmdb_native
    return lmdb_native


@pytest.fixture(scope="module")
def lmdb_env(tmp_path_factory, native_lib):
    from make_lmdb_fixture import write_lmdb
    rng = np.random.default_rng(3)
    table = {}
    for vid, n, dim in [("SYN-A-V1", 700, 24), ("SYN-B-V2", 150, 1024)]:
        frames = {}
        for i in range(1, n + 1):
            if rng.random() < 0.1:
                continue  # missing frames
            frames[i] = rng.standard_normal(dim).astype(np.float32)
        table[vid] = frames
    path = tmp_path_factory.mktemp("lmdb") / "env"
    pairs = [(f"{vid}_frame_{fid:010d}.jpg".encode(), feat.tobytes())
             for vid, d in table.items() for fid, feat in d.items()]
    write_lmdb(path, pairs)
    return path, table


def test_point_lookups_and_misses(lmdb_env, native_lib):
    path, table = lmdb_env
    env = native_lib.NativeLmdb(str(path))
    n_entries = sum(len(d) for d in table.values())
    assert env.entries == n_entries
    for vid, frames in table.items():
        for fid in list(frames)[::13]:
            got = env.get(f"{vid}_frame_{fid:010d}.jpg".encode())
            assert got == frames[fid].tobytes()
    assert env.get(b"SYN-A-V1_frame_0000099999.jpg") is None
    assert env.get(b"nope") is None


def test_cursor_scan_complete(lmdb_env, native_lib):
    path, table = lmdb_env
    env = native_lib.NativeLmdb(str(path))
    scanned = dict(env.items())
    n_entries = sum(len(d) for d in table.values())
    assert len(scanned) == n_entries
    keys = list(scanned)
    assert keys == sorted(keys)  # cursor yields key order


def test_lmdb_feature_store_without_lmdb_package(lmdb_env, native_lib):
    """LmdbFeatureStore reads via the native reader incl. backward search."""
    from afft_tpu.data.readers import LmdbFeatureStore
    path, table = lmdb_env
    store = LmdbFeatureStore(str(path))
    vid = "SYN-A-V1"
    avail = np.array(sorted(table[vid]))
    req = np.array([1, 5, 50, 300, 699])
    feats = store.get_frames(vid, req)
    for i, fid in enumerate(req):
        candidates = avail[(avail <= fid) & (avail >= fid - 9)]
        if len(candidates):
            np.testing.assert_array_equal(feats[i], table[vid][candidates[-1]])
        else:
            assert np.all(feats[i] == 0)


def test_pack_then_read_equivalence(lmdb_env, native_lib, tmp_path):
    from pack_features import pack_one
    from afft_tpu.data.readers import PackedFeatureStore
    path, table = lmdb_env
    # the two test videos have different feature dims; pack each separately
    # like per-modality dirs would be
    for vid, dim in [("SYN-A-V1", 24), ("SYN-B-V2", 1024)]:
        sub_pairs = {f"{vid}_frame_{fid:010d}.jpg".encode(): feat.tobytes()
                     for fid, feat in table[vid].items()}
        from make_lmdb_fixture import write_lmdb
        src = tmp_path / f"src_{vid}"
        write_lmdb(src, sub_pairs.items())
        dst = tmp_path / f"packed_{vid}"
        pack_one(src, dst)
        direct = PackedFeatureStore.write(tmp_path / f"direct_{vid}",
                                          {vid: table[vid]})
        packed = PackedFeatureStore(dst)
        req = np.arange(1, 120)
        np.testing.assert_array_equal(packed.get_frames(vid, req),
                                      direct.get_frames(vid, req))
