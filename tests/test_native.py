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


# --- spec-edge fixtures the bulk writer's defaults never emit (VERDICT r3
# #6): non-4K page sizes, >2-page overflow values, >=3-level B+trees at 67k
# keys, torn meta-page recovery, and the backward-search property test
# against the reference's per-frame loop semantics.

@pytest.mark.parametrize("psize", [512, 2048, 8192, 65536])
def test_non_4k_page_sizes(tmp_path, native_lib, psize):
    """liblmdb supports any power-of-two page size in [512, 65536]; the
    reader must take it from the meta, not assume 4096."""
    from make_lmdb_fixture import write_lmdb
    rng = np.random.default_rng(psize)
    pairs = [(f"k{i:07d}".encode(),
              rng.integers(0, 256, rng.integers(8, 120), dtype=np.uint8)
              .tobytes()) for i in range(400)]
    pairs.append((b"zz_overflow", bytes(rng.integers(0, 256, 5000,
                                                     dtype=np.uint8))))
    path = tmp_path / f"env{psize}"
    write_lmdb(path, pairs, psize=psize)
    env = native_lib.NativeLmdb(str(path))
    assert env.entries == len(pairs)
    table = dict(pairs)
    for k in list(table)[::37] + [b"zz_overflow"]:
        assert env.get(k) == table[k]
    assert env.get(b"k9999999") is None
    scanned = list(env.items())
    assert [k for k, _ in scanned] == sorted(table)
    assert all(v == table[k] for k, v in scanned)


def test_multipage_overflow_values(tmp_path, native_lib):
    """Overflow values spanning 3+ pages, including exact page-boundary
    sizes (the writer's own tests only ever produced 2-page overflows)."""
    from make_lmdb_fixture import write_lmdb
    rng = np.random.default_rng(7)
    sizes = [3 * 4096 - 16,      # exactly 3 pages incl. the 16B header
             3 * 4096 - 15,      # one byte into the 4th page
             4 * 4096, 70000]    # 17-plus pages
    pairs = [(f"big{i}".encode(),
              bytes(rng.integers(0, 256, s, dtype=np.uint8)))
             for i, s in enumerate(sizes)]
    pairs += [(f"small{i:04d}".encode(), b"v" * 30) for i in range(50)]
    path = tmp_path / "env"
    write_lmdb(path, pairs)
    env = native_lib.NativeLmdb(str(path))
    table = dict(pairs)
    for k, v in table.items():
        assert env.get(k) == v, k
    assert sorted(k for k, _ in env.items()) == sorted(table)


def test_deep_btree_67k_keys(tmp_path, native_lib):
    """A >=3-level B+tree at real RULSTM scale (EK100 stores hold ~67k
    frame keys per video set): point lookups, misses in every gap region,
    and a complete in-order scan."""
    import struct
    from make_lmdb_fixture import write_lmdb
    n = 67_000
    rng = np.random.default_rng(67)
    vals = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    # ids with gaps so misses exist between real keys
    ids = np.cumsum(rng.integers(1, 3, n))
    pairs = [(f"P01_{int(i):010d}.jpg".encode(), vals[j].tobytes())
             for j, i in enumerate(ids)]
    path = tmp_path / "env"
    write_lmdb(path, pairs)
    raw = open(os.path.join(path, "data.mdb"), "rb").read()
    depth = struct.unpack_from("<H", raw, PAGE_HDR + 24 + 48 + 6)[0]
    assert depth >= 3, f"fixture too shallow: depth={depth}"
    env = native_lib.NativeLmdb(str(path))
    assert env.entries == n
    table = dict(pairs)
    for k in list(table)[:: n // 211]:
        assert env.get(k) == table[k]
    id_set = set(int(i) for i in ids)
    misses = [i for i in range(int(ids[0]), int(ids[-1]))
              if i not in id_set][:: 997]
    for i in misses:
        assert env.get(f"P01_{i:010d}.jpg".encode()) is None
    count = 0
    prev = None
    for k, v in env.items():
        assert prev is None or k > prev  # memcmp order
        assert v == table[k]
        prev = k
        count += 1
    assert count == n


def test_torn_meta_recovery(tmp_path, native_lib):
    """A crash mid-commit tears ONE meta page; the reader must roll back to
    the other committed meta instead of failing the open."""
    import struct
    from make_lmdb_fixture import write_lmdb
    pairs = [(f"k{i:05d}".encode(), b"v" * (20 + i % 40)) for i in range(500)]
    table = dict(pairs)

    def make(name, psize=4096):
        p = tmp_path / name
        write_lmdb(p, pairs, psize=psize)
        return p

    def check_reads(p):
        env = native_lib.NativeLmdb(str(p))
        for k in list(table)[::71]:
            assert env.get(k) == table[k]
        assert env.entries == len(pairs)
        env.close()

    # 1. live meta (page 1, higher txnid) with torn magic -> meta 0 serves
    p = make("torn_magic")
    f = os.path.join(p, "data.mdb")
    raw = bytearray(open(f, "rb").read())
    struct.pack_into("<I", raw, PSIZE + META_MAGIC_OFF, 0x0BADF00D)
    open(f, "wb").write(raw)
    check_reads(p)

    # 2. live meta valid-looking but its root beyond EOF (tail pages never
    #    hit disk) -> roll back to meta 0
    p = make("torn_root")
    f = os.path.join(p, "data.mdb")
    raw = bytearray(open(f, "rb").read())
    struct.pack_into("<Q", raw, PSIZE + META_MAINDB_ROOT_OFF, 10 ** 9)
    open(f, "wb").write(raw)
    check_reads(p)

    # 3. meta 0 torn to garbage (its recorded page size unusable) at a
    #    non-default page size -> the reader probes for meta 1
    for psize in (2048, 4096, 8192):
        p = make(f"torn_meta0_{psize}", psize=psize)
        f = os.path.join(p, "data.mdb")
        raw = bytearray(open(f, "rb").read())
        raw[:psize] = bytes(psize)  # meta 0 fully zeroed
        open(f, "wb").write(raw)
        check_reads(p)

    # 4. both metas torn -> clean IOError naming both
    p = make("torn_both")
    f = os.path.join(p, "data.mdb")
    raw = bytearray(open(f, "rb").read())
    struct.pack_into("<I", raw, META_MAGIC_OFF, 0)
    struct.pack_into("<I", raw, PSIZE + META_MAGIC_OFF, 0)
    open(f, "wb").write(raw)
    with pytest.raises(IOError, match="meta"):
        native_lib.NativeLmdb(str(p))


def test_resolve_backward_matches_reference_loop():
    """Property test: the vectorized backward search equals the reference's
    per-frame radius-10 loop (reference datasets/reader_fns.py:79-84) on
    adversarial id layouts — gaps of exactly radius-1/radius/radius+1,
    requests below the first stored id, beyond the last, and duplicates."""
    from afft_tpu.data.readers import SEARCH_RADIUS, resolve_backward
    assert SEARCH_RADIUS == 10  # reference searches offsets 0..9
    rng = np.random.default_rng(0)
    for trial in range(300):
        n = int(rng.integers(1, 80))
        gaps = rng.choice([1, 2, 8, 9, 10, 11, 40], size=n)
        avail = np.cumsum(gaps).astype(np.int64) + int(rng.integers(0, 7))
        avail_set = set(avail.tolist())
        lo, hi = int(avail[0]) - 15, int(avail[-1]) + 15
        req = rng.integers(lo, hi, size=60).astype(np.int64)
        rows, found = resolve_backward(avail, req)
        for fid, r, ok in zip(req.tolist(), rows, found):
            # the reference loop: first hit scanning offsets 0..9 backward
            want = next((fid - s for s in range(10) if fid - s in avail_set),
                        None)
            if want is None:
                assert not ok, (trial, fid)
            else:
                assert ok and int(avail[r]) == want, (trial, fid, want)
