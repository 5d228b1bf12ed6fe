"""Minimal LMDB (0.9.x on-disk format) bulk writer, for fixtures/tests.

Builds a read-only-valid data.mdb from sorted key/value pairs: leaf pages
filled left-to-right, branch levels bottom-up, overflow pages for values
larger than the node max, double meta pages. Only what the afft_tpu native
reader (native/lmdb_reader.cpp) and the real liblmdb need to *read*; no
free-list, no dupsort.

``psize`` is parameterizable (liblmdb supports any power of two in
[512, 65536]; 4096 is the default everywhere, but real environments built
with mdb_env_set_mapsize on huge-page systems differ) so tests can cover
non-4K layouts end to end.
"""

from __future__ import annotations

import struct
from pathlib import Path

PAGE_HDR = 16
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
P_INVALID = 0xFFFFFFFFFFFFFFFF


def _even(n):
    return (n + 1) & ~1


class _PageBuilder:
    def __init__(self, psize):
        self.psize = psize
        self.pages = []  # list of bytearray(psize), index = pgno - 2

    def alloc(self, npages=1):
        pgno = len(self.pages) + 2
        for _ in range(npages):
            self.pages.append(bytearray(self.psize))
        return pgno

    def write_node_page(self, flags, nodes):
        """nodes: list of bytes (full node incl. 8B header). Returns pgno."""
        pgno = self.alloc()
        pg = self.pages[pgno - 2]
        upper = self.psize
        ptrs = []
        for node in nodes:
            size = _even(len(node))
            upper -= size
            pg[upper:upper + len(node)] = node
            ptrs.append(upper)
        lower = PAGE_HDR + 2 * len(nodes)
        struct.pack_into("<QHHHH", pg, 0, pgno, 0, flags, lower, upper)
        for i, off in enumerate(ptrs):
            struct.pack_into("<H", pg, PAGE_HDR + 2 * i, off)
        return pgno

    def write_overflow(self, data):
        npages = -(-(PAGE_HDR + len(data)) // self.psize)
        pgno = self.alloc(npages)
        buf = bytearray(npages * self.psize)
        struct.pack_into("<QHHI", buf, 0, pgno, 0, P_OVERFLOW, npages)
        buf[PAGE_HDR:PAGE_HDR + len(data)] = data
        for i in range(npages):
            self.pages[pgno - 2 + i][:] = \
                buf[i * self.psize:(i + 1) * self.psize]
        return pgno, npages


def _leaf_node(key, value, builder, stats, node_max):
    dsize = len(value)
    if 8 + len(key) + dsize > node_max:
        opgno, npages = builder.write_overflow(value)
        stats["overflow_pages"] += npages
        return struct.pack("<HHHH", dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                           F_BIGDATA, len(key)) + key + struct.pack("<Q", opgno)
    return struct.pack("<HHHH", dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                       0, len(key)) + key + value


def _branch_node(key, pgno):
    return struct.pack("<HHHH", pgno & 0xFFFF, (pgno >> 16) & 0xFFFF,
                       (pgno >> 32) & 0xFFFF, len(key)) + key


def write_lmdb(path, kv_pairs, psize=4096):
    """kv_pairs: iterable of (bytes key, bytes value); will be sorted with
    liblmdb's default comparator (memcmp, shorter first)."""
    assert psize >= 512 and psize <= 65536 and psize & (psize - 1) == 0, \
        f"liblmdb page sizes are powers of two in [512, 65536]: {psize}"
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    pairs = sorted(kv_pairs, key=lambda kv: kv[0])
    builder = _PageBuilder(psize)
    stats = {"overflow_pages": 0}
    node_max = ((psize - PAGE_HDR) // 2) & ~1  # liblmdb me_nodemax

    # leaves
    leaf_entries = []  # (first_key, pgno)
    cur_nodes, cur_first, cur_space = [], None, psize - PAGE_HDR
    leaf_pages = 0

    def flush_leaf():
        nonlocal cur_nodes, cur_first, cur_space, leaf_pages
        if not cur_nodes:
            return
        pgno = builder.write_node_page(P_LEAF, cur_nodes)
        leaf_entries.append((cur_first, pgno))
        leaf_pages += 1
        cur_nodes, cur_first, cur_space = [], None, psize - PAGE_HDR

    for key, value in pairs:
        node = _leaf_node(key, value, builder, stats, node_max)
        need = _even(len(node)) + 2
        if need > cur_space:
            flush_leaf()
        if cur_first is None:
            cur_first = key
        cur_nodes.append(node)
        cur_space -= need
    flush_leaf()

    # branch levels bottom-up
    depth = 1
    level = leaf_entries
    branch_pages = 0
    while len(level) > 1:
        next_level = []
        cur_nodes, cur_first, cur_space = [], None, psize - PAGE_HDR
        first_in_page = True

        def flush_branch():
            nonlocal cur_nodes, cur_first, cur_space, branch_pages, \
                first_in_page
            if not cur_nodes:
                return
            pgno = builder.write_node_page(P_BRANCH, cur_nodes)
            next_level.append((cur_first, pgno))
            branch_pages += 1
            cur_nodes, cur_first, cur_space = [], None, psize - PAGE_HDR
            first_in_page = True

        for key, child in level:
            nk = b"" if first_in_page else key
            node = _branch_node(nk, child)
            need = _even(len(node)) + 2
            if need > cur_space:
                flush_branch()
                nk = b""
                node = _branch_node(nk, child)
                need = _even(len(node)) + 2
            if cur_first is None:
                cur_first = key
            cur_nodes.append(node)
            cur_space -= need
            first_in_page = False
        flush_branch()
        level = next_level
        depth += 1

    root = level[0][1] if level else P_INVALID
    if not pairs:
        depth = 0

    # metas: page1 is the live one (txnid 1)
    total_pages = len(builder.pages) + 2
    filesize = total_pages * psize

    def meta_page(pgno, txnid):
        pg = bytearray(psize)
        struct.pack_into("<QHHHH", pg, 0, pgno, 0, P_META, 0, 0)
        off = PAGE_HDR
        struct.pack_into("<IIQQ", pg, off, 0xBEEFC0DE, 1, 0, filesize)
        off += 24
        # dbs[0] (free db): pad carries the page size
        struct.pack_into("<IHHQQQQQ", pg, off, psize, 0, 0, 0, 0, 0, 0,
                         P_INVALID)
        off += 48
        struct.pack_into("<IHHQQQQQ", pg, off, 0, 0, depth, branch_pages,
                         leaf_pages, stats["overflow_pages"], len(pairs),
                         root)
        off += 48
        struct.pack_into("<QQ", pg, off, total_pages - 1, txnid)
        return pg

    with open(path / "data.mdb", "wb") as f:
        f.write(meta_page(0, 0))
        f.write(meta_page(1, 1))
        for pg in builder.pages:
            f.write(pg)
    return path


if __name__ == "__main__":
    import sys
    import numpy as np
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmdb_fixture"
    rng = np.random.default_rng(0)
    pairs = [(f"vid_frame_{i:010d}.jpg".encode(),
              rng.standard_normal(64).astype(np.float32).tobytes())
             for i in range(1, 500)]
    write_lmdb(out, pairs)
    print("wrote", out)
