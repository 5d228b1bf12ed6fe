"""ctypes binding for the native LMDB-format reader (native/lmdb_reader.cpp).

Presents the tiny subset of the ``lmdb`` Python API the framework uses
(``env.begin()`` -> txn with ``get``; plus full iteration for the packer).
The shared library is built on demand with the repo's Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Iterator, Optional, Tuple

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libafft_lmdb.so"
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    # rebuild when the .so is missing or older than its source (a stale
    # prebuilt .so from before an ABI addition would load and fail symbol
    # registration below); if the toolchain is absent but a current-enough
    # .so exists, fall back to loading it rather than hard-failing
    src = _NATIVE_DIR / "lmdb_reader.cpp"
    stale = (not _LIB_PATH.exists()
             or (src.exists()
                 and src.stat().st_mtime > _LIB_PATH.stat().st_mtime))
    if stale:
        try:
            subprocess.check_call(["make", "-C", str(_NATIVE_DIR)],
                                  stdout=subprocess.DEVNULL)
        except (OSError, subprocess.CalledProcessError) as e:
            if not _LIB_PATH.exists():
                raise
            # fall back to the existing (but OUT-OF-DATE) library: loudly,
            # so a later wrong read / missing symbol is traceable to the
            # failed rebuild rather than silent
            import logging
            logging.getLogger(__name__).warning(
                "native lmdb reader rebuild failed (%s); loading the "
                "STALE %s built before %s was last modified — parser "
                "behavior may lag the source", e, _LIB_PATH.name, src.name)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.afft_lmdb_open.restype = ctypes.c_void_p
    lib.afft_lmdb_open.argtypes = [ctypes.c_char_p]
    lib.afft_lmdb_close.argtypes = [ctypes.c_void_p]
    lib.afft_lmdb_entries.restype = ctypes.c_uint64
    lib.afft_lmdb_entries.argtypes = [ctypes.c_void_p]
    lib.afft_lmdb_get.restype = ctypes.c_int
    lib.afft_lmdb_get.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t)]
    lib.afft_lmdb_cursor_open.restype = ctypes.c_void_p
    lib.afft_lmdb_cursor_open.argtypes = [ctypes.c_void_p]
    lib.afft_lmdb_cursor_next.restype = ctypes.c_int
    lib.afft_lmdb_cursor_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t)]
    lib.afft_lmdb_cursor_close.argtypes = [ctypes.c_void_p]
    lib.afft_lmdb_last_error.restype = ctypes.c_char_p
    lib.afft_lmdb_last_error.argtypes = []
    _lib = lib
    return lib


def _last_error(lib) -> str:
    msg = lib.afft_lmdb_last_error()
    return msg.decode("utf-8", "replace") if msg else "unknown error"


class _Txn:
    def __init__(self, env: "NativeLmdb"):
        self._env = env

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def get(self, key: bytes) -> Optional[bytes]:
        return self._env.get(key)


class NativeLmdb:
    """lmdb.Environment-alike over the native reader."""

    def __init__(self, path: str):
        lib = _load_lib()
        self._lib = lib
        self._handle = lib.afft_lmdb_open(str(path).encode())
        if not self._handle:
            raise IOError(f"cannot open LMDB environment at {path}: "
                          f"{_last_error(lib)}")

    def begin(self) -> _Txn:
        return _Txn(self)

    def get(self, key: bytes) -> Optional[bytes]:
        val = ctypes.c_void_p()
        vlen = ctypes.c_size_t()
        rc = self._lib.afft_lmdb_get(self._handle, key, len(key),
                                     ctypes.byref(val), ctypes.byref(vlen))
        if rc < 0:
            # -1 is the native reader's corruption code (bad page /
            # unreachable overflow page) — distinct from a plain miss,
            # which must NOT be zero-filled away by the backward search
            raise IOError(f"corrupt LMDB entry for key {key!r}: "
                          f"{_last_error(self._lib)}")
        if rc == 0:
            return None
        return ctypes.string_at(val.value, vlen.value)

    @property
    def entries(self) -> int:
        return int(self._lib.afft_lmdb_entries(self._handle))

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        """Full scan in key order (used by the feature packer)."""
        lib = self._lib
        cur = lib.afft_lmdb_cursor_open(self._handle)
        key, klen = ctypes.c_void_p(), ctypes.c_size_t()
        val, vlen = ctypes.c_void_p(), ctypes.c_size_t()
        try:
            while True:
                rc = lib.afft_lmdb_cursor_next(
                    cur, ctypes.byref(key), ctypes.byref(klen),
                    ctypes.byref(val), ctypes.byref(vlen))
                if rc < 0:
                    raise IOError("corrupt LMDB environment during scan: "
                                  f"{_last_error(lib)}")
                if rc == 0:
                    return
                yield (ctypes.string_at(key.value, klen.value),
                       ctypes.string_at(val.value, vlen.value))
        finally:
            lib.afft_lmdb_cursor_close(cur)

    def close(self):
        if self._handle:
            self._lib.afft_lmdb_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
