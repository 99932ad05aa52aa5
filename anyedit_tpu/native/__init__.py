"""ctypes bindings for the C++ IO runtime (native/anyedit_native.cpp).

`load_native()` builds the .so on first use (g++ is in the image) and
caches it; every entry point has a pure-Python fallback so the package
works even where a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import json
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libanyedit_native.so"
_lib = None
_tried = False


def load_native() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < (
                _NATIVE_DIR / "anyedit_native.cpp").stat().st_mtime:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.jsonl_index.restype = ctypes.c_int64
        lib.jsonl_index.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                    ctypes.c_void_p, ctypes.c_int64]
        lib.read_slice.restype = ctypes.c_int64
        lib.read_slice.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_char_p]
        lib.ledger_scan.restype = ctypes.c_int64
        lib.ledger_scan.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def jsonl_index(path: str | Path) -> np.ndarray:
    """(N, 2) int64 array of (offset, length) per non-empty line."""
    lib = load_native()
    path = str(path)
    if lib is not None:
        n = lib.jsonl_index(path.encode(), None, None, 0)
        if n < 0:
            raise OSError(f"jsonl_index failed for {path}")
        offs = np.zeros(n, np.int64)
        lens = np.zeros(n, np.int64)
        got = lib.jsonl_index(path.encode(),
                              offs.ctypes.data_as(ctypes.c_void_p),
                              lens.ctypes.data_as(ctypes.c_void_p), n)
        assert got == n
        return np.stack([offs, lens], axis=1)
    # fallback
    out = []
    off = 0
    with open(path, "rb") as f:
        for line in f:
            if line.strip():
                out.append((off, len(line.rstrip(b"\n"))))
            off += len(line)
    return np.asarray(out, np.int64).reshape(-1, 2)


def read_record(path: str | Path, offset: int, length: int) -> dict:
    lib = load_native()
    if lib is not None:
        buf = ctypes.create_string_buffer(int(length))
        got = lib.read_slice(str(path).encode(), int(offset), int(length), buf)
        if got != length:
            raise OSError(f"short read at {offset}+{length} in {path}")
        return json.loads(buf.raw.decode())
    with open(path, "rb") as f:
        f.seek(offset)
        return json.loads(f.read(length).decode())


def ledger_counts(path: str | Path) -> dict[str, int]:
    lib = load_native()
    if lib is not None:
        counts = np.zeros(3, np.int64)
        n = lib.ledger_scan(str(path).encode(),
                            counts.ctypes.data_as(ctypes.c_void_p))
        if n >= 0:
            return {"success": int(counts[0]), "failure": int(counts[1]),
                    "filtered": int(counts[2]), "total": int(n)}
    out = {"success": 0, "failure": 0, "filtered": 0, "total": 0}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            out["total"] += 1
            for s in ("success", "failure", "filtered"):
                if f'"status": "{s}"' in line:
                    out[s] += 1
                    break
    return out


class ShardedJsonlReader:
    """O(1) random access into a huge .jsonl via the native index —
    a shard touches only its own byte ranges."""

    def __init__(self, path: str | Path):
        self.path = str(path)
        self.index = jsonl_index(path)

    def __len__(self) -> int:
        return int(self.index.shape[0])

    def __getitem__(self, i: int) -> dict:
        off, ln = self.index[i]
        return read_record(self.path, int(off), int(ln))

    def record(self, i: int):
        from anyedit_tpu.core.schema import InstructionRecord
        return InstructionRecord.from_json(self[i])
