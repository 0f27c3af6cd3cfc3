"""Zero-copy tensor-record corpus format + native reader bindings.

The performance-path replacement for the pickle IndexedDataset: records are
flat little-endian tensor blobs numpy can view zero-copy from an mmap. The
mmap/prefetch machinery is native C++ (native/recordio.cpp, built to
librecordio.so, loaded via ctypes); a pure-python mmap fallback keeps the
format usable without the shared library. `convert_indexed_dataset`
migrates reference-format pickle binaries once.

Where it wins: cold-cache reads (the C++ thread pool touches the next
batch's pages off-GIL while the trainer computes — `prefetch()`), immediate
zero-copy consumption (`get(copy=False)` straight into collate), and
pickle-free durability. Warm-cache per-item random access is comparable to
(measured: slightly slower than) pickle, since both reduce to a memcpy.

Record layout:
  u32 n_tensors, then per tensor:
    u16 name_len, name bytes (utf-8)
    u8 dtype code (see DTYPES), u8 ndim, i64 dims[ndim]
    padding to 16-byte alignment, raw data bytes, padding to 16
Index file (.rix): i64 count, i64 offsets[count+1].
"""

from __future__ import annotations

import ctypes
import json
import mmap
import os
import struct

import numpy as np

DTYPES = {
    0: np.float32, 1: np.float16, 2: np.int64, 3: np.int32,
    4: np.int16, 5: np.uint8, 6: np.bool_, 7: np.float64,
}
DTYPE_CODES = {np.dtype(v): k for k, v in DTYPES.items()}
_JSON_NAME = "__json__"  # non-array payload carried as a uint8 tensor


def _align(n: int, a: int = 16) -> int:
    return (n + a - 1) // a * a


def encode_record(item: dict) -> bytes:
    """dict of numpy arrays (+ json-able scalars/strings) -> record bytes."""
    arrays: dict[str, np.ndarray] = {}
    meta: dict = {}
    for k, v in item.items():
        if v is None:
            continue
        if isinstance(v, np.ndarray) and v.dtype != object:
            arrays[k] = v
        elif isinstance(v, (np.generic,)):
            meta[k] = v.item()
        elif isinstance(v, (int, float, str, bool, list)):
            meta[k] = v
        else:
            raise TypeError(f"recordio cannot store {k}: {type(v)}")
    if meta:
        arrays[_JSON_NAME] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8).copy()
    out = bytearray()
    out += struct.pack("<I", len(arrays))
    for name, arr in arrays.items():
        arr = np.ascontiguousarray(arr)
        code = DTYPE_CODES[arr.dtype]
        nb = name.encode()
        out += struct.pack("<H", len(nb)) + nb
        out += struct.pack("<BB", code, arr.ndim)
        out += struct.pack(f"<{arr.ndim}q", *arr.shape)
        pad = _align(len(out)) - len(out)
        out += b"\0" * pad
        out += arr.tobytes()
        pad = _align(len(out)) - len(out)
        out += b"\0" * pad
    return bytes(out)


def decode_record(buf: memoryview) -> dict:
    """Record bytes -> dict (arrays are zero-copy views into buf)."""
    pos = 0
    (n_tensors,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    out: dict = {}
    for _ in range(n_tensors):
        (name_len,) = struct.unpack_from("<H", buf, pos)
        pos += 2
        name = bytes(buf[pos : pos + name_len]).decode()
        pos += name_len
        code, ndim = struct.unpack_from("<BB", buf, pos)
        pos += 2
        shape = struct.unpack_from(f"<{ndim}q", buf, pos)
        pos += 8 * ndim
        pos = _align(pos)
        dtype = np.dtype(DTYPES[code])
        nbytes = int(np.prod(shape)) * dtype.itemsize if ndim else dtype.itemsize
        arr = np.frombuffer(buf, dtype=dtype, count=max(int(np.prod(shape)), 0) if ndim else 1, offset=pos)
        out[name] = arr.reshape(shape) if ndim else arr[0]
        pos = _align(pos + nbytes)
    if _JSON_NAME in out:
        out.update(json.loads(bytes(out.pop(_JSON_NAME)).decode()))
    return out


class RecordWriter:
    def __init__(self, path: str):
        self.path = path
        self._f = open(path + ".rio", "wb")
        self.offsets = [0]

    def add(self, item: dict):
        data = encode_record(item)
        self._f.write(data)
        self.offsets.append(self.offsets[-1] + len(data))

    def finalize(self):
        self._f.close()
        with open(self.path + ".rix", "wb") as f:
            f.write(struct.pack("<q", len(self.offsets) - 1))
            f.write(np.asarray(self.offsets, dtype="<i8").tobytes())

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finalize()


def _load_native():
    lib_path = os.path.join(os.path.dirname(__file__), "..", "..", "native", "librecordio.so")
    lib_path = os.path.abspath(lib_path)
    if not os.path.exists(lib_path):
        return None
    lib = ctypes.CDLL(lib_path)
    lib.rio_open.restype = ctypes.c_void_p
    lib.rio_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.rio_close.argtypes = [ctypes.c_void_p]
    lib.rio_len.restype = ctypes.c_int64
    lib.rio_len.argtypes = [ctypes.c_void_p]
    lib.rio_record.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.rio_record.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.rio_prefetch.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    return lib


_NATIVE = None
_NATIVE_TRIED = False


def native_lib():
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE = _load_native()
        _NATIVE_TRIED = True
    return _NATIVE


class RecordReader:
    """Random-access reader; native mmap+prefetch when librecordio.so is
    built, pure-python mmap otherwise. Items decode zero-copy."""

    def __init__(self, path: str, use_native: bool | None = None):
        self.path = path
        lib = native_lib() if use_native in (None, True) else None
        self._lib = lib
        self._h = None
        if lib is not None:
            self._h = lib.rio_open(
                (path + ".rio").encode(), (path + ".rix").encode()
            )
            if not self._h:
                self._lib = None
        if self._h is None:
            if use_native is True:
                raise RuntimeError("native recordio unavailable")
            self._f = open(path + ".rio", "rb")
            self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
            with open(path + ".rix", "rb") as f:
                (count,) = struct.unpack("<q", f.read(8))
                self._offsets = np.frombuffer(f.read(8 * (count + 1)), dtype="<i8")

    @property
    def is_native(self) -> bool:
        return self._h is not None

    def __len__(self) -> int:
        if self._h is not None:
            return int(self._lib.rio_len(self._h))
        return len(self._offsets) - 1

    def __getitem__(self, i: int) -> dict:
        return self.get(i, copy=True)

    def get(self, i: int, copy: bool = True) -> dict:
        """copy=False returns zero-copy views valid only while the reader
        is open — use for immediate consumption (e.g. collate) only."""
        if self._h is not None:
            size = ctypes.c_int64()
            ptr = self._lib.rio_record(self._h, i, ctypes.byref(size))
            if not ptr or size.value <= 0:
                raise IndexError(i)
            buf = memoryview((ctypes.c_uint8 * size.value).from_address(
                ctypes.addressof(ptr.contents)
            )).cast("B")
            item = decode_record(buf)
        else:
            if i < 0 or i >= len(self):
                raise IndexError(i)
            start, end = int(self._offsets[i]), int(self._offsets[i + 1])
            item = decode_record(memoryview(self._mm)[start:end])
        if copy:
            item = {k: (np.array(v) if isinstance(v, np.ndarray) else v) for k, v in item.items()}
        return item

    def prefetch(self, ids) -> None:
        if self._h is not None:
            arr = np.asarray(list(ids), dtype=np.int64)
            self._lib.rio_prefetch(
                self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(arr)
            )

    def close(self):
        if self._h is not None:
            self._lib.rio_close(self._h)
            self._h = None
        elif hasattr(self, "_mm"):
            self._mm.close()
            self._f.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def convert_indexed_dataset(src_path: str, dst_path: str) -> int:
    """Pickle IndexedDataset (.data/.idx) -> recordio (.rio/.rix)."""
    from dicttts_tpu.utils.indexed_dataset import IndexedDataset

    ds = IndexedDataset(src_path)
    with RecordWriter(dst_path) as w:
        for item in ds:
            w.add({k: (np.asarray(v) if isinstance(v, (list, np.ndarray)) and not _is_ragged(v) else v)
                   for k, v in item.items() if v is not None and _storable(v)})
    return len(ds)


def _is_ragged(v) -> bool:
    try:
        arr = np.asarray(v)
        return arr.dtype == object
    except Exception:
        return True


def _storable(v) -> bool:
    if isinstance(v, (np.ndarray, int, float, str, bool, np.generic)):
        return True
    if isinstance(v, list):
        return not _is_ragged(v)
    return False
