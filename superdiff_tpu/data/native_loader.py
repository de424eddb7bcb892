"""ctypes bindings for the native shard-cache loader (native/xraycache.cpp).

Pipeline: the first pass over a dataset decodes + host-preprocesses images
once and writes them into a single contiguous shard (``write_shard``); every
later epoch streams shuffled uint8 batches out of the C++ mmap + prefetch
ring — no PIL, no per-image Python, no GIL on the batch-assembly path. The
device-side augment/normalize step is unchanged.

Gracefully degrades: if the shared library is absent and cannot be built
(``make -C native``), ``NativeBatchIterator.available()`` is False and
callers fall back to the pure-Python ``BatchIterator``.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, Iterator, Optional

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libxraycache.so")

MAGIC = b"XRC1"


def _load_lib() -> Optional[ctypes.CDLL]:
    # Always invoke make: the .so is not committed (build artifact), and a
    # fresh build is a no-op when xraycache.cpp is unchanged — a stale
    # binary must never shadow a source edit.
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.xc_open.restype = ctypes.c_void_p
    lib.xc_open.argtypes = [ctypes.c_char_p]
    lib.xc_info.restype = ctypes.c_int
    lib.xc_info.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_int32)]
    lib.xc_start_epoch.restype = ctypes.c_int
    lib.xc_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int]
    lib.xc_next_batch.restype = ctypes.c_int
    lib.xc_next_batch.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.POINTER(ctypes.c_int32)]
    lib.xc_close.restype = None
    lib.xc_close.argtypes = [ctypes.c_void_p]
    return lib


_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if not _lib_tried:
        _lib = _load_lib()
        _lib_tried = True
    return _lib


def write_shard(path: str, images: np.ndarray, labels: np.ndarray) -> str:
    """Write ``(N, H, W, C) uint8`` images + int32 labels as one shard."""
    images = np.ascontiguousarray(images, dtype=np.uint8)
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    n, h, w, c = images.shape
    assert labels.shape == (n,)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # pid-unique temp: on a shared filesystem several pod workers may
    # build the same shard concurrently; each writes its own temp and the
    # final os.replace is atomic (last writer wins with identical bytes)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<4i", n, h, w, c))
        f.write(images.tobytes())
        f.write(labels.tobytes())
    os.replace(tmp, path)
    return path


def build_shard_from_index(index, path: str, resolution: int,
                           resize_strategy: str = "pad",
                           histogram_equalization: bool = False) -> str:
    """Decode every image in a ChestXrayIndex once into a shard."""
    from PIL import Image

    from superdiff_tpu.data.transforms import clahe, host_resize

    n = len(index)
    images = np.empty((n, resolution, resolution, 1), dtype=np.uint8)
    labels = np.empty((n,), dtype=np.int32)
    for i, (img_path, label) in enumerate(index.samples):
        with Image.open(img_path) as im:
            arr = host_resize(im.convert("L"), resolution, resize_strategy)
        if histogram_equalization:
            arr = clahe(arr)
        images[i, :, :, 0] = arr
        labels[i] = label
    return write_shard(path, images, labels)


class NativeBatchIterator:
    """Epoch iterator over a shard via the C++ prefetch ring."""

    def __init__(self, shard_path: str, batch_size: int, seed: int = 0,
                 drop_last: bool = True,
                 shard: Optional[tuple] = None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self._lib = lib
        self._h = lib.xc_open(shard_path.encode())
        if not self._h:
            raise FileNotFoundError(f"bad shard: {shard_path}")
        info = (ctypes.c_int32 * 4)()
        lib.xc_info(self._h, info)
        self.n, self.height, self.width, self.channels = (
            info[0], info[1], info[2], info[3])
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last
        # (process_index, process_count) — the C++ shuffles the GLOBAL
        # permutation from the shared seed and serves this process's
        # strided disjoint slice (same semantics as BatchIterator(shard=))
        if shard is not None:
            pid, nproc = shard
            if not (0 <= pid < nproc):
                raise ValueError(f"bad shard {shard}: need 0 <= id < count")
        self.shard = shard
        self._epoch = 0

    @staticmethod
    def available() -> bool:
        return get_lib() is not None

    def __len__(self) -> int:
        n = self.n if self.shard is None else self.n // self.shard[1]
        q, r = divmod(n, self.batch_size)
        return q if (self.drop_last or r == 0) else q + 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        pid, nproc = self.shard if self.shard is not None else (0, 1)
        rc = self._lib.xc_start_epoch(
            self._h, ctypes.c_uint64(self.seed + self._epoch + 1),
            self.batch_size, 1 if self.drop_last else 0, pid, nproc)
        if rc != 0:
            raise RuntimeError("xc_start_epoch failed")
        self._epoch += 1
        B, H, W, C = self.batch_size, self.height, self.width, self.channels
        while True:
            imgs = np.empty((B, H, W, C), dtype=np.uint8)
            labels = np.empty((B,), dtype=np.int32)
            count = self._lib.xc_next_batch(
                self._h,
                imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if count <= 0:
                break
            yield {"image": imgs[:count], "label": labels[:count]}

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.xc_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
