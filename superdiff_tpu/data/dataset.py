"""Folder-tree chest X-ray dataset index and batch iterator.

Layout semantics match the reference (``src/data/dataset.py:14-25``):
``root/TASK/split/CLASS_NAME/*.{jpg,jpeg,png}``, classes sorted
alphabetically -> indices, optional ``class_filter`` keeping one class (the
reference trains on the disease class only via ``class_filter=1``,
``src/train.py:77``).

TPU-first split of responsibilities: the host does *decode only* (PIL ->
uint8 grayscale array at the raw size); all resize/normalize/augment math
runs batched on device (``superdiff_tpu/data/transforms.py``). Batches are
assembled as uint8 numpy arrays — 4x less host->device transfer than f32.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")


class ChestXrayIndex:
    """Index of (path, class) pairs for one task/split."""

    def __init__(self, root_dir: str,
                 task: Optional[str] = None,
                 split: Optional[str] = None,
                 class_filter: Optional[int] = None):
        base = root_dir
        if task:
            base = os.path.join(base, task)
        if split:
            base = os.path.join(base, split)
        if not os.path.isdir(base):
            raise FileNotFoundError(f"dataset directory not found: {base}")
        self.base = base
        self.classes: List[str] = sorted(
            d for d in os.listdir(base)
            if os.path.isdir(os.path.join(base, d)))
        if not self.classes:
            raise FileNotFoundError(f"no class subdirectories in {base}")
        self.class_to_idx: Dict[str, int] = {
            c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[str, int]] = []
        for cls in self.classes:
            idx = self.class_to_idx[cls]
            if class_filter is not None and idx != class_filter:
                continue
            cdir = os.path.join(base, cls)
            for name in sorted(os.listdir(cdir)):
                if name.lower().endswith(IMAGE_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, name), idx))
        if not self.samples:
            raise FileNotFoundError(
                f"no images found under {base} "
                f"(class_filter={class_filter})")

    def __len__(self) -> int:
        return len(self.samples)

    def class_counts(self) -> Dict[str, int]:
        counts = {c: 0 for c in self.classes}
        for _, idx in self.samples:
            counts[self.classes[idx]] += 1
        return counts


def decode_image(path: str, size: int) -> np.ndarray:
    """Host-side decode: grayscale uint8, resized to ``(size, size)`` with
    aspect-preserving fit + pad handled on device; here we only cap the
    decode resolution (2x the target) to bound host memory."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("L")
        # pre-shrink grossly oversized scans on host; device does the
        # precise resize
        if max(im.size) > 2 * size:
            scale = (2 * size) / max(im.size)
            im = im.resize((max(1, int(im.size[0] * scale)),
                            max(1, int(im.size[1] * scale))))
        return np.asarray(im, dtype=np.uint8)


class BatchIterator:
    """Shuffled epoch iterator yielding uint8 host batches.

    Decoded images are resized host-side to a fixed square (nearest PIL
    bilinear) so batches stack; the *strategy-aware* resize/normalize/augment
    runs on device. Optionally backed by the native prefetch cache
    (``superdiff_tpu/data/native_loader.py``) when built.
    """

    def __init__(self, index: ChestXrayIndex, batch_size: int,
                 resolution: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, resize_strategy: str = "pad",
                 histogram_equalization: bool = False,
                 cache=True, shard: Optional[Tuple[int, int]] = None):
        self.index = index
        self.batch_size = batch_size
        self.resolution = resolution
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.resize_strategy = resize_strategy
        self.histogram_equalization = histogram_equalization
        # Multi-host data parallelism: shard=(process_index, process_count)
        # makes this iterator yield only this process's strided slice of a
        # GLOBAL seeded permutation (all processes compute the same order
        # from the shared seed, so shards are disjoint and exhaustive).
        # The order is truncated to a multiple of process_count first, so
        # every process sees the same number of samples -> the same number
        # of batches per epoch (hosts stay in lockstep; a straggler short
        # epoch on one host would deadlock the collective in the train
        # step). ``batch_size`` is the per-process (local) batch.
        if shard is not None:
            pid, nproc = shard
            if not (0 <= pid < nproc):
                raise ValueError(f"bad shard {shard}: need 0 <= id < count")
        self.shard = shard
        self._epoch = 0
        # True -> private dict; an existing dict can be passed in to share
        # decoded images across iterator instances (see DataModule).
        self._cache: Optional[Dict[str, np.ndarray]] = (
            cache if isinstance(cache, dict) else ({} if cache else None))

    def _load(self, path: str) -> np.ndarray:
        from superdiff_tpu.data.transforms import host_resize, clahe

        img = self._cache.get(path) if self._cache is not None else None
        if img is None:
            from PIL import Image

            with Image.open(path) as im:
                img = host_resize(im.convert("L"), self.resolution,
                                  self.resize_strategy)
            if self.histogram_equalization:
                img = clahe(img)
            if self._cache is not None:
                self._cache[path] = img
        return img

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.index))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        if self.shard is not None:
            pid, nproc = self.shard
            order = order[:len(order) - len(order) % nproc][pid::nproc]
        self._epoch += 1
        bs = self.batch_size
        end = len(order) - (len(order) % bs if self.drop_last else 0)
        for start in range(0, end, bs):
            sel = order[start:start + bs]
            imgs = np.stack([
                self._load(self.index.samples[i][0]) for i in sel])
            labels = np.asarray(
                [self.index.samples[i][1] for i in sel], dtype=np.int32)
            yield {"image": imgs[..., None], "label": labels}

    def __len__(self) -> int:
        n_samples = len(self.index)
        if self.shard is not None:
            n_samples //= self.shard[1]
        n = n_samples // self.batch_size
        if not self.drop_last and n_samples % self.batch_size:
            n += 1
        return n
