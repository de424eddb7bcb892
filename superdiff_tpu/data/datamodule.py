"""DataModule: dataset + splits + device pipeline as one object.

The reference intended this abstraction but left the file empty
(``src/data/datamodule.py``, 0 bytes — SURVEY.md §2.3). Bundles the
folder-tree index, per-split batch iterators, and the on-device
augment/normalize step keyed off the training config.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.config import Config
from superdiff_tpu.data.dataset import BatchIterator, ChestXrayIndex
from superdiff_tpu.data.transforms import prepare_batch


class DataModule:
    def __init__(self, cfg: Config, dataset_root: str,
                 data_shard: Optional[Tuple[int, int]] = None):
        self.cfg = cfg
        self.root = dataset_root
        # (process_index, process_count) for multi-host data parallelism;
        # None -> auto-detect from the live jax.distributed topology at
        # iterator-build time (single-process -> unsharded). Explicit
        # tuples are for tests and custom launchers.
        self._data_shard = data_shard
        self._indices: Dict[str, ChestXrayIndex] = {}
        self._epochs: Dict[tuple, int] = {}
        self._decode_caches: Dict[tuple, dict] = {}

    def resolve_shard(self) -> Optional[Tuple[int, int]]:
        """The (process_index, process_count) this module shards batches
        by — every process loads a disjoint 1/count slice of each epoch's
        global permutation and feeds its local 1/count of the global batch
        (assembled into one global array by ``parallel.shard_batch`` via
        ``jax.make_array_from_process_local_data``)."""
        if self._data_shard is not None:
            return self._data_shard
        if jax.process_count() > 1:
            return (jax.process_index(), jax.process_count())
        return None

    def index(self, split: str) -> ChestXrayIndex:
        if split not in self._indices:
            self._indices[split] = ChestXrayIndex(
                self.root, task=self.cfg.task, split=split,
                class_filter=self.cfg.training.class_filter)
        return self._indices[split]

    def iterator(self, split: str, shuffle: Optional[bool] = None,
                 batch_size: Optional[int] = None,
                 epoch: Optional[int] = None):
        """A fresh iterator each call — no state shared between consumers
        (a probe like ``next(iter(dm.iterator("train")))`` cannot perturb a
        training stream mid-epoch). The shuffle order still advances across
        calls: a per-(split, shuffle, batch_size) epoch counter folds into
        the seed when ``epoch`` is None; pass an explicit ``epoch`` for a
        deterministic replay or a non-consuming probe. The host decode
        cache is shared per split, so re-instantiating stays cheap."""
        t = self.cfg.training
        shuffle = shuffle if shuffle is not None else (split == "train")
        bs = batch_size or t.batch_size
        if epoch is None:
            key = (split, shuffle, bs)
            epoch = self._epochs.get(key, 0)
            self._epochs[key] = epoch + 1
        return self._build_iterator(split, shuffle, bs, epoch)

    def _build_iterator(self, split: str, shuffle: bool, batch_size: int,
                        epoch: int):
        t = self.cfg.training
        shard = self.resolve_shard()
        if shard is not None:
            _, nproc = shard
            if batch_size % nproc:
                raise ValueError(
                    f"global batch_size {batch_size} not divisible by "
                    f"process_count {nproc}")
            batch_size //= nproc  # per-process local batch
        if t.use_native_loader and shuffle:
            it = self._native_iterator(split, batch_size, epoch,
                                       shard=shard)
            if it is not None:
                return it
        # decode-cache key includes every preprocessing knob baked into the
        # cached arrays — a cfg mutation (dashboard toggles CLAHE, a
        # resolution change) must not serve stale images
        cache_key = (split, t.resolution, t.resize_strategy,
                     t.histogram_equalization)
        return BatchIterator(
            self.index(split),
            batch_size=batch_size,
            resolution=t.resolution,
            shuffle=shuffle,
            # eval splits keep the partial tail — otherwise a val/test
            # split smaller than the batch yields nothing at all (the
            # training loop wrap-pads the tail back to one compiled shape)
            drop_last=(split == "train"),
            seed=t.seed + epoch,
            resize_strategy=t.resize_strategy,
            histogram_equalization=t.histogram_equalization,
            cache=self._decode_caches.setdefault(cache_key, {}),
            shard=shard,
        )

    def _native_iterator(self, split: str, batch_size: int, epoch: int = 0,
                         shard: Optional[Tuple[int, int]] = None):
        """C++ mmap+prefetch loader over a one-time-built shard; None when
        the native library is unavailable (callers fall back to Python).
        ``shard``: multi-host (process_index, process_count) slice — the
        C++ strides the same seeded global permutation the Python
        iterator would."""
        import logging

        from superdiff_tpu.data.native_loader import (
            NativeBatchIterator, build_shard_from_index)

        if not NativeBatchIterator.available():
            return None
        t = self.cfg.training
        shard_path = os.path.join(
            self.root, ".shards",
            f"{self.cfg.task}_{split}_{t.resolution}"
            f"_{t.resize_strategy}"
            f"{'_he' if t.histogram_equalization else ''}"
            f"{'' if t.class_filter is None else f'_cf{t.class_filter}'}"
            ".xrc")
        if not os.path.exists(shard_path):
            logging.getLogger("superdiff_tpu").info(
                "building native shard %s", shard_path)
            build_shard_from_index(
                self.index(split), shard_path, t.resolution,
                resize_strategy=t.resize_strategy,
                histogram_equalization=t.histogram_equalization)
        return NativeBatchIterator(shard_path, batch_size,
                                   seed=t.seed + epoch, shard=shard)

    def device_batches(self, split: str, rng: jax.Array
                       ) -> Iterator[Dict[str, jnp.ndarray]]:
        """Host batches -> device: augmented (train only) and normalized."""
        t = self.cfg.training
        aug = t.augmentation if split == "train" else "none"
        for batch in self.iterator(split):
            rng, aug_rng = jax.random.split(rng)
            image = prepare_batch(jnp.asarray(batch["image"]), aug_rng,
                                  augmentation=aug,
                                  normalization=t.normalization)
            yield {"image": image,
                   "label": jnp.asarray(batch["label"])}

    def class_counts(self, split: str) -> Dict[str, int]:
        return self.index(split).class_counts()
