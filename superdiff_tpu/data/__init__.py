from superdiff_tpu.data.synthetic import synthetic_xray_batch
from superdiff_tpu.data.dataset import ChestXrayIndex, BatchIterator
from superdiff_tpu.data.split import split_dataset, is_split_already_done
from superdiff_tpu.data.transforms import (
    normalize, denormalize, augment, prepare_batch, host_resize, clahe)
from superdiff_tpu.data.datamodule import DataModule

__all__ = [
    "synthetic_xray_batch", "ChestXrayIndex", "BatchIterator",
    "split_dataset", "is_split_already_done", "normalize", "denormalize",
    "augment", "prepare_batch", "host_resize", "clahe", "DataModule",
]
