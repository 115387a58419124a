from multimodal_flows_tpu.data.state import MultiModal, DataCoupling
from multimodal_flows_tpu.data.datasets import (
    ArrayDataset,
    make_train_val_loaders,
    shuffle_batches,
)

__all__ = [
    "MultiModal",
    "DataCoupling",
    "ArrayDataset",
    "make_train_val_loaders",
    "shuffle_batches",
]
