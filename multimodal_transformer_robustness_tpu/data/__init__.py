from .device import DeviceBatchIterator
from .loaders import ArrayDataset, BatchIterator, get_data

__all__ = ["ArrayDataset", "BatchIterator", "DeviceBatchIterator", "get_data"]
