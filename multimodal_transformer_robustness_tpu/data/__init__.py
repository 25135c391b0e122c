from .loaders import ArrayDataset, BatchIterator, get_data

__all__ = ["ArrayDataset", "BatchIterator", "get_data"]
