from .loop import TrainHParams, Trainer, make_criterion, ReduceLROnPlateau
from .sampling import sample_train_config

__all__ = [
    "TrainHParams",
    "Trainer",
    "make_criterion",
    "ReduceLROnPlateau",
    "sample_train_config",
]
