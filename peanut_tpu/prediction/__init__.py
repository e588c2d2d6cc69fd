from .model import PredictionModel
from . import dataset  # noqa: F401  (registers SemMapDataset)
from . import wrappers  # noqa: F401  (Concat/Repeat, OHEM)
from . import image_dataset  # noqa: F401  (CustomDataset + named datasets)

__all__ = ["PredictionModel"]
