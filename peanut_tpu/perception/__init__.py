from .depth import preprocess_depth
from .segmentation import Segmenter, GroundTruthSegmenter, build_segmenter

__all__ = [
    "preprocess_depth",
    "Segmenter",
    "GroundTruthSegmenter",
    "build_segmenter",
]
