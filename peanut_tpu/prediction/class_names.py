"""Dataset label vocabularies (mmseg core/evaluation/class_names.py parity).

Only the vocabularies the zoo's configs reference; ``get_classes`` accepts
the same aliases the reference uses.
"""

from __future__ import annotations

CITYSCAPES = [
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle"]

ADE20K = [
    "wall", "building", "sky", "floor", "tree", "ceiling", "road", "bed",
    "windowpane", "grass", "cabinet", "sidewalk", "person", "earth", "door",
    "table", "mountain", "plant", "curtain", "chair", "car", "water",
    "painting", "sofa", "shelf", "house", "sea", "mirror", "rug", "field",
    "armchair", "seat", "fence", "desk", "rock", "wardrobe", "lamp",
    "bathtub", "railing", "cushion", "base", "box", "column", "signboard",
    "chest of drawers", "counter", "sand", "sink", "skyscraper",
    "fireplace", "refrigerator", "grandstand", "path", "stairs", "runway",
    "case", "pool table", "pillow", "screen door", "stairway", "river",
    "bridge", "bookcase", "blind", "coffee table", "toilet", "flower",
    "book", "hill", "bench", "countertop", "stove", "palm",
    "kitchen island", "computer", "swivel chair", "boat", "bar",
    "arcade machine", "hovel", "bus", "towel", "light", "truck", "tower",
    "chandelier", "awning", "streetlight", "booth", "television receiver",
    "airplane", "dirt track", "apparel", "pole", "land", "bannister",
    "escalator", "ottoman", "bottle", "buffet", "poster", "stage", "van",
    "ship", "fountain", "conveyer belt", "canopy", "washer", "plaything",
    "swimming pool", "stool", "barrel", "basket", "waterfall", "tent",
    "bag", "minibike", "cradle", "oven", "ball", "food", "step", "tank",
    "trade name", "microwave", "pot", "animal", "bicycle", "lake",
    "dishwasher", "screen", "blanket", "sculpture", "hood", "sconce",
    "vase", "traffic light", "tray", "ashcan", "fan", "pier", "crt screen",
    "plate", "monitor", "bulletin board", "shower", "radiator", "glass",
    "clock", "flag"]

VOC = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
    "motorbike", "person", "pottedplant", "sheep", "sofa", "train",
    "tvmonitor"]

# PEANUT's own vocabularies (constants.py)
from ..constants import hm3d_names, map_category_names  # noqa: E402

HM3D_GOALS = [hm3d_names[i] for i in range(6)]
PEANUT_MAP_CATEGORIES = [map_category_names[i] for i in range(9)]

_ALIASES = {
    "cityscapes": CITYSCAPES,
    "ade": ADE20K,
    "ade20k": ADE20K,
    "voc": VOC,
    "pascal_voc": VOC,
    "hm3d": HM3D_GOALS,
    "peanut": PEANUT_MAP_CATEGORIES,
}


def get_classes(dataset: str):
    key = dataset.lower()
    if key not in _ALIASES:
        raise KeyError(f"Unknown dataset {dataset!r}; "
                       f"available: {sorted(_ALIASES)}")
    return list(_ALIASES[key])
