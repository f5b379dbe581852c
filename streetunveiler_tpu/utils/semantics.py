"""Semantic taxonomy — reference ``utils/semantic_utils.py:1-142``.

19 Cityscapes train classes collapse to 6 "concerned" classes
[road, sidewalk, building, vegetation, sky, vehicle] via a lookup table;
class↔color tables for visualization; prob-map → RGB argmax rendering.
"""

from __future__ import annotations

import numpy as np

CITYSCAPES_CLASSES = [
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]

CONCERNED_CLASSES = ["road", "sidewalk", "building", "vegetation", "sky",
                     "vehicle"]
CONCERNED_IND = {name: i for i, name in enumerate(CONCERNED_CLASSES)}
NUM_CONCERNED = len(CONCERNED_CLASSES)

# cityscapes train-id → concerned id (reference cityscapes2concerned LUT,
# semantic_utils.py:100-112): walls/fences/poles/signs → building bucket;
# terrain → sidewalk; person/rider/vehicles → vehicle.
_C2C = {
    "road": "road", "sidewalk": "sidewalk", "building": "building",
    "wall": "building", "fence": "building", "pole": "building",
    "traffic light": "building", "traffic sign": "building",
    "vegetation": "vegetation", "terrain": "sidewalk", "sky": "sky",
    "person": "vehicle", "rider": "vehicle", "car": "vehicle",
    "truck": "vehicle", "bus": "vehicle", "train": "vehicle",
    "motorcycle": "vehicle", "bicycle": "vehicle",
}
CITYSCAPES_TO_CONCERNED = np.array(
    [CONCERNED_IND[_C2C[name]] for name in CITYSCAPES_CLASSES], np.int32)

CONCERNED_COLORS = np.array([
    [128, 64, 128],    # road
    [244, 35, 232],    # sidewalk
    [70, 70, 70],      # building
    [107, 142, 35],    # vegetation
    [70, 130, 180],    # sky
    [0, 0, 142],       # vehicle
], np.uint8)

SKY_BIT = 1 << CONCERNED_IND["sky"]
VEGETATION_BIT = 1 << CONCERNED_IND["vegetation"]
VEHICLE_BIT = 1 << CONCERNED_IND["vehicle"]


def cityscapes_to_concerned(labels):
    """Map cityscapes train-id maps (any shape) to concerned ids; ids
    outside [0,19) map to building (the reference clamps unknowns)."""
    labels = np.asarray(labels)
    safe = np.clip(labels, 0, len(CITYSCAPES_CLASSES) - 1)
    return CITYSCAPES_TO_CONCERNED[safe]


def semantic_prob_to_rgb(prob):
    """[..., C] probabilities → argmax color image (reference
    ``semantic_prob_to_rgb``)."""
    idx = np.argmax(np.asarray(prob), axis=-1)
    return CONCERNED_COLORS[idx]


def class_onehot_image(labels, num_classes: int = NUM_CONCERNED):
    """int labels [H, W] → one-hot [H, W, C] float32 (the reference
    camera's per-class semantic prob image, ``scene/cameras.py:77-83``)."""
    labels = np.asarray(labels)
    out = np.zeros(labels.shape + (num_classes,), np.float32)
    np.put_along_axis(out, labels[..., None], 1.0, axis=-1)
    return out
