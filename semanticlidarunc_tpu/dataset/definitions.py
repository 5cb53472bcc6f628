"""Label taxonomies, color maps and class names for the supported datasets.

These are dataset facts (the standard SemanticKITTI learning map etc.), kept as
flat numpy lookup tables so they can be applied on-device with a single gather
instead of a Python dict comprehension per point
(reference: /root/reference/src/dataset/definitions.py:3-178 and the per-point
dict lookup at /root/reference/src/dataset/dataloader_semantic_KITTI.py:47).
"""
from __future__ import annotations

import numpy as np

# raw SemanticKITTI id -> 20-class train id ("unlabeled"=0 ... "traffic-sign"=19)
ID_MAP: dict[int, int] = {
    0: 0, 1: 0, 9: 0,
    10: 1,          # car
    11: 2,          # bicycle
    13: 5,          # bus -> other-vehicle
    15: 3,          # motorcycle
    16: 5,          # on-rails -> other-vehicle
    18: 4,          # truck
    20: 5,          # other-vehicle
    30: 6,          # person
    31: 7,          # bicyclist
    32: 8,          # motorcyclist
    40: 9,          # road
    44: 10,         # parking
    48: 11,         # sidewalk
    49: 12,         # other-ground
    50: 13,         # building
    51: 14,         # fence
    52: 0,          # other-structure -> unlabeled
    60: 19,         # lane-marking -> traffic-sign
    70: 15,         # vegetation
    71: 16,         # trunk
    72: 17,         # terrain
    80: 18,         # pole
    81: 19,         # traffic-sign
    99: 0,          # other-object -> unlabeled
    252: 1, 253: 7, 254: 6, 255: 8, 256: 5, 257: 5, 258: 4, 259: 5,  # moving-*
}

# reduced 13-class map (two-wheeled / rider / merged grounds)
ID_MAP_REDUCED: dict[int, int] = {
    0: 0, 1: 0, 9: 0,
    10: 1, 11: 2, 13: 3, 15: 2, 16: 3, 18: 3, 20: 3,
    30: 4, 31: 5, 32: 5,
    40: 6, 44: 6, 48: 7, 49: 8, 50: 9, 51: 9, 52: 0, 60: 6,
    70: 7, 71: 7, 72: 10, 80: 11, 81: 12, 99: 0,
    252: 1, 253: 5, 254: 6, 255: 5, 256: 3, 257: 3, 258: 3, 259: 3,
}

# dynamic-classes-only map (statics -> 0)
ID_MAP_DYNAMIC: dict[int, int] = {
    0: 0, 1: 0,
    10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5,
    30: 6, 31: 7, 32: 8,
    40: 0, 44: 0, 48: 0, 49: 0, 50: 0, 51: 0, 52: 0, 60: 0,
    70: 0, 71: 0, 72: 0, 80: 0, 81: 0, 99: 0,
    252: 1, 253: 7, 254: 6, 255: 8, 256: 5, 257: 5, 258: 4, 259: 5,
}

CLASS_NAMES: dict[int, str] = {
    0: "unlabeled", 1: "car", 2: "bicycle", 3: "motorcycle", 4: "truck",
    5: "other-vehicle", 6: "person", 7: "bicyclist", 8: "motorcyclist",
    9: "road", 10: "parking", 11: "sidewalk", 12: "other-ground",
    13: "building", 14: "fence", 15: "vegetation", 16: "trunk",
    17: "terrain", 18: "pole", 19: "traffic-sign", 20: "snow",
}

# per-class display colors (BGR triples, matching the reference's cv2 rendering)
COLOR_MAP: dict[int, list[int]] = {
    0: [0, 0, 0], 1: [245, 150, 100], 2: [245, 230, 100], 3: [150, 60, 30],
    4: [180, 30, 80], 5: [255, 0, 0], 6: [30, 30, 255], 7: [200, 40, 255],
    8: [90, 30, 150], 9: [125, 125, 125], 10: [255, 150, 255], 11: [75, 0, 75],
    12: [75, 0, 175], 13: [0, 200, 255], 14: [50, 120, 255], 15: [0, 175, 0],
    16: [0, 60, 135], 17: [80, 240, 150], 18: [150, 240, 255],
    19: [250, 10, 250], 20: [255, 255, 2],
}

COLOR_MAP_REDUCED: dict[int, list[int]] = {
    0: [0, 0, 0], 1: [245, 150, 100], 2: [245, 230, 100], 3: [255, 0, 0],
    4: [30, 30, 255], 5: [200, 40, 255], 6: [125, 125, 125], 7: [75, 0, 75],
    8: [255, 150, 255], 9: [0, 175, 0], 10: [0, 60, 135],
    11: [150, 240, 255], 12: [250, 250, 250],
}


def id_map_lut(mapping: dict[int, int] | None = None, size: int = 260) -> np.ndarray:
    """Flat int32 lookup table for a raw-id -> train-id mapping.

    Unknown raw ids map to 0 ("unlabeled"), matching the reference's behavior of
    only ever encountering mapped ids. Applied as `lut[raw_ids]` (vectorized) or
    on-device as a gather.
    """
    mapping = ID_MAP if mapping is None else mapping
    lut = np.zeros(size, dtype=np.int32)
    for k, v in mapping.items():
        if k < size:
            lut[k] = v
    return lut


def color_lut(mapping: dict[int, list[int]] | None = None, size: int = 256) -> np.ndarray:
    """(size, 3) uint8 BGR color lookup table; undefined ids are black."""
    mapping = COLOR_MAP if mapping is None else mapping
    lut = np.zeros((size, 3), dtype=np.uint8)
    for k, v in mapping.items():
        if k < size:
            lut[k] = v
    return lut


# Per-dataset evaluation masks: which train-ids participate in the mIoU average.
# Mirrors the per-dataset test masks in /root/reference/src/train_semantics.py:273-317.
def default_test_mask(num_classes: int) -> list[int]:
    return [0] + [1] * (num_classes - 1)
