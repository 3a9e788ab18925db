"""Data acquisition & loading: COCONUT/COCO annotations, RLE codec, categories.

Replaces reference layer L0 (`src/batch_scripts/coconut_loader.py`,
`src/util.py:337-415`, pycocotools' C RLE codec) with self-contained
implementations: a pure-numpy + optional C++ COCO RLE codec, a COCONUT
instance loader, and host-side instance filtering that mirrors the on-device
`labelany3d_tpu.geometry.masks` filters.
"""

from labelany3d_tpu.data.rle import (
    rle_decode,
    rle_encode,
    rle_from_string,
    rle_to_string,
    mask_to_rle,
    rle_to_mask,
)
from labelany3d_tpu.data.categories import (
    COCO_CATEGORIES,
    OMNI3D_CATEGORIES,
    CATEGORY_NAME_TO_OMNI3D_ID,
    category_names,
)
from labelany3d_tpu.data.coconut import (
    CoconutLoader,
    get_dataset_paths,
    decode_annotation_mask,
    read_instances,
    InstanceSet,
)

__all__ = [
    "rle_decode", "rle_encode", "rle_from_string", "rle_to_string",
    "mask_to_rle", "rle_to_mask", "COCO_CATEGORIES", "OMNI3D_CATEGORIES",
    "CATEGORY_NAME_TO_OMNI3D_ID", "category_names", "CoconutLoader",
    "get_dataset_paths", "decode_annotation_mask", "read_instances",
    "InstanceSet",
]
