from geograypher_tpu.predictors.segmentors import (
    ArraySegmentor,
    BrightnessSegmentor,
    ImageIDSegmentor,
    LookUpSegmentor,
    RegionDetectionSegmentor,
    Segmentor,
    TabularRectangleSegmentor,
)
from geograypher_tpu.predictors.ortho import (
    assemble_tiled_predictions,
    write_chips,
)

__all__ = [
    "Segmentor",
    "ArraySegmentor",
    "BrightnessSegmentor",
    "ImageIDSegmentor",
    "LookUpSegmentor",
    "RegionDetectionSegmentor",
    "TabularRectangleSegmentor",
    "write_chips",
    "assemble_tiled_predictions",
]
