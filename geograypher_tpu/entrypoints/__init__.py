"""User-facing workflows; each module is also a CLI.

Import lazily: entrypoints pull in the full stack, so expose them via
__getattr__ rather than eager imports.
"""

_ENTRYPOINTS = {
    "aggregate_images": "aggregate_images",
    "render_labels": "render_labels",
    "label_polygons": "label_polygons",
    "project_detections": "project_detections",
    "multiview_detections": "multiview_detections",
    "determine_minimum_overlapping_images": "annotation_image_selection",
    "render_height_masks": "render_height_masks",
    "visualize": "visualize",
}

__all__ = list(_ENTRYPOINTS)


def __getattr__(name):
    if name in _ENTRYPOINTS:
        import importlib

        mod = importlib.import_module(
            f"geograypher_tpu.entrypoints.{_ENTRYPOINTS[name]}"
        )
        return getattr(mod, name)
    raise AttributeError(name)
