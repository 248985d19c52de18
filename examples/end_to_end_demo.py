"""End-to-end demo on a synthetic survey (no external data needed).

Mirrors the reference's example notebooks (examples/concept_figure.ipynb):
generate a fake Metashape export, run the two flagship workflows in both
directions, triangulate detections, and write all products to ./demo_out.

    python examples/end_to_end_demo.py [output_folder]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(out="demo_out"):
    out = Path(out)
    from geograypher_tpu.utils.example_data import create_example_survey

    print("1. generating synthetic survey...")
    survey = create_example_survey(out / "survey", n_cameras=6, sensor=128)

    print("2. render_labels: geospatial polygons -> per-image masks")
    from geograypher_tpu.entrypoints.render_labels import render_labels

    render_labels(
        mesh_file=survey["mesh_file"],
        cameras_file=survey["cameras_file"],
        image_folder=survey["image_folder"],
        texture=survey["labels_vector_file"],
        texture_column_name="species",
        render_savefolder=out / "rendered_masks",
    )

    print("3. aggregate_images: label images -> per-face map -> GeoJSON")
    from geograypher_tpu.entrypoints.aggregate_images import aggregate_images

    pred, _ = aggregate_images(
        mesh_file=survey["mesh_file"],
        cameras_file=survey["cameras_file"],
        image_folder=survey["image_folder"],
        label_folder=survey["label_folder"],
        take_every_nth_camera=None,
        n_classes=survey["n_classes"],
        top_down_vector_projection_savefile=out / "predicted_map.geojson",
    )
    truth = survey["face_labels"].astype(float)
    seen = np.isfinite(pred)
    print(
        f"   recovered {np.mean(pred[seen] == truth[seen]):.1%} of "
        f"{int(seen.sum())} observed faces"
    )

    print("4. visualize: top-down composite")
    from geograypher_tpu.entrypoints.visualize import visualize

    visualize(
        mesh_file=survey["mesh_file"],
        cameras_file=survey["cameras_file"],
        image_folder=survey["image_folder"],
        screenshot_filename=out / "overview.png",
    )
    print(f"done; products in {out}/")


if __name__ == "__main__":
    main(*sys.argv[1:])
