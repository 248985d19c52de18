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

    print("4. multiview_detections: per-image detections -> 3D points")
    import jax.numpy as jnp

    from geograypher_tpu.cameras.core import project_points
    from geograypher_tpu.cameras.metashape import MetashapeCameraSet
    from geograypher_tpu.entrypoints.multiview_detections import (
        multiview_detections,
    )
    from geograypher_tpu.meshes.mesh import TexturedMesh
    from geograypher_tpu.utils.vector import Polygon, VectorData

    # simulate a detector: every camera "detects" the canopy-height scene
    # center (a small box around its projected pixel)
    cams = MetashapeCameraSet(
        survey["cameras_file"], survey["image_folder"], validate_images=False
    )
    mesh = TexturedMesh(
        survey["mesh_file"], transform_filename=survey["cameras_file"]
    )
    verts_local = mesh.get_verts_in_local_frame(cams)
    target = verts_local.mean(axis=0)
    target[2] = verts_local[:, 2].max()
    xy, _d, valid = project_points(
        cams.get_camera_batch(), jnp.asarray(target[None], jnp.float32)
    )
    xy, valid = np.asarray(xy), np.asarray(valid)
    det_dir = out / "detections"
    det_dir.mkdir(parents=True, exist_ok=True)
    for i in range(len(cams)):
        if not valid[i, 0]:
            continue
        x, y = float(xy[i, 0, 0]), float(xy[i, 0, 1])
        box = Polygon(
            np.array([[x - 3, y - 3], [x + 3, y - 3], [x + 3, y + 3],
                      [x - 3, y + 3]])
        )
        VectorData([box], {"label": ["tree"]}).to_file(
            det_dir / f"img_{i:04d}.geojson"
        )
    points = multiview_detections(
        mesh_file=survey["mesh_file"],
        cameras_file=survey["cameras_file"],
        image_folder=survey["image_folder"],
        detections_folder=det_dir,
        similarity_threshold_meters=2.0,
        covering_mesh_N=8,
        triangulated_points_savefile=out / "triangulated_points.geojson",
    )
    print(f"   triangulated {len(points)} object location(s)")

    print("5. visualize: top-down composite")
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
