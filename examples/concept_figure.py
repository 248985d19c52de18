"""Generate the framework's concept-figure assets.

Mirrors /root/reference/examples/concept_figure.ipynb on purely synthetic
data: a procedural scene of cubes, cylinders, and cones on a ground plane
is rendered two ways — "realistic" per-instance colors and semantic class
labels — from an orbit of cameras, then the label images are aggregated
back onto the mesh through the segmentor path to close the loop, and the
figure panels are written as PNGs.

    python examples/concept_figure.py [output_folder]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

# Notebook knobs
N_BOXES = 5
N_CYLINDERS = 5
N_CONES = 5
MAP_RANDOM_SEED = 42
GROUND_RESOLUTION = 60
IDS_TO_LABELS = {0: "cone", 1: "cube", 2: "cylinder"}
SENSOR = 192
FOCAL = 96.0
N_CAMERAS = 6


def instance_colors(names, rng):
    """Per-instance RGB colors: a hue gradient within each class family,
    like the notebook's ``make_color_gradient``."""
    import matplotlib.colors

    base_hue = {"cone": 0.05, "cube": 0.35, "cylinder": 0.6}
    colors = []
    for name in names:
        h = (base_hue[name] + rng.uniform(-0.05, 0.05)) % 1.0
        colors.append(matplotlib.colors.hsv_to_rgb([h, 0.8, 0.9]))
    return np.asarray(colors)


def main(out="concept_figure_out"):
    out = Path(out)
    (out / "realistic_images").mkdir(parents=True, exist_ok=True)
    (out / "labeled_images").mkdir(parents=True, exist_ok=True)
    (out / "figures").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(MAP_RANDOM_SEED)

    print("1. building the procedural scene mesh...")
    from geograypher_tpu.utils.example_data import (
        create_non_overlapping_points,
        create_scene_mesh,
    )

    points = create_non_overlapping_points(
        n_points=N_BOXES + N_CYLINDERS + N_CONES,
        random_seed=MAP_RANDOM_SEED,
    )
    verts, faces, face_ids, labels_vd = create_scene_mesh(
        box_centers=points[:N_BOXES],
        cylinder_centers=points[N_BOXES : N_BOXES + N_CYLINDERS],
        cone_centers=points[N_BOXES + N_CYLINDERS :],
        add_ground=True,
        ground_resolution=GROUND_RESOLUTION,
    )
    names = list(labels_vd.attributes["name"])
    name_to_class = {v: k for k, v in IDS_TO_LABELS.items()}
    print(f"   {faces.shape[0]} faces, {len(names)} object instances")

    print("2. building the camera orbit...")
    import cv2

    from geograypher_tpu.cameras.core import CameraSet
    from geograypher_tpu.meshes.mesh import TexturedMesh
    from geograypher_tpu.ops.rasterize import RasterConfig
    from geograypher_tpu.utils.fixtures import oblique_camera

    c2ws, img_names = [], []
    for k in range(N_CAMERAS):
        c2w = oblique_camera(
            12.0, FOCAL, SENSOR, pitch_deg=35.0,
            azimuth_deg=360.0 * k / N_CAMERAS,
        )
        c2ws.append(c2w)
        img_names.append(f"view_{k:02d}.png")
    cams = CameraSet(
        c2ws,
        {0: {"f": FOCAL, "cx": 0.0, "cy": 0.0,
             "image_width": SENSOR, "image_height": SENSOR}},
        image_filenames=[out / "realistic_images" / n for n in img_names],
        validate_images=False,
    )

    mesh = TexturedMesh(
        (verts, faces), raster_config=RasterConfig(caps=(2048, 256, 64, 32))
    )

    print("3. rendering realistic + label views...")
    colors = instance_colors(names, rng)
    inst = np.nan_to_num(face_ids, nan=-1).astype(int)
    face_rgb = np.where(
        (inst >= 0)[:, None], colors[np.clip(inst, 0, None)],
        np.array([[0.45, 0.4, 0.35]]),  # ground
    )
    face_class = np.where(
        inst >= 0,
        np.array([name_to_class[names[i]] for i in np.clip(inst, 0, None)]),
        np.nan,
    )

    mesh.set_texture(face_rgb, is_vertex=False)
    for k, img in enumerate(mesh.render_flat(cams)):
        rgb = np.nan_to_num(img, nan=0.9)
        cv2.imwrite(
            str(out / "realistic_images" / img_names[k]),
            (np.clip(rgb, 0, 1) * 255).astype(np.uint8)[..., ::-1],
        )
    mesh.set_texture(face_class, is_vertex=False)
    for k, img in enumerate(mesh.render_flat(cams)):
        lab = np.where(np.isfinite(img[..., 0]), img[..., 0], 255)
        cv2.imwrite(
            str(out / "labeled_images" / img_names[k]),
            lab.astype(np.uint8),
        )

    print("4. aggregating the labels back onto the mesh (closing the loop)...")
    from geograypher_tpu.cameras.segmentor_set import SegmentorCameraSet
    from geograypher_tpu.ops.aggregate import find_argmax_nonzero_value
    from geograypher_tpu.predictors.segmentors import LookUpSegmentor

    segmentor = LookUpSegmentor(
        base_folder=out / "realistic_images",
        lookup_folder=out / "labeled_images",
        num_classes=len(IDS_TO_LABELS),
    )
    agg, _ = mesh.aggregate_projected_images(
        SegmentorCameraSet(cams, segmentor)
    )
    pred = find_argmax_nonzero_value(agg)
    seen = np.isfinite(pred) & np.isfinite(face_class)
    agreement = float(np.mean(pred[seen] == face_class[seen]))
    print(f"   round-trip label agreement on {int(seen.sum())} observed "
          f"object faces: {agreement:.1%}")

    print("5. writing figure panels...")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(9, 6))
    for k in range(3):
        rgb = cv2.imread(str(out / "realistic_images" / img_names[k]))[
            ..., ::-1
        ]
        lab = cv2.imread(
            str(out / "labeled_images" / img_names[k]), cv2.IMREAD_GRAYSCALE
        ).astype(float)
        lab[lab == 255] = np.nan
        axes[0, k].imshow(rgb)
        axes[0, k].set_title(f"view {k}")
        axes[1, k].imshow(lab, cmap="tab10", vmin=-0.5, vmax=9.5)
        for ax in (axes[0, k], axes[1, k]):
            ax.axis("off")
    fig.suptitle("concept figure: realistic renders (top) and labels")
    fig.savefig(out / "figures" / "concept_views.png", dpi=120,
                bbox_inches="tight")
    plt.close(fig)
    # top-down map of the ground-truth footprints
    fig, ax = plt.subplots(figsize=(5, 5))
    for geom, name in zip(labels_vd.geometries, names):
        xy = np.asarray(geom.exterior)
        ax.fill(xy[:, 0], xy[:, 1], alpha=0.6,
                label=name if name not in ax.get_legend_handles_labels()[1]
                else None)
    ax.legend()
    ax.set_aspect("equal")
    ax.set_title("ground-truth object footprints")
    fig.savefig(out / "figures" / "object_map.png", dpi=120,
                bbox_inches="tight")
    plt.close(fig)
    print(f"done; figures in {out}/figures/")
    return agreement


if __name__ == "__main__":
    main(*sys.argv[1:])
