"""Visualization helpers (counterpart of reference utils/visualization.py).

The reference drives interactive VTK windows through pyvista; here
everything renders headless through the engine's own rasterizer +
matplotlib, savable to files (drone-survey work is usually remote/batch).
"""

from __future__ import annotations

import typing
from pathlib import Path

import numpy as np

from geograypher_tpu.constants import PATH_TYPE


def get_vis_options_from_IDs_to_labels(
    IDs_to_labels: typing.Optional[dict],
    cmap_continuous: str = "viridis",
    cmap_10_classes: str = "tab10",
    cmap_20_classes: str = "tab20",
    cmap_many_classes: str = "viridis",
):
    """Colormap + limits for a label set (reference visualization.py:55-111)."""
    import matplotlib.pyplot as plt

    if IDs_to_labels is None:
        return {"cmap": cmap_continuous, "vmin": None, "vmax": None, "labels": None}
    n = len(IDs_to_labels)
    if n <= 10:
        cmap = cmap_10_classes
    elif n <= 20:
        cmap = cmap_20_classes
    else:
        cmap = cmap_many_classes
    return {
        "cmap": cmap,
        "vmin": -0.5,
        "vmax": n - 0.5,
        "labels": [IDs_to_labels[k] for k in sorted(IDs_to_labels)],
    }


def create_composite(
    rgb_image: np.ndarray,
    label_image: np.ndarray,
    IDs_to_labels: typing.Optional[dict] = None,
    label_blending_weight: float = 0.5,
    grayscale_rgb_overlay: bool = True,
) -> np.ndarray:
    """label | RGB | overlay triple-pane composite
    (reference visualization.py:113-206)."""
    import matplotlib.pyplot as plt

    # normalize by DTYPE, not by observed values (a near-black uint8
    # image must still scale; NaNs defeat a max() heuristic) — reference
    # visualization.py:145 checks dtype the same way
    if np.asarray(rgb_image).dtype == np.uint8:
        rgb = np.asarray(rgb_image, dtype=float) / 255.0
    else:
        rgb = np.asarray(rgb_image, dtype=float)
        finite = rgb[np.isfinite(rgb)]
        if finite.size and finite.max() > 1.0:
            rgb = rgb / 255.0
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, axis=-1)

    lab = np.asarray(label_image, dtype=float)
    if lab.ndim == 3:
        lab = lab[..., 0]
    opts = get_vis_options_from_IDs_to_labels(IDs_to_labels)
    finite = np.isfinite(lab)
    vmin = opts["vmin"] if opts["vmin"] is not None else np.nanmin(lab) if finite.any() else 0
    vmax = opts["vmax"] if opts["vmax"] is not None else np.nanmax(lab) if finite.any() else 1
    norm = (lab - vmin) / max(vmax - vmin, 1e-9)
    cmap = plt.get_cmap(opts["cmap"])
    lab_rgb = cmap(np.clip(norm, 0, 1))[..., :3]
    lab_rgb[~finite] = 1.0

    base = rgb
    if grayscale_rgb_overlay:
        gray = rgb.mean(axis=-1, keepdims=True)
        base = np.repeat(gray, 3, axis=-1)
    overlay = np.where(
        finite[..., None],
        label_blending_weight * lab_rgb + (1 - label_blending_weight) * base,
        base,
    )
    return np.concatenate([lab_rgb, rgb, overlay], axis=1)


def show_segmentation_labels(
    label_folder: PATH_TYPE,
    image_folder: PATH_TYPE,
    savefolder: typing.Optional[PATH_TYPE] = None,
    num_show: int = 10,
    IDs_to_labels: typing.Optional[dict] = None,
    label_suffix: str = ".png",
):
    """Composite the first N label/image pairs (reference
    visualization.py:208-275)."""
    import cv2

    from geograypher_tpu.utils.files import ensure_folder
    from geograypher_tpu.utils.io import read_image_or_numpy

    label_folder = Path(label_folder)
    image_folder = Path(image_folder)
    labels = sorted(label_folder.rglob(f"*{label_suffix}"))[:num_show]
    outputs = []
    for lab_path in labels:
        rel = lab_path.relative_to(label_folder)
        img_candidates = list(image_folder.glob(str(rel.with_suffix("")) + ".*"))
        if not img_candidates:
            continue
        rgb = read_image_or_numpy(img_candidates[0])
        lab = read_image_or_numpy(lab_path).astype(float)
        if lab.ndim == 3:
            lab = lab[..., 0]
        lab[lab == 255] = np.nan
        comp = create_composite(rgb, lab, IDs_to_labels)
        outputs.append(comp)
        if savefolder is not None:
            # mirror the label tree: same-named labels in different
            # subfolders must not overwrite each other's composite
            out_path = Path(savefolder) / rel.with_suffix("")
            out_path = out_path.parent / (out_path.name + "_composite.png")
            ensure_folder(out_path.parent)
            cv2.imwrite(
                str(out_path),
                (np.clip(comp, 0, 1) * 255).astype(np.uint8)[..., ::-1],
            )
    return outputs


def visualize_intersections(
    starts: np.ndarray,
    ends: np.ndarray,
    community_points: np.ndarray,
    ray_IDs: typing.Optional[np.ndarray] = None,
    savefile: typing.Optional[PATH_TYPE] = None,
):
    """3D matplotlib view of triangulation rays + community points
    (replaces the reference's pyvista intersection views,
    visualization.py:277-419)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")
    colors = None
    if ray_IDs is not None:
        cmap = plt.get_cmap("tab20")
        colors = [
            cmap(int(i) % 20) if np.isfinite(i) else (0.7, 0.7, 0.7, 0.3)
            for i in ray_IDs
        ]
    for k in range(len(starts)):
        c = colors[k] if colors else "gray"
        ax.plot(
            [starts[k, 0], ends[k, 0]],
            [starts[k, 1], ends[k, 1]],
            [starts[k, 2], ends[k, 2]],
            color=c,
            linewidth=0.5,
        )
    if len(community_points):
        ax.scatter(
            community_points[:, 0],
            community_points[:, 1],
            community_points[:, 2],
            color="red",
            s=40,
            marker="*",
        )
    if savefile is not None:
        fig.savefig(savefile, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return fig


def camera_frustum_mesh(
    cam_to_world: np.ndarray,
    f: float,
    cx: float,
    cy: float,
    image_width: int,
    image_height: int,
    frustum_scale: float = 0.1,
):
    """Camera frustum wireframe mesh (verts, faces, face_colors) for
    visualization (reference cameras.py:479-560: blue frustum, red top)."""
    scaled_halfwidth = image_width / (f * 2)
    scaled_halfheight = image_height / (f * 2)
    scx, scy = cx / f, cy / f
    right = scx + scaled_halfwidth
    left = scx - scaled_halfwidth
    top = scy + scaled_halfheight
    bottom = scy - scaled_halfheight
    verts = (
        np.array(
            [
                [0, 0, 0],
                [right, top, 1],
                [right, bottom, 1],
                [left, bottom, 1],
                [left, top, 1],
            ]
        )
        * frustum_scale
    )
    hom = np.concatenate([verts, np.ones((5, 1))], axis=1)
    world = (np.asarray(cam_to_world) @ hom.T).T
    world = world[:, :3] / world[:, 3:4]
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 1], [1, 2, 3], [3, 4, 1]],
        dtype=np.int32,
    )
    colors = np.array(
        [[0, 0, 255], [255, 0, 0], [0, 0, 255], [0, 0, 255], [0, 0, 255],
         [0, 0, 255]],
        dtype=np.uint8,
    )
    return world, faces, colors
