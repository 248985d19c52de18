"""render_labels: rasterize geospatial ground-truth labels into each
camera view as training masks.

Port of the reference entrypoint
(/root/reference/geograypher/entrypoints/render_labels.py:21-261), same
argument surface: texture the mesh from a vector/raster label file, crop
mesh + cameras to the labeled region, optionally mark the ground class
from a DTM, render per-camera masks with occlusion-correct z-buffering and
save them mirroring the image folder tree.
"""

from __future__ import annotations

import argparse
from pathlib import Path
import typing

import numpy as np

from geograypher_tpu.cameras.metashape import MetashapeCameraSet
from geograypher_tpu.constants import PATH_TYPE
from geograypher_tpu.meshes.mesh import TexturedMesh


def render_labels(
    mesh_file: PATH_TYPE,
    cameras_file: PATH_TYPE,
    image_folder: PATH_TYPE,
    texture: typing.Union[PATH_TYPE, np.ndarray],
    render_savefolder: PATH_TYPE,
    mesh_CRS: typing.Optional[int] = None,
    original_image_folder: typing.Optional[PATH_TYPE] = None,
    subset_images_savefolder: typing.Optional[PATH_TYPE] = None,
    texture_column_name: typing.Optional[str] = None,
    DTM_file: typing.Optional[PATH_TYPE] = None,
    ground_height_threshold: typing.Optional[float] = 2.0,
    render_ground_class: bool = False,
    textured_mesh_savefile: typing.Optional[PATH_TYPE] = None,
    ROI: typing.Optional[PATH_TYPE] = None,
    ROI_buffer_radius_meters: float = 50,
    cameras_ROI_buffer_radius_meters: typing.Optional[float] = None,
    IDs_to_labels: typing.Optional[dict] = None,
    render_image_scale: float = 1.0,
    mesh_downsample: float = 1.0,
    n_cameras_per_chunk: typing.Optional[int] = None,
    save_native_resolution: bool = True,
    make_composites: bool = False,
    vis: bool = False,
):
    """Render geospatial labels into each camera as per-pixel masks.

    Argument semantics follow the reference (render_labels.py:44-108).
    """
    camera_set = MetashapeCameraSet(
        cameras_file,
        image_folder,
        original_image_folder=original_image_folder,
        validate_images=False,
    )

    # Infer the ROI from the texture's extent when not given
    # (reference render_labels.py:110-116)
    effective_roi = ROI
    if effective_roi is None and isinstance(texture, (str, Path)):
        if Path(texture).suffix.lower() in (".geojson", ".json", ".gpkg", ".shp"):
            effective_roi = texture

    if effective_roi is not None:
        cam_buffer = (
            cameras_ROI_buffer_radius_meters
            if cameras_ROI_buffer_radius_meters is not None
            else ROI_buffer_radius_meters
        )
        camera_set = camera_set.get_subset_ROI(effective_roi, cam_buffer)
        if subset_images_savefolder is not None:
            import shutil

            from geograypher_tpu.utils.files import ensure_folder

            ensure_folder(subset_images_savefolder)
            for i in range(len(camera_set)):
                src = camera_set.get_image_filename(i)
                if src is not None and src.exists():
                    shutil.copy(src, subset_images_savefolder)

    mesh = TexturedMesh(
        mesh_file,
        downsample_target=mesh_downsample,
        CRS=mesh_CRS,
        transform_filename=cameras_file,
        texture=texture,
        texture_column_name=texture_column_name,
        ROI=effective_roi,
        ROI_buffer_meters=ROI_buffer_radius_meters,
        IDs_to_labels=IDs_to_labels,
    )

    if DTM_file is not None and ground_height_threshold is not None:
        mesh.label_ground_class(
            DTM_file,
            height_above_ground_threshold=ground_height_threshold,
            ground_ID=None if render_ground_class else np.nan,
            only_label_existing=True,
        )

    if textured_mesh_savefile is not None:
        mesh.save_mesh(textured_mesh_savefile)

    if n_cameras_per_chunk is not None:
        from geograypher_tpu.meshes.chunked import render_flat_chunked

        import cv2

        from geograypher_tpu.utils.files import ensure_containing_folder

        for img, cam in render_flat_chunked(
            mesh,
            camera_set,
            n_cameras_per_chunk=n_cameras_per_chunk,
            render_img_scale=render_image_scale,
        ):
            fname = cam.image_filenames[0]
            out = Path(render_savefolder) / (
                fname.name if fname else "render.png"
            )
            ensure_containing_folder(out)
            data = np.where(np.isfinite(img[..., 0]), img[..., 0], 255)
            cv2.imwrite(str(out.with_suffix(".png")), data.astype(np.uint8))
    else:
        mesh.save_renders(
            camera_set,
            render_image_scale=render_image_scale,
            output_folder=render_savefolder,
            save_native_resolution=save_native_resolution,
            make_composites=make_composites,
        )
    return mesh, camera_set


def parse_args():
    parser = argparse.ArgumentParser(
        description=render_labels.__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--mesh-file", required=True)
    parser.add_argument("--cameras-file", required=True)
    parser.add_argument("--image-folder", required=True)
    parser.add_argument("--texture", required=True)
    parser.add_argument("--render-savefolder", required=True)
    parser.add_argument("--mesh-CRS", type=int, default=None)
    parser.add_argument("--original-image-folder", default=None)
    parser.add_argument("--texture-column-name", default=None)
    parser.add_argument("--DTM-file", default=None)
    parser.add_argument("--ground-height-threshold", type=float, default=2.0)
    parser.add_argument("--render-ground-class", action="store_true")
    parser.add_argument("--ROI", default=None)
    parser.add_argument("--ROI-buffer-radius-meters", type=float, default=50)
    parser.add_argument("--render-image-scale", type=float, default=1.0)
    parser.add_argument("--mesh-downsample", type=float, default=1.0)
    parser.add_argument("--n-cameras-per-chunk", type=int, default=None)
    return parser.parse_args()


if __name__ == "__main__":
    render_labels(**vars(parse_args()))
