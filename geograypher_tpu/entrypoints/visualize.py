"""visualize: quick-look rendering of a mesh + cameras (port of
/root/reference/geograypher/entrypoints/visualize.py:13-131).

The reference opens an interactive pyvista window; without VTK this
renders a top-down view of the mesh texture plus camera positions with
matplotlib (usable headless, savable to file).
"""

from __future__ import annotations

import argparse
import typing

import numpy as np

from geograypher_tpu.constants import PATH_TYPE
from geograypher_tpu.meshes.mesh import TexturedMesh


def visualize(
    mesh_file: PATH_TYPE,
    cameras_file: typing.Optional[PATH_TYPE] = None,
    image_folder: typing.Optional[PATH_TYPE] = None,
    mesh_CRS: typing.Optional[int] = None,
    texture: typing.Optional[PATH_TYPE] = None,
    texture_column_name: typing.Optional[str] = None,
    mesh_downsample: float = 1.0,
    screenshot_filename: typing.Optional[PATH_TYPE] = None,
    resolution_m: float = 0.5,
    export_html: typing.Optional[PATH_TYPE] = None,
):
    """Top-down composite of the mesh texture and camera track; with
    ``export_html``, also write the interactive WebGL viewer (mesh +
    frustums — the headless twin of the reference's VTK window)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mesh = TexturedMesh(
        mesh_file,
        downsample_target=mesh_downsample,
        CRS=mesh_CRS,
        transform_filename=cameras_file,
        texture=texture,
        texture_column_name=texture_column_name,
    )
    tex = mesh.get_texture(request_vertex_texture=False)
    if tex is not None and tex.ndim == 2 and tex.shape[1] > 1:
        # argmax-of-npy texture (reference visualize.py:60-64)
        tex = np.nanargmax(np.nan_to_num(tex), axis=1).astype(float)
    p2f, bounds, crs = mesh.ortho_pix2face(resolution_m=resolution_m)
    fig, ax = plt.subplots(figsize=(10, 10))
    if tex is not None:
        vals = np.asarray(tex).reshape(-1)
        img = np.where(p2f >= 0, vals[np.clip(p2f, 0, None)], np.nan)
    else:
        img = np.where(p2f >= 0, 1.0, np.nan)
    ax.imshow(
        img,
        extent=(bounds[0], bounds[2], bounds[1], bounds[3]),
        interpolation="nearest",
    )
    cams = None
    if cameras_file is not None and image_folder is not None:
        from geograypher_tpu.cameras.metashape import MetashapeCameraSet
        from geograypher_tpu.utils import crs as crs_utils

        cams = MetashapeCameraSet(cameras_file, image_folder)
        lls = cams.get_lon_lat_coords()
        if lls and lls[0] is not None and crs is not None:
            lla = np.array([[ll[1], ll[0], 0.0] for ll in lls])
            pts = crs_utils.transform_points(lla, 4326, crs)
            ax.plot(pts[:, 0], pts[:, 1], "r.", markersize=2)
    ax.set_title(str(mesh_file))
    if export_html is not None:
        mesh.export_html_viewer(export_html, cameras=cams)
    if screenshot_filename is not None:
        fig.savefig(screenshot_filename, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return fig


def parse_args():
    parser = argparse.ArgumentParser(
        description=visualize.__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--mesh-file", required=True)
    parser.add_argument("--cameras-file", default=None)
    parser.add_argument("--image-folder", default=None)
    parser.add_argument("--mesh-CRS", type=int, default=None)
    parser.add_argument("--texture", default=None)
    parser.add_argument("--texture-column-name", default=None)
    parser.add_argument("--mesh-downsample", type=float, default=1.0)
    parser.add_argument("--screenshot-filename", default=None)
    parser.add_argument("--export-html", default=None)
    return parser.parse_args()


if __name__ == "__main__":
    visualize(**vars(parse_args()))
