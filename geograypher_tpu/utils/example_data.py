"""Synthetic survey generator for end-to-end tests and examples.

Plays the role of the reference's ``create_scene_mesh`` + example data
(utils/example_data.py:9-112): produces a complete fake Metashape export —
a georeferenced scene mesh (PLY), a camera XML with a chunk->ECEF
component transform, per-camera label images, and ground-truth geospatial
label polygons — so every entrypoint can run hermetically.
"""

from __future__ import annotations

import textwrap
from pathlib import Path
from typing import Optional

import numpy as np

from geograypher_tpu.utils import crs as crs_utils
from geograypher_tpu.utils.fixtures import make_scene_mesh, nadir_camera


def local_to_ecef_frame(lat: float, lon: float, alt: float = 0.0) -> np.ndarray:
    """4x4 local ENU frame -> ECEF at the given origin."""
    x, y, z = crs_utils.lla_to_ecef(lat, lon, alt)
    origin = np.array([float(x), float(y), float(z)])
    up = origin / np.linalg.norm(origin)
    east = np.cross([0.0, 0.0, 1.0], up)
    east /= np.linalg.norm(east)
    north = np.cross(up, east)
    t = np.eye(4)
    t[:3, 0], t[:3, 1], t[:3, 2] = east, north, up
    t[:3, 3] = origin
    return t


def make_metashape_xml(
    cam_to_worlds,
    image_names,
    local_to_ecef: np.ndarray,
    f: float,
    width: int,
    height: int,
    cx: float = 0.0,
    cy: float = 0.0,
    distortion: Optional[dict] = None,
) -> str:
    """Serialize cameras into the Metashape XML schema the parser reads."""
    dist_tags = "".join(
        f"<{k}>{v}</{k}>" for k, v in (distortion or {}).items()
    )
    cams = "\n".join(
        f'<camera id="{i}" sensor_id="0" label="{name}">'
        f'<transform>{" ".join(f"{float(v):.17g}" for v in np.asarray(t).flatten())}'
        f"</transform></camera>"
        for i, (t, name) in enumerate(zip(cam_to_worlds, image_names))
    )
    rot = " ".join(f"{float(v):.17g}" for v in local_to_ecef[:3, :3].flatten())
    tra = " ".join(f"{float(v):.17g}" for v in local_to_ecef[:3, 3])
    return textwrap.dedent(
        f"""\
        <document version="2.0.0">
          <chunk label="Chunk 1" enabled="true">
            <sensors next_id="1">
              <sensor id="0" label="synthetic" type="frame">
                <resolution width="{width}" height="{height}"/>
                <calibration type="frame" class="adjusted">
                  <resolution width="{width}" height="{height}"/>
                  <f>{f}</f>
                  <cx>{cx}</cx>
                  <cy>{cy}</cy>
                  {dist_tags}
                </calibration>
              </sensor>
            </sensors>
            <cameras next_id="{len(image_names)}" next_group_id="0">
              {cams}
            </cameras>
            <components next_id="1" active_id="0">
              <component id="0" label="Component 1">
                <transform>
                  <rotation locked="true">{rot}</rotation>
                  <translation locked="true">{tra}</translation>
                  <scale locked="true">1.0</scale>
                </transform>
              </component>
            </components>
          </chunk>
        </document>"""
    )


def create_example_survey(
    output_folder,
    n_cameras: int = 4,
    sensor: int = 96,
    focal: float = 48.0,
    scene_size: float = 40.0,
    n_objects: int = 3,
    lat: float = 36.0,
    lon: float = -119.0,
    seed: int = 0,
    write_label_images: bool = True,
):
    """Write a full synthetic survey to disk.

    Returns a dict of paths + ground-truth arrays:
    mesh_file, cameras_file, image_folder, label_folder, face_labels,
    labels_vector_file, dtm_file, local_to_ecef.
    """
    import cv2

    from geograypher_tpu.utils.meshio import save_mesh
    from geograypher_tpu.utils.raster import Raster, write_geotiff
    from geograypher_tpu.utils.vector import Polygon, VectorData

    output_folder = Path(output_folder)
    (output_folder / "images").mkdir(parents=True, exist_ok=True)
    (output_folder / "labels").mkdir(parents=True, exist_ok=True)

    verts, faces, face_labels, centers = make_scene_mesh(
        n_objects=n_objects, ground_n=21, size=scene_size, seed=seed
    )
    l2e = local_to_ecef_frame(lat, lon)

    # cameras: nadir grid pass over the scene
    height = scene_size * focal / sensor
    cam_to_worlds = []
    names = []
    for k in range(n_cameras):
        c2w = nadir_camera(scene_size, focal, sensor)
        c2w[0, 3] = (k % 2) * scene_size * 0.2 - scene_size * 0.1
        c2w[1, 3] = (k // 2) * scene_size * 0.2 - scene_size * 0.1
        cam_to_worlds.append(c2w)
        names.append(f"img_{k:04d}.png")

    xml = make_metashape_xml(
        cam_to_worlds, names, l2e, focal, sensor, sensor
    )
    cameras_file = output_folder / "cameras.xml"
    cameras_file.write_text(xml)

    # The PLY is saved in the LOCAL chunk frame, exactly like a Metashape
    # mesh export: consumers apply the camera XML's component transform
    # (local -> ECEF) when loading.
    mesh_file = output_folder / "mesh.ply"
    save_mesh(mesh_file, verts, faces)

    # per-camera label images: render ground-truth labels with the engine
    if write_label_images:
        hom = np.concatenate([verts, np.ones((len(verts), 1))], axis=1)
        verts_ecef = (l2e @ hom.T).T[:, :3]
        from geograypher_tpu.cameras.metashape import MetashapeCameraSet
        from geograypher_tpu.meshes.mesh import TexturedMesh
        from geograypher_tpu.ops.rasterize import RasterConfig

        cams = MetashapeCameraSet(cameras_file, output_folder / "images")
        mesh = TexturedMesh(
            (verts_ecef, faces),
            CRS=4978,
            raster_config=RasterConfig(caps=(512, 64, 32, 16)),
            local_to_epsg_4978_transform=l2e,
        )
        mesh.set_texture(face_labels.astype(float), is_vertex=False)
        for i, img in enumerate(mesh.render_flat(cams)):
            lab = np.where(np.isfinite(img[..., 0]), img[..., 0], 255)
            cv2.imwrite(
                str(output_folder / "labels" / f"img_{i:04d}.png"),
                lab.astype(np.uint8),
            )
            cv2.imwrite(
                str(output_folder / "images" / f"img_{i:04d}.png"),
                np.full((sensor, sensor, 3), 127, np.uint8),
            )

    # ground-truth object polygons in UTM
    utm = crs_utils.utm_epsg_for(lat, lon)
    origin_utm = crs_utils.transform_points(
        np.array([[lat, lon, 0.0]]), 4326, utm
    )[0]
    polys, labels = [], []
    for k, (cx_, cy_, h, half) in enumerate(centers):
        polys.append(
            Polygon(
                np.array(
                    [
                        [origin_utm[0] + cx_ - half, origin_utm[1] + cy_ - half],
                        [origin_utm[0] + cx_ + half, origin_utm[1] + cy_ - half],
                        [origin_utm[0] + cx_ + half, origin_utm[1] + cy_ + half],
                        [origin_utm[0] + cx_ - half, origin_utm[1] + cy_ + half],
                    ]
                )
            )
        )
        labels.append(f"object_{k + 1}")
    labels_vector_file = output_folder / "labels.geojson"
    VectorData(polys, {"species": labels}, epsg=utm).to_file(labels_vector_file)

    # flat DTM at ~0 elevation over the site
    dtm_file = output_folder / "dtm.tif"
    write_geotiff(
        dtm_file,
        Raster(
            data=np.zeros((64, 64), np.float32),
            transform=(
                2 * scene_size / 64, 0.0, origin_utm[0] - scene_size,
                0.0, -2 * scene_size / 64, origin_utm[1] + scene_size,
            ),
            epsg=utm,
        ),
    )

    return {
        "mesh_file": mesh_file,
        "cameras_file": cameras_file,
        "image_folder": output_folder / "images",
        "label_folder": output_folder / "labels",
        "labels_vector_file": labels_vector_file,
        "dtm_file": dtm_file,
        "face_labels": face_labels,
        "local_to_ecef": l2e,
        "n_classes": n_objects + 1,
        "utm_epsg": utm,
    }
