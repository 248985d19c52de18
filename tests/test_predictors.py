"""Predictor layer + ortho pipeline + metrics + image utils tests."""

import numpy as np
import pytest

from geograypher_tpu.predictors.segmentors import (
    BrightnessSegmentor,
    ImageIDSegmentor,
    LookUpSegmentor,
    Segmentor,
    TabularRectangleSegmentor,
)


def test_inds_to_one_hot():
    inds = np.array([[0, 1], [2, np.nan]])
    oh = Segmentor.inds_to_one_hot(inds, 3)
    assert oh.shape == (2, 2, 3)
    assert oh[0, 0, 0] == 1 and oh[0, 1, 1] == 1 and oh[1, 0, 2] == 1
    assert np.isnan(oh[1, 1]).all()


def test_brightness_segmentor():
    img = np.zeros((4, 4, 3), np.uint8)
    img[:2] = 255
    seg = BrightnessSegmentor()
    out = seg.segment_image(img)
    assert out.shape == (4, 4, 2)
    assert out[0, 0, 1] == 1 and out[3, 3, 0] == 1


def test_lookup_segmentor(tmp_path):
    import cv2

    (tmp_path / "imgs/sub").mkdir(parents=True)
    (tmp_path / "labels/sub").mkdir(parents=True)
    img = np.zeros((10, 12, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "imgs/sub/a.jpg"), img)
    labels = np.full((10, 12), 2, np.uint8)
    cv2.imwrite(str(tmp_path / "labels/sub/a.png"), labels)
    seg = LookUpSegmentor(tmp_path / "imgs", tmp_path / "labels", num_classes=4)
    out = seg.segment_image(img, filename=tmp_path / "imgs/sub/a.jpg")
    assert out.shape == (10, 12, 4)
    assert (out[..., 2] == 1).all()


def test_image_id_segmentor():
    seg = ImageIDSegmentor(image_shape=(20, 30), num_images=5)
    out = seg.segment_image(None, index=3, image_scale=0.5)
    assert out.shape == (10, 15)
    assert (out == 3).all()


def test_tabular_rectangle_segmentor(tmp_path):
    import pandas as pd

    df = pd.DataFrame(
        {
            "image_path": ["a.jpg", "a.jpg", "b.jpg"],
            "xmin": [10, 50, 5],
            "xmax": [20, 70, 15],
            "ymin": [5, 30, 8],
            "ymax": [15, 40, 18],
            "label": ["tree", "tree", "shrub"],
        }
    )
    df.to_csv(tmp_path / "dets.csv", index=False)
    seg = TabularRectangleSegmentor(
        tmp_path / "dets.csv", image_shape=(100, 100)
    )
    assert seg.num_classes == 3
    centers = seg.get_detection_centers("a.jpg")
    assert centers.shape == (2, 2)
    assert np.allclose(centers[0], [10, 15])  # (i, j) = ((5+15)/2, (10+20)/2)
    out = seg.segment_image(None, filename="some/dir/a.jpg")
    assert out[10, 15] == 0  # first detection index
    assert out[35, 60] == 1
    assert np.isnan(out[90, 90])


def test_ortho_chip_assemble(tmp_path):
    """write_chips + assemble_tiled_predictions round trip: chip an ortho,
    'predict' = the rasterized labels themselves, reassemble -> original
    label raster recovered."""
    import cv2

    from geograypher_tpu.predictors.ortho import (
        assemble_tiled_predictions,
        get_str_from_window,
        parse_windows_from_files,
        write_chips,
    )
    from geograypher_tpu.utils.raster import Raster, read_geotiff, write_geotiff
    from geograypher_tpu.utils.vector import Polygon, VectorData

    rng = np.random.default_rng(0)
    ortho = rng.integers(0, 255, (100, 120, 3)).astype(np.uint8)
    r = Raster(ortho, (1.0, 0, 500000.0, 0, -1.0, 4000000.0), epsg=32611)
    ortho_path = tmp_path / "ortho.tif"
    write_geotiff(ortho_path, r)

    # two label polygons in CRS coords
    polys = VectorData(
        [
            Polygon(np.array([[500010, 3999990], [500050, 3999990],
                              [500050, 3999950], [500010, 3999950]])),
            Polygon(np.array([[500070, 3999930], [500110, 3999930],
                              [500110, 3999905], [500070, 3999905]])),
        ],
        {"species": ["oak", "pine"]},
        epsg=32611,
    )
    label_path = tmp_path / "labels.geojson"
    polys.to_file(label_path)

    mapping = write_chips(
        ortho_path,
        tmp_path / "chips",
        chip_size=48,
        chip_stride=32,
        label_vector_file=label_path,
        label_column="species",
    )
    assert mapping == {"oak": 0, "pine": 1}
    ann_files = sorted((tmp_path / "chips/anns").glob("*.png"))
    assert len(ann_files) > 4
    windows = parse_windows_from_files(ann_files)
    assert all(w["height"] <= 48 for w in windows)

    out_path = tmp_path / "assembled.tif"
    assemble_tiled_predictions(
        ortho_path, ann_files, num_classes=2, class_savefile=out_path
    )
    merged = read_geotiff(out_path)
    # the oak polygon spans cols 10-50, rows 10-50 in pixel space
    assert merged.data[30, 30] == 0
    assert merged.data[80, 90] == 1
    assert merged.data[5, 5] == 255  # nodata where nothing labeled


def test_prediction_metrics(tmp_path):
    from geograypher_tpu.utils.prediction_metrics import (
        cf_from_vector_vector,
        compute_comprehensive_metrics,
    )
    from geograypher_tpu.utils.vector import Polygon, VectorData

    def sq(x0, y0, s):
        return Polygon(np.array([[x0, y0], [x0+s, y0], [x0+s, y0+s], [x0, y0+s]]))

    true = VectorData(
        [sq(0, 0, 10), sq(20, 0, 10)], {"cls": ["a", "b"]}, epsg=32611
    )
    # predictions: first correct, second half-shifted
    pred = VectorData(
        [sq(0, 0, 10), sq(25, 0, 10)], {"cls": ["a", "b"]}, epsg=32611
    )
    cf, names = cf_from_vector_vector(pred, true, "cls", grid=512)
    assert names == ["a", "b"]
    # full matrix includes the unlabeled class as the trailing row/column
    recall_a = cf[0, 0] / cf[0].sum()
    recall_b = cf[1, 1] / cf[1].sum()
    assert recall_a > 0.9  # a fully recovered
    assert 0.3 < recall_b < 0.7  # b half overlaps (rest -> unlabeled)
    m = compute_comprehensive_metrics(cf[:2, :2])
    assert m["accuracy"] > 0.7


def test_equirectangular_sampling():
    """Encode (lat, lon) as pixel values in the panorama and verify the
    center pixel of a pitched view round-trips (spirit of reference
    tests/test_images.py:30-105)."""
    from geograypher_tpu.utils.image import perspective_from_equirectangular

    he, we = 180, 360
    lat_img = np.broadcast_to(
        np.linspace(-90, 90, he)[:, None], (he, we)
    ).astype(np.float32)
    lon_img = np.broadcast_to(
        np.linspace(-180, 180, we)[None, :], (he, we)
    ).astype(np.float32)
    pano = np.stack([lat_img, lon_img], axis=-1)
    for yaw, pitch in ((0, 0), (45, 0), (0, 30), (-90, -20)):
        out = perspective_from_equirectangular(
            pano, roll=0, pitch=pitch, yaw=yaw, fov_deg=60, out_size=(64, 64)
        )
        c_lat, c_lon = out[32, 32]
        # center ray: camera-frame +z rotated by (pitch, yaw)
        assert abs(c_lon - yaw) < 4.0
        assert abs(c_lat - pitch) < 4.0


def test_compute_and_show_cf(tmp_path):
    from geograypher_tpu.utils.prediction_metrics import compute_and_show_cf

    gt = ["a", "a", "b", "b", "c"]
    pred = ["a", "b", "b", "b", "c"]
    cf, labels, acc = compute_and_show_cf(
        pred, gt, savefile=tmp_path / "cf.png"
    )
    assert labels == ["a", "b", "c"]
    assert cf[0, 0] == 1 and cf[0, 1] == 1 and cf[1, 1] == 2 and cf[2, 2] == 1
    assert np.isclose(acc, 4 / 5)
    assert (tmp_path / "cf.png").exists()


def test_plot_geodata(tmp_path):
    from geograypher_tpu.utils.prediction_metrics import plot_geodata
    from geograypher_tpu.utils.raster import Raster, write_geotiff
    from geograypher_tpu.utils.vector import Polygon, VectorData

    rp = tmp_path / "r.tif"
    write_geotiff(
        rp,
        Raster(np.random.default_rng(0).integers(0, 5, (32, 32)).astype(np.uint8),
               (1.0, 0, 0.0, 0, -1.0, 32.0), epsg=32611),
    )
    ax = plot_geodata(rp)
    assert ax is not None
    vp = tmp_path / "v.geojson"
    VectorData(
        [Polygon(np.array([[0, 0], [5, 0], [5, 5], [0, 5]], float))],
        {"cls": ["x"]},
        epsg=32611,
    ).to_file(vp)
    ax = plot_geodata(vp, class_column="cls")
    assert ax is not None


def test_sparse_argmax_vectorized_matches_naive():
    import scipy.sparse

    from geograypher_tpu.meshes.sparse import sparse_argmax

    rng = np.random.default_rng(3)
    n_rows, n_cols = 500, 12
    dense = rng.integers(0, 5, (n_rows, n_cols)).astype(float)
    dense[rng.random((n_rows, n_cols)) < 0.8] = 0
    dense[::7] = 0  # empty rows
    m = scipy.sparse.csr_array(dense)
    got = sparse_argmax(m)
    for f in range(n_rows):
        row = dense[f]
        if row.sum() == 0 and (m.indptr[f + 1] == m.indptr[f]):
            assert np.isnan(got[f])
        elif m.indptr[f + 1] > m.indptr[f]:
            seg = m.data[m.indptr[f]:m.indptr[f + 1]]
            exp = m.indices[m.indptr[f]:m.indptr[f + 1]][np.argmax(seg)]
            assert got[f] == exp, f


def test_chip_pairing_skips_image_for_empty_labels(tmp_path):
    """write_chips with write_empty_tile_if_no_labels=False must not
    leave unpaired chips in imgs/ (review regression: the image was
    written before the empty-label check)."""
    from geograypher_tpu.predictors.ortho import write_chips
    from geograypher_tpu.utils.raster import Raster, write_geotiff
    from geograypher_tpu.utils.vector import Polygon, VectorData

    rng = np.random.default_rng(1)
    ortho = rng.integers(0, 255, (100, 120, 3)).astype(np.uint8)
    write_geotiff(
        tmp_path / "o.tif",
        Raster(ortho, (1.0, 0, 500000.0, 0, -1.0, 4000000.0), epsg=32611),
    )
    sq = np.array(
        [[500005.0, 3999995.0], [500040.0, 3999995.0],
         [500040.0, 3999960.0], [500005.0, 3999960.0]]
    )
    VectorData([Polygon(sq)], {"c": ["a"]}, epsg=32611).to_file(
        tmp_path / "l.geojson"
    )
    write_chips(
        tmp_path / "o.tif", tmp_path / "chips", chip_size=64,
        chip_stride=48, label_vector_file=tmp_path / "l.geojson",
        label_column="c", write_empty_tile_if_no_labels=False,
    )
    imgs = sorted(p.name for p in (tmp_path / "chips/imgs").glob("*"))
    anns = sorted(p.name for p in (tmp_path / "chips/anns").glob("*"))
    assert imgs == anns and imgs


def test_assemble_border_is_nodata(tmp_path):
    """Ramp-zero mosaic border pixels must come back as nodata, not
    argmax-of-zeros class 0 (review regression)."""
    from geograypher_tpu.predictors.ortho import (
        assemble_tiled_predictions, write_chips,
    )
    from geograypher_tpu.utils.raster import Raster, read_geotiff, write_geotiff

    data = np.full((80, 96), 1, np.uint8)
    write_geotiff(
        tmp_path / "o.tif",
        Raster(data, (1.0, 0, 500000.0, 0, -1.0, 4000000.0), epsg=32611),
    )
    write_chips(tmp_path / "o.tif", tmp_path / "chips", chip_size=48,
                chip_stride=32)
    preds = sorted((tmp_path / "chips/imgs").glob("*"))
    assemble_tiled_predictions(
        tmp_path / "o.tif", preds, num_classes=3,
        class_savefile=tmp_path / "out.tif",
    )
    out = read_geotiff(tmp_path / "out.tif")
    assert (out.data[0, :] == 255).all() and (out.data[:, 0] == 255).all()
    assert (out.data[2:-2, 2:-2] == 1).all()


def test_segmentor_scale_conventions():
    """Provided images arrive pre-scaled; fallback canvases scale the
    declared shape (review regression: double/zero application)."""
    from geograypher_tpu.predictors.segmentors import (
        ImageIDSegmentor, TabularRectangleSegmentor,
    )
    import pandas as pd

    df = pd.DataFrame(
        {"image_path": ["a.jpg"], "xmin": [40], "xmax": [80],
         "ymin": [20], "ymax": [60], "label": ["t"]}
    )
    seg = TabularRectangleSegmentor(df_or_path_init(df), image_shape=(200, 400))
    # fallback canvas: declared shape x scale; boxes at scale
    out = seg.segment_image(None, filename="a.jpg", image_scale=0.5)
    assert out.shape == (100, 200)
    assert out[20, 30] == 0  # box center at half-scale coords
    # provided image: shape taken as-is (already scaled)
    img = np.zeros((100, 200, 3))
    out2 = seg.segment_image(img, filename="a.jpg", image_scale=0.5)
    assert out2.shape == (100, 200)
    assert np.array_equal(
        np.isfinite(out), np.isfinite(out2)
    )
    idseg = ImageIDSegmentor(image_shape=(200, 400), num_images=2)
    assert idseg.segment_image(None, index=1, image_scale=0.5).shape == (100, 200)
    assert idseg.segment_image(img, index=1, image_scale=0.5).shape == (100, 200)


def df_or_path_init(df):
    """TabularRectangleSegmentor accepts a folder/file; write a temp csv."""
    import tempfile
    from pathlib import Path

    d = Path(tempfile.mkdtemp())
    df.to_csv(d / "dets.csv", index=False)
    return d / "dets.csv"
