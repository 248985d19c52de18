"""Native C++ module tests: builds with the local toolchain, RLE codec
round-trips, PLY fast path agrees with the pure-Python reader."""

import numpy as np
import pytest

from geograypher_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_rle_roundtrip(lib):
    rng = np.random.default_rng(0)
    # runs typical of a pix2face map
    runs = rng.integers(1, 50, 2000)
    vals = rng.integers(-1, 10000, 2000).astype(np.int32)
    arr = np.repeat(vals, runs)
    enc = native.rle_encode(arr)
    assert enc is not None
    assert len(enc) < arr.nbytes / 4  # real compression on run-y data
    dec = native.rle_decode(enc, arr.size)
    assert (dec == arr).all()


def test_rle_worst_case(lib):
    arr = np.arange(1000, dtype=np.int32)  # no runs at all
    enc = native.rle_encode(arr)
    dec = native.rle_decode(enc, arr.size)
    assert (dec == arr).all()


def test_fastply_matches_python_reader(lib, tmp_path):
    from geograypher_tpu.utils.fixtures import make_grid_mesh
    from geograypher_tpu.utils.meshio import _load_ply, load_mesh, save_mesh

    verts, faces = make_grid_mesh(n=13, size=4.0, z_fn=lambda x, y: x * y)
    colors = (np.arange(verts.shape[0] * 3) % 255).reshape(-1, 3).astype(np.uint8)
    path = tmp_path / "m.ply"
    save_mesh(path, verts, faces, vert_colors=colors)

    fast = native.fastply.load_ply(str(path))
    assert fast is not None
    fv, ff, fattrs = fast
    pv, pf, pattrs = _load_ply(path)
    assert np.allclose(fv, pv)
    assert (ff == pf).all()
    assert (fattrs["colors"] == pattrs["colors"]).all()

    # load_mesh dispatches to the fast path transparently
    lv, lf, _ = load_mesh(path)
    assert np.allclose(lv, verts)


def test_class_counts_host(lib):
    import time

    rng = np.random.default_rng(1)
    n_pix, n_faces, n_classes = 500_000, 20_000, 7
    p2f = rng.integers(-1, n_faces, n_pix).astype(np.int32)
    labels = rng.integers(-1, n_classes, n_pix).astype(np.int32)
    out = native.class_counts_host(p2f, labels, n_faces, n_classes)
    assert out is not None and out.shape == (n_faces, n_classes)
    # reference: numpy bincount on the flattened valid keys
    ok = (p2f >= 0) & (labels >= 0)
    ref = np.bincount(
        p2f[ok].astype(np.int64) * n_classes + labels[ok],
        minlength=n_faces * n_classes,
    ).reshape(n_faces, n_classes)
    assert (out == ref).all()


def test_ply_noncontiguous_properties_fall_back(tmp_path):
    """A valid PLY with interleaved properties (x nx y ny z nz) must be
    REJECTED by the fast parser (not silently mis-parsed) and still load
    correctly through the Python fallback."""
    import ctypes
    import struct

    from geograypher_tpu.native import get_lib
    from geograypher_tpu.utils import meshio

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    hdr = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 3\n"
        b"property float x\nproperty float nx\n"
        b"property float y\nproperty float ny\n"
        b"property float z\nproperty float nz\n"
        b"element face 1\n"
        b"property list uchar int vertex_indices\nend_header\n"
    )
    body = b""
    for v in verts:
        body += struct.pack("<6f", v[0], 0.0, v[1], 0.0, v[2], 0.0)
    body += struct.pack("<B3i", 3, 0, 1, 2)
    path = tmp_path / "interleaved.ply"
    path.write_bytes(hdr + body)

    lib = get_lib()
    if lib is not None:
        nv, nf = ctypes.c_int64(), ctypes.c_int64()
        rgb, dbl = ctypes.c_int(), ctypes.c_int()
        h = lib.ply_open(
            str(path).encode(),
            ctypes.byref(nv),
            ctypes.byref(nf),
            ctypes.byref(rgb),
            ctypes.byref(dbl),
        )
        assert h < 0  # refused -> fallback, never corrupt geometry

    v2, f2, _ = meshio.load_mesh(path)
    assert np.allclose(v2, verts)
    assert f2.shape == (1, 3)
