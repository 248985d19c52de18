"""Level-S sub-tile raster: binning invariants and kernel equivalence."""

import numpy as np
import jax.numpy as jnp

from geograypher_tpu.ops.rasterize import (
    RasterConfig,
    bin_triangles,
    setup_from_soa,
    tri_to_soa,
)
from geograypher_tpu.ops.subtile import QUARTER, bin_subtiles
from geograypher_tpu.utils.fixtures import (
    gather_tri_verts,
    make_grid_mesh,
    oblique_camera,
)
from tests.test_rasterize import cam_tris


CFG = RasterConfig(
    caps=(64, 16, 16, 16), backend="pallas", bin_block=8,
    l0_window=(5, 2), subtile=(8, 16), s_window=(3, 2), s_block=4,
)


def _setup(n=41, w=256, h=96, pitch=32.0):
    verts, faces = make_grid_mesh(
        n=n, size=4.0, z_fn=lambda x, y: 0.2 * np.sin(3 * x) * np.cos(2 * y)
    )
    c2w = oblique_camera(3.0, 90.0, w, pitch_deg=pitch, azimuth_deg=135.0)
    tris = cam_tris(verts, faces, c2w)
    f = tris.shape[0]
    fp = -(-f // CFG.bin_block) * CFG.bin_block
    tris = np.concatenate(
        [tris, np.broadcast_to(tris[:1].mean(1, keepdims=True),
                               (fp - f, 3, 3))], 0)
    soa = jnp.asarray(tri_to_soa(tris.astype(np.float32)))
    setup = setup_from_soa(soa, jnp.eye(4, dtype=jnp.float32), 90.0,
                           w, h, CFG.znear)
    return setup, w, h


def test_bin_subtiles_invariants():
    setup, w, h = _setup()
    ntx0 = -(-w // CFG.tile_w)
    pair = 2
    ntx0p = -(-ntx0 // pair) * pair
    sb = bin_subtiles(setup, CFG, h, w, ntx0p, pair, cap_chunks=256)
    assert int(sb.overflow) == 0
    units = np.asarray(sb.units)
    qsub = np.asarray(sb.qsub)
    pair_start = np.asarray(sb.pair_start)
    pair_cnt = np.asarray(sb.pair_cnt)
    n_chunks = int(sb.n_chunks)
    s_mask8 = np.asarray(sb.s_mask8)

    # brute-force expected sub-tile membership
    bbox = np.asarray(jnp.stack(setup.bbox))
    valid = np.asarray(setup.valid)
    sbb, bb = CFG.s_block, CFG.bin_block
    f4 = valid.shape[0] // sbb
    big = np.iinfo(np.int32).max
    v4 = valid.reshape(-1, sbb)
    py0 = np.where(v4, bbox[0].reshape(-1, sbb), big).min(1)
    px0 = np.where(v4, bbox[1].reshape(-1, sbb), big).min(1)
    py1 = np.where(v4, bbox[2].reshape(-1, sbb), -1).max(1)
    px1 = np.where(v4, bbox[3].reshape(-1, sbb), -1).max(1)
    uvalid = v4.any(1)
    cy0, cy1 = py0 // 8, py1 // 8
    cx0, cx1 = px0 // 16, px1 // 16
    fits = (cy1 - cy0 < 3) & (cx1 - cx0 < 2)
    ok_unit = fits | ~uvalid
    exp_mask8 = ok_unit.reshape(-1, bb // sbb).all(1)
    np.testing.assert_array_equal(s_mask8, exp_mask8)

    s_unit = uvalid & np.repeat(exp_mask8, bb // sbb)
    nty0p = -(-(-(-h // 8)) // CFG.level_scales[1]) * CFG.level_scales[1]
    spt = CFG.tile_w // 16
    ntx_s = ntx0p * spt
    expected = {}
    for u in range(f4):
        if not s_unit[u]:
            continue
        for cy in range(cy0[u], cy1[u] + 1):
            for cx in range(cx0[u], cx1[u] + 1):
                expected.setdefault(cy * ntx_s + cx, []).append(u)

    # reconstruct per-sub-tile unit lists from the CSR layout
    got = {}
    upq = QUARTER // sbb
    for q in range(n_chunks * 4):
        us = units[q * upq:(q + 1) * upq]
        us = us[us >= 0]
        if us.size:
            got.setdefault(int(qsub[q]), []).extend(us.tolist())
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in expected.items()
    }

    # pair ranges partition [0, n_chunks) in order, kb-aligned
    assert pair_start[0] == 0
    assert (np.diff(pair_start) == pair_cnt[:-1]).all()
    assert pair_start[-1] + pair_cnt[-1] == n_chunks
    assert (pair_cnt % 4 == 0).all()

    # every quarter's units actually fit inside its sub-tile's window
    for q in range(n_chunks * 4):
        us = units[q * upq:(q + 1) * upq]
        us = us[us >= 0]
        sid = int(qsub[q])
        cy, cx = sid // ntx_s, sid % ntx_s
        for u in us:
            assert cy0[u] <= cy <= cy1[u] and cx0[u] <= cx <= cx1[u]

    # exclusive assignment: diverted blocks vanish from L0..L3 lists
    binned = bin_triangles(setup, CFG, h, w,
                           exclude_blocks=jnp.asarray(exp_mask8))
    all_l = np.concatenate([np.asarray(c).ravel() for c in binned.cand])
    all_l = all_l[all_l >= 0]
    diverted = set(np.nonzero(exp_mask8)[0].tolist())
    assert not (set(all_l.tolist()) & diverted)


def test_s_raster_matches_bruteforce():
    import dataclasses

    from geograypher_tpu.ops.subtile import (
        bin_subtiles, s_raster_pallas, subtile_counts_census,
    )

    setup, w, h = _setup()
    ntx0 = -(-w // CFG.tile_w)
    pair = 2
    ntx0p = -(-ntx0 // pair) * pair
    tot, worst = subtile_counts_census(setup, CFG, h, w, ntx0p, pair)
    cfg = dataclasses.replace(CFG, s_pair_chunks=int(worst))
    sb = bin_subtiles(setup, cfg, h, w, ntx0p, pair,
                      cap_chunks=int(tot))
    assert int(sb.overflow) == 0
    bw, bid = s_raster_pallas(sb, setup.planes, cfg, h, w, ntx0p, pair)
    bid = np.asarray(bid)
    nty0p = bid.shape[0]

    # brute force over the diverted faces only
    planes = np.asarray(setup.planes, np.float64)
    valid = np.asarray(setup.valid)
    s_mask8 = np.asarray(sb.s_mask8)
    bbox = np.asarray(jnp.stack(setup.bbox))
    Ht, Wt = nty0p * 8, ntx0p * 128
    best_w = np.full((Ht, Wt), -np.inf)
    best_id = np.full((Ht, Wt), -1, np.int64)
    for f in np.nonzero(valid & np.repeat(s_mask8, CFG.bin_block))[0]:
        y0, x0, y1, x1 = bbox[0, f], bbox[1, f], bbox[2, f], bbox[3, f]
        ys = np.arange(y0, min(y1 + 1, Ht)) + 0.5
        xs = np.arange(x0, min(x1 + 1, Wt)) + 0.5
        if not len(ys) or not len(xs):
            continue
        X, Y = np.meshgrid(xs, ys)
        e = [planes[f, 3 * k] * X + planes[f, 3 * k + 1] * Y
             + planes[f, 3 * k + 2] for k in range(3)]
        cov = (e[0] >= 0) & (e[1] >= 0) & (e[2] >= 0)
        wv = planes[f, 9] * X + planes[f, 10] * Y + planes[f, 11]
        yy, xx = np.nonzero(cov)
        gy, gx = yy + int(y0), xx + int(x0)
        v = wv[yy, xx]
        upd = (v > best_w[gy, gx]) | (
            (v == best_w[gy, gx]) & (f < best_id[gy, gx])
        )
        best_w[gy, gx] = np.where(upd, v, best_w[gy, gx])
        best_id[gy, gx] = np.where(upd, f, best_id[gy, gx])

    got = bid.reshape(Ht, Wt).astype(np.int64)
    exp = best_id
    agree = got == exp
    assert agree.mean() > 0.995, agree.mean()
    _check_near_tie_disagreements(got, exp, agree, planes)
    assert (exp >= 0).sum() > 1000  # the fixture exercises real coverage


def _check_near_tie_disagreements(got, exp, agree, planes):
    # disagreements must be near-tie face swaps or knife-edge coverage
    # flips (the hi/lo bf16 eval can flip pixels whose edge value is
    # ~1e-3 px from zero; with only the S faces in this brute force the
    # neighbor that would cover them is absent)
    for y, x in zip(*np.nonzero(~agree)):
        fa, fb = got[y, x], exp[y, x]
        if fa >= 0 and fb >= 0:
            continue  # tie swap
        f = max(fa, fb)
        ev = min(
            planes[f, 3 * k] * (x + 0.5) + planes[f, 3 * k + 1] * (y + 0.5)
            + planes[f, 3 * k + 2]
            for k in range(3)
        )
        assert abs(ev) < 1e-2, (y, x, fa, fb, ev)


def _sized_config(setup, w, h):
    """CFG with census-sized S capacities for this view."""
    import dataclasses

    from geograypher_tpu.ops.rasterize import l0_geometry
    from geograypher_tpu.ops.subtile import subtile_counts_census

    pair, _, ntx0p = l0_geometry(CFG, h, w)
    tot, worst = subtile_counts_census(setup, CFG, h, w, ntx0p, pair)
    return dataclasses.replace(
        CFG, s_cap_chunks=int(tot), s_pair_chunks=int(worst),
    )


def test_subtile_pix2face_matches_plain():
    """Full rasterize with level S on == the plain pallas path (modulo
    knife-edge bf16 coverage flips)."""
    from geograypher_tpu.ops.rasterize import rasterize_setup

    setup, w, h = _setup()
    cfg_s = _sized_config(setup, w, h)
    p2f_s, _ = rasterize_setup(setup, cfg_s, h, w)
    import dataclasses

    cfg_plain = dataclasses.replace(
        cfg_s, subtile=None, s_cap_chunks=None, s_pair_chunks=None
    )
    p2f_p, _ = rasterize_setup(setup, cfg_plain, h, w)
    a = np.asarray(p2f_s)
    b = np.asarray(p2f_p)
    agree = a == b
    assert agree.mean() > 0.999, agree.mean()
    planes = np.asarray(setup.planes, np.float64)
    _check_near_tie_disagreements(a, b, agree, planes)
    assert (b >= 0).mean() > 0.3


def test_subtile_counts_match_plain():
    """Fused rasterize_and_count with level S on == plain, up to the
    same knife-edge pixel flips (total pixel mass preserved)."""
    import dataclasses

    from geograypher_tpu.ops.rasterize import rasterize_and_count

    setup, w, h = _setup()
    cfg_s = _sized_config(setup, w, h)
    cfg_plain = dataclasses.replace(
        cfg_s, subtile=None, s_cap_chunks=None, s_pair_chunks=None
    )
    n_faces = setup.valid.shape[0]
    rng = np.random.default_rng(3)
    cls = jnp.asarray(rng.integers(0, 5, (h, w)).astype(np.int32))
    c_s = np.asarray(
        rasterize_and_count(setup, cls, cfg_s, h, w, n_faces, 5)
    )
    c_p = np.asarray(
        rasterize_and_count(setup, cls, cfg_plain, h, w, n_faces, 5)
    )
    # identical up to knife-edge winner flips: total counted pixels agree
    # and per-face-class disagreement mass is a tiny fraction
    assert abs(c_s.sum() - c_p.sum()) <= 0.005 * c_p.sum() + 1
    assert np.abs(c_s - c_p).sum() <= 0.01 * c_p.sum() + 2
    # most faces agree exactly
    assert (c_s == c_p).all(axis=1).mean() > 0.99
    assert c_p.sum() > 1000


def test_mesh_subtile_auto_size_parity():
    """TexturedMesh census-sizes level-S capacities automatically when a
    config enables ``subtile`` without explicit chunk caps, and the
    result matches the plain tile path (pix2face + fused aggregation)."""
    import dataclasses

    from tests.test_mesh import local_camera_set, make_geo_mesh

    mesh, _ = make_geo_mesh()
    cams = local_camera_set(mesh)
    base = RasterConfig(
        caps=(64, 16, 16, 16), backend="pallas", bin_block=8,
        l0_window=(5, 2),
    )
    s_cfg = dataclasses.replace(
        base, subtile=(8, 16), s_window=(3, 2), s_block=4
    )
    p_plain = mesh.pix2face(cams, config=base)
    p_s = mesh.pix2face(cams, config=s_cfg)
    # knife-edge winner flips aside, the maps agree
    assert (p_plain == p_s).mean() > 0.999
    assert (p_plain >= 0).mean() > 0.2
    sized = mesh._s_cap_cache[(1.0, s_cfg)]
    assert sized.s_cap_chunks is not None and sized.s_cap_chunks > 0
    assert sized.s_pair_chunks is not None and sized.s_pair_chunks > 0

    # capacity checker covers the S level without raising
    assert mesh.check_raster_capacity(cams, config=s_cfg) == 0

    # fused aggregation path (project_images via the segmentor one-hot
    # contract) auto-sizes too and matches the plain config
    n_classes = 4
    h = w = 100  # local_camera_set's sensor size

    class _OneHot:
        def get_image_by_index(self, i, scale=1.0):
            r = np.random.default_rng(10 + i)
            cls = r.integers(0, n_classes, (h, w))
            return np.eye(n_classes, dtype=np.float32)[cls]

    imgs = [_OneHot().get_image_by_index(i) for i in range(len(cams))]

    def run(cfg):
        import types

        cams2 = cams
        orig = cams2.get_image_by_index
        cams2.get_image_by_index = lambda i, s=1.0: imgs[i]
        try:
            outs = list(mesh.project_images(cams2, config=cfg))
        finally:
            cams2.get_image_by_index = orig
        return outs

    outs_p = run(base)
    outs_s = run(s_cfg)
    for (v_p, c_p), (v_s, c_s) in zip(outs_p, outs_s):
        assert abs(np.asarray(c_p).sum() - np.asarray(c_s).sum()) <= (
            0.005 * np.asarray(c_p).sum() + 1
        )
