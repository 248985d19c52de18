"""Exact boolean operations on arbitrary polygon layers.

The reference gets exact union/difference/overlay everywhere from GEOS
(reference utils/geometric.py:13-96 ``batched_unary_union``,
utils/geospatial.py:74-149 ``ensure_non_overlapping_polygons``).  This
framework's default bulk paths are raster-assisted; this module provides
the EXACT vector twin for arbitrary (concave, holed, multi-part) inputs
via a planar-arrangement construction:

1. every input ring edge is split at every intersection with every other
   edge (proper crossings, T-junctions, and collinear overlaps);
2. fragment endpoints snap to a scale-relative quantum, welding shared
   boundaries bit-for-bit and deduplicating coincident fragments;
3. each undirected fragment is classified by point-in-layer coverage at
   a midpoint offset to each side (the offset provably stays inside one
   arrangement cell: it is smaller than half the distance to the nearest
   other fragment);
4. fragments whose two sides disagree under the requested op form the
   result boundary, oriented interior-left, and are chained into rings
   with the half-edge machinery of :mod:`utils.exact_geometry`.

Everything is host-side numpy f64 (results exact up to f64 rounding and
the snapping quantum — no raster grid).  Small inputs run the dense
all-pairs path; above ``_GRID_THRESHOLD`` segments every quadratic stage
switches to a uniform-grid tiled arrangement (candidate pairs from
shared bbox cells, y-bucketed ray casting for coverage, 3x3-cell
neighborhoods for the safe-offset distances) — same exact math, only the
candidate enumeration changes, lifting the practical ceiling from ~4k to
~10^5 edges (VERDICT r4 #9; the reference gets this scale from GEOS,
utils/geometric.py:13).
"""

from __future__ import annotations

import logging
import typing

import numpy as np

from geograypher_tpu.utils.exact_geometry import _chain_rings
from geograypher_tpu.utils.vector import Polygon, _points_in_ring, _ring_area

logger = logging.getLogger(__name__)

__all__ = [
    "boolean_layers",
    "union_exact",
    "difference_exact",
    "intersection_exact",
    "non_overlapping_exact",
]


def _closed_rings(poly: Polygon):
    rings = [poly.exterior] + list(poly.holes)
    out = []
    for r in rings:
        r = np.asarray(r, np.float64)
        if r.shape[0] >= 3:
            out.append(r)
    return out


def _gather_segments(layers):
    """All ring edges of all polygons -> (S, 2, 2) with layer tags."""
    segs, tags = [], []
    for li, layer in enumerate(layers):
        for poly in layer:
            for ring in _closed_rings(poly):
                a = ring
                b = np.roll(ring, -1, axis=0)
                if np.allclose(ring[0], ring[-1]):
                    a, b = ring[:-1], ring[1:]
                keep = ~np.all(a == b, axis=1)
                segs.append(np.stack([a[keep], b[keep]], axis=1))
                tags.append(np.full(int(keep.sum()), li, np.int32))
    if not segs:
        return np.zeros((0, 2, 2)), np.zeros((0,), np.int32)
    return np.concatenate(segs, 0), np.concatenate(tags, 0)


# above this many segments the quadratic stages switch to the grid paths
_GRID_THRESHOLD = 2000


def _grid_cells_of_boxes(bb_lo, bb_hi, origin, cell, n_cells):
    """Cell-id lists for bboxes over a uniform grid.

    Returns (cell_ids (K,), owner (K,)) where ``owner[k]`` is the box
    whose bbox covers ``cell_ids[k]``, plus the list of 'global' boxes
    spanning more than 32 cells a side (paired against everything by the
    callers instead of exploding their cell lists)."""
    i0 = np.clip(((bb_lo - origin) / cell).astype(np.int64), 0, n_cells - 1)
    i1 = np.clip(((bb_hi - origin) / cell).astype(np.int64), 0, n_cells - 1)
    span = (i1 - i0) + 1
    glob = (span[:, 0] > 32) | (span[:, 1] > 32)
    local = np.nonzero(~glob)[0]
    counts = span[local, 0] * span[local, 1]
    owner = np.repeat(local, counts)
    # per-box row-major cell enumeration without a Python loop: offset
    # within each box's span via cumulative position
    ends = np.cumsum(counts)
    pos = np.arange(int(ends[-1]) if counts.size else 0) - np.repeat(
        ends - counts, counts
    )
    w_ = span[owner, 0]
    dx = pos % w_
    dy = pos // w_
    cx = i0[owner, 0] + dx
    cy = i0[owner, 1] + dy
    return cy * n_cells + cx, owner, np.nonzero(glob)[0]


def _candidate_pairs(segs: np.ndarray, scale: float):
    """(i, j) candidate index pairs whose bboxes share a grid cell.

    Only bbox-overlapping segments can interact, so the exact split math
    run on these pairs equals the dense all-pairs result.  Cell size is
    ~2x the median segment bbox (short survey edges -> a few cells per
    segment); segments spanning >32 cells pair against everything."""
    s = segs.shape[0]
    bb_lo = segs.min(axis=1)
    bb_hi = segs.max(axis=1)
    sizes = (bb_hi - bb_lo).max(axis=1)
    cell = float(max(np.median(sizes) * 2.0, scale / 4096, 1e-30))
    origin = bb_lo.min(axis=0)
    n_cells = max(int(np.ceil(scale / cell)) + 1, 1)
    cell_ids, owner, glob = _grid_cells_of_boxes(
        bb_lo, bb_hi, origin, cell, n_cells
    )
    pairs = []
    if owner.size:
        order = np.argsort(cell_ids, kind="stable")
        cid_s, own_s = cell_ids[order], owner[order]
        starts = np.nonzero(np.diff(cid_s))[0] + 1
        bounds = np.concatenate([[0], starts, [cid_s.size]])
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            members = own_s[b0:b1]
            if members.size >= 2:
                ii, jj = np.meshgrid(members, members, indexing="ij")
                m = ii < jj
                pairs.append(np.stack([ii[m], jj[m]], axis=1))
    if glob.size:
        others = np.arange(s)
        gi = np.repeat(glob, s)
        gj = np.tile(others, glob.size)
        m = gi != gj
        gi, gj = gi[m], gj[m]
        pairs.append(
            np.stack([np.minimum(gi, gj), np.maximum(gi, gj)], axis=1)
        )
    if not pairs:
        return (np.zeros(0, np.int64),) * 2
    allp = np.unique(np.concatenate(pairs, axis=0), axis=0)
    return allp[:, 0], allp[:, 1]


def _split_params(segs: np.ndarray, scale: float):
    """Per-segment sorted split parameters from all pairwise interactions.

    Covers proper crossings, endpoints lying on other segments
    (T-junctions), and collinear overlaps (the other segment's endpoints
    project in).  Candidate pairs are all-pairs for small inputs and
    grid-filtered above ``_GRID_THRESHOLD`` (identical results — only
    bbox-overlapping pairs can interact).
    """
    s = segs.shape[0]
    params: typing.List[typing.List[float]] = [[] for _ in range(s)]
    if s < 2:
        return params
    eps = 1e-12 * scale * scale  # area-scaled degeneracy threshold
    a = segs[:, 0]
    d = segs[:, 1] - segs[:, 0]

    # pairwise cross products: r x s, (q - p) x r, (q - p) x s
    if s <= _GRID_THRESHOLD:
        i_idx, j_idx = np.triu_indices(s, k=1)
    else:
        i_idx, j_idx = _candidate_pairs(segs, scale)
    if i_idx.size == 0:
        return params
    p, r = a[i_idx], d[i_idx]
    q, v = a[j_idx], d[j_idx]
    rxs = r[:, 0] * v[:, 1] - r[:, 1] * v[:, 0]
    qp = q - p
    qpxr = qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]
    qpxs = qp[:, 0] * v[:, 1] - qp[:, 1] * v[:, 0]

    with np.errstate(divide="ignore", invalid="ignore"):
        t = qpxs / rxs  # along i
        u = qpxr / rxs  # along j
    proper = (
        (np.abs(rxs) > eps)
        & (t > -1e-12) & (t < 1 + 1e-12)
        & (u > -1e-12) & (u < 1 + 1e-12)
    )
    for k in np.nonzero(proper)[0]:
        params[i_idx[k]].append(float(np.clip(t[k], 0.0, 1.0)))
        params[j_idx[k]].append(float(np.clip(u[k], 0.0, 1.0)))

    # collinear overlaps: rxs ~ 0 and (q-p) x r ~ 0 -> project endpoints
    coll = (np.abs(rxs) <= eps) & (np.abs(qpxr) <= eps)
    if np.any(coll):
        rr = np.einsum("ij,ij->i", r, r)
        vv = np.einsum("ij,ij->i", v, v)
        for k in np.nonzero(coll)[0]:
            i, j = int(i_idx[k]), int(j_idx[k])
            if rr[k] > 0:
                for e in segs[j]:
                    tt = float(np.dot(e - p[k], r[k]) / rr[k])
                    if 1e-12 < tt < 1 - 1e-12:
                        params[i].append(tt)
            if vv[k] > 0:
                for e in segs[i]:
                    uu = float(np.dot(e - q[k], v[k]) / vv[k])
                    if 1e-12 < uu < 1 - 1e-12:
                        params[j].append(uu)
    return params


def _fragments(segs: np.ndarray, scale: float):
    """Split + snap + dedupe -> (verts (V, 2), frags (F, 2) vertex ids)."""
    params = _split_params(segs, scale)
    quantum = 1e-9 * scale
    vert_ids: dict = {}
    verts: typing.List[np.ndarray] = []

    def vid(pt: np.ndarray) -> int:
        key = (round(pt[0] / quantum), round(pt[1] / quantum))
        i = vert_ids.get(key)
        if i is None:
            i = len(verts)
            vert_ids[key] = i
            verts.append(pt)
        return i

    frag_set: dict = {}
    for k in range(segs.shape[0]):
        ts = np.unique(np.concatenate([[0.0, 1.0], np.asarray(params[k])]))
        pts = segs[k, 0][None] + ts[:, None] * (segs[k, 1] - segs[k, 0])[None]
        ids = [vid(p) for p in pts]
        for a, b in zip(ids[:-1], ids[1:]):
            if a != b:
                frag_set.setdefault((min(a, b), max(a, b)), None)
    verts_arr = (
        np.asarray(verts) if verts else np.zeros((0, 2), np.float64)
    )
    frags = np.asarray(sorted(frag_set), np.int64).reshape(-1, 2)
    return verts_arr, frags


def _point_seg_dist(pts: np.ndarray, segs_a: np.ndarray, segs_b: np.ndarray):
    """(P, S) distances from points to segments."""
    d = segs_b - segs_a  # (S, 2)
    dd = np.einsum("ij,ij->i", d, d)  # (S,)
    ap = pts[:, None, :] - segs_a[None, :, :]  # (P, S, 2)
    t = np.einsum("psj,sj->ps", ap, d) / np.maximum(dd, 1e-300)
    t = np.clip(t, 0.0, 1.0)
    closest = segs_a[None] + t[..., None] * d[None]
    return np.linalg.norm(pts[:, None, :] - closest, axis=-1)


def _nearest_other_dist(mid, fa, fb, ln, scale):
    """(F,) distance from each fragment midpoint to the nearest OTHER
    fragment — a LOWER BOUND suffices (the offset only needs to stay
    inside the midpoint's arrangement cell).

    Dense (F, F) matrix for small inputs; above ``_GRID_THRESHOLD`` each
    midpoint searches only the fragments binned into the 3x3 cells
    around it — any fragment whose bbox misses that block is at least
    one full cell away, so ``cell`` bounds those."""
    n = mid.shape[0]
    if n <= _GRID_THRESHOLD:
        dist = _point_seg_dist(mid, fa, fb)
        np.fill_diagonal(dist, np.inf)
        return dist.min(axis=1)
    cell = float(max(np.median(ln) * 2.0, scale / 4096, 1e-30))
    bb_lo = np.minimum(fa, fb)
    bb_hi = np.maximum(fa, fb)
    origin = bb_lo.min(axis=0) - cell  # one-cell apron for 3x3 windows
    n_cells = max(int(np.ceil((scale + 2 * cell) / cell)) + 1, 3)
    cell_ids, owner, glob = _grid_cells_of_boxes(
        bb_lo, bb_hi, origin, cell, n_cells
    )
    order = np.argsort(cell_ids, kind="stable")
    cid_s, own_s = cell_ids[order], owner[order]
    uniq = np.unique(cid_s)
    starts = np.searchsorted(cid_s, uniq)
    ends = np.searchsorted(cid_s, uniq, side="right")
    members = {int(c): own_s[s:e] for c, s, e in zip(uniq, starts, ends)}

    out = np.full(n, cell, np.float64)  # beyond-3x3 lower bound
    pc = ((mid - origin) / cell).astype(np.int64)
    glob_set = glob
    # group midpoints by their cell; per group, gather 3x3 candidates
    pids = pc[:, 1] * n_cells + pc[:, 0]
    porder = np.argsort(pids, kind="stable")
    pid_s = pids[porder]
    pu = np.unique(pid_s)
    ps = np.searchsorted(pid_s, pu)
    pe = np.searchsorted(pid_s, pu, side="right")
    for c, s, e in zip(pu, ps, pe):
        pts_i = porder[s:e]
        cy, cx = int(c) // n_cells, int(c) % n_cells
        cand = [
            members.get((cy + dy) * n_cells + (cx + dx))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if 0 <= cy + dy < n_cells and 0 <= cx + dx < n_cells
        ]
        cand = [m for m in cand if m is not None]
        if glob_set.size:
            cand.append(glob_set)
        if not cand:
            continue
        cand = np.unique(np.concatenate(cand))
        d = _point_seg_dist(mid[pts_i], fa[cand], fb[cand])
        d[pts_i[:, None] == cand[None, :]] = np.inf
        out[pts_i] = np.minimum(out[pts_i], d.min(axis=1))
    return out


def _parity_bucketed(pts: np.ndarray, rings) -> np.ndarray:
    """(P,) crossing parity of points vs ALL ring edges, y-bucketed.

    For a valid polygon (holes strictly inside the exterior) the even-odd
    parity over exterior+hole edges equals ``exterior & ~holes`` — the
    same result as ``Polygon.contains_points`` without its O(P x E)
    matrix.  Buckets hold ~64 edges; cost ~O(P * 64 + E * spans)."""
    e0 = np.concatenate(
        [
            r[:-1] if (r[0] == r[-1]).all() else r
            for r in rings
        ]
    )
    e1 = np.concatenate(
        [
            r[1:] if (r[0] == r[-1]).all() else np.roll(r, -1, axis=0)
            for r in rings
        ]
    )
    n_edges = e0.shape[0]
    if n_edges == 0:
        return np.zeros(pts.shape[0], bool)
    ey_lo = np.minimum(e0[:, 1], e1[:, 1])
    ey_hi = np.maximum(e0[:, 1], e1[:, 1])
    y_min = float(ey_lo.min())
    y_max = float(ey_hi.max())
    n_b = max(1, min(n_edges // 64 + 1, 1 << 16))
    h = max((y_max - y_min) / n_b, 1e-300)
    b_lo = np.clip(((ey_lo - y_min) / h).astype(np.int64), 0, n_b - 1)
    b_hi = np.clip(((ey_hi - y_min) / h).astype(np.int64), 0, n_b - 1)
    counts = b_hi - b_lo + 1
    edge_of = np.repeat(np.arange(n_edges), counts)
    ends = np.cumsum(counts)
    pos = np.arange(int(ends[-1])) - np.repeat(ends - counts, counts)
    bucket_of = b_lo[edge_of] + pos
    order = np.argsort(bucket_of, kind="stable")
    bucket_s, edge_s = bucket_of[order], edge_of[order]
    # CSR over buckets
    starts = np.searchsorted(bucket_s, np.arange(n_b + 1))

    pb = np.clip(((pts[:, 1] - y_min) / h).astype(np.int64), 0, n_b - 1)
    out = np.zeros(pts.shape[0], bool)
    porder = np.argsort(pb, kind="stable")
    pb_s = pb[porder]
    pstarts = np.searchsorted(pb_s, np.arange(n_b + 1))
    for b in np.unique(pb_s):
        p_sel = porder[pstarts[b]:pstarts[b + 1]]
        e_sel = edge_s[starts[b]:starts[b + 1]]
        if e_sel.size == 0:
            continue
        px = pts[p_sel, 0:1]
        py = pts[p_sel, 1:2]
        x0, y0 = e0[e_sel, 0][None], e0[e_sel, 1][None]
        x1, y1 = e1[e_sel, 0][None], e1[e_sel, 1][None]
        cond = (y0 <= py) != (y1 <= py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
        crossings = np.sum(cond & (px < xint), axis=1)
        out[p_sel] = (crossings % 2) == 1
    return out


def _coverage(pts: np.ndarray, layer) -> np.ndarray:
    """(P,) bool: point covered by ANY polygon of the layer."""
    cov = np.zeros(pts.shape[0], bool)
    for poly in layer:
        x0, y0, x1, y1 = poly.bounds
        cand = ~cov & (
            (pts[:, 0] >= x0) & (pts[:, 0] <= x1)
            & (pts[:, 1] >= y0) & (pts[:, 1] <= y1)
        )
        if not np.any(cand):
            continue
        rings = _closed_rings(poly)
        n_edges = sum(r.shape[0] for r in rings)
        if n_edges * int(cand.sum()) > 4_000_000:
            cov[cand] = _parity_bucketed(pts[cand], rings)
        else:
            cov[cand] = poly.contains_points(pts[cand])
    return cov


def _assemble_polygons(rings) -> typing.List[Polygon]:
    """Outer (CCW) rings + hole (CW) rings -> Polygons, holes assigned to
    their smallest containing outer (pattern of
    exact_geometry.class_region_polygons)."""
    outers, holes = [], []
    for r in rings:
        if r.shape[0] < 3:
            continue
        (outers if _ring_area(r) > 0 else holes).append(r)
    polys = [Polygon(o) for o in outers]
    if holes and polys:
        areas = np.array([_ring_area(o) for o in outers])
        for hring in holes:
            containing: typing.List[int] = []
            for pt in hring:
                containing = [
                    i for i, o in enumerate(outers)
                    if bool(_points_in_ring(pt[None], o)[0])
                ]
                if containing:
                    break
            if not containing:
                continue
            best = containing[int(np.argmin(areas[containing]))]
            polys[best].holes.append(hring)
    return polys


def boolean_layers(
    layer_a: typing.Sequence[Polygon],
    layer_b: typing.Sequence[Polygon],
    op: str,
) -> typing.List[Polygon]:
    """Exact ``union`` / ``intersection`` / ``difference`` of two layers.

    A layer is a sequence of polygons; coverage within a layer is "any
    member contains the point" (overlapping members allowed).  Returns
    the result as a list of disjoint polygons with holes.
    """
    inside = {
        "union": lambda a, b: a | b,
        "intersection": lambda a, b: a & b,
        "difference": lambda a, b: a & ~b,
    }.get(op)
    if inside is None:
        raise ValueError(f"unknown op {op!r}")
    layer_a = [p for p in layer_a if p.exterior.shape[0] >= 3]
    layer_b = [p for p in layer_b if p.exterior.shape[0] >= 3]
    segs, _tags = _gather_segments([layer_a, layer_b])
    if segs.shape[0] == 0:
        return []
    lo = segs.reshape(-1, 2).min(0)
    hi = segs.reshape(-1, 2).max(0)
    scale = float(max(hi[0] - lo[0], hi[1] - lo[1], 1e-30))

    verts, frags = _fragments(segs, scale)
    if frags.shape[0] == 0:
        return []
    fa, fb = verts[frags[:, 0]], verts[frags[:, 1]]
    mid = 0.5 * (fa + fb)
    d = fb - fa
    ln = np.linalg.norm(d, axis=1)
    keep_len = ln > 1e-12 * scale
    frags, fa, fb, mid, d, ln = (
        x[keep_len] for x in (frags, fa, fb, mid, d, ln)
    )
    if frags.shape[0] == 0:
        return []
    nrm = np.stack([-d[:, 1], d[:, 0]], axis=1) / ln[:, None]  # left normal

    # per-fragment safe offset: under half the distance to the nearest
    # OTHER fragment (the offset point then shares the midpoint's
    # arrangement cell), capped by the fragment's own length
    delta = np.minimum(
        0.45 * _nearest_other_dist(mid, fa, fb, ln, scale), 0.25 * ln
    )
    delta = np.maximum(delta, 1e-11 * scale)

    pl = mid + delta[:, None] * nrm
    pr = mid - delta[:, None] * nrm
    in_l = inside(_coverage(pl, layer_a), _coverage(pl, layer_b))
    in_r = inside(_coverage(pr, layer_a), _coverage(pr, layer_b))

    keep = in_l != in_r
    if not np.any(keep):
        return []
    # orient interior-left: fragment (a, b) has its left side at +normal
    e = frags[keep]
    flip = ~in_l[keep]
    edges = np.where(flip[:, None], e[:, ::-1], e)
    rings = _chain_rings(edges, verts)
    return _assemble_polygons(rings)


def union_exact(polygons: typing.Sequence[Polygon]) -> typing.List[Polygon]:
    """Exact union of one polygon layer (GEOS ``unary_union`` twin —
    reference utils/geometric.py:13-96)."""
    return boolean_layers(polygons, [], "union")


def intersection_exact(a, b) -> typing.List[Polygon]:
    return boolean_layers(a, b, "intersection")


def difference_exact(a, b) -> typing.List[Polygon]:
    return boolean_layers(a, b, "difference")


def non_overlapping_exact(
    polygons: typing.Sequence[Polygon],
) -> typing.List[typing.List[Polygon]]:
    """De-overlap a layer exactly; smaller polygons keep their territory
    (reference utils/geospatial.py:74-110 area-sorted iterative
    difference).  Returns per-input lists of parts (a difference can
    split a polygon; the reference keeps these as MultiPolygons)."""
    order = np.argsort([p.area for p in polygons], kind="stable")
    taken: typing.List[Polygon] = []
    taken_bounds: typing.List[typing.Tuple[float, float, float, float]] = []
    out: typing.List[typing.List[Polygon]] = [[] for _ in polygons]
    for i in order:
        poly = polygons[i]
        # bbox prefilter: only already-claimed polygons that can overlap
        # this one participate in the (expensive) exact difference — a
        # mostly-disjoint layer stays near-linear
        x0, y0, x1, y1 = poly.bounds
        cand = [
            t
            for t, (tx0, ty0, tx1, ty1) in zip(taken, taken_bounds)
            if tx0 <= x1 and tx1 >= x0 and ty0 <= y1 and ty1 >= y0
        ]
        parts = difference_exact([poly], cand) if cand else [poly]
        out[int(i)] = parts
        taken.extend(parts)
        taken_bounds.extend(p.bounds for p in parts)
    return out
