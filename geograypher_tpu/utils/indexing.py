"""Indexing/map-inversion utilities (reference utils/indexing.py).

``find_argmax_nonzero_value`` has a jitted twin in ops/aggregate.py used on
device; this host version is a masked-select reformulation of the
reference's behavior (see its docstring).
``inverse_map_interpolation`` is kept for API parity, but the distortion
engine inverts warps directly with Newton iteration
(cameras/distortion.warped_to_ideal_pixels) — exact and ~1000x faster than
griddata.
"""

from __future__ import annotations

import typing

import numpy as np


def find_argmax_nonzero_value(
    array: np.ndarray, keepdims: bool = False, axis: int = 1
) -> np.ndarray:
    """Per-row argmax, with NaN wherever a row is degenerate.

    A row is degenerate when it contains any non-finite value or when it
    sums to zero (no votes at all) — behavioral twin of reference
    utils/indexing.py:9-33, reformulated as a single masked select.
    """
    array = np.asarray(array)
    finite = np.isfinite(array)
    # summing only finite entries keeps the zero-sum test well-defined
    # even on rows that fail the all-finite test
    row_ok = finite.all(axis=axis) & (array.sum(axis=axis, where=finite) != 0)
    out = np.where(row_ok, np.argmax(array, axis=axis), np.nan)
    if keepdims:
        out = np.expand_dims(out, axis)
    return out


def determine_IDs_to_labels(
    texture_array: np.ndarray,
    all_discrete_texture_values: typing.Optional[list] = None,
    background_ID: typing.Optional[int] = None,
) -> typing.Optional[dict]:
    """Unique-value -> integer-ID mapping for discrete textures, or None
    for truly continuous data (reference indexing.py:35-85)."""
    texture_array = np.asarray(texture_array)
    if texture_array.dtype == float:
        finite = texture_array[np.isfinite(texture_array)]
        if finite.size and not np.allclose(finite, finite.astype(int)):
            return None
    source = (
        texture_array
        if all_discrete_texture_values is None
        else np.asarray(all_discrete_texture_values)
    )
    unique_values = np.unique(source[~_isnan_safe(source)])
    IDs_to_labels = {}
    i = 0
    for v in unique_values:
        if background_ID is not None and i == background_ID:
            i += 1
        IDs_to_labels[i] = v.item() if hasattr(v, "item") else v
        i += 1
    return IDs_to_labels


def _isnan_safe(arr):
    try:
        return np.isnan(arr)
    except TypeError:
        return np.zeros(np.shape(arr), dtype=bool)


def inverse_map_interpolation(
    ijmap: np.ndarray, downsample: int = 1, fill: float = -1
) -> np.ndarray:
    """Invert a (2, H, W) sampling map by scattered-data interpolation
    (reference indexing.py:87-150; scipy griddata).

    Retained for generic warps with no analytic inverse; lens distortion
    uses the Newton inverse instead.
    """
    from scipy.interpolate import griddata

    H, W = ijmap.shape[1:]
    igrid, jgrid = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    grid_coords = np.stack([igrid.ravel(), jgrid.ravel()], axis=1)
    if downsample > 1:
        ds = slice(None, None, downsample)
        sample_y = np.stack(
            [igrid[ds, ds].ravel(), jgrid[ds, ds].ravel()], axis=1
        )
        sample_x = np.stack(
            [ijmap[0][ds, ds].ravel(), ijmap[1][ds, ds].ravel()], axis=1
        )
    else:
        sample_y = grid_coords.copy()
        sample_x = np.stack([ijmap[0].ravel(), ijmap[1].ravel()], axis=1)
    inv_i = griddata(
        sample_x, sample_y[:, 0], grid_coords, method="linear", fill_value=fill
    )
    inv_j = griddata(
        sample_x, sample_y[:, 1], grid_coords, method="linear", fill_value=fill
    )
    return np.stack([inv_i.reshape(H, W), inv_j.reshape(H, W)], axis=0)
