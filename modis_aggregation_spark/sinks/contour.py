"""Contour-style quick-look rendering without matplotlib.

The reference's legacy ``displayOutput`` (cfa.pyc strings: ``figure``,
``contourf`` with ``cmap='jet'``, ``colorbar``, ``savefig`` →
``monthlyCloudFraction-file-level-for-loop.png``; sample product
``resources/data/sample_output_data/MYD08_D3.A2008001CloudFraction.png``)
renders the aggregated grid as a filled contour plot.  matplotlib is not
in this container, so this module reimplements the product from first
principles, all pure numpy + the bundled ``pnglite`` encoder:

* ``jet_colormap`` — the classic 'jet' piecewise-linear RGB ramp (the
  public formula; endpoints dark blue → dark red through cyan/yellow).
* filled level bands — the grid is bilinearly upsampled and quantized
  into ``levels`` bands through the colormap (the region fill a
  ``contourf`` produces, with sub-cell boundary smoothness coming from
  the interpolation).
* ``marching_squares`` — exact iso-line extraction on the original grid
  (the standard 16-case marching-squares algorithm with linear edge
  interpolation and center-mean disambiguation of the two saddle
  cases), rasterized as dark overlay lines.
* NaN cells render transparent (NULL-cell convention, SURVEY §1.4) and
  poison interpolation around them rather than bleeding values.

Everything is driver-side over the ≤MB collected grid — the same bound
as every exporter in ``sinks/writers.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "jet_colormap",
    "marching_squares",
    "render_contour",
    "render_contour_png",
]


def jet_colormap(n: int = 256) -> np.ndarray:
    """(n, 3) uint8 'jet' ramp: the classic piecewise-linear formula
    (blue ramps down as green ramps up, red trailing), anchored at
    dark blue (0, 0, 128) → blue → cyan → yellow → red → dark red
    (128, 0, 0)."""
    if n < 2:
        raise ValueError("jet_colormap wants n >= 2")
    x = np.linspace(0.0, 1.0, n)

    def ramp(c: np.ndarray) -> np.ndarray:
        return np.clip(c, 0.0, 1.0)

    r = ramp(1.5 - np.abs(4.0 * x - 3.0))
    g = ramp(1.5 - np.abs(4.0 * x - 2.0))
    b = ramp(1.5 - np.abs(4.0 * x - 1.0))
    return (np.stack([r, g, b], axis=1) * 255.0 + 0.5).astype(np.uint8)


def _bilinear_upsample(grid: np.ndarray, scale: int) -> np.ndarray:
    """NaN-propagating bilinear interpolation to (H*scale, W*scale):
    sample points land on a uniform lattice over the cell-center span,
    matching where ``contourf`` evaluates the field."""
    h, w = grid.shape
    if h < 2 or w < 2:
        return np.repeat(np.repeat(grid, scale, 0), scale, 1)
    ys = np.linspace(0.0, h - 1.0, h * scale)
    xs = np.linspace(0.0, w - 1.0, w * scale)
    y0 = np.minimum(ys.astype(np.int64), h - 2)
    x0 = np.minimum(xs.astype(np.int64), w - 2)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    g00 = grid[y0][:, x0]
    g01 = grid[y0][:, x0 + 1]
    g10 = grid[y0 + 1][:, x0]
    g11 = grid[y0 + 1][:, x0 + 1]
    return (
        g00 * (1 - fy) * (1 - fx)
        + g01 * (1 - fy) * fx
        + g10 * fy * (1 - fx)
        + g11 * fy * fx
    )


# marching-squares case table: for each of the 16 corner-sign cases
# (bit0 = top-left a, bit1 = top-right b, bit2 = bottom-right c,
# bit3 = bottom-left d; bit set = corner >= level), the pairs of cell
# edges (0=top a-b, 1=right b-c, 2=bottom d-c, 3=left a-d) a contour
# segment connects.  Every listed edge has corners straddling the level,
# so the edge interpolation below is always a true crossing (t ∈ [0, 1],
# no zero denominators).  Cases 5 and 10 are the saddle cases, resolved
# at runtime by the cell-center mean (the standard disambiguation).
_MS_CASES: dict[int, tuple[tuple[int, int], ...]] = {
    0: (), 15: (),
    1: ((3, 0),), 14: ((3, 0),),
    2: ((0, 1),), 13: ((0, 1),),
    3: ((3, 1),), 12: ((3, 1),),
    4: ((1, 2),), 11: ((1, 2),),
    6: ((0, 2),), 9: ((0, 2),),
    7: ((3, 2),), 8: ((3, 2),),
}


def marching_squares(grid: np.ndarray, level: float) -> np.ndarray:
    """Iso-line segments of ``grid`` at ``level`` — (n, 4) float array of
    (y0, x0, y1, x1) in grid-index coordinates, linearly interpolated
    along cell edges.  Cells touching a NaN corner are skipped (masked
    regions get no contour, the ``contourf`` convention)."""
    h, w = grid.shape
    segs: list[tuple[float, float, float, float]] = []
    g = grid.astype(np.float64)
    above = g >= level
    for i in range(h - 1):
        for j in range(w - 1):
            a, b = g[i, j], g[i, j + 1]
            c, d = g[i + 1, j + 1], g[i + 1, j]
            if np.isnan(a) or np.isnan(b) or np.isnan(c) or np.isnan(d):
                continue
            case = (
                (1 if above[i, j] else 0)
                | (2 if above[i, j + 1] else 0)
                | (4 if above[i + 1, j + 1] else 0)
                | (8 if above[i + 1, j] else 0)
            )
            if case in (0, 15):
                continue

            def interp(edge: int) -> tuple[float, float]:
                if edge == 0:  # top: (i,j)-(i,j+1)
                    t = (level - a) / (b - a)
                    return (float(i), j + t)
                if edge == 1:  # right: (i,j+1)-(i+1,j+1)
                    t = (level - b) / (c - b)
                    return (i + t, float(j + 1))
                if edge == 2:  # bottom: (i+1,j)-(i+1,j+1)
                    t = (level - d) / (c - d)
                    return (float(i + 1), j + t)
                t = (level - a) / (d - a)  # left: (i,j)-(i+1,j)
                return (i + t, float(j))

            if case in (5, 10):  # saddle: split by center mean
                center_above = (a + b + c + d) / 4.0 >= level
                if case == 5:  # a, c above
                    pairs = ((3, 0), (1, 2)) if center_above else ((0, 1), (3, 2))
                else:  # b, d above
                    pairs = ((0, 1), (3, 2)) if center_above else ((3, 0), (1, 2))
            else:
                pairs = _MS_CASES[case]
            for e0, e1 in pairs:
                y0, x0 = interp(e0)
                y1, x1 = interp(e1)
                segs.append((y0, x0, y1, x1))
    return np.array(segs, dtype=np.float64).reshape(-1, 4)


def _draw_segments(
    img: np.ndarray, segs: np.ndarray, scale: int, rgba: tuple[int, int, int, int]
) -> None:
    """Rasterize segments (grid coords) onto the upsampled RGBA image by
    dense sampling — quick-look weight, one pixel wide."""
    hh, ww = img.shape[:2]
    color = np.array(rgba, dtype=np.uint8)
    for y0, x0, y1, x1 in segs:
        n = max(2, int(np.hypot((y1 - y0) * scale, (x1 - x0) * scale) * 2) + 1)
        ys = np.clip(np.round(np.linspace(y0, y1, n) * scale).astype(int), 0, hh - 1)
        xs = np.clip(np.round(np.linspace(x0, x1, n) * scale).astype(int), 0, ww - 1)
        img[ys, xs] = color


def render_contour(
    grid: np.ndarray,
    levels: int = 10,
    vmin: float | None = None,
    vmax: float | None = None,
    scale: int = 8,
    draw_lines: bool = True,
) -> np.ndarray:
    """Filled-contour RGBA render of a 2-D grid (NaN → transparent):
    bilinear upsample → quantize into ``levels`` bands → jet colormap,
    with marching-squares iso-lines overlaid at the band boundaries."""
    if grid.ndim != 2:
        raise ValueError("render_contour wants a 2-D grid")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    finite = np.isfinite(grid)
    if vmin is None:
        vmin = float(np.nanmin(grid)) if finite.any() else 0.0
    if vmax is None:
        vmax = float(np.nanmax(grid)) if finite.any() else 1.0
    if vmax <= vmin:
        vmax = vmin + 1.0
    fine = _bilinear_upsample(grid.astype(np.float64), scale)
    edges = np.linspace(vmin, vmax, levels + 1)
    band = np.clip(np.digitize(fine, edges) - 1, 0, levels - 1)
    cmap = jet_colormap(levels)
    rgba = np.zeros((*fine.shape, 4), dtype=np.uint8)
    ok = np.isfinite(fine)
    rgba[ok, :3] = cmap[band[ok]]
    rgba[ok, 3] = 255
    if draw_lines:
        for lev in edges[1:-1]:
            segs = marching_squares(grid, float(lev))
            if len(segs):
                _draw_segments(rgba, segs, scale, (32, 32, 32, 255))
    return rgba


def render_contour_png(
    grid: np.ndarray,
    levels: int = 10,
    vmin: float | None = None,
    vmax: float | None = None,
    scale: int = 8,
) -> bytes:
    """PNG bytes of ``render_contour`` (north-up flip is the caller's
    concern, matching ``writers.export_png``)."""
    from modis_aggregation_spark.sinks.pnglite import encode_png

    return encode_png(render_contour(grid, levels, vmin, vmax, scale))
