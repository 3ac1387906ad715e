"""sinks/contour.py — the matplotlib-free displayOutput product: jet
colormap anchors, marching-squares geometry against analytically known
fields, NaN transparency, and the writers/CLI export path end-to-end."""

import numpy as np
import pytest

from modis_aggregation_spark.sinks.contour import (
    jet_colormap,
    marching_squares,
    render_contour,
    render_contour_png,
)


def test_jet_colormap_anchors():
    c = jet_colormap(256)
    assert c.shape == (256, 3)
    # dark blue start, dark red end, green peak mid
    assert c[0, 2] > 100 and c[0, 0] == 0 and c[0, 1] == 0
    assert c[-1, 0] > 100 and c[-1, 1] == 0 and c[-1, 2] == 0
    mid = c[128]
    assert mid[1] == 255  # green fully on at center
    with pytest.raises(ValueError):
        jet_colormap(1)


def test_marching_squares_vertical_line():
    # f(y, x) = x → the level-c iso-line is the vertical line x = c
    g = np.tile(np.arange(8.0), (6, 1))
    segs = marching_squares(g, 3.5)
    assert len(segs) == 5  # one segment per cell row
    assert np.allclose(segs[:, 1], 3.5) and np.allclose(segs[:, 3], 3.5)
    # spans every row of the grid once stitched
    ys = np.sort(np.concatenate([segs[:, 0], segs[:, 2]]))
    assert ys[0] == 0.0 and ys[-1] == 5.0


def test_marching_squares_circle():
    n = 41
    y, x = np.mgrid[0:n, 0:n]
    g = (x - 20.0) ** 2 + (y - 20.0) ** 2
    segs = marching_squares(g, 100.0)  # radius 10
    assert len(segs) > 20
    pts = np.concatenate([segs[:, :2], segs[:, 2:]])
    r = np.hypot(pts[:, 0] - 20.0, pts[:, 1] - 20.0)
    # linear edge interpolation of a quadratic: within a grid cell of truth
    assert np.abs(r - 10.0).max() < 0.5


def test_marching_squares_diagonal_exact():
    """f(y, x) = x + y is linear, so edge interpolation is EXACT: every
    segment endpoint of the level-c iso-line satisfies x + y == c.
    Exercises the single-corner cases (1/4/11/14) the vertical-gradient
    test never hits — the round-6 case-table bug escaped it."""
    y, x = np.mgrid[0:7, 0:9].astype(float)
    g = x + y
    for level in (0.5, 3.5, 7.25, 12.5):
        segs = marching_squares(g, level)
        assert len(segs) > 0
        pts = np.concatenate([segs[:, :2], segs[:, 2:]])
        assert np.allclose(pts.sum(axis=1), level), level
        # every endpoint lies on a real cell edge: one coordinate integral,
        # the other within the grid
        on_edge = np.isclose(pts % 1.0, 0.0) | np.isclose(pts % 1.0, 1.0)
        assert on_edge.any(axis=1).all()


def test_marching_squares_skips_nan_and_saddle_runs():
    g = np.array([[0.0, 1.0], [1.0, np.nan]])
    assert len(marching_squares(g, 0.5)) == 0  # the only cell has a NaN
    # saddle case executes without error and yields two segments
    s = np.array([[1.0, 0.0], [0.0, 1.0]])
    segs = marching_squares(s, 0.5)
    assert len(segs) == 2


def test_render_contour_bands_and_nan_alpha():
    g = np.tile(np.linspace(0.0, 1.0, 16), (8, 1))
    g[0, 0] = np.nan
    img = render_contour(g, levels=4, vmin=0.0, vmax=1.0, scale=4, draw_lines=False)
    assert img.shape == (32, 64, 4)
    # NaN corner region transparent, interior opaque
    assert img[0, 0, 3] == 0
    assert img[-1, -1, 3] == 255
    # low end blue-ish, high end red-ish (jet ordering preserved)
    assert img[-1, 0, 2] > img[-1, 0, 0]
    assert img[-1, -1, 0] > img[-1, -1, 2]
    with pytest.raises(ValueError):
        render_contour(g[0], levels=4)
    with pytest.raises(ValueError):
        render_contour(g, levels=0)


def test_render_contour_png_decodes():
    from modis_aggregation_spark.sinks.pnglite import decode_png

    g = np.add.outer(np.linspace(0, 1, 10), np.linspace(0, 1, 12))
    png = render_contour_png(g, levels=6, scale=4)
    img = decode_png(png)
    assert img.shape == (40, 48, 4)
    assert img[..., 3].max() == 255


def test_export_contour_png_end_to_end(spark, tmp_path):
    """The writers hook: a real aggregation → contour PNG that the
    bundled decoder reads back at the upsampled grid size."""
    import os

    from modis_aggregation_spark.config import AggregationSpec
    from modis_aggregation_spark.plans.pipeline import daily_grid
    from modis_aggregation_spark.sinks.pnglite import decode_png
    from modis_aggregation_spark.sinks.writers import export_contour_png

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    )
    pixels = spark.read.parquet(os.path.join(fixtures, "pixels.parquet"))
    granules = spark.read.parquet(os.path.join(fixtures, "granules.parquet"))
    spec = AggregationSpec(lat_bounds=(-20.0, 20.0), lon_bounds=(0.0, 35.0))
    grid = daily_grid(spark, spec, pixels, granules)
    p = str(tmp_path / "contour.png")
    export_contour_png(grid, spec, p, levels=8, scale=2)
    img = decode_png(open(p, "rb").read())
    assert img.shape == (spec.nlat * 2, spec.nlon * 2, 4)
    with pytest.raises(FileExistsError):
        export_contour_png(grid, spec, p, levels=8, scale=2)
