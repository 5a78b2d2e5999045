import pytest
from pyspark.sql import functions as F

from anovos_spark.plans import report_frames as RF


@pytest.fixture(scope="module")
def rdf(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 1, 12.0),
        ("a", 0, 11.0),
        ("b", 0, 100.0),  # outlier vs the rest
        (None, 1, 13.0),
    ]
    return spark.createDataFrame(rows, schema="cat string, y int, v double")


def test_frequency_frame(rdf):
    d = {r["cat"]: r for r in RF.frequency_frame(rdf, "cat").collect()}
    assert d["a"]["count"] == 3 and d["a"]["count_pct"] == 60.0
    assert d["Missing"]["count"] == 1


def test_event_rate_frame(rdf):
    d = {r["cat"]: r for r in RF.event_rate_frame(rdf, "cat", "y", 1).collect()}
    assert d["a"]["n_event"] == 2 and d["a"]["n_nonevent"] == 1
    assert d["a"]["event_rate"] == pytest.approx(100 * 2 / 3, abs=1e-4)
    assert d["b"]["event_rate"] == 0.0


def test_outlier_frame(rdf):
    d = {r["attribute"]: r for r in RF.outlier_frame(rdf, ["v"]).collect()}
    v = d["v"]
    assert v["q1"] <= v["median"] <= v["q3"]
    assert v["n_outliers"] == 1  # the 100.0 point
    assert v["upper_whisker"] < 100.0


def test_comparative_drift_frame(spark):
    t = spark.createDataFrame([("x",), ("x",), ("y",)], schema="k string")
    s = spark.createDataFrame([("x",), ("y",), ("z",)], schema="k string")
    d = {r["k"]: r for r in RF.comparative_drift_frame(t, s, "k").collect()}
    assert d["x"]["countpct_target"] == pytest.approx(2 / 3, abs=1e-6)
    assert d["x"]["pct_diff"] == pytest.approx(100.0, abs=1e-3)
    # z exists only in source: (0 / (1/3) - 1)·100 = -100
    assert d["z"]["countpct_target"] == 0.0
    assert d["z"]["pct_diff"] == pytest.approx(-100.0, abs=1e-3)
    assert d["y"]["pct_diff"] == pytest.approx(0.0, abs=1e-3)


def test_violin_frame(spark):
    """Binned density for violin rendering: bins tile [min, max], the
    modal bin has density exactly 1.0, NULL/NaN rows drop, and the
    output stays driver-sized (≤ n_bins rows per attribute)."""
    rows = [(float(v),) for v in [0, 0, 0, 0, 1, 2, 3, 10]]
    rows += [(None,), (float("nan"),)]
    df = spark.createDataFrame(rows, "v double")
    out = RF.violin_frame(df, ["v"], n_bins=10).collect()
    assert 0 < len(out) <= 10
    assert all(r["attribute"] == "v" for r in out)
    by_bin = {r["bin"]: r for r in out}
    # modal bin is bin 0 (four zeros) and normalizes to 1.0
    assert by_bin[0]["density"] == 1.0
    assert by_bin[0]["bin_lo"] == 0.0
    # max value 10 lands in the LAST bin (clamped, not dropped)
    assert max(by_bin) == 9 and by_bin[9]["bin_hi"] == 10.0
    # densities are shares of the modal count
    assert by_bin[9]["density"] == pytest.approx(0.25, abs=1e-6)
    # all-null / non-numeric columns degrade to an empty frame
    empty = spark.createDataFrame([(None,)], "w double")
    assert RF.violin_frame(empty, ["w"]).count() == 0


def test_corr_heatmap_non_square_pivot_viewport():
    """A long-form correlation frame whose pivot is NON-square (an
    attribute present as a row but missing as a column) must still size
    the SVG viewport to the rendered rows — no cell may land below the
    declared height (the r7 renderer drew such rows outside the
    viewport)."""
    import re

    import pandas as pd

    from anovos_spark.plans.report_html import _svg_corr_heatmap

    # c appears as attribute1 (a row) but never as attribute2 (a column)
    rows = []
    for a in ("a", "b", "c"):
        for b in ("a", "b"):
            rows.append((a, b, 1.0 if a == b else 0.5))
    pdf = pd.DataFrame(rows, columns=["attribute1", "attribute2", "corr"])
    svg = _svg_corr_heatmap(pdf)
    assert "corr-heatmap" in svg
    height = int(re.search(r'height="(\d+)"', svg).group(1))
    y_coords = [float(m) for m in re.findall(r'<rect[^>]* y="([\d.]+)"', svg)]
    cell_h = 22
    assert y_coords and max(y_coords) + cell_h <= height
    # only the 2 square attrs render as rows; 'c' (no column) is skipped
    assert svg.count('text-anchor="end"') == 2

    # square case still renders all three rows when c is a column too
    rows_sq = [
        (a, b, 1.0 if a == b else 0.25)
        for a in ("a", "b", "c")
        for b in ("a", "b", "c")
    ]
    pdf_sq = pd.DataFrame(rows_sq, columns=["attribute1", "attribute2", "corr"])
    svg_sq = _svg_corr_heatmap(pdf_sq)
    assert svg_sq.count('text-anchor="end"') == 3
