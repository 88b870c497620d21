"""SVG graph rendering (graph.py) — the reference's plot contract without
Bokeh: one polyline per series, datetime axis, legend for >= 2 series,
XML-safe labels."""

import xml.etree.ElementTree as ET

from smalltsdb_spark.graph import PALETTE, render_graph_html, render_graph_svg

SVG_NS = "{http://www.w3.org/2000/svg}"


def _data(n_series=2, n_points=5):
    return {
        "interval": (0.0, 600.0),
        "series": [
            {
                "name": f"m{i}",
                "period": "tensecond",
                "stat": "avg",
                "label": f"m{i} avg",
                "timestamps": [60.0 * j for j in range(n_points)],
                "values": [float(i + j) for j in range(n_points)],
            }
            for i in range(n_series)
        ],
    }


def _polylines(svg: str):
    root = ET.fromstring(svg)
    return root.findall(f".//{SVG_NS}polyline")


def test_one_polyline_per_series_valid_xml():
    svg = render_graph_svg(_data(3))
    lines = _polylines(svg)
    assert len(lines) == 3
    # fixed-order palette assignment, never cycled within the first eight
    strokes = [p.get("stroke") for p in lines]
    assert strokes == PALETTE[:3]


def test_legend_only_for_multiple_series():
    multi = render_graph_svg(_data(2))
    single = render_graph_svg(_data(1))
    assert "m1 avg" in multi
    root = ET.fromstring(single)
    rects = root.findall(f".//{SVG_NS}rect")
    assert len(rects) == 1  # surface only, no legend swatches


def test_tooltip_titles_per_point():
    svg = render_graph_svg(_data(1, n_points=4))
    root = ET.fromstring(svg)
    titles = root.findall(f".//{SVG_NS}circle/{SVG_NS}title")
    assert len(titles) == 4
    assert "m0 avg" in titles[0].text


def test_labels_are_xml_escaped():
    data = _data(1)
    data["series"][0]["label"] = "a<b&c"
    svg = render_graph_svg(data)
    ET.fromstring(svg)  # must stay well-formed
    assert "a<b&c" not in svg and "a&lt;b&amp;c" in svg


def test_placeholder_single_point_renders():
    data = {
        "interval": (0.0, 3600.0),
        "series": [
            {
                "name": "m",
                "period": "onehour",
                "stat": "p90",
                "label": "m",
                "timestamps": [0.0],
                "values": [0.0],
            }
        ],
    }
    ET.fromstring(render_graph_svg(data))


def test_html_wrapper_embeds_svg():
    html = render_graph_html(_data(2))
    assert html.startswith("<!doctype html>") and "<svg" in html
    # the static variant is a pure document — no script, safe to embed
    assert "<script>" not in html


def test_interactive_html_has_panzoom_layer():
    """interactive=True embeds the pan/zoom script with the interval
    epochs baked in; gestures re-fetch ?format=svg with adjusted
    start/end (server-side re-render, the Bokeh-page interactivity model
    without the dependency)."""
    data = _data(2)
    html = render_graph_html(data, interactive=True)
    assert "<script>" in html
    assert "format', 'svg'" in html or "'format', 'svg'" in html
    assert "addEventListener('wheel'" in html
    assert "addEventListener('pointerdown'" in html
    assert "dblclick" in html
    # interval endpoints are baked in as the reset state
    from smalltsdb_spark.graph import _epoch

    s, e = (_epoch(v) for v in data["interval"])
    assert f"{s:f}" in html and f"{e:f}" in html


def test_flask_graph_svg_endpoint(spark, tsdb_dir):
    flask = __import__("pytest").importorskip("flask")  # noqa: F841

    from smalltsdb_spark.app import create_app
    from smalltsdb_spark.tsdb import TablesTSDB

    clock = {"now": 100.0}
    db = TablesTSDB(spark, tsdb_dir, now=lambda: clock["now"])
    db.insert([("web.a", 1.0, 1.0), ("web.a", 2.0, 3.0)])
    db.sync()
    app = create_app(db)
    client = app.test_client()
    r = client.get(
        "/graph?metrics-0-name=web.a&metrics-0-period=tensecond"
        "&metrics-0-stat=avg&start=0&end=100&format=svg"
    )
    assert r.status_code == 200
    assert r.mimetype == "image/svg+xml"
    ET.fromstring(r.get_data(as_text=True))
    r2 = client.get(
        "/graph?metrics-0-name=web.a&metrics-0-period=tensecond"
        "&metrics-0-stat=avg&start=0&end=100"
    )
    assert r2.is_json  # default JSON contract unchanged
