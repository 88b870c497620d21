"""Web/graphing layer (reference app/__init__.py), engine-side parts.

The reference serves a Flask app whose ``/graph`` endpoint decodes a
flattened query string into metric specs, pulls each series with
``get_metric``, and renders a Bokeh plot (app/__init__.py:85-227).  The
*data* contract is the durable part — this module implements it free of
any HTTP/plotting dependency:

- :func:`parse_datetime` — int epoch or ISO-8601 (app/__init__.py:158-166);
- :func:`make_short_names` — legend disambiguation (app/__init__.py:72-82);
- :func:`graph_data` — flattened args → list of (timestamps, values)
  series, with the reference's default interval (last hour, minute
  floor) and empty-series placeholder;
- :func:`pretty_print_table` — the debug dump sink (daemon.py:219-229).

If Flask is importable, :func:`create_app` serves ``/`` (metric list) and
``/graph`` — the series as JSON by default, or rendered server-side with
``?format=svg`` / ``?format=html`` (graph.render_graph_svg, the
dependency-free stand-in for the reference's Bokeh plot; Bokeh is not on
this environment's path).
"""

from __future__ import annotations

import datetime as _dt

from smalltsdb_spark.flat import unflatten

SECONDS_PER_HOUR = 3600


def parse_datetime(value):
    """int/float epoch, ISO-8601 string, or datetime → epoch-or-datetime
    (whatever get_metric's coercion accepts)."""
    if isinstance(value, (_dt.datetime, int, float)):
        return value
    try:
        return int(value)
    except (TypeError, ValueError):
        pass
    return _dt.datetime.fromisoformat(str(value))


def make_short_names(tuples: list[tuple]) -> list[str]:
    """Legend labels: keep only the positions that differ across specs
    (all-identical specs fall back to the first field)."""
    width = len(tuples[0])
    varying = [i for i in range(width) if len({t[i] for t in tuples}) > 1]
    if not varying:
        varying = [0]
    return [" ".join(str(t[i]) for i in varying) for t in tuples]


def default_interval(now: _dt.datetime | None = None) -> tuple:
    """Last hour, end floored to the minute (app/__init__.py:177-179)."""
    end = (now or _dt.datetime.now(_dt.timezone.utc)).replace(second=0, microsecond=0)
    return end - _dt.timedelta(hours=1), end


def graph_spec_from_args(args: dict, now: _dt.datetime | None = None) -> dict:
    """Flattened query args → {'metrics': [(name, period, stat)],
    'bounds': [bool, ...] (aligned; ``metrics.N.bounds`` truthy serves
    the percentile as histogram-cascade containment bounds, r11),
    'interval': (start, end)}; blank metric names dropped."""
    nested = unflatten(dict(args))
    kept = [
        m
        for m in nested.get("metrics", [])
        if str(m.get("name", "")).strip()
    ]
    metrics = [(m["name"], m["period"], m["stat"]) for m in kept]
    bounds = [bool(str(m.get("bounds", "")).strip()) for m in kept]
    d_start, d_end = default_interval(now)
    start = parse_datetime(nested.get("start", d_start))
    end = parse_datetime(nested.get("end", d_end))
    return {"metrics": metrics, "bounds": bounds, "interval": (start, end)}


def graph_data(db, args: dict, now: _dt.datetime | None = None) -> dict:
    """The ``/graph`` endpoint's data: one series per metric spec.

    Empty series get the reference's single-point placeholder
    (app/__init__.py:118-121) so clients always have something to draw.
    """
    spec = graph_spec_from_args(args, now)
    labels = make_short_names(spec["metrics"]) if spec["metrics"] else []
    series = []
    for (name, period, stat), label, want_bounds in zip(
        spec["metrics"], labels, spec["bounds"]
    ):
        entry = {
            "name": name,
            "period": period,
            "stat": stat,
            "label": label,
        }
        if want_bounds:
            # percentile containment bounds from the histogram cascade
            # (tsdb.get_metric_bounds, r11) — a band, not a line; hi is
            # None in the clamp bin (honest unbounded tail)
            points = db.get_metric(
                name, period, stat, spec["interval"], bounds=True
            )
            if not points:
                points = [(0.0, 0.0, 0.0)]
            timestamps, lo, hi = zip(*points)
            entry |= {
                "timestamps": list(timestamps),
                "lo": list(lo),
                "hi": list(hi),
            }
        else:
            points = db.get_metric(name, period, stat, spec["interval"])
            if not points:
                points = [(0.0, 0.0)]
            timestamps, values = zip(*points)
            entry |= {
                "timestamps": list(timestamps),
                "values": list(values),
            }
        series.append(entry)
    return {"interval": spec["interval"], "series": series}


def pretty_print_table(db, period: str, file=None) -> None:
    """Aligned debug dump of one period table, ordered by (path, time)
    (reference daemon.py:219-229)."""
    rows = (
        db.period_table(period)
        .orderBy("path", "timestamp")
        .collect()
    )
    print("---", period, file=file)
    stats = ["n", "min", "max", "avg", "sum", "p50", "p90", "p99"]
    header = f"{'path':<12} {'timestamp':<27}" + "".join(f" {s:>8}" for s in stats)
    print(header, file=file)
    for r in rows:
        ts = _dt.datetime.fromtimestamp(r.timestamp, _dt.timezone.utc)
        vals = "".join(f" {getattr(r, s):8.1f}" for s in stats)
        print(f"{r.path:<12} {str(ts):<27}{vals}", file=file)
    print(file=file)


def create_app(db):
    """Flask app over the data layer — import-gated (Flask is optional)."""
    try:
        from flask import Flask, jsonify, request
    except ImportError as e:  # pragma: no cover
        raise ImportError("the web app requires flask") from e

    app = Flask("smalltsdb_spark")

    @app.route("/")
    def index():
        return jsonify({"metrics": db.list_metrics()})

    @app.route("/graph")
    def graph():
        args = dict(request.args)
        fmt = args.pop("format", "json")
        data = graph_data(db, args)
        if fmt in ("svg", "html"):
            from smalltsdb_spark.graph import render_graph_html, render_graph_svg

            if fmt == "svg":
                return app.response_class(
                    render_graph_svg(data), mimetype="image/svg+xml"
                )
            # served page gets the pan/zoom layer (gestures re-fetch a
            # server-rendered SVG with an adjusted start/end interval)
            return render_graph_html(data, interactive=True)
        start, end = data["interval"]
        data["interval"] = [str(start), str(end)]
        return jsonify(data)

    return app
