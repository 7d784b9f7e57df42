"""Static HTML dashboard rendering — the presentation layer.

The reference renders its monitoring dashboard with ``displayHTML`` inside
a notebook (ref: 06_display_reporting.py:28-104 KPI cards, :107-301 the
nine report tables). Outside a notebook the equivalent artifact is a
self-contained static HTML page a pipeline can write next to its gold
tables (email it, serve it, archive it per run). This module renders one
from the report layer with ZERO dependencies — stdlib ``html`` escaping
and a small hand-written stylesheet, no templating engine.

Everything heavy stays in Spark: the renderer only ever touches the
report DataFrames' collected rows, and every report is either a bounded
aggregate or an explicit LIMIT (see pipeline/reports.py), so collecting
is control-plane by construction; ``max_rows`` guards the presentation
layer anyway. Values are HTML-escaped — a document title or region name
containing markup must render inert (tested).
"""

from __future__ import annotations

import html
from datetime import datetime, timezone

from pyspark.sql import DataFrame

from ..sources.warehouse import Warehouse
from . import reports

_CSS = """
body { font: 14px/1.4 system-ui, sans-serif; margin: 24px; color: #222; }
h1 { font-size: 22px; } h2 { font-size: 16px; margin-top: 28px; }
.cards { display: flex; flex-wrap: wrap; gap: 10px; }
.card { border: 1px solid #ccd; border-left: 5px solid #567; border-radius: 6px;
        padding: 10px 16px; min-width: 130px; }
.card.alert { border-left-color: #b33; }
.card .num { font-size: 22px; font-weight: 600; }
.card .cap { font-size: 11px; color: #667; letter-spacing: .05em; }
table { border-collapse: collapse; margin-top: 6px; }
th, td { border: 1px solid #dde; padding: 4px 10px; text-align: left; }
th { background: #f2f4f8; }
.meta { color: #889; font-size: 12px; margin-top: 30px; }
"""

# (kpi column, caption, alert?) — the reference's card row (ref: 06:60-99)
_KPI_CARDS = [
    ("total_earthquakes", "Total earthquakes", False),
    ("critical_events", "Critical (M7+)", True),
    ("high_risk_events", "High risk (M6+)", True),
    ("tsunami_events", "Tsunami potential", False),
    ("max_magnitude", "Max magnitude", False),
    ("avg_magnitude", "Avg magnitude", False),
    ("active_regions", "Active regions", False),
]


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:,.3f}".rstrip("0").rstrip(".")
    if isinstance(v, int):
        return f"{v:,}"
    return str(v)


def render_kpi_cards(kpi_row) -> str:
    """The KPI card strip from the single-row gold_kpi_summary."""
    cards = []
    for col, caption, alert in _KPI_CARDS:
        cls = "card alert" if alert else "card"
        cards.append(
            f'<div class="{cls}"><div class="num">{html.escape(_fmt(kpi_row[col]))}'
            f'</div><div class="cap">{html.escape(caption)}</div></div>'
        )
    return '<div class="cards">' + "".join(cards) + "</div>"


def render_table(df: DataFrame, title: str, *, max_rows: int = 50) -> str:
    """One report DataFrame as an escaped HTML table (bounded)."""
    rows = df.limit(max_rows).collect()
    cols = df.columns
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(_fmt(r[c]))}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    return (
        f"<h2>{html.escape(title)}</h2>"
        f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"
    )


def render_dashboard(wh: Warehouse, *, max_rows: int = 50, clock=None) -> str:
    """The full page: KPI cards + all nine report tables
    (ref: 06_display_reporting.py end-to-end)."""
    dfs = reports.run_all(wh)
    kpi = wh.spark.sql("SELECT * FROM gold_kpi_summary").collect()[0]
    now = (clock or datetime.now(timezone.utc)).strftime("%Y-%m-%d %H:%M UTC")
    sections = [render_table(df, name, max_rows=max_rows) for name, df in dfs.items()]
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>Seismic pipeline dashboard</title><style>{_CSS}</style></head>"
        "<body><h1>Seismic pipeline dashboard</h1>"
        + render_kpi_cards(kpi)
        + "".join(sections)
        + f'<div class="meta">rendered {html.escape(now)}</div>'
        "</body></html>"
    )


def save_dashboard(wh: Warehouse, path: str, **kw) -> str:
    """Render and write the page; returns the path."""
    page = render_dashboard(wh, **kw)
    with open(path, "w", encoding="utf-8") as f:
        f.write(page)
    return path
