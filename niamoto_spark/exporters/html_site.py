"""HTML static-site sink (reference: exporters/html_page_exporter.py:
440-707) — Jinja2 rendering of per-entity pages + an index from the group
results table.

Site generation is presentation, not Spark work (SURVEY §2.1): widget JSON
is already computed; rendering happens on the driver over collected rows,
exactly like the reference.  Kept deliberately small: default templates
render each widget JSON column as a section; custom templates can be passed
by path."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from niamoto_spark.registry import PluginType, register

_DETAIL_TMPL = """<!doctype html><html><head><meta charset="utf-8">
<title>{{ group }} {{ entity_id }}</title></head><body>
<h1>{{ group }} — {{ entity_id }}</h1>
{% for name, payload in widgets %}
<section><h2>{{ name }}</h2><pre>{{ payload }}</pre></section>
{% endfor %}
<a href="../index.html">index</a></body></html>"""

_INDEX_TMPL = """<!doctype html><html><head><meta charset="utf-8">
<title>{{ group }}</title></head><body><h1>{{ group }}</h1><ul>
{% for eid in ids %}<li><a href="detail/{{ eid }}.html">{{ eid }}</a></li>
{% endfor %}</ul></body></html>"""


@register("html_page_exporter", PluginType.EXPORTER)
def export_html_site(results: DataFrame, id_col: str, out_dir: str,
                     group_name: str = "entities",
                     detail_template: str | None = None,
                     index_template: str | None = None) -> dict:
    import jinja2

    env = jinja2.Environment(autoescape=True)
    detail_t = env.from_string(detail_template or _DETAIL_TMPL)
    index_t = env.from_string(index_template or _INDEX_TMPL)

    detail_dir = os.path.join(out_dir, "detail")
    os.makedirs(detail_dir, exist_ok=True)

    rows = results.orderBy(id_col).collect()
    ids = []
    for r in rows:
        d = r.asDict()
        eid = d.pop(id_col)
        ids.append(eid)
        widgets = []
        for name, payload in d.items():
            try:
                payload = json.dumps(json.loads(payload), indent=2)
            except (TypeError, ValueError):
                payload = str(payload)
            widgets.append((name, payload))
        with open(os.path.join(detail_dir, f"{eid}.html"), "w") as f:
            f.write(detail_t.render(group=group_name, entity_id=eid,
                                    widgets=widgets))
    with open(os.path.join(out_dir, "index.html"), "w") as f:
        f.write(index_t.render(group=group_name, ids=ids))
    return {"entities": len(ids), "out_dir": out_dir}
