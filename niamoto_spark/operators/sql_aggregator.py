"""database_aggregator — the raw-SQL escape hatch (reference:
transformers/aggregation/database_aggregator.py).

Semantics ported:
- named queries with reusable ``{param}`` templates (:26-108 models);
- SELECT-only validation + forbidden-keyword guard (:243-257, 358-373);
- output formats ``scalar / table / series / single_row`` (:111-126,
  :374-419: scalar -> single value, table -> list of dicts, series -> first
  column as list, single_row -> dict);
- Python computed fields over the query results via the AST-whitelisted
  safe-eval (:42-108) — evaluated driver-side over collected scalars, never
  inside executors.

The SQL runs through ``spark.sql`` against registered views, so Catalyst
optimizes it like any DataFrame plan.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession

from niamoto_spark.plans.guards import guard_select_only, safe_eval
from niamoto_spark.registry import PluginType, register

_PARAM_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")
_SAFE_PARAM_RE = re.compile(r"^[A-Za-z0-9_\.\- ]*$")


def render_template(template: str, params: Mapping[str, Any]) -> str:
    """Substitute ``{param}`` placeholders; values are restricted to
    identifier-ish strings/numbers (no quotes/semicolons) so substitution
    cannot smuggle SQL past the guard."""
    def sub(m: re.Match) -> str:
        key = m.group(1)
        if key not in params:
            raise KeyError(f"missing template param {key!r}")
        val = str(params[key])
        if not _SAFE_PARAM_RE.match(val):
            raise ValueError(f"unsafe template param value {val!r}")
        return val

    return _PARAM_RE.sub(sub, template)


@register("database_aggregator", PluginType.TRANSFORMER)
def database_aggregator(spark: SparkSession,
                        queries: Mapping[str, Mapping[str, Any]],
                        templates: Mapping[str, str] | None = None,
                        computed_fields: Mapping[str, str] | None = None,
                        ) -> dict[str, Any]:
    """Run named SELECT-only queries and assemble a result dict.

    ``queries``: name -> {sql | template+params, format}.
    ``computed_fields``: name -> safe-eval expression over prior results.
    """
    templates = templates or {}
    results: dict[str, Any] = {}
    for name, spec in queries.items():
        if "template" in spec:
            sql = render_template(templates[spec["template"]],
                                  spec.get("params", {}))
        else:
            sql = spec["sql"]
        guard_select_only(sql)
        df: DataFrame = spark.sql(sql)
        fmt = spec.get("format", "scalar")
        if fmt == "scalar":
            rows = df.limit(1).collect()
            results[name] = rows[0][0] if rows else None
        elif fmt == "single_row":
            rows = df.limit(1).collect()
            results[name] = rows[0].asDict() if rows else None
        elif fmt == "series":
            results[name] = [r[0] for r in df.collect()]
        elif fmt == "table":
            results[name] = [r.asDict() for r in df.collect()]
        else:
            raise ValueError(f"unknown format {fmt!r}")
    for name, expr in (computed_fields or {}).items():
        results[name] = safe_eval(expr, dict(results))
    return results
