"""transform_chain — ordered composition of transformers with @references
(reference: transformers/chains/transform_chain.py:200-317; @ref resolver
:147-198 supports dotted paths).

In the Spark rebuild a chain is a plain Python pipeline: each step's output
DataFrame is bound under its ``output_key`` and later steps reference prior
outputs with ``@key`` (whole DataFrame) — the reference's dict-path lookups
become column selections on the bound frame.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from pyspark.sql import DataFrame

from niamoto_spark.registry import PluginType, get_plugin, register


def resolve_ref(token: Any, bindings: Mapping[str, Any]) -> Any:
    """Resolve ``@key`` / ``@key.attr`` tokens against chain bindings."""
    if not (isinstance(token, str) and token.startswith("@")):
        return token
    path = token[1:].split(".")
    obj = bindings[path[0]]
    for part in path[1:]:
        if isinstance(obj, DataFrame):
            obj = obj.select(part)
        elif isinstance(obj, Mapping):
            obj = obj[part]
        else:
            obj = getattr(obj, part)
    return obj


@register("transform_chain", PluginType.TRANSFORMER)
def transform_chain(initial: Mapping[str, Any],
                    steps: list[dict]) -> dict[str, Any]:
    """Run ordered steps; each step: {plugin, output_key, params}.

    ``params`` values may be ``@refs`` into earlier outputs (or the initial
    bindings).  Returns the full binding map (inputs + all step outputs).
    """
    bindings: dict[str, Any] = dict(initial)
    for step in steps:
        plugin: Callable = step.get("func") or get_plugin(step["plugin"],
                                                          PluginType.TRANSFORMER)
        params = {k: resolve_ref(v, bindings) for k, v in step.get("params", {}).items()}
        args = [resolve_ref(a, bindings) for a in step.get("args", [])]
        bindings[step["output_key"]] = plugin(*args, **params)
    return bindings
