"""JSON static-API sink (reference: exporters/json_api_exporter.py:305-988).

Writes one detail JSON per entity plus paginated index files.  Detail files
are written from the executors via ``foreachPartition`` (no driver
bottleneck — at 1e6 entities the write parallelizes across the cluster);
index pages are small and assembled on the driver from a projected/sorted
DataFrame.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("json_api_exporter", PluginType.EXPORTER)
def export_json_api(results: DataFrame, id_col: str, out_dir: str,
                    detail_subdir: str = "detail", page_size: int = 100,
                    index_fields: list[str] | None = None,
                    index_filter: str | None = None) -> dict:
    """Write ``<out_dir>/<detail_subdir>/<id>.json`` per row + paginated
    ``index_p<N>.json``.  ``index_filter`` restricts the index (not the
    detail files) through the explorer predicate grammar — the reference's
    index_generator declarative filters (index_generator.py:315-325).
    Returns a small manifest dict."""
    if index_filter:
        from niamoto_spark.plans.explorer import validate_predicate

        validate_predicate(index_filter, set(results.columns))
    detail_dir = os.path.join(out_dir, detail_subdir)
    os.makedirs(detail_dir, exist_ok=True)

    payload = results.select(F.col(id_col).alias("__id"),
                             F.to_json(F.struct(*results.columns)).alias("__doc"))

    # foreachPartition writes to a LOCAL path — only valid when executors
    # share the driver's filesystem (local mode / shared mount).  On a real
    # cluster, stream through the driver instead (toLocalIterator bounds
    # memory to one partition); swapping in a Hadoop-FS writer re-enables
    # the distributed path against shared storage.
    master = results.sparkSession.conf.get("spark.master", "")
    distributed_fs_ok = master.startswith("local")

    def write_partition(rows):
        for r in rows:
            # widget columns hold JSON strings (the reference's group-table
            # model); parse them so detail docs nest real objects
            # (reference json_api_exporter.py:872-883)
            doc = json.loads(r["__doc"])
            for k, v in doc.items():
                if isinstance(v, str) and v[:1] in "{[":
                    try:
                        doc[k] = json.loads(v)
                    except (ValueError, TypeError):
                        pass
            with open(os.path.join(detail_dir, f"{r['__id']}.json"), "w") as f:
                json.dump(doc, f)

    if distributed_fs_ok:
        payload.foreachPartition(write_partition)
    else:
        write_partition(payload.toLocalIterator())

    idx_cols = index_fields or [id_col]
    idx_src = results.filter(index_filter) if index_filter else results
    index_rows = [r.asDict() for r in
                  idx_src.select(*idx_cols).orderBy(id_col).collect()]
    n_pages = max(math.ceil(len(index_rows) / page_size), 1)
    for p in range(n_pages):
        page = {
            "page": p + 1,
            "total_pages": n_pages,
            "total": len(index_rows),
            "items": index_rows[p * page_size:(p + 1) * page_size],
        }
        with open(os.path.join(out_dir, f"index_p{p+1}.json"), "w") as f:
            json.dump(page, f, default=str)
    return {"entities": len(index_rows), "pages": n_pages, "out_dir": out_dir}
