"""Spark Python Data Source (Spark 4 `pyspark.sql.datasource` API) for
manifest-committed tables: ``spark.read.format("manifest_table")`` and
``spark.readStream.format("manifest_table")``.

Why a DataSource and not just ``manifest.read_table``: the DataSource
contract plugs the table format into EVERYTHING that takes a format
string — SQL ``CREATE TABLE ... USING``, streaming queries with
checkpointed offsets, and third-party tooling — without the caller
importing this library's API.  It is also the idiomatic Spark-4 shape
for a custom table format (the same slot DSv2 fills on the JVM side).

Scale design:
- batch: ONE InputPartition per committed parquet file -> file-level
  parallelism across executors; rows travel as Arrow RecordBatches
  (zero row-at-a-time Python).  The pyarrow scan reads only the
  declared schema's columns; Spark-side projection pruning below that
  is not yet plumbed through the Python DS API — callers that need
  scan-level pruning at scale should keep using manifest.read_table
  (native parquet scan, full pushdown).
- streaming: offsets are manifest VERSIONS (the natural exactly-once
  unit — a version's file set is immutable); a micro-batch is the file
  DIFF between two committed versions, again one partition per file.
  Aborted/pending transaction versions (sources/transactions.py) are
  never exposed: offsets advance only along committed_version.

Options: ``path`` (required), ``version`` (batch time travel),
``startingVersion`` (streaming: replay from a historical version;
default = only commits after the stream starts)."""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)
from pyspark.sql.types import StructType

from niamoto_spark.sources import manifest as M


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


def _arrow_schema(path: str, version: int | None):
    import pyarrow.parquet as pq

    v = M.committed_version(path) if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no committed snapshot at {path}")
    doc = M._read_manifest(path, v)
    # This source hands Spark the raw parquet files; a deletion-vector
    # snapshot read that way would resurrect MOR-deleted rows.
    M._dv_guard(doc, "manifest_table datasource")
    files = doc["files"]
    if not files:
        raise ValueError(f"empty snapshot v{v} at {path}")
    return pq.read_schema(files[0]), v, files


def _read_file_batches(file_path: str, columns: list[str] | None
                       ) -> Iterator["object"]:
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(file_path)
    yield from pf.iter_batches(columns=columns)


def _file_survives(file_stats: dict, ranges: dict[str, list]) -> bool:
    """Zone-map superset test against folded filter ranges — identical
    comparison domain to manifest.read_table_pruned (widened canonical
    encoding; incomparable or missing stats read conservatively)."""
    def comparable(a, b):
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return True
        return isinstance(a, str) and isinstance(b, str)

    for col, (lo, hi) in ranges.items():
        s = file_stats.get(col)
        if s is None:
            continue
        clo = M._canon_stat(lo, widen=-1) if lo is not None else None
        chi = M._canon_stat(hi, widen=+1) if hi is not None else None
        if clo is not None and comparable(s[1], clo) and s[1] < clo:
            return False
        if chi is not None and comparable(s[0], chi) and s[0] > chi:
            return False
    return True


class ManifestDataSource(DataSource):
    """USING manifest_table — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "manifest_table"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options["path"]
        version = self.options.get("version")
        arrow_schema, _, _ = _arrow_schema(
            path, int(version) if version is not None else None)
        return from_arrow_schema(arrow_schema)

    def reader(self, schema: StructType) -> "ManifestBatchReader":
        return ManifestBatchReader(self.options, schema)

    def streamReader(self, schema: StructType) -> "ManifestStreamReader":
        return ManifestStreamReader(self.options, schema)


class ManifestBatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = options["path"]
        version = options.get("version")
        self.version = int(version) if version is not None else None
        self.columns = list(schema.fieldNames())
        self._ranges: dict[str, list] = {}  # col -> [lo, hi] (None=open)

    def pushFilters(self, filters):
        """Fold pushed comparison filters into per-column ranges and use
        the manifest's zone maps (append_with_stats) to SKIP whole files
        at planning time.  Every filter is returned UNCONSUMED: zone-map
        skipping is a superset test, Spark's re-evaluation keeps row-
        level semantics exact (the same contract as
        manifest.read_table_pruned)."""
        from pyspark.sql.datasource import (EqualTo, GreaterThan,
                                            GreaterThanOrEqual, In,
                                            LessThan, LessThanOrEqual)

        def narrow(col, lo=None, hi=None):
            r = self._ranges.setdefault(col, [None, None])
            if lo is not None and (r[0] is None or lo > r[0]):
                r[0] = lo
            if hi is not None and (r[1] is None or hi < r[1]):
                r[1] = hi

        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            if isinstance(f, EqualTo):
                narrow(col, f.value, f.value)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                narrow(col, lo=f.value)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                narrow(col, hi=f.value)
            elif isinstance(f, In) and f.values:
                try:
                    narrow(col, min(f.values), max(f.values))
                except TypeError:
                    pass
        return filters  # all residual: skipping is only ever a superset

    def partitions(self) -> Sequence[InputPartition]:
        _, v, files = _arrow_schema(self.path, self.version)
        doc = M._read_manifest(self.path, v)
        stats = doc.get("stats", {})
        keep = [f for f in files
                if _file_survives(stats.get(f, {}), self._ranges)]
        return [_FilePartition(f) for f in keep]

    def read(self, partition: "_FilePartition | None"):
        # an empty partitions() result reaches read() as a single None
        # partition (API fallback) — every file was zone-map-skipped
        if partition is None:
            return
        yield from _read_file_batches(partition.file_path, self.columns)


class ManifestStreamReader(DataSourceStreamReader):
    """Micro-batch = files added between two committed versions.

    The offset dict is {"version": N}.  Version N's file list is
    immutable once committed, so replaying [start, end] after a crash
    yields byte-identical batches — exactly-once with any idempotent
    sink.  latestOffset only ever returns committed_version: claims of
    in-flight multi-table transactions are invisible to streams exactly
    as they are to batch readers."""

    def __init__(self, options, schema: StructType):
        self.path = options["path"]
        self.columns = list(schema.fieldNames())
        start = options.get("startingVersion")
        self._start = int(start) if start is not None else None

    def initialOffset(self) -> dict:
        if self._start is not None:
            return {"version": self._start - 1}
        return {"version": M.committed_version(self.path)}

    def latestOffset(self) -> dict:
        return {"version": M.committed_version(self.path)}

    def _files_between(self, start_v: int, end_v: int) -> list[str]:
        if end_v < 0 or end_v <= start_v:
            return []
        end_doc = M._read_manifest(self.path, end_v)
        # added-files batches scan raw parquet; a DV landing in the
        # range would silently resurrect its deleted rows downstream
        M._dv_guard(end_doc, "manifest_table stream")
        new = set(end_doc["files"])
        old = (set(M._read_manifest(self.path, start_v)["files"])
               if start_v >= 0 else set())
        return sorted(new - old)

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[InputPartition]:
        return [_FilePartition(f) for f in
                self._files_between(start["version"], end["version"])]

    def read(self, partition: _FilePartition):
        yield from _read_file_batches(partition.file_path, self.columns)

    def commit(self, end: dict) -> None:
        pass  # progress lives in the stream's checkpoint, not the table

    def stop(self) -> None:
        pass


def register(spark) -> None:
    """Idempotently register the data source with a session (and enable
    Python-DS filter pushdown, which guards the pushFilters path and is
    off by default)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ManifestDataSource)
