"""Entity registry ("catalog").

The reference persists an entity registry inside its DB: rows of
``name, kind, table_name, config(JSON)`` (reference:
src/niamoto/core/imports/registry.py:16-131), and every plugin resolves
logical -> physical names through it (base.py:64-92).

Here the registry is a small JSON document mapping entity name to storage
path + format + id_field + kind + links, and ``load()`` returns Spark
DataFrames.  On a cluster the same file lives on shared storage (or the
mapping moves into a Delta table); nothing else changes.
"""

from __future__ import annotations

import enum
import json
import os
from dataclasses import dataclass, field
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


class EntityKind(str, enum.Enum):
    # Same three kinds as the reference (registry.py:16-30).
    DATASET = "dataset"          # fact tables (occurrences / lineitem)
    REFERENCE = "reference"      # hierarchical refs (taxonomy / plots)
    SPATIAL = "spatial"          # shapes / vector layers


@dataclass
class EntityLink:
    """FK declaration between entities (import.yml `links`)."""
    field: str
    references: str          # target entity name
    ref_field: str


@dataclass
class Entity:
    name: str
    kind: EntityKind
    path: str
    format: str = "parquet"
    id_field: str = "id"
    links: list[EntityLink] = field(default_factory=list)
    options: dict = field(default_factory=dict)


class EntityRegistry:
    def __init__(self, entities: Iterable[Entity] = ()):
        self._entities: dict[str, Entity] = {}
        for e in entities:
            self.add(e)

    def add(self, entity: Entity) -> None:
        self._entities[entity.name] = entity

    def get(self, name: str) -> Entity:
        try:
            return self._entities[name]
        except KeyError:
            raise KeyError(
                f"unknown entity {name!r}; known: {sorted(self._entities)}"
            ) from None

    def names(self) -> list[str]:
        return sorted(self._entities)

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        e = self.get(name)
        reader = spark.read
        if e.format == "parquet":
            return reader.parquet(e.path)
        if e.format == "csv":
            opts = {"header": "true", "inferSchema": "true", **e.options}
            return reader.options(**opts).csv(e.path)
        if e.format == "json":
            return reader.json(e.path)
        raise ValueError(f"unsupported format {e.format!r} for entity {name}")

    # -- persistence ------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                n: {
                    "kind": e.kind.value,
                    "path": e.path,
                    "format": e.format,
                    "id_field": e.id_field,
                    "links": [vars(l) for l in e.links],
                    "options": e.options,
                }
                for n, e in self._entities.items()
            },
            indent=2,
            sort_keys=True,
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def from_json(cls, text: str) -> "EntityRegistry":
        reg = cls()
        for name, spec in json.loads(text).items():
            reg.add(
                Entity(
                    name=name,
                    kind=EntityKind(spec["kind"]),
                    path=spec["path"],
                    format=spec.get("format", "parquet"),
                    id_field=spec.get("id_field", "id"),
                    links=[EntityLink(**l) for l in spec.get("links", [])],
                    options=spec.get("options", {}),
                )
            )
        return reg

    @classmethod
    def open(cls, path: str) -> "EntityRegistry":
        with open(path) as f:
            return cls.from_json(f.read())


# TPC-H-ish testdata id fields (TESTDATA.md); used by tests and the entry
# module to build a registry over a scale-factor directory.
_TESTDATA_IDS = {
    "region": ("r_regionkey", EntityKind.REFERENCE),
    "nation": ("n_nationkey", EntityKind.REFERENCE),
    "customer": ("c_custkey", EntityKind.DATASET),
    "supplier": ("s_suppkey", EntityKind.REFERENCE),
    "part": ("p_partkey", EntityKind.REFERENCE),
    "orders": ("o_orderkey", EntityKind.DATASET),
    "lineitem": ("l_orderkey", EntityKind.DATASET),
    "events": ("event_id", EntityKind.DATASET),
    "documents": ("doc_id", EntityKind.DATASET),
    "embeddings": ("vec_id", EntityKind.DATASET),
}


def testdata_registry(sf_dir: str) -> EntityRegistry:
    reg = EntityRegistry()
    for name, (id_field, kind) in _TESTDATA_IDS.items():
        p = os.path.join(sf_dir, f"{name}.parquet")
        reg.add(Entity(name=name, kind=kind, path=p, id_field=id_field))
    reg.get("nation").links.append(
        EntityLink(field="n_regionkey", references="region", ref_field="r_regionkey"))
    reg.get("customer").links.append(
        EntityLink(field="c_nationkey", references="nation", ref_field="n_nationkey"))
    reg.get("orders").links.append(
        EntityLink(field="o_custkey", references="customer", ref_field="c_custkey"))
    reg.get("lineitem").links.append(
        EntityLink(field="l_orderkey", references="orders", ref_field="o_orderkey"))
    return reg
