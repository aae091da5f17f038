"""Humboldt Extension event projection (reference:
transformers/formats/niamoto_to_humboldt_event.py:31-63).

Like the DwC occurrence converter, this is a declarative term mapping
compiled to one Spark select — events (inventory/sampling metadata) instead
of occurrences.  Shares the @source.field / generator DSL with
exporters.dwc."""

from __future__ import annotations

from pyspark.sql import DataFrame

from niamoto_spark.exporters.dwc import to_dwc_occurrence
from niamoto_spark.registry import PluginType, register

# canonical Humboldt event terms the reference maps (subset)
HUMBOLDT_TERMS = (
    "eventID", "parentEventID", "eventType", "samplingProtocol",
    "sampleSizeValue", "sampleSizeUnit", "eventDate", "locationID",
    "decimalLatitude", "decimalLongitude", "siteCount", "verbatimSiteNames",
)


@register("niamoto_to_humboldt_event", PluginType.TRANSFORMER)
def to_humboldt_event(df: DataFrame, mapping: dict[str, object],
                      **kwargs) -> DataFrame:
    """Project source rows to Humboldt event terms per the mapping DSL
    (same compiler as the DwC occurrence exporter; kwargs forward the
    taxon-join options)."""
    return to_dwc_occurrence(df, mapping, **kwargs)
