"""Web-corpus URL handling: canonicalization and domain extraction.

Training-data pipelines over web crawls (C4, RefinedWeb, CCNet shapes)
dedup and mix BY URL: the same page is fetched under dozens of
spellings (tracking params, fragments, default ports, www aliases),
and corpus-mix decisions are made per registrable domain.  The
reference engine has no web lane; this extends the engine's
training-data surface (SURVEY §6) alongside text.py / curation.py.

Everything here is pure Catalyst codegen (regexp + higher-order array
functions) — no UDFs, so the normalization runs JVM-side at full scan
speed and a DuckDB oracle can replay it expression-for-expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

# Query parameters that identify a CLICK, not a page: stripping them is
# what collapses campaign-tagged duplicates of the same document.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|igshid)="


@register("url_normalize", PluginType.TRANSFORMER)
def url_normalize(df: DataFrame, url_col: str,
                  strip_www: bool = True) -> DataFrame:
    """Canonicalize a URL column for dedup/mixing:

    - scheme and host lowercased; default ports (:80, :443) dropped
    - fragment dropped ('#...' never reaches the server)
    - tracking query params removed (utm_*, gclid, fbclid, ...)
    - surviving query params SORTED (param order is transport noise)
    - trailing slash on a bare path dropped; 'www.' prefix optionally
    - ``domain``: naive registrable domain = last two host labels
      (a public-suffix list upgrade slots in here; two-label is the
      standard first approximation and exact for .com/.org/.net)

    Appends ``url_norm``, ``host``, ``domain``.  One projection, zero
    shuffles — this is scan-speed work that belongs fused into the
    ingest pass, not a separate job."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")          # fragment
    hp_path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.when(rest.contains("?"),
                   F.regexp_replace(rest, r"^[^?]*\?", "")).otherwise("")
    host = F.lower(F.regexp_extract(hp_path, r"^([^/]*)", 1))
    host = F.regexp_replace(host, r":(80|443)$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(hp_path, r"^[^/]*", "")
    path = F.regexp_replace(path, r"/$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    qnorm = F.array_join(F.array_sort(params), "&")
    url_norm = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(""))
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return (df.withColumn("url_norm", url_norm)
            .withColumn("host", host)
            .withColumn("domain", domain))


@register("domain_mix", PluginType.TRANSFORMER)
def domain_mix(df: DataFrame, url_col: str, weight_col: str | None = None,
               round_dp: int = 4) -> DataFrame:
    """Corpus composition by registrable domain: doc count, distinct
    canonical URLs (exact URL-level dedup signal: docs − distinct =
    campaign-duplicate mass), and share of corpus — the table a data
    curator reads before setting per-domain sampling rates.

    One normalize projection + one aggregate; ``weight_col`` (e.g.
    token counts) switches shares from doc-mass to token-mass."""
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    normed = url_normalize(df, url_col).withColumn("__w", w)
    per = (normed.groupBy("domain")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("url_norm").alias("n_urls"),
                F.sum("__w").alias("__mass")))
    total = per.agg(F.sum("__mass").alias("__tot"))
    return (per.crossJoin(F.broadcast(total))
            .select("domain", "n_docs", "n_urls",
                    F.round(F.col("__mass") / F.col("__tot"), round_dp)
                    .alias("share")))


def ipv4_to_long(col) -> "F.Column":
    """Dotted-quad IPv4 -> uint32-as-long, pure codegen (split +
    shifts); malformed addresses (wrong shape or octet > 255) yield
    NULL, never a runtime cast error on a dirty log line."""
    valid = col.rlike(
        r"^(25[0-5]|2[0-4]\d|1?\d?\d)(\.(25[0-5]|2[0-4]\d|1?\d?\d)){3}$")
    p = F.split(col, r"\.")
    num = (F.element_at(p, 1).cast("long") * 16_777_216
           + F.element_at(p, 2).cast("long") * 65_536
           + F.element_at(p, 3).cast("long") * 256
           + F.element_at(p, 4).cast("long"))
    return F.when(valid, num)


@register("ip_range_join", PluginType.TRANSFORMER)
def ip_range_join(df: DataFrame, ip_col: str, ranges: DataFrame,
                  start_col: str = "ip_start", end_col: str = "ip_end",
                  how: str = "left") -> DataFrame:
    """Geo-IP-style enrichment: map each row's IPv4 address into a
    [start, end] range table (country/ASN/datacenter blocks) — the
    classic range-join that a naive theta-join turns into
    rows × ranges.

    Here the ranges table is the SMALL side by construction (even a
    full GeoIP DB is ~3M rows), so the plan is a broadcast
    nested-loop on (ip >= start AND ip <= end) — each executor scans
    its fact partition once against the in-memory range list; no
    shuffle of the fact table at all.  At larger range tables the
    interval_join bucketing lane applies; this operator is the
    broadcast fast path.  Appends ``ip_num`` and the range table's
    label columns."""
    ipn = ipv4_to_long(F.col(ip_col))
    fact = df.withColumn("ip_num", ipn)
    cond = ((F.col("ip_num") >= F.col(start_col))
            & (F.col("ip_num") <= F.col(end_col)))
    return (fact.join(F.broadcast(ranges), cond, how)
            .drop(start_col, end_col))


ACCESS_LOG_RE = (r'^(\S+) (\S+) (\S+) \[([^\]]+)\] '
                 r'"(\S+) (\S+) ([^"]*)" (\d{3}) (\d+|-)')


@register("parse_access_log", PluginType.TRANSFORMER)
def parse_access_log(df: DataFrame, line_col: str) -> DataFrame:
    """Parse Common/Combined-Log-Format lines (the web-server ingest
    everyone writes first): ip, identd, user, timestamp text, method,
    path, protocol, status, bytes — one regexp projection, pure
    codegen, NULL-safe on garbage lines (unmatched groups come back
    empty -> nulled).

    Bytes '-' (no body) maps to 0, the standard convention.  Appends
    typed columns; combine with ipv4_to_long / ip_range_join for the
    full access-log enrichment lane."""
    line = F.col(line_col)

    def g(i):
        return F.regexp_extract(line, ACCESS_LOG_RE, i)

    matched = line.rlike(ACCESS_LOG_RE)
    return (df.withColumn("ip", F.when(matched, g(1)))
            .withColumn("http_user", F.when(matched & (g(3) != "-"),
                                            g(3)))
            .withColumn("ts_text", F.when(matched, g(4)))
            .withColumn("method", F.when(matched, g(5)))
            .withColumn("path", F.when(matched, g(6)))
            .withColumn("status", F.when(matched, g(8).cast("int")))
            .withColumn("bytes_sent",
                        F.when(matched,
                               F.when(g(9) == "-", F.lit(0))
                               .otherwise(g(9).cast("long")))))
