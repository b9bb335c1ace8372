"""Web/crawl-pipeline operators: URL canonicalization and URL-keyed dedup.

Crawl corpora (the WARC path, sources/warc) arrive keyed by URL, and the
same page surfaces under many spellings — case-varied hosts, default
ports, fragments, tracking parameters. Canonicalizing BEFORE content
dedup removes the cheap duplicate class with zero content comparison.

Everything here is codegen expression chains (regexp_extract /
regexp_replace / lower) — no Python per row, so a 100 TB URL column
canonicalizes inside whole-stage codegen.

Canonical form (documented contract, the common-denominator rules):
  - scheme and host lowercase (path/query case is significant, kept;
    userinfo is case-significant credentials, kept verbatim)
  - fragment stripped
  - default ports stripped (http:80, https:443)
  - tracking parameters dropped: utm_*, fbclid, gclid, msclkid, mc_eid
  - separator cleanup (?& -> ?, && -> &, trailing ?/&)
  - empty path before a query becomes '/'
Strings without a '<scheme>://' prefix pass through trimmed, unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_TRACKING = r"(?i)([?&])(?:utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid)=[^&#]*"


def url_host_expr(u: Column) -> Column:
    """Lowercased host (no port, no userinfo) of a URL column; '' for
    non-URLs."""
    hostport = F.regexp_extract(F.trim(u), _SCHEME + r"(?:[^/?#@]*@)?([^/?#]*)", 2)
    return F.lower(F.regexp_replace(hostport, r":\d*$", ""))


def url_canonicalize_expr(u: Column) -> Column:
    """Canonical URL as a pure expression chain (contract in the module
    docstring)."""
    t = F.trim(u)
    scheme = F.lower(F.regexp_extract(t, _SCHEME, 1))
    # userinfo is case-significant (credentials) — keep it verbatim and
    # lowercase only the host[:port] that follows it
    userinfo = F.regexp_extract(t, _SCHEME + r"([^/?#@]*@)", 2)
    hostport = F.lower(
        F.regexp_extract(t, _SCHEME + r"(?:[^/?#@]*@)?([^/?#]*)", 2)
    )
    rest = F.regexp_extract(t, _SCHEME + r"[^/?#]*([^#]*)", 2)

    # default ports are scheme-relative
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)

    # tracking params, then separator cleanup (the replace leaves the
    # leading ?/& of each removed param behind)
    rest = F.regexp_replace(rest, _TRACKING, "$1")
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    # '?q' with an empty path: give it the root path
    rest = F.when(rest.startswith("?"), F.concat(F.lit("/"), rest)).otherwise(rest)

    canon = F.concat(scheme, F.lit("://"), userinfo, hostport, rest)
    return F.when(scheme == "", t).otherwise(canon)


def canonicalize_urls(df: DataFrame, url_col: str) -> DataFrame:
    """Add `canonical_url` and `host` columns (one codegen projection)."""
    u = F.col(url_col)
    return df.withColumn("canonical_url", url_canonicalize_expr(u)).withColumn(
        "host", url_host_expr(u)
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """One row per canonical URL, keeping the lowest id — the pre-content
    dedup pass of a crawl pipeline. Single min(struct) hash aggregate
    with map-side partials (the exact_dedup plan shape), keyed on the
    canonical form so spelling variants collapse without any content
    comparison."""
    canon = url_canonicalize_expr(F.col(url_col)).alias("canonical_url")
    return (
        df.select(F.col(id_col).alias("keep_id"), canon)
        .groupBy("canonical_url")
        .agg(
            F.min("keep_id").alias("keep_id"),
            F.count("*").alias("n_variants"),
        )
        .select("keep_id", "canonical_url", "n_variants")
    )


def sitemap_urls(spark, path: str):
    """Sitemap XML -> (loc, lastmod, changefreq, priority), canonicalized.

    The crawl frontier's seed source: <urlset><url>... entries parse
    through the native XML reader (one row per <url>, explicit schema —
    no inference pass), then the URL canonicalization chain normalizes
    `loc` so frontier dedup keys match the corpus's canonical form.
    Sitemap INDEX files (<sitemapindex><sitemap>) read the same way with
    row_tag='sitemap'."""
    from pyspark.sql import types as T

    from graph_db_clustering_spark.sources.files import read_xml

    schema = T.StructType(
        [
            T.StructField("loc", T.StringType()),
            T.StructField("lastmod", T.StringType()),
            T.StructField("changefreq", T.StringType()),
            T.StructField("priority", T.DoubleType()),
        ]
    )
    urls = read_xml(spark, path, row_tag="url", schema=schema)
    return urls.select(
        url_canonicalize_expr(F.col("loc")).alias("loc"),
        "lastmod",
        "changefreq",
        "priority",
    )
