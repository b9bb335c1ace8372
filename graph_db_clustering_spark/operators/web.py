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


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) evaluation
# ---------------------------------------------------------------------------


def parse_robots_rules(text: str) -> dict:
    """Parse a robots.txt body into {user_agent_token: [(allow, path), ...]}
    per RFC 9309: groups are runs of user-agent lines followed by rules;
    a rule line before any user-agent line is ignored; tokens and field
    names are case-insensitive; empty Disallow means allow-everything
    (contributes no rule). Unknown fields (crawl-delay, sitemap, host)
    are skipped without ending a group — the RFC 9309 §2.2.4 behavior
    most crawlers honor. Returns rules in file order (matching applies
    longest-match, so order only breaks exact ties the RFC leaves open;
    this parser keeps first-wins for identical patterns)."""
    groups: dict[str, list] = {}
    current: list[str] = []
    rules_started = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_started:
                current = []
                rules_started = False
            tok = value.lower()
            current.append(tok)
            groups.setdefault(tok, [])
        elif field in ("allow", "disallow"):
            rules_started = True
            if not current:
                continue  # rule before any user-agent: ignored
            if field == "disallow" and value == "":
                continue  # empty Disallow = allow everything
            if field == "allow" and value == "":
                continue
            for tok in current:
                groups[tok].append((field == "allow", value))
        # other fields: skipped, group continues
    return groups


def _robots_pattern_matches(pattern: str, path: str) -> int:
    """RFC 9309 path matching: '*' matches any run (incl. empty), '$'
    at the end anchors. Returns the MATCH PRIORITY (number of pattern
    characters, the RFC's longest-match measure) + 1, or 0 for no
    match — so callers can max() over rules directly."""
    import re as _re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else _re.escape(ch) for ch in body)
    rx = "^" + rx + ("$" if anchored else "")
    return (len(pattern) + 1) if _re.match(rx, path) else 0


def robots_decision(groups: dict, agent: str, path: str) -> bool:
    """True = fetch allowed. Group selection per RFC 9309 §2.2.1: the
    group whose user-agent token is the longest case-insensitive
    substring-prefix match of the product token, else the '*' group,
    else allow. Within the group: longest-match rule wins; on a
    priority tie, Allow wins."""
    agent = agent.lower()
    best_tok, best_len = None, -1
    for tok in groups:
        if tok == "*":
            continue
        if tok in agent and len(tok) > best_len:
            best_tok, best_len = tok, len(tok)
    rules = groups.get(best_tok if best_tok is not None else "*", None)
    if rules is None:
        rules = groups.get("*", [])
    best_pri, best_allow = 0, True
    for allow, pattern in rules:
        pri = _robots_pattern_matches(pattern, path)
        if pri > best_pri or (pri == best_pri and pri > 0 and allow and not best_allow):
            best_pri, best_allow = pri, allow
    return best_allow if best_pri > 0 else True


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str,
    url_col: str = "url",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Evaluate every URL against its host's robots.txt (RFC 9309):
    adds a boolean `allowed` column. `urls` must carry url_col and
    host_col; `robots` is one row per host (host_col, body_col).

    Plan: the robots side is host-keyed and tiny relative to the URL
    corpus — the join broadcasts when small (AQE's call); parsing is
    memoized PER PANDAS BATCH via a host->rules dict, so a batch with
    one hot host parses its robots.txt once, not per row. The matcher
    is pure Python over Arrow batches (regex per rule) — the right
    trade for a control-plane decision that gates the actual fetch
    I/O."""
    import pandas as pd

    joined = urls.join(robots.select(host_col, body_col), host_col, "left")
    cols = joined.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in joined.schema.fields
        if f.name != body_col
    ) + ", allowed boolean"

    def evaluate(batches):
        for pdf in batches:
            cache: dict = {}
            out_allowed = []
            for body, url in zip(pdf[body_col], pdf[url_col]):
                if body is None:
                    out_allowed.append(True)  # no robots.txt = allowed
                    continue
                if body not in cache:
                    cache[body] = parse_robots_rules(body)
                path = "/" + url.split("://", 1)[-1].split("/", 1)[-1] if "/" in url.split("://", 1)[-1] else "/"
                out_allowed.append(robots_decision(cache[body], agent, path))
            out = pdf.drop(columns=[body_col])
            out["allowed"] = pd.Series(out_allowed, dtype="boolean")
            yield out

    return joined.mapInPandas(evaluate, schema)
