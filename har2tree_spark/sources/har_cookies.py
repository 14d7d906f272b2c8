"""Real-HAR cookie surface: per-entry sent/received cookies -> a flat
relational table + the reference's provenance / rollup joins.

The reference extracts cookies per entry while loading URLNodes
(reference nodes.py:508-539):

  * received  — ``response.cookies``: each cookie keys ``name=value``; its
    scope domain is the cookie's ``domain`` attribute (leading '.'
    stripped) when set, else the entry's hostname; it is THIRD-PARTY when
    the receiving entry's hostname does not end with that scope domain.
  * sent      — ``request.cookies``: each keys ``name=value``.

Two capture-level derivations follow (har2tree.py:343-380):

  * initial_cookies — the FIRST entry's sent cookies (the cookies handed
    to the browser before the capture started).
  * setter provenance — a sent cookie on entry N could have been set by
    any earlier entry that received the same ``name=value`` with a scope
    domain the sender's hostname ends with (har2tree.py:371-380).

and the HostNode rollup set-unions cookies per hostname
(nodes.py 'class HostNode': request_cookie / response_cookie /
third_party_cookies_received are the distinct-set sizes), which the
capture stats then union across hosts (har2tree.py:511-522
total_cookies_sent / total_cookies_received).

Re-grounded Spark-first: ``read_har_cookies`` is a flat distributed scan
(binaryFile -> mapInPandas, one row per cookie event);
``cookie_provenance`` is ONE doc_id-keyed equi-join on (doc_id, cookie)
with the time-order predicate applied as a theta filter — the real-input
instance of the engine's J8 as-of/theta join; ``host_cookie_rollup`` is
one groupBy with distinct-set aggregates — the real-input instance of the
A2/marker rollup.  Entry order is time order (the adapter pre-sorts by
startedDateTime), so span_idx stands in for the reference's strict
``start_time <`` comparison; ties in startedDateTime keep the entry
order, exactly like the reference's stable sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from har2tree_spark.sources.har_source import (
    _body_text,
    _dict,
    _doc_id_of,
    _load_har_bytes_safe,
    _norm,
    _sorted_entries,
)
from har2tree_spark.sources.urlkit import url_hostname as _hostname


def entry_cookies(entry: dict, hostname: str) -> list[dict]:
    """Cookie events for one HAR entry (nodes.py:508-539).  Returns dicts
    with (direction, cookie, domain, is_3rd_party); sent cookies carry the
    sender's hostname as domain and are never third-party-flagged (the
    reference only classifies received cookies)."""
    out: list[dict] = []
    received = _dict(entry.get("response")).get("cookies") or ()
    if isinstance(received, (list, tuple)):
        for c in received:
            if not isinstance(c, dict):
                continue
            domain = str(c.get("domain") or "") or hostname
            if domain.startswith("."):
                domain = domain[1:]
            out.append(
                {
                    "direction": "received",
                    "cookie": f"{c.get('name')}={c.get('value')}",
                    "domain": domain,
                    "is_3rd_party": not hostname.endswith(domain),
                }
            )
    sent = _dict(entry.get("request")).get("cookies") or ()
    if isinstance(sent, (list, tuple)):
        for c in sent:
            if not isinstance(c, dict):
                continue
            out.append(
                {
                    "direction": "sent",
                    "cookie": f"{c.get('name')}={c.get('value')}",
                    "domain": hostname,
                    "is_3rd_party": False,
                }
            )
    return out


def read_har_cookies(spark, path: str, pattern: str = "*.har") -> DataFrame:
    """Directory of HAR files -> one row per cookie event:
    (doc_id, span_idx, hostname, direction, cookie, domain, is_3rd_party,
    empty_response).

    span_idx aligns with the documents reader's span order (same pre-sort),
    so this table joins 1:1 against the parse/cascade output.  Distributed
    exactly like read_har_dir: binaryFile assigns files to tasks, the
    per-file walk runs in one Arrow batch."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("span_idx", T.IntegerType(), False),
            T.StructField("hostname", T.StringType(), True),
            T.StructField("direction", T.StringType(), False),
            T.StructField("cookie", T.StringType(), False),
            T.StructField("domain", T.StringType(), True),
            T.StructField("is_3rd_party", T.BooleanType(), False),
            T.StructField("empty_response", T.BooleanType(), False),
        ]
    )
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    cols = [f.name for f in schema.fields]

    def run(batches):
        for pdf in batches:
            rows = []
            for p, c in zip(pdf["path"].tolist(), pdf["content"].tolist()):
                doc_id = _doc_id_of(p, path)
                for i, e in enumerate(_sorted_entries(_load_har_bytes_safe(c))):
                    raw_url = str(_dict(e.get("request")).get("url", "") or "")
                    if not raw_url:
                        continue
                    host = _hostname(_norm(raw_url))
                    empty = not _body_text(e)
                    rows.extend(
                        {
                            "doc_id": doc_id,
                            "span_idx": i,
                            "hostname": host,
                            "empty_response": empty,
                            **ck,
                        }
                        for ck in entry_cookies(e, host)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(run, schema=schema)


def initial_cookies(cookies: DataFrame, features: DataFrame) -> DataFrame:
    """(doc_id, cookie): the ROOT entry's sent cookies — the reference's
    initial_cookies (har2tree.py:343-346, keyed 'name=value' like
    nodes.py:539).  The root is the doc's first live span (root_idx from
    the parse output), not blindly span 0 — ignored entries are skipped in
    the reference's node list too."""
    roots = (
        features.filter(F.col("span_idx").isNotNull() & (F.col("n_live") > 0))
        .select("doc_id", "root_idx")
        .dropDuplicates(["doc_id"])
    )
    return (
        cookies.filter(F.col("direction") == "sent")
        .join(roots, ["doc_id"])
        .filter(F.col("span_idx") == F.col("root_idx"))
        .select("doc_id", "cookie")
        .dropDuplicates()
    )


def cookie_provenance(cookies: DataFrame) -> DataFrame:
    """(doc_id, span_idx, cookie, setter_idx, setter_domain, is_3rd_party):
    every (sender, possible setter) pair — the reference's setter
    cross-reference (har2tree.py:371-380): a sent cookie links to each
    EARLIER entry that received the same name=value with a scope domain
    the sender's hostname ends with.

    One equi-join on (doc_id, cookie) — the high-selectivity key — with
    the domain-suffix + ordering predicates as theta filters on the joined
    rows; doc_id co-partitioning keeps it in the pipeline's standard hash
    layout at scale (the J8 pattern on real input).

    Deliberate deviation (r7 ADVICE #5): the time-order predicate is
    ``setter_idx < span_idx`` (entry order), while the reference compares
    ``start_time`` strictly (har2tree.py:382) — entries sharing an
    identical startedDateTime therefore produce setter pairs here that
    the reference's strict-< excludes. Entry order IS startedDateTime
    order (the adapter pre-sorts), so the two differ only on exact
    timestamp ties, where entry order is the deterministic refinement."""
    sent = cookies.filter(F.col("direction") == "sent").select(
        "doc_id", "span_idx", "cookie", "hostname"
    )
    recv = cookies.filter(F.col("direction") == "received").select(
        "doc_id",
        F.col("span_idx").alias("setter_idx"),
        "cookie",
        F.col("domain").alias("setter_domain"),
        "is_3rd_party",
    )
    return (
        sent.join(recv, ["doc_id", "cookie"])
        .filter(
            F.col("hostname").endswith(F.col("setter_domain"))
            & (F.col("setter_idx") < F.col("span_idx"))
        )
        .select(
            "doc_id",
            "span_idx",
            "cookie",
            "setter_idx",
            "setter_domain",
            "is_3rd_party",
        )
    )


def host_cookie_rollup(cookies: DataFrame) -> DataFrame:
    """(doc_id, hostname, request_cookie, response_cookie,
    third_party_cookies_received): the HostNode cookie rollup — distinct
    sent cookies, distinct received (domain, cookie, 3rd) triples, and the
    distinct third-party subset, set-unioned per hostname (reference
    nodes.py HostNode.request_cookie/response_cookie/
    third_party_cookies_received)."""
    sent = F.when(F.col("direction") == "sent", F.col("cookie"))
    triple = F.when(
        F.col("direction") == "received",
        F.concat_ws(" ", "domain", "cookie", F.col("is_3rd_party").cast("string")),
    )
    third = F.when(
        (F.col("direction") == "received") & F.col("is_3rd_party"), triple
    )
    return cookies.groupBy("doc_id", "hostname").agg(
        F.count_distinct(sent).cast("long").alias("request_cookie"),
        F.count_distinct(triple).cast("long").alias("response_cookie"),
        F.count_distinct(third).cast("long").alias("third_party_cookies_received"),
    )


def capture_cookie_totals(cookies: DataFrame) -> DataFrame:
    """(doc_id, total_cookies_sent, total_cookies_received): the capture
    stats' cookie terms — capture-wide distinct sent cookies and distinct
    received triples (har2tree.py:511-522; the union over host nodes of
    the per-host sets IS the capture-wide distinct set)."""
    sent = F.when(F.col("direction") == "sent", F.col("cookie"))
    triple = F.when(
        F.col("direction") == "received",
        F.concat_ws(" ", "domain", "cookie", F.col("is_3rd_party").cast("string")),
    )
    return cookies.groupBy("doc_id").agg(
        F.count_distinct(sent).cast("long").alias("total_cookies_sent"),
        F.count_distinct(triple).cast("long").alias("total_cookies_received"),
    )
