"""Real-HAR ingestion (sources/har_source.py): the reference's own capture
corpora (/root/reference/tests/data — PUBLIC test fixtures of the reference
repo) mapped into the documents table and pushed through the full unchanged
pipeline. The lalibre directory is the reference's forest-join stress
(reference tests/test.py:14-18); the simple capture exercises initiators and
real HTML bodies (reference tests/simple_test.py)."""

import os
import re

import pytest
from pyspark.sql import functions as F

from har2tree_spark.operators.parse import KEY_TOKEN_RE
from har2tree_spark.pipeline import run_pipeline
from har2tree_spark.sources import har_source

REF_DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference HAR corpora not present"
)

_KEY_PAT = re.compile(KEY_TOKEN_RE.replace("\\z", "$"))


def test_url_key_grammar_and_determinism():
    urls = [
        "https://www.lalibre.be/",
        "http://example.com/a?b=c d",  # unquote_plus artifact: space survives
        "https://example.com/é",
    ]
    keys = [har_source.url_key(u) for u in urls]
    for k in keys:
        assert _KEY_PAT.match(k), k
        assert 1 <= int(k[1:]) < 10**15
    assert keys == [har_source.url_key(u) for u in urls]  # deterministic
    assert len(set(keys)) == len(keys)


def test_stack_grammar_matches_engine_f21():
    # parser-style url initiator
    assert har_source._initiator_media(
        {"_initiator": {"type": "parser", "url": "https://a/"}}
    ) == har_source.url_key("https://a/")
    # script stack: empty level 0, resolvable level 1; empty-url frames stay
    # as empty tokens (reference nodes.py:602-616)
    stack = {
        "callFrames": [],
        "parent": {
            "callFrames": [{"url": "https://a/"}, {"url": ""}],
        },
    }
    media = har_source._initiator_media({"_initiator": {"type": "script", "stack": stack}})
    assert media == f"stack:|{har_source.url_key('https://a/')} "
    assert har_source._initiator_media({"_initiator": {"type": "other"}}) == ""


def _mini_har(entries):
    return {"log": {"entries": entries}}


def _entry(url, status=200, mime="text/html", started="2020-01-01T00:00:00Z",
           redirect="", referer="", body=None):
    e = {
        "startedDateTime": started,
        "request": {"url": url, "headers": []},
        "response": {
            "status": status,
            "redirectURL": redirect,
            "content": {"mimeType": mime},
        },
    }
    if referer:
        e["request"]["headers"].append({"name": "Referer", "value": referer})
    if body is not None:
        e["response"]["content"]["text"] = body
    return e


def test_har_to_doc_status0_dedup_and_redirect(spark):
    # status-0 twin of a valid URL -> engine P2 suppression; a lone
    # status-0 stays (har2tree.py:575-603). 301 -> redirect span whose
    # media_ref keys the (trailing-slash repaired) target.
    har = _mini_har(
        [
            _entry("http://a/", status=301, redirect="http://b",
                   started="2020-01-01T00:00:01Z"),
            _entry("http://b/", started="2020-01-01T00:00:02Z",
                   body='<html><img src="/pic.png"></html>'),
            _entry("http://b/pic.png", status=0, mime="",
                   started="2020-01-01T00:00:03Z"),
            _entry("http://b/pic.png", mime="image/png",
                   started="2020-01-01T00:00:04Z", referer="http://b/"),
            _entry("http://c/lone", status=0, mime="",
                   started="2020-01-01T00:00:05Z"),
            _entry("", started="2020-01-01T00:00:06Z"),  # empty-URL ignore
        ]
    )
    doc = har_source.har_to_doc("mini", har)
    kinds = [s["kind"] for s in doc["spans"]]
    assert kinds == ["redirect", "html", "empty", "img", "empty", "text"]
    # redirect target resolved to http://b/ via trailing-slash repair
    assert doc["spans"][0]["media_ref"] == har_source.url_key("http://b/")
    # resource token: the html body embeds pic.png which is in the universe
    assert har_source.url_key("http://b/pic.png") in doc["spans"][1]["text"].split()

    out = run_pipeline(
        spark.createDataFrame([doc], har_source.DOCUMENTS_SCHEMA), mode="exact"
    )
    f = out["features"].toPandas().set_index("span_idx")
    # status-0 twin suppressed, lone status-0 kept, empty-URL span dropped
    assert 2 not in f.index and 5 not in f.index
    assert 4 in f.index and not f.loc[4]["valid"]
    jr = out["join_result"].toPandas().set_index("span_idx")
    assert jr.loc[1]["join_kind"] == "redirect"  # b attached via the 301
    assert jr.loc[3]["join_kind"] == "referer"


@pytest.fixture(scope="module")
def lalibre_out(spark):
    docs = har_source.read_har_dir(spark, f"{REF_DATA}/lalibre").localCheckpoint()
    out = run_pipeline(docs, mode="exact")
    return docs, out


def test_lalibre_corpus_end_to_end(spark, lalibre_out):
    docs, out = lalibre_out
    assert docs.count() == 216  # reference tests/test.py:14-18 forest corpus
    # quarantine accounted: 063 and 066 are zero-entry HARs — the
    # reference's Har2TreeError path (har2tree.py:244-248), our quarantine
    q = {r.doc_id for r in out["quarantine"].collect()}
    assert q == {"063", "066"}
    jr = out["join_result"]
    stats = out["doc_stats"].toPandas()
    assert len(stats) == 214
    assert (stats.tree_depth >= 1).all()
    # exactly one root per document
    roots = jr.filter(F.col("parent_idx") == -1).groupBy("doc_id").count().toPandas()
    assert len(roots) == 214 and (roots["count"] == 1).all()
    # every live span got exactly one join row (consume-once)
    live = out["features"].filter("span_idx is not null and n_live > 0").count()
    assert jr.count() == live
    # the capture's relations actually fire. The corpus carries 436
    # redirectURL entries; consume-once (the reference follows each
    # redirect once, har2tree.py:912) attaches 239 of them via the
    # redirect arm, the rest being duplicate/root targets.
    kinds = {r["join_kind"]: r["count"] for r in jr.groupBy("join_kind").count().collect()}
    assert kinds.get("redirect", 0) > 200
    assert kinds.get("referer", 0) > 1000
    assert kinds.get("initiator", 0) > 100


def test_lalibre_span_sequence_invariant(spark, lalibre_out):
    docs, out = lalibre_out
    seq = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.transform(
            "spans", lambda s: F.struct(s["kind"], s["text"], s["media_ref"], s["offset"])
        ).alias("seq"),
    )
    joined = seq(docs).alias("a").join(seq(out["enriched_documents"]).alias("b"), "doc_id", "full")
    assert joined.filter(~F.col("a.seq").eqNullSafe(F.col("b.seq"))).count() == 0


def test_loose_hars_and_forest_shared_keys(spark):
    # the 5 loose captures (buzzfeed/circl/lemonde/libe/nyt) parse and
    # produce referer-linked trees; identical URLs key identically across
    # documents (the forest-join contract) with zero coordination.
    docs = har_source.read_har_dir(spark, REF_DATA, pattern="*.har")
    # recursive lookup picks up lalibre too; keep the loose five
    loose = docs.filter(~F.col("doc_id").contains("/")).localCheckpoint()
    assert loose.count() == 5
    out = run_pipeline(loose, mode="exact")
    assert out["quarantine"].count() == 0
    jr = out["join_result"].toPandas()
    assert set(jr.doc_id.unique()) == {"buzzfeed", "circl", "lemonde", "libe", "nyt"}
    assert (jr.join_kind == "referer").sum() > 100


def test_simple_capture_initiators_and_resources(spark):
    # the reference's own pytest target (tests/simple_test.py): parser
    # initiators on every subresource + a real HTML body.
    docs = har_source.read_har_dir(spark, f"{REF_DATA}/simple")
    out = run_pipeline(docs, mode="exact")
    jr = out["join_result"].toPandas().set_index("span_idx")
    assert len(jr) == 6 and (jr.parent_idx == -1).sum() == 1
    # css/script entries carry parser initiators -> initiator (js kind) or
    # referer (css kind) arms, all attached to the root document
    attached = jr[jr.parent_idx == 0]
    assert set(attached.join_kind) <= {"initiator", "referer", "resource"}
    assert len(attached) >= 4


def test_simple_bodies_feed_soup_engines(spark):
    # real non-regular HTML through BOTH soup engines: the event-parser
    # engine must see at least the regexp engine's double-quoted attribute
    # surface, plus what only a real parser can find.
    from har2tree_spark.operators import soup

    bodies = har_source.read_har_bodies(spark, f"{REF_DATA}/simple").localCheckpoint()
    assert bodies.count() >= 1
    rx = soup.soup_features(bodies, engine="regexp").toPandas().set_index("span_idx")
    ev = soup.soup_features(bodies, engine="lxml").toPandas().set_index("span_idx")
    root_rx, root_ev = rx.loc[0], ev.loc[0]
    assert root_ev["n_tags"] >= root_rx["n_tags"] > 0
    assert set(root_rx["res_refs"]) <= set(root_ev["res_refs"])
    assert root_ev["domhash"] is not None
