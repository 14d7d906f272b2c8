"""Tree JSON export (S5): golden shape, per-doc laws, deep-chain safety."""

import json

from pyspark.sql import functions as F

from har2tree_spark.datagen import gen_docs
from har2tree_spark.operators.cascade import resolve_rank
from har2tree_spark.operators.export import _emit_doc, tree_json
from har2tree_spark.operators.parse import parse_documents
from har2tree_spark.schema import DOCUMENTS_SCHEMA


def test_emit_doc_golden():
    # root(0) -> redirect child(1) -> resource child(2); sibling (3) under root
    spans = [0, 1, 2, 3]
    parents = {0: -1, 1: 0, 2: 1, 3: 0}
    kinds = {0: "html", 1: "redirect", 2: "img", 3: "js"}
    jks = {0: "root", 1: "redirect", 2: "resource", 3: "initiator"}
    got = _emit_doc(spans, parents, kinds, jks)
    want = (
        '{"span_idx":0,"kind":"html","join_kind":"root","children":['
        '{"span_idx":1,"kind":"redirect","join_kind":"redirect","children":['
        '{"span_idx":2,"kind":"img","join_kind":"resource","children":[]}]},'
        '{"span_idx":3,"kind":"js","join_kind":"initiator","children":[]}]}'
    )
    assert got == want
    assert json.loads(got)["children"][1]["span_idx"] == 3


def test_emit_doc_deep_chain_no_recursion():
    n = 60000  # far past any recursion limit: must not touch the C stack
    spans = list(range(n))
    parents = {i: i - 1 for i in spans}
    kinds = {i: "html" for i in spans}
    jks = {i: "redirect" for i in spans}
    got = _emit_doc(spans, parents, kinds, jks)
    assert got.count('"span_idx"') == n
    assert got.endswith("]}" * n)


def test_tree_json_laws(spark):
    docs = spark.createDataFrame(gen_docs(11, 200), DOCUMENTS_SCHEMA)
    feats = parse_documents(docs)
    jr = resolve_rank(feats)
    t = tree_json(jr, feats).toPandas()
    per_doc = (
        jr.groupBy("doc_id").agg(F.count("*").alias("n")).toPandas()
        .set_index("doc_id")["n"]
    )
    assert len(t) == len(per_doc)
    for _, row in t.iterrows():
        assert row.n_nodes == per_doc[row.doc_id]
        tree = json.loads(row.tree)
        # every span appears exactly once in the nested tree
        seen = []
        stack = [tree] if isinstance(tree, dict) else list(tree)
        while stack:
            node = stack.pop()
            seen.append(node["span_idx"])
            stack.extend(node["children"])
        assert len(seen) == row.n_nodes == len(set(seen))


def test_tree_json_committed_golden(spark):
    """Byte-equality against the COMMITTED fixture (tests/data/
    golden_tree.json, seed=23 corpus): the co-drift tripwire the reference
    pins with tests/capture_samples/iframe/to_json.json
    (simple_test.py:243-257). Regenerating the fixture requires a
    deliberate commit — engine+oracle drifting together cannot silently
    pass this."""
    import pathlib

    fixture = json.loads(
        (pathlib.Path(__file__).parent / "data" / "golden_tree.json").read_text()
    )
    docs = spark.createDataFrame(gen_docs(seed=23, n_docs=40), DOCUMENTS_SCHEMA)
    feats = parse_documents(docs)
    got = {r.doc_id: r for r in tree_json(resolve_rank(feats), feats).collect()}
    assert set(got) == set(fixture)
    for doc_id, want in fixture.items():
        assert got[doc_id].n_nodes == want["n_nodes"], doc_id
        assert got[doc_id].tree == want["tree"], doc_id
