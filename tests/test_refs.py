"""rebuild_url-analogue ref resolution (candidate variants + semi-join)."""

from har2tree_spark.operators.parse import parse_documents
from har2tree_spark.operators.refs import resolve_refs
from har2tree_spark.schema import DOCUMENTS_SCHEMA


def test_variant_resolution(spark):
    docs = [
        {
            "doc_id": "d",
            "spans": [
                {"kind": "html", "text": "k5", "media_ref": "", "offset": 0},
                {"kind": "img", "text": "k6", "media_ref": "K5", "offset": 10},      # case
                {"kind": "img", "text": "k7", "media_ref": "k5#frag", "offset": 20},  # fragment
                {"kind": "img", "text": "k8", "media_ref": "k005", "offset": 30},     # zero-pad
                {"kind": "img", "text": "k9", "media_ref": "5", "offset": 40},        # no prefix
                {"kind": "img", "text": "k10", "media_ref": "k5", "offset": 50},      # exact
                {"kind": "img", "text": "k11", "media_ref": "k404", "offset": 60},    # dangling
            ],
        }
    ]
    feats = parse_documents(spark.createDataFrame(docs, DOCUMENTS_SCHEMA))
    got = resolve_refs(feats).toPandas().set_index("span_idx")
    assert set(got.index) == {1, 2, 3, 4, 5}  # 6 excluded: span 6 is dangling
    assert (got.resolved_ref == "k5").all()
    # exact match resolves at rank 0, rewrites at higher ranks
    assert got.loc[5, "variant_rank"] == 0
    assert got.loc[2, "variant_rank"] == 1  # fragment strip
    assert got.loc[1, "variant_rank"] == 2  # lowercase
    assert got.loc[3, "variant_rank"] == 3  # zero strip
    assert got.loc[4, "variant_rank"] == 4  # prefix add


def test_cross_doc_isolation(spark):
    # the key universe is per-document: K5 in doc e must not resolve via doc d
    docs = [
        {"doc_id": "d", "spans": [{"kind": "html", "text": "k5", "media_ref": "", "offset": 0}]},
        {"doc_id": "e", "spans": [
            {"kind": "html", "text": "k1", "media_ref": "", "offset": 0},
            {"kind": "img", "text": "k2", "media_ref": "K5", "offset": 10},
        ]},
    ]
    feats = parse_documents(spark.createDataFrame(docs, DOCUMENTS_SCHEMA))
    got = resolve_refs(feats).toPandas()
    assert len(got[got.doc_id == "e"]) == 0
