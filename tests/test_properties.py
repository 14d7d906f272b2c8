"""Property tests (hypothesis) for pure-Python kernel components —
no SparkSession, so hundreds of examples run in seconds."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from har2tree_spark.operators.export import _emit_doc


def _reference_tree(spans, parents, kinds, jks):
    """Straightforward recursive dict construction + json.dumps — the
    independent model the explicit-stack emitter must match on acyclic
    input."""
    children = {s: [] for s in spans}
    roots = []
    for s in spans:
        if parents[s] < 0:
            roots.append(s)
        else:
            children[parents[s]].append(s)

    def build(n):
        return {
            "span_idx": n,
            "kind": kinds[n],
            "join_kind": jks[n],
            "children": [build(c) for c in sorted(children[n])],
        }

    trees = [build(r) for r in roots]
    obj = trees[0] if len(trees) == 1 else trees
    return json.dumps(obj, separators=(",", ":"))


@st.composite
def acyclic_forest(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    spans = list(range(n))
    # parent strictly smaller than child (or -1 root) -> acyclic by
    # construction; multiple roots allowed
    parents = {0: -1}
    for s in spans[1:]:
        parents[s] = draw(st.integers(min_value=-1, max_value=s - 1))
    kinds = {s: draw(st.sampled_from(["html", "img", "js", "css"])) for s in spans}
    jks = {s: draw(st.sampled_from(["root", "redirect", "frame", "referer"])) for s in spans}
    return spans, parents, kinds, jks


@settings(max_examples=300, deadline=None)
@given(acyclic_forest())
def test_emitter_matches_json_dumps_on_acyclic_forests(forest):
    spans, parents, kinds, jks = forest
    got = _emit_doc(spans, parents, kinds, jks)
    assert got == _reference_tree(spans, parents, kinds, jks)
    # structural sanity independent of the model: brackets balance and
    # every span appears exactly once
    assert got.count("{") == got.count("}")
    assert got.count('{"span_idx":') == len(spans)


@settings(max_examples=100, deadline=None)
@given(acyclic_forest())
def test_emitter_deterministic_under_span_order(forest):
    spans, parents, kinds, jks = forest
    a = _emit_doc(spans, parents, kinds, jks)
    b = _emit_doc(sorted(spans), parents, kinds, jks)
    assert a == b


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=2, max_value=400))
def test_emitter_survives_deep_chain(depth):
    # adversarial deep chain: the explicit stack must not recurse
    spans = list(range(depth))
    parents = {s: s - 1 for s in spans}
    parents[0] = -1
    kinds = {s: "html" for s in spans}
    jks = {s: "redirect" for s in spans}
    got = _emit_doc(spans, parents, kinds, jks)
    assert got.count('{"span_idx":') == depth
    assert got.endswith("]}" * depth)


def test_emitter_breaks_two_cycles():
    # rank-mode 2-cycle: 1<->2 island behind root 0; the back edge must
    # not re-enter (visited-set contract the SQL oracle cannot replay —
    # this pins the exact island behavior instead)
    spans = [0, 1, 2]
    parents = {0: -1, 1: 2, 2: 1}
    kinds = {s: "html" for s in spans}
    jks = {0: "root", 1: "referer", 2: "referer"}
    got = _emit_doc(spans, parents, kinds, jks)
    assert got.count('{"span_idx":') == 3
    # island entry = smallest unvisited span (1), child 2 nests under it
    assert got.index('{"span_idx":1') < got.index('{"span_idx":2')
