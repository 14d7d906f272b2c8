"""Markup parse + JS-redirect extraction (F17/F18/F19/F26 family)."""

import hashlib

from har2tree_spark.operators import soup


def _bodies(spark):
    rows = [
        ("d1", 0, '<html><body><img src="k2"><a href="x.css">t</a></body></html>'),
        ("d1", 1, "<script>location.href='k2'</script>"),
        ("d1", 2, "<script>location.replace('k404')</script>"),
        ("d1", 3, '<meta http-equiv="refresh" content="5;url=k1">'),
        ("d1", 4, "no markup at all"),
        ("d1", 5, "<p>upper <IMG SRC='x'> lower</p>"),
    ]
    return spark.createDataFrame(rows, "doc_id string, span_idx int, body string")


def test_soup_features_tags_and_resources(spark):
    got = {r.span_idx: r for r in soup.soup_features(_bodies(spark)).collect()}
    assert got[0].tags == ["html", "body", "img", "a"]
    assert got[0].res_refs == ["k2", "x.css"]
    # domhash contract (F26): first 32 hex of sha256 over '|'-joined tags
    exp = hashlib.sha256(b"html|body|img|a").hexdigest()[:32]
    assert got[0].domhash == exp
    # no tags -> null domhash, empty arrays
    assert got[4].n_tags == 0 and got[4].domhash is None and got[4].res_refs == []
    # tag names lowercased (IMG -> img)
    assert got[5].tags == ["p", "img"]


def test_soup_parser_engine_parity_on_regular_markup(spark):
    """r4 VERDICT task #2: the real-parser path (engine='lxml'; stdlib
    event-parser fallback in this container — the reference's
    helper.py:283-294 chain) must match the JVM regexp path exactly on
    the regular double-quoted markup grammar, including the CSS arms."""
    rows = [
        ("d", 0, '<div><img src="k2"><script>location.href=\'k2\'</script></div>'),
        ("d", 1, '<meta http-equiv="refresh" content="5;url=k1">'),
        ("d", 2, "<span>no markup refs</span>"),
        ("d", 3, "<script>location.replace('kZZZ')</script>"),
        (
            "d",
            4,
            '<link href="a.css"><style>.x{background:url(\'bg.png\')}'
            "@import 'extra.css';</style>"
            '<video poster="p.jpg"><source srcset="s1.png 1x"></video>',
        ),
        ("d", 5, '<object data="o.bin"><img longdesc="d.html" src=""></object>'),
        ("d", 6, ""),
        ("d", 7, "plain text, no tags"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, span_idx int, body string")
    cols = ["tags", "domhash", "res_refs", "n_tags", "n_res"]
    a = {r.span_idx: r for r in soup.soup_features(df).collect()}
    b = {
        r.span_idx: r
        for r in soup.soup_features(df, engine="lxml").collect()
    }
    assert set(a) == set(b)
    for i in a:
        for c in cols:
            assert a[i][c] == b[i][c], (i, c, a[i][c], b[i][c])
    # and the parity is non-vacuous: resources from every arm family
    assert a[4].res_refs == ["a.css", "p.jpg", "s1.png 1x", "bg.png", "extra.css"]


def test_soup_parser_engine_handles_non_regular_html(spark):
    """What the regexp grammar cannot parse, the parser engine must:
    single-quoted/unquoted attributes, unclosed tags, and attr-shaped
    text that is NOT markup (the regexp path's known false positive)."""
    rows = [
        ("d", 0, "<p><img src='a.png'><UL><LI>unclosed"),
        ("d", 1, 'prose with src="fake" outside any tag'),
        ("d", 2, "<a href=bare.html>x</a>"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, span_idx int, body string")
    got = {
        r.span_idx: r
        for r in soup.soup_features(df, engine="lxml").collect()
    }
    assert got[0].tags == ["p", "img", "ul", "li"]
    assert got[0].res_refs == ["a.png"]  # single-quoted attr extracted
    assert got[1].res_refs == []  # text is not an attribute
    assert got[1].tags == []
    assert got[2].res_refs == ["bare.html"]  # unquoted attr extracted


def test_js_redirects_universe_semijoin(spark):
    bodies = _bodies(spark)
    feats = spark.createDataFrame(
        [("d1", 0, "k1"), ("d1", 1, "k2")], "doc_id string, span_idx int, key string"
    )
    got = {r.span_idx: r for r in soup.js_redirects(bodies, feats).collect()}
    # location.href to a known key resolves
    assert got[1].redirect_url == "k2" and got[1].redirect_kind == "js"
    assert not got[1].redirect_to_nothing
    # unknown target: flagged, kept, null url (redirect_to_nothing contract)
    assert got[2].redirect_url is None and got[2].redirect_to_nothing
    # meta refresh arm
    assert got[3].redirect_kind == "meta" and got[3].redirect_url == "k1"
    # bodies with no redirect marker produce no row
    assert 0 not in got and 4 not in got


def test_js_redirect_assign_variant(spark):
    bodies = spark.createDataFrame(
        [("d1", 0, "<script>location.assign('k9')</script>")],
        "doc_id string, span_idx int, body string",
    )
    feats = spark.createDataFrame([("d1", 9, "k9")], "doc_id string, span_idx int, key string")
    r = soup.js_redirects(bodies, feats).collect()[0]
    assert r.redirect_url == "k9" and r.redirect_kind == "js"


def test_soup_is_narrow(spark):
    # the markup parse must stay a JVM projection: no shuffle, no Python
    plan = soup.soup_features(_bodies(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_soup_css_and_attribute_breadth(spark):
    """F18 breadth (reference helper.py:300-426): CSS url()/@import arms and
    the srcset/poster/longdesc/data attribute surface feed res_refs."""
    rows = [
        ("d1", 0, '<style>.a{background:url("k1.png")} '
                  "@import 'k2.css'; b{x:url(k3.gif)}</style>"),
        ("d1", 1, '<img srcset="k4 2x" longdesc="k5">'
                  '<video poster="k6"></video><object data="k7"></object>'),
        ("d1", 2, '<link href="k8"><source src="k9">'),
        ("d1", 3, "@import url('k10.css');"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, span_idx int, body string")
    got = {r.span_idx: r for r in soup.soup_features(df).collect()}
    # attr refs first, then url() tokens, then @import strings
    assert got[0].res_refs == ["k1.png", "k3.gif", "k2.css"]
    assert got[1].res_refs == ["k4 2x", "k5", "k6", "k7"]
    assert got[2].res_refs == ["k8", "k9"]
    # @import url(...) form is captured exactly once (by the url() arm)
    assert got[3].res_refs == ["k10.css"]
    assert got[3].n_res == 1


def test_soup_parser_engine_parity_on_gate_corpus(spark):
    """Corpus-scale parity pin: both soup engines agree row-for-row on
    EVERY generated markup body of the sf0.001 gate corpus (the tiny
    hand-rows above can't cover the generator's full body distribution).
    Keeps the engine="lxml" claim honest at data scale, not just on
    curated examples."""
    import os

    import pytest as _pytest

    if not os.path.exists("/root/testdata/sf0.001"):
        _pytest.skip("gate testdata not present")
    import __spark_entry__ as entry

    live = entry._live(spark, "/root/testdata/sf0.001").select(
        "doc_id", "span_idx", "text"
    )
    bodies = entry._with_markup_body(live)
    cols = ["doc_id", "span_idx", "tags", "domhash", "res_refs"]
    a = (
        soup.soup_features(bodies)
        .select(*cols)
        .toPandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    b = (
        soup.soup_features(bodies, engine="lxml")
        .select(*cols)
        .toPandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) and len(a) > 500
    for c in ["doc_id", "span_idx", "domhash"]:
        assert (a[c] == b[c]).all(), c
    for x, y in zip(a.res_refs, b.res_refs):
        assert list(x) == list(y)
    for x, y in zip(a.tags, b.tags):
        assert list(x) == list(y)


def test_implied_tag_skip_pure():
    """The lxml-branch implied-structure filter (r5 ADVICE): skip
    html/head/body start events exactly when the source does not literally
    contain the tag — unit-testable without lxml."""
    from har2tree_spark.operators.soup import _implied_tag_skip

    skip = _implied_tag_skip("<p>x</p>")
    assert skip("html") and skip("body") and skip("head")
    assert not skip("p") and not skip("div")
    skip2 = _implied_tag_skip('<HTML lang="en"><body>x</body></HTML>')
    assert not skip2("html") and not skip2("body") and skip2("head")
    # prefix false-positives must not count as literal presence
    skip3 = _implied_tag_skip("<bodyguard><htmlx>")
    assert skip3("body") and skip3("html")
    # unclosed tag at end-of-input still counts as present
    skip4 = _implied_tag_skip("text <body")
    assert not skip4("body") and skip4("html")
    # self-closing form
    assert not _implied_tag_skip("<head/>")("head")


def test_soup_event_engine_fuzz_totality(spark):
    """Never-throws + column-contract fuzz for the event-parser engine
    over arbitrary byte soup (r5 VERDICT #6): the regexp engine already
    had one; this pins the mapInPandas path. Deterministic across runs."""
    import random
    import string

    rng = random.Random(4242)
    alphabet = (
        string.ascii_letters + string.digits
        + "<>/=\"' &#;:%()@!\\-_.{}[]\n\t"
    )
    bodies = [
        "".join(rng.choices(alphabet, k=rng.randrange(0, 120))) for _ in range(300)
    ]
    bodies += [
        "", "<", "<>", "</", "<!---", "<!doctype html>", "<p", "<p x",
        "<p x=", '<p x="', "<a href='u'>", "<a href=u>", "<A HREF=\"U\">",
        "<img src=\"a\" src=\"b\">", "<style>url( x )</style>",
        "@import 'y';", "<p>&notareal;</p>", "<svg><circle/></svg>",
        "\x00\x01<p>", "<p>" * 50, "<" * 30, "a>" * 30,
        "<script>if(a<b){}</script>", "<body onload=x>", "<html><p>",
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(bodies)], "span_idx int, body string"
    )
    for engine in ("regexp", "lxml"):
        rows = soup.soup_features(df, engine=engine).collect()  # never throws
        assert len(rows) == len(bodies)
        for r in rows:
            assert r.tags is not None and r.res_refs is not None
            assert r.n_tags == len(r.tags) and r.n_res == len(r.res_refs)
            assert all(t == t.lower() for t in r.tags)
            assert (r.domhash is None) == (len(r.tags) == 0)
    # determinism of the python-parser path
    a = soup.soup_features(df, engine="lxml").collect()
    b = soup.soup_features(df, engine="lxml").collect()
    key = lambda r: r.span_idx  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
