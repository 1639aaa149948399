"""HTML text + link extraction tests (M169/M170,
operators/html.py) — the regex-tier extractor pinned against
hand-computed expectations; q178/q179's DuckDB twins re-run the same
pattern chains in SQL at corpus scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators import html as H

PAGE = (
    "<html><head><title>T</title>"
    "<style>p { color: red }</style>"
    "<script>if (x < 2 && y > 1) { alert('<p>') }</script>"
    "</head><body>"
    "<h1>Header</h1>"
    "<!-- a comment <p>not text</p> -->"
    "<p>First &amp; second &lt;para&gt;.</p>"
    "<div>Block&nbsp;one<br>line two</div>"
    "<ul><li>item 1</li><li>item 2</li></ul>"
    "<NOSCRIPT>enable js</noscript>"
    "<p>tail</p>"
    "</body></html>"
)


def test_html_to_text(spark):
    df = spark.createDataFrame([(PAGE,)], "html string")
    got = df.select(H.html_to_text(F.col("html")).alias("t")) \
        .collect()[0]["t"]
    assert got == ("T\nHeader\nFirst & second <para>.\n"
                   "Block one\nline two\nitem 1\nitem 2\ntail")
    # script content (incl. the fake '<p>' inside it), style rules,
    # comments, and noscript are all gone
    for frag in ("alert", "color", "not text", "enable js"):
        assert frag not in got


def test_html_to_text_null_and_plain(spark):
    df = spark.createDataFrame([(None,), ("just text",)],
                               "html string")
    got = [r["t"] for r in df.select(
        H.html_to_text(F.col("html")).alias("t")).collect()]
    assert got == [None, "just text"]


def test_extract_links(spark):
    html = (
        '<a href="/rooted/x">r</a>'
        "<a class='y' HREF='../up?a=1&amp;b=2'>q</a>"
        "<a href=bare.html>b</a>"
        '<a href="">empty</a>'
        "<a name=anchor-only>n</a>"
        '<a href="#frag">f</a>'
        '<a href="https://abs.example/p">abs</a>'
        '<a href="mailto:x@y.z">m</a>'
    )
    df = spark.createDataFrame(
        [(1, "http://h.com/dir/page.html", html)],
        "doc_id int, base string, html string")
    out = H.extract_links(df, html_col="html", base_col="base")
    got = {r["href"]: r["resolved"] for r in out.collect()}
    assert got == {
        "/rooted/x": "http://h.com/rooted/x",
        "../up?a=1&b=2": "http://h.com/up?a=1&b=2",
        "bare.html": "http://h.com/dir/bare.html",
        "#frag": "http://h.com/dir/page.html",
        "https://abs.example/p": "https://abs.example/p",
        "mailto:x@y.z": "mailto:x@y.z",  # own scheme: verbatim
    }
    assert "html" not in out.columns


def test_no_python_in_plans(spark):
    df = spark.createDataFrame([(1, "http://h.com/", "<a href=x>y</a>")],
                               "doc_id int, base string, html string")
    for d in (df.select(H.html_to_text(F.col("html")).alias("t")),
              H.extract_links(df, html_col="html", base_col="base")):
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_html_meta(spark):
    page = (
        "<html><head>"
        "<title> My  Page &amp; Co </title>"
        '<meta charset="UTF-8">'
        '<meta name="description" content="A &quot;fine&quot; page">'
        "<meta content='noindex, nofollow' name='ROBOTS'>"
        '<link href="https://a.com/canon?x=1&amp;y=2" rel="canonical">'
        "</head><body>x</body></html>"
    )
    plain = "<html><head><title>T</title></head></html>"
    df = spark.createDataFrame([(1, page), (2, plain)],
                               "doc_id int, html string")
    rows = {r["doc_id"]: r for r in H.html_meta(df).collect()}
    r = rows[1]
    assert r["title"] == "My Page & Co"
    assert r["meta_description"] == 'A "fine" page'
    assert r["canonical_url"] == "https://a.com/canon?x=1&y=2"
    assert r["meta_robots"] == "noindex, nofollow"
    assert r["noindex"] is True and r["nofollow"] is True
    assert r["charset"] == "utf-8"
    p = rows[2]
    assert p["title"] == "T" and p["meta_description"] == ""
    assert p["noindex"] is False and p["nofollow"] is False
    # 'noindexing' must NOT token-match noindex
    tricky = spark.createDataFrame(
        [(3, '<meta name="robots" content="noindexing,nofollow">')],
        "doc_id int, html string")
    t = H.html_meta(tricky).collect()[0]
    assert t["noindex"] is False and t["nofollow"] is True
