"""URL canonicalization tests (functions/web.py)."""

from pyspark.sql import functions as F

from valentinus_spark.functions.web import normalize_url, url_host


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select("u", normalize_url("u").alias("n")).collect()
    return {r["u"]: r["n"] for r in rows}


def test_normalize_url_rules(spark):
    got = _norm(
        spark,
        [
            "https://Site.Example.com/Path/UPPER",  # path case preserved
            "HTTPS://HOST.COM:443/a",
            "http://host.com:80/a",
            "http://host.com:8080/a",  # non-default port kept
            "https://host.com/a?utm_source=x&keep=1&utm_campaign=y#frag",
            "https://host.com/a/",
            "https://host.com/",  # bare root slash kept
            "  https://host.com/a  ",  # surrounding whitespace
            "not a url at all",  # total function: passthrough
        ],
    )
    assert got["https://Site.Example.com/Path/UPPER"] == "https://site.example.com/Path/UPPER"
    assert got["HTTPS://HOST.COM:443/a"] == "https://host.com/a"
    assert got["http://host.com:80/a"] == "http://host.com/a"
    assert got["http://host.com:8080/a"] == "http://host.com:8080/a"
    assert (
        got["https://host.com/a?utm_source=x&keep=1&utm_campaign=y#frag"]
        == "https://host.com/a?keep=1"
    )
    assert got["https://host.com/a/"] == "https://host.com/a"
    assert got["https://host.com/"] == "https://host.com/"
    assert got["  https://host.com/a  "] == "https://host.com/a"
    assert got["not a url at all"] == "not a url at all"


def test_url_host(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.Example.com:8443/x",),
            ("http://user:pw@www.inner.example.org/p",),
            ("https://example.com/",),
        ],
        "u string",
    )
    rows = df.select(
        url_host("u").alias("h"), url_host("u", strip_www=False).alias("hw")
    ).collect()
    assert [r["h"] for r in rows] == ["example.com", "inner.example.org", "example.com"]
    assert rows[0]["hw"] == "www.example.com"


def test_normalize_url_idempotent(spark):
    """Normalizing twice must be a no-op — the canonical form is a fixed
    point, so the column is safe to re-normalize in incremental loads."""
    urls = [
        "HTTPS://A.B:443/p/1/?utm_source=s#f",
        "http://x.y:80/",
        "https://h/p?keep=1&utm_id=9",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(normalize_url("u").alias("n"))
    twice = once.select(F.col("n").alias("u")).select(normalize_url("u").alias("n"))
    assert [r["n"] for r in once.collect()] == [r["n"] for r in twice.collect()]


def test_html_to_text_order_sensitive_cases(spark):
    from valentinus_spark.functions.web import html_to_text

    cases = [
        # script body contains '<' — must die as a block, not leak 'var x'
        ("<p>a</p><script>if (x < 2) alert('<b>')</script><p>b</p>", "a b"),
        ("<style>p><b { x: '<'; }</style>text", "text"),
        ("<!-- <p>hidden</p> -->shown", "shown"),
        # entity decode AFTER tag strip: escaped markup survives literally
        ("&lt;script&gt;evil&lt;/script&gt;", "<script>evil</script>"),
        # exactly one decode level
        ("&amp;lt;", "&lt;"),
        ("a<br>b<BR/>c", "a b c"),
        ("x &nbsp; y &quot;q&quot; &#39;s&#39;", "x y \"q\" 's'"),
        ("  lots\n\nof\twhitespace  ", "lots of whitespace"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [r["t"] for r in df.select(html_to_text("h").alias("t")).collect()]
    assert got == [want for _, want in cases]


def test_web_functions_stay_jvm_side(spark):
    """normalize_url/html_to_text compile to pure Catalyst expressions —
    no Python evaluation node may appear in the crawl hot path."""
    from tests.test_plans import plan_of
    from valentinus_spark.functions.web import html_to_text, normalize_url, url_host

    df = spark.createDataFrame([("https://A.b:443/x#f", "<p>t</p>")], "u string, h string")
    plan = plan_of(
        df.select(
            normalize_url("u"), url_host("u"), html_to_text("h")
        )
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_apply_url_rules_longest_match_and_tiebreak(spark):
    from valentinus_spark.functions.web import apply_url_rules

    urls = spark.createDataFrame(
        [
            (1, "https://A.example.com/p/deep/page"),  # carve-out wins
            (2, "https://a.example.com/p/other"),      # only disallow matches
            (3, "https://a.example.com/q"),            # no rule path match
            (4, "https://norules.com/x"),              # host unknown
            (5, "https://tie.com/t"),                  # equal length: allow wins
        ],
        "id long, url string",
    )
    rules = spark.createDataFrame(
        [
            ("a.example.com", "/p", False),
            ("a.example.com", "/p/deep", True),
            ("tie.com", "/t", False),
            ("tie.com", "/t", True),
        ],
        "host string, path_prefix string, allow boolean",
    )
    got = {
        r["id"]: r["allow"] for r in apply_url_rules(urls, rules).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: True, 5: True}


def test_apply_url_rules_column_collisions_raise_and_out_col(spark):
    # ADVICE r3: a urls table that already has 'allow' (or an internal
    # tag name) must raise up front, not silently mis-aggregate; a
    # caller-settable output column sidesteps the clash
    import pytest

    from valentinus_spark.functions.web import apply_url_rules

    rules = spark.createDataFrame(
        [("x.com", "/p", False)], "host string, path_prefix string, allow boolean"
    )
    for bad_schema in (
        "id long, url string, allow boolean",
        "id long, url string, _host string",
        "id long, url string, _rid long",
    ):
        urls = spark.createDataFrame([(1, "https://x.com/p", None)], bad_schema)
        with pytest.raises(ValueError, match="apply_url_rules"):
            apply_url_rules(urls, rules)
    urls = spark.createDataFrame(
        [(1, "https://x.com/p/a", True)], "id long, url string, allow boolean"
    )
    out = apply_url_rules(urls, rules, out_col="crawl_ok")
    row = out.collect()[0]
    assert row["crawl_ok"] is False and row["allow"] is True  # input col intact
