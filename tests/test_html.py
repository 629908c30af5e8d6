"""HTML extraction: byte-identity invariant (engine UDF == oracle) +
adversarial cases for the frozen spec."""

from __future__ import annotations

from knowledgeir_spark.fixtures.webpages import gen_webpages
from knowledgeir_spark.oracle.html import extract_html


ADVERSARIAL = [
    b"junk before <HTML><title>T</title><body>hello world</body></html>",
    b"<html><script>var x = '<p>not text</p>';</script><p>real</p></html>",
    b"<html><style>p { color: red }</style>body text</html>",
    b"<html><nav>menu items</nav><p>content</p><footer>foot</footer></html>",
    b"<html><p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;</p></html>",
    b"no html tag at all, just text",
    b"<html><title>multi\n  line\ttitle</title>body</html>",
    b"",
    b"\xff\xfe invalid utf8 \x80<html><p>ok</p></html>",
]


def test_adversarial_cases():
    t, b = extract_html(ADVERSARIAL[0])
    assert t == "T" and b == "hello world"
    t, b = extract_html(ADVERSARIAL[1])
    assert b == "real" and "not text" not in b
    t, b = extract_html(ADVERSARIAL[2])
    assert b == "body text"
    t, b = extract_html(ADVERSARIAL[3])
    assert b == "content"
    t, b = extract_html(ADVERSARIAL[4])
    assert b == "a & b <c> \"d\" 'e'"
    t, b = extract_html(ADVERSARIAL[5])
    assert b == "no html tag at all, just text"
    t, b = extract_html(ADVERSARIAL[6])
    assert t == "multi line title"
    assert extract_html(ADVERSARIAL[7]) == ("", "")
    t, b = extract_html(ADVERSARIAL[8])
    assert b == "ok"
    assert extract_html(None) == ("", "")


def test_udf_byte_identical_to_oracle(spark):
    """The per-url invariant: Spark extraction == oracle extraction, byte-for-byte."""
    from pyspark.sql import functions as F

    from knowledgeir_spark.functions.html import with_extracted_text
    from knowledgeir_spark.fixtures.webpages import webpages_df

    df = webpages_df(spark, n_docs=120)
    rows = with_extracted_text(df).select("url", "html", "title", "body").collect()
    assert len(rows) == 120
    for r in rows:
        ot, ob = extract_html(bytes(r["html"]))
        assert r["title"] == ot, r["url"]
        assert r["body"] == ob, r["url"]
    # fixture body embeds the original text: extracted body contains it
    pdf = gen_webpages(n_docs=120)
    by_url = {u: t for u, t in zip(pdf["url"], pdf["text"])}
    nonempty = 0
    for r in rows:
        if by_url[r["url"]]:
            assert by_url[r["url"]] in r["body"]
            nonempty += 1
    assert nonempty > 100
