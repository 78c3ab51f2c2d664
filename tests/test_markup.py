"""HTML main-content extraction (llm/markup.py): crafted
boilerplate-vs-content fixtures for the Kohlschütter-style shallow
classifier — the cases a density/word-count extractor must get right."""

from __future__ import annotations

import pytest

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.markup import (
    canonicalize_url,
    extract_main_content,
    html_block_features,
    percent_normalize,
    remove_invisible_markup,
    strip_tags,
    url_host,
)

ARTICLE = (
    "Researchers published a detailed analysis of distributed query "
    "engines and their shuffle behavior at petabyte scale today"
)
ARTICLE_WITH_LINK = (
    "The committee approved the proposal after a long debate; read the "
    'full <a href="/doc">report</a> for the supporting evidence'
)


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [
            # 1: classic page — nav / article / footer
            (
                1,
                '<html><body><nav><a href="/">Home</a> <a href="/a">About</a></nav>'
                f"<p>{ARTICLE}</p>"
                '<footer>Copyright <a href="/t">Terms</a></footer></body></html>',
            ),
            # 2: content containing an inline link BELOW the density bar
            (2, f"<html><body><p>{ARTICLE_WITH_LINK}</p></body></html>"),
            # 3: link farm — plenty of words, all of them anchor text
            (
                3,
                '<html><body><div><a href="/1">Ten hot tricks engineers love</a> '
                '<a href="/2">You will not believe number seven</a></div></body></html>',
            ),
            # 4: short fragment — below the word-count floor
            (4, "<html><body><p>Too short here</p></body></html>"),
            # 5: pure boilerplate page — nothing qualifies
            (5, '<html><body><nav><a href="/">Home</a></nav></body></html>'),
            # 6: two content blocks — order must be preserved
            (
                6,
                f"<html><body><h1>First part of the story begins right here</h1>"
                f"<p>{ARTICLE}</p></body></html>",
            ),
        ],
        ["doc_id", "html"],
    )


def test_strip_tags_collapses_to_visible_text(spark):
    df = spark.createDataFrame(
        [("<p>Hello   <b>big</b>\n<i>world</i>!</p>",)], ["html"]
    )
    assert df.select(strip_tags("html").alias("t")).head().t == "Hello big world !"


def test_block_features_classify_boilerplate(pages):
    feats = {
        (r.doc_id, r.block_idx): r
        for r in html_block_features(pages, "html", "doc_id").collect()
    }
    # page 1: nav (link-only, short) / article / footer
    assert not feats[(1, 0)].is_content  # nav
    assert feats[(1, 1)].is_content  # article
    assert feats[(1, 1)].link_chars == 0
    assert not feats[(1, 2)].is_content  # footer
    # page 2: one inline link inside real prose stays content
    f2 = feats[(2, 0)]
    assert f2.is_content and 0 < f2.link_chars * 3 < f2.n_chars
    # page 3: the link farm has words but fails the density bar
    f3 = feats[(3, 0)]
    assert f3.n_words >= 5 and not f3.is_content
    assert f3.link_chars * 3 >= f3.n_chars
    # page 4: word-count floor
    assert not feats[(4, 0)].is_content


def test_extract_main_content_verdicts(pages):
    out = {r.doc_id: r for r in extract_main_content(pages, "html", "doc_id").collect()}
    assert out[1].main_content == ARTICLE
    assert out[1].n_blocks == 3 and out[1].n_content_blocks == 1
    assert out[2].main_content == (
        "The committee approved the proposal after a long debate; read the "
        "full report for the supporting evidence"
    )
    assert out[3].main_content == "" and out[3].n_content_blocks == 0
    assert out[4].main_content == ""
    assert out[5].main_content == "" and out[5].n_blocks == 1
    # ordered join of multiple content blocks
    assert out[6].main_content == f"First part of the story begins right here {ARTICLE}"
    assert out[6].n_content_blocks == 2


def test_script_style_head_bodies_never_reach_blocks(spark):
    # JS/CSS bodies and <head> text are wordy enough to pass the
    # shallow classifier — they must be DELETED before segmentation,
    # not classified (r7 ADVICE: the old extractor stripped only the
    # tags, so script bodies leaked into main_content on real pages)
    page = (
        "<html><head><title>A very long descriptive page title here</title>"
        "<style>body { margin: 0; } .hero { color: red; font-size: 2em; }</style>"
        "</head><body>"
        '<script type="text/javascript">var config = {retries: 3, timeout: 1000,'
        " onload: function () { return window.performance.now(); }};</script>"
        f"<p>{ARTICLE}</p>"
        "<style>footer { display: none; }</style>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, page)], ["doc_id", "html"])
    out = extract_main_content(df, "html", "doc_id").head()
    assert out.main_content == ARTICLE
    assert out.n_blocks == 1  # title/style/script produced NO blocks
    # <header> must NOT be eaten by the <head> rule
    hdr = spark.createDataFrame(
        [("<header>Site name</header><head><title>x</title></head><p>body</p>",)],
        ["html"],
    )
    cleaned = hdr.select(remove_invisible_markup("html").alias("c")).head().c
    assert "Site name" in cleaned and "title" not in cleaned


def test_fused_segmentation_split_semantics(spark):
    # r9 (r8 verdict ask #4): the invisible-element strip is FUSED into
    # the block split as a delimiter alternation — one page scan. Two
    # documented refinements vs the old replace-then-split chain:
    # (a) a mid-paragraph invisible element now also DELIMITS blocks
    page = (
        "<html><body><p>First half of a perfectly ordinary sentence here"
        "<script>var x = 1;</script>"
        "second half continues with more ordinary words here</p></body></html>"
    )
    df = spark.createDataFrame([(1, page)], ["doc_id", "html"])
    feats = html_block_features(df, "html", "doc_id").collect()
    texts = [r.block_text for r in sorted(feats, key=lambda r: r.block_idx)]
    assert texts == [
        "First half of a perfectly ordinary sentence here",
        "second half continues with more ordinary words here",
    ]
    assert "var x" not in " ".join(texts)  # the script body never leaks
    # (b) block tags now split case-insensitively (HTML tag names are
    # case-insensitive; the old split silently missed uppercase tags)
    page2 = "<HTML><BODY><P>upper case block one here now</P><Div>and a second block text</Div></BODY></HTML>"
    df2 = spark.createDataFrame([(2, page2)], ["doc_id", "html"])
    assert len(html_block_features(df2, "html", "doc_id").collect()) == 2


def test_block_split_tag_names_are_anchored(spark):
    # <path>/<picture>/<param>, <link>/<line>, <track> share prefixes
    # with the block tags p/li/tr but are NOT block-level: they must
    # not split blocks (r7 ADVICE — an inline SVG <path> previously
    # cut its surrounding block in two)
    page = (
        "<html><body><p>The annual report "
        '<svg viewBox="0 0 8 8"><path d="M0 0L8 8"/><line x1="0" y1="8"/></svg> '
        "shows revenue grew by nine percent this year</p></body></html>"
    )
    df = spark.createDataFrame([(1, page)], ["doc_id", "html"])
    feats = html_block_features(df, "html", "doc_id").collect()
    assert len(feats) == 1  # one block, not split at <path>/<line>
    assert feats[0].is_content
    # real block tags with attributes / self-closing slash still split
    page2 = "<html><body><p class='x'>first block here</p><li/>second item text</body></html>"
    df2 = spark.createDataFrame([(2, page2)], ["doc_id", "html"])
    assert len(html_block_features(df2, "html", "doc_id").collect()) == 2


def test_percent_normalize_rfc3986(spark):
    cases = [
        ("/artic%6Ces/1", "/articles/1"),    # unreserved decode (uppercase hex)
        ("/arti%63les/1", "/articles/1"),    # unreserved decode (lowercase hex)
        ("?ref=home%2fstart", "?ref=home%2Fstart"),  # reserved: uppercase only
        ("/a%2Fb", "/a%2Fb"),                # reserved uppercase: unchanged
        ("/100%", "/100%"),                  # dangling % preserved
        ("/a%zzb", "/a%zzb"),                # invalid escape preserved
        ("/%7Euser", "/~user"),              # ~ is unreserved
        ("plain", "plain"),                  # no escapes at all
    ]
    df = spark.createDataFrame(cases, ["part", "want"])
    for r in df.select("want", percent_normalize("part").alias("got")).collect():
        assert r.got == r.want, r


def test_canonicalize_url_percent_variants_collapse(spark):
    variants = [
        "https://news.example.com/articles/1?id=1&ref=home%2Fstart",
        "https://news.example.com/artic%6Ces/1?id=1&ref=home%2fstart",
        "https://news.example.com/arti%63les/1?ref=home%2Fstart&id=1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], ["url"])
    canon = {r.c for r in df.select(canonicalize_url("url").alias("c")).collect()}
    assert canon == {"https://news.example.com/articles/1?id=1&ref=home%2Fstart"}


def test_url_host_default_port_strip_is_scheme_aware(spark):
    cases = [
        ("http://Host.COM:80/x", "host.com"),     # http default stripped
        ("https://host.com:443/x", "host.com"),   # https default stripped
        ("http://host.com:443/x", "host.com:443"),   # NON-default: kept (r7 ADVICE)
        ("https://host.com:80/x", "host.com:80"),    # NON-default: kept
        ("https://host.com:8080/x", "host.com:8080"),
        # userinfo authorities: the default port after the LAST colon
        # must still strip across the user:pw colon (r8 ADVICE — the
        # old [^/?#:]* host class could not reach it)
        ("http://user:pw@host.com:80/x", "user:pw@host.com"),
        ("https://User:PW@Host.COM:443/x", "user:pw@host.com"),
        ("http://user:pw@host.com:443/x", "user:pw@host.com:443"),  # non-default kept
        ("https://user@host.com/x", "user@host.com"),
    ]
    df = spark.createDataFrame(cases, ["url", "want"])
    for r in df.select("want", url_host("url").alias("h")).collect():
        assert r.h == r.want, r


def test_canonicalize_url_merges_mirror_variants(spark):
    variants = [
        "https://News.Example.COM/a/1?id=1&ref=h#top",
        "HTTPS://news.example.com:443/a/1?ref=h&id=1",
        "https://news.example.com/a/1?id=1&utm_source=tw&ref=h",
        "https://news.example.com/a/1?utm_campaign=x&ref=h&id=1#frag",
        "https://news.example.com/a/1?id=1&ref=h",
    ]
    df = spark.createDataFrame([(u,) for u in variants], ["url"])
    canon = {r.c for r in df.select(canonicalize_url("url").alias("c")).collect()}
    assert canon == {"https://news.example.com/a/1?id=1&ref=h"}


def test_canonicalize_url_edge_cases(spark):
    cases = [
        # path case is significant and must be preserved
        ("http://Host.COM:80/CaseSensitive/Path", "http://host.com/CaseSensitive/Path"),
        # non-default port stays
        ("http://host.com:8080/x", "http://host.com:8080/x"),
        # all params tracking -> no '?' at all
        ("https://h.io/p?utm_source=a&gclid=b", "https://h.io/p"),
        # no query, no fragment: unchanged
        ("https://h.io/p", "https://h.io/p"),
    ]
    df = spark.createDataFrame(cases, ["url", "want"])
    rows = df.select("want", canonicalize_url("url").alias("c")).collect()
    for r in rows:
        assert r.c == r.want, r
    host = df.select(url_host("url").alias("h")).collect()
    assert {r.h for r in host} == {"host.com", "host.com:8080", "h.io"}


# ------------------------------------------------------------ properties

from hypothesis import given, settings
from hypothesis import strategies as st

# a URL grammar wide enough to hit every normalization branch: mixed-
# case scheme/host, optional default/non-default port, path segments
# with %-escapes (valid upper/lower, invalid, dangling), tracking and
# content params in shuffled order, optional fragment
_seg = st.text(
    alphabet="abcXYZ019-._~%2Ff6C", min_size=0, max_size=8
)
_urls = st.builds(
    lambda scheme, host, port, segs, params, frag: (
        scheme
        + "://"
        + host
        + port
        + "/"
        + "/".join(segs)
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS", "hTtPs"]),
    host=st.sampled_from(["Ex.COM", "ex.com", "A-b.example.ORG"]),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    segs=st.lists(_seg, max_size=3),
    params=st.lists(
        st.sampled_from(
            ["id=1", "ref=h%2Fx", "ref=h%2fx", "utm_source=t", "gclid=9", "q=%41%7e", "q=%zz"]
        ),
        max_size=4,
        unique=True,
    ),
    frag=st.sampled_from(["", "#top", "#a%2f"]),
)


@settings(max_examples=30, deadline=None)
@given(urls=st.lists(_urls, min_size=1, max_size=8, unique=True))
def test_canonicalize_url_is_idempotent(spark, urls):
    # RFC 3986 §6 normalization is a projection: applying it to its own
    # output must be a no-op (catches unstable param sorting, double
    # percent-decoding, and port-strip/scheme-case interactions)
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(canonicalize_url("url").alias("c"))
    twice = once.select("c", canonicalize_url("c").alias("cc")).collect()
    for r in twice:
        assert r.cc == r.c, (r.c, r.cc)


@settings(max_examples=30, deadline=None)
@given(parts=st.lists(_seg, min_size=1, max_size=8, unique=True))
def test_percent_normalize_is_idempotent(spark, parts):
    df = spark.createDataFrame([(p,) for p in parts], ["p"])
    out = df.select(
        percent_normalize("p").alias("a"),
    ).select("a", percent_normalize("a").alias("b")).collect()
    for r in out:
        assert r.b == r.a, (r.a, r.b)
