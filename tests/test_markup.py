"""HTML main-content extraction (llm/markup.py): crafted
boilerplate-vs-content fixtures for the Kohlschütter-style shallow
classifier — the cases a density/word-count extractor must get right."""

from __future__ import annotations

import pytest

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.markup import (
    extract_main_content,
    html_block_features,
    strip_tags,
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
