"""C4-style line cleaning tests (operators/cleaning.py)."""

import pytest

from valentinus_spark.operators.cleaning import clean_lines, line_filter_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 3 good lines, one too-short, one without punctuation
        (1, "This is a fine sentence.\nToo short.\nno terminal punct here at all\nAnother proper line stays in!\nIs this kept as well?"),
        # doc-level blocklist hit
        (2, "Totally fine first sentence.\nBut lorem ipsum dolor sit amet.\nMore fine text here."),
        # everything filtered at line level -> doc dropped via min_kept_lines
        (3, "short one\ntiny\nnope"),
        # line blocklist
        (4, "Please enable javascript to continue browsing.\nReal content sentence number one.\nReal content sentence number two."),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_clean_lines_rules(docs):
    out = {
        r["doc_id"]: r
        for r in clean_lines(
            docs,
            min_words=4,
            require_terminal_punct=True,
            drop_line_patterns=["javascript"],
            drop_doc_patterns=["lorem ipsum"],
            min_kept_lines=1,
        ).collect()
    }
    # doc 2 dropped wholesale (lorem ipsum), doc 3 has no surviving lines
    assert set(out) == {1, 4}
    assert out[1]["text"] == (
        "This is a fine sentence.\nAnother proper line stays in!\nIs this kept as well?"
    )
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (5, 3)
    # javascript line dropped, both real lines kept
    assert out[4]["n_kept"] == 2
    assert "javascript" not in out[4]["text"]
    assert out[4]["n_chars_clean"] == len(out[4]["text"])


def test_clean_lines_min_kept(docs):
    out = clean_lines(
        docs,
        min_words=4,
        require_terminal_punct=True,
        drop_line_patterns=["javascript"],
        drop_doc_patterns=["lorem ipsum"],
        min_kept_lines=3,
    ).collect()
    # only doc 1 keeps >= 3 lines
    assert [r["doc_id"] for r in out] == [1]


def test_clean_lines_no_punct_requirement(docs):
    out = {
        r["doc_id"]: r
        for r in clean_lines(docs, min_words=4, require_terminal_punct=False).collect()
    }
    # 'no terminal punct here at all' now survives in doc 1
    assert out[1]["n_kept"] == 4


def test_line_filter_stats_attribution(docs):
    row = line_filter_stats(
        docs,
        min_words=4,
        require_terminal_punct=True,
        drop_line_patterns=["javascript"],
    ).collect()[0]
    assert row["total_lines"] == 14
    assert (
        row["kept_lines"]
        + row["dropped_short"]
        + row["dropped_no_punct"]
        + row["dropped_blocklist"]
        == 14
    )
    # doc1: 3 kept; doc2: 3 kept (stats has no doc-level rule); doc4: 2 kept
    assert row["kept_lines"] == 8
    assert row["dropped_blocklist"] == 1


def test_clean_lines_whitespace_word_count(spark):
    df = spark.createDataFrame(
        [(1, "  padded   with    gaps   here.  \nok.")], "doc_id int, text string"
    )
    out = clean_lines(df, min_words=4, require_terminal_punct=True).collect()
    # normalized word count sees 4 words despite irregular spacing
    assert out[0]["n_kept"] == 1


def test_clean_lines_single_scan_no_shuffle(docs):
    plan = clean_lines(docs, min_words=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
