"""Boundary-whitespace tokenizer semantics, pinned cross-engine on an
ADVERSARIAL corpus (the graded testdata contains no boundary whitespace,
so the registry parity runs can never catch a tokenizer/oracle pair that
are wrong in the same way — these rows exist to make the semantics
falsifiable): "hello\\n" is ONE token, "\\t" is ZERO, newline-terminated
text has wc-l line counts. Spark and DuckDB must agree on the CORRECT
values, not merely on each other."""

from __future__ import annotations

import math

import duckdb
import pytest

import pyspark.sql.functions as F

from otlp_wire_spark.queries_ext import (
    SQL_QUALITY_SCORES,
    SQL_REPETITION_STATS,
    SQL_TOKEN_STATS,
    SQL_VOCAB_TOPK,
    q_quality_scores,
    q_repetition_stats,
    q_token_stats,
    q_vocab_topk,
)

ROWS = [
    (0, "hello world"),
    (1, "hello\n"),            # newline-terminated: 1 token, 1 line
    (2, "\t"),                 # whitespace-only: 0 tokens
    (3, "\n\n"),               # 0 tokens; 2 empty LINES (1 duplicate)
    (4, " the  cat\tsat \n"),  # 3 tokens despite boundary mess
    (5, None),
    (6, ""),
    (7, "a\nb\n"),             # wc -l convention: 2 lines
    (8, "x\n\n\n"),            # 3 lines (interior blanks count), 1 dup
    (9, "one\ttwo\nthree four"),
    # \x0B (vertical tab): Java regex \s INCLUDES it, RE2 (DuckDB) \s
    # does NOT — the explicit WS_CLASS both engines now interpolate must
    # make them agree that it is whitespace (these rows fail against any
    # \s-shorthand mirror)
    (10, "a\x0Bb"),            # 2 tokens, 1 line
    (11, "\x0Bx\x0B"),         # 1 token despite \x0B boundaries
    (12, "\x0B"),              # whitespace-only: 0 tokens
    # unicode casing: JDK lower() folds İ→i+U+0307 and ΑΣ→ας (contextual
    # final sigma) where utf8proc gives istanbul/ασ — so "İN" counts as
    # the stopword "in" in exactly one engine. ascii_lower (translate)
    # makes membership folding identical by construction; this row fails
    # against any lower()-based scorer or mirror.
    (13, "İN the ΑΣ of"),      # 4 tokens; 2 stopword hits in BOTH engines
    # supplementary-plane + combining chars: Java regex and RE2 must both
    # treat 👍 (U+1F44D) and 🏽 (U+1F3FD) as ONE code point each in the
    # BPE-ish [^...] class, and length() must count code points (10 here)
    (14, "héllo… 👍🏽!"),       # 2 ws tokens; n_re pinned cross-engine
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ws_corpus")
    spark.createDataFrame(ROWS, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(corpus_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{corpus_dir}/documents.parquet/*.parquet'"
    )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    if isinstance(v, int):
        return float(v)
    return v


def _both(spark, duck, corpus_dir, q, sql):
    df = q(spark, corpus_dir)
    cols = df.columns
    got = sorted(tuple(_norm(x) for x in r) for r in df.collect())
    res = duck.execute(sql)
    assert [c[0] for c in res.description] == cols
    want = sorted(tuple(_norm(x) for x in r) for r in res.fetchall())
    return got, want


def test_ws_token_counts_pinned_and_mirrored(spark, duck, corpus_dir):
    got, want = _both(spark, duck, corpus_dir, q_token_stats, SQL_TOKEN_STATS)
    assert got == want
    n_ws = {int(r[0]): int(r[1]) for r in got}
    assert n_ws == {
        0: 2, 1: 1, 2: 0, 3: 0, 4: 3, 5: 0, 6: 0, 7: 2, 8: 1, 9: 4,
        10: 2, 11: 1, 12: 0, 13: 4, 14: 2,
    }


def test_line_counts_pinned_and_mirrored(spark, duck, corpus_dir):
    got, want = _both(
        spark, duck, corpus_dir, q_repetition_stats, SQL_REPETITION_STATS
    )
    assert got == want
    by_id = {int(r[0]): r for r in got}
    n_lines = {k: int(v[1]) for k, v in by_id.items()}
    assert n_lines == {
        0: 1, 1: 1, 2: 1, 3: 2, 4: 1, 5: 0, 6: 0, 7: 2, 8: 3, 9: 2,
        10: 1, 11: 1, 12: 1, 13: 1, 14: 1,
    }
    # "\n\n" = two empty lines, one a duplicate of the other
    assert int(by_id[3][2]) == 5000
    # "x\n\n\n" = [x, '', ''] — one duplicate among three lines
    assert int(by_id[8][2]) == 3333


def test_quality_scores_mirrored_on_boundary_ws(spark, duck, corpus_dir):
    got, want = _both(
        spark, duck, corpus_dir, q_quality_scores, SQL_QUALITY_SCORES
    )
    assert got == want
    q4 = {int(r[0]): r for r in got}
    for empty_doc in (2, 3, 5, 6, 12):  # zero tokens ⇒ quality exactly 0
        assert int(q4[empty_doc][-1]) == 0
    # row 13 "İN the ΑΣ of": ascii_lower makes 'İN' a NON-stopword in both
    # engines (JDK lower() would miss 'in', utf8proc would hit it) — so
    # stop_ratio is exactly 2/4 and quality_q4 is the pinned 2300
    # (0.5·4/100 + 0.3·(1−0.5) + 0.2·3/10); pred_lang 'en' via the+of
    assert q4[13][1] == "en" and int(q4[13][-1]) == 2300, q4[13]
    # row 14: 2 tokens, 0 stopwords, 10 code points → 0.5·0.02 + 0.3·1 +
    # 0.2·0.5 = 0.41 → 4100; both engines must count the emoji sequence
    # as code points, not graphemes or UTF-16 units
    assert q4[14][1] == "unknown" and int(q4[14][-1]) == 4100, q4[14]


def test_vocab_sees_no_phantom_empty_token(spark, duck, corpus_dir):
    got, want = _both(spark, duck, corpus_dir, q_vocab_topk, SQL_VOCAB_TOPK)
    assert got == want
    tokens = {r[-2] if isinstance(r[-2], str) else r[0] for r in got}
    assert "" not in tokens
