"""Adversarial/malformed-payload corpus — mirrors the reference's
hand-built malformed-wire tests (AGENTS.md:134-141, resource_test.go:366-500,
otlpwire_test.go:932-947): wrong types, truncation, duplicates, unknown
fields, out-of-order fields, pathological sizes. Both parser
implementations must agree byte-for-byte on accept/reject AND on every
extracted value (accessor-parity rule, operations.md:25)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from otlp_wire_spark.fixtures import oracle
from otlp_wire_spark.operators.parse import parse_pages

PARSED_COLS = [
    "parsed.severity", "parsed.severity_text", "parsed.attrs",
    "parsed.record_count", "parsed.extracted_text", "parsed.parse_error",
]

CORPUS: list[tuple[str, bytes | None]] = [
    ("empty_page", b""),
    ("null_payload", None),
    ("only_html_shell", b"<html><body></body></html>"),
    ("truncated_mid_marker", b"<html><body>severity=1"),
    ("truncated_mid_value", b"<html><body>kv:k1=v"),
    ("wrong_type_severity", b"<html><body>severity=notanint;</body></html>"),
    ("negative_severity", b"<html><body>severity=-3;</body></html>"),
    ("huge_severity", b"<html><body>severity=99999999999999;</body></html>"),
    ("unknown_marker_skipped", b"<html><body>zzz:whatever;severity=7;</body></html>"),
    ("out_of_order_fields", b"<html><body><rec>r</rec>kv:k=v;severity=3;severity_text=T;</body></html>"),
    ("dup_singular_severity", b"<html><body>severity=2;severity=20;</body></html>"),
    ("triple_dup_key", b"<html><body>kv:a=1;kv:a=2;kv:a=3;</body></html>"),
    ("empty_key", b"<html><body>kv:=v;</body></html>"),
    ("empty_value", b"<html><body>kv:k=;</body></html>"),
    ("unclosed_rec", b"<html><body><rec>r0</rec><rec>unclosed</body></html>"),
    ("nested_rec", b"<html><body><rec>a<rec>b</rec>c</rec></body></html>"),
    ("empty_text_block", b"<html><body><p></p></body></html>"),
    ("two_text_blocks_first_wins", b"<html><body><p>first</p><p>second</p></body></html>"),
    ("multiline_text", b"<html><body><p>line1\nline2</p></body></html>"),
    ("invalid_utf8", b"\xff\xfe\x00broken"),
    ("utf8_cut_multibyte", "<html><body><p>caf".encode() + b"\xc3"),
    ("valid_multibyte", "<html><body>severity=5;<p>café 中文</p></body></html>".encode()),
    ("severity_text_like_prefix", b"<html><body>severity_text=abc;</body></html>"),
    ("giant_flat_page", b"<html><body>" + b"kv:k=v;" * 5000 + b"</body></html>"),
    ("marker_inside_text", b"<html><body><p>severity=9;</p></body></html>"),
]


@pytest.fixture(scope="module")
def corpus_results(spark):
    rows = [(i, name, payload) for i, (name, payload) in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, "id long, name string, html binary")
    out = {}
    for impl in ("expr", "arrow"):
        parsed = parse_pages(df, impl=impl).select("id", "name", *PARSED_COLS)
        out[impl] = {r["name"]: r for r in parsed.collect()}
    return out


def test_both_impls_agree_on_corpus(corpus_results):
    for name in corpus_results["expr"]:
        a, b = corpus_results["expr"][name], corpus_results["arrow"][name]
        assert tuple(a) == tuple(b), name


def test_corpus_matches_python_oracle(corpus_results):
    for i, (name, payload) in enumerate(CORPUS):
        e = oracle.extract(payload)
        r = corpus_results["expr"][name]
        assert r["parse_error"] == e.parse_error, name
        if e.parse_error is None:
            assert r["severity"] == e.severity, name
            assert r["severity_text"] == e.severity_text, name
            assert [(a["key"], a["value"]) for a in r["attrs"]] == e.attrs, name
            assert r["record_count"] == e.record_count, name
            assert r["extracted_text"] == e.extracted_text, name


def test_specific_semantics(corpus_results):
    r = corpus_results["expr"]
    # wrong-typed value is an unknown field → skipped, absent → 0
    assert r["wrong_type_severity"]["severity"] == 0
    # last-value-wins on duplicated singular field
    assert r["dup_singular_severity"]["severity"] == 20
    # enumeration preserves ALL duplicate keys in order
    assert [a["value"] for a in r["triple_dup_key"]["attrs"]] == ["1", "2", "3"]
    # first-match for text blocks (extractBytesField semantics)
    assert r["two_text_blocks_first_wins"]["extracted_text"] == "first"
    # present-but-empty text ≠ absent
    assert r["empty_text_block"]["extracted_text"] == ""
    assert r["only_html_shell"]["extracted_text"] is None
    # unclosed trailing rec is not counted
    assert r["unclosed_rec"]["record_count"] == 1
    # invalid utf8 → quarantined, all fields NULL
    assert r["invalid_utf8"]["parse_error"] == "utf8_decode_error"
    assert r["invalid_utf8"]["severity"] is None
    assert r["null_payload"]["parse_error"] == "null_payload"
    # unknown markers skipped (forward compat), known ones still parsed
    assert r["unknown_marker_skipped"]["severity"] == 7
    # DOTALL: text spans newlines
    assert r["multiline_text"]["extracted_text"] == "line1\nline2"
    assert r["giant_flat_page"]["attrs"] is not None
    assert len(r["giant_flat_page"]["attrs"]) == 5000


# ---------------------------------------------------------------------------
# property-based: random payloads can NEVER make the two implementations
# disagree or the parser throw — only accept (values) or reject (error)
# ---------------------------------------------------------------------------

ascii_junk = st.text(
    alphabet=st.sampled_from(
        list("abcdefghij <>=;:/kv&%$#@!()[]{}\n\tseverity_rcp0123456789")
    ),
    max_size=200,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(ascii_junk, min_size=1, max_size=40))
def test_property_impl_parity_on_random_ascii(spark, payloads):
    rows = [(i, p.encode()) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "id long, html binary")
    a = parse_pages(df, impl="expr").select("id", *PARSED_COLS).collect()
    b = parse_pages(df, impl="arrow").select("id", *PARSED_COLS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # and both agree with the pure-Python oracle
    for row in a:
        e = oracle.extract(rows[row["id"]][1])
        assert row["parse_error"] == e.parse_error
        if e.parse_error is None:
            assert row["severity"] == e.severity
            assert row["record_count"] == e.record_count


@settings(max_examples=20, deadline=None)
@given(st.lists(st.binary(max_size=120), min_size=1, max_size=30))
def test_property_random_bytes_never_crash(spark, payloads):
    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "id long, html binary")
    out = parse_pages(df, impl="expr").select("id", *PARSED_COLS).collect()
    assert len(out) == len(payloads)
    for row in out:
        e = oracle.extract(rows[row["id"]][1])
        assert row["parse_error"] == e.parse_error, rows[row["id"]][1]
