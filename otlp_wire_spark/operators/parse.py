"""Parse stage — ONE vectorized walk per page, many output columns.

Reproduces the reference's extension rule: every accessor reads out of a
single shared walk so two outputs can never disagree on validity
(reference docs/DESIGN.md:139-158,198-210; SeverityText rides
parseLogRecordSeverity's walk, logs.go:121-132). Here that rule is enforced
by construction: one Arrow-batched pandas UDF returns a struct of ALL
extracted columns + ``parse_error``, and downstream stages only ever select
struct fields (Catalyst nested-schema pruning drops the rest at the scan).

Resolution semantics (SURVEY.md §1.4):
- ``severity``       — LAST occurrence wins (extractLastBytesField,
                       wire.go:296-321), 0 when absent (logs.go:116).
- ``severity_text``  — last-wins; NULL=absent vs ''=present-but-empty
                       (logs.go:121-132).
- ``attrs``          — every occurrence, wire order, duplicate keys
                       preserved (forEachRepeatedField, wire.go:106-149).
- ``extracted_text`` — FIRST match (extractBytesField, wire.go:262-294).
- ``parse_error``    — per-row quarantine column; the reference aborts the
                       batch at the first malformed field (wire.go:40-42),
                       which at 10^12 rows becomes per-row fail-fast +
                       exact quarantine counts (SURVEY.md §7).

Everything is Arrow-batched (`ArrowEvalPython` in the physical plan, never
`BatchEvalPython`); the regex loops run in C inside pandas over whole
batches — no per-row Python UDFs (BASELINE input_hint mandate).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SEV_RE = re.compile(r"severity=(\d{1,9});")
_SEVTEXT_RE = re.compile(r"severity_text=([^;]*);")
_KV_RE = re.compile(r"kv:([^=;]*)=([^;]*);")
_REC_RE = re.compile(r"<rec>.*?</rec>")
_TEXT_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_TRACE_RE = re.compile(r"trace_id=([^;]*);")
_TRACE_OK_RE = re.compile(r"[0-9a-f]{32}\Z")
_REF_RE = re.compile(r"ref:([^;]*);")
_DEPTH_RE = re.compile(r"depth:([^;]*);")

MAX_NEST_DEPTH = 64  # reference recursion bound, attributes.go:95-97


def _pushdown_barrier(col: Column) -> Column:
    """Value-identity wrapper that stops the optimizer RE-EVALUATING an
    expensive staged column inside pushed-down filter predicates — the
    expression-path analog of ``udf.asNondeterministic()`` (the classic
    duplicated-BatchEvalPython fix): ``when(monotonically_increasing_id()
    >= 0, col)`` is always ``col`` (the id is non-negative by
    construction), but ``monotonically_increasing_id`` is flagged
    nondeterministic, which makes the alias non-substitutable: Catalyst
    neither inlines it into a pushed filter predicate
    (PushDownPredicate) nor into referencing expressions of a collapsed
    upper projection (CollapseProject) — the wrapped column is computed
    exactly once per row, as written. The guard value is never READ (the
    branch is always taken), so no result depends on physical execution
    metadata — the two-job-consistency rule is untouched. (A ``rand() >=
    -1`` guard does NOT work: Spark 4 bound-reasons Rand's [0,1) range
    and folds the branch away.) Without this, ``quarantine_split`` after
    a parse pushed ``isnull(parse_error)`` below the ``_ps`` projection
    and the predicate re-derived the ENTIRE payload (generation + utf8
    validation) per row — measured ~1.5 s of the 2M-page pipeline
    trial. Pure codegen CASE; zero allocation."""
    return F.when(F.monotonically_increasing_id() >= F.lit(0), col)


def _stage_split_barrier(col: Column, streaming: bool = False) -> Column:
    """_pushdown_barrier PLUS a deliberate whole-stage-codegen BREAK: the
    identity ``transform`` lambda is CodegenFallback, so the projection
    carrying this column cannot fuse with its neighbours. Used on the
    parse stage's ``_ps`` column, where the payload GENERATION expression
    below and the extraction regexes above would otherwise fuse into one
    generated method so large that HotSpot's DontCompileHugeMethods limit
    (8000 bytecodes) refuses to JIT it — the fused stage ran
    interpreted-bytecode at ~3× the cost (2M-page A/B: 3.4 s → 1.6 s;
    lowering spark.sql.codegen.hugeMethodLimit instead recovered this
    stage but regressed every HOF-heavy dedup stage 2-5×, see
    session.py). Costs one 1-element array copy per row — noise next to
    the utf8 validation it wraps.

    ``streaming=True`` swaps the guard for ``shuffle(array(col))[1]``
    (identity on a 1-element array, nondeterministic, so the same
    non-substitutability holds): streaming plans reject
    ``monotonically_increasing_id`` outright
    (UnsupportedOperationChecker), and micro-batches are small enough
    that the JIT stage-split concern does not apply."""
    if streaming:
        return F.element_at(F.shuffle(F.array(col)), 1)
    return F.when(
        F.monotonically_increasing_id() >= F.lit(0),
        F.element_at(F.transform(F.array(col), lambda x: x), 1),
    )


def exploded_nonempty(df, arr: Column, out_name: str, *keep) -> "DataFrame":
    """``explode`` an ATTRIBUTE array column WITHOUT the optimizer's
    inferred pre-filter re-deriving the array inside a pushed predicate
    (r6).

    When the generator input is an attribute of a staged projection, a
    plain ``explode`` makes InferFiltersFromGenerate add ``size(arr) > 0
    AND isnotnull(arr)`` below the Generate; PushDownPredicate then
    pushes that through the staging projections, SUBSTITUTING the
    array's full derivation into the predicate — and a transform
    lambda's outer references re-evaluate per element, so e.g. a shingle
    array's tokenization re-ran once per shingle index (measured 12× on
    the decontamination corpus side: 0.6 s → 7.6 s for a 5k-doc
    explode). ``explode_outer`` is exempt from the inference (it must
    keep non-generating rows), and the ``isnotnull`` filter on the
    GENERATOR OUTPUT cannot be pushed below the Generate that produces
    it — so the array is derived exactly once per row, as staged.
    Identical rows to ``explode`` whenever the array's elements are
    never NULL (all in-repo arrays: built from split/array_join/
    sequence) — empty/NULL arrays yield one null-element row here, which
    the filter drops, where ``explode`` yields none.

    Scope note: the inference rule SKIPS non-attribute generator inputs,
    so ``explode(<expression>)`` sites (vocab_counts, repetition 2-grams,
    the IVF probe) are not affected and keep the plain inner explode —
    its generated loop measured slightly faster (no null branch)."""
    return df.select(
        *keep, F.explode_outer(arr).alias(out_name)
    ).where(F.col(out_name).isNotNull())


def _scan_depth(body: str) -> tuple[int | None, str | None]:
    """(nest_depth, nest_error) for a paren-nested value body — the
    depth-64 recursion guard (P15, attributes.go:95-97) made iterative:
    unbalanced → 'unbalanced', max depth > 64 → 'depth_exceeded'."""
    cur = mx = 0
    bad = False
    for ch in body:
        if ch == "(":
            cur += 1
            if cur > mx:
                mx = cur
        elif ch == ")":
            cur -= 1
            if cur < 0:
                bad = True
    if bad or cur != 0:
        return None, "unbalanced"
    if mx > MAX_NEST_DEPTH:
        return None, "depth_exceeded"
    return mx, None

# trace_id — the fixed-width validated ID analog (reference traces.go:90-124,
# logs.go:249-264: a TraceID must be exactly 16 bytes; wrong size is a
# field-level error, empty means absent). Here: exactly 32 lowercase hex
# chars → value; empty → absent (NULL, no error); anything else present →
# trace_id NULL + trace_error='invalid_trace_id'. Last occurrence wins
# (singular-field semantics, like severity).
#
# ref — the EntityRef structural-validation analog (attributes.go:410-438:
# a 4-string-field sub-message where type and id must be non-empty).
# Here: first `ref:<t>,<i>,<s>,<d>;` marker; exactly 4 comma-separated
# fields AND non-empty t,i → (ref_type, ref_id); structurally malformed →
# ref_error='invalid_ref' (field-level, NOT row quarantine — encoding
# errors quarantine the row, structure errors quarantine the field).
#
# depth — the recursion-bound analog (P15, attributes.go:95-97: semantic
# AnyValue parse capped at depth 64). Here: first `depth:<parens>;` marker,
# nesting measured iteratively; > 64 → nest_error='depth_exceeded',
# unbalanced parens → 'unbalanced' — field-level, like every structural
# failure.

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("severity", T.IntegerType()),
        T.StructField("severity_text", T.StringType()),
        T.StructField(
            "attrs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("record_count", T.IntegerType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("trace_error", T.StringType()),
        T.StructField("ref_type", T.StringType()),
        T.StructField("ref_id", T.StringType()),
        T.StructField("ref_error", T.StringType()),
        T.StructField("nest_depth", T.IntegerType()),
        T.StructField("nest_error", T.StringType()),
        T.StructField("parse_error", T.StringType()),
    ]
)


# Instrumentation for tests: how many rows took the per-row decode retry in
# the most recent _decode_batch call (worker-local; tests call directly).
DECODE_STATS = {"slow_rows": 0, "batches": 0}


def _decode_batch(s: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Decode a Series of bytes → (str Series, error Series).

    Fast path decodes the whole Arrow batch in one shot. A batch containing
    malformed rows is NOT re-decoded per-row wholesale: a second vectorized
    pass with errors='replace' marks only the rows that contain U+FFFD
    (replace only introduces it on malformed input; a row whose replace-
    decode has no U+FFFD is bit-identical to its strict decode), and only
    that suspicious subset pays a per-element strict retry — so a 10k-row
    batch with 1 bad row does ~1 row of Python-loop work, not 10k.
    """
    DECODE_STATS["batches"] += 1
    err = pd.Series([None] * len(s), index=s.index, dtype=object)
    null_mask = s.isna()
    err[null_mask] = "null_payload"
    try:
        dec = s.str.decode("utf-8")
        return dec, err
    except (UnicodeDecodeError, AttributeError):
        pass
    try:
        dec = s.str.decode("utf-8", errors="replace")
        # explicit bool cast: fillna on the object-dtype contains() result
        # downcasts implicitly today and is deprecated (pandas FutureWarning)
        suspicious = (
            dec.str.contains("�", regex=False).astype(object).eq(True)
        )
    except (TypeError, AttributeError):
        # non-bytes objects in the series — full per-row fallback
        dec = pd.Series([None] * len(s), index=s.index, dtype=object)
        suspicious = ~null_mask
    for idx in s.index[suspicious]:
        DECODE_STATS["slow_rows"] += 1
        try:
            dec.at[idx] = bytes(s.at[idx]).decode("utf-8")
        except (UnicodeDecodeError, TypeError):
            dec.at[idx] = None
    err[dec.isna() & ~null_mask] = "utf8_decode_error"
    return dec, err


def _extract_frame(
    html: pd.Series, fields: list[str] | None = None
) -> pd.DataFrame:
    """Arrow-path extraction. ``fields`` prunes WORK, not just columns:
    an unrequested extractor's regex scan never runs — the same
    fields-limiting discipline as parse_pages_expr (without it, a
    fields-limited arrow parse would silently pay full extraction per
    row in the Python worker and subset afterwards)."""
    want = (
        None if fields is None else set(fields) | {"parse_error"}
    )

    def _w(*names: str) -> bool:
        return want is None or bool(want.intersection(names))

    dec, err = _decode_batch(html)
    ok = dec.fillna("")  # errored rows extract over '' then get nulled below
    bad = err.notna()
    cols: dict[str, pd.Series] = {}

    if _w("severity"):
        sev_lists = ok.str.findall(_SEV_RE)
        severity = sev_lists.map(lambda xs: int(xs[-1]) if xs else 0)
        cols["severity"] = severity.mask(bad, None).astype(object)

    if _w("severity_text"):
        text_lists = ok.str.findall(_SEVTEXT_RE)
        severity_text = text_lists.map(lambda xs: xs[-1] if xs else None)
        cols["severity_text"] = severity_text.mask(bad, None).astype(object)

    if _w("attrs"):
        kv_lists = ok.str.findall(_KV_RE)
        attrs = kv_lists.map(
            lambda xs: [{"key": k, "value": v} for k, v in xs]
        )
        cols["attrs"] = attrs.mask(bad, None)

    if _w("record_count"):
        # findall+len (not str.count) so unclosed <rec> blocks don't count —
        # exact parity with the oracle regex on adversarial inputs.
        record_count = ok.str.findall(_REC_RE).map(len)
        cols["record_count"] = record_count.mask(bad, None).astype(object)

    if _w("extracted_text"):
        first_p = ok.str.extract(_TEXT_RE, expand=False)
        cols["extracted_text"] = first_p.mask(bad, None).astype(object)

    if _w("trace_id", "trace_error"):
        # fixed-width validated ID: last-wins, empty→absent, wrong
        # shape→error
        traw = ok.str.findall(_TRACE_RE).map(
            lambda xs: xs[-1] if xs else None
        )
        trace_id = traw.map(
            lambda v: v if v is not None and _TRACE_OK_RE.match(v) else None
        )
        trace_error = traw.map(
            lambda v: "invalid_trace_id"
            if v is not None and v != "" and not _TRACE_OK_RE.match(v)
            else None
        )
        cols["trace_id"] = trace_id.mask(bad, None).astype(object)
        cols["trace_error"] = trace_error.mask(bad, None).astype(object)

    if _w("ref_type", "ref_id", "ref_error"):
        # EntityRef structural validation: first match, 4 fields,
        # t/i non-empty
        def _ref(v: object) -> tuple[str | None, str | None, str | None]:
            if not isinstance(v, str):
                return (None, None, None)
            parts = v.split(",")
            if len(parts) == 4 and parts[0] and parts[1]:
                return (parts[0], parts[1], None)
            return (None, None, "invalid_ref")

        rraw = ok.str.extract(_REF_RE, expand=False)
        refs = rraw.map(_ref)
        cols["ref_type"] = refs.map(lambda t: t[0]).mask(bad, None).astype(object)
        cols["ref_id"] = refs.map(lambda t: t[1]).mask(bad, None).astype(object)
        cols["ref_error"] = refs.map(lambda t: t[2]).mask(bad, None).astype(object)

    if _w("nest_depth", "nest_error"):
        # depth guard: first match, iterative paren scan, bound at 64
        draw = ok.str.extract(_DEPTH_RE, expand=False)
        depths = draw.map(
            lambda v: _scan_depth(v) if isinstance(v, str) else (None, None)
        )
        cols["nest_depth"] = (
            depths.map(lambda t: t[0]).mask(bad, None).astype(object)
        )
        cols["nest_error"] = (
            depths.map(lambda t: t[1]).mask(bad, None).astype(object)
        )

    cols["parse_error"] = err
    return pd.DataFrame(cols)


@F.pandas_udf(PARSED_SCHEMA)
def parse_page_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    for html in it:
        yield _extract_frame(html)


ALL_PARSE_FIELDS = [f.name for f in PARSED_SCHEMA.fields if f.name != "parse_error"]


def parse_pages_expr(
    df: DataFrame, html_col: str = "html", fields: list[str] | None = None
) -> DataFrame:
    """JVM-expression extractor — the default hot path.

    Same contract as ``parse_page_udf`` but built entirely from Spark
    builtins (try_validate_utf8, regexp_extract_all, zip_with): stays inside
    WholeStageCodegen, no Python workers, no Arrow transfer. This is the
    "wire path"; the Arrow UDF is the "decode path" — two independent
    implementations pinned identical by tests/test_parse.py, exactly like
    the reference's wire-vs-pdata parity gate
    (benchmark_comparison_test.go:297-301).

    ``fields`` limits the output struct (parse_error always included).
    Catalyst does NOT prune unused CreateNamedStruct fields here (the
    struct alias is referenced multiple times downstream, so CollapseProject
    keeps it whole) — a pipeline that routes only severity/record_count
    would silently pay for the attrs/text/trace/ref regex scans too. Listing
    the fields you read drops those scans from the plan entirely (pinned by
    tests/test_parse.py::test_fields_subset_prunes_unused_scans).

    Shared intermediates are STAGED as projection aliases before the struct
    is built: Catalyst re-evaluates non-attribute expressions per reference,
    so without staging the utf8 validation would re-scan the payload once
    per extractor, the trace raw value twice, the ref split three times and
    the depth char-fold twice (the same hazard class fixed in dedup.py).
    """
    selected = [f for f in ALL_PARSE_FIELDS if fields is None or f in fields]
    # helper staging columns are added with fixed names and dropped at the
    # end — an input column with one of these names would be silently
    # overwritten and destroyed; fail loudly instead
    _helper_names = ("_ps", "_ptraw", "_prraw", "_prparts", "_pdraw", "_pdscan")
    clash = [c for c in _helper_names if c in df.columns]
    if clash:
        raise ValueError(
            f"parse_pages_expr: input columns {clash} collide with internal "
            "staging names; rename them before parsing"
        )
    h = F.col(html_col)
    staged = df.withColumn(
        "_ps",
        _stage_split_barrier(
            F.expr(f"try_validate_utf8({html_col})"), streaming=df.isStreaming
        ),
    )
    helpers = ["_ps"]
    s = F.col("_ps")
    err = (
        F.when(h.isNull(), F.lit("null_payload"))
        .when(s.isNull(), F.lit("utf8_decode_error"))
        .otherwise(F.lit(None).cast("string"))
    )

    def _severity() -> Column:
        sevs = F.regexp_extract_all(s, F.lit(r"severity=(\d{1,9});"), F.lit(1))
        return F.coalesce(F.try_element_at(sevs, F.lit(-1)).cast("int"), F.lit(0))

    def _severity_text() -> Column:
        texts = F.regexp_extract_all(s, F.lit(r"severity_text=([^;]*);"), F.lit(1))
        return F.try_element_at(texts, F.lit(-1))

    def _attrs() -> Column:
        keys = F.regexp_extract_all(s, F.lit(r"kv:([^=;]*)=[^;]*;"), F.lit(1))
        vals = F.regexp_extract_all(s, F.lit(r"kv:[^=;]*=([^;]*);"), F.lit(1))
        return F.zip_with(
            keys, vals, lambda k, v: F.struct(k.alias("key"), v.alias("value"))
        )

    def _record_count() -> Column:
        return F.size(F.regexp_extract_all(s, F.lit(r"<rec>.*?</rec>"), F.lit(0)))

    def _extracted_text() -> Column:
        return F.try_element_at(
            F.regexp_extract_all(s, F.lit(r"(?s)<p>(.*?)</p>"), F.lit(1)), F.lit(1)
        )

    # trace_id: last-wins; exactly 32 lowercase hex → valid, '' → absent,
    # anything else → field-level error (traces.go:90-124 analog).
    # \z (strict end) not $ — Java's $ matches before a trailing newline,
    # Python's \Z (the oracle anchor) does not; [^;]* can capture \n
    if {"trace_id", "trace_error"} & set(selected):
        staged = staged.withColumn(
            "_ptraw",
            F.try_element_at(
                F.regexp_extract_all(s, F.lit(r"trace_id=([^;]*);"), F.lit(1)),
                F.lit(-1),
            ),
        )
        helpers.append("_ptraw")

    def _trace_id() -> Column:
        traw = F.col("_ptraw")
        return F.when(traw.rlike(r"^[0-9a-f]{32}\z"), traw)

    def _trace_error() -> Column:
        traw = F.col("_ptraw")
        return F.when(
            traw.isNotNull() & (traw != "") & ~traw.rlike(r"^[0-9a-f]{32}\z"),
            F.lit("invalid_trace_id"),
        )

    # ref: first match; 4 comma-fields with non-empty type+id
    # (attributes.go:410-438 analog)
    if {"ref_type", "ref_id", "ref_error"} & set(selected):
        staged = staged.withColumn(
            "_prraw",
            F.try_element_at(
                F.regexp_extract_all(s, F.lit(r"ref:([^;]*);"), F.lit(1)),
                F.lit(1),
            ),
        ).withColumn("_prparts", F.split(F.col("_prraw"), ",", -1))
        helpers.extend(["_prraw", "_prparts"])

    def _rok() -> Column:
        parts = F.col("_prparts")
        p1 = F.try_element_at(parts, F.lit(1))
        p2 = F.try_element_at(parts, F.lit(2))
        return (F.size(parts) == 4) & (p1 != "") & (p2 != "")

    def _ref_type() -> Column:
        return F.when(
            F.col("_prraw").isNotNull() & _rok(),
            F.try_element_at(F.col("_prparts"), F.lit(1)),
        )

    def _ref_id() -> Column:
        return F.when(
            F.col("_prraw").isNotNull() & _rok(),
            F.try_element_at(F.col("_prparts"), F.lit(2)),
        )

    def _ref_error() -> Column:
        return F.when(
            F.col("_prraw").isNotNull() & ~_rok(), F.lit("invalid_ref")
        )

    # depth guard (P15): iterative paren scan as an aggregate fold over the
    # body's characters — cur/max/bad accumulator, bound at 64; the scan
    # struct is staged so nest_depth and nest_error share ONE fold
    if {"nest_depth", "nest_error"} & set(selected):
        staged = staged.withColumn(
            "_pdraw",
            F.try_element_at(
                F.regexp_extract_all(s, F.lit(r"depth:([^;]*);"), F.lit(1)),
                F.lit(1),
            ),
        )
        delta = lambda ch: (  # noqa: E731
            F.when(ch == "(", 1).when(ch == ")", -1).otherwise(0)
        )
        scan = F.aggregate(
            F.split(F.col("_pdraw"), ""),
            F.struct(
                F.lit(0).alias("cur"), F.lit(0).alias("mx"), F.lit(False).alias("bad")
            ),
            lambda acc, ch: F.struct(
                (acc["cur"] + delta(ch)).alias("cur"),
                F.greatest(
                    acc["mx"], acc["cur"] + F.when(ch == "(", 1).otherwise(0)
                ).alias("mx"),
                (acc["bad"] | ((acc["cur"] + delta(ch)) < 0)).alias("bad"),
            ),
        )
        staged = staged.withColumn("_pdscan", scan)
        helpers.extend(["_pdraw", "_pdscan"])

    def _unbalanced() -> Column:
        sc = F.col("_pdscan")
        return sc["bad"] | (sc["cur"] != 0)

    def _nest_depth() -> Column:
        return F.when(
            F.col("_pdraw").isNotNull()
            & ~_unbalanced()
            & (F.col("_pdscan")["mx"] <= MAX_NEST_DEPTH),
            F.col("_pdscan")["mx"],
        ).cast("int")

    def _nest_error() -> Column:
        return F.when(
            F.col("_pdraw").isNotNull() & _unbalanced(), F.lit("unbalanced")
        ).when(
            F.col("_pdraw").isNotNull()
            & (F.col("_pdscan")["mx"] > MAX_NEST_DEPTH),
            F.lit("depth_exceeded"),
        )

    builders = {
        "severity": _severity,
        "severity_text": _severity_text,
        "attrs": _attrs,
        "record_count": _record_count,
        "extracted_text": _extracted_text,
        "trace_id": _trace_id,
        "trace_error": _trace_error,
        "ref_type": _ref_type,
        "ref_id": _ref_id,
        "ref_error": _ref_error,
        "nest_depth": _nest_depth,
        "nest_error": _nest_error,
    }
    ok = err.isNull()
    parsed = F.struct(
        *[F.when(ok, builders[name]()).alias(name) for name in selected],
        err.alias("parse_error"),
    )
    return staged.withColumn("parsed", parsed).drop(*helpers)


def parse_pages(
    df: DataFrame,
    html_col: str = "html",
    impl: str = "expr",
    fields: list[str] | None = None,
) -> DataFrame:
    """Attach the parsed struct. ``impl='expr'`` (default) uses the JVM
    codegen path; ``impl='arrow'`` uses the Arrow UDF path (for payloads
    whose grammar outgrows Java regex — grok-style extraction).

    Pass ``fields`` with the columns you actually consume — Catalyst keeps
    the whole struct alive once it's multi-referenced, so unlisted fields'
    extraction work is otherwise computed and discarded (see
    parse_pages_expr). parse_error is always included."""
    if impl == "expr":
        return parse_pages_expr(df, html_col, fields)
    if fields is None:
        return df.withColumn("parsed", parse_page_udf(F.col(html_col)))
    keep = [f for f in ALL_PARSE_FIELDS if f in fields] + ["parse_error"]
    schema = T.StructType([f for f in PARSED_SCHEMA.fields if f.name in keep])

    @F.pandas_udf(schema)
    def _subset_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for html in it:
            yield _extract_frame(html, keep)[[f.name for f in schema.fields]]

    return df.withColumn("parsed", _subset_udf(F.col(html_col)))


# ---------------------------------------------------------------------------
# I8 — type-DEPENDENT attribute field resolution (reference metrics.go:17-53:
# the DataPoint attributes field NUMBER depends on the metric body type —
# histogram→field 9, exponential-histogram→field 1, everything else→field 7 —
# and downstream consumers see ONE uniform attrs view). Analog grammar:
# ``<rec t=N>f1=..;f7=..;f9=..;</rec>`` where the rec's attr payload lives in
# f9 when t=2, f1 when t=3, f7 otherwise; both parser implementations
# normalize to a uniform array<struct<rec_type,attr>>.
# ---------------------------------------------------------------------------

TYPED_RECS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("rec_type", T.IntegerType()),
            T.StructField("attr", T.StringType()),
        ]
    )
)

ATTR_FIELD_BY_TYPE = {2: 9, 3: 1}  # default 7 — mirrors metrics.go:17-53

_TREC_FULL_RE = re.compile(r"<rec t=\d>.*?</rec>")
_TREC_T_RE = re.compile(r"<rec t=(\d)>")
_TREC_F_RES = {
    1: re.compile(r"f1=([^;]*);"),
    7: re.compile(r"f7=([^;]*);"),
    9: re.compile(r"f9=([^;]*);"),
}


def _typed_recs_of(s: str) -> list[dict]:
    out = []
    for rec in _TREC_FULL_RE.findall(s):
        t = int(_TREC_T_RE.match(rec).group(1))
        m = _TREC_F_RES[ATTR_FIELD_BY_TYPE.get(t, 7)].search(rec)
        # missing selected field → '' (mirror of regexp_extract's no-match)
        out.append({"rec_type": t, "attr": m.group(1) if m else ""})
    return out


@F.pandas_udf(TYPED_RECS_SCHEMA)
def typed_recs_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for html in it:
        dec, err = _decode_batch(html)
        recs = dec.fillna("").map(_typed_recs_of)
        yield recs.mask(err.notna(), None)


def typed_recs_expr(s: Column) -> Column:
    recs = F.regexp_extract_all(s, F.lit(r"<rec t=\d>.*?</rec>"), F.lit(0))

    def one(r: Column) -> Column:
        t = F.regexp_extract(r, r"<rec t=(\d)>", 1).cast("int")
        f1 = F.regexp_extract(r, r"f1=([^;]*);", 1)
        f7 = F.regexp_extract(r, r"f7=([^;]*);", 1)
        f9 = F.regexp_extract(r, r"f9=([^;]*);", 1)
        attr = F.when(t == 2, f9).when(t == 3, f1).otherwise(f7)
        return F.struct(t.alias("rec_type"), attr.alias("attr"))

    return F.transform(recs, one)


def parse_typed_records(
    df: DataFrame, html_col: str = "html", impl: str = "expr"
) -> DataFrame:
    """Attach ``typed_recs`` — the uniform attrs view over type-dependent
    field locations. NULL on undecodable payloads (same quarantine contract
    as the main parse). Two impls, parity-pinned like parse_pages."""
    if impl == "expr":
        s = F.expr(f"try_validate_utf8({html_col})")
        return df.withColumn(
            "typed_recs", F.when(s.isNotNull(), typed_recs_expr(s))
        )
    return df.withColumn("typed_recs", typed_recs_udf(F.col(html_col)))


def attr_first_value(attrs_col: Column, key: str) -> Column:
    """FIRST value for a duplicate key — pdata-map lookup semantics
    (reference attributes.go:336-404). Position-keyed, never row-order-keyed
    (SURVEY.md §2.5): `filter` preserves array (wire) order, element 1 is
    the first occurrence. try_element_at → NULL when absent (the found-flag
    of attributes.go:64-74)."""
    return F.try_element_at(
        F.filter(attrs_col, lambda kv: kv["key"] == key), F.lit(1)
    )["value"]


def attr_last_value(attrs_col: Column, key: str) -> Column:
    """LAST value — extractLastBytesField semantics (wire.go:296-321)."""
    return F.try_element_at(
        F.filter(attrs_col, lambda kv: kv["key"] == key), F.lit(-1)
    )["value"]


def attrs_merged(attrs_col: Column) -> Column:
    """All occurrences concatenated in wire order — the merge semantics of
    singular messages (extractMergedMessage, wire.go:171-260): duplicates
    preserved on enumeration (resource_test.go:287-333)."""
    return F.array_join(
        F.transform(attrs_col, lambda kv: F.concat_ws("=", kv["key"], kv["value"])),
        ";",
    )
