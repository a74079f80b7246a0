"""Corpus curation — the composed training-data filter a 100 TB run
actually executes: score every document (language, quality, token count),
keep the ones a model should train on, then exact-dedup the survivors
keeping full rows.

Shape at scale: scoring is a narrow codegen'd scan (zero shuffle); the only
wide op is the single dedup hash-shuffle on md5(text). Near-dup removal
(MinHash+LSH, dedup.near_dup_pairs) composes downstream on the survivors —
kept separate because its candidate verification is a different cost class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otlp_wire_spark.operators import textstats
from otlp_wire_spark.operators.dedup import _shingled, exact_dedup_rows

# Conservative, engine-portable redaction patterns (same RE semantics in
# Java regex and DuckDB's RE2): no backrefs, no lookaround, explicit classes.
REDACTION_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9 ()-]{7,}[0-9]", "<PHONE>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def redact_text(text_col: F.Column) -> F.Column:
    """PII-style scrubbing: replace email/phone/IPv4 shapes with typed
    placeholders — pure regexp_replace chain, codegen'd, zero shuffle.
    Patterns are deliberately lookaround-free so the DuckDB oracle applies
    the literally identical regexes."""
    out = text_col
    for _, pat, repl in REDACTION_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: ids of corpus documents sharing ANY word
    n-gram with the benchmark set. Distributed shape: explode both sides to
    (shingle) rows and LEFT SEMI join on the shingle — the benchmark side
    is deduplicated first and is tiny in practice (broadcast-able), the
    corpus is never collected or re-scanned."""
    c = _shingled(corpus, id_col, text_col, n).select(
        "id", F.explode("sh").alias("g")
    )
    b = (
        _shingled(benchmark, id_col, text_col, n)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    return (
        c.join(F.broadcast(b), "g", "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )


def score_documents(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach pred_lang / quality (unrounded double) / n_tokens — narrow
    projections, no shuffle. Tokenization runs ONCE per row: the token
    array (and its lowercased twin) are materialized as projection aliases
    and every scorer reads the columns (the single-column scorer forms
    would re-run the regex split per reference — ~10× per row)."""
    t = F.col(text_col)
    tokd = df.withColumn("_toks", textstats.tokens_norm_col(t)).withColumn(
        "_tl", F.transform(F.col("_toks"), F.lower)
    )
    return (
        tokd.withColumn("pred_lang", textstats.lang_id_from_tokens(F.col("_tl")))
        .withColumn(
            "quality",
            textstats.quality_from_tokens(t, F.col("_toks"), F.col("_tl")),
        )
        .withColumn("n_tokens", F.size(F.col("_toks")).cast("int"))
        .drop("_toks", "_tl")
    )


def curate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    min_tokens: int = 3,
) -> DataFrame:
    """Surviving full rows (+ score columns) after language / quality /
    length filters and exact dedup (min-id representative). The quality
    threshold compares the RAW double — identical IEEE arithmetic on both
    engines — while outputs are floor-quantized at the edge (textstats
    notes on cross-engine rounding)."""
    scored = score_documents(df, text_col)
    kept = scored.where(
        F.col("pred_lang").isin(*langs)
        & (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    )
    return exact_dedup_rows(kept, text_col, id_col)
