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
from otlp_wire_spark.operators.dedup import exact_dedup_rows


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
