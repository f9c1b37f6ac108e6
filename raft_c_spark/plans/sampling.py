"""Driver-facing deterministic-sampling queries over ``documents`` —
the data-mixing step of a training-data recipe, oracle-checked
bit-for-bit because the sampling key is a content hash (md5) both
engines compute identically.
"""

from __future__ import annotations

from raft_c_spark.operators import sampling
from raft_c_spark.sources.testdata import load_table

#: mixture recipe: oversample the low-resource languages, downsample
#: English — the standard rebalancing shape of an LLM data mixture
MIX = {"en": 0.25, "zh": 0.8, "es": 0.6, "de": 0.6, "fr": 0.6}
PER_SOURCE_K = 12


def q_ds_mixture_sample(spark, sf_dir):
    """Per-language hash-Bernoulli mixture sample of the documents
    table: deterministic, repartition-stable, nested (raising a rate
    keeps previously selected rows) — pure filter, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_fraction_sample(
        docs, "doc_id", strata_col="lang", fractions=MIX
    ).select("doc_id", "lang", "source", "n_chars")


def q_ds_source_topk(spark, sf_dir):
    """Exactly k docs per source by hash order — deterministic
    per-stratum reservoir sampling (windowed top-k, one shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.stratified_topk_sample(
        docs, "doc_id", "source", PER_SOURCE_K
    ).select("doc_id", "lang", "source", "n_chars")


PACK_BUDGET = 4096


def q_ds_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing of the documents stream (doc_id
    order, n_chars as the length) into 4096-char training bins —
    exact distributed prefix sums, partitioning-independent."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.pack_sequences(
        docs, "doc_id", "n_chars", PACK_BUDGET
    ).select("doc_id", "n_chars", "seq_start", "bin", "bin_offset")


QUERIES = {
    "ds_mixture_sample": q_ds_mixture_sample,
    "ds_source_topk": q_ds_source_topk,
    "ds_pack_sequences": q_ds_pack_sequences,
}

_KEY = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)"


def _thr(frac: float) -> str:
    t = int(frac * 16**6)
    return "'g'" if t >= 16**6 else f"'{format(t, '06x')}'"


_CASE = "CASE " + " ".join(
    f"WHEN lang = '{v}' THEN {_thr(f)}" for v, f in sorted(MIX.items())
) + f" ELSE {_thr(0.0)} END"

ORACLES = {
    "ds_mixture_sample": f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE {_KEY} < {_CASE}
    """,
    "ds_source_topk": f"""
        SELECT doc_id, lang, source, n_chars FROM (
            SELECT doc_id, lang, source, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY {_KEY}, doc_id
                   ) AS rk
            FROM documents
        )
        WHERE rk <= {PER_SOURCE_K}
    """,
    "ds_pack_sequences": f"""
        SELECT doc_id, n_chars,
               CAST(SUM(n_chars) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_chars AS BIGINT) AS seq_start,
               CAST((SUM(n_chars) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_chars) // {PACK_BUDGET} AS BIGINT) AS bin,
               CAST((SUM(n_chars) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_chars) % {PACK_BUDGET} AS BIGINT) AS bin_offset
        FROM documents
    """,
}
