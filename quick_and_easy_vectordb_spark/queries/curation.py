"""Training-data curation queries: deterministic weighted sampling,
corpus-statistics vocabulary pruning, and bigram language-model
scoring. These are the "decide what goes into the training mix" ops a
large-scale pipeline runs after dedup/quality filtering (the reference
has no notion of any of this — app.py:1-193 is search-only).

Cross-engine determinism notes (the reason these look the way they
do):
- the sampler is pure *integer* arithmetic — a Knuth multiplicative
  hash compared by cross-multiplication, no doubles anywhere, so the
  sampled set is identical on any engine at any parallelism;
- vocabulary pruning thresholds on ``count * n_distinct < total``
  (integer cross-multiply) instead of ``count < total/n_distinct``
  (double division);
- bigram probabilities divide two BIGINTs into a double (one exact
  operation) and are averaged via the decimal-exact dsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.numeric import dsum
from quick_and_easy_vectordb_spark.functions.text import tokens
from quick_and_easy_vectordb_spark.operators.util import ensure_parallelism
from quick_and_easy_vectordb_spark.queries.registry import query
from quick_and_easy_vectordb_spark.queries.text import SQL_NORM
from quick_and_easy_vectordb_spark.sources.catalog import load_table

# Knuth's 2^32 multiplicative-hash constant; doc_id * KNUTH mod 2^32
# is a well-mixed pseudo-uniform draw in [0, 2^32).
_KNUTH = 2654435761
_M32 = 4294967296


@query(
    "text_weighted_sample",
    oracle=f"""
SELECT doc_id, n_chars
FROM documents
WHERE (doc_id * {_KNUTH}) % {_M32} * (SELECT MAX(n_chars) FROM documents)
      < n_chars * {_M32}
""",
    tags=("pipeline", "sampling", "curation"),
)
def text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted Bernoulli sample: document kept with
    probability n_chars / max(n_chars) — the "sample long documents
    preferentially" curation primitive. The draw is a deterministic
    multiplicative hash of doc_id and the acceptance test is the
    cross-multiplied integer inequality
    ``hash * max_chars < n_chars * 2^32`` — no floating point, so
    membership is reproducible across engines, runs, and partition
    counts (products stay < 2^63: hash < 2^32, n_chars fixture-bounded).

    Plan: the 1-row MAX aggregate broadcasts back; the filter itself
    is per-row scan-side arithmetic — no shuffle of the corpus."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    mx = docs.agg(F.max("n_chars").alias("_mx"))
    draw = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_M32)
    return (
        docs.join(F.broadcast(mx))
        .filter(draw * F.col("_mx") < F.col("n_chars") * F.lit(_M32))
        .select("doc_id", "n_chars")
    )


@query(
    "text_vocab_prune",
    oracle=f"""
WITH d AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
         generate_subscripts(string_split(t, ' '), 1) AS pos
  FROM d WHERE t <> ''
),
counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok),
stats AS (
  SELECT CAST(SUM(c) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM counts
),
vocab AS (SELECT tok FROM counts, stats WHERE c * n_distinct < total),
kept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS pruned_text,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM tok t JOIN vocab v USING (tok)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(k.pruned_text, '') AS pruned_text,
       COALESCE(k.n_kept, 0) AS n_kept
FROM documents d
LEFT JOIN kept k ON d.doc_id = k.doc_id
""",
    tags=("pipeline", "vocab", "curation"),
)
def text_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics vocabulary pruning: drop every token whose
    corpus frequency is above the mean distinct-token frequency
    (aggressive high-frequency filtering — the corpus-driven analog
    of stopword removal), reconstructing each document's remaining
    text in original token order. Documents pruned to nothing stay in
    the output with empty text (LEFT join back to the full table).

    The threshold compares ``c * n_distinct < total`` in integers —
    no division, so vocabulary membership can't drift by an ulp.

    Plan: posexplode → one shuffle for token counts (map-side combine
    collapses to |vocab| rows per partition first); the tiny vocab
    broadcasts back onto the exploded stream; one shuffle to re-group
    per doc. Reconstruction sorts (pos, tok) structs inside each
    group — collect_list order is partition-dependent, array_sort
    makes it canonical."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    stats = counts.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    vocab = (
        counts.join(F.broadcast(stats))
        .filter(F.col("c") * F.col("n_distinct") < F.col("total"))
        .select("tok")
    )
    kept = (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("pruned_text"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
    )
    return (
        docs.select("doc_id")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pruned_text", F.lit("")).alias("pruned_text"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


@query(
    "text_bigram_lm_score",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split({SQL_NORM}, ' ') AS w FROM documents
           WHERE {SQL_NORM} <> ''),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM d WHERE len(w) >= 2
),
cab AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_ab FROM bg GROUP BY bigram),
ca AS (
  SELECT split_part(bigram, ' ', 1) AS prefix, CAST(SUM(n_ab) AS BIGINT) AS n_a
  FROM cab GROUP BY prefix
)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(CAST(SUM(CAST(CAST(c.n_ab AS DOUBLE) / a.n_a AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS avg_bigram_p
FROM bg g
JOIN cab c USING (bigram)
JOIN ca a ON split_part(g.bigram, ' ', 1) = a.prefix
GROUP BY g.doc_id
""",
    tags=("pipeline", "ngram", "lm", "curation"),
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model fluency score per document: train MLE
    bigram probabilities p(b|a) = C(a,b)/C(a·) on the corpus itself,
    then score each document by its mean bigram probability. High =
    typical word transitions, low = anomalous text — the linear-space
    stand-in for perplexity (no log: ln() is 1-ulp engine-dependent,
    SURVEY determinism rules; the linear mean ranks identically for
    filtering purposes).

    Each probability is one exact BIGINT/BIGINT→double division; the
    per-doc mean goes through decimal-exact dsum.

    Plan: one explode + count shuffle builds the model (|V|² rows max
    — tiny); both model tables broadcast back onto the exploded
    stream; one shuffle groups scores per doc. O(corpus) work, two
    broadcasts, no cartesian anywhere."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    w = tokens("text")
    bigrams = F.transform(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(w, i + 2)),
    )
    bg = docs.select("doc_id", F.explode(bigrams).alias("bigram"))
    cab = bg.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    ca = (
        cab.groupBy(F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("prefix"))
        .agg(F.sum("n_ab").cast("long").alias("n_a"))
    )
    p = F.col("n_ab").cast("double") / F.col("n_a")
    return (
        bg.join(F.broadcast(cab), "bigram")
        .join(
            F.broadcast(ca),
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)) == F.col("prefix"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            (dsum(p) / F.count(F.lit(1))).alias("avg_bigram_p"),
        )
    )
