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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.numeric import dsum
from quick_and_easy_vectordb_spark.functions.text import bind_once, quality_score, tokens
from quick_and_easy_vectordb_spark.operators.util import ensure_parallelism
from quick_and_easy_vectordb_spark.queries.registry import query
from quick_and_easy_vectordb_spark.queries.text import SQL_NORM, SQL_QUALITY_CTES
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
    # bind_once: tokens() re-runs per bigram when referenced inside
    # the lambda (round-14; see functions/text.py:bind_once)
    bigrams = bind_once(
        tokens("text"),
        lambda tk: F.transform(
            F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
            lambda x, i: F.concat_ws(" ", x, F.element_at(tk, i + 2)),
        ),
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


def _word_ngrams(col, n: int):
    """Distinct word n-grams as array<string>; docs shorter than *n*
    words yield an empty array (too short to share an n-gram — the
    right semantics for decontamination, unlike word_shingles' fallback)."""
    def body(tk):
        grams = F.transform(
            F.sequence(F.lit(0), F.size(tk) - n),
            lambda i: F.array_join(F.slice(tk, i + 1, n), " "),
        )
        return F.when(F.size(tk) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    # bind_once: tokens() re-runs per gram inside the lambda otherwise
    # (round-14; see functions/text.py:bind_once)
    return bind_once(tokens(col), body)


_SQL_NGRAMS4 = (
    f"list_distinct(list_transform(range(1, greatest(len(w) - 3, 0) + 1), "
    f"i -> array_to_string(w[i:i+3], ' ')))"
)


@query(
    "text_decontaminate",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split({SQL_NORM}, ' ') AS w FROM documents),
g AS (SELECT doc_id, unnest({_SQL_NGRAMS4}) AS ng FROM d),
bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 97 = 0)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched
FROM g JOIN bench USING (ng)
WHERE g.doc_id % 97 <> 0
GROUP BY g.doc_id
""",
    tags=("pipeline", "curation", "decontamination"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    shares a word 4-gram with the held-out benchmark set (docs with
    doc_id % 97 == 0 stand in for the eval suite). This is the
    GPT-3-style n-gram-overlap scrub every serious pretraining
    pipeline runs before training; the flagged ids feed an anti-join.

    Plan shape at 100 TB: the benchmark n-gram set is tiny relative
    to the corpus (eval suites are MBs, corpora are TBs), so it is
    DISTINCT-ed and *broadcast* — the corpus-side exploded n-gram
    stream is matched map-side with zero shuffle of corpus data; only
    the (rare) hits shuffle into the per-doc count."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    g = docs.select("doc_id", F.explode(_word_ngrams("text", 4)).alias("ng"))
    bench = g.filter(F.col("doc_id") % 97 == 0).select("ng").distinct()
    return (
        g.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
    )


# PII patterns chosen to parse identically under Java regex (Spark)
# and RE2 (DuckDB): character classes, bounded repeats and \b only —
# no lookaround, no backreferences.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{4}\b"


@query(
    "text_pii_redact",
    oracle=rf"""
WITH p AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com from 10.'
              || CAST(doc_id % 256 AS VARCHAR) || '.0.'
              || CAST((doc_id * 7) % 256 AS VARCHAR)
              || ' tel 555-' || lpad(CAST((doc_id * 31) % 10000 AS VARCHAR), 4, '0')
         AS t
  FROM documents
),
r AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(t,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IPV4}', '<IP>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
  FROM p
)
SELECT doc_id, redacted,
       CAST(len(regexp_extract_all(redacted, '<EMAIL>|<IP>|<PHONE>')) AS BIGINT)
         AS n_redacted
FROM r
""",
    tags=("pipeline", "curation", "pii"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact emails, IPv4 addresses and phone numbers
    to typed placeholders and count redactions per document. The test
    corpus carries no PII, so a deterministic contact line derived
    from doc_id is appended first (same expression on both engines) —
    the redaction logic itself is exactly what runs in production.

    Pure regexp_replace chain: scan-speed, zero shuffles, and the
    patterns are restricted to the Java-regex ∩ RE2 common subset so
    any engine agrees byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    pii = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" tel 555-"),
        F.lpad(((F.col("doc_id") * 31) % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(pii, F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_IPV4),
            F.lit("<IP>"),
        ),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        F.regexp_count(redacted, F.lit("<EMAIL>|<IP>|<PHONE>"))
        .cast("long")
        .alias("n_redacted"),
    )


@query(
    "text_repetition_score",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split({SQL_NORM}, ' ') AS w
           FROM documents WHERE {SQL_NORM} <> ''),
t AS (SELECT doc_id,
             list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                            i -> array_to_string(w[i:i+2], ' ')) AS tri
      FROM d),
s AS (SELECT doc_id, len(tri) AS n_tri, len(list_distinct(tri)) AS n_uniq FROM t)
SELECT doc_id, CAST(n_tri AS BIGINT) AS n_tri, CAST(n_uniq AS BIGINT) AS n_uniq,
       CAST(n_tri - n_uniq AS DOUBLE) / n_tri AS rep_ratio
FROM s WHERE n_tri > n_uniq
""",
    tags=("pipeline", "curation", "quality"),
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring: fraction of duplicated word trigrams per
    document — the cheap "is this doc degenerate boilerplate/spam"
    quality signal (Gopher/RefinedWeb-style repetition filters).
    Emits only documents that repeat at least one trigram.

    All-integer trigram counting inside one Catalyst projection (no
    explode — the arrays never leave the row), then a single exact
    int/int→double division; zero shuffles, scan speed."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # bind_once at two levels (round-14; functions/text.py:bind_once):
    # tokens() re-ran per trigram inside the gram lambda, and the
    # trigram array itself was built twice (size + distinct).
    def tri_of(tk):
        return F.when(
            F.size(tk) >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - 3),
                lambda i: F.array_join(F.slice(tk, i + 1, 3), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    stats = bind_once(
        tokens("text"),
        lambda tk: bind_once(
            tri_of(tk),
            lambda t: F.struct(
                F.size(t).cast("long").alias("n_tri"),
                F.size(F.array_distinct(t)).cast("long").alias("n_uniq"),
            ),
        ),
    )
    # F.inline is a generator: the stats struct is evaluated ONCE per
    # row (a follow-up select extracting two fields would be collapsed
    # into two copies of the expression by CollapseProject).
    s = docs.select("doc_id", F.inline(F.array(stats)))
    return s.filter(F.col("n_tri") > F.col("n_uniq")).select(
        "doc_id",
        "n_tri",
        "n_uniq",
        ((F.col("n_tri") - F.col("n_uniq")).cast("double") / F.col("n_tri")).alias(
            "rep_ratio"
        ),
    )


@query(
    "text_domain_mix_sample",
    oracle=f"""
WITH c AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
t AS (SELECT CAST(SUM(n_lang) AS BIGINT) // COUNT(*) AS tgt FROM c),
k AS (
  SELECT d.lang, COUNT(*) AS n_kept
  FROM documents d JOIN c USING (lang) CROSS JOIN t
  WHERE (d.doc_id * {_KNUTH}) % {_M32} * c.n_lang < t.tgt * {_M32}
  GROUP BY d.lang
)
SELECT c.lang, c.n_lang AS n_docs, CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM c LEFT JOIN k USING (lang)
""",
    tags=("pipeline", "sampling", "curation", "mixture"),
)
def text_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample each language toward a
    UNIFORM target share (tgt = total // n_langs docs per lang) via the
    same integer-exact Knuth-hash Bernoulli draw as
    text_weighted_sample — accept iff ``draw · n_lang < tgt · 2^32``,
    i.e. keep probability min(1, tgt/n_lang), membership reproducible
    on any engine/partitioning. This is the "hit the target training
    mix" step that follows quality filtering in a pretraining pipeline
    (over-represented domains thinned, under-represented kept whole).

    Plan: one tiny per-lang count (map-side combine), broadcast of the
    |langs|-row rate table back onto the corpus, per-row integer filter
    at scan speed, one final count — the corpus itself never shuffles.
    Output is the per-lang before/after audit table. (Integer products
    stay < 2^63 for corpora < ~2^31 docs per lang; at the extreme,
    promote the cross-multiply to DECIMAL.)"""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    target = counts.agg(
        F.expr("sum(n_lang) div count(*)").alias("tgt")
    )
    draw = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_M32)
    kept = (
        docs.join(F.broadcast(counts), "lang")
        .join(F.broadcast(target))
        .filter(draw * F.col("n_lang") < F.col("tgt") * F.lit(_M32))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        counts.join(kept, "lang", "left")
        .select(
            "lang",
            F.col("n_lang").alias("n_docs"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


_CAP_PER_SOURCE = 15


@query(
    "text_source_quality_cap",
    oracle=f"""
WITH {SQL_QUALITY_CTES},
r AS (
  SELECT d.source, d.doc_id, qs.quality,
         ROW_NUMBER() OVER (PARTITION BY d.source
                            ORDER BY qs.quality DESC, d.doc_id) AS rn
  FROM documents d JOIN qs USING (doc_id)
)
SELECT source, doc_id, quality, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= {_CAP_PER_SOURCE}
""",
    tags=("pipeline", "curation", "sampling", "window"),
)
def text_source_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality cap: keep only the 15 highest-quality
    documents from each source — the "no single crawl
    domain dominates the mix" curation rule (the rank-based sibling of
    text_domain_mix_sample's probabilistic thinning). One window
    shuffle keyed on source; at 100 TB pre-aggregate with a per-
    partition top-N (TakeOrdered per group via partial window) or
    filter on a quality threshold first so the window only ranks
    plausible survivors."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    q = docs.select("source", "doc_id", quality_score("text").alias("quality"))
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        q.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _CAP_PER_SOURCE)
    )


@query(
    "text_bottomk_sample",
    oracle="""
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS draw
FROM documents
ORDER BY draw, doc_id LIMIT 100
""",
    tags=("pipeline", "sampling", "curation"),
)
def text_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k uniform sample WITHOUT replacement: keep the 100
    documents with the smallest md5(doc_id) — the classic bottom-k /
    KMV construction. Unlike `TABLESAMPLE`/`rand()` the membership is
    a pure function of the ids: reproducible across engines, runs,
    partitionings, AND monotone under corpus growth (a doc only leaves
    the sample when a smaller-hash doc arrives — exactly the property
    that makes bottom-k sketches mergeable across shards and lets a
    100 TB pipeline maintain a rolling held-out set without
    re-sampling history).

    Plan shape: per-row hash at scan speed, then TakeOrderedAndProject
    — each partition forwards only its local bottom-100, the driver
    merges; no shuffle, no global sort."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("draw"))
        .orderBy(F.asc("draw"), F.asc("doc_id"))
        .limit(100)
    )


@query(
    "text_mix_rebalance_weights",
    oracle="""
WITH s AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
t AS (SELECT COUNT(*) AS total, COUNT(DISTINCT source) AS k FROM documents)
SELECT s.source,
       CAST(s.n AS BIGINT) AS n_docs,
       1.0 / t.k AS target_share,
       CAST(s.n AS DOUBLE) / t.total AS actual_share,
       CAST(t.total AS DOUBLE) / (t.k * s.n) AS weight
FROM s, t
""",
    tags=("curation", "sampling", "domain-mix", "rebalance"),
)
def text_mix_rebalance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOMAIN-MIX REBALANCING weights: per-source sampling multipliers
    that turn the corpus's ACTUAL source distribution into a TARGET
    mix (uniform here; any broadcastable target table slots in) —
    weight_s = target_share / actual_share = N / (k * n_s). This is
    the knob every pretraining recipe turns (upsample small
    high-quality domains, downsample crawl bulk); composed with
    dedup_soft_weight's 1/cluster_size it gives the final per-doc
    sampling weight. Every emitted number is a single
    integer-over-integer division — exact on any engine.

    Plan shape at 100 TB: one map-side-combined groupBy(source) plus
    a 1-row total — the output is an O(sources) broadcast dim the
    sampler joins against the corpus scan; nothing here rescans
    text."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = docs.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_distinct("source").alias("k"),
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        (F.lit(1.0) / F.col("k")).alias("target_share"),
        (F.col("n").cast("double") / F.col("total")).alias("actual_share"),
        (F.col("total").cast("double") / (F.col("k") * F.col("n"))).alias("weight"),
    )


# Affine permutation constants for the epoch shuffle: P is a Mersenne
# prime and a is not a multiple of P, so k -> (a*k + epoch*c) % P is a
# bijection on [0, P) — a keyed pseudo-random permutation with no RNG
# state, the deterministic-shuffle construction streaming loaders use
# (every worker can compute any element's position independently).
# Constants sized so a*doc_id + c stays inside int64 under ANSI mode
# (and inside DuckDB BIGINT) for doc_id < 2^31.
_SHUF_P = (1 << 61) - 1
_SHUF_A = 2654435761  # Knuth's 32-bit golden-ratio multiplier
_SHUF_C = 671807229
_SHUF_SHARDS = 8
_SHUF_EPOCHS = 2


@query(
    "text_epoch_shuffle",
    oracle=f"""
WITH e AS (SELECT unnest(range({_SHUF_EPOCHS})) AS epoch),
keyed AS (
  SELECT e.epoch, d.doc_id,
         (d.doc_id * {_SHUF_A} + e.epoch * {_SHUF_C}) % {_SHUF_P} AS sk
  FROM documents d CROSS JOIN e
),
sharded AS (
  SELECT epoch, doc_id, sk, sk % {_SHUF_SHARDS} AS shard FROM keyed
)
SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY epoch, shard
                               ORDER BY sk, doc_id) AS BIGINT) AS pos,
       doc_id
FROM sharded
""",
    tags=("curation", "training", "epoch-shuffle", "deterministic",
          "sharding"),
)
def text_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC EPOCH SHUFFLE + SHARD ASSIGNMENT — the operator
    between curation and the training loader: each epoch must visit
    the corpus in a different pseudo-random order, reproducibly (job
    restarts and stragglers must agree on every element's position),
    sharded so each data-parallel rank reads one slice. RNG state
    can't do this distributed; the standard construction is a KEYED
    AFFINE PERMUTATION sk = (a·doc_id + epoch·c) mod P (P Mersenne
    prime, a odd ⇒ bijection): shard = sk mod S, position = rank of
    sk within the shard. Every property is relational, so the full
    (epoch, shard, pos, doc_id) training manifest crosses the oracle
    gate — including that the two epochs' orders genuinely differ.

    Plan shape at 100 TB: one scan fans out ×epochs (in-map), ONE
    shuffle on (epoch, shard) — S·E bounded partitions — and a
    per-shard sort for rank; no global sort, no single-partition
    window, no RNG exchange. The manifest then writes per-shard files
    the loader streams sequentially."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(_SHUF_EPOCHS).select(
        F.col("id").alias("epoch")
    )
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch", "doc_id",
        ((F.col("doc_id") * _SHUF_A + F.col("epoch") * _SHUF_C)
         % _SHUF_P).alias("sk"),
    )
    sharded = keyed.withColumn("shard", F.col("sk") % _SHUF_SHARDS)
    w = Window.partitionBy("epoch", "shard").orderBy("sk", "doc_id")
    return sharded.select(
        F.col("epoch").cast("long"),
        F.col("shard").cast("long"),
        F.row_number().over(w).cast("long").alias("pos"),
        "doc_id",
    )


@query(
    "text_source_drift_tvd",
    oracle="""
WITH sl AS (
  SELECT source, lang, COUNT(*) AS c
  FROM documents GROUP BY source, lang
),
s AS (SELECT source, SUM(c) AS ns FROM sl GROUP BY source),
g AS (SELECT lang, SUM(c) AS cg FROM sl GROUP BY lang),
tot AS (SELECT SUM(c) AS n FROM sl),
-- every (source, lang) cell, including langs a source never emits
-- (those contribute |0*N - cg*ns| to the distance)
grid AS (
  SELECT s.source, s.ns, g.lang, g.cg, COALESCE(sl.c, 0) AS c
  FROM s CROSS JOIN g
  LEFT JOIN sl ON sl.source = s.source AND sl.lang = g.lang
)
SELECT grid.source,
       CAST(MAX(ns) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_langs_present,
       CAST(SUM(ABS(c * tot.n - cg * ns)) AS BIGINT) AS tvd_num,
       CAST(SUM(ABS(c * tot.n - cg * ns)) AS DOUBLE)
         / (2.0 * MAX(ns) * MAX(tot.n)) AS tvd
FROM grid, tot
GROUP BY grid.source
""",
    tags=("curation", "drift", "total-variation", "monitoring"),
)
def text_source_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTION DRIFT MONITORING per corpus source — the check a
    training pipeline runs on every new crawl drop: how far does each
    source's language mix sit from the corpus-wide mix? Measured as
    TOTAL-VARIATION DISTANCE, TVD = ½·Σ|p_l − q_l|, because unlike
    KL/JS divergence it needs NO logarithms — ln() is 1-ulp
    engine-dependent and banned from the oracle surface repo-wide
    (see text_zipf_fit) — and its numerator Σ|c_{s,l}·N − c_l·N_s| is
    EXACT INTEGER arithmetic; the only division is the final
    normalization (one double divide of integers, bitwise-identical
    in both engines). Absent (source, lang) cells contribute their
    full mass |0 − c_l·N_s| — the oracle's grid CROSS JOIN pins that
    the engine doesn't silently drop zero-count cells.

    Plan shape at 100 TB: one map-side-combined (source, lang) count
    — the ONLY pass over the corpus — then everything downstream is
    O(sources × langs) cell arithmetic: two rollups and a broadcast
    grid join on tables the size of the schema, not the data."""
    docs = load_table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    s = sl.groupBy("source").agg(F.sum("c").alias("ns"))
    g = sl.groupBy("lang").agg(F.sum("c").alias("cg"))
    tot = sl.agg(F.sum("c").alias("n"))
    grid = (
        s.crossJoin(F.broadcast(g))
        .join(sl, ["source", "lang"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    dev = F.abs(F.col("c") * F.col("n") - F.col("cg") * F.col("ns"))
    return grid.groupBy("source").agg(
        F.max("ns").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("c") > 0, 1).otherwise(0)).cast("long")
        .alias("n_langs_present"),
        F.sum(dev).cast("long").alias("tvd_num"),
        (
            F.sum(dev).cast("double")
            / (F.lit(2.0) * F.max("ns") * F.max("n"))
        ).alias("tvd"),
    )
