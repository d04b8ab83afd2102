"""Text-analysis query surface (SURVEY.md §2b M4 / north-star text
ops): corpus statistics, token counting, language ID, quality scoring,
fingerprinting. All pure Catalyst expressions over ``documents`` —
these run at scan speed and aggregate with map-side combine, so the
only shuffle is the final (tiny) groupBy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.text import (
    bind_once,
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    STOPWORDS_EN,
    bpe_ish_token_count,
    char_shingles,
    normalized_text,
    quality_score,
    token_count,
    tokens,
)
from quick_and_easy_vectordb_spark.functions.numeric import dsum
from quick_and_easy_vectordb_spark.operators.chunking import chunk_documents
from quick_and_easy_vectordb_spark.operators.dedup import shingle_table
from quick_and_easy_vectordb_spark.operators.sampling import deterministic_split
from quick_and_easy_vectordb_spark.operators.util import (
    ensure_parallelism,
    scaled_shuffle_partitions,
)
from quick_and_easy_vectordb_spark.queries.registry import query
from quick_and_easy_vectordb_spark.sources.catalog import load_table

SQL_NORM = "trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
SQL_NTOK = "CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END"

# Reusable quality-score CTE chain over ``documents`` ending in
# qs(doc_id, quality) — mirrors functions/text.py:quality_score
# exactly; shared by text_quality_filter and dedup_keep_best.
SQL_QUALITY_CTES = f"""qd AS (SELECT doc_id, text, {SQL_NORM} AS t FROM documents),
qm AS (
  SELECT doc_id,
         CAST({SQL_NTOK} AS DOUBLE) AS n_tok,
         CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
              ELSE 0.0 END AS punct,
         CASE WHEN t = '' THEN 0.0
              ELSE CAST(len(list_filter(string_split(t, ' '),
                        x -> list_contains({'[' + ', '.join("'" + w + "'" for w in STOPWORDS_EN) + ']'}, x))) AS DOUBLE)
                   / len(string_split(t, ' ')) END AS stop_r
  FROM qd),
qs AS (
  SELECT doc_id,
         0.4 * least(n_tok / 200.0, 1.0)
         + 0.3 * (1.0 - least(punct, 0.5) / 0.5)
         + 0.3 * least(stop_r / 0.4, 1.0) AS quality
  FROM qm)"""


@query(
    "text_stats_by_lang",
    oracle=f"""
WITH d AS (SELECT lang, n_chars, {SQL_NORM} AS t FROM documents),
d2 AS (SELECT lang, n_chars, {SQL_NTOK} AS n_tok FROM d)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
       CAST(SUM(n_tok) AS DOUBLE) / COUNT(n_tok) AS avg_tokens,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM d2 GROUP BY lang
""",
    tags=("text", "agg"),
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language: doc count, mean char/token
    lengths, total token budget. Integer sums → exact, engine-stable
    averages."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("lang", "n_chars", token_count("text").alias("n_tok"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("n_chars")).alias("avg_chars"),
        (F.sum("n_tok").cast("double") / F.count("n_tok")).alias("avg_tokens"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )


@query(
    "text_token_count",
    oracle=f"""
WITH d AS (SELECT doc_id, text, {SQL_NORM} AS t FROM documents)
SELECT doc_id,
       CAST({SQL_NTOK} AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT) AS bpe_tokens
FROM d
""",
    tags=("text",),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two token-budget estimators per document: whitespace tokens and
    BPE-ish pre-tokens (letter runs / digit runs / single symbols) —
    the model-free proxy a pretraining pipeline uses for budget
    accounting before committing to a real tokenizer pass."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("ws_tokens"),
        bpe_ish_token_count("text").cast("long").alias("bpe_tokens"),
    )


def _sql_hits(markers: list[str]) -> str:
    lst = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return f"len(list_filter(toks, x -> list_contains({lst}, x)))"


@query(
    "text_langid_confusion",
    oracle=f"""
WITH d AS (SELECT doc_id, lang, {SQL_NORM} AS t FROM documents),
tk AS (SELECT doc_id, lang,
              CASE WHEN t = '' THEN [] ELSE string_split(t, ' ') END AS toks
       FROM d),
h AS (SELECT doc_id, lang,
             {_sql_hits(LANG_MARKERS['en'])} AS h_en,
             {_sql_hits(LANG_MARKERS['fr'])} AS h_fr,
             {_sql_hits(LANG_MARKERS['de'])} AS h_de,
             {_sql_hits(LANG_MARKERS['es'])} AS h_es
      FROM tk),
p AS (SELECT lang,
             CASE WHEN h_en >= h_fr AND h_en >= h_de AND h_en >= h_es AND h_en > 0 THEN 'en'
                  WHEN h_fr >= h_de AND h_fr >= h_es AND h_fr > 0 THEN 'fr'
                  WHEN h_de >= h_es AND h_de > 0 THEN 'de'
                  WHEN h_es > 0 THEN 'es'
                  ELSE 'unk' END AS pred
      FROM h)
SELECT lang, pred, COUNT(*) AS n FROM p GROUP BY lang, pred
""",
    tags=("text", "langid", "agg"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (deterministic n-gram heuristic) and
    its confusion matrix against the labeled ``lang`` column. Languages
    without whitespace markers (zh) fall out as 'unk' — honest behavior
    for a whitespace heuristic."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")

    def hits(markers: list[str]) -> F.Column:
        marker_arr = F.array([F.lit(m) for m in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))

    h = docs.select(
        "lang",
        hits(LANG_MARKERS["en"]).alias("h_en"),
        hits(LANG_MARKERS["fr"]).alias("h_fr"),
        hits(LANG_MARKERS["de"]).alias("h_de"),
        hits(LANG_MARKERS["es"]).alias("h_es"),
    )
    pred = (
        F.when(
            (F.col("h_en") >= F.col("h_fr"))
            & (F.col("h_en") >= F.col("h_de"))
            & (F.col("h_en") >= F.col("h_es"))
            & (F.col("h_en") > 0),
            "en",
        )
        .when((F.col("h_fr") >= F.col("h_de")) & (F.col("h_fr") >= F.col("h_es")) & (F.col("h_fr") > 0), "fr")
        .when((F.col("h_de") >= F.col("h_es")) & (F.col("h_de") > 0), "de")
        .when(F.col("h_es") > 0, "es")
        .otherwise("unk")
    )
    return h.select("lang", pred.alias("pred")).groupBy("lang", "pred").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "text_quality_filter",
    oracle=f"""
WITH {SQL_QUALITY_CTES}
SELECT doc_id, quality FROM qs WHERE quality >= 0.5
""",
    tags=("text", "quality", "filter"),
    bench=True,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-quality gate: composite score (length / punctuation /
    stopword terms, functions/text.py:quality_score) with a ≥ 0.5 keep
    threshold — the canonical 'filter the crawl' operator."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # explode(array(expr)) is a pushdown BARRIER (round-15): a filter on
    # a generator output cannot be pushed below the Generate, so the
    # composite score is evaluated ONCE, above the fan-out exchange.
    # Filtering on a plain alias inlines the whole score into the Filter
    # and Catalyst pushes it below the exchange — the entire scoring
    # expression then runs twice, once SERIALLY on the single-split scan
    # side (measured on text_fingerprint: half the query's wall).
    return (
        docs.select(
            "doc_id", F.explode(F.array(quality_score("text"))).alias("quality")
        )
        .filter(F.col("quality") >= 0.5)
    )


@query(
    "text_fingerprint",
    oracle=f"""
WITH d AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN length(t) >= 8
              THEN list_distinct(list_transform(range(1, length(t) - 6), i -> substr(t, i, 8)))
              WHEN length(t) > 0 THEN [t]
              ELSE [] END AS grams
  FROM d)
SELECT doc_id,
       list_aggregate(list_transform(grams, g -> md5(g)), 'min') AS fingerprint
FROM sh WHERE len(grams) > 0
""",
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint: min-md5 over the distinct
    char-8-gram shingles (a 1-hash MinHash). Computed entirely inside a
    per-row array expression — zero shuffles, no explode."""
    docs = ensure_parallelism(  # round-14: single-split scan fed heavy per-row work
        load_table(spark, sf_dir, "documents")
    )
    # Round-15: fold min(md5(gram)) directly over the gram index
    # instead of array_min(transform(char_shingles(...), md5)).
    # Equivalent because min over a multiset ignores duplicates, so
    # char_shingles' array_distinct is a no-op under the min — and
    # skipping it also skips materializing two corpus-sized gram/hash
    # arrays per row. "g" > every md5 hex char ([0-9a-f]), so it is a
    # safe fold identity; a non-empty sequence always replaces it.
    fp = bind_once(
        normalized_text("text"),
        lambda nm: F.when(
            F.length(nm) >= 8,
            F.aggregate(
                F.sequence(F.lit(1), F.length(nm) - 7),
                F.lit("g"),
                lambda acc, i: F.least(acc, F.md5(F.substring(nm, i, F.lit(8)))),
            ),
        ).when(F.length(nm) > 0, F.md5(nm)),
    )
    # Filter on the CHEAP equivalent predicate, not on the fingerprint
    # itself: fingerprint IS NULL iff normalized_text is NULL/empty, and
    # a filter referencing the fold would be pushed BELOW the fan-out
    # exchange, re-evaluating the whole per-row md5 fold serially on the
    # single-split scan side (measured: the pushed Filter carried the
    # entire fold as its condition — half the query's work on one core).
    return docs.filter(F.length(normalized_text("text")) > 0).select(
        "doc_id", fp.alias("fingerprint")
    )


@query(
    "text_top_bigrams",
    oracle=f"""
WITH d AS (SELECT {SQL_NORM} AS t FROM documents),
toks AS (SELECT string_split(t, ' ') AS w FROM d WHERE t <> ''),
bg AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM toks WHERE len(w) >= 2
)
SELECT bigram, COUNT(*) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 25
""",
    tags=("text", "ngram", "topk", "agg"),
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-25 word bigrams: explode n-grams → count →
    distributed top-k. Map-side partial counts collapse each partition
    to one row per distinct bigram before the single shuffle, and the
    final ORDER BY+LIMIT is TakeOrderedAndProject — the shape that
    makes corpus vocabulary statistics cheap at any scale."""
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
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(25)
    )


@query(
    "text_train_val_split",
    oracle="""
WITH b AS (
  SELECT lang,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'split-v1'), 1, 4))::BIGINT < 6554
              THEN 'val' ELSE 'train' END AS split
  FROM documents
)
SELECT lang, split, COUNT(*) AS n
FROM b GROUP BY lang, split
""",
    tags=("text", "sampling", "split"),
)
def text_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val split (operators/sampling.py): ~10% val
    via content-hash bucketing — the SAME rows land in val on any
    engine, partitioning, or rerun (sample() would reshuffle
    membership every time). Map-only, no shuffle beyond the count.
    Output: per-(lang, split) row counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        deterministic_split(docs, "doc_id", 0.1, "split-v1")
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


PACK_BUDGET = 2048
# doc_ids per packing shard: each shard's running sum is an independent
# window partition, so the pack parallelizes across the cluster. 1000
# ids/shard gives ~6 shards at sf0.01 and ~60 at sf0.1 — small enough to
# exercise multi-shard semantics at every shipped scale, large enough
# that a shard holds hundreds of bins.
PACK_SHARD = 1000


@query(
    "text_pack_sequences",
    oracle=f"""
WITH d AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
tok AS (SELECT doc_id, doc_id // {PACK_SHARD} AS shard,
               CAST({SQL_NTOK} AS BIGINT) AS n_tok FROM d),
runs AS (
  SELECT shard, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM tok
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST((cum - n_tok) // {PACK_BUDGET} AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
FROM runs GROUP BY 1, 2
""",
    tags=("text", "packing", "window"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PACKING for pretraining batches: documents stream in
    id order into ~{PACK_BUDGET}-token bins via a running token count
    (bin = cumulative-before-doc // budget — contiguous, deterministic,
    one window). A bin can overrun by one document's tail; exact
    bin-capacity packing is a sequential constraint no engine
    parallelizes — the cumsum formulation is the scalable standard.
    The pack is SHARDED: the window partitions on a doc_id-derived
    shard key ({PACK_SHARD} ids/shard), so each shard's cumsum runs
    independently — no single-partition global sort at 100 TB. Packing
    resets at shard boundaries (each shard's first bin may undershoot
    the budget), which is exactly how a cluster pack operates: shards
    are the unit of parallel work, bins never span shards."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.expr(f"doc_id div {PACK_SHARD}").alias("shard"),
        token_count("text").cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = tok.withColumn("cum", F.sum("n_tok").over(w))
    return (
        runs.select(
            F.col("shard").cast("long").alias("shard"),
            F.expr(f"(cum - n_tok) div {PACK_BUDGET}").alias("bin"),
            "n_tok",
        )
        .groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("bin_tokens"),
        )
    )


@query(
    "text_chunking",
    oracle="""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 31 = 0 AND length(text) > 0),
st AS (
  SELECT doc_id, text,
         unnest(range(1, greatest(length(text), 1) + 1, 150)) AS s
  FROM d
)
SELECT doc_id AS document_id,
       CAST((s - 1) // 150 AS BIGINT) AS chunk_idx,
       CAST(doc_id * 10000 + (s - 1) // 150 AS BIGINT) AS chunk_id,
       substr(text, CAST(s AS BIGINT), 200) AS chunk_text
FROM st
""",
    tags=("text", "chunking"),
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCUMENT CHUNKING (operators/chunking.py) — the stage the
    reference implies but never built (PyPDF2 pinned, never imported;
    chunks arrive pre-made via CSV, app.py:51-58): 200-char windows
    with 50-char overlap, exploded JVM-side, deterministic packed
    chunk ids. This output IS the reference's chunks-table shape,
    ready for the embed UDF."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 31 == 0
    )
    return chunk_documents(docs, chunk_size=200, overlap=50)


# ---------------------------------------------------------------------------
# Retrieval scoring: BM25 and TF-IDF keyword extraction.
#
# Both use the "rational idf" (N - df + 0.5) / (df + 0.5) instead of the
# classical ln(...) form: natural log is NOT guaranteed bitwise-identical
# between Java's Math.log and DuckDB's libm, while +,-,*,/ are IEEE
# exact-rounded everywhere — so the rational form keeps every per-row
# score hash-comparable across engines. Ranking behavior is equivalent
# for scoring fixed query terms (idf is per-term constant, monotone in
# df either way); documented engine deviation from Lucene's BM25.
# ---------------------------------------------------------------------------

BM25_TERMS = ("query", "table", "spark")
BM25_K1 = "1.2"
# (1 - b) and b with b = 0.75, pre-folded so both engines evaluate the
# identical literal expression tree.
BM25_DL_NORM = "(0.25 + 0.75 * (dl / avgdl))"


def _sql_tf(term: str) -> str:
    return f"len(list_filter(w, x -> x = '{term}'))"


def _bm25_term_score(tf: str, idf: str) -> str:
    # CAST(tf AS DOUBLE) is load-bearing: a bare BIGINT * 2.2 stays in
    # DuckDB DECIMAL arithmetic (exact 22·tf/10, rounded ONCE at the
    # end), while Spark multiplies double(tf) by the rounded double
    # 2.2 — one ulp apart for some tf, which sf0.001 exposed.
    return (
        f"({idf} * (CAST({tf} AS DOUBLE) * 2.2 / "
        f"(CAST({tf} AS DOUBLE) + {BM25_K1} * {BM25_DL_NORM})))"
    )


@query(
    "text_bm25_topk",
    oracle=f"""
WITH d AS (
  SELECT doc_id, {SQL_NORM} AS t FROM documents
),
tok AS (
  SELECT doc_id,
         CASE WHEN t = '' THEN [] ELSE string_split(t, ' ') END AS w
  FROM d
),
feat AS (
  SELECT doc_id, len(w) AS dl,
         {_sql_tf('query')} AS tf1,
         {_sql_tf('table')} AS tf2,
         {_sql_tf('spark')} AS tf3
  FROM tok
),
corpus AS (
  SELECT COUNT(*) AS n,
         CAST(CAST(SUM(CAST(dl AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS avgdl,
         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
         SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
  FROM feat
),
scored AS (
  SELECT f.doc_id,
         {_bm25_term_score('tf1', '((n - df1 + 0.5) / (df1 + 0.5))')}
       + {_bm25_term_score('tf2', '((n - df2 + 0.5) / (df2 + 0.5))')}
       + {_bm25_term_score('tf3', '((n - df3 + 0.5) / (df3 + 0.5))')}
         AS score
  FROM feat f, corpus
)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id
LIMIT 10
""",
    tags=("text", "retrieval", "bm25", "topk"),
    bench=True,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed 3-term query over the documents corpus
    (k1=1.2, b=0.75, rational idf — see module comment).

    Plan: one scan computes per-doc (dl, tf per term) as pure
    Catalyst array expressions; one tiny aggregate reduces the corpus
    to a single row (N, avgdl, df per term) which broadcast-crosses
    back into the per-doc frame; scoring is then per-row arithmetic
    and the top-10 is TakeOrderedAndProject. Two passes over the
    token arrays total, zero wide shuffles — the corpus statistics
    row is the only data movement, so this scales to any corpus size.
    avgdl is decimal-exact (dsum/count) for cross-engine hashing."""
    from quick_and_easy_vectordb_spark.functions.numeric import dsum

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    w = tokens("text")

    # NB: a two-parameter lambda in F.filter means (element, index) to
    # Spark — close over the term instead of passing it as a default.
    def tf_col(term: str) -> F.Column:
        return F.size(F.filter(w, lambda x: x == F.lit(term))).cast("long")

    feat = docs.select(
        "doc_id",
        F.size(w).cast("long").alias("dl"),
        *[tf_col(t).alias(f"tf{i + 1}") for i, t in enumerate(BM25_TERMS)],
    )
    corpus = feat.agg(
        F.count(F.lit(1)).alias("n"),
        (dsum("dl") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i + 1}") > 0, 1).otherwise(0)).alias(f"df{i + 1}")
            for i in range(len(BM25_TERMS))
        ],
    )

    def term_score(i: int) -> F.Column:
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = (F.col("n") - df + 0.5) / (df + 0.5)
        dl_norm = 0.25 + 0.75 * (F.col("dl") / F.col("avgdl"))
        return idf * (tf * 2.2 / (tf + 1.2 * dl_norm))

    return (
        feat.join(F.broadcast(corpus))
        .select(
            "doc_id",
            (term_score(1) + term_score(2) + term_score(3)).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


@query(
    "text_tfidf_keywords",
    oracle=f"""
WITH d AS (
  SELECT doc_id, {SQL_NORM} AS t FROM documents WHERE doc_id % 7 = 0
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM d WHERE t <> '')
  GROUP BY doc_id, term
),
corpus AS (SELECT COUNT(*) AS n FROM d),
idf AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf GROUP BY term
),
weighted AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ((n - df + 0.5) / (df + 0.5)) AS weight
  FROM tf JOIN idf ON tf.term = idf.term, corpus
)
SELECT doc_id, term, weight,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY weight DESC, term
       ) AS BIGINT) AS rank
FROM weighted
QUALIFY rank <= 3
""",
    tags=("text", "retrieval", "tfidf", "window"),
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 highest-weighted terms per
    document (rational idf — see module comment), over a 1-in-7
    deterministic document sample.

    Plan: explode tokens once → (doc, term, tf) partial-aggregated
    map-side; term-level df is a second small aggregate over the
    vocabulary (≪ corpus, broadcast back); per-doc top-3 is a
    window row_number over the (doc, term) frame — the shuffle is
    keyed by doc_id and each partition sorts only its own docs'
    terms. At 100 TB the vocabulary table stays broadcastable
    (vocab grows sub-linearly) and nothing else is corpus-wide."""
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    )
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    corpus = docs.agg(F.count(F.lit(1)).alias("n"))
    idf = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    weighted = (
        tf.join(F.broadcast(idf.withColumnRenamed("term", "i_term")),
                F.col("term") == F.col("i_term"))
        .join(F.broadcast(corpus))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))).alias("weight"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("term"))
    return (
        weighted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
    )


@query(
    "text_shingle_rarity",
    oracle=f"""
WITH norm AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
rtoks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE t <> ''),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(w) >= 3
         THEN list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         ELSE [array_to_string(w, ' ')] END) AS shingle
  FROM rtoks),
df AS (SELECT shingle, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM sh GROUP BY shingle)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(CAST(SUM(CAST(1.0 / df.df AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS rarity
FROM sh s JOIN df USING (shingle)
GROUP BY s.doc_id
""",
    tags=("text", "ngram", "novelty", "curation"),
)
def text_shingle_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document novelty score: mean inverse document-frequency of the
    document's word 3-shingles — rarity near 1 means the document is
    mostly unique phrasing, near 0 means boilerplate shared across the
    corpus (the cheap content-novelty signal used to down-weight
    templated pages before training). Each 1/df is ONE exact
    bigint→double division and the mean goes through decimal-exact
    dsum, so the score is engine-stable without logs.

    Plan: shingle explode → one shuffle for document frequencies
    (map-side partial distinct), join back on shingle (both sides
    shuffle-partitioned by shingle, no broadcast needed at any scale),
    one per-doc re-aggregation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = shingle_table(docs, "text", "doc_id", 3)
    df_t = sh.groupBy("shingle").agg(
        F.count_distinct("id").alias("df")
    )
    joined = sh.join(df_t, "shingle").select(
        F.col("id").alias("doc_id"), (F.lit(1.0) / F.col("df")).alias("inv_df")
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        (dsum("inv_df") / F.count(F.lit(1))).alias("rarity"),
    )


@query(
    "text_bigram_lift",
    oracle=f"""
WITH d AS (SELECT {SQL_NORM} AS t FROM documents),
toks AS (SELECT string_split(t, ' ') AS w FROM d WHERE t <> ''),
uni AS (
  SELECT unnest(w) AS tok FROM toks
),
ucnt AS (SELECT tok, COUNT(*) AS n_tok FROM uni GROUP BY tok),
utot AS (SELECT COUNT(*) AS n FROM uni),
bg AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM toks WHERE len(w) >= 2
),
bcnt AS (SELECT bigram, COUNT(*) AS n_xy FROM bg GROUP BY bigram),
btot AS (SELECT COUNT(*) AS b FROM bg),
lifted AS (
  SELECT bc.bigram, bc.n_xy,
         ((CAST(bc.n_xy AS DOUBLE) * CAST(ut.n AS DOUBLE)) * CAST(ut.n AS DOUBLE))
           / ((CAST(bt.b AS DOUBLE) * CAST(u1.n_tok AS DOUBLE)) * CAST(u2.n_tok AS DOUBLE))
           AS lift
  FROM bcnt bc
  CROSS JOIN utot ut CROSS JOIN btot bt
  JOIN ucnt u1 ON u1.tok = string_split(bc.bigram, ' ')[1]
  JOIN ucnt u2 ON u2.tok = string_split(bc.bigram, ' ')[2]
  WHERE bc.n_xy >= 5
)
SELECT bigram, n_xy, lift FROM lifted
ORDER BY lift DESC, bigram LIMIT 20
""",
    tags=("text", "ngram", "collocation", "topk"),
)
def text_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by LIFT — p(xy) / (p(x)·p(y)), the log-free
    form of PMI: top-20 word pairs (min count 5) that co-occur far more
    than their unigram frequencies predict. Log-free matters for the
    oracle: ln() differs in ulps across engines, while this lift is
    one division over exact-integer-valued doubles multiplied in a
    pinned order — bit-identical everywhere.

    Plan shape at 100 TB: two corpus passes (unigram and bigram
    counts, each one map-side-combined shuffle), two 1-row totals
    broadcast, and the per-bigram join against the unigram table —
    keyed on the word, the natural hash distribution. The final top-20
    is TakeOrderedAndProject, never a global sort."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    w = tokens("text")
    uni = docs.select(F.explode(w).alias("tok"))
    ucnt = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    utot = uni.agg(F.count(F.lit(1)).alias("n"))
    # bind_once: tokens() re-runs per bigram when referenced inside
    # the lambda (round-14; see functions/text.py:bind_once)
    bigrams = bind_once(
        w,
        lambda tk: F.transform(
            F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
            lambda x, i: F.concat_ws(" ", x, F.element_at(tk, i + 2)),
        ),
    )
    bg = docs.select(F.explode(bigrams).alias("bigram"))
    bcnt = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_xy"))
    btot = bg.agg(F.count(F.lit(1)).alias("b"))
    parts = F.split(F.col("bigram"), " ")
    lifted = (
        bcnt.filter(F.col("n_xy") >= 5)
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .join(
            ucnt.select(F.col("tok").alias("t1"), F.col("n_tok").alias("n_x")),
            parts.getItem(0) == F.col("t1"),
        )
        .join(
            ucnt.select(F.col("tok").alias("t2"), F.col("n_tok").alias("n_y")),
            parts.getItem(1) == F.col("t2"),
        )
        .select(
            "bigram",
            "n_xy",
            (
                (F.col("n_xy").cast("double") * F.col("n").cast("double"))
                * F.col("n").cast("double")
                / (
                    (F.col("b").cast("double") * F.col("n_x").cast("double"))
                    * F.col("n_y").cast("double")
                )
            ).alias("lift"),
        )
    )
    return lifted.orderBy(F.desc("lift"), F.asc("bigram")).limit(20)


@query(
    "text_token_diversity",
    oracle=f"""
WITH d AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS w
  FROM d WHERE t <> ''
),
counts AS (
  SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_types,
         CAST(SUM(c * c) AS BIGINT) AS sumsq
  FROM counts GROUP BY 1
)
SELECT doc_id, n_tokens, n_types,
       1.0 - CAST(sumsq AS DOUBLE)
           / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS simpson,
       CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
FROM per_doc
""",
    tags=("text", "quality", "diversity"),
)
def text_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity quality signals per document: Simpson
    diversity (1 − Σp² over the token distribution — near 0 for a doc
    that repeats one token, → 1 for all-distinct) and type-token ratio.
    Both are standard repetitiveness filters for pretraining corpora,
    chosen over Shannon entropy deliberately: they are RATIONAL in the
    token counts (no transcendental log), so Spark and the oracle agree
    bit-for-bit — Σc², n, and the type count are exact integers and the
    final expression is two IEEE divisions in pinned order.

    Plan shape at 100 TB: explode → groupBy(doc, token) with map-side
    combine → groupBy(doc) rollup of three integers. Shuffle carries
    (doc, token, count) partials — bounded by vocabulary per doc, not
    text bytes; the raw text never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    counts = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * F.col("c")).alias("sumsq"),
    )
    n_d = F.col("n_tokens").cast("double")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_types",
        (F.lit(1.0) - F.col("sumsq").cast("double") / (n_d * n_d)).alias("simpson"),
        (F.col("n_types").cast("double") / n_d).alias("ttr"),
    )


@query(
    "text_curation_pipeline",
    oracle=f"""
WITH {SQL_QUALITY_CTES},
kept AS (
  SELECT qd.doc_id, qd.t, d.lang, qs.quality
  FROM qd JOIN qs ON qs.doc_id = qd.doc_id
  JOIN documents d ON d.doc_id = qd.doc_id
  WHERE qs.quality >= 0.5
),
surv AS (
  SELECT md5(t) AS h, MIN(doc_id) AS keep_id
  FROM kept GROUP BY md5(t)
),
final AS (
  SELECT k.lang, k.quality,
         CASE WHEN k.t = '' THEN 0 ELSE len(string_split(k.t, ' ')) END AS n_tok
  FROM kept k JOIN surv s ON s.keep_id = k.doc_id
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(CAST(SUM(CAST(quality AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS avg_quality
FROM final
GROUP BY lang
""",
    tags=("text", "pipeline", "curation", "dedup"),
    bench=True,
)
def text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus curation in one DAG — the composition a
    pretraining data team actually ships: quality gate (composite
    score >= 0.5) → exact content dedup among survivors (min-id
    canonical pick via operators/dedup.py:exact_dedup) → per-language
    budget accounting (docs kept, whitespace-token budget, decimal-
    exact mean quality). Each stage is individually oracle-checked
    elsewhere (text_quality_filter, dedup_exact, text_stats_by_lang);
    this row certifies their COMPOSITION — filter-then-dedup ordering,
    join keys, and survivor semantics — matching a single relational
    expression of the whole pipeline.

    Plan shape at 100 TB: quality scoring is scan-side (pure codegen
    column math, no shuffle); dedup shuffles only (md5, id); the
    survivor join is id-keyed; the rollup is 5 groups. The wide text
    column dies at the map side of the dedup — the classic
    'fingerprint early, move bytes never' layout."""
    # Fan out the single-split scan before the scoring projection
    # (round-14): quality/normalization/md5 are scan-side codegen, but
    # a one-split table runs them on ONE core — and `kept` is consumed
    # by BOTH the dedup aggregate and the semi-join probe, so the
    # projection is evaluated twice. Measured 1.61 -> 1.38 s isolated
    # at sf0.1 (and far less first-run jitter); no-op at scale.
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    # explode(array(struct(...))) is a pushdown barrier (round-15, see
    # text_quality_filter): without it the quality filter is pushed
    # below the fan-out exchange with the whole scoring expression
    # inlined, re-running it serially on the single-split scan side.
    kept = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.array(
                F.struct(
                    normalized_text("text").alias("t"),
                    quality_score("text").alias("quality"),
                    token_count("text").alias("n_tok"),
                )
            )
        ).alias("s"),
    ).select(
        "doc_id", "lang", "s.t", "s.quality", "s.n_tok"
    ).filter(F.col("quality") >= 0.5)
    surv = (
        kept.select(F.md5("t").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    final = kept.join(
        surv.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    return final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        (
            F.sum(F.col("quality").cast("decimal(30,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
    )


@query(
    "text_idf_drift",
    oracle=f"""
WITH d AS (SELECT doc_id, doc_id % 2 AS half, {SQL_NORM} AS t FROM documents),
tok AS (
  SELECT DISTINCT doc_id, half, unnest(string_split(t, ' ')) AS w
  FROM d WHERE t <> ''
),
n_docs AS (
  SELECT half, COUNT(DISTINCT doc_id) AS n FROM tok GROUP BY half
),
df AS (
  SELECT half, w, COUNT(*) AS df FROM tok GROUP BY half, w
),
paired AS (
  SELECT a.w,
         a.df AS df0, b.df AS df1,
         (SELECT n FROM n_docs WHERE half = 0) AS n0,
         (SELECT n FROM n_docs WHERE half = 1) AS n1
  FROM df a JOIN df b ON b.w = a.w AND a.half = 0 AND b.half = 1
)
SELECT w,
       CAST(df0 AS BIGINT) AS df_old, CAST(df1 AS BIGINT) AS df_new,
       CAST(abs(df1 * n0 - df0 * n1) AS BIGINT) AS drift_x,
       CAST(df1 AS DOUBLE) * n0 / (CAST(df0 AS DOUBLE) * n1) AS df_ratio
FROM paired
ORDER BY abs(df1 * n0 - df0 * n1) DESC, w
LIMIT 20
""",
    tags=("text", "drift", "vocabulary"),
)
def text_idf_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY DRIFT detector — the text twin of ann_centroid_drift:
    compare per-term document frequency between the index-time corpus
    half (even doc_ids) and the newly-ingested half, and surface the
    most frequent terms whose normalized DF moved by >= 1.5x in either
    direction (the signal that cached IDF tables / BM25 statistics
    are stale and retrieval scores are drifting): the top-20 terms by
    absolute normalized-DF movement |df1·n0 − df0·n1| — a pure
    integer drift score, exact in both engines (a threshold variant
    is one WHERE away); the reported ratio is one double expression
    in pinned order.

    Plan shape at 100 TB: per-half DF is the standard distinct
    (doc, term) explode + two-level count — shuffle carries term
    partials; the half-vs-half join runs on the (small) vocabulary
    relation, never documents."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            (F.col("doc_id") % 2).alias("half"),
            F.explode(tokens("text")).alias("w"),
        )
        .distinct()
    )
    n_docs = tok.groupBy("half").agg(
        F.countDistinct("doc_id").alias("n")
    )
    dfreq = tok.groupBy("half", "w").agg(F.count(F.lit(1)).alias("df"))
    a = dfreq.filter(F.col("half") == 0).select(
        "w", F.col("df").alias("df0")
    )
    b = dfreq.filter(F.col("half") == 1).select(
        "w", F.col("df").alias("df1")
    )
    n0 = n_docs.filter(F.col("half") == 0).select(F.col("n").alias("n0"))
    n1 = n_docs.filter(F.col("half") == 1).select(F.col("n").alias("n1"))
    paired = a.join(b, "w").crossJoin(F.broadcast(n0)).crossJoin(
        F.broadcast(n1)
    )
    drift_x = F.abs(F.col("df1") * F.col("n0") - F.col("df0") * F.col("n1"))
    return (
        paired.select(
            "w",
            F.col("df0").cast("long").alias("df_old"),
            F.col("df1").cast("long").alias("df_new"),
            drift_x.cast("long").alias("drift_x"),
            (
                F.col("df1").cast("double")
                * F.col("n0")
                / (F.col("df0").cast("double") * F.col("n1"))
            ).alias("df_ratio"),
        )
        .orderBy(F.desc("drift_x"), F.asc("w"))
        .limit(20)
    )


@query(
    "text_vocab_growth",
    oracle=f"""
WITH d AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
tok AS (
  SELECT d.doc_id, unnest(string_split(d.t, ' ')) AS tok
  FROM d WHERE d.t <> ''
),
first_seen AS (
  SELECT tok, MIN(doc_id) AS first_doc FROM tok GROUP BY tok
),
new_types AS (
  SELECT CAST(floor(first_doc / 100) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS new_types
  FROM first_seen GROUP BY 1
),
bucket_tokens AS (
  SELECT CAST(floor(doc_id / 100) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS bucket_tokens
  FROM tok GROUP BY 1
),
m AS (
  SELECT COALESCE(n.bucket, b.bucket) AS bucket,
         COALESCE(n.new_types, 0) AS new_types,
         COALESCE(b.bucket_tokens, 0) AS bucket_tokens
  FROM new_types n FULL OUTER JOIN bucket_tokens b ON b.bucket = n.bucket
)
SELECT bucket, new_types,
       CAST(SUM(new_types) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_types,
       bucket_tokens,
       CAST(SUM(bucket_tokens) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens
FROM m
""",
    tags=("text", "vocabulary", "heaps-law", "window"),
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY GROWTH CURVE (Heaps'-law empirics): cumulative
    distinct word types vs cumulative token volume as the corpus is
    consumed in doc_id order, bucketed per 100 documents — the curve
    that sizes tokenizer vocabularies and detects corpus saturation
    (a flattening curve means new data adds tokens but no new
    language). The text twin of ev_cumulative_unique_users: a type is
    "new" in the bucket containing the FIRST document it appears in,
    so no expanding-window distinct is ever evaluated.

    All counts are exact integers. Per-bucket token totals and
    first-seen buckets are independent aggregations full-outer-merged
    on bucket (a bucket can have tokens but no new types, or — for
    all-blank stretches — neither).

    Plan shape at 100 TB: the token explode feeds TWO map-side
    combined aggregations — groupBy(token) for first-seen (shuffle
    O(types), the vocabulary relation) and groupBy(bucket) for
    volume (shuffle O(buckets)); the cumulative window runs
    unpartitioned over O(buckets) rows, which is the calendar-bounded
    shape rel_running_total_by_month documents. Raw text never
    shuffles."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )
    bucket = (F.floor(F.col("doc_id") / 100)).cast("long")
    first_seen = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    new_types = first_seen.groupBy(
        (F.floor(F.col("first_doc") / 100)).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("new_types"))
    bucket_tokens = tok.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("bucket_tokens")
    )
    m = (
        new_types.join(bucket_tokens, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("new_types"), F.lit(0)).alias("new_types"),
            F.coalesce(F.col("bucket_tokens"), F.lit(0)).alias("bucket_tokens"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return m.select(
        "bucket",
        F.col("new_types").cast("long").alias("new_types"),
        F.sum("new_types").over(w).cast("long").alias("cum_types"),
        F.col("bucket_tokens").cast("long").alias("bucket_tokens"),
        F.sum("bucket_tokens").over(w).cast("long").alias("cum_tokens"),
    )


_ZIPF_TOP = 20


@query(
    "text_zipf_fit",
    oracle=f"""
WITH d AS (SELECT lang, {SQL_NORM} AS t FROM documents),
tok AS (
  SELECT lang, unnest(string_split(t, ' ')) AS tok FROM d WHERE t <> ''
),
freq AS (SELECT lang, tok, COUNT(*) AS f FROM tok GROUP BY lang, tok),
nd AS (SELECT lang, COUNT(*) AS n_distinct FROM freq GROUP BY lang),
top AS (
  SELECT lang, tok, f,
         row_number() OVER (PARTITION BY lang ORDER BY f DESC, tok) AS r
  FROM freq
),
agg AS (
  SELECT lang,
         MAX(f) AS f1,
         COUNT(*) AS n_top,
         SUM(abs(r * f - (SELECT MAX(f) FROM top t2
                          WHERE t2.lang = top.lang AND t2.r <= {_ZIPF_TOP})))
           AS dev
  FROM top WHERE r <= {_ZIPF_TOP} GROUP BY lang
)
SELECT agg.lang,
       CAST(nd.n_distinct AS BIGINT) AS n_distinct,
       CAST(agg.f1 AS BIGINT) AS f1,
       CAST(agg.n_top AS BIGINT) AS n_top,
       CAST(agg.dev AS DOUBLE) / (agg.n_top * agg.f1) AS zipf_dev
FROM agg JOIN nd ON nd.lang = agg.lang
""",
    tags=("text", "zipf", "distribution", "quality"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF-LAW adherence per language — a corpus-health signal
    (natural text has r*f_r approximately constant over the head;
    boilerplate-heavy or synthetic corpora deviate): over the top-20
    token ranks, deviation = sum(|r*f_r - f1|) / (R*f1). RATIONAL by
    construction — r*f_r is integer arithmetic, one final
    int-over-int division; the classical log-log regression slope
    needs ln(), which is 1-ulp engine-dependent and never
    hash-verifiable (same design rule as text_tfidf_keywords'
    rational idf). Tie ranks break lexicographically.

    Plan shape at 100 TB: token frequency is one map-side-combined
    groupBy; the rank window runs per-language over the (tiny
    relative to tokens) distinct-type table — and only its top-20
    survive to the fixed-size deviation aggregate. Vocabulary
    pruning (text_vocab_prune) bounds the distinct-type table if a
    pathological corpus explodes it."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(tokens("text")).alias("tok"))
    # freq feeds the vocabulary count and the rank window; persisted
    # so the token explode + count (the only data-sized work) runs once.
    freq = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("f")).persist()
    nd = freq.groupBy("lang").agg(F.count(F.lit(1)).alias("n_distinct"))
    w = Window.partitionBy("lang").orderBy(F.desc("f"), F.asc("tok"))
    top = freq.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= _ZIPF_TOP
    )
    top = top.withColumn("f1", F.max("f").over(Window.partitionBy("lang")))
    agg = top.groupBy("lang").agg(
        F.max("f").alias("f1"),
        F.count(F.lit(1)).alias("n_top"),
        F.sum(F.abs(F.col("r") * F.col("f") - F.col("f1"))).alias("dev"),
    )
    return agg.join(nd, "lang").select(
        "lang",
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("f1").cast("long").alias("f1"),
        F.col("n_top").cast("long").alias("n_top"),
        (F.col("dev").cast("double") / (F.col("n_top") * F.col("f1"))).alias(
            "zipf_dev"
        ),
    )


@query(
    "text_ngram_novelty",
    oracle=f"""
WITH d AS (SELECT doc_id, source, {SQL_NORM} AS t FROM documents),
tok AS (
  SELECT doc_id, source, string_split(t, ' ') AS w FROM d WHERE t <> ''
),
sh AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(w[i.i + 1 : i.i + 3], ' ') AS g
  FROM tok CROSS JOIN (SELECT unnest(range(0, 4096)) AS i) i
  WHERE i.i + 3 <= len(w)
),
first_seen AS (SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY g),
flags AS (
  SELECT s.source, s.doc_id,
         CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END AS novel
  FROM sh s JOIN first_seen f ON f.g = s.g
)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS total_shingles,
       CAST(SUM(novel) AS BIGINT) AS novel_shingles,
       CAST(SUM(novel) AS DOUBLE) / COUNT(*) AS novelty_ratio
FROM flags GROUP BY source
""",
    tags=("text", "novelty", "self-repetition", "shingles"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-GRAM NOVELTY per source — the self-repetition corpus-health
    metric (a crawl slice whose later documents mostly repeat earlier
    trigrams adds tokens but no information; novelty collapse is the
    signal to cap that source, cf. text_source_quality_cap): a
    trigram is NOVEL in the document where it first appears
    (min doc_id — a deterministic stand-in for ingestion order);
    per source, the novel fraction of all distinct doc-trigram
    observations. Integer counts, one final division.

    Plan shape at 100 TB: the shingle explode feeds ONE
    groupBy(shingle) for first-occurrence (the same shuffle budget
    as span dedup) and a join back on the shingle key; per-source
    rollup is O(sources). Streaming form: first_seen becomes a
    state store keyed by shingle hash with TTL."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    toks = docs.select("doc_id", "source", tokens("text").alias("w")).filter(
        F.size("w") >= 3
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 3),
        lambda i: F.array_join(F.slice("w", i + 1, 3), " "),
    )
    sh = (
        toks.select(
            "doc_id", "source", F.explode(F.array_distinct(grams)).alias("g")
        )
        .distinct()
        .persist()  # first-occurrence groupBy + flag join both read it
    )
    first_seen = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    flags = sh.join(first_seen, "g").select(
        "source",
        "doc_id",
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0).alias(
            "novel"
        ),
    )
    return flags.groupBy("source").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("total_shingles"),
        F.sum("novel").cast("long").alias("novel_shingles"),
        (F.sum("novel").cast("double") / F.count(F.lit(1))).alias(
            "novelty_ratio"
        ),
    )


@query(
    "text_tokenizer_fertility",
    oracle=f"""
WITH d AS (
  SELECT lang, text, {SQL_NORM} AS t FROM documents
),
m AS (
  SELECT lang,
         CAST({SQL_NTOK} AS BIGINT) AS ws,
         CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT)
           AS bpe
  FROM d
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       CAST(SUM(bpe) AS DOUBLE) / SUM(ws) AS fertility
FROM m GROUP BY lang
""",
    tags=("text", "tokenizer", "fertility", "budget"),
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY per language — subword tokens per word, the
    metric tokenizer evaluations report per language (high fertility
    = the vocabulary splinters that language, inflating compute per
    unit of text and starving it of effective context; the number
    that drives vocab rebalancing in multilingual training): BPE-ish
    pre-token count over whitespace-token count, both corpus-summed
    integers, one final division.

    Plan shape at 100 TB: both token counts are scan-side regexp
    expressions inside codegen; one map-side-combined
    groupBy(lang)."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "lang",
        token_count("text").alias("ws"),
        bpe_ish_token_count("text").alias("bpe"),
    )
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.sum("bpe").cast("long").alias("bpe_tokens"),
        (F.sum("bpe").cast("double") / F.sum("ws")).alias("fertility"),
    )


@query(
    "text_length_percentiles",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       quantile_cont(n_chars, 0.10) AS p10_chars,
       quantile_cont(n_chars, 0.50) AS p50_chars,
       quantile_cont(n_chars, 0.90) AS p90_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY lang
""",
    tags=("text", "percentiles", "length", "curation"),
)
def text_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT document-length percentiles per language — the numbers a
    curation pass reads before choosing its min/max length cutoffs
    (cutoffs copied from an English recipe amputate languages whose
    scripts pack more meaning per character; per-language p10/p90 is
    the principled alternative). Interpolated percentiles over exact
    integers — the same two-longs IEEE step in both engines
    (ev_interarrival_stats precedent).

    Plan shape at 100 TB: percentile per group is a sort-based
    aggregate over each language partition of ONE integer column —
    n_chars is already materialized in the table, so the scan reads
    two columns. The approx path (percentile_approx / GK sketch,
    udf_approx_quantiles) takes over when exact per-group sorts
    outgrow their partitions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("percentile(n_chars, 0.10)").alias("p10_chars"),
        F.expr("percentile(n_chars, 0.50)").alias("p50_chars"),
        F.expr("percentile(n_chars, 0.90)").alias("p90_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


@query(
    "text_source_divergence_tv",
    oracle=f"""
WITH d AS (SELECT source, {SQL_NORM} AS t FROM documents),
tok AS (SELECT source, unnest(string_split(t, ' ')) AS tok FROM d WHERE t <> ''),
sc AS (SELECT source, tok, COUNT(*) AS n FROM tok GROUP BY source, tok),
st AS (SELECT source, SUM(n) AS ns FROM sc GROUP BY source),
cc AS (SELECT tok, SUM(n) AS m FROM sc GROUP BY tok),
ct AS (SELECT SUM(n) AS mt FROM sc),
terms AS (
  SELECT s.source,
         abs(COALESCE(c.n, 0) * ct.mt - cc.m * st.ns) AS num
  FROM (SELECT DISTINCT source FROM sc) s
  JOIN st ON st.source = s.source
  CROSS JOIN ct
  JOIN cc ON TRUE
  LEFT JOIN sc c ON c.source = s.source AND c.tok = cc.tok
)
SELECT t.source,
       CAST(st.ns AS BIGINT) AS n_tokens,
       CAST(SUM(t.num) AS DOUBLE) / (2.0 * st.ns * ct.mt) AS tv_distance
FROM terms t
JOIN st ON st.source = t.source
CROSS JOIN ct
GROUP BY t.source, st.ns, ct.mt
""",
    tags=("text", "distribution-shift", "total-variation", "drift"),
)
def text_source_divergence_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTION SHIFT per source as TOTAL-VARIATION distance
    between the source's unigram distribution and the corpus's:
    TV = (1/2) * sum_w |p_s(w) - p(w)| — the drift detector that,
    unlike KL/JS divergence, needs NO logarithm (ln is never
    hash-verifiable cross-engine; same design rule as text_zipf_fit)
    and is a true metric bounded in [0, 1]. Every numerator term is
    the integer cross-multiply |n_w*M - m_w*N_s| (absent words
    contribute m_w*N_s via the left join's NULL -> n_w = 0), with ONE
    final division — bit-exact by construction. High TV = the source
    speaks a different unigram language than the corpus (template
    spam, code, another register) — the flag feeding
    text_source_quality_cap.

    Plan shape at 100 TB: per-source and corpus term counts are two
    map-side-combined aggregations of the same token explode
    (persisted); the term union is a vocabulary-sized join keyed on
    the token, pruned by text_vocab_prune's cap when a pathological
    corpus explodes the vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens("text")).alias("tok"))
    sc = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n")).persist()
    st = sc.groupBy("source").agg(F.sum("n").alias("ns"))
    cc = sc.groupBy("tok").agg(F.sum("n").alias("m"))
    ct = sc.agg(F.sum("n").alias("mt"))
    sources = sc.select("source").distinct()
    grid = sources.crossJoin(cc)  # every (source, vocab word) pair
    terms = (
        grid.join(sc, ["source", "tok"], "left")
        .join(st, "source")
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            "ns",
            "mt",
            F.abs(
                F.coalesce(F.col("n"), F.lit(0)) * F.col("mt")
                - F.col("m") * F.col("ns")
            ).alias("num"),
        )
    )
    return terms.groupBy("source", "ns", "mt").agg(
        F.sum("num").alias("sn")
    ).select(
        "source",
        F.col("ns").cast("long").alias("n_tokens"),
        (F.col("sn").cast("double") / (2.0 * F.col("ns") * F.col("mt"))).alias(
            "tv_distance"
        ),
    )


# --------------------------------------------------------------------------
# Round 7: BPE tokenizer training + positional-index phrase search
# --------------------------------------------------------------------------

def _bpe_oracle(rounds: int) -> str:
    """Unrolled BPE training oracle: each round re-derives pair counts
    from the previous round's symbol sequences, picks the best pair
    (count DESC, pair ASC), and applies the TWO-PASS space-delimited
    replace (both engines' replace() is non-overlapping left-to-right
    and skips the occurrence that shares a boundary space with the
    previous match — pass 2 catches exactly those; verified identical
    in Spark and DuckDB)."""
    sql = """
WITH words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(str_split(lower(text), ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
seq0 AS (
  SELECT word, freq, array_to_string(str_split(word, ''), ' ') AS seq
  FROM words
)"""
    for r in range(1, rounds + 1):
        p, c, b, s = f"pairs{r}", f"seq{r - 1}", f"best{r}", f"seq{r}"
        sql += f""",
{p} AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_transform(
             range(1, len(str_split(seq, ' '))),
             i -> str_split(seq, ' ')[i] || ' ' || str_split(seq, ' ')[i + 1]
           )) AS pair,
           freq
    FROM {c}
  ) GROUP BY pair
),
{b} AS (
  SELECT pair, cnt, replace(pair, ' ', '') AS merged
  FROM {p} ORDER BY cnt DESC, pair LIMIT 1
),
{s} AS (
  SELECT w.word, w.freq,
         trim(replace(
           replace(' ' || w.seq || ' ', ' ' || b.pair || ' ', ' ' || b.merged || ' '),
           ' ' || b.pair || ' ', ' ' || b.merged || ' ')) AS seq
  FROM {c} w CROSS JOIN {b} b
)"""
    rows = "\nUNION ALL\n".join(
        f"""SELECT {r} AS round, b.pair AS merge_pair, b.cnt AS pair_freq,
       (SELECT CAST(SUM(freq * len(str_split(seq, ' '))) AS BIGINT)
        FROM seq{r}) AS corpus_tokens_after
FROM best{r} b"""
        for r in range(1, rounds + 1)
    )
    return sql + "\n" + rows


# Persisted per-round BPE vocabs of the LAST invocation — unpersisted
# at the start of the next one (see the note inside the query).
_BPE_PERSISTED: list[DataFrame] = []


@query(
    "text_bpe_train_rounds",
    oracle=_bpe_oracle(3),
    tags=("text", "tokenizer", "bpe", "iterative", "llm-pipeline"),
    bench=True,
)
def text_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TOKENIZER TRAINING — three merge rounds of the actual
    byte-pair-encoding algorithm every LLM vocabulary is built with:
    count adjacent symbol-pair frequencies (weighted by word
    frequency), merge the most frequent pair (ties → lexicographic),
    repeat. Output = the learned merge table (round, pair, frequency)
    plus the corpus token count after each merge — the compression
    curve a tokenizer team actually reads.

    The merge operates on the DISTINCT-word frequency table, not the
    corpus — the standard trick that makes BPE scale: 100 TB of text
    has a few hundred million distinct words, so each round is a
    groupBy over pairs-of-symbols of THAT table. Merging uses a
    two-pass space-delimited replace: both engines' replace() is
    non-overlapping left-to-right, which skips an occurrence sharing
    a boundary space with the previous match ('a n a n' → first pass
    merges occurrences 1,3,5…, second pass the rest) — two passes
    reproduce exact greedy BPE, pinned by the cross-engine hash.

    Plan shape at 100 TB: per round, one map-side-combined pair count
    + a 1-row broadcast (the argmax) joined back — the word table is
    never shuffled; three rounds = three such passes declared lazily
    in ONE DAG (Catalyst sees through the loop). The word-frequency
    base is the only corpus-sized shuffle, paid once."""
    # ADVICE r14: the per-round vocab persists accumulated for the
    # session's lifetime (nothing inside the loop may unpersist them —
    # the rounds only materialize at the caller's action). Bound the
    # leak at one invocation's worth instead: by the time the query is
    # built again, the prior caller's action is done and its cached
    # vocabs are dead weight.
    for _old in _BPE_PERSISTED:
        try:
            _old.unpersist()
        except Exception:  # noqa: BLE001 — stale session handles
            pass
    _BPE_PERSISTED.clear()
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    vocab = words.select(
        "word", "freq", F.concat_ws(" ", F.split("word", "")).alias("seq")
    )
    round_rows = []
    for r in range(1, 4):
        syms = F.split("seq", " ")
        pairs = F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
        counts = (
            vocab.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        wbest = Window.orderBy(F.desc("cnt"), F.asc("pair"))
        best = (
            counts.withColumn("rn", F.row_number().over(wbest))
            .filter(F.col("rn") == 1)
            .select(
                "pair",
                "cnt",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
            )
        )
        padded = F.concat(F.lit(" "), F.col("seq"), F.lit(" "))
        pat = F.concat(F.lit(" "), F.col("pair"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
        # Each round's merged vocab is persisted (round-14, measured
        # 1.9 -> 1.25 s at sf0.1): round r+1's pair count, the argmax
        # broadcast, and the metrics rollup all re-derive the merge
        # chain otherwise — BPE is inherently sequential, so the
        # materialization is the per-round checkpoint a production
        # tokenizer train would write anyway (the word table is
        # distinct-words-sized, not corpus-sized; MEMORY_AND_DISK
        # spills gracefully at scale).
        vocab = vocab.crossJoin(F.broadcast(best)).select(
            "word",
            "freq",
            F.trim(F.replace(F.replace(padded, pat, rep), pat, rep)).alias("seq"),
            "pair",
            "cnt",
        ).persist()
        _BPE_PERSISTED.append(vocab)
        metrics = vocab.groupBy("pair", "cnt").agg(
            F.sum(F.col("freq") * F.size(F.split("seq", " ")))
            .cast("long")
            .alias("corpus_tokens_after")
        )
        round_rows.append(
            metrics.select(
                F.lit(r).cast("int").alias("round"),
                F.col("pair").alias("merge_pair"),
                F.col("cnt").alias("pair_freq"),
                "corpus_tokens_after",
            )
        )
        vocab = vocab.select("word", "freq", "seq")
    out = round_rows[0]
    for rr in round_rows[1:]:
        out = out.unionAll(rr)
    return out


@query(
    "text_positional_phrase_search",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         unnest(str_split(lower(text), ' ')) AS w,
         generate_subscripts(str_split(lower(text), ' '), 1) AS pos
  FROM documents
),
t1 AS (SELECT doc_id, pos FROM toks WHERE w = 'data'),
t2 AS (SELECT doc_id, pos FROM toks WHERE w = 'column'),
hits AS (
  SELECT t1.doc_id, t1.pos
  FROM t1 JOIN t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(pos) AS BIGINT) AS first_pos,
       CAST(MAX(pos) AS BIGINT) AS last_pos
FROM hits GROUP BY doc_id
""",
    tags=("text", "retrieval", "positional-index", "phrase-query"),
)
def text_positional_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHRASE SEARCH over a POSITIONAL inverted index — the search
    feature BM25 bag-of-words scoring cannot express: find documents
    where 'data' is IMMEDIATELY followed by 'column', via the
    adjacency self-join on (doc, position+1) that positional postings
    lists exist for (Lucene's PhraseQuery, re-expressed relationally).
    Output per matching doc: occurrence count and first/last match
    position (the snippet-highlighting inputs).

    Plan shape at 100 TB: posexplode is scan-side (no shuffle); each
    term's postings are filtered BEFORE the join, so the equi-join on
    (doc_id, pos) shuffles only the two terms' postings — the classic
    term-selectivity win; rare-term-first ordering comes free from
    size-based join planning (AQE). A pre-materialized postings table
    bucketed by term would make this shuffle-free; the adjacency
    predicate rides the equi-join key, never a range condition."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos0", "w"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    t1 = toks.filter(F.col("w") == "data").select("doc_id", "pos")
    t2 = toks.filter(F.col("w") == "column").select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
    )
    hits = t1.join(
        t2, (F.col("d2") == F.col("doc_id")) & (F.col("p2") == F.col("pos") + 1)
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("pos").cast("long").alias("first_pos"),
        F.max("pos").cast("long").alias("last_pos"),
    )


_STOPWORDS = ("a", "the", "of", "and", "to", "in", "is")


@query(
    "text_stopword_profile",
    oracle=f"""
WITH toks AS (
  SELECT source,
         unnest(str_split(lower(text), ' ')) AS w
  FROM documents
),
f AS (
  SELECT source, w <> '' AS real_tok,
         w IN ({", ".join(f"'{t}'" for t in _STOPWORDS)}) AS is_stop
  FROM toks
)
SELECT source,
       CAST(SUM(CASE WHEN real_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
       CAST(SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) AS DOUBLE)
         / SUM(CASE WHEN real_tok THEN 1 ELSE 0 END) AS stop_ratio
FROM f GROUP BY source
""",
    tags=("text", "curation", "stopwords", "quality"),
)
def text_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE stopword-ratio profile — the corpus-level curation
    dial that text_quality_filter's per-document score rolls up to:
    sources whose stopword ratio collapses toward 0 are usually
    navigation boilerplate / keyword stuffing, ratios near the
    natural-language band are prose. The stopword list is a broadcast
    literal (an IN over 7 strings compiles to a codegen'd lookup
    switch, no join); counts are integers and the ratio one exact
    division, so the profile is bit-stable.

    Plan shape at 100 TB: tokenize + classify scan-side, one
    map-side-combined (source) rollup — 20 output rows from any
    corpus size, no shuffle beyond the 20-group exchange."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    is_real = (F.col("w") != "").cast("int")
    is_stop = F.col("w").isin(*_STOPWORDS).cast("int")
    return toks.groupBy("source").agg(
        F.sum(is_real).cast("long").alias("n_tokens"),
        F.sum(is_stop).cast("long").alias("n_stop"),
        (F.sum(is_stop).cast("double") / F.sum(is_real)).alias("stop_ratio"),
    )


_WIN_W = 4       # winnowing window: w consecutive 3-gram hashes
_WIN_SHARED = 2  # report pairs sharing >= this many fingerprints
_WIN_HOT = 50    # drop fingerprints present in more docs (stopword guard)


@query(
    "text_winnowing_overlap",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split({SQL_NORM}, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         ('0x' || substr(md5(w[CAST(t.i AS INTEGER)] || ' ' ||
                             w[CAST(t.i AS INTEGER) + 1] || ' ' ||
                             w[CAST(t.i AS INTEGER) + 2]), 1, 12))::BIGINT AS h
  FROM d, unnest(range(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 3
),
win AS (
  SELECT doc_id, pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
           AS fh,
         COUNT(*) OVER (PARTITION BY doc_id) AS ng
  FROM g
),
fp AS (
  SELECT DISTINCT doc_id, fh FROM win WHERE pos <= ng - {_WIN_W}
),
keep AS (
  SELECT fh FROM fp GROUP BY fh HAVING COUNT(*) <= {_WIN_HOT}
),
fk AS (SELECT fp.doc_id, fp.fh FROM fp JOIN keep USING (fh))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fk a JOIN fk b ON a.fh = b.fh AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {_WIN_SHARED}
""",
    tags=("text", "winnowing", "fingerprint", "near-dup", "moss"),
)
def text_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINNOWING fingerprint overlap (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm) — the position-aware alternative to MinHash
    for local similarity: hash every word 3-gram IN ORDER, slide a
    w=4 window over the hash sequence, keep each window's
    minimum as a fingerprint (guaranteeing any shared run of ≥ w+2
    words yields a shared fingerprint), then report document pairs
    sharing ≥ 2 fingerprints. Fingerprints present in
    more than 50 documents are dropped before pairing — the
    same hot-bucket cap as the MinHash-LSH band join
    (operators/dedup.py), guarding the self-join from stopword-gram
    quadratic blowup.

    Plan shape at 100 TB: gram hashing is per-row; the window min
    needs ONE doc-keyed shuffle (same partitioning serves the
    distinct); pairing is an equi-join on the fingerprint VALUE —
    cap-bounded fan-out, never all-pairs."""
    docs = ensure_parallelism(  # round-14: single-split scan fed heavy per-row work
        load_table(spark, sf_dir, "documents")
    )
    toks = tokens("text")
    k = F.size(toks)
    # bind_once: tokens() re-runs per gram inside the lambda otherwise
    # (round-14; see functions/text.py:bind_once)
    grams = bind_once(
        toks,
        lambda tk: F.transform(
            F.sequence(F.lit(1), F.size(tk) - 2),
            lambda i: F.array_join(F.slice(tk, i, 3), " "),
        ),
    )
    g = (
        docs.filter(k >= 3)
        .select("doc_id", F.posexplode(grams).alias("p0", "gram"))
        .select(
            "doc_id",
            (F.col("p0") + 1).cast("long").alias("pos"),
            F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    # Spill guard (operators/util.py): the window-min sorts each
    # task's gram rows; a fixed partition count is a spill cliff once
    # grams-per-task outgrow execution memory (the q21 signature —
    # measured 3.5x wall for 3x data on the synthetic probe before
    # this guard).
    n_parts = scaled_shuffle_partitions(g, target_bytes=8 << 20)
    if n_parts:
        g = g.repartition(n_parts, "doc_id")
    w_min = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN_W - 1)
    )
    w_cnt = Window.partitionBy("doc_id")
    win = g.select(
        "doc_id", "pos",
        F.min("h").over(w_min).alias("fh"),
        F.count(F.lit(1)).over(w_cnt).alias("ng"),
    )
    # Materialized once: the fingerprint table feeds THREE consumers
    # (hot-cap census, and both sides of the pair join). Without the
    # persist the window+distinct recomputes per consumer — measured
    # 16.6x at 30x on the synthetic probe, 7.9x with it (the
    # operators/graph.py:56 multi-consumer pattern).
    fp = (
        win.filter(F.col("pos") <= F.col("ng") - _WIN_W)
        .select("doc_id", "fh")
        .distinct()
        .persist()
    )
    keep = fp.groupBy("fh").agg(F.count(F.lit(1)).alias("nd")).filter(
        F.col("nd") <= _WIN_HOT
    )
    fk = fp.join(keep.select("fh"), "fh")
    a = fk.select(F.col("doc_id").alias("doc_a"), "fh")
    b = fk.select(F.col("doc_id").alias("doc_b"), "fh")
    return (
        a.join(b, "fh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_SHARED)
    )


@query(
    "text_gini_concentration",
    oracle="""
WITH r AS (
  SELECT source, n_chars,
         CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars,
                                 doc_id) AS BIGINT) AS i,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM documents
)
SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM((2 * i - n - 1) * n_chars) AS DOUBLE)
         / (MAX(n) * SUM(n_chars)) AS gini
FROM r GROUP BY source
""",
    tags=("text", "gini", "concentration", "corpus-audit"),
)
def text_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI concentration of document length per source — the corpus
    inequality audit (is one source's token budget dominated by a few
    giant documents?) used to decide length-capping before training.
    Uses the exact rank formulation G = Σ(2i − n − 1)·x_i / (n·Σx)
    over lengths sorted within source: every term is INTEGER
    arithmetic (rank, count, n_chars), with a single per-row double
    division at the end — bit-exact across engines, no sorting of
    floats.

    Plan shape at 100 TB: one shuffle on source serves both the rank
    window and the aggregate (Catalyst reuses the partitioning);
    per-source work parallelizes across sources. Skewed single-source
    corpora would salt the rank via the ntile-bucket pattern of
    rel_ntile_deciles."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    r = docs.select(
        "source", "n_chars",
        F.row_number().over(w).cast("long").alias("i"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n"),
    )
    return r.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        (
            F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("n_chars"))
            .cast("double")
            / (F.max("n") * F.sum("n_chars"))
        ).alias("gini"),
    )


_BUDGET_TOKENS = 20_000  # per-source whitespace-token budget


@query(
    "text_token_budget_cut",
    oracle=f"""
WITH d AS (SELECT doc_id, source, n_chars, {SQL_NORM} AS t FROM documents),
tok AS (
  SELECT doc_id, source, n_chars, CAST({SQL_NTOK} AS BIGINT) AS n_tok
  FROM d
),
runs AS (
  SELECT source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source
                          ORDER BY n_chars DESC, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM tok
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS docs_total,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
       CAST(COUNT(*) FILTER (WHERE cum - n_tok < {_BUDGET_TOKENS})
            AS BIGINT) AS docs_kept,
       CAST(COALESCE(SUM(n_tok)
              FILTER (WHERE cum - n_tok < {_BUDGET_TOKENS}), 0)
            AS BIGINT) AS tokens_kept,
       CAST(COALESCE(SUM(n_tok)
              FILTER (WHERE cum - n_tok < {_BUDGET_TOKENS}), 0) AS DOUBLE)
         / SUM(n_tok) AS kept_frac
FROM runs
GROUP BY source
""",
    tags=("text", "curation", "token-budget", "window"),
)
def text_token_budget_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE TOKEN-BUDGET enforcement — the curation step that
    turns "we want at most N tokens from each source" into a
    deterministic cut: within each source, documents are ranked by a
    quality proxy (longer first, doc_id tiebreak) and admitted while
    the running token total BEFORE the document is under the
    {_BUDGET_TOKENS}-token budget (so every source keeps >= 1 doc and
    overruns by at most one document's tail, the same admission rule
    as text_pack_sequences' bins). Output is the per-source budget
    report: totals, kept counts, and the kept-token fraction a
    mixture designer feeds back into sampling weights
    (text_mix_rebalance_weights is the companion).

    Plan shape at 100 TB: ONE shuffle keyed by source; each source's
    running sum parallelizes as its own window partition. Source
    count is small-but-skewed (a web crawl dwarfs a books corpus), so
    the production form range-buckets WITHIN source on the rank key
    and lifts local prefix sums with a broadcast offset table — the
    rel_ntile_deciles two-level pattern; at this surface's source
    cardinality the single window per source is the right plan."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        "n_chars",
        token_count("text").cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = tok.withColumn("cum", F.sum("n_tok").over(w))
    kept = F.col("cum") - F.col("n_tok") < _BUDGET_TOKENS
    return runs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_total"),
        F.sum("n_tok").cast("long").alias("tokens_total"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("docs_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("n_tok"))), F.lit(0))
        .cast("long")
        .alias("tokens_kept"),
        (
            F.coalesce(F.sum(F.when(kept, F.col("n_tok"))), F.lit(0)).cast(
                "double"
            )
            / F.sum("n_tok")
        ).alias("kept_frac"),
    )


def _bpe_encode_oracle(rounds: int) -> str:
    """Training CTEs from _bpe_oracle, then ENCODE the held-out slice
    (doc_id % 10 = 7) by word-level lookup into the trained symbol
    table — per-word BPE is a pure dictionary application once the
    merge table is fixed, which is why production tokenizers cache
    word→tokens."""
    head = _bpe_oracle(rounds)
    # _bpe_oracle ends with the per-round metric SELECTs; keep just the
    # WITH chain (everything up to and including the last CTE's ")").
    train = head[: head.index("\nSELECT 1")]
    ctes = train[: train.rindex(")") + 1]
    return ctes + f""",
held AS (
  SELECT doc_id, source,
         unnest(str_split(lower(text), ' ')) AS word
  FROM documents WHERE doc_id % 10 = 7
),
hw AS (SELECT doc_id, source, word FROM held WHERE word <> ''),
enc AS (
  SELECT h.doc_id, h.source,
         CAST(len(str_split(s.seq, ' ')) AS BIGINT) AS n_tok,
         CAST(len(h.word) AS BIGINT) AS n_chr
  FROM hw h JOIN seq{rounds} s ON s.word = h.word
)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chr) AS BIGINT) AS n_chars,
       CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS fertility,
       CAST(SUM(n_chr) AS DOUBLE) / SUM(n_tok) AS chars_per_token
FROM enc GROUP BY source
"""


@query(
    "text_bpe_encode_apply",
    oracle=_bpe_encode_oracle(3),
    tags=("text", "tokenizer", "bpe", "encode", "llm-pipeline"),
)
def text_bpe_encode_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — apply the merge table learned by
    text_bpe_train_rounds to a held-out document slice (doc_id % 10 =
    7) and report per-source token statistics (fertility = BPE tokens
    per word, chars-per-token = the compression a context window
    actually feels). Encoding is a WORD-LEVEL DICTIONARY LOOKUP: once
    the merges are fixed, every occurrence of a word tokenizes
    identically, so the corpus-sized work is one join from the
    held-out words to the trained word→symbols table — the cache
    trick (HuggingFace tokenizers' word cache) expressed as the join
    it secretly is.

    Training reruns the same three deterministic merge rounds as
    text_bpe_train_rounds (distinct-word table, two-pass replace);
    Catalyst sees train + encode as ONE DAG, so the word table is
    built once.

    Plan shape at 100 TB: the train side never shuffles the corpus
    (pair counts are map-side-combined over the distinct-word
    table); the encode side is one explode + one equi-join on word
    (broadcastable — the vocab is distinct words) + one groupBy
    per source. Exact integers everywhere; two final divisions."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    vocab = words.select(
        "word", "freq", F.concat_ws(" ", F.split("word", "")).alias("seq")
    )
    for _ in range(3):
        syms = F.split("seq", " ")
        pairs = F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
        counts = (
            vocab.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        wbest = Window.orderBy(F.desc("cnt"), F.asc("pair"))
        best = (
            counts.withColumn("rn", F.row_number().over(wbest))
            .filter(F.col("rn") == 1)
            .select(
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias(
                    "merged"
                ),
            )
        )
        padded = F.concat(F.lit(" "), F.col("seq"), F.lit(" "))
        pat = F.concat(F.lit(" "), F.col("pair"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
        vocab = vocab.crossJoin(F.broadcast(best)).select(
            "word",
            "freq",
            F.trim(F.replace(F.replace(padded, pat, rep), pat, rep)).alias(
                "seq"
            ),
        )
    held = (
        docs.filter(F.col("doc_id") % 10 == 7)
        .select(
            "doc_id",
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    enc = held.join(vocab.select("word", "seq"), "word").select(
        "doc_id",
        "source",
        F.size(F.split("seq", " ")).cast("long").alias("n_tok"),
        F.length("word").cast("long").alias("n_chr"),
    )
    return enc.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_chr").cast("long").alias("n_chars"),
        (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias(
            "fertility"
        ),
        (F.sum("n_chr").cast("double") / F.sum("n_tok")).alias(
            "chars_per_token"
        ),
    )


@query(
    "text_kneser_ney_bigrams",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(str_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT unnest(list_transform(range(1, len(t)),
                               i -> {'w1': t[i], 'w2': t[i + 1]})) AS b
  FROM toks WHERE len(t) >= 2
),
c2 AS (
  SELECT b.w1 AS w1, b.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM bg GROUP BY 1, 2
),
c1 AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
         CAST(COUNT(*) AS BIGINT) AS n1_fwd
  FROM c2 GROUP BY w1
),
ctx AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1_bwd FROM c2 GROUP BY w2
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c2)
SELECT c2.w1, c2.w2, c2.c, c1.cw1, c1.n1_fwd, ctx.n1_bwd,
       (CAST(c2.c AS DOUBLE) - 0.75) / c1.cw1
         + (0.75 * c1.n1_fwd / c1.cw1)
           * (CAST(ctx.n1_bwd AS DOUBLE) / (SELECT n_types FROM tot))
         AS p_kn
FROM c2
JOIN c1 ON c1.w1 = c2.w1
JOIN ctx ON ctx.w2 = c2.w2
WHERE c2.c >= 5
ORDER BY p_kn DESC, c2.w1, c2.w2
LIMIT 20
""",
    tags=("text", "language-model", "kneser-ney", "smoothing",
          "llm-pipeline"),
)
def text_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNESER-NEY smoothed bigram probabilities — the LM estimator
    behind every pre-neural speech/MT system and still the standard
    fast quality filter (KenLM) in LLM data pipelines:

      P_KN(w2|w1) = max(c(w1,w2) - d, 0)/c(w1·)
                  + (d · N1+(w1·)/c(w1·)) · N1+(·w2)/N1+(··)

    with discount d = 0.75. The continuation probability
    N1+(·w2)/N1+(··) is the famous part: 'Francisco' is frequent but
    only ever follows 'San', so its continuation mass is tiny. All
    five inputs are exact integer counts off ONE bigram-count table
    (c2): left-context totals and fan-out by groupBy(w1),
    continuation fan-in by groupBy(w2), type count as one scalar —
    the estimator is three reuses of the same aggregate. The float
    expression tree is written identically in both engines (the
    c >= 5 filter keeps max(c-d, 0) = c-d, avoiding the only branch);
    top-20 cutoff is the deterministic (p_kn DESC, w1, w2) order.

    Plan shape at 100 TB: one corpus explode -> map-side-combined
    bigram count; the three derived tables are aggregations OF THAT
    table (orders of magnitude smaller than the corpus); two
    broadcast-scale joins back; TakeOrdered(20). KenLM's full
    modified-KN (three discounts, trigram backoff) adds more
    aggregate reuse, not more shuffle classes."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.filter(
            F.split(F.lower("text"), " "), lambda x: x != ""
        ).alias("t")
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i - 1] AS w1, t[i] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c2 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).persist()
    c1 = c2.groupBy("w1").agg(
        F.sum("c").cast("long").alias("cw1"),
        F.count(F.lit(1)).cast("long").alias("n1_fwd"),
    )
    ctx = c2.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1_bwd")
    )
    tot = c2.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    scored = (
        c2.filter(F.col("c") >= 5)
        .join(c1, "w1")
        .join(ctx, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c",
            "cw1",
            "n1_fwd",
            "n1_bwd",
            (
                (F.col("c").cast("double") - F.lit(0.75)) / F.col("cw1")
                + (F.lit(0.75) * F.col("n1_fwd") / F.col("cw1"))
                * (F.col("n1_bwd").cast("double") / F.col("n_types"))
            ).alias("p_kn"),
        )
    )
    return scored.orderBy(F.desc("p_kn"), "w1", "w2").limit(20)


_TWE_DIM = 8
_TWE_QUERY_WORDS = ("data", "column", "scan", "query")


def _twe_oracle() -> str:
    qvals = ", ".join(f"('{w}')" for w in _TWE_QUERY_WORDS)
    return f"""
WITH d AS (SELECT unnest(range({_TWE_DIM})) AS dim),
toks AS (
  SELECT doc_id, unnest(str_split(lower(text), ' ')) AS word
  FROM documents
),
tw AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE word <> '' GROUP BY 1, 2
),
dfreq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tw GROUP BY word),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tw),
wv AS (
  SELECT f.word, d.dim,
         ('0x' || substr(md5(f.word || ':' || CAST(d.dim AS VARCHAR)),
                         1, 8))::BIGINT % 2001 - 1000 AS v,
         (nd.n * 1000000) // f.df AS widf
  FROM dfreq f CROSS JOIN d CROSS JOIN nd
),
de AS (
  SELECT t.doc_id, w.dim,
         CAST(SUM(t.tf * w.widf * w.v) AS BIGINT) AS e
  FROM tw t JOIN wv w ON w.word = t.word
  GROUP BY 1, 2
),
qw AS (SELECT * FROM (VALUES {qvals}) AS q(word)),
qe AS (
  SELECT w.dim, CAST(SUM(w.widf * w.v) AS BIGINT) AS e
  FROM qw JOIN wv w ON w.word = qw.word GROUP BY 1
),
score AS (
  SELECT de.doc_id,
         CAST(CAST(SUM(CAST(de.e AS DECIMAL(38,0)) * qe.e) AS VARCHAR)
              AS DOUBLE) /
         (sqrt(CAST(CAST((SELECT SUM(CAST(e AS DECIMAL(38,0)) * e)
                          FROM de d2 WHERE d2.doc_id = de.doc_id)
                    AS VARCHAR) AS DOUBLE))
          * sqrt(CAST(CAST((SELECT SUM(CAST(e AS DECIMAL(38,0)) * e)
                            FROM qe) AS VARCHAR) AS DOUBLE)))
           AS cos_sim
  FROM de JOIN qe ON qe.dim = de.dim
  GROUP BY de.doc_id
)
SELECT doc_id, cos_sim FROM score
ORDER BY cos_sim DESC, doc_id LIMIT 10
"""


@query(
    "text_tfidf_weighted_doc_embedding",
    oracle=_twe_oracle(),
    tags=("text", "doc-embedding", "tfidf-pooling", "retrieval"),
)
def text_tfidf_weighted_doc_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-WEIGHTED DOCUMENT EMBEDDINGS composed from WORD vectors
    — the classic pre-transformer dense-retrieval recipe (and still
    the standard cheap baseline): every word gets a deterministic
    hash vector (8 dims, integer components), a document's embedding
    is the sum of its words' vectors weighted by tf * idf, and
    retrieval is cosine against a query embedded the same way. The
    idf weight is INTEGER-IZED as (N * 10^6) div df — exact integer
    arithmetic end to end, so doc embeddings are exact BIGINT
    vectors and only the final cosine touches floats (identical
    expression tree both engines). Top-10 under (cos DESC, doc_id).

    Contrast with mm_embed_hash_knn (whole-document hash — no
    compositionality) and text_tfidf_keywords (per-doc term scores —
    no vector space): this one demonstrates the embedding
    CONSTRUCTION pipeline a feature store runs nightly.

    Plan shape at 100 TB: one corpus explode -> (doc, word, tf)
    shuffle; df and word vectors derive from the distinct-word table
    (broadcastable); doc embeddings are one (doc, dim) aggregate;
    query embedding is O(query words x dims). The final score scan
    is |docs| x 8 values."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    tw = toks.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).persist()
    dfreq = tw.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("df"))
    nd = tw.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    dims = spark.range(_TWE_DIM).select(F.col("id").cast("int").alias("dim"))
    wv = (
        dfreq.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(nd))
        .select(
            "word",
            "dim",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("word"),
                                F.lit(":"),
                                F.col("dim").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2001
                - 1000
            ).alias("v"),
            F.expr("(n * 1000000L) div df").alias("widf"),
        )
        .persist()
    )
    de = (
        tw.join(wv, "word")
        .groupBy("doc_id", "dim")
        .agg(
            F.sum(F.col("tf") * F.col("widf") * F.col("v"))
            .cast("long")
            .alias("e")
        )
    )
    qw = spark.createDataFrame(
        [(w,) for w in _TWE_QUERY_WORDS], "word string"
    )
    qe = (
        qw.join(wv, "word")
        .groupBy("dim")
        .agg(F.sum(F.col("widf") * F.col("v")).cast("long").alias("e"))
    )
    dec = "decimal(38,0)"
    qnorm = qe.agg(
        F.sqrt(
            F.sum(F.col("e").cast(dec) * F.col("e"))
            .cast("string")
            .cast("double")
        ).alias("qn")
    )
    dnorm = de.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(F.col("e").cast(dec) * F.col("e"))
            .cast("string")
            .cast("double")
        ).alias("dn")
    )
    dots = (
        de.join(F.broadcast(qe.select("dim", F.col("e").alias("qe"))), "dim")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("e").cast(dec) * F.col("qe"))
            .cast("string")
            .cast("double")
            .alias("dp")
        )
    )
    score = (
        dots.join(dnorm, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            (F.col("dp") / (F.col("dn") * F.col("qn"))).alias("cos_sim"),
        )
    )
    return score.orderBy(F.desc("cos_sim"), "doc_id").limit(10)


_RAKE_DELIMS = ("join", "hash", "row", "batch", "scan")


def _rake_oracle() -> str:
    dl = ", ".join(f"'{w}'" for w in _RAKE_DELIMS)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(str_split(lower(text), ' ')) AS word,
         generate_subscripts(str_split(lower(text), ' '), 1) AS pos
  FROM documents
),
t2 AS (
  SELECT doc_id, pos, word,
         CASE WHEN word IN ({dl}) OR word = '' THEN 1 ELSE 0 END AS dlm
  FROM toks
),
pid AS (
  SELECT doc_id, pos, word, dlm,
         SUM(dlm) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS phrase_id
  FROM t2
),
ph AS (
  SELECT doc_id, phrase_id,
         string_agg(word, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS plen
  FROM pid WHERE dlm = 0
  GROUP BY doc_id, phrase_id
),
pw AS (
  SELECT doc_id, phrase_id, plen,
         unnest(str_split(phrase, ' ')) AS word
  FROM ph
),
ws AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS deg,
         (SUM(plen) * 1000000) // COUNT(*) AS score_fp
  FROM pw GROUP BY word
),
psc AS (
  SELECT p.phrase, CAST(SUM(w.score_fp) AS BIGINT) AS phrase_score_fp
  FROM pw JOIN ws w ON w.word = pw.word
  JOIN ph p ON p.doc_id = pw.doc_id AND p.phrase_id = pw.phrase_id
  GROUP BY p.doc_id, p.phrase_id, p.phrase
),
agg AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(MAX(phrase_score_fp) AS BIGINT) AS score_fp
  FROM psc GROUP BY phrase
)
SELECT phrase, n_occurrences, score_fp,
       CAST(score_fp AS DOUBLE) / 1000000.0 AS rake_score
FROM agg
ORDER BY score_fp DESC, phrase
LIMIT 15
"""


@query(
    "text_rake_keyphrases",
    oracle=_rake_oracle(),
    tags=("text", "keyphrase-extraction", "rake", "llm-pipeline"),
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction, Rose et al. 2010) —
    the unsupervised keyphrase extractor production search stacks
    still reach for first: split text into candidate phrases at
    DELIMITER words (here the corpus's five most frequent words —
    this synthetic vocabulary has no natural stopwords, and RAKE's
    delimiter set is a free parameter), score each word by
    degree/frequency over the phrase graph, and score a phrase as
    the sum of its words' scores. Word scores are FIXED-POINT
    integers ((deg * 10^6) div freq), so phrase scores are exact
    integer sums — no float summation order anywhere; identical
    phrases aggregate across the corpus and the top-15 cutoff is
    the total order (score DESC, phrase).

    Plan shape at 100 TB: one positional explode, a per-doc
    prefix-sum window to number phrases (delimiters as +1 markers —
    the sessionize pattern applied to token streams), one word-stat
    aggregate over the phrase-membership table, one join back, one
    TakeOrdered(15). All corpus-sized steps are single shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
    )
    t2 = toks.withColumn(
        "dlm",
        F.when(
            F.col("word").isin(*_RAKE_DELIMS) | (F.col("word") == ""), 1
        ).otherwise(0),
    )
    wp = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pid = t2.withColumn("phrase_id", F.sum("dlm").over(wp))
    ph = (
        pid.filter(F.col("dlm") == 0)
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, word))),"
                    " s -> s.word)"
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("plen"),
        )
        .persist()
    )
    pw = ph.select(
        "doc_id",
        "phrase_id",
        "plen",
        F.explode(F.split("phrase", " ")).alias("word"),
    ).persist()
    ws = pw.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
        F.expr("(sum(plen) * 1000000L) div count(1)").alias("score_fp"),
    )
    psc = (
        pw.join(ws.select("word", "score_fp"), "word")
        .groupBy("doc_id", "phrase_id")
        .agg(F.sum("score_fp").cast("long").alias("phrase_score_fp"))
        .join(ph.select("doc_id", "phrase_id", "phrase"), ["doc_id", "phrase_id"])
    )
    agg = psc.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.max("phrase_score_fp").cast("long").alias("score_fp"),
    )
    return (
        agg.select(
            "phrase",
            "n_occurrences",
            "score_fp",
            (F.col("score_fp").cast("double") / F.lit(1000000.0)).alias(
                "rake_score"
            ),
        )
        .orderBy(F.desc("score_fp"), "phrase")
        .limit(15)
    )


@query(
    "text_watermark_greenlist_detect",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(str_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ':' || t[i + 1])) AS pair
  FROM toks WHERE len(t) >= 2
),
g AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN ('0x' || substr(md5(pair), 1, 8))::BIGINT % 2 = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_green
  FROM bg GROUP BY doc_id
)
SELECT doc_id, n_pairs, n_green,
       (2.0 * n_green - n_pairs) / sqrt(CAST(n_pairs AS DOUBLE)) AS z
FROM g
ORDER BY (2.0 * n_green - n_pairs) / sqrt(CAST(n_pairs AS DOUBLE)) DESC,
         doc_id
LIMIT 20
""",
    tags=("text", "llm-watermark", "greenlist", "detection",
          "llm-pipeline"),
)
def text_watermark_greenlist_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM WATERMARK DETECTION (Kirchenbauer et al. 2023 greenlist
    scheme) — the screen a training-data pipeline runs to keep
    synthetic, watermarked model output from contaminating a human
    corpus: a watermarking decoder biases each token toward the
    'green' half of the vocabulary selected by hashing the PREVIOUS
    token, so watermarked text shows a green fraction far above 1/2
    and the detector is the one-proportion z-score
    z = (2*G - n)/sqrt(n) over adjacent-token pairs. Greenlist
    membership is the md5 parity of 'prev:cur' — bit-identical in
    both engines; counts are exact integers and z's expression tree
    is written identically (sqrt on an exact integer cast). This
    clean corpus scores |z| ~ N(0,1) — the query certifies the
    DETECTOR's math, and any doc exceeding ~4 would be a real flag.

    Plan shape at 100 TB: one explode to adjacent pairs (no shuffle
    — doc-local), one map-side-combined per-doc aggregate,
    TakeOrdered(20). The detector is embarrassingly parallel, which
    is why it can run inline in ingestion."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias(
            "t"
        ),
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(t[i - 1], ':', t[i]))"
            )
        ).alias("pair"),
    )
    green = (
        F.conv(F.substring(F.md5("pair"), 1, 8), 16, 10).cast("long") % 2
        == 0
    )
    g = bg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(green, 1).otherwise(0)).cast("long").alias("n_green"),
    )
    z = (
        F.lit(2.0) * F.col("n_green") - F.col("n_pairs")
    ) / F.sqrt(F.col("n_pairs").cast("double"))
    return (
        g.select("doc_id", "n_pairs", "n_green", z.alias("z"))
        .orderBy(F.desc("z"), "doc_id")
        .limit(20)
    )


@query(
    "text_span_corruption_mask",
    oracle="""
WITH toks AS (
  SELECT d.doc_id, d.source,
         generate_subscripts(list_filter(str_split(lower(d.text), ' '),
                                         x -> x <> ''), 1) - 1 AS pos
  FROM documents d
),
starts AS (
  SELECT doc_id, pos FROM toks
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                            || CAST(pos AS VARCHAR)), 1, 8))::BIGINT
        % 20 = 0
),
masked AS (
  SELECT DISTINCT t.doc_id, t.pos
  FROM toks t JOIN starts s
    ON s.doc_id = t.doc_id AND t.pos BETWEEN s.pos AND s.pos + 2
)
SELECT tk.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(m.pos) AS BIGINT) AS n_masked,
       CAST((SELECT COUNT(*) FROM starts s2
             JOIN toks t2 ON t2.doc_id = s2.doc_id AND t2.pos = s2.pos
             JOIN documents dd ON dd.doc_id = s2.doc_id
             WHERE dd.source = tk.source) AS BIGINT) AS n_spans,
       CAST(COUNT(m.pos) AS DOUBLE) / COUNT(*) AS mask_rate
FROM toks tk
LEFT JOIN masked m ON m.doc_id = tk.doc_id AND m.pos = tk.pos
GROUP BY tk.source
""",
    tags=("text", "span-corruption", "t5-masking", "pretraining-prep",
          "llm-pipeline"),
)
def text_span_corruption_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-CORRUPTION MASKING statistics (the T5/UL2 pretraining
    objective's data-prep step): deterministic hash-selected span
    starts (md5(doc:pos) % 20 = 0 -> 5% of positions) each mask a
    3-token span; overlapping spans merge naturally because masked
    positions are the DISTINCT union of covered positions — exactly
    the r-of-n expected ~15% corruption rate T5 uses, realized here
    reproducibly so a re-run masks the identical tokens (the
    property that makes pretraining data versionable). Reported per
    source: tokens, masked tokens, raw span starts, and the realized
    mask rate (< 3x start rate where spans merged or hit document
    ends — the report quantifies exactly that shrinkage).

    All counts exact integers; one final division.

    Plan shape at 100 TB: one positional explode; span coverage is a
    doc-local range join (pos BETWEEN start AND start+2) — never
    leaves the document, so the whole job is map-side except the
    final per-source aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("pos", "word"),
    ).drop("word").persist()
    starts = toks.filter(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 20
        == 0
    ).select("doc_id", F.col("pos").alias("spos"))
    masked = (
        toks.select("doc_id", "pos")
        .join(starts, "doc_id")
        .filter(
            (F.col("pos") >= F.col("spos"))
            & (F.col("pos") <= F.col("spos") + 2)
        )
        .select("doc_id", "pos")
        .distinct()
        .withColumn("is_masked", F.lit(1))
    )
    span_counts = (
        starts.join(
            toks.select("doc_id", "source").distinct(), "doc_id"
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_spans"))
    )
    per_tok = toks.join(masked, ["doc_id", "pos"], "left")
    return (
        per_tok.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.count("is_masked").cast("long").alias("n_masked"),
        )
        .join(span_counts, "source")
        .select(
            "source",
            "n_tokens",
            "n_masked",
            "n_spans",
            (
                F.col("n_masked").cast("double") / F.col("n_tokens")
            ).alias("mask_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Round 8: repetition filtering (Gopher rules), importance resampling
# (DSIR), PII scrubbing — three more curation stages of the LLM data
# pipeline the reference implies (app.py ingests raw text with no
# quality gate; these are the gates a 100 TB corpus needs).
# ---------------------------------------------------------------------------


@query(
    "text_repetition_filter",
    oracle=f"""
WITH norm AS (SELECT doc_id, source, {SQL_NORM} AS t FROM documents),
docs AS (SELECT doc_id, source, t, string_split(t, ' ') AS w,
                CAST(length(t) AS BIGINT) AS n_chars
         FROM norm WHERE t <> ''),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)),
           i -> w[i] || ' ' || w[i+1])) AS gram
  FROM docs
),
bgc AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
top2 AS (
  SELECT doc_id, cnt * CAST(length(gram) AS BIGINT) AS top2_chars
  FROM (SELECT doc_id, gram, cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, gram ASC) AS rn
        FROM bgc)
  WHERE rn = 1
),
tg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
  FROM docs
),
tgc AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM tg GROUP BY 1, 2),
dup3 AS (
  SELECT doc_id,
         CAST(SUM(cnt * length(gram)) AS BIGINT) AS dup3_chars
  FROM tgc WHERE cnt >= 2 GROUP BY doc_id
),
per_doc AS (
  SELECT d.doc_id, d.source, d.n_chars,
         COALESCE(t.top2_chars, 0) AS top2_chars,
         COALESCE(p.dup3_chars, 0) AS dup3_chars
  FROM docs d
  LEFT JOIN top2 t ON t.doc_id = d.doc_id
  LEFT JOIN dup3 p ON p.doc_id = d.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN top2_chars * 1000 > 200 * n_chars
                     THEN 1 ELSE 0 END) AS BIGINT) AS flagged_top2,
       CAST(SUM(CASE WHEN dup3_chars * 1000 > 300 * n_chars
                     THEN 1 ELSE 0 END) AS BIGINT) AS flagged_dup3,
       CAST(SUM(top2_chars) AS BIGINT) AS top2_chars_total,
       CAST(SUM(dup3_chars) AS BIGINT) AS dup3_chars_total,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(top2_chars) AS DOUBLE) / SUM(n_chars) AS top2_frac,
       CAST(SUM(dup3_chars) AS DOUBLE) / SUM(n_chars) AS dup3_frac
FROM per_doc GROUP BY source
""",
    tags=("text", "curation", "repetition", "gopher-rules"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPETITION FILTERING (the Gopher/MassiveText rule family, Rae
    et al. 2021 Table A1): flag documents whose text is dominated by
    repeated n-grams — the signature of boilerplate, keyword stuffing,
    and templated spam. Two rule shapes are computed exactly:

      * top-2-gram fraction — characters occupied by the single most
        frequent word bigram (count × gram length) over total chars;
        Gopher's threshold 0.20.
      * duplicate-3-gram fraction — characters in trigrams occurring
        ≥ 2× in the document; threshold 0.30 (calibrated to this
        corpus's ~30-word vocabulary; Gopher's table uses n = 5…10
        with 0.15…0.10 — same rule shape, longer grams).

    All per-doc quantities are INTEGERS (char counts), flags are
    integer-scaled comparisons (×1000 vs threshold×chars — no float
    thresholds), and per-source fractions divide two summed BIGINTs
    once, so every column hash-matches bitwise.

    100 TB shape: n-gram expansion is doc-local (explode), counts are
    map-side-combinable, the only doc-keyed shuffles are the two
    (doc, gram) aggregates + the top-1 window — all linear, no
    cross-document work at all."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", normalized_text("text").alias("t"))
        .filter(F.col("t") != "")
        .select(
            "doc_id",
            "source",
            F.length("t").cast("long").alias("n_chars"),
            F.split("t", " ").alias("w"),
        )
    )

    def grams(n: int) -> DataFrame:
        k = F.size("w")
        g = F.transform(
            F.sequence(F.lit(0), k - n),
            lambda i: F.array_join(F.slice("w", i + 1, n), " "),
        )
        return docs.select(
            "doc_id",
            F.explode(F.when(k >= n, g).otherwise(
                F.array().cast("array<string>"))).alias("gram"),
        )

    bgc = grams(2).groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("cnt"))
    w_top = Window.partitionBy("doc_id").orderBy(
        F.desc("cnt"), F.asc("gram"))
    top2 = (
        bgc.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            (F.col("cnt") * F.length("gram").cast("long")).alias("top2_chars"),
        )
    )
    dup3 = (
        grams(3).groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.length("gram").cast("long"))
             .cast("long").alias("dup3_chars"))
    )
    per_doc = (
        docs.select("doc_id", "source", "n_chars")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "source",
            "n_chars",
            F.coalesce("top2_chars", F.lit(0).cast("long")).alias("top2_chars"),
            F.coalesce("dup3_chars", F.lit(0).cast("long")).alias("dup3_chars"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("top2_chars") * 1000 > 200 * F.col("n_chars"), 1)
              .otherwise(0)).cast("long").alias("flagged_top2"),
        F.sum(F.when(F.col("dup3_chars") * 1000 > 300 * F.col("n_chars"), 1)
              .otherwise(0)).cast("long").alias("flagged_dup3"),
        F.sum("top2_chars").cast("long").alias("top2_chars_total"),
        F.sum("dup3_chars").cast("long").alias("dup3_chars_total"),
        F.sum("n_chars").cast("long").alias("chars_total"),
        (F.sum("top2_chars").cast("double") / F.sum("n_chars"))
        .alias("top2_frac"),
        (F.sum("dup3_chars").cast("double") / F.sum("n_chars"))
        .alias("dup3_frac"),
    )


_DSIR_BUCKETS = 256
_DSIR_SCALE = 1_000_000


@query(
    "text_importance_resampling",
    oracle=f"""
WITH norm AS (SELECT doc_id, source, lang, {SQL_NORM} AS t FROM documents),
docs AS (SELECT doc_id, source, lang, string_split(t, ' ') AS w
         FROM norm WHERE t <> ''),
tok AS (
  SELECT doc_id, source, lang,
         ('0x' || substr(md5(unnest(w)), 1, 8))::BIGINT % {_DSIR_BUCKETS}
           AS bucket
  FROM docs
),
raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM tok GROUP BY 1),
tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM tok
        WHERE lang = 'en' GROUP BY 1),
feat AS (
  SELECT r.bucket, COALESCE(t.ct, 0) * {_DSIR_SCALE} // r.cr AS s
  FROM raw r LEFT JOIN tgt t ON t.bucket = r.bucket
),
scored AS (
  SELECT tok.doc_id, tok.source,
         CAST(SUM(f.s) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS rate
  FROM tok JOIN feat f ON f.bucket = tok.bucket
  GROUP BY tok.doc_id, tok.source
),
ranked AS (
  SELECT doc_id, source, rate,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY rate DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM scored
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rn * 4 <= n_src + 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(rate) AS BIGINT) AS rate_sum_all,
       CAST(SUM(CASE WHEN rn * 4 <= n_src + 3 THEN rate ELSE 0 END)
            AS BIGINT) AS rate_sum_kept
FROM ranked GROUP BY source
""",
    tags=("text", "curation", "dsir", "importance-resampling"),
)
def text_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA SELECTION VIA IMPORTANCE RESAMPLING (DSIR, Xie et al.
    2023): score every raw document by how target-like its hashed
    n-gram feature distribution is, then keep the top slice per
    source. Target = the ``lang = 'en'`` slice; features = md5-hashed
    unigram buckets (B = {_DSIR_BUCKETS}); a bucket's importance
    score is the fixed-point integer ratio
    ``target_count * 10^6 div raw_count`` (the rational-idf
    discipline — DSIR's log-likelihood-ratio sum is replaced by a
    per-bucket-monotone linear ratio so every doc score is an exact
    BIGINT sum; documented deviation, same ranking intuition), a doc's
    rate is its score integer-divided by its token count (length
    normalization), and each source keeps its top ⌈n/4⌉ docs by
    (rate, doc_id) — deterministic in place of DSIR's weighted
    sampling.

    100 TB shape: the feature table is {_DSIR_BUCKETS} rows —
    BROADCAST to the token stream, so scoring is map-side; the only
    corpus shuffles are the (bucket) count and the (doc) score
    aggregate; selection windows run over doc-level rows per source,
    never token rows. This is exactly why DSIR scales where
    perplexity-filtering needs a model server."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "lang",
                normalized_text("text").alias("t"))
        .filter(F.col("t") != "")
        .select("doc_id", "source", "lang", F.split("t", " ").alias("w"))
    )
    tok = docs.select(
        "doc_id",
        "source",
        "lang",
        F.explode("w").alias("word"),
    ).select(
        "doc_id",
        "source",
        "lang",
        (F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
         % _DSIR_BUCKETS).alias("bucket"),
    )
    raw = tok.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    tgt = (
        tok.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    feat = raw.join(tgt, "bucket", "left").select(
        "bucket",
        F.expr(f"coalesce(ct, 0L) * {_DSIR_SCALE} div cr").alias("s"),
    )
    scored = (
        tok.join(F.broadcast(feat), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.expr("sum(s) div count(1)").alias("rate"))
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.desc("rate"), F.asc("doc_id"))
    w_src = Window.partitionBy("source")
    ranked = scored.select(
        "source",
        "rate",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_src).alias("n_src"),
    )
    kept = F.col("rn") * 4 <= F.col("n_src") + 3
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum("rate").cast("long").alias("rate_sum_all"),
        F.sum(F.when(kept, F.col("rate")).otherwise(0))
        .cast("long").alias("rate_sum_kept"),
    )


_PII_EMAIL = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
_PII_PHONE = "[0-9]{3}-[0-9]{4}"
_PII_IP = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+\\b"


@query(
    "text_pii_scrub",
    oracle=f"""
WITH aug AS (
  SELECT doc_id, source,
         {SQL_NORM}
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call 555-0' || lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0')
                      || ' today' ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' from 10.0.' || (doc_id % 256) || '.1' ELSE '' END
           AS t
  FROM documents
),
scrub AS (
  SELECT doc_id, source, t,
         len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
         len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phone,
         len(regexp_extract_all(
           regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IP}')) AS n_ip,
         regexp_replace(regexp_replace(regexp_replace(
           t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IP}', '<IP>', 'g') AS clean
  FROM aug
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_email,
       CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_phone,
       CAST(SUM(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_ip,
       CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
       CAST(SUM(n_ip) AS BIGINT) AS ips_redacted,
       CAST(SUM(CAST(length(t) AS BIGINT)
                - CAST(length(clean) AS BIGINT)) AS BIGINT)
         AS chars_delta
FROM scrub GROUP BY source
""",
    tags=("text", "curation", "pii", "redaction"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII SCRUBBING — the redaction pass every public-web training
    corpus runs before release (emails, phone numbers, IP addresses →
    typed placeholder tokens). The fixture text is synthetic word
    salad with no PII, so deterministic PII is INJECTED first (doc_id
    % 7 → an email, % 11 → a phone, % 13 → an IP — same concat
    expression in both engines); the scrub itself is the real
    operator: three anchored character-class regexes (chosen from the
    Java∩RE2 common subset — no lookarounds, no backrefs, so Spark's
    Java regex and DuckDB's RE2 agree match-for-match), counted with
    regexp_count and removed with regexp_replace. The email pass runs
    before the IP pass and the IP count is taken AFTER email
    redaction, so an address inside an email can't double-count —
    redaction order is part of the operator's contract.

    Output per source: docs touched per PII type, total redactions
    per type, and the exact character delta — all integer columns.

    100 TB shape: pure map-side string work, zero joins, one
    per-source aggregate; regexes stay in the JVM (native
    regexp_replace/regexp_count, no Python boundary)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        "source",
        F.concat(
            normalized_text("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id"),
                         F.lit("@example.com now")),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.lit(" call 555-0"),
                         F.lpad((F.col("doc_id") % 100).cast("string"),
                                3, "0"),
                         F.lit(" today")),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(F.lit(" from 10.0."), F.col("doc_id") % 256,
                         F.lit(".1")),
            ).otherwise(""),
        ).alias("t"),
    )
    no_email = F.regexp_replace("t", _PII_EMAIL, "<EMAIL>")
    scrub = aug.select(
        "source",
        "t",
        F.regexp_count("t", F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count("t", F.lit(_PII_PHONE)).alias("n_phone"),
        F.regexp_count(no_email, F.lit(_PII_IP)).alias("n_ip"),
        F.regexp_replace(
            F.regexp_replace(no_email, _PII_PHONE, "<PHONE>"),
            _PII_IP, "<IP>",
        ).alias("clean"),
    )
    return scrub.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("n_email") > 0).cast("int")).cast("long")
        .alias("docs_with_email"),
        F.sum((F.col("n_phone") > 0).cast("int")).cast("long")
        .alias("docs_with_phone"),
        F.sum((F.col("n_ip") > 0).cast("int")).cast("long")
        .alias("docs_with_ip"),
        F.sum("n_email").cast("long").alias("emails_redacted"),
        F.sum("n_phone").cast("long").alias("phones_redacted"),
        F.sum("n_ip").cast("long").alias("ips_redacted"),
        F.sum(F.length("t").cast("long") - F.length("clean").cast("long"))
        .cast("long").alias("chars_delta"),
    )


@query(
    "text_unigram_surprise_filter",
    oracle=f"""
WITH norm AS (SELECT doc_id, source, {SQL_NORM} AS t FROM documents),
docs AS (SELECT doc_id, source, string_split(t, ' ') AS w
         FROM norm WHERE t <> ''),
tok AS (SELECT doc_id, source, unnest(w) AS word FROM docs),
wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY word),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM wc),
feat AS (
  SELECT wc.word,
         CAST(length(bin(tot.n // wc.cnt)) - 1 AS BIGINT) AS bits
  FROM wc, tot
),
per_doc AS (
  SELECT t.doc_id, t.source,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(SUM(f.bits) AS BIGINT) AS total_bits
  FROM tok t JOIN feat f ON f.word = t.word
  GROUP BY t.doc_id, t.source
),
rate AS (
  SELECT source, n_tok, total_bits,
         total_bits * 1000 // n_tok AS mbits
  FROM per_doc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN mbits < 4000 THEN 1 ELSE 0 END) AS BIGINT)
         AS flagged_low_surprise,
       CAST(SUM(CASE WHEN mbits > 7000 THEN 1 ELSE 0 END) AS BIGINT)
         AS flagged_high_surprise,
       CAST(SUM(total_bits) AS BIGINT) AS bits_total,
       CAST(SUM(n_tok) AS BIGINT) AS tok_total,
       CAST(SUM(total_bits) AS DOUBLE) / SUM(n_tok) AS mean_bits
FROM rate GROUP BY source
""",
    tags=("text", "curation", "perplexity-proxy", "surprise"),
)
def text_unigram_surprise_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIGRAM-SURPRISE quality filter — the exact-arithmetic stand-in
    for the perplexity filtering (CCNet/Wenzek et al.) that normally
    needs a language-model server: a token's surprise is
    floor(log2(N div cnt)) BITS, computed with NO transcendental —
    ``length(bin(x)) − 1`` is floor(log2) exactly for positive
    integers in both engines (the engine-wide no-libm-across-oracles
    discipline; integer-div-then-floor-log2 is the documented
    deviation from log2(N/cnt), off by at most one bit). A document's
    mean surprise in milli-bits is an integer (total_bits·1000 div
    n_tok); docs flag LOW (boilerplate — only frequent tokens) or
    HIGH (noise — rare-token salad), the two tails CCNet's perplexity
    buckets cut.

    100 TB shape: the per-word surprise table is O(vocab) and
    BROADCASTS to the token stream (the DSIR plan shape); corpus
    shuffles are the word count and the per-doc aggregate — both
    map-side-combinable. A real LM filter needs GPU inference per
    doc; this runs in two aggregates."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", normalized_text("text").alias("t"))
        .filter(F.col("t") != "")
        .select("doc_id", "source", F.split("t", " ").alias("w"))
    )
    tok = docs.select("doc_id", "source", F.explode("w").alias("word"))
    wc = tok.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = wc.agg(F.sum("cnt").cast("long").alias("n"))
    feat = wc.crossJoin(F.broadcast(tot)).selectExpr(
        "word", "cast(length(bin(n div cnt)) - 1 as bigint) AS bits"
    )
    per_doc = (
        tok.join(F.broadcast(feat), "word")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("bits").cast("long").alias("total_bits"),
        )
    )
    rate = per_doc.withColumn(
        "mbits", F.expr("total_bits * 1000 div n_tok"))
    return rate.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("mbits") < 4000, 1).otherwise(0)).cast("long")
        .alias("flagged_low_surprise"),
        F.sum(F.when(F.col("mbits") > 7000, 1).otherwise(0)).cast("long")
        .alias("flagged_high_surprise"),
        F.sum("total_bits").cast("long").alias("bits_total"),
        F.sum("n_tok").cast("long").alias("tok_total"),
        (F.sum("total_bits").cast("double") / F.sum("n_tok"))
        .alias("mean_bits"),
    )


_TEMP_ALPHA_SQRT = True  # alpha = 0.5 realized as sqrt (no pow/libm)


@query(
    "text_temperature_sampling",
    oracle="""
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS n_chars
  FROM documents GROUP BY source
),
w AS (SELECT source, n_docs, n_chars,
             sqrt(CAST(n_docs AS DOUBLE)) AS wgt
      FROM s),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
         list_reduce(list(wgt ORDER BY source), (a, b) -> a + b)
           AS denom
  FROM w
)
SELECT w.source, w.n_docs, w.n_chars,
       CAST(w.n_docs AS DOUBLE) / tot.total_docs AS raw_share,
       w.wgt / tot.denom AS sampled_share,
       (w.wgt / tot.denom)
         / (CAST(w.n_docs AS DOUBLE) / tot.total_docs) AS boost
FROM w, tot
""",
    tags=("text", "sampling", "temperature", "mixture"),
)
def text_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED SOURCE SAMPLING (the α-sampling of
    XLM-R/mT5: p_i ∝ n_i^α with α = 0.5) — the mixture policy that
    keeps low-resource sources from vanishing under proportional
    sampling while keeping high-resource ones from drowning the
    batch; `boost` is the up/down-sampling factor each source gets
    (> 1 for small sources, < 1 for large — the whole point made
    visible). α = 0.5 is realized as sqrt — a single IEEE op, no
    pow/libm crossing engines — and the normalizing denominator is a
    LEFT FOLD over the source-name-sorted weight list (the survival-
    curve discipline: identical addition order in both engines, so
    even the float shares hash bitwise; a bare SUM over doubles
    would not pin the order).

    Complements text_mix_rebalance_weights (target-driven reweights)
    with the standard parametric policy.

    100 TB shape: one map-side-combined source aggregate; everything
    after runs on O(sources) rows."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).cast("long").alias("n_chars"),
    )
    w = s.withColumn("wgt", F.sqrt(F.col("n_docs").cast("double")))
    tot = w.agg(
        F.sum("n_docs").cast("long").alias("total_docs"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "wgt"))),
                lambda x: x["wgt"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("denom"),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_chars",
        (F.col("n_docs").cast("double") / F.col("total_docs"))
        .alias("raw_share"),
        (F.col("wgt") / F.col("denom")).alias("sampled_share"),
        ((F.col("wgt") / F.col("denom"))
         / (F.col("n_docs").cast("double") / F.col("total_docs")))
        .alias("boost"),
    )


_TTR_WIN = 50  # sliding-window width (tokens) for type-token ratio


@query(
    "text_ttr_sliding",
    oracle=f"""
WITH d AS (SELECT doc_id, source, {SQL_NORM} AS t FROM documents),
tok AS (
  SELECT doc_id, source,
         unnest(string_split(t, ' ')) AS tok,
         unnest(range(1, len(string_split(t, ' ')) + 1)) AS p
  FROM d WHERE t <> ''
),
agg AS (
  SELECT doc_id, source, (p - 1) // {_TTR_WIN} AS w,
         COUNT(*) AS n, COUNT(DISTINCT tok) AS u
  FROM tok GROUP BY 1, 2, 3
),
fullw AS (
  SELECT source, CAST(u AS DOUBLE) / {_TTR_WIN} AS ttr
  FROM agg WHERE n = {_TTR_WIN}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(CAST(SUM(CAST(ttr AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS avg_ttr,
       MIN(ttr) AS min_ttr,
       MAX(ttr) AS max_ttr
FROM fullw GROUP BY source
""",
    tags=("text", "lexical-diversity", "ttr", "quality"),
)
def text_ttr_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED TYPE-TOKEN RATIO per source — the standard
    length-robust lexical-diversity measure (raw corpus-level TTR
    collapses as corpora grow, which is why MATTR/MSTTR window it):
    each document splits into consecutive {_TTR_WIN}-token windows,
    only FULL windows score (partial tails bias TTR upward), and
    ttr = distinct/{_TTR_WIN} rolls up per source as a decimal-exact
    mean plus min/max. Low-TTR sources = repetitive/templated text —
    the aggregate view of what text_repetition_filter flags per
    document.

    Plan shape at 100 TB: tokenization+window id are map-side; the
    (doc, window) distinct-count aggregate is the one data-sized
    shuffle (keys ~ tokens/{_TTR_WIN}); the source rollup is
    map-side-combinable over O(sources) keys."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    toks = ensure_parallelism(docs).select(
        "doc_id",
        "source",
        F.posexplode(tokens("text")).alias("p0", "tok"),
    )
    agg = (
        toks.select(
            "doc_id", "source", "tok",
            (F.col("p0") / _TTR_WIN).cast("long").alias("w"),
        )
        .groupBy("doc_id", "source", "w")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("tok").alias("u"),
        )
        .filter(F.col("n") == _TTR_WIN)
        .select(
            "source", (F.col("u").cast("double") / _TTR_WIN).alias("ttr")
        )
    )
    return agg.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        (dsum("ttr") / F.count(F.lit(1))).alias("avg_ttr"),
        F.min("ttr").alias("min_ttr"),
        F.max("ttr").alias("max_ttr"),
    )


_BURST_MIN_F = 50  # only words with corpus frequency >= this qualify


@query(
    "text_word_burstiness",
    oracle=f"""
WITH d AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok
        FROM d WHERE t <> ''),
per_doc AS (
  SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY tok, doc_id
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
       FROM documents WHERE {SQL_NORM} <> ''),
stats AS (
  SELECT tok,
         CAST(SUM(c) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(c * c) AS BIGINT) AS sum_sq
  FROM per_doc GROUP BY tok
),
scored AS (
  SELECT tok, total, df,
         CAST(nd.n * sum_sq - total * total AS DOUBLE)
           / (nd.n * total) AS burstiness
  FROM stats, nd WHERE total >= {_BURST_MIN_F}
)
SELECT tok, total, df, burstiness
FROM scored
ORDER BY burstiness DESC, tok LIMIT 20
""",
    tags=("text", "burstiness", "distribution", "quality"),
)
def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WORD BURSTINESS (Church & Gale: content words arrive in bursts
    — high variance-to-mean ratio of per-document counts — while
    function words spread evenly): for each word with corpus
    frequency >= {_BURST_MIN_F}, burstiness = VMR scaled by n =
    (n*sum(c^2) - total^2) / (n*total), where c counts the word per
    document INCLUDING zero-docs (the n in the variance denominator
    is all documents, handled algebraically — zero rows contribute
    nothing to sum_sq/total, so no zero-fill join is ever
    materialized). RATIONAL discipline: numerator and denominator are
    BIGINTs, one final double division, bitwise-hashable (the same
    rationalization as geo_moran_autocorrelation). Top-20 burstiest
    with the word tiebreak. High burstiness = topical content terms;
    a corpus whose STOPWORDS go bursty is template spam.

    Plan shape at 100 TB: (word, doc) counts are one
    map-side-combined shuffle; word stats a second over the distinct
    vocabulary; the 1-row doc count broadcasts; TakeOrdered top-20."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = ensure_parallelism(docs).select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )
    per_doc = toks.groupBy("tok", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    nd = docs.filter(normalized_text("text") != "").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    stats = per_doc.groupBy("tok").agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
    ).filter(F.col("total") >= _BURST_MIN_F)
    scored = stats.crossJoin(F.broadcast(nd)).select(
        "tok",
        "total",
        "df",
        (
            (F.col("n") * F.col("sum_sq") - F.col("total") * F.col("total"))
            .cast("double")
            / (F.col("n") * F.col("total"))
        ).alias("burstiness"),
    )
    return scored.orderBy(F.desc("burstiness"), F.asc("tok")).limit(20)


_CDC_WIN = 8    # rolling-window width (chars) for boundary hashing
_CDC_MOD = 32   # boundary when h % 32 == 0 -> ~32-char mean chunks


@query(
    "text_cdc_chunking",
    oracle=f"""
WITH d AS (SELECT doc_id, source, {SQL_NORM} AS t FROM documents
           WHERE {SQL_NORM} <> ''),
b AS (
  SELECT doc_id, source, t,
         CASE WHEN length(t) >= {_CDC_WIN}
              THEN list_filter(range({_CDC_WIN}, length(t) + 1),
                i -> ('0x' || substr(md5(substr(t, i - {_CDC_WIN} + 1,
                                     {_CDC_WIN})), 1, 4))::BIGINT
                     % {_CDC_MOD} = 0)
              ELSE [] END AS bpos
  FROM d
),
seg AS (
  SELECT doc_id, source,
         list_prepend(1, list_transform(bpos, p -> p + 1)) AS starts,
         list_append(bpos, length(t)) AS ends, t
  FROM b
),
chunks AS (
  SELECT doc_id, source,
         unnest(list_filter(
           list_transform(range(1, len(starts) + 1),
             j -> CASE WHEN ends[j] >= starts[j]
                       THEN substr(t, starts[j],
                                   ends[j] - starts[j] + 1) END),
           c -> c IS NOT NULL AND c <> '')) AS chunk
  FROM seg
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT md5(chunk)) AS BIGINT) AS n_distinct,
       CAST(COUNT(DISTINCT md5(chunk)) AS DOUBLE) / COUNT(*)
         AS unique_ratio,
       CAST(SUM(length(chunk)) AS BIGINT) AS total_chars,
       CAST(SUM(length(chunk)) AS DOUBLE) / COUNT(*) AS mean_chunk_len
FROM chunks GROUP BY source
""",
    tags=("text", "cdc", "chunking", "storage-dedup", "rolling-hash"),
)
def text_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED CHUNKING (the rsync/LBFS/restic primitive
    behind every dedup store): chunk boundaries fall where the
    rolling {_CDC_WIN}-char window's hash ≡ 0 (mod {_CDC_MOD}), so
    an insertion resynchronizes after ~one window instead of shifting
    every fixed-size block — the reason storage dedup survives edits
    that defeat fixed chunking (text_chunking). Per source: chunk
    count, distinct-hash count, unique ratio (the dedup payoff), and
    mean chunk length (~{_CDC_MOD} chars by construction — the
    expected boundary spacing; seeing it drift is how you detect
    adversarial or degenerate content). Whole computation is per-row
    ARRAY expressions (boundary list → start/end zip → substrings) —
    the explode happens only at the final chunk stats.

    Plan shape at 100 TB: boundary detection and chunk slicing are
    map-side codegen; the only shuffles are the distinct-hash and
    source aggregates (map-side-combinable). A real dedup store would
    then anti-join chunk hashes against the chunk index — exactly
    dedup_exact's shape over the chunk table."""
    # round-14: single-split scan fed heavy per-row work
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", normalized_text("text").alias("t")
        )
    ).filter(F.col("t") != "")
    n = F.length("t")
    bpos = F.when(
        n >= _CDC_WIN,
        F.filter(
            F.sequence(F.lit(_CDC_WIN), n),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.substring("t", (i - _CDC_WIN + 1).cast("int"),
                                      _CDC_WIN)),
                    1, 4,
                ), 16, 10,
            ).cast("long") % _CDC_MOD == 0,
        ),
    ).otherwise(F.array().cast("array<long>"))
    seg = docs.select(
        "doc_id", "source", "t",
        F.concat(F.array(F.lit(1).cast("long")),
                 F.transform(bpos, lambda p: p + 1)).alias("starts"),
        F.concat(bpos, F.array(n.cast("long"))).alias("ends"),
    )
    chunks = seg.select(
        "doc_id", "source",
        F.explode(
            F.filter(
                F.zip_with(
                    "starts", "ends",
                    lambda s, e: F.when(
                        e >= s,
                        F.expr("t").substr(
                            s.cast("int"), (e - s + 1).cast("int")
                        ),
                    ),
                ),
                lambda c: c.isNotNull() & (c != ""),
            )
        ).alias("chunk"),
    )
    return chunks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.count_distinct(F.md5("chunk")).cast("long").alias("n_distinct"),
        (F.count_distinct(F.md5("chunk")).cast("double")
         / F.count(F.lit(1))).alias("unique_ratio"),
        F.sum(F.length("chunk")).cast("long").alias("total_chars"),
        (F.sum(F.length("chunk")).cast("double") / F.count(F.lit(1)))
        .alias("mean_chunk_len"),
    )


# --------------------------------------------------------------------------
# Round 10: top-p vocabulary coverage (tokenizer budget design)
# --------------------------------------------------------------------------

_TOPP_PS = (50, 90, 95, 99)


@query(
    "text_vocab_topp_coverage",
    oracle=f"""
WITH d AS (SELECT {{norm}} AS t FROM documents),
tok AS (SELECT unnest(string_split(t, ' ')) AS tok FROM d WHERE t <> ''),
freq AS (SELECT tok, COUNT(*) AS f FROM tok GROUP BY tok),
bands AS (SELECT f, COUNT(*) AS cnt FROM freq GROUP BY f),
cum AS (
  SELECT f, cnt,
         SUM(f * cnt) OVER (ORDER BY f DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_mass,
         SUM(cnt) OVER (ORDER BY f DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks
  FROM bands
),
tot AS (SELECT MAX(cum_mass) AS tm, MAX(cum_toks) AS tv FROM cum),
ps AS (SELECT unnest([{", ".join(str(p) for p in _TOPP_PS)}]) AS pnum),
tgt AS (
  SELECT pnum, tm, tv, (pnum * tm + 99) // 100 AS target
  FROM ps CROSS JOIN tot
),
hit AS (
  SELECT t.pnum, t.tm, t.tv, t.target, c.f, c.cnt, c.cum_mass, c.cum_toks,
         ROW_NUMBER() OVER (PARTITION BY t.pnum ORDER BY c.cum_mass) AS rn
  FROM tgt t JOIN cum c ON c.cum_mass >= t.target
)
SELECT CAST(pnum AS DOUBLE) / 100.0 AS p,
       CAST((cum_toks - cnt)
            + (target - (cum_mass - f * cnt) + f - 1) // f AS BIGINT)
         AS vocab_size,
       CAST((cum_mass - f * cnt)
            + ((target - (cum_mass - f * cnt) + f - 1) // f) * f AS BIGINT)
         AS covered_mass,
       CAST(tm AS BIGINT) AS total_mass,
       CAST(tv AS BIGINT) AS total_vocab,
       CAST((cum_mass - f * cnt)
            + ((target - (cum_mass - f * cnt) + f - 1) // f) * f AS DOUBLE)
         / CAST(tm AS DOUBLE) AS coverage
FROM hit WHERE rn = 1
""".replace("{norm}", SQL_NORM),
    tags=("text", "vocabulary", "coverage", "tokenizer", "zipf"),
)
def text_vocab_topp_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-P VOCABULARY COVERAGE — the tokenizer-budget table: for each
    target coverage p, the smallest frequency-ranked vocabulary whose
    cumulative token mass reaches ceil(p · total) — the classic
    Zipf-cut a BPE/vocab-size decision consults (how many types cover
    95% of the corpus?).

    Scale design: NO vocabulary-sized ranking window. Tokens reduce to
    a (frequency → type-count) BAND table (one map-side-combined
    groupBy over types; distinct frequencies number in the hundreds —
    bounded by max frequency's divisor structure, not vocabulary), the
    cumulative sums run over THAT table, and the cut INSIDE the
    crossing band is computed analytically: every type in a band
    contributes exactly f, so vocab_size = types_before +
    ceil((target − mass_before)/f). A naive rank-window over the full
    type table — what a direct translation would do — sorts the whole
    vocabulary on one partition at 100 TB; this computes the same
    numbers from an O(distinct-f) table. All integer arithmetic
    (ceil-division via `div`), one final double division.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    bands = freq.groupBy("f").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("f")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bands.select(
        "f",
        "cnt",
        F.sum(F.col("f") * F.col("cnt")).over(w).alias("cum_mass"),
        F.sum("cnt").over(w).alias("cum_toks"),
    )
    tot = cum.agg(
        F.max("cum_mass").alias("tm"), F.max("cum_toks").alias("tv")
    )
    ps = spark.createDataFrame([(p,) for p in _TOPP_PS], "pnum long")
    tgt = ps.crossJoin(F.broadcast(tot)).select(
        "pnum", "tm", "tv", F.expr("(pnum * tm + 99) div 100").alias("target")
    )
    hit = (
        tgt.join(F.broadcast(cum), F.col("cum_mass") >= F.col("target"))
        .groupBy("pnum")
        .agg(
            F.min(
                F.struct("cum_mass", "f", "cnt", "cum_toks", "target",
                         "tm", "tv")
            ).alias("s")
        )
        .select("pnum", "s.*")
    )
    k = F.expr("(target - (cum_mass - f * cnt) + f - 1) div f")
    return hit.select(
        (F.col("pnum").cast("double") / F.lit(100.0)).alias("p"),
        (F.col("cum_toks") - F.col("cnt") + k).cast("long")
        .alias("vocab_size"),
        (F.col("cum_mass") - F.col("f") * F.col("cnt") + k * F.col("f"))
        .cast("long")
        .alias("covered_mass"),
        F.col("tm").cast("long").alias("total_mass"),
        F.col("tv").cast("long").alias("total_vocab"),
        (
            (F.col("cum_mass") - F.col("f") * F.col("cnt") + k * F.col("f"))
            .cast("double")
            / F.col("tm").cast("double")
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Round 11: URL canonicalization dedup (crawl-pipeline staple)
# ---------------------------------------------------------------------------

# The closed-form canonical URL the oracle expects — see
# text_url_canonical_dedup's docstring for the messy-URL derivation.
SQL_CANONICAL_URL = (
    "'https://site' || (doc_id % 7) || '.example.com/art/'"
    " || (doc_id % 40) || '?id=' || (doc_id % 20)"
)


def synth_messy_urls(docs: "DataFrame") -> "DataFrame":
    """(doc_id, url): deterministically MESSY urls — case noise
    (doc_id%2), www. (%3), :443 (%5), trailing slash (%4), utm params
    (%6), fragment (%8) — over the clean canonical skeleton."""
    return docs.select(
        "doc_id",
        F.expr(
            """
            CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END
            || CASE WHEN doc_id % 3 = 0 THEN 'WWW.Site' ELSE 'site' END
            || CAST(doc_id % 7 AS STRING) || '.Example.COM'
            || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
            || '/art/' || CAST(doc_id % 40 AS STRING)
            || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
            || '?utm_source=feed&id=' || CAST(doc_id % 20 AS STRING)
            || CASE WHEN doc_id % 6 = 0 THEN '&utm_campaign=x' ELSE '' END
            || CASE WHEN doc_id % 8 = 0 THEN '#sec2' ELSE '' END
            """
        ).alias("url"),
    )


def canonicalize_urls(raw: "DataFrame") -> "DataFrame":
    """(doc_id, url, canonical_url): REAL canonicalization in pure
    Catalyst string expressions — fragment strip, scheme+host
    lowercase, www. strip, default-port strip, trailing-slash strip,
    query-param filter (utm_*) + sort + rejoin. Zero UDFs; shared by
    text_url_canonical_dedup and the two-stage dedup funnel."""
    parts = raw.select(
        "doc_id",
        "url",
        F.expr("split_part(url, '#', 1)").alias("nofrag"),
    ).select(
        "doc_id",
        "url",
        F.expr("lower(split_part(nofrag, '://', 1))").alias("scheme"),
        F.expr("split_part(nofrag, '://', 2)").alias("rest"),
    ).select(
        "doc_id",
        "url",
        "scheme",
        F.expr("split_part(rest, '/', 1)").alias("hostport"),
        # everything from the first '/' on (starts with '/')
        F.expr("substr(rest, length(split_part(rest, '/', 1)) + 1)").alias(
            "path_q"
        ),
    ).select(
        "doc_id",
        "url",
        "scheme",
        F.expr(
            "regexp_replace(regexp_replace(lower(hostport),"
            " ':(443|80)$', ''), '^www\\\\.', '')"
        ).alias("host"),
        F.expr(
            "regexp_replace(split_part(path_q, '?', 1), '/$', '')"
        ).alias("path"),
        F.expr(
            "array_sort(filter(split(split_part(path_q, '?', 2), '&'),"
            " p -> p != '' AND p NOT LIKE 'utm_%'))"
        ).alias("params"),
    )
    return parts.select(
        "doc_id",
        "url",
        F.expr(
            "scheme || '://' || host || path ||"
            " CASE WHEN size(params) = 0 THEN ''"
            "      ELSE '?' || array_join(params, '&') END"
        ).alias("canonical_url"),
    )


@query(
    "text_url_canonical_dedup",
    oracle="""
WITH d AS (
  SELECT doc_id,
         'https://site' || (doc_id % 7) || '.example.com/art/'
           || (doc_id % 40) || '?id=' || (doc_id % 20) AS canonical,
         CAST(doc_id % 3 = 0 AS INT) || CAST(doc_id % 5 = 0 AS INT)
           || CAST(doc_id % 6 = 0 AS INT) || CAST(doc_id % 8 = 0 AS INT)
           || CAST(doc_id % 4 = 0 AS INT) || CAST(doc_id % 2 = 0 AS INT)
           AS variant
  FROM documents
)
SELECT canonical AS canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT variant) AS BIGINT) AS n_raw_variants,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
FROM d GROUP BY canonical
""",
    tags=("text", "url", "canonicalization", "dedup", "crawl"),
)
def text_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL CANONICALIZATION dedup — the crawl-pipeline step BEFORE any
    content dedup (the same page arrives under casing variants,
    www-prefixes, default ports, trailing slashes, tracking params and
    fragments; CommonCrawl-scale corpora dedupe on the canonical URL
    first because it is O(1) per row vs MinHash's O(shingles)). Each
    doc gets a deterministically MESSY url (case noise from doc_id%2
    via %8, www. by %3, :443 by %5, trailing slash by %4 via %8,
    utm params by %6, fragment by %8), and the engine canonicalizes
    with REAL string surgery — fragment strip, scheme+host lowercase,
    www. strip, default-port strip, trailing-slash strip, query-param
    filter (utm_*) + sort + rejoin — entirely in Catalyst expressions
    (split_part / regexp_replace / filter / array_sort / array_join:
    zero UDFs, whole-stage codegen). The oracle never parses: it
    recomputes the expected canonical form and the raw-variant
    cardinality in closed form from the residues, so a parsing bug on
    ANY step breaks the hash.

    Scale: one projection + one combinable groupBy on the canonical
    key — the cheapest dedup pass that exists, which is why it runs
    first at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    canon = canonicalize_urls(synth_messy_urls(docs))
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("url").cast("long").alias("n_raw_variants"),
        F.min("doc_id").cast("long").alias("canonical_doc"),
    )


@query(
    "text_word_aware_chunking",
    oracle="""
WITH d AS (SELECT doc_id, text FROM documents
           WHERE doc_id % 23 = 0 AND length(text) > 0),
st AS (
  SELECT doc_id, text,
         unnest(range(1, greatest(length(text), 1) + 1, 150)) AS s
  FROM d
),
raw AS (
  SELECT doc_id, (s - 1) // 150 AS chunk_idx,
         substr(text, CAST(s AS BIGINT), 200) AS raw
  FROM st
)
SELECT doc_id AS document_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CASE WHEN length(raw) = 200
            THEN regexp_replace(raw, ' [^ ]*$', '')
            ELSE raw END AS chunk_text,
       CAST(length(CASE WHEN length(raw) = 200
                        THEN regexp_replace(raw, ' [^ ]*$', '')
                        ELSE raw END) AS BIGINT) AS n_chars
FROM raw
""",
    tags=("text", "chunking", "word-aware"),
)
def text_word_aware_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WORD-AWARE chunking — fixed character windows cut words in half
    at every boundary, which hurts both dedup shingles and embedding
    quality; the standard fix keeps the fixed STARTS (so chunks stay
    independently computable — no greedy chain, no sequential
    dependency) and snaps each full window's END back to the last
    space, dropping the trailing word fragment. With overlap (50) ≥
    the max word length nothing is lost: the fragment reappears whole
    at the next window's start. Final (short) windows keep their tail
    verbatim. Pure Catalyst: sequence + posexplode + substring +
    one regexp; the oracle mirrors the identical expressions.

    Scale: identical plan to text_chunking — one generator explode,
    no shuffle, no UDF; word snapping is one more codegen'd regexp
    per chunk."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 23 == 0) & (F.length("text") > 0)
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(150)
    )
    raw = docs.select(
        F.col("doc_id").alias("document_id"),
        F.posexplode(starts).alias("chunk_idx", "s"),
        F.col("text").alias("__t"),
    ).select(
        "document_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.expr("substring(__t, s, 200)").alias("raw"),
    )
    trimmed = F.when(
        F.length("raw") == 200,
        F.regexp_replace(F.col("raw"), " [^ ]*$", ""),
    ).otherwise(F.col("raw"))
    return raw.select(
        "document_id",
        "chunk_idx",
        trimmed.alias("chunk_text"),
        F.length(trimmed).cast("long").alias("n_chars"),
    )


@query(
    "text_html_strip_stats",
    oracle=r"""
WITH h AS (
  SELECT doc_id, source,
         '<html><body><h1>' || source || '</h1><p>' || text ||
         '</p><script>track();</script></body></html>' AS html
  FROM documents
),
s AS (
  SELECT doc_id, source, html,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(html, '<script>[\s\S]*?</script>', ' ', 'g'),
             '<[^>]*>', ' ', 'g'),
           '[ \t\n\x0B\f\r]+', ' ', 'g')) AS content
  FROM h
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(html)) AS BIGINT) AS html_chars,
       CAST(SUM(length(content)) AS BIGINT) AS content_chars,
       CAST(SUM(length(html) - length(replace(html, '<', ''))) AS BIGINT)
         AS n_tags,
       CAST(SUM(length(content)) AS DOUBLE) / SUM(length(html))
         AS content_ratio
FROM s GROUP BY source
""",
    tags=("text", "html-strip", "boilerplate", "ingest", "curation"),
)
def text_html_strip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML BOILERPLATE STRIPPING — the first transformation every
    web-crawl ingest runs (WET-file extraction, trafilatura's cheap
    tier): drop <script> blocks wholesale, replace every remaining tag
    with whitespace, squeeze runs. The fixture corpus is plain text,
    so each document is first wrapped in a deterministic HTML template
    — making the strip LOSSLESS-verifiable: the oracle re-derives the
    exact content length, tag count, and content-to-markup ratio per
    source. Non-greedy [\\s\\S]*? spans newlines in both regex engines
    (Java and RE2); tag removal is '<[^>]*>' — the same conservative
    patterns a production boilerplate pass starts from.

    Plan shape at 100 TB: three regexp_replace calls fused into ONE
    whole-stage-codegen projection over the scan — zero shuffles
    before the final per-source aggregate (map-side combined, O(sources)
    groups). Regex work is embarrassingly parallel and JVM-side; no
    Python touches the hot path (contrast: a BeautifulSoup-per-row UDF
    pays 10-100x for the same cheap tier)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    html = F.concat(
        F.lit("<html><body><h1>"), F.col("source"), F.lit("</h1><p>"),
        F.col("text"), F.lit("</p><script>track();</script></body></html>"),
    )
    # Whitespace squeeze uses an EXPLICIT class, not \s: Java's \s
    # includes \x0B (vertical tab) while RE2's does not — the one
    # character where the engines' shorthands disagree. ([\s\S] above
    # is safe: each engine's own union is still "every character".)
    content = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(html, r"<script>[\s\S]*?</script>", " "),
                r"<[^>]*>", " "),
            r"[ \t\n\x0B\f\r]+", " ")
    )
    s = docs.select("source", html.alias("html"), content.alias("content"))
    return s.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("html")).cast("long").alias("html_chars"),
        F.sum(F.length("content")).cast("long").alias("content_chars"),
        F.sum(
            F.length("html") - F.length(F.regexp_replace("html", "<", ""))
        ).cast("long").alias("n_tags"),
        (
            F.sum(F.length("content")).cast("double")
            / F.sum(F.length("html"))
        ).alias("content_ratio"),
    )


@query(
    "text_dictionary_phrase_match",
    oracle=f"""
WITH d AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
toks AS (
  SELECT doc_id,
         unnest(string_split(t, ' ')) AS w,
         generate_subscripts(string_split(t, ' '), 1) AS pos
  FROM d WHERE t <> ''
),
bg AS (
  SELECT unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM (SELECT string_split(t, ' ') AS w FROM d WHERE t <> '')
  WHERE len(w) >= 2
),
dict AS (
  SELECT bigram AS phrase,
         string_split(bigram, ' ')[1] AS w1,
         string_split(bigram, ' ')[2] AS w2
  FROM (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 10)
),
m AS (
  SELECT dict.phrase, t1.doc_id
  FROM toks t1
  JOIN dict ON t1.w = dict.w1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
              AND t2.w = dict.w2
)
SELECT phrase,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM m GROUP BY phrase
""",
    tags=("text", "dictionary-match", "multi-pattern", "blocklist",
          "curation"),
)
def text_dictionary_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PATTERN DICTIONARY MATCHING — the blocklist / PII-term /
    brand-safety scan every curation pipeline runs: N phrases matched
    against the whole corpus in ONE pass (the relational stand-in for
    Aho-Corasick: broadcast the dictionary, anchor on each phrase's
    FIRST token, verify the remaining tokens positionally). The
    dictionary here is self-derived (the corpus's top-10 bigrams, the
    text_top_bigrams shape) so the fixture is guaranteed to exercise
    hits; a production run swaps in its term table unchanged. Per
    phrase: matched-document count and total occurrences —
    text_positional_phrase_search is the single-phrase special case;
    the dictionary join is what makes it N-phrases-one-scan.

    Plan shape at 100 TB: the anchor join t1 ⨝ broadcast(dict) FILTERS
    the positional token table down to first-token hits BEFORE the
    (doc, pos)-keyed positional self-join — the join input shrinks by
    the dictionary's selectivity, so cost tracks matches, not corpus ×
    patterns. Longer phrases add one positional join per extra token
    (same shape, same key); the token table is built once and shuffled
    once."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    w = tokens("text")
    toks = docs.select(
        "doc_id", F.posexplode(w).alias("pos", "w")
    ).persist()
    # bind_once: tokens() re-runs per bigram when referenced inside
    # the lambda (round-14; see functions/text.py:bind_once)
    bigrams = bind_once(
        w,
        lambda tk: F.transform(
            F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
            lambda x, i: F.concat_ws(" ", x, F.element_at(tk, i + 2)),
        ),
    )
    dic = (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(10)
        .select(
            F.col("bigram").alias("phrase"),
            F.split("bigram", " ").getItem(0).alias("w1"),
            F.split("bigram", " ").getItem(1).alias("w2"),
        )
    )
    t1 = toks.join(F.broadcast(dic), F.col("w") == F.col("w1")).select(
        "doc_id", "pos", "phrase", "w2"
    )
    t2 = toks.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
        F.col("w").alias("wb"),
    )
    m = t1.join(
        t2,
        (F.col("d2") == F.col("doc_id"))
        & (F.col("p2") == F.col("pos") + 1)
        & (F.col("wb") == F.col("w2")),
    )
    return m.groupBy("phrase").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )
