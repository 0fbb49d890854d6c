"""Oracle-checked training-data curation queries: benchmark
decontamination, Gopher-style repetition filtering, deterministic
stratified sampling, sequence packing, corpus mix weighting, and
unigram entropy — over the driver's ``documents`` table.

These extend the dedup/similarity family (``plans/llm_queries.py``)
with the corpus-shaping steps that follow dedup in a pretraining
pipeline. All hashes are md5-derived and all thresholds are integer
comparisons so DuckDB reproduces every row bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.operators import curation as CU
from tiki_data_pipeline_spark.plans.llm_queries import _SHINGLES_SQL, _shingles_cached
from tiki_data_pipeline_spark.plans.registry import query

_H56 = "try_cast(('0x' || substring(md5({key}), 1, 14)) AS BIGINT)"
_H56_MAX = 72057594037927936  # 2^56
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"

# Stratum rates for the sampling/mixing queries: downsample the
# dominant language, equal 20% token-share targets across the five.
_SAMPLE_TENTHS = {"en": 3, "de": 8, "es": 8, "fr": 8, "zh": 8}
_TARGET_PPM = {"en": 200000, "de": 200000, "es": 200000, "fr": 200000, "zh": 200000}

_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_SAMPLE_TENTHS.items()))
    + " ELSE 10 END"
)
_TARGET_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_TARGET_PPM.items()))
    + " ELSE 0 END"
)


@query(
    "doc_decontamination",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
    corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 20 <> 0),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS n_contaminated
      FROM corpus c JOIN bench b ON c.shingle = b.shingle
      GROUP BY 1
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY 1)
    SELECT t.doc_id,
           CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CAST(CASE WHEN COALESCE(h.n_contaminated, 0) * 100 >= t.n_grams * 5
                     THEN 1 ELSE 0 END AS INTEGER) AS is_contaminated
    FROM totals t LEFT JOIN hits h ON h.doc_id = t.doc_id
    """,
)
def doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with id % 20 == 0 act as the
    held-out eval set; every other document reports how many of its
    3-gram shingles collide with the benchmark gram set (broadcast
    join — eval suites are tiny next to a 100 TB corpus)."""
    sh = _shingles_cached(spark, sf_dir)
    return CU.contamination_stats(sh, F.col("doc_id") % 20 == 0)


@query(
    "doc_repetition_filter",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
      WHERE LEN({_TOKS}) >= 2
    ),
    g AS (
      SELECT doc_id, toks,
             list_transform(range(1, LEN(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS grams
      FROM base
    ),
    stats AS (
      SELECT doc_id,
        CAST(LEN(toks) AS BIGINT) AS n_tokens,
        CAST(LEN(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
        CAST(LEN(grams) AS BIGINT) AS n_bigrams,
        CAST(list_max(list_transform(list_distinct(grams),
               gr -> LEN(list_filter(grams, x -> x = gr)))) AS BIGINT)
          AS top_bigram_count
      FROM g
    )
    SELECT doc_id, n_tokens, n_distinct_tokens, n_bigrams, top_bigram_count,
           CAST(CASE WHEN (n_tokens - n_distinct_tokens) * 2 >= n_tokens
                       OR (top_bigram_count >= 2
                           AND top_bigram_count * 5 >= n_bigrams)
                     THEN 1 ELSE 0 END AS INTEGER) AS flag_repetitive
    FROM stats
    """,
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: duplicate-token fraction and
    top-bigram fraction per document, as narrow array expressions."""
    return CU.repetition_stats(load_table(spark, sf_dir, "documents"))


@query(
    "doc_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_H56.format(key="'strat:' || CAST(doc_id AS VARCHAR)")} * 10
          < ({_RATE_CASE}) * {_H56_MAX}
    """,
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: md5-Bernoulli keep at 30% for
    the dominant language, 80% elsewhere — a map-side filter."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.stratified_sample(docs, _SAMPLE_TENTHS).select(
        "doc_id", "lang", "source"
    )


@query(
    "doc_sequence_packing",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             {_H56.format(key="'pack:' || CAST(doc_id AS VARCHAR)")} AS h,
             CAST(LEN({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    sharded AS (
      SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard, h, n_tokens FROM base
    ),
    packed AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM sharded
    )
    SELECT doc_id, shard, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS tok_offset,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id
    FROM packed
    """,
)
def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into 2048-token sequences over 8
    hash-sharded token streams (shard-parallel running sums)."""
    return CU.pack_sequences(load_table(spark, sf_dir, "documents"))


@query(
    "corpus_mix_weights",
    oracle=f"""
    WITH per AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(LEN({_TOKS})) AS BIGINT) AS stratum_tokens
      FROM documents GROUP BY lang
    )
    SELECT lang, n_docs, stratum_tokens,
           CAST((SUM(stratum_tokens) OVER ()) * ({_TARGET_CASE})
                // stratum_tokens AS BIGINT) AS weight_ppm
    FROM per
    """,
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix rebalancing weights: integer ppm sampling weight
    per stratum toward equal 20% token shares."""
    return CU.mix_weights(load_table(spark, sf_dir, "documents"), _TARGET_PPM)


@query(
    "doc_word_entropy",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
      WHERE LEN({_TOKS}) >= 1
    )
    SELECT doc_id,
      CAST(LEN(toks) AS INTEGER) AS n_tokens,
      ROUND(
        log2(CAST(LEN(toks) AS DOUBLE))
        - list_reduce(
            list_prepend(CAST(0 AS DOUBLE),
              list_transform(list_sort(list_distinct(toks)),
                gr -> CAST(LEN(list_filter(toks, x -> x = gr)) AS DOUBLE))),
            (a, b) -> a + b * log2(b)
          ) / LEN(toks),
        4) AS entropy_bits
    FROM base
    """,
)
def doc_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram entropy per document (CCNet-style degenerate-text
    signal), folded over the SORTED distinct-token list so both
    engines sum the identical float sequence."""
    return CU.word_entropy(load_table(spark, sf_dir, "documents"))


@query(
    "doc_sample_fixed_per_stratum",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_H56.format(key="'strat:' || CAST(doc_id AS VARCHAR)")},
                        doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source FROM ranked WHERE rn <= 50
    """,
)
def doc_sample_fixed_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reservoir-equivalent fixed-N sample: exactly min(N, stratum
    size) docs per language, deterministically — rank by md5 hash
    within each stratum and keep the first 50. Catalyst rewrites the
    rank filter to WindowGroupLimit (verified in the physical plan):
    every map task pre-prunes to its local top-50 per stratum, so the
    stratum shuffle carries ≤ 50·tasks rows at any corpus size."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = CU.md5_h56(F.col("doc_id"), "strat")
    rn = F.row_number().over(W.partitionBy("lang").orderBy(h, "doc_id"))
    return (
        docs.select("doc_id", "lang", "source", rn.alias("rn"))
        .filter(F.col("rn") <= 50)
        .drop("rn")
    )


@query(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    fp AS (
      SELECT doc_id,
             doc_id = MIN(doc_id) OVER (
               PARTITION BY md5(trim(REGEXP_REPLACE(lower(text), '\\s+', ' ', 'g')))
             ) AS exact_survivor
      FROM documents WHERE doc_id % 20 <> 0
    ),
    toks2 AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
      WHERE doc_id % 20 <> 0 AND LEN({_TOKS}) >= 2
    ),
    g AS (
      SELECT doc_id, toks,
             list_transform(range(1, LEN(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS grams
      FROM toks2
    ),
    rep AS (
      SELECT doc_id,
        CAST(LEN(toks) AS BIGINT) AS n_tokens,
        CAST(LEN(list_distinct(toks)) AS BIGINT) AS n_distinct,
        CAST(LEN(grams) AS BIGINT) AS n_bigrams,
        CAST(list_max(list_transform(list_distinct(grams),
               gr -> LEN(list_filter(grams, x -> x = gr)))) AS BIGINT) AS top
      FROM g
    ),
    repflag AS (
      SELECT doc_id,
             CASE WHEN (n_tokens - n_distinct) * 2 >= n_tokens
                    OR (top >= 2 AND top * 5 >= n_bigrams)
                  THEN 1 ELSE 0 END AS flag_repetitive
      FROM rep
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
    corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 20 <> 0),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS n_contaminated
      FROM corpus c JOIN bench b ON c.shingle = b.shingle GROUP BY 1
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY 1),
    cont AS (
      SELECT t.doc_id,
             CASE WHEN COALESCE(h.n_contaminated, 0) * 100 >= t.n_grams * 5
                  THEN 1 ELSE 0 END AS is_contaminated
      FROM totals t LEFT JOIN hits h ON h.doc_id = t.doc_id
    )
    SELECT f.doc_id,
           CASE WHEN NOT f.exact_survivor THEN 'exact'
                WHEN COALESCE(r.flag_repetitive, 0) = 1 THEN 'repetitive'
                WHEN COALESCE(c.is_contaminated, 0) = 1 THEN 'contaminated'
           END AS dropped_by,
           f.exact_survivor
             AND COALESCE(r.flag_repetitive, 0) = 0
             AND COALESCE(c.is_contaminated, 0) = 0 AS survivor
    FROM fp f
    LEFT JOIN repflag r ON r.doc_id = f.doc_id
    LEFT JOIN cont c ON c.doc_id = f.doc_id
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pass over the corpus (benchmark docs
    id % 20 == 0 held out): exact dedup -> repetition filter ->
    benchmark decontamination, each doc tagged with the first stage
    that dropped it. The staged order mirrors corpus_dedup_staged:
    the cheapest filter (one hash groupBy) runs first so downstream
    joins see only survivors' mass at 100 TB."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 != 0)
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    ranked = docs.select("doc_id", "text").withColumn(
        "exact_survivor",
        F.col("doc_id") == F.min("doc_id").over(W.partitionBy(fp)),
    )
    rep = CU.repetition_stats(docs).select("doc_id", "flag_repetitive")
    cont = CU.contamination_stats(
        _shingles_cached(spark, sf_dir), F.col("doc_id") % 20 == 0
    ).select("doc_id", "is_contaminated")
    repf = F.coalesce(F.col("flag_repetitive"), F.lit(0))
    contf = F.coalesce(F.col("is_contaminated"), F.lit(0))
    return (
        ranked.join(rep, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .select(
            "doc_id",
            F.when(~F.col("exact_survivor"), "exact")
            .when(repf == 1, "repetitive")
            .when(contf == 1, "contaminated")
            .alias("dropped_by"),
            (F.col("exact_survivor") & (repf == 0) & (contf == 0)).alias(
                "survivor"
            ),
        )
    )


def _pii_oracle() -> str:
    from tiki_data_pipeline_spark import fixtures as FX
    from tiki_data_pipeline_spark.operators.curation import PII_PATTERNS

    redacted = "text"
    for _, pat, token in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{token}', 'g')"
    # counts audit the tokens actually inserted (mirrors redact_pii:
    # counted on the redacted text, not the raw text)
    count_cols = ",\n      ".join(
        f"CAST(len(regexp_extract_all({redacted}, '{token}')) AS INTEGER)"
        f" AS n_{name}"
        for name, _, token in PII_PATTERNS
    )
    return f"""
    WITH {FX.pii_docs_cte()},
    unioned AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id, text FROM pii_docs
    )
    SELECT doc_id,
      {count_cols},
      md5({redacted}) AS redacted_md5
    FROM unioned
    """


@query("doc_pii_redaction", oracle=_pii_oracle())
def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus plus a PII-bearing fixture set: URLs,
    emails, phone-shaped number runs → typed tokens, with per-doc raw
    match counts and an md5 of the redacted text. Pure JVM regex
    column work — narrow map at any scale; the patterns are shared
    with the oracle from ``curation.PII_PATTERNS``."""
    from tiki_data_pipeline_spark import fixtures as FX

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    unioned = docs.unionByName(FX.pii_docs_df(spark))
    return CU.redact_pii(unioned)


@query(
    "corpus_composition_report",
    oracle=r"""
    WITH per AS (
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(LEN(string_split_regex(lower(trim(text)), '\s+')) ) AS BIGINT)
               AS total_tokens
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n_docs) AS all_docs, SUM(total_tokens) AS all_tokens FROM per)
    SELECT lang, source, n_docs, total_tokens,
           CAST((n_docs * 1000000) // all_docs AS BIGINT) AS doc_ppm,
           CAST((total_tokens * 1000000) // all_tokens AS BIGINT) AS token_ppm
    FROM per, tot
    """,
)
def corpus_composition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus governance report: per (lang, source) document and token
    counts with exact integer-ppm shares — the "what is in my corpus"
    artifact behind mix-weight decisions. One map-side-combinable
    shuffle; the grand totals are a window over the handful of strata
    rows. The ppm division runs in DECIMAL `div` (exact; DuckDB's
    HUGEINT integer division is exact too)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("bigint")
    per = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
    )
    from pyspark.sql import Window as W

    all_docs = F.sum(F.col("n_docs").cast("decimal(20,0)")).over(W.partitionBy())
    all_tokens = F.sum(F.col("total_tokens").cast("decimal(20,0)")).over(
        W.partitionBy()
    )
    return (
        per.withColumn("_nd", F.col("n_docs").cast("decimal(20,0)") * 1000000)
        .withColumn("_nt", F.col("total_tokens").cast("decimal(20,0)") * 1000000)
        .withColumn("_ad", all_docs)
        .withColumn("_at", all_tokens)
        .selectExpr(
            "lang",
            "source",
            "n_docs",
            "total_tokens",
            "CAST(_nd div _ad AS BIGINT) AS doc_ppm",
            "CAST(_nt div _at AS BIGINT) AS token_ppm",
        )
    )


# ------------------------------------------------------------- DSIR
# Hashed-n-gram importance weights toward the English slice of the
# corpus (Xie et al. 2023); 256 buckets for the fixture corpus. The
# whole computation is md5-hashing, joins, logs and rounded sums, so
# the oracle restates it exactly.
_DSIR_K = 256
_DSIR_GRAMS = f"""
  SELECT doc_id, UNNEST(list_concat(t, bi)) AS g FROM (
    SELECT doc_id, t,
           CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)),
                                    i -> t[i] || '_' || t[i + 1])
                ELSE CAST([] AS VARCHAR[]) END AS bi
    FROM (SELECT doc_id, {_TOKS} AS t FROM documents
          WHERE text IS NOT NULL {{extra}}) )
"""
_DSIR_SQL = f"""
    WITH raw_g AS ({_DSIR_GRAMS.format(extra="")}),
    tgt_g AS ({_DSIR_GRAMS.format(extra="AND lang = 'en'")}),
    raw_b AS (
      SELECT doc_id,
             {_H56.format(key="'dsir:' || g")} % {_DSIR_K} AS bucket,
             COUNT(*) AS cnt
      FROM raw_g GROUP BY 1, 2),
    tgt_b AS (
      SELECT {_H56.format(key="'dsir:' || g")} % {_DSIR_K} AS bucket,
             COUNT(*) AS cnt
      FROM tgt_g GROUP BY 1),
    dist AS (
      SELECT COALESCE(r.bucket, t.bucket) AS bucket,
             COALESCE(r.c_raw, 0) AS c_raw, COALESCE(t.cnt, 0) AS c_tgt
      FROM (SELECT bucket, SUM(cnt) AS c_raw FROM raw_b GROUP BY 1) r
      FULL JOIN tgt_b t ON r.bucket = t.bucket),
    lw AS (
      SELECT bucket,
             ROUND(ln((c_tgt + 1.0) /
                      ((SELECT SUM(cnt) FROM tgt_b) + {_DSIR_K}))
                 - ln((c_raw + 1.0) /
                      ((SELECT SUM(cnt) FROM raw_b) + {_DSIR_K})), 9) AS lw
      FROM dist),
    per_doc AS (
      SELECT r.doc_id, ROUND(SUM(r.cnt * l.lw), 4) AS log_weight
      FROM raw_b r JOIN lw l USING (bucket) GROUP BY 1)
    SELECT d.doc_id, p.log_weight
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


_DSIR_WEIGHTS_CACHE: dict = {}


def _dsir_weights_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus's DSIR weight table, featurized ONCE per session
    (r8 verdict ask #2: the md5-per-gram pass is the dominant DSIR
    cost and must not run once per consumer — both registry DSIR
    queries serve from this checkpoint, and bench charges the
    featurization to the builds map)."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    df = _DSIR_WEIGHTS_CACHE.get(key)
    if df is None:
        docs = load_table(spark, sf_dir, "documents")
        df = CU.dsir_log_weights(
            docs, docs.filter(F.col("lang") == "en"), n_buckets=_DSIR_K
        ).localCheckpoint()
        for k in list(_DSIR_WEIGHTS_CACHE):  # old sessions are dead
            if k[0] != app_id:
                del _DSIR_WEIGHTS_CACHE[k]
        _DSIR_WEIGHTS_CACHE[key] = df
    return df


from tiki_data_pipeline_spark.plans.llm_queries import (  # noqa: E402
    SESSION_BUILDS,
)

SESSION_BUILDS["dsir_weights"] = _dsir_weights_cached


@query("doc_dsir_weights", oracle=_DSIR_SQL)
def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log importance weight of every document toward the
    English-slice target distribution (hashed uni+bigram features,
    256 buckets, Laplace smoothing)."""
    return _dsir_weights_cached(spark, sf_dir)


@query(
    "doc_dsir_sample",
    oracle=f"""
    WITH w AS ({_DSIR_SQL}),
    keyed AS (
      SELECT doc_id, log_weight,
             ROUND(log_weight
                   - ln(-ln(({_H56.format(key="'dsir_g:' || CAST(doc_id AS VARCHAR)")}
                             + 0.5) / {_H56_MAX}.0)), 4) AS sample_key
      FROM w WHERE log_weight IS NOT NULL)
    SELECT doc_id, log_weight, sample_key FROM keyed
    ORDER BY sample_key DESC, doc_id ASC LIMIT 20
    """,
)
def doc_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-20 DSIR selection (deterministic md5-derived Gumbel
    noise): the 20 documents importance-resampled toward the English
    target distribution. Serves from the session's precomputed
    weight table — selection reads zero document text."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.dsir_sample(
        docs,
        docs.filter(F.col("lang") == "en"),
        n=20,
        n_buckets=_DSIR_K,
        weights=_dsir_weights_cached(spark, sf_dir),
    )


_H56_SQL = (
    "try_cast(('0x' || substring(md5('{salt}:' || CAST({col} AS VARCHAR)),"
    " 1, 14)) AS BIGINT)"
)


@query(
    "doc_source_frequency_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_H56_SQL.format(salt='srccap', col='doc_id')}, doc_id
             ) AS INTEGER) AS src_rank
      FROM documents
    )
    SELECT doc_id, source, src_rank,
           CAST(CASE WHEN src_rank <= 10 THEN 1 ELSE 0 END AS INTEGER) AS kept
    FROM ranked
    """,
)
def doc_source_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style per-source frequency cap: at most 10 docs per
    source survive a deterministic md5 lottery; every row is emitted
    with its lottery rank and 0/1 kept flag (audit before drop)."""
    return CU.source_frequency_cap(
        load_table(spark, sf_dir, "documents"), cap=10
    )


@query(
    "doc_shard_assignment",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_H56_SQL.format(salt='shard', col='doc_id')} AS _h
      FROM documents
    )
    SELECT doc_id,
           CAST(_h % 8 AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY _h % 8 ORDER BY _h, doc_id)
                AS INTEGER) AS pos
    FROM h
    """,
)
def doc_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards:
    hash-derived shard + 1-based within-shard position, the
    shuffle-once / read-sequentially layout a trainer consumes."""
    return CU.shard_assignment(load_table(spark, sf_dir, "documents"), 8)


@query(
    "corpus_quantile_profile",
    oracle="""
    WITH base AS (
      SELECT lang,
             CAST(len(text) AS BIGINT) AS _nc,
             CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                  AS BIGINT) AS _nt
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(quantile_cont(_nc, 0.25), 4) AS chars_p25,
           ROUND(quantile_cont(_nt, 0.25), 4) AS tokens_p25,
           ROUND(quantile_cont(_nc, 0.50), 4) AS chars_p50,
           ROUND(quantile_cont(_nt, 0.50), 4) AS tokens_p50,
           ROUND(quantile_cont(_nc, 0.75), 4) AS chars_p75,
           ROUND(quantile_cont(_nt, 0.75), 4) AS tokens_p75,
           ROUND(quantile_cont(_nc, 0.95), 4) AS chars_p95,
           ROUND(quantile_cont(_nt, 0.95), 4) AS tokens_p95
    FROM base GROUP BY lang
    """,
)
def corpus_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-distribution profile (exact interpolated
    p25/p50/p75/p95 of character and whitespace-token counts) — the
    dataset card computed before choosing filter cutoffs. The
    operator's ``exact=False`` mode swaps in approx_percentile for
    the 100 TB path (sketch-mergeable, bounded memory)."""
    from tiki_data_pipeline_spark.operators import textstats as TS

    return TS.quantile_profile(load_table(spark, sf_dir, "documents"))


@query(
    "corpus_mix_apply",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                  AS BIGINT) AS n_tokens,
             {_H56_SQL.format(salt='mix', col='doc_id')} AS _h
      FROM documents
    ),
    rates AS (
      SELECT lang,
             LEAST(CAST(1000000 AS BIGINT),
                   CAST((CAST(8000 AS HUGEINT) *
                         CASE lang WHEN 'en' THEN 500000
                                   WHEN 'zh' THEN 250000
                                   WHEN 'fr' THEN 250000 ELSE 0 END)
                        // SUM(n_tokens) AS BIGINT)) AS rate_ppm
      FROM base GROUP BY lang
    )
    SELECT b.doc_id, b.lang, b.n_tokens, r.rate_ppm
    FROM base b JOIN rates r USING (lang)
    WHERE CAST(b._h AS HUGEINT) * 1000000
          < CAST(r.rate_ppm AS HUGEINT) * 72057594037927936
    """,
)
def corpus_mix_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applied half of corpus mixing: deterministically sample
    the corpus to an 8000-token budget at en/zh/fr = 50/25/25 shares
    (es/de get share 0 and are excluded — the mix defines the
    corpus). Exact-integer md5 Bernoulli per stratum; DECIMAL rate
    math so budget·ppm survives the 100 TB regime."""
    return CU.apply_mix(
        load_table(spark, sf_dir, "documents"),
        {"en": 500_000, "zh": 250_000, "fr": 250_000},
        token_budget=8000,
    )
