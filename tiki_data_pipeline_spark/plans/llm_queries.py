"""Oracle-checked LLM-data-pipeline queries (BASELINE.json north
star): text analysis, dedup family, similarity search — over the
driver's ``documents`` and ``embeddings`` tables.

All hash-derived signatures (minhash/simhash/fingerprints) come from
md5 so DuckDB reproduces them exactly; all float math is rounded on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.operators import dedup as DD
from tiki_data_pipeline_spark.operators import similarity as SIM
from tiki_data_pipeline_spark.operators import textstats as TS
from tiki_data_pipeline_spark.plans.registry import query

# ---------------------------------------------------------------- text stats

_STOPWORDS_SQL = "[" + ", ".join(f"'{w}'" for w in TS.EN_STOPWORDS) + "]"


def _markers_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in TS.LANG_MARKERS[lang]) + "]"


_LANGS = sorted(TS.LANG_MARKERS)

_HITS_SQL = ",\n".join(
    f"LEN(list_filter(toks, t -> list_contains({_markers_sql(lang)}, t))) AS h_{lang}"
    for lang in _LANGS
)
_MAX_HITS_SQL = "GREATEST(" + ", ".join(f"h_{lang}" for lang in _LANGS) + ")"
_LANG_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN h_{lang} = _max_hits THEN '{lang}'" for lang in _LANGS)
    + " END"
)


@query(
    "doc_text_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    hits AS (
      SELECT doc_id, text, toks, {_HITS_SQL}
      FROM toks
    ),
    base AS (
      SELECT doc_id,
        CAST(LEN(toks) AS INTEGER) AS n_tokens,
        CAST(LENGTH(REGEXP_REPLACE(text, '[\\w\\s]', '', 'g')) AS INTEGER) AS n_punct,
        CAST(LEN(list_filter(toks, t -> list_contains({_STOPWORDS_SQL}, t))) AS INTEGER)
          AS n_stopwords,
        CAST(LENGTH(text) AS INTEGER) AS n_chars,
        {_MAX_HITS_SQL} AS _max_hits,
        {_LANG_CASE_SQL} AS lang_guess,
        md5(trim(REGEXP_REPLACE(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM hits
    )
    SELECT doc_id, n_tokens, n_punct, n_stopwords, lang_guess, fingerprint,
      CAST((
        (4 * LEAST(CAST(n_tokens AS BIGINT), 100)
             * GREATEST(CAST(n_chars AS BIGINT), 1)
             * GREATEST(CAST(n_tokens AS BIGINT), 1)
         + 300 * (GREATEST(CAST(n_chars AS BIGINT), 1) - CAST(n_punct AS BIGINT))
               * GREATEST(CAST(n_tokens AS BIGINT), 1)
         + 300 * LEAST(10 * CAST(n_stopwords AS BIGINT), CAST(n_tokens AS BIGINT))
               * GREATEST(CAST(n_chars AS BIGINT), 1)
        ) * 20000
        + 1000 * GREATEST(CAST(n_chars AS BIGINT), 1) * GREATEST(CAST(n_tokens AS BIGINT), 1)
      ) // (2000 * GREATEST(CAST(n_chars AS BIGINT), 1) * GREATEST(CAST(n_tokens AS BIGINT), 1))
      AS DOUBLE) / 10000.0 AS quality_score
    FROM base
    """,
)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count / punctuation / stopwords / quality / lang-ID /
    fingerprint per document. Fanned out: the stats are CPU-bound
    regex/array expressions, and a single-split read would run them
    on one core."""
    from tiki_data_pipeline_spark.io import fan_out_small

    docs = fan_out_small(load_table(spark, sf_dir, "documents"))
    return TS.with_text_stats(docs).select(
        "doc_id",
        "n_tokens",
        "n_punct",
        "n_stopwords",
        "lang_guess",
        "fingerprint",
        "quality_score",
    )


@query(
    "doc_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(LEN(string_split_regex(lower(trim(text)), '\s+')) AS INTEGER)
             AS ws_tokens,
           CAST(LEN(regexp_extract_all(text,
             '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
             AS INTEGER) AS bpe_tokens
    FROM documents
    """,
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways (brief: whitespace + BPE-ish regex):
    the corpus-budgeting estimators, JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TS.token_count(F.col("text")).alias("ws_tokens"),
        TS.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


@query(
    "doc_chunking",
    oracle="""
    WITH dtoks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE LEN(string_split_regex(lower(trim(text)), '\\s+')) > 0
    ),
    exploded AS (
      SELECT doc_id, toks, UNNEST(range(1, LEN(toks) + 1, 24)) AS start
      FROM dtoks
    )
    SELECT doc_id,
           CAST((start - 1) // 24 AS INTEGER) AS chunk_id,
           CAST(LEN(toks[start : start + 31]) AS INTEGER) AS n_chunk_tokens,
           array_to_string(toks[start : start + 31], ' ') AS chunk_text
    FROM exploded
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token windows, stride
    24) — pre-training data prep as one explode."""
    docs = load_table(spark, sf_dir, "documents")
    return TS.chunk_documents(docs, chunk_size=32, stride=24)


# ---------------------------------------------------------------- dedup

@query(
    "doc_exact_dedup",
    oracle="""
    SELECT md5(trim(REGEXP_REPLACE(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) AS survivor_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-text fingerprint."""
    return DD.exact_dedup(load_table(spark, sf_dir, "documents"))


# Three dedup queries consume the same distinct-shingle set over the
# same documents table; memoize the materialized set per (application,
# sf_dir) so the explode+distinct runs once per session, not per query.
_SHINGLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _shingles_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    df = _SHINGLE_CACHE.get(key)
    if df is None:
        df = DD.shingles(load_table(spark, sf_dir, "documents")).localCheckpoint()
        for k in list(_SHINGLE_CACHE):  # old sessions' checkpoints are dead
            if k[0] != app_id:
                del _SHINGLE_CACHE[k]
        _SHINGLE_CACHE[key] = df
    return df


_SHINGLES_SQL = """
dtoks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
sh0 AS (
  SELECT doc_id, toks, UNNEST(range(1, len(toks) - 1)) AS i
  FROM dtoks WHERE len(toks) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM sh0
),
sh_counts AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id)
"""


@query(
    "doc_rolling_fingerprints",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    tokh AS (
      SELECT doc_id,
             list_transform(string_split_regex(lower(trim(text)), '\\s+'),
               t -> try_cast(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
                    & {DD._TOKEN_MASK}) AS hs
      FROM documents
    ),
    fp AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
               (a, b) -> (a * {DD.ROLLING_BASE} + b) % {DD.ROLLING_MOD})
               AS content_fp
      FROM tokh
    ),
    sk AS (
      SELECT doc_id,
             list_sort(list(DISTINCT
               try_cast(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT)
               % {DD.ROLLING_MOD}))[1:8] AS sketch
      FROM sh GROUP BY doc_id
    )
    SELECT f.doc_id, f.content_fp,
           COALESCE(array_to_string(sk.sketch, ','), '') AS sketch
    FROM fp f LEFT JOIN sk ON sk.doc_id = f.doc_id
    """,
)
def doc_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints: whole-document polynomial
    rolling hash + bottom-8 n-gram hash sketch (winnowing-style
    resemblance fingerprint). The sketch array is projected to a
    comma-joined string so row canonicalizers can hash it."""
    docs = load_table(spark, sf_dir, "documents")
    out = DD.rolling_fingerprint(docs, sketch_k=8, sh=_shingles_cached(spark, sf_dir))
    return out.select(
        "doc_id",
        "content_fp",
        F.concat_ws(
            ",", F.transform("sketch", lambda x: x.cast("string"))
        ).alias("sketch"),
    )


@query(
    "doc_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    common AS (
      SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i, j, jaccard FROM (
      SELECT c.i, c.j,
             ROUND(c.n_common / CAST(na.n_shingles + nb.n_shingles - c.n_common
                                     AS DOUBLE), 4) AS jaccard
      FROM common c
      JOIN sh_counts na ON na.doc_id = c.i
      JOIN sh_counts nb ON nb.doc_id = c.j
    ) t WHERE jaccard >= 0.5
    """,
)
def doc_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via inverted-index join."""
    return DD.jaccard_pairs(_shingles_cached(spark, sf_dir), threshold=0.5)


def _minhash_oracle_fragments() -> tuple[str, str]:
    """(mh column list, band UNION ALL select) mirroring
    dedup.minhash_signatures / lsh_band_signatures."""
    r = DD.MINHASH_K // DD.LSH_BANDS
    mins = ", ".join(
        "MIN((h0 * {a} + {b}) % {p}) AS mh{i}".format(a=a, b=b, p=DD.MINHASH_PRIME, i=i)
        for i, (a, b) in enumerate(DD._minhash_params(DD.MINHASH_K))
    )
    band_selects = []
    for band in range(DD.LSH_BANDS):
        cols = " || ',' || ".join(
            "CAST(mh{idx} AS VARCHAR)".format(idx=band * r + j) for j in range(r)
        )
        band_selects.append(
            "SELECT doc_id, {band} AS band, {cols} AS band_sig FROM mh".format(
                band=band, cols=cols
            )
        )
    return mins, " UNION ALL ".join(band_selects)


_MH_MINS, _MH_BANDS = _minhash_oracle_fragments()


@query(
    "doc_minhash_lsh_near_dup",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    hashed AS (
      SELECT doc_id,
             try_cast(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT)
               & {(1 << 30) - 1} AS h0
      FROM sh
    ),
    mh AS (
      SELECT doc_id, {_MH_MINS}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (
      {_MH_BANDS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    common AS (
      SELECT c.i, c.j, COUNT(*) AS n_common
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.i
      JOIN sh sb ON sb.doc_id = c.j AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    )
    SELECT i, j, jaccard FROM (
      SELECT c.i, c.j,
             ROUND(c.n_common / CAST(na.n_shingles + nb.n_shingles - c.n_common
                                     AS DOUBLE), 4) AS jaccard
      FROM common c
      JOIN sh_counts na ON na.doc_id = c.i
      JOIN sh_counts nb ON nb.doc_id = c.j
    ) t WHERE jaccard >= 0.7
    """,
)
def doc_minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands) candidate generation with exact
    Jaccard verification ≥ 0.7 — the scale path for near-dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return DD.minhash_lsh_near_dups(
        docs, threshold=0.7, sh=_shingles_cached(spark, sf_dir)
    )


_EVEN_SIGS_CACHE: dict = {}


def _even_sigs_cached(spark: SparkSession, sf_dir: str):
    """MinHash signatures of the even-id corpus half, hashed once per
    (session, sf_dir) and shared by every store build of that corpus
    (the posix base store and the manifest lifecycle twin hash the
    SAME documents — r14: one localCheckpoint replaces two full
    shingle+md5+min pipelines; signatures are a pure per-document
    function so store content is unchanged)."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    df = _EVEN_SIGS_CACHE.get(key)
    if df is None:
        df = DD.minhash_signatures(
            DD.shingles(
                load_table(spark, sf_dir, "documents").filter(
                    F.col("doc_id") % 2 == 0
                ),
                distinct=False,
            )
        ).localCheckpoint()
        for k in list(_EVEN_SIGS_CACHE):
            if k[0] != app_id:
                del _EVEN_SIGS_CACHE[k]
        _EVEN_SIGS_CACHE[key] = df
    return df


def _mh_index_cached(spark: SparkSession, sf_dir: str) -> str:
    """Persisted MinHash band index over the even-id half of the
    documents table (the 'existing corpus' for the incremental-dedup
    demonstration split), built once per (session, sf_dir)."""
    return _session_index(
        spark,
        sf_dir,
        "mh",
        lambda p: DD.write_minhash_index(
            load_table(spark, sf_dir, "documents").filter(
                F.col("doc_id") % 2 == 0
            ),
            p,
            sigs=_even_sigs_cached(spark, sf_dir),
        ),
    )


# est_jaccard = fraction of agreeing minhash positions — the unbiased
# MinHash Jaccard estimator, computed position-by-position in SQL.
_MH_AGREE_SQL = " + ".join(
    f"(CASE WHEN x.mh{i} = y.mh{i} THEN 1 ELSE 0 END)"
    for i in range(DD.MINHASH_K)
)


@query(
    "doc_incremental_near_dup",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    hashed AS (
      SELECT doc_id,
             try_cast(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT)
               & {(1 << 30) - 1} AS h0
      FROM sh
    ),
    mh AS (
      SELECT doc_id, {_MH_MINS}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (
      {_MH_BANDS}
    ),
    cand AS (
      SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS old_id
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.band_sig = b.band_sig
      WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    )
    SELECT new_id, old_id, est_jaccard FROM (
      SELECT c.new_id, c.old_id,
             ROUND(({_MH_AGREE_SQL}) / {float(DD.MINHASH_K)}, 4) AS est_jaccard
      FROM cand c
      JOIN mh x ON x.doc_id = c.new_id
      JOIN mh y ON y.doc_id = c.old_id
    ) t WHERE est_jaccard >= 0.5
    """,
)
def doc_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup: the odd-id half of the documents table
    arrives as a 'new batch' and is near-dup-matched against the
    persisted MinHash band index of the even-id 'existing corpus' —
    only the batch is shingled; the corpus contributes stored band
    rows. The 100 TB shape: daily deltas dedup against a signature
    store instead of re-deduping the whole corpus (reference re-runs
    full-corpus dedup per crawl, deduplicator.py). The oracle models
    the uncapped path — HOT_BAND_CAP (10k docs/bucket) can never
    trigger at oracle scale factors, so engine and oracle agree."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return DD.minhash_index_near_dups(
        spark, _mh_index_cached(spark, sf_dir), batch, threshold=0.5
    )


@query(
    "doc_incremental_near_dup_verified",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    hashed AS (
      SELECT doc_id,
             try_cast(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT)
               & {(1 << 30) - 1} AS h0
      FROM sh
    ),
    mh AS (
      SELECT doc_id, {_MH_MINS}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (
      {_MH_BANDS}
    ),
    cand AS (
      SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS old_id
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.band_sig = b.band_sig
      WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    ),
    common AS (
      SELECT c.new_id, c.old_id, COUNT(*) AS n_common
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.new_id
      JOIN sh sb ON sb.doc_id = c.old_id AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    )
    SELECT new_id, old_id, jaccard FROM (
      SELECT c.new_id, c.old_id,
             ROUND(c.n_common / CAST(na.n_shingles + nb.n_shingles - c.n_common
                                     AS DOUBLE), 4) AS jaccard
      FROM common c
      JOIN sh_counts na ON na.doc_id = c.new_id
      JOIN sh_counts nb ON nb.doc_id = c.old_id
    ) t WHERE jaccard >= 0.5
    """,
)
def doc_incremental_near_dup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-verified incremental near-dedup: candidates from the
    persisted band index, EXACT n-gram Jaccard computed only over the
    candidate old-side docs (corpus text re-read is O(candidates)) —
    full-path precision at delta cost."""
    docs = load_table(spark, sf_dir, "documents")
    return DD.minhash_index_near_dups_verified(
        spark,
        _mh_index_cached(spark, sf_dir),
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        threshold=0.5,
    )


@query(
    "doc_incremental_dedup_status",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    fpall AS (
      SELECT doc_id,
             md5(trim(REGEXP_REPLACE(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    exact AS (
      SELECT b.doc_id AS new_id, MIN(a.doc_id) AS matched_id
      FROM fpall a JOIN fpall b ON a.fp = b.fp
      WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
      GROUP BY 1
    ),
    hashed AS (
      SELECT doc_id,
             try_cast(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT)
               & {(1 << 30) - 1} AS h0
      FROM sh
    ),
    mh AS (
      SELECT doc_id, {_MH_MINS}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (
      {_MH_BANDS}
    ),
    cand AS (
      SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS old_id
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.band_sig = b.band_sig
      WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        AND b.doc_id NOT IN (SELECT new_id FROM exact)
    ),
    est AS (
      SELECT c.new_id, c.old_id,
             ROUND(({_MH_AGREE_SQL}) / {float(DD.MINHASH_K)}, 4) AS est_jaccard
      FROM cand c
      JOIN mh x ON x.doc_id = c.new_id
      JOIN mh y ON y.doc_id = c.old_id
    ),
    near AS (
      SELECT new_id, old_id AS matched_id FROM (
        SELECT new_id, old_id,
               ROW_NUMBER() OVER (PARTITION BY new_id
                 ORDER BY est_jaccard DESC, old_id ASC) AS rn
        FROM est WHERE est_jaccard >= 0.5
      ) t WHERE rn = 1
    )
    SELECT d.doc_id,
           CASE WHEN e.new_id IS NOT NULL THEN 'exact_dup'
                WHEN nr.new_id IS NOT NULL THEN 'near_dup'
                ELSE 'unique' END AS status,
           COALESCE(e.matched_id, nr.matched_id) AS matched_id
    FROM documents d
    LEFT JOIN exact e ON e.new_id = d.doc_id
    LEFT JOIN near nr ON nr.new_id = d.doc_id
    WHERE d.doc_id % 2 = 1
    """,
)
def doc_incremental_dedup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged incremental dedup (exact-first, near second) of the
    odd-id batch against the persisted even-id corpus store: one
    (doc_id, status ∈ exact/near/unique, matched_id) row per batch
    doc — the per-delta ingest decision a 100 TB corpus store makes
    without re-reading corpus text."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return DD.incremental_dedup_status(
        spark, _mh_index_cached(spark, sf_dir), batch, threshold=0.5
    )


def _mh_del_index_cached(spark: SparkSession, sf_dir: str) -> str:
    """The even-id MinHash store with ids divisible by 10 retired via
    ``delete_from_store`` (tombstones pending, NOT folded) — the
    'corpus after takedowns' fixture for the deletion-aware serve
    path. Built by COPYING the session's base store and deleting from
    the copy — the production order (deletes hit an existing store),
    and the build cost is one file copy, not a re-ingest."""
    import shutil

    from tiki_data_pipeline_spark.sources.files import delete_from_store

    def build(p: str) -> None:
        shutil.copytree(_mh_index_cached(spark, sf_dir), p)
        delete_from_store(
            spark,
            p,
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0)
            .select(F.col("doc_id").alias("id")),
        )

    return _session_index(spark, sf_dir, "mhdel", build)


@query(
    "doc_deleted_dedup_status",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    fpall AS (
      SELECT doc_id,
             md5(trim(REGEXP_REPLACE(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    exact AS (
      SELECT b.doc_id AS new_id, MIN(a.doc_id) AS matched_id
      FROM fpall a JOIN fpall b ON a.fp = b.fp
      WHERE a.doc_id % 2 = 0 AND a.doc_id % 10 <> 0 AND b.doc_id % 2 = 1
      GROUP BY 1
    ),
    hashed AS (
      SELECT doc_id,
             try_cast(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT)
               & {(1 << 30) - 1} AS h0
      FROM sh
    ),
    mh AS (
      SELECT doc_id, {_MH_MINS}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (
      {_MH_BANDS}
    ),
    cand AS (
      SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS old_id
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.band_sig = b.band_sig
      WHERE a.doc_id % 2 = 0 AND a.doc_id % 10 <> 0 AND b.doc_id % 2 = 1
        AND b.doc_id NOT IN (SELECT new_id FROM exact)
    ),
    est AS (
      SELECT c.new_id, c.old_id,
             ROUND(({_MH_AGREE_SQL}) / {float(DD.MINHASH_K)}, 4) AS est_jaccard
      FROM cand c
      JOIN mh x ON x.doc_id = c.new_id
      JOIN mh y ON y.doc_id = c.old_id
    ),
    near AS (
      SELECT new_id, old_id AS matched_id FROM (
        SELECT new_id, old_id,
               ROW_NUMBER() OVER (PARTITION BY new_id
                 ORDER BY est_jaccard DESC, old_id ASC) AS rn
        FROM est WHERE est_jaccard >= 0.5
      ) t WHERE rn = 1
    )
    SELECT d.doc_id,
           CASE WHEN e.new_id IS NOT NULL THEN 'exact_dup'
                WHEN nr.new_id IS NOT NULL THEN 'near_dup'
                ELSE 'unique' END AS status,
           COALESCE(e.matched_id, nr.matched_id) AS matched_id
    FROM documents d
    LEFT JOIN exact e ON e.new_id = d.doc_id
    LEFT JOIN near nr ON nr.new_id = d.doc_id
    WHERE d.doc_id % 2 = 1
    """,
)
def doc_deleted_dedup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-aware staged incremental dedup: the even-id corpus
    store has every id divisible by 10 retired (tombstone sidecar,
    unfolded), and the odd-id batch is statused against it — retired
    docs must stop matching at BOTH stages (their fingerprint rows and
    band rows are anti-joined out at serve time), so a batch doc whose
    only duplicate was taken down now reads ``unique``. The oracle is
    the incremental-status SQL with the retired ids excluded from the
    store side. 100 TB shape: the tombstone set is broadcast; the
    pruned store scan is unchanged (reference deletes rows
    transactionally, postgres_storage.py DELETE paths — this is the
    immutable-parquet twin)."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return DD.incremental_dedup_status(
        spark, _mh_del_index_cached(spark, sf_dir), batch, threshold=0.5
    )


def _mh_tt_index_cached(spark: SparkSession, sf_dir: str) -> str:
    """The even-id MinHash store with a FULL takedown lifecycle plus
    history: snapshot v1 (pre-delete), retire ids divisible by 10,
    physical fold. Serving the live tree sees the post-takedown
    corpus; serving ``_versions/v1`` time-travels to before it — the
    snapshot is a complete hardlinked store tree, so the SAME serve
    code runs against both ends with no time-travel special case."""
    import shutil

    from tiki_data_pipeline_spark.sources.files import (
        delete_from_store,
        fold_tombstones,
        snapshot_store,
    )

    def build(p: str) -> None:
        shutil.copytree(_mh_index_cached(spark, sf_dir), p)
        snapshot_store(p, tag="pre-takedown")
        delete_from_store(
            spark,
            p,
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0)
            .select(F.col("doc_id").alias("id")),
        )
        fold_tombstones(spark, p)

    return _session_index(spark, sf_dir, "mhtt", build)


# The staged-status SQL evaluated under both store predicates (with
# and without the retired ids) — shared verbatim by the posix
# (doc_dedup_status_timetravel) and manifest-backend
# (doc_dedup_status_manifest_backend) lifecycle queries: both
# backends MUST serve byte-identical results for the same corpus and
# takedown batch, so both pin against the same oracle.
_TT_STATUS_ORACLE = f"""
    WITH {_SHINGLES_SQL},
    eras AS (SELECT * FROM (VALUES (TRUE), (FALSE)) e(pre_del)),
    fpall AS (
      SELECT doc_id,
             md5(trim(REGEXP_REPLACE(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    exact AS (
      SELECT e.pre_del, b.doc_id AS new_id, MIN(a.doc_id) AS matched_id
      FROM fpall a JOIN fpall b ON a.fp = b.fp CROSS JOIN eras e
      WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        AND (e.pre_del OR a.doc_id % 10 <> 0)
      GROUP BY 1, 2
    ),
    hashed AS (
      SELECT doc_id,
             try_cast(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT)
               & {(1 << 30) - 1} AS h0
      FROM sh
    ),
    mh AS (
      SELECT doc_id, {_MH_MINS}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (
      {_MH_BANDS}
    ),
    cand AS (
      SELECT DISTINCT e.pre_del, b.doc_id AS new_id, a.doc_id AS old_id
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.band_sig = b.band_sig
      CROSS JOIN eras e
      WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        AND (e.pre_del OR a.doc_id % 10 <> 0)
        AND NOT EXISTS (
          SELECT 1 FROM exact x
          WHERE x.pre_del = e.pre_del AND x.new_id = b.doc_id
        )
    ),
    est AS (
      SELECT c.pre_del, c.new_id, c.old_id,
             ROUND(({_MH_AGREE_SQL}) / {float(DD.MINHASH_K)}, 4) AS est_jaccard
      FROM cand c
      JOIN mh x ON x.doc_id = c.new_id
      JOIN mh y ON y.doc_id = c.old_id
    ),
    near AS (
      SELECT pre_del, new_id, old_id AS matched_id FROM (
        SELECT pre_del, new_id, old_id,
               ROW_NUMBER() OVER (PARTITION BY pre_del, new_id
                 ORDER BY est_jaccard DESC, old_id ASC) AS rn
        FROM est WHERE est_jaccard >= 0.5
      ) t WHERE rn = 1
    )
    SELECT d.doc_id,
           CASE WHEN e1.new_id IS NOT NULL THEN 'exact_dup'
                WHEN n1.new_id IS NOT NULL THEN 'near_dup'
                ELSE 'unique' END AS status_asof,
           COALESCE(e1.matched_id, n1.matched_id) AS matched_asof,
           CASE WHEN e0.new_id IS NOT NULL THEN 'exact_dup'
                WHEN n0.new_id IS NOT NULL THEN 'near_dup'
                ELSE 'unique' END AS status_now,
           COALESCE(e0.matched_id, n0.matched_id) AS matched_now
    FROM documents d
    LEFT JOIN exact e1 ON e1.pre_del AND e1.new_id = d.doc_id
    LEFT JOIN near n1 ON n1.pre_del AND n1.new_id = d.doc_id
    LEFT JOIN exact e0 ON NOT e0.pre_del AND e0.new_id = d.doc_id
    LEFT JOIN near n0 ON NOT n0.pre_del AND n0.new_id = d.doc_id
    WHERE d.doc_id % 2 = 1
    """


def _tt_status_serve(spark: SparkSession, sf_dir: str, store: str) -> DataFrame:
    """Both ends of a takedown lifecycle served from ONE store's
    history: as-of (snapshot v1, pre-takedown) joined with now (live,
    folded) — the shared body of the posix and manifest lifecycle
    queries."""
    from tiki_data_pipeline_spark.sources.files import version_path

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    # MinHash signatures are a pure per-document function — identical
    # for the as-of and live serves — so hash the batch ONCE and let
    # each serve semi-join the materialized signatures down to its own
    # post-exact remainder (r14: the signature pipeline measured
    # 1.3 s/serve at sf0.1, the dominant term of the twin queries,
    # and was computed twice; guide §1.2 "don't compute things you
    # throw away" / §2.4 shared work across same-keyed consumers).
    sigs = DD.minhash_signatures(
        DD.shingles(batch, distinct=False)
    ).localCheckpoint(eager=False)
    # the exact stage's content fingerprint is pure-per-document too:
    # normalize+md5 the batch text ONCE (r14 follow-up to the shared
    # sigs — each serve previously re-ran the regexp+md5 pass; the
    # materialized frame is 2 narrow columns)
    fps = batch.select(
        "doc_id", DD._content_fingerprint("text").alias("fp")
    ).localCheckpoint(eager=False)
    asof = DD.incremental_dedup_status(
        spark, version_path(store, 1), batch, threshold=0.5, sigs=sigs, fps=fps
    )
    now = DD.incremental_dedup_status(
        spark, store, batch, threshold=0.5, sigs=sigs, fps=fps
    )
    return (
        asof.select(
            "doc_id",
            F.col("status").alias("status_asof"),
            F.col("matched_id").alias("matched_asof"),
        )
        .join(
            now.select(
                "doc_id",
                F.col("status").alias("status_now"),
                F.col("matched_id").alias("matched_now"),
            ),
            "doc_id",
        )
    )


@query("doc_dedup_status_timetravel", oracle=_TT_STATUS_ORACLE)
def doc_dedup_status_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel dedup audit: status every odd-id batch doc against
    the corpus store BEFORE a takedown batch (snapshot ``v1``) and
    AFTER it (live tree, tombstones folded), side by side — the
    question a takedown/GDPR review actually asks ("which decisions
    did this removal flip?"). A doc whose only duplicate was retired
    reads (exact_dup → unique); survivors keep their match. The
    snapshot is a hardlinked full store tree under ``_versions/v1``
    (O(metadata) to record), so BOTH serves run the identical staged
    exact-first path — time travel is a path choice, not a code
    path. Oracle: the same staged-status SQL evaluated under both
    store predicates (with and without the retired ids). Reference
    analogue: point-in-time recovery on the OLTP store
    (src/pipelines/crawl/storage/postgres_storage.py) — on immutable
    parquet, explicit snapshots."""
    return _tt_status_serve(spark, sf_dir, _mh_tt_index_cached(spark, sf_dir))


def _mh_manifest_tt_index_cached(spark: SparkSession, sf_dir: str) -> str:
    """Manifest-backend twin of :func:`_mh_tt_index_cached`: the SAME
    takedown lifecycle — build the even-id MinHash store, tagged
    snapshot v1, tombstone ids divisible by 10, physical fold — but
    executed on the object-store-safe manifest backend
    (sources/store_backend.py): the build commits via manifest
    pointer flips, the snapshot is one JSON write pinning a
    generation, the fold rewrites victim partitions as new files and
    carries the rest by reference, and the as-of serve reads the
    ``@v1`` pinned handle. Same corpus, same lifecycle, same oracle —
    the driver-checked proof the two backends are interchangeable."""
    import os

    from tiki_data_pipeline_spark.sources.files import (
        delete_from_store,
        fold_tombstones,
        snapshot_store,
    )
    from tiki_data_pipeline_spark.sources.store_backend import BACKEND_ENV

    def build(p: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        prev = os.environ.get(BACKEND_ENV)
        os.environ[BACKEND_ENV] = "manifest"
        try:
            DD.write_minhash_index(
                docs.filter(F.col("doc_id") % 2 == 0),
                p,
                sigs=_even_sigs_cached(spark, sf_dir),
            )
        finally:
            if prev is None:
                os.environ.pop(BACKEND_ENV, None)
            else:
                os.environ[BACKEND_ENV] = prev
        snapshot_store(p, tag="pre-takedown")
        delete_from_store(
            spark,
            p,
            docs.filter(F.col("doc_id") % 10 == 0).select(
                F.col("doc_id").alias("id")
            ),
        )
        fold_tombstones(spark, p)

    return _session_index(spark, sf_dir, "mhmf", build)


@query("doc_dedup_status_manifest_backend", oracle=_TT_STATUS_ORACLE)
def doc_dedup_status_manifest_backend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full takedown lifecycle (build → tagged snapshot →
    tombstone → physical fold → as-of + live serve) executed on the
    MANIFEST store backend — immutable generation files, JSON
    manifests, one atomic pointer; the layout that works on an object
    store where the posix hardlink/rename machinery cannot
    (sources/store_backend.py). Pinned against the IDENTICAL oracle
    as ``doc_dedup_status_timetravel``: backend choice must be
    invisible in results. Reference analogue: the reference's
    point-in-time recovery lives in the database engine
    (src/pipelines/crawl/storage/postgres_storage.py); at 100 TB on
    immutable parquet the equivalent is manifest commits."""
    return _tt_status_serve(
        spark, sf_dir, _mh_manifest_tt_index_cached(spark, sf_dir)
    )


def _mh_vd_index_cached(spark: SparkSession, sf_dir: str) -> str:
    """The even-id MinHash store with a FULL maintenance window
    between two snapshots: v1 (baseline) → append the odd%3 batch →
    retire ids divisible by 10 → physical fold → v2. The version
    diff v1→v2 must read back exactly (appended − retired)."""
    import shutil

    from tiki_data_pipeline_spark.sources.files import (
        delete_from_store,
        fold_tombstones,
        snapshot_store,
    )

    def build(p: str) -> None:
        shutil.copytree(_mh_index_cached(spark, sf_dir), p)
        snapshot_store(p, tag="baseline")
        docs = load_table(spark, sf_dir, "documents")
        DD.append_minhash_index(
            docs.filter(
                (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 3 == 0)
            ),
            p,
        )
        delete_from_store(
            spark,
            p,
            docs.filter(F.col("doc_id") % 10 == 0).select(
                F.col("doc_id").alias("id")
            ),
        )
        fold_tombstones(spark, p)
        snapshot_store(p, tag="post-maintenance")

    return _session_index(spark, sf_dir, "mhvd", build)


@query(
    "doc_dedup_store_version_diff",
    oracle="""
    SELECT doc_id AS id,
           CASE WHEN doc_id % 2 = 1 THEN 'added' ELSE 'removed' END AS change
    FROM documents
    WHERE (doc_id % 2 = 1 AND doc_id % 3 = 0) OR doc_id % 10 = 0
    """,
)
def doc_dedup_store_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot membership diff across a maintenance window: which
    doc ids entered / left the corpus store between snapshot v1
    (baseline) and v2 (after an append batch + a takedown fold) —
    the closing audit of every takedown ticket ("the fold retired
    exactly the requested ids, the append landed, nothing else
    moved"). Serve-side it is ONE full-outer join of two id sets
    read column-pruned from the ``_fingerprints`` sidecars (O(docs)
    per side, never O(band rows)); at 100 TB the id sets are ~1/1000
    of the store bytes and the join shuffles only ids. Oracle: the
    batch/victim predicates restated over ``documents``. Reference
    analogue: audit-log reconciliation on the OLTP store
    (src/pipelines/crawl/storage/postgres_storage.py)."""
    from tiki_data_pipeline_spark.sources.files import store_version_diff

    store = _mh_vd_index_cached(spark, sf_dir)
    return store_version_diff(spark, store, 1, 2)


@query(
    "doc_simhash_signatures",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    hb AS (
      SELECT doc_id,
             try_cast(('0x' || substring(md5(token), 1, 15)) AS BIGINT) AS h
      FROM tok
    ),
    bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM hb, range(0, {DD.SIMHASH_BITS}) t(b)
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INTEGER))
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def doc_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signature per document."""
    return DD.simhash_signatures(load_table(spark, sf_dir, "documents"))


@query(
    "doc_simhash_near_dup",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    hb AS (
      SELECT doc_id,
             try_cast(('0x' || substring(md5(token), 1, 15)) AS BIGINT) AS h
      FROM tok
    ),
    bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM hb, range(0, {DD.SIMHASH_BITS}) t(b)
      GROUP BY doc_id, b
    ),
    sigs AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS i, b.doc_id AS j,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def doc_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3)."""
    return DD.simhash_near_dups(load_table(spark, sf_dir, "documents"), max_hamming=3)


# ---------------------------------------------------------------- similarity

_QUERY_IDS = list(range(10))


@query(
    "embedding_topk_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine_sim
      FROM q JOIN e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
)
def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for the first 10 query vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(emb, _QUERY_IDS, k=5)


@query(
    "embedding_near_dup_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT i, j, cosine_sim FROM (
      SELECT a.vec_id AS i, b.vec_id AS j,
             ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    ) t WHERE cosine_sim >= 0.45
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.45)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.near_dup_pairs(emb, threshold=0.45)


# Signed-random-projection bucket, evaluated from the same md5-derived
# plane weights the Spark side embeds as literals (similarity.py
# _plane_weight) — defined here because two oracles below use it.
_LSH_BUCKET_SQL = " + ".join(
    "(CASE WHEN list_sum(list_transform(generate_series(1, len(v)), i -> "
    f"v[i] * (CAST(concat('0x', substring(md5(concat({p}, '_', i)), 1, 15)) "
    "AS BIGINT) / 576460752303423488.0 - 1.0))) > 0 "
    f"THEN {1 << p} ELSE 0 END)"
    for p in range(SIM.N_PLANES)
)


# Approximate (LSH-blocked) near-dup join: the 100 TB path. The probe
# set (every bucket within Hamming emit_radius=2 of a vector's own
# bucket) makes the meet condition EXACTLY expressible: two vectors
# share a probe bucket iff their codes differ in ≤ 2·radius = 4 bits,
# so the oracle reproduces the approximate join bit-for-bit — recall
# vs the exact join is the ANN contract, pinned separately in
# tests/test_operators.py::test_lsh_blocked_near_dup_subset_recall.
@query(
    "embedding_near_dup_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_LSH_BUCKET_SQL} AS bucket FROM e)
    SELECT i, j, cosine_sim FROM (
      SELECT a.vec_id AS i, b2.vec_id AS j,
             ROUND(list_cosine_similarity(a.v, b2.v), 4) AS cosine_sim
      FROM b a JOIN b b2
        ON a.vec_id < b2.vec_id
       AND bit_count(xor(a.bucket::BIGINT, b2.bucket::BIGINT)) <= 4
    ) t WHERE cosine_sim >= 0.45
    """,
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked approximate near-dup pairs (cos ≥ 0.45)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.near_dup_pairs(emb, threshold=0.45, blocking="lsh")


def _emb_even_index_cached(spark: SparkSession, sf_dir: str) -> str:
    """Persisted LSH index over the even-id half of the embeddings
    (the 'existing corpus' for the incremental embedding-dedup
    split), built once per (session, sf_dir)."""
    return _session_index(
        spark,
        sf_dir,
        "lsh_even",
        lambda p: SIM.write_lsh_index(
            load_table(spark, sf_dir, "embeddings").filter(
                F.col("vec_id") % 2 == 0
            ),
            p,
        ),
    )


@query(
    "embedding_incremental_near_dup",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_LSH_BUCKET_SQL} AS bucket FROM e)
    SELECT new_id, old_id, cosine_sim FROM (
      SELECT n.vec_id AS new_id, o.vec_id AS old_id,
             ROUND(list_cosine_similarity(n.v, o.v), 6) AS cosine_sim
      FROM b o JOIN b n
        ON o.vec_id % 2 = 0 AND n.vec_id % 2 = 1
       AND bit_count(xor(o.bucket::BIGINT, n.bucket::BIGINT)) <= 2
    ) t WHERE cosine_sim >= 0.45
    """,
)
def embedding_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed incremental embedding near-dup: the odd-id half of
    the embeddings arrives as a delta and is matched against the
    persisted LSH index of the even-id corpus — the batch stays
    distributed (no driver collect), so a delta of ANY size works;
    probe replication happens on the query side only, preserving the
    single-copy index. Oracle: exact Hamming-≤radius candidates over
    the same md5-derived buckets, cosine ≥ 0.45."""
    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    return SIM.lsh_index_near_dups(
        spark,
        _emb_even_index_cached(spark, sf_dir),
        batch,
        threshold=0.45,
        emit_radius=2,
    )


@query(
    "embedding_incremental_dedup_status",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_LSH_BUCKET_SQL} AS bucket FROM e),
    store AS (SELECT * FROM b WHERE vec_id % 2 = 0),
    batch AS (SELECT * FROM b WHERE vec_id % 2 = 1),
    exact AS (
      SELECT n.vec_id, MIN(o.vec_id) AS matched_id, 'exact_dup' AS status
      FROM batch n JOIN store o ON n.v = o.v AND n.vec_id <> o.vec_id
      GROUP BY n.vec_id
    ),
    near AS (
      SELECT vec_id, matched_id, 'near_dup' AS status FROM (
        SELECT n.vec_id, o.vec_id AS matched_id,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY ROUND(list_cosine_similarity(n.v, o.v), 6) DESC,
                          o.vec_id ASC) AS rn
        FROM batch n JOIN store o
          ON bit_count(xor(o.bucket::BIGINT, n.bucket::BIGINT)) <= 2
         AND ROUND(list_cosine_similarity(n.v, o.v), 6) >= 0.45
        WHERE n.vec_id NOT IN (SELECT vec_id FROM exact)
      ) t WHERE rn = 1
    ),
    hits AS (
      SELECT * FROM exact
      UNION ALL SELECT vec_id, matched_id, status FROM near
    )
    SELECT bb.vec_id, COALESCE(h.status, 'unique') AS status, h.matched_id
    FROM batch bb LEFT JOIN hits h ON bb.vec_id = h.vec_id
    """,
)
def embedding_incremental_dedup_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Staged incremental embedding dedup: the odd-id delta is
    statused against the persisted even-id LSH index — EXACT stage
    first (xxhash64 equi-join + array-equality residual; bit-identical
    vectors collapse here instead of fanning out through a shared LSH
    bucket), LSH near stage on the remainder, one (vec_id, status,
    matched_id) row per delta vector. The embedding twin of the
    document-side ``incremental_dedup_status``."""
    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    return SIM.lsh_index_dedup_status(
        spark,
        _emb_even_index_cached(spark, sf_dir),
        batch,
        threshold=0.45,
        emit_radius=2,
    )


@query(
    "embedding_label_stats",
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT label, COUNT(*) AS n_vectors,
           ROUND(AVG(sqrt(list_sum(list_transform(v, x -> x * x)))), 4) AS avg_norm
    FROM e GROUP BY label
    """,
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector count + mean L2 norm."""
    return SIM.label_centroid_stats(load_table(spark, sf_dir, "embeddings"))


# ANN via LSH buckets: reuses _LSH_BUCKET_SQL (defined above the
# near-dup query) — per plane p and 1-based dim i,
# weight = hex(md5(p || '_' || i)[:15]) / 2^59 - 1.
@query(
    "embedding_ann_lsh_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_LSH_BUCKET_SQL} AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
          WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
    scored AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qv, b.v), 6) AS cosine_sim
      FROM q JOIN b
        ON bit_count(xor(b.bucket::BIGINT, q.bucket::BIGINT)) <= 2
       AND b.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
)
def embedding_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 within random-hyperplane LSH buckets (scale path)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.lsh_bucketed_topk(emb, _QUERY_IDS, k=5)


# Persisted-index variant: the corpus is materialized ONCE per
# (session, sf_dir) partitioned by its base LSH bucket; queries
# multi-probe via partition pruning. With one-sided probing at
# emit_radius=2 the candidate set is exactly Hamming(code_q, code_v)
# ≤ 2 — the same set the in-session bucket join produces — so the
# SAME DuckDB oracle pins both paths.
# (kind, applicationId, sf_dir) → on-disk index path. One helper for
# every persisted-index family; evicting a dead session's entry also
# removes its temp tree so long-lived processes don't leak /tmp.
_INDEX_CACHE: dict[tuple[str, str, str], str] = {}


def _session_index(spark: SparkSession, sf_dir: str, kind: str, build) -> str:
    import os
    import shutil
    import tempfile

    app_id = spark.sparkContext.applicationId
    key = (kind, app_id, sf_dir)
    path = _INDEX_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix=f"{kind}_index_") + "/idx"
        build(path)
        for k in list(_INDEX_CACHE):  # drop dead sessions' trees
            if k[1] != app_id:
                shutil.rmtree(os.path.dirname(_INDEX_CACHE[k]), ignore_errors=True)
                del _INDEX_CACHE[k]
        _INDEX_CACHE[key] = path
    return path


def _lsh_index_cached(spark: SparkSession, sf_dir: str) -> str:
    return _session_index(
        spark,
        sf_dir,
        "lsh",
        lambda p: SIM.write_lsh_index(load_table(spark, sf_dir, "embeddings"), p),
    )


@query(
    "embedding_ann_index_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_LSH_BUCKET_SQL} AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
          WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
    scored AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qv, b.v), 6) AS cosine_sim
      FROM q JOIN b
        ON bit_count(xor(b.bucket::BIGINT, q.bucket::BIGINT)) <= 2
       AND b.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
)
def embedding_ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 served from the persisted bucket-partitioned LSH
    index (partition-pruned multi-probe, emit_radius=2)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(_QUERY_IDS))
    return SIM.lsh_index_topk(
        spark, _lsh_index_cached(spark, sf_dir), queries, k=5, emit_radius=2
    )


def _lsh_del_index_cached(spark: SparkSession, sf_dir: str) -> str:
    """The full-corpus LSH index with ``vec_id % 5 == 3`` retired via
    ``delete_from_store`` (tombstones pending, NOT folded). Copies
    the session's base index and deletes from the copy — the
    production order (see ``_mh_del_index_cached``)."""
    import shutil

    from tiki_data_pipeline_spark.sources.files import delete_from_store

    def build(p: str) -> None:
        shutil.copytree(_lsh_index_cached(spark, sf_dir), p)
        delete_from_store(
            spark,
            p,
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") % 5 == 3)
            .select(F.col("vec_id").alias("id")),
        )

    return _session_index(spark, sf_dir, "lshdel", build)


@query(
    "embedding_deleted_ann_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_LSH_BUCKET_SQL} AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
          WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
    scored AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qv, b.v), 6) AS cosine_sim
      FROM q JOIN b
        ON bit_count(xor(b.bucket::BIGINT, q.bucket::BIGINT)) <= 2
       AND b.vec_id <> q.query_id
       AND b.vec_id % 5 <> 3
    )
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
)
def embedding_deleted_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-aware ANN top-5: every fifth-offset vector is retired
    from the persisted LSH index (tombstone sidecar, unfolded) and the
    standard query set is served against it — retired vectors must
    vanish from every neighbor list immediately, with the runner-up
    live vector taking their rank. Queries whose own stored copy was
    retired (ids 3 and 8 here) still serve: the query vector comes
    from the caller, only the store side is tombstone-filtered. The
    oracle excludes the retired ids from the neighbor side of the
    probe join only."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(_QUERY_IDS))
    return SIM.lsh_index_topk(
        spark, _lsh_del_index_cached(spark, sf_dir), queries, k=5, emit_radius=2
    )


@query(
    "corpus_dedup_pipeline",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    fp AS (
      SELECT doc_id,
             md5(trim(REGEXP_REPLACE(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    exact_pairs AS (
      SELECT a.doc_id AS i, b.doc_id AS j
      FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    ),
    common AS (
      SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    near_pairs AS (
      SELECT i, j FROM (
        SELECT c.i, c.j,
               c.n_common / CAST(na.n_shingles + nb.n_shingles - c.n_common AS DOUBLE)
                 AS jac
        FROM common c
        JOIN sh_counts na ON na.doc_id = c.i
        JOIN sh_counts nb ON nb.doc_id = c.j
      ) t WHERE jac >= 0.9
    ),
    all_pairs AS (SELECT i, j FROM exact_pairs UNION SELECT i, j FROM near_pairs)
    SELECT d.doc_id, d.lang,
           d.doc_id NOT IN (SELECT j FROM all_pairs) AS survivor
    FROM documents d
    """,
)
def corpus_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed dedup pass: exact fingerprint pairs ∪ 3-gram Jaccard
    ≥ 0.9 pairs → greedy survivor rule (drop every greater id of a
    pair). The SQL-expressible greedy pass; cluster-correct resolution
    (connected components) is operators/graph.dedup_survivors, tested
    separately."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        ).alias("fingerprint"),
    )
    # the greedy rule drops j of every exact pair (i<j, same fp) — that
    # set is exactly "every doc that is not the min id of its
    # fingerprint group", so ONE narrow window pass replaces the
    # fingerprint self-join (r14: the join hashed the text twice and
    # shuffled the fp relation twice; guide §2.4 remove shuffles
    # outright). Value-identical by construction: j appears in some
    # pair iff an i<j shares its fingerprint iff j ≠ group min —
    # EXCEPT for NULL text: md5(NULL) is NULL, the join's equality
    # never matches NULL (every NULL-text doc survives) but a window
    # PARTITION BY groups all NULLs together; filter them out first.
    exact_dropped = (
        fp.filter(F.col("fingerprint").isNotNull())
        .withColumn(
            "_m", F.min("doc_id").over(W.partitionBy("fingerprint"))
        )
        .filter(F.col("doc_id") != F.col("_m"))
        .select(F.col("doc_id").alias("j"))
    )
    near_pairs = DD.jaccard_pairs(
        _shingles_cached(spark, sf_dir), threshold=0.9
    ).select("i", "j")
    dropped = (
        exact_dropped.unionByName(near_pairs.select("j"))
        .select(F.col("j").alias("_dropped"))
        .distinct()
    )
    return (
        # no broadcast hint: the dropped set scales with the duplicate
        # mass (unbounded at 100 TB) — AQE still broadcasts when small
        docs.join(dropped, docs.doc_id == F.col("_dropped"), "left")
        .select(
            "doc_id",
            "lang",
            F.col("_dropped").isNull().alias("survivor"),
        )
    )


@query(
    "corpus_dedup_staged",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(REGEXP_REPLACE(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint)
               AS exact_survivor
      FROM fp
    ),
    surv_docs AS (
      SELECT d.* FROM documents d
      JOIN ranked r ON r.doc_id = d.doc_id AND r.exact_survivor
    ),
    dtoks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM surv_docs
    ),
    sh0 AS (
      SELECT doc_id, toks, UNNEST(range(1, len(toks) - 1)) AS i
      FROM dtoks WHERE len(toks) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM sh0
    ),
    sh_counts AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    near_dropped AS (
      SELECT DISTINCT j FROM (
        SELECT c.j,
               c.n_common / CAST(na.n_shingles + nb.n_shingles - c.n_common AS DOUBLE)
                 AS jac
        FROM common c
        JOIN sh_counts na ON na.doc_id = c.i
        JOIN sh_counts nb ON nb.doc_id = c.j
      ) t WHERE jac >= 0.9
    )
    SELECT r.doc_id,
           CASE WHEN NOT r.exact_survivor THEN 'exact'
                WHEN r.doc_id IN (SELECT j FROM near_dropped) THEN 'near'
           END AS dropped_by,
           r.exact_survivor
             AND r.doc_id NOT IN (SELECT j FROM near_dropped) AS survivor
    FROM ranked r
    """,
)
def corpus_dedup_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STAGED dedup composition — the shape that survives 100 TB:
    exact fingerprint dedup first (cheapest, kills every identical
    copy with one hash groupBy), then the O(pairs) near-dup pass runs
    ONLY over exact survivors, so its inverted-index join never sees
    the duplicate mass that would square its candidate count (see
    NOTES.md: pair output grows with the square of duplicate
    multiplicity). Output: per-document survivor flag + which stage
    dropped it."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    # the exact-survivor window needs only (doc_id, fingerprint) — keep
    # the text payload OUT of its exchange (guide §2.3 "shuffle keys,
    # not payloads"), and materialize the narrow result once: it feeds
    # BOTH the near stage (survivor ids → shingle source) and the final
    # status projection, which otherwise each re-run the md5 pass and
    # the window exchange (r14)
    ranked = (
        docs.select("doc_id", fp.alias("fingerprint"))
        .withColumn(
            "exact_survivor",
            F.col("doc_id") == F.min("doc_id").over(W.partitionBy("fingerprint")),
        )
        .localCheckpoint(eager=False)
    )
    # survivor text never crosses a fingerprint exchange: re-scan the
    # table and semi-join on the (id-only) survivor set
    survivors = docs.select("doc_id", "text").join(
        ranked.filter(F.col("exact_survivor")).select("doc_id"), "doc_id", "semi"
    )
    near_dropped = (
        DD.jaccard_pairs(DD.shingles(survivors).localCheckpoint(), threshold=0.9)
        .select(F.col("j").alias("_nd"))
        .distinct()
    )
    return (
        ranked.join(
            # unhinted: near-dropped mass is corpus-dependent; AQE decides
            near_dropped, ranked.doc_id == F.col("_nd"), "left"
        )
        .select(
            "doc_id",
            F.when(~F.col("exact_survivor"), "exact")
            .when(F.col("_nd").isNotNull(), "near")
            .alias("dropped_by"),
            (F.col("exact_survivor") & F.col("_nd").isNull()).alias("survivor"),
        )
    )


# The IVF quantizer is a pure function of (corpus, k, iters); train it
# once per (session, sf_dir) and reuse across queries — the production
# shape (train offline, serve many queries). ivf_train already returns
# a k-row LOCAL relation, so the cached DataFrame costs nothing to hold.
_IVF_CENTROID_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def _ivf_centroids_cached(
    spark: SparkSession, sf_dir: str, k: int = 16
) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, k)
    df = _IVF_CENTROID_CACHE.get(key)
    if df is None:
        emb = load_table(spark, sf_dir, "embeddings")
        df = SIM.ivf_train(emb, k=k)
        for c in list(_IVF_CENTROID_CACHE):  # drop dead sessions' entries
            if c[0] != app_id:
                del _IVF_CENTROID_CACHE[c]
        _IVF_CENTROID_CACHE[key] = df
    return df


# The IVF quantizer is fully deterministic (id-ordered sample, shared
# numpy Lloyd in similarity.lloyd_centroids), so the oracle can train
# the SAME centroids from the parquet at compare time and embed them
# as DOUBLE[] literals — the _plane_weight literal-embedding pattern.
# Rendered per sf_dir (centroids are data-derived), memoized.
_IVF_ORACLE_CACHE: dict[str, str] = {}


def _centroid_literals(
    sf_dir: str, k: int = 16, where: str = "TRUE"
) -> str:
    """Render the deterministic k-means centroids for ``sf_dir``'s
    embeddings table (optionally a ``where``-filtered slice of it) as
    a DuckDB VALUES literal list ``(cid, cv)`` — shared by every
    clustering oracle (IVF ANN, semantic dedup)."""
    import duckdb
    import numpy as np

    con = duckdb.connect()
    src = f"read_parquet('{sf_dir}/embeddings.parquet')"
    (n,) = con.execute(
        f"SELECT count(*) FROM {src} WHERE embedding IS NOT NULL AND {where}"
    ).fetchone()
    if n > SIM.IVF_TRAIN_SAMPLE:
        # ivf_train's xxhash64-ordered sample is Spark-specific; the
        # driver/test corpora are all <= the sample size, where the
        # sample provably equals the whole table in id order.
        raise NotImplementedError(
            "literal-centroid oracle requires corpus <= train_sample"
        )
    rows = con.execute(
        f"SELECT embedding::DOUBLE[] FROM {src} "
        f"WHERE embedding IS NOT NULL AND {where} ORDER BY vec_id"
    ).fetchall()
    con.close()
    m = np.array([r[0] for r in rows], dtype=np.float64)
    cents = SIM.lloyd_centroids(m, k=k, iters=2)
    return ", ".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join(repr(float(x)) for x in c))
        for i, c in enumerate(cents)
    )


def _ivf_oracle(sf_dir: str) -> str:
    sql = _IVF_ORACLE_CACHE.get(sf_dir)
    if sql is not None:
        return sql
    lits = _centroid_literals(sf_dir, k=16)
    sql = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL),
    c AS (SELECT * FROM (VALUES {lits}) AS t(cid, cv)),
    assigned AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.cv) ASC, c.cid ASC) AS rn
        FROM e CROSS JOIN c) t WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
    probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY list_distance(q.qv, c.cv) ASC, c.cid ASC) AS rn
        FROM q CROSS JOIN c) t WHERE rn <= 2),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(p.qv, a.v), 6) AS cosine_sim
      FROM probes p JOIN assigned a USING (cid)
      WHERE a.vec_id <> p.query_id)
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM scored) t WHERE rn <= 5
    """
    _IVF_ORACLE_CACHE[sf_dir] = sql
    return sql


@query("embedding_ann_ivf_topk", oracle=_ivf_oracle)
def embedding_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via IVF inverted lists (nprobe=2 of 16 centroids).
    Oracle: the deterministic quantizer re-trained from the parquet at
    compare time, centroids embedded as SQL literals (_ivf_oracle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(
        emb, _QUERY_IDS, k=5, centroids=_ivf_centroids_cached(spark, sf_dir)
    )


# Persisted IVF index (built once per session, like the LSH index):
# the inverted lists live on disk partitioned by cid and the probe is
# partition pruning. Candidate sets match ivf_topk's (same quantizer,
# same probe rule; parity pinned by test_ivf_index_matches_in_session_ivf),
# so the SAME literal-centroid oracle pins both paths.
def _ivf_index_cached(spark: SparkSession, sf_dir: str) -> str:
    return _session_index(
        spark,
        sf_dir,
        "ivf",
        lambda p: SIM.write_ivf_index(
            load_table(spark, sf_dir, "embeddings"),
            p,
            centroids=_ivf_centroids_cached(spark, sf_dir),
        ),
    )


@query("embedding_ann_ivf_index_topk", oracle=_ivf_oracle)
def embedding_ann_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 served from the persisted IVF index: probe selection
    driver-side against the stored centroids, inverted-list scan via
    cid partition pruning, exact-cosine re-rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(_QUERY_IDS))
    return SIM.ivf_index_topk(
        spark, _ivf_index_cached(spark, sf_dir), queries, k=5, nprobe=2
    )


# SemDeDup (cluster → within-cluster cosine prune): same deterministic
# quantizer as IVF, so the same literal-centroid rendering pins the
# cluster assignment, and the keep/drop rule (lower-id cluster-mate
# with ROUND(cos,4) ≥ t) is exactly SQL-expressible.
# 0.30 picked against the synthetic fixtures: ~1% of within-cluster
# pairs qualify (191 dups at sf0.01) and the nearest ROUND(cos,4)
# value is ≥ 1e-4 from the threshold at sf0.001/0.01 (no cross-engine
# tie exposure; 0.35 sat exactly ON a rounded pair value).
_SEMANTIC_THRESHOLD = 0.30
_SEMANTIC_ORACLE_CACHE: dict = {}  # sf_dir or ("ivf", sf_dir) → SQL


def _semantic_dedup_oracle(sf_dir: str) -> str:
    sql = _SEMANTIC_ORACLE_CACHE.get(sf_dir)
    if sql is not None:
        return sql
    lits = _centroid_literals(sf_dir, k=16)
    sql = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM e),
    valid AS (SELECT vec_id, v FROM n WHERE v IS NOT NULL AND nrm > 0),
    c AS (SELECT * FROM (VALUES {lits}) AS t(cid, cv)),
    assigned AS (
      SELECT vec_id, v, cid FROM (
        SELECT valid.vec_id, valid.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY valid.vec_id
                 ORDER BY list_distance(valid.v, c.cv) ASC, c.cid ASC) AS rn
        FROM valid CROSS JOIN c) t WHERE rn = 1),
    m AS (
      SELECT a.vec_id, MIN(b.vec_id) AS matched_id
      FROM assigned a JOIN assigned b
        ON a.cid = b.cid AND b.vec_id < a.vec_id
       AND ROUND(list_cosine_similarity(a.v, b.v), 4) >= {_SEMANTIC_THRESHOLD}
      GROUP BY a.vec_id)
    SELECT n.vec_id,
      CAST(a.cid AS INTEGER) AS cid,
      CASE WHEN a.vec_id IS NULL THEN 'no_vector'
           WHEN m.matched_id IS NOT NULL THEN 'semantic_dup'
           ELSE 'kept' END AS status,
      CAST(m.matched_id AS BIGINT) AS matched_id
    FROM n LEFT JOIN assigned a USING (vec_id) LEFT JOIN m USING (vec_id)
    """
    _SEMANTIC_ORACLE_CACHE[sf_dir] = sql
    return sql


@query("embedding_semantic_dedup", oracle=_semantic_dedup_oracle)
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup: k-means cluster (shared IVF quantizer)
    then keep-lowest-id within-cluster cosine pruning at 0.30.
    Oracle: literal-centroid assignment + SQL re-statement of the
    keep/drop rule (_semantic_dedup_oracle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.semantic_dedup(
        emb,
        threshold=_SEMANTIC_THRESHOLD,
        centroids=_ivf_centroids_cached(spark, sf_dir),
    )


# Incremental SemDeDup: odd-id delta statused against the persisted
# even-id IVF index. The store's quantizer is trained on the EVEN
# slice (frozen at build), so the oracle renders centroids from that
# slice and re-assigns both sides by literal argmin.
def _ivf_even_index_cached(spark: SparkSession, sf_dir: str) -> str:
    return _session_index(
        spark,
        sf_dir,
        "ivf_even",
        lambda p: SIM.write_ivf_index(
            load_table(spark, sf_dir, "embeddings").filter(
                F.col("vec_id") % 2 == 0
            ),
            p,
        ),
    )


def _ivf_semantic_oracle(sf_dir: str) -> str:
    sql = _SEMANTIC_ORACLE_CACHE.get(("ivf", sf_dir))
    if sql is not None:
        return sql
    lits = _centroid_literals(sf_dir, k=16, where="vec_id % 2 = 0")
    sql = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM e),
    c AS (SELECT * FROM (VALUES {lits}) AS t(cid, cv)),
    store AS (
      SELECT vec_id, v, cid FROM (
        SELECT n.vec_id, n.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY list_distance(n.v, c.cv) ASC, c.cid ASC) AS rn
        FROM n CROSS JOIN c
        WHERE n.vec_id % 2 = 0 AND n.v IS NOT NULL AND n.nrm > 0
      ) t WHERE rn = 1),
    batch AS (
      SELECT vec_id, v, cid FROM (
        SELECT n.vec_id, n.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY list_distance(n.v, c.cv) ASC, c.cid ASC) AS rn
        FROM n CROSS JOIN c
        WHERE n.vec_id % 2 = 1 AND n.v IS NOT NULL AND n.nrm > 0
      ) t WHERE rn = 1),
    hits AS (
      SELECT vec_id, matched_id FROM (
        SELECT b.vec_id, s.vec_id AS matched_id,
               ROW_NUMBER() OVER (PARTITION BY b.vec_id
                 ORDER BY ROUND(list_cosine_similarity(b.v, s.v), 6) DESC,
                          s.vec_id ASC) AS rn
        FROM batch b JOIN store s USING (cid)
        WHERE ROUND(list_cosine_similarity(b.v, s.v), 6)
              >= {_SEMANTIC_THRESHOLD}
      ) t WHERE rn = 1)
    SELECT bb.vec_id,
      CASE WHEN h.matched_id IS NOT NULL THEN 'semantic_dup'
           WHEN bb.v IS NULL OR bb.nrm <= 0 OR isnan(bb.nrm)
             THEN 'no_vector'
           ELSE 'unique' END AS status,
      h.matched_id
    FROM (SELECT * FROM n WHERE vec_id % 2 = 1) bb
    LEFT JOIN hits h USING (vec_id)
    """
    _SEMANTIC_ORACLE_CACHE[("ivf", sf_dir)] = sql
    return sql


@query("embedding_ivf_semantic_dedup", oracle=_ivf_semantic_oracle)
def embedding_ivf_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup: the odd-id delta assigned to the
    persisted even-id IVF index's frozen quantizer and statused
    against its home inverted list only (semantic_dup / unique /
    no_vector). Oracle: literal centroids trained on the even slice
    + SQL re-statement of the within-cluster rule."""
    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    return SIM.ivf_semantic_dedup_status(
        spark,
        _ivf_even_index_cached(spark, sf_dir),
        batch,
        threshold=_SEMANTIC_THRESHOLD,
    )


@query(
    "embedding_knn_classify",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
             ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine_sim
      FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    topk AS (
      SELECT query_id, label FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
        FROM scored
      ) t WHERE rn <= 5
    ),
    votes AS (
      SELECT query_id, label, COUNT(*) AS votes
      FROM topk GROUP BY query_id, label
    )
    SELECT query_id, label AS predicted_label, votes FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY votes DESC, label ASC) AS rn
      FROM votes
    ) t WHERE rn = 1
    """,
)
def embedding_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification over the embedding corpus: majority label of
    the exact top-5 cosine neighbors per query vector, ties broken
    toward the smallest label. Composes the brute-force top-k (the
    oracle-checkable baseline); at scale the same vote runs over the
    IVF/LSH candidate sets."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    topk = SIM.brute_force_topk(emb, _QUERY_IDS, k=5)
    labeled = topk.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    )
    votes = labeled.groupBy("query_id", "label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )


# ---------------------------------------------------------------------------
# One-time session builds (for bench.py's build/serve split)
# ---------------------------------------------------------------------------
# Each entry materializes a session-cached artifact (a checkpointed
# DataFrame or an on-disk index) that multiple queries then serve
# from. bench.py times these separately as a ``builds`` map so the
# per-query serve timings reflect the steady-state shape a deployed
# pipeline runs (build amortized across days of deltas), not the
# one-time construction cost.
SESSION_BUILDS: dict = {
    "shingle_set": lambda spark, sf_dir: _shingles_cached(spark, sf_dir),
    "minhash_index": lambda spark, sf_dir: _mh_index_cached(spark, sf_dir),
    "minhash_del_index": lambda spark, sf_dir: _mh_del_index_cached(spark, sf_dir),
    "minhash_tt_index": lambda spark, sf_dir: _mh_tt_index_cached(spark, sf_dir),
    "minhash_mf_index": lambda spark, sf_dir: _mh_manifest_tt_index_cached(
        spark, sf_dir
    ),
    "line_df_store": lambda spark, sf_dir: _line_df_store_cached(spark, sf_dir),
    "line_df_del_store": lambda spark, sf_dir: _line_df_del_store_cached(
        spark, sf_dir
    ),
    "lsh_index": lambda spark, sf_dir: _lsh_index_cached(spark, sf_dir),
    "lsh_del_index": lambda spark, sf_dir: _lsh_del_index_cached(spark, sf_dir),
    "lsh_even_index": lambda spark, sf_dir: _emb_even_index_cached(spark, sf_dir),
    "ivf_centroids": lambda spark, sf_dir: _ivf_centroids_cached(spark, sf_dir),
    "ivf_index": lambda spark, sf_dir: _ivf_index_cached(spark, sf_dir),
    "ivf_even_index": lambda spark, sf_dir: _ivf_even_index_cached(spark, sf_dir),
    "pq_index": lambda spark, sf_dir: _pq_index_cached(spark, sf_dir),
    "ivfpq_index": lambda spark, sf_dir: _ivfpq_index_cached(spark, sf_dir),
    "minhash_vd_index": lambda spark, sf_dir: _mh_vd_index_cached(spark, sf_dir),
    "span_df_store": lambda spark, sf_dir: _span_df_store_cached(spark, sf_dir),
    "zorder_lineitem": lambda spark, sf_dir: __import__(
        "tiki_data_pipeline_spark.plans.extras_queries",
        fromlist=["_zorder_lineitem_cached"],
    )._zorder_lineitem_cached(spark, sf_dir),
}


@query(
    "doc_duplicate_span_stats",
    oracle=f"""
    WITH tokh AS (
      SELECT doc_id,
             list_transform(string_split_regex(lower(trim(text)), '\\s+'),
               t -> try_cast(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
                    & {DD._TOKEN_MASK}) AS hs
      FROM documents
    ),
    idx AS (
      SELECT doc_id, hs, UNNEST(range(1, len(hs) - 6)) AS i
      FROM tokh WHERE len(hs) >= 8
    ),
    wins AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i:i+7]),
               (a, b) -> (a * {DD.ROLLING_BASE} + b) % {DD.ROLLING_MOD})
               AS span_hash
      FROM idx
    ),
    dfq AS (
      SELECT span_hash, COUNT(DISTINCT doc_id) AS span_df
      FROM wins GROUP BY span_hash
    ),
    per AS (
      SELECT w.doc_id,
             COUNT(*) AS n_spans,
             CAST(SUM(CASE WHEN d.span_df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans
      FROM wins w JOIN dfq d USING (span_hash)
      GROUP BY w.doc_id
    )
    SELECT doc.doc_id,
           COALESCE(per.n_spans, 0) AS n_spans,
           COALESCE(per.n_dup_spans, 0) AS n_dup_spans,
           CASE WHEN COALESCE(per.n_spans, 0) = 0 THEN 0.0
                ELSE ROUND(per.n_dup_spans / per.n_spans, 4) END
             AS dup_span_frac
    FROM documents doc LEFT JOIN per USING (doc_id)
    """,
)
def doc_duplicate_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level (exact-substring) duplication report: per document,
    how many of its 8-token windows also occur verbatim in another
    document (rolling-hash window inventory, corpus-wide document
    frequency — the dedup signal of Lee et al. 2022 that
    document-level dedup misses when boilerplate is embedded in
    otherwise-distinct pages)."""
    return DD.duplicate_span_stats(load_table(spark, sf_dir, "documents"))


@query(
    "doc_span_removal",
    oracle=f"""
    WITH tokh AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS toks,
             list_transform(string_split_regex(lower(trim(text)), '\\s+'),
               t -> try_cast(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
                    & {DD._TOKEN_MASK}) AS hs
      FROM documents
    ),
    idx AS (
      SELECT doc_id, hs, UNNEST(range(1, len(hs) - 6)) AS i
      FROM tokh WHERE len(hs) >= 8
    ),
    wins AS (
      SELECT doc_id, i,
             list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i:i+7]),
               (a, b) -> (a * {DD.ROLLING_BASE} + b) % {DD.ROLLING_MOD})
               AS span_hash
      FROM idx
    ),
    dfq AS (
      SELECT span_hash FROM wins
      GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    covered AS (
      SELECT DISTINCT doc_id, p FROM (
        SELECT w.doc_id, UNNEST(range(w.i, w.i + 8)) AS p
        FROM wins w JOIN dfq d USING (span_hash)
      )
    ),
    tokpos AS (
      SELECT doc_id, UNNEST(toks) AS token,
             UNNEST(range(1, len(toks) + 1)) AS p
      FROM tokh
    )
    SELECT t.doc_id,
           COALESCE(string_agg(CASE WHEN c.p IS NULL THEN t.token END,
                               ' ' ORDER BY t.p), '') AS cleaned_text,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(c.p) AS BIGINT) AS n_tokens_removed,
           ROUND(COUNT(c.p) / COUNT(*), 4) AS removed_frac
    FROM tokpos t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
    GROUP BY t.doc_id
    """,
)
def doc_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup, the removal half (Lee et al. 2022): every
    token covered by an 8-token window occurring verbatim in ≥2
    documents is cut, and the cleaned text re-emitted with per-doc
    removed-token accounting. The inventory half is
    ``doc_duplicate_span_stats``; this is what a training pipeline
    actually applies to its corpus."""
    return DD.remove_duplicate_spans(load_table(spark, sf_dir, "documents"))


@query(
    "doc_span_removal_variable",
    oracle=f"""
    WITH tokh AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS toks,
             list_transform(string_split_regex(lower(trim(text)), '\\s+'),
               t -> try_cast(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
                    & {DD._TOKEN_MASK}) AS hs
      FROM documents
    ),
    idx AS (
      SELECT doc_id, hs, UNNEST(range(1, len(hs) - 6)) AS i
      FROM tokh WHERE len(hs) >= 8
    ),
    wins AS (
      SELECT doc_id, i,
             list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i:i+7]),
               (a, b) -> (a * {DD.ROLLING_BASE} + b) % {DD.ROLLING_MOD})
               AS span_hash
      FROM idx
    ),
    dfq AS (
      SELECT span_hash FROM wins
      GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    covered AS (
      SELECT DISTINCT doc_id, p FROM (
        SELECT w.doc_id, UNNEST(range(w.i, w.i + 8)) AS p
        FROM wins w JOIN dfq d USING (span_hash)
      )
    ),
    runs AS (
      SELECT doc_id, p,
             p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS g
      FROM covered
    ),
    kept_cov AS (
      SELECT doc_id, p FROM (
        SELECT doc_id, p,
               COUNT(*) OVER (PARTITION BY doc_id, g) AS run_len
        FROM runs)
      WHERE run_len >= 30
    ),
    tokpos AS (
      SELECT doc_id, UNNEST(toks) AS token,
             UNNEST(range(1, len(toks) + 1)) AS p
      FROM tokh
    )
    SELECT t.doc_id,
           COALESCE(string_agg(CASE WHEN c.p IS NULL THEN t.token END,
                               ' ' ORDER BY t.p), '') AS cleaned_text,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(c.p) AS BIGINT) AS n_tokens_removed,
           ROUND(COUNT(c.p) / COUNT(*), 4) AS removed_frac
    FROM tokpos t LEFT JOIN kept_cov c ON t.doc_id = c.doc_id AND t.p = c.p
    GROUP BY t.doc_id
    """,
)
def doc_span_removal_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length span removal (r9): adjacent duplicated 8-token
    windows merge into maximal runs (gaps-and-islands over covered
    positions) and only runs of >= 30 tokens are cut — the
    fixed-window approximation of deduplicate-text-datasets'
    length-thresholded substring removal. Long verbatim boilerplate
    goes; short incidental n-gram repeats (common phrases) stay."""
    return DD.remove_duplicate_spans(
        load_table(spark, sf_dir, "documents"), min_run=30
    )


def _line_dedup_oracle() -> str:
    from tiki_data_pipeline_spark import fixtures as FX

    return f"""
    WITH {FX.line_docs_cte()},
    unioned AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id, text FROM line_docs
    ),
    lns AS (
      SELECT doc_id,
             UNNEST(string_split(text, chr(10))) AS line,
             UNNEST(range(1, len(string_split(text, chr(10))) + 1)) AS p
      FROM unioned
    ),
    keyed AS (
      SELECT doc_id, p, line,
             CASE WHEN trim(line) <> '' THEN
               try_cast(('0x' || substring(md5('line:' || trim(line)), 1, 14))
                        AS BIGINT)
             END AS lh
      FROM lns
    ),
    dup AS (
      SELECT lh FROM keyed WHERE lh IS NOT NULL
      GROUP BY lh HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT k.doc_id,
           COALESCE(string_agg(CASE WHEN d.lh IS NULL THEN k.line END,
                               chr(10) ORDER BY k.p), '') AS cleaned_text,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(d.lh) AS BIGINT) AS n_lines_removed,
           ROUND(COUNT(d.lh) / COUNT(*), 4) AS removed_frac
    FROM keyed k LEFT JOIN dup d ON k.lh = d.lh
    GROUP BY k.doc_id
    """


@query("doc_line_dedup_removal", oracle=_line_dedup_oracle())
def doc_line_dedup_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line dedup, removal form (C4 / Gopher /
    RefinedWeb): lines whose trimmed text appears in ≥2 distinct
    documents are cut and the cleaned text re-emitted with per-doc
    line accounting. The synthetic corpus is single-line, so a
    multi-line boilerplate fixture set is unioned in on both sides
    (same VALUES); corpus docs whose whole text repeats verbatim are
    cut to empty — exact-dup removal falls out of line granularity."""
    from tiki_data_pipeline_spark import fixtures as FX

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return DD.remove_duplicate_lines(docs.unionByName(FX.line_docs_df(spark)))


def _line_df_store_cached(spark: SparkSession, sf_dir: str) -> str:
    """Persisted line-df store over the even-id corpus half plus the
    boilerplate-bearing line fixtures (9101/9102/9105) — the 'existing
    corpus' the incremental line-removal query decides against."""
    from tiki_data_pipeline_spark import fixtures as FX

    def build(p: str) -> None:
        docs = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", "text")
            .unionByName(
                FX.line_docs_df(spark).filter(F.col("doc_id").isin(9101, 9102, 9105))
            )
        )
        DD.write_line_df_store(docs, p)

    return _session_index(spark, sf_dir, "linedf", build)


def _incremental_line_oracle(
    store_pred: str = "doc_id % 2 = 0",
    store_fixture_ids: str = "9101, 9102, 9105",
) -> str:
    from tiki_data_pipeline_spark import fixtures as FX

    return f"""
    WITH {FX.line_docs_cte()},
    store AS (
      SELECT doc_id, text FROM documents WHERE {store_pred}
      UNION ALL
      SELECT doc_id, text FROM line_docs WHERE doc_id IN ({store_fixture_ids})
    ),
    batch AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id, text FROM line_docs WHERE doc_id IN (9103, 9104)
    ),
    keyed AS (
      SELECT side, doc_id, p, line,
             CASE WHEN trim(line) <> '' THEN
               try_cast(('0x' || substring(md5('line:' || trim(line)), 1, 14))
                        AS BIGINT)
             END AS lh
      FROM (
        SELECT 's' AS side, doc_id,
               UNNEST(string_split(text, chr(10))) AS line,
               UNNEST(range(1, len(string_split(text, chr(10))) + 1)) AS p
        FROM store
        UNION ALL
        SELECT 'b', doc_id,
               UNNEST(string_split(text, chr(10))),
               UNNEST(range(1, len(string_split(text, chr(10))) + 1))
        FROM batch
      )
    ),
    dup AS (
      SELECT lh FROM keyed WHERE lh IS NOT NULL
      GROUP BY lh
      HAVING COUNT(DISTINCT CASE WHEN side = 's' THEN doc_id END)
           + COUNT(DISTINCT CASE WHEN side = 'b' THEN doc_id END) >= 2
    )
    SELECT k.doc_id,
           COALESCE(string_agg(CASE WHEN d.lh IS NULL THEN k.line END,
                               chr(10) ORDER BY k.p), '') AS cleaned_text,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(d.lh) AS BIGINT) AS n_lines_removed,
           ROUND(COUNT(d.lh) / COUNT(*), 4) AS removed_frac
    FROM keyed k LEFT JOIN dup d ON k.lh = d.lh
    WHERE k.side = 'b'
    GROUP BY k.doc_id
    """


@query("doc_incremental_line_removal", oracle=_incremental_line_oracle())
def doc_incremental_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental boilerplate-line removal: the odd-id batch (plus
    two multi-line fixture docs) decided against the persisted
    line-df store of the even-id corpus half (plus the boilerplate
    fixtures) — corpus df and within-batch df both count toward the
    cut, so batch-born boilerplate is caught on arrival. The batch
    never re-reads corpus text; only the (lh, df) store."""
    from tiki_data_pipeline_spark import fixtures as FX

    batch = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
        .unionByName(
            FX.line_docs_df(spark).filter(F.col("doc_id").isin(9103, 9104))
        )
    )
    return DD.incremental_line_removal(
        spark, _line_df_store_cached(spark, sf_dir), batch
    )


def _line_df_del_store_cached(spark: SparkSession, sf_dir: str) -> str:
    """The incremental line-df store after deletions: the even-id
    corpus (plus boilerplate fixtures) ingested, then ids divisible by
    10 and fixtures 9101/9102 retired via ``delete_line_df_store``
    (negative count rows, NOT compacted) — exercises the merge-on-read
    decrement path."""
    import shutil

    from tiki_data_pipeline_spark import fixtures as FX

    def build(p: str) -> None:
        shutil.copytree(_line_df_store_cached(spark, sf_dir), p)
        docs = load_table(spark, sf_dir, "documents")
        fx = FX.line_docs_df(spark)
        DD.delete_line_df_store(
            docs.filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", "text")
            .unionByName(fx.filter(F.col("doc_id").isin(9101, 9102))),
            p,
        )

    return _session_index(spark, sf_dir, "linedfdel", build)


@query(
    "doc_deleted_line_removal",
    oracle=_incremental_line_oracle(
        store_pred="doc_id % 2 = 0 AND doc_id % 10 <> 0",
        store_fixture_ids="9105",
    ),
)
def doc_deleted_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-aware incremental line removal: after retiring every
    tenth corpus doc and both multi-line boilerplate fixtures from the
    line-df store (negative count deltas — the additive-counter twin
    of the tombstone sidecar), the standard batch is decided against
    the decremented counts. Lines whose document frequency fell below
    the threshold (e.g. the newsletter banner once its two store
    carriers are retired) flip from cut to kept — deletion visibly
    changes the decision, not just the bookkeeping. The oracle
    recomputes frequencies over the corpus minus the retired docs."""
    from tiki_data_pipeline_spark import fixtures as FX

    batch = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
        .unionByName(
            FX.line_docs_df(spark).filter(F.col("doc_id").isin(9103, 9104))
        )
    )
    return DD.incremental_line_removal(
        spark, _line_df_del_store_cached(spark, sf_dir), batch
    )


# ---------------------------------------------------------------------------
# Product quantization (ADC serving + refine)
# ---------------------------------------------------------------------------
# The PQ codebook is trained by the same deterministic id-ordered
# sample + numpy Lloyd as the IVF quantizer, so the oracle re-trains
# bit-identical per-subspace centroids at render time and embeds them
# as literals; assignment, the ADC sum and both rank cuts are then
# exactly SQL-expressible.
_PQ_ORACLE_CACHE: dict = {}


def _pq_trained(sf_dir: str):
    import duckdb
    import numpy as np

    key = ("cb", sf_dir)
    hit = _PQ_ORACLE_CACHE.get(key)
    if hit is not None:
        return hit
    con = duckdb.connect()
    src = f"read_parquet('{sf_dir}/embeddings.parquet')"
    (n,) = con.execute(
        f"SELECT count(*) FROM {src} WHERE embedding IS NOT NULL"
    ).fetchone()
    if n > SIM.IVF_TRAIN_SAMPLE:
        raise NotImplementedError(
            "literal-codebook oracle requires corpus <= train_sample"
        )
    rows = con.execute(
        f"SELECT embedding::DOUBLE[] FROM {src} "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    con.close()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat[nrm[:, 0] > 0] / nrm[nrm[:, 0] > 0]
    m, k = SIM.PQ_SUBSPACES, SIM.PQ_CODES
    dsub = mat.shape[1] // m
    cb = np.stack(
        [
            SIM.lloyd_centroids(mat[:, j * dsub : (j + 1) * dsub], k, iters=2)
            for j in range(m)
        ]
    )
    lits = ", ".join(
        "(%d, %d, [%s]::DOUBLE[])"
        % (j, c, ", ".join(repr(float(x)) for x in cb[j, c]))
        for j in range(cb.shape[0])
        for c in range(cb.shape[1])
    )
    _PQ_ORACLE_CACHE[key] = (lits, m, dsub)
    return _PQ_ORACLE_CACHE[key]


def _pq_common_sql(sf_dir: str) -> str:
    lits, m, dsub = _pq_trained(sf_dir)
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    return f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE embedding IS NOT NULL),
    n AS (SELECT vec_id, v,
                 list_transform(v, x -> x / sqrt(list_sum(
                   list_transform(v, y -> y * y)))) AS vn
          FROM e
          WHERE sqrt(list_sum(list_transform(v, y -> y * y))) > 0),
    cb AS (SELECT * FROM (VALUES {lits}) AS t(sub, cid, cv)),
    subs AS (SELECT vec_id, sub,
                    vn[sub * {dsub} + 1 : sub * {dsub} + {dsub}] AS sv
             FROM n CROSS JOIN range(0, {m}) r(sub)),
    codes AS (SELECT vec_id, sub, cid FROM (
        SELECT s.vec_id, s.sub, cb.cid,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                 ORDER BY list_distance(s.sv, cb.cv) ASC, cb.cid ASC) AS rn
        FROM subs s JOIN cb ON cb.sub = s.sub) t WHERE rn = 1),
    qs AS (SELECT vec_id AS query_id, sub, sv AS qsv FROM subs
           WHERE vec_id IN ({ids})),
    adc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             ROUND(1.0 - SUM(list_distance(q.qsv, cb.cv) ** 2) / 2.0, 4)
               AS adc_cosine
      FROM qs q
      JOIN codes c ON c.sub = q.sub AND c.vec_id <> q.query_id
      JOIN cb ON cb.sub = c.sub AND cb.cid = c.cid
      GROUP BY q.query_id, c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, adc_cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY adc_cosine DESC, neighbor_id ASC) AS rn
      FROM adc)
    """


def _pq_oracle(sf_dir: str) -> str:
    key = ("adc", sf_dir)
    if key not in _PQ_ORACLE_CACHE:
        _PQ_ORACLE_CACHE[key] = (
            "WITH " + _pq_common_sql(sf_dir)
            + "SELECT query_id, neighbor_id, adc_cosine FROM ranked WHERE rn <= 5"
        )
    return _PQ_ORACLE_CACHE[key]


def _pq_refined_oracle(sf_dir: str) -> str:
    key = ("ref", sf_dir)
    if key not in _PQ_ORACLE_CACHE:
        _PQ_ORACLE_CACHE[key] = (
            "WITH " + _pq_common_sql(sf_dir)
            + """, short AS (
      SELECT query_id, neighbor_id FROM ranked WHERE rn <= 64),
    ex AS (
      SELECT s.query_id, s.neighbor_id,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
      FROM short s
      JOIN n a ON a.vec_id = s.query_id
      JOIN n b ON b.vec_id = s.neighbor_id)
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn2 FROM ex) t
    WHERE rn2 <= 5"""
        )
    return _PQ_ORACLE_CACHE[key]


def _pq_index_cached(spark: SparkSession, sf_dir: str) -> str:
    return _session_index(
        spark,
        sf_dir,
        "pq",
        lambda p: SIM.write_pq_index(load_table(spark, sf_dir, "embeddings"), p),
    )


@query("embedding_pq_adc_topk", oracle=_pq_oracle)
def embedding_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 by pure asymmetric distance computation against the
    persisted PQ index (16 subspaces × 64 codes = 16 bytes/vector):
    the serve pass reads ONLY code rows, never float vectors. Oracle:
    literal re-trained codebook + SQL assignment/ADC/rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(_QUERY_IDS))
    return SIM.pq_index_topk(spark, _pq_index_cached(spark, sf_dir), queries, k=5)


@query("embedding_pq_refined_topk", oracle=_pq_refined_oracle)
def embedding_pq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production PQ pipeline: ADC shortlist of 64 per query from
    the codes scan, then exact cosine re-rank of only those candidates
    (recall@5 = 1.0 on this corpus vs brute force). Exact-contract
    output columns (cosine_sim rounded 6)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(_QUERY_IDS))
    return SIM.pq_index_topk(
        spark,
        _pq_index_cached(spark, sf_dir),
        queries,
        k=5,
        refine_with=emb,
        shortlist=64,  # pinned: the oracle's rank cut, SF-stable
    )


def _ivfpq_oracle(sf_dir: str) -> str:
    """IVF-PQ refined serve, fully SQL-pinned: IVF probe selection
    (literal coarse centroids, nprobe=2), candidate restriction to
    vectors ASSIGNED to a probed list (literal assignment), ADC over
    the PQ codes (literal codebook), shortlist-64 cut, exact-cosine
    re-rank. Both quantizers are deterministic, so the oracle
    re-trains them bit-identically at render time."""
    key = ("ivfpq", sf_dir)
    if key in _PQ_ORACLE_CACHE:
        return _PQ_ORACLE_CACHE[key]
    pq_lits, m, dsub = _pq_trained(sf_dir)
    ivf_lits = _centroid_literals(sf_dir, k=16)
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    sql = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL),
    n AS (SELECT vec_id, v,
                 list_transform(v, x -> x / sqrt(list_sum(
                   list_transform(v, y -> y * y)))) AS vn
          FROM e
          WHERE sqrt(list_sum(list_transform(v, y -> y * y))) > 0),
    ivfc AS (SELECT * FROM (VALUES {ivf_lits}) AS t(cid, cv)),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, ivfc.cid,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY list_distance(n.v, ivfc.cv) ASC, ivfc.cid ASC) AS rn
        FROM n CROSS JOIN ivfc) t WHERE rn = 1),
    probes AS (
      SELECT query_id, cid FROM (
        SELECT n.vec_id AS query_id, ivfc.cid,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY list_distance(n.v, ivfc.cv) ASC, ivfc.cid ASC) AS rn
        FROM n CROSS JOIN ivfc WHERE n.vec_id IN ({ids})) t
      WHERE rn <= 2),
    cb AS (SELECT * FROM (VALUES {pq_lits}) AS t(sub, pcid, cv)),
    subs AS (SELECT vec_id, sub,
                    vn[sub * {dsub} + 1 : sub * {dsub} + {dsub}] AS sv
             FROM n CROSS JOIN range(0, {m}) r(sub)),
    codes AS (SELECT vec_id, sub, pcid FROM (
        SELECT s.vec_id, s.sub, cb.pcid,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                 ORDER BY list_distance(s.sv, cb.cv) ASC, cb.pcid ASC) AS rn
        FROM subs s JOIN cb ON cb.sub = s.sub) t WHERE rn = 1),
    qs AS (SELECT vec_id AS query_id, sub, sv AS qsv FROM subs
           WHERE vec_id IN ({ids})),
    adc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             ROUND(1.0 - SUM(list_distance(q.qsv, cb.cv) ** 2) / 2.0, 4)
               AS adc_cosine
      FROM qs q
      JOIN codes c ON c.sub = q.sub AND c.vec_id <> q.query_id
      JOIN assigned a ON a.vec_id = c.vec_id
      JOIN probes p ON p.query_id = q.query_id AND p.cid = a.cid
      JOIN cb ON cb.sub = c.sub AND cb.pcid = c.pcid
      GROUP BY q.query_id, c.vec_id),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY adc_cosine DESC, neighbor_id ASC) AS rn
        FROM adc) t WHERE rn <= 64),
    ex AS (
      SELECT s.query_id, s.neighbor_id,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
      FROM short s
      JOIN n a ON a.vec_id = s.query_id
      JOIN n b ON b.vec_id = s.neighbor_id)
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn2 FROM ex) t
    WHERE rn2 <= 5
    """
    _PQ_ORACLE_CACHE[key] = sql
    return sql


def _ivfpq_index_cached(spark: SparkSession, sf_dir: str) -> str:
    def build(p: str) -> None:
        emb = load_table(spark, sf_dir, "embeddings")
        SIM.write_ivfpq_index(
            emb,
            p,
            n_centroids=16,
            centroids=_ivf_centroids_cached(spark, sf_dir),
        )

    return _session_index(spark, sf_dir, "ivfpq", build)


@query("embedding_ivfpq_refined_topk", oracle=_ivfpq_oracle)
def embedding_ivfpq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed 100 TB ANN serve: IVF probe (nprobe=2 of 16
    lists = partition pruning) × PQ codes (16 B/vector ADC scan) ×
    exact refine of the shortlist. BOTH quantizers re-trained
    bit-identically by the oracle and every stage SQL-pinned —
    probe selection, assignment, ADC scores, both rank cuts."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(_QUERY_IDS))
    return SIM.ivfpq_index_topk(
        spark,
        _ivfpq_index_cached(spark, sf_dir),
        queries,
        k=5,
        nprobe=2,
        refine_with=emb,
        shortlist=64,  # pinned: the oracle's rank cut, SF-stable
    )


# ---------------------------------------------------------------------------
# Incremental span removal against the persisted span-df store (r13)
# ---------------------------------------------------------------------------


def _span_df_store_cached(spark: SparkSession, sf_dir: str) -> str:
    """Persisted span-df store over the even-id corpus half — the
    'already-ingested corpus' the incremental span-removal query
    decides against (span=8, md5 token hashes: the oracle computes
    identical window identities)."""

    def build(p: str) -> None:
        DD.write_span_df_store(
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", "text"),
            p,
            span=8,
        )

    return _session_index(spark, sf_dir, "spandf", build)


_INCREMENTAL_SPAN_ORACLE = f"""
    WITH sides AS (
      SELECT 's' AS side, doc_id, text FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 'b', doc_id, text FROM documents WHERE doc_id % 2 = 1
    ),
    tokh AS (
      SELECT side, doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS toks,
             list_transform(string_split_regex(lower(trim(text)), '\\s+'),
               t -> try_cast(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
                    & {DD._TOKEN_MASK}) AS hs
      FROM sides
    ),
    idx AS (
      SELECT side, doc_id, hs, UNNEST(range(1, len(hs) - 6)) AS i
      FROM tokh WHERE len(hs) >= 8
    ),
    wins AS (
      SELECT side, doc_id, i,
             list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i:i+7]),
               (a, b) -> (a * {DD.ROLLING_BASE} + b) % {DD.ROLLING_MOD})
               AS span_hash
      FROM idx
    ),
    dfq AS (
      -- store df (distinct even-half docs) + within-batch df
      -- (distinct odd-half docs) >= 2, exactly the operator's
      -- corpus-plus-batch evidence rule
      SELECT span_hash FROM wins
      GROUP BY span_hash
      HAVING COUNT(DISTINCT CASE WHEN side = 's' THEN doc_id END)
           + COUNT(DISTINCT CASE WHEN side = 'b' THEN doc_id END) >= 2
    ),
    covered AS (
      SELECT DISTINCT doc_id, p FROM (
        SELECT w.doc_id, UNNEST(range(w.i, w.i + 8)) AS p
        FROM wins w JOIN dfq d USING (span_hash)
        WHERE w.side = 'b'
      )
    ),
    tokpos AS (
      SELECT doc_id, UNNEST(toks) AS token,
             UNNEST(range(1, len(toks) + 1)) AS p
      FROM tokh WHERE side = 'b'
    )
    SELECT t.doc_id,
           COALESCE(string_agg(CASE WHEN c.p IS NULL THEN t.token END,
                               ' ' ORDER BY t.p), '') AS cleaned_text,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(c.p) AS BIGINT) AS n_tokens_removed,
           ROUND(COUNT(c.p) / COUNT(*), 4) AS removed_frac
    FROM tokpos t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
    GROUP BY t.doc_id
    """


@query("doc_incremental_span_removal", oracle=_INCREMENTAL_SPAN_ORACLE)
def doc_incremental_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental span-level dedup (r13 — the span family's store
    form, completing the incremental symmetry with the minhash / LSH /
    IVF / line-df families): the odd-id batch is decided against the
    persisted span-df store of the even-id corpus half. A window is
    cut when its corpus df plus within-batch df reaches 2 — the batch
    never re-reads corpus text, only the (h, df) store
    (~16 B/distinct window at 100 TB). Window geometry (span=8, md5
    token hashes) pins in the store meta; the oracle recomputes both
    halves' window identities from scratch."""
    batch = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
    )
    return DD.incremental_span_removal(
        spark, _span_df_store_cached(spark, sf_dir), batch
    )
