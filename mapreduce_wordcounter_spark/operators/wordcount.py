"""The flagship word-count operator family.

Semantics (normative spec, SURVEY.md Appendix A; reference
main.go:115-171): a token is a maximal run of Unicode letters
(reference ``strings.FieldsFunc(chunk, !unicode.IsLetter)``,
main.go:141-144), lowercased (main.go:148), empty tokens dropped
(main.go:149); the result relation is (word, cnt) and the program's
scalar output is the distinct vocabulary size (main.go:73).

Spark-first mapping (SURVEY.md §2.3): ``explode(split(lower(text),
'[^\\p{L}]+'))`` → ``filter(word <> '')`` → ``groupBy(word).count()``.
The map-side partial aggregate / shuffle / final merge the reference
hand-builds (main.go:84-111) are Catalyst's partial+final
HashAggregateExec — free, lock-free, and hash-partitioned (strictly
better than the reference's single mutex-guarded map, main.go:191-193).

Scale posture (100 TB): the whole family is scan → generate → partial
agg → exchange on `word` → final agg. Vocabulary is sublinear in corpus
size (Heaps' law), so the shuffle carries only the per-partition
partial (word, cnt) pairs, not the token stream; the only skew risk is
Zipfian hot words, which the partial aggregate absorbs before the
exchange. For vocabulary cardinality at scale prefer
``approx_count_distinct`` (registered as wc_vocab_approx, rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.registry import query
from mapreduce_wordcounter_spark.tables import load_table

# Separator = any non-letter, exactly `!unicode.IsLetter` (main.go:143).
# Java regex and DuckDB's RE2 both implement the Unicode L* class.
TOKEN_SEP = r"[^\p{L}]+"

# DuckDB-side tokenizer fragment for the oracles (same regex dialect).
_ORACLE_TOKENS = (
    "SELECT doc_id, lang, source, "
    "unnest(regexp_split_to_array(lower(text), '[^\\p{L}]+')) AS word "
    "FROM documents"
)


def tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one row per token: (doc_id, lang, source, word).

    The shared front half of every query in this family; Catalyst prunes
    unused columns per consumer.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.explode(F.split(F.lower(F.col("text")), TOKEN_SEP)).alias("word"),
        )
        .filter(F.col("word") != "")
    )


@query(
    "wc_counts",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM ({_ORACLE_TOKENS}) t
    WHERE word <> ''
    GROUP BY word
    """,
)
def wc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's materialized intermediate: word → count
    (main.go:84-111, O4-O9)."""
    return tokens(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))


@query(
    "wc_vocab",
    oracle=f"""
    SELECT COUNT(DISTINCT word) AS vocab_size
    FROM ({_ORACLE_TOKENS}) t
    WHERE word <> ''
    """,
)
def wc_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's actual printed output: distinct vocabulary size
    (len(finalResult), main.go:73, O11)."""
    return tokens(spark, sf_dir).agg(F.countDistinct("word").alias("vocab_size"))


@query(
    "wc_summary",
    oracle=f"""
    SELECT COUNT(*) AS total_tokens, COUNT(DISTINCT word) AS vocab_size
    FROM ({_ORACLE_TOKENS}) t
    WHERE word <> ''
    """,
)
def wc_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total token count + distinct vocabulary in one pass."""
    return tokens(spark, sf_dir).agg(
        F.count("*").alias("total_tokens"),
        F.countDistinct("word").alias("vocab_size"),
    )


@query(
    "wc_top100",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM ({_ORACLE_TOKENS}) t
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word ASC
    LIMIT 100
    """,
)
def wc_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k words. Sort/limit the reference lacks (SURVEY.md §2.2);
    tie-broken on word so the LIMIT frontier is deterministic across
    engines. Physically a TakeOrderedAndProject — no global sort."""
    return (
        tokens(spark, sf_dir)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(100)
    )


@query(
    "wc_per_source",
    oracle=f"""
    SELECT source, word, COUNT(*) AS cnt
    FROM ({_ORACLE_TOKENS}) t
    WHERE word <> ''
    GROUP BY source, word
    """,
)
def wc_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source counts — the reference's per-file partial maps
    (main.go:126) promoted to a first-class grouping column."""
    return (
        tokens(spark, sf_dir)
        .groupBy("source", "word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "wc_doc_frequency",
    oracle=f"""
    SELECT word, COUNT(DISTINCT doc_id) AS df
    FROM ({_ORACLE_TOKENS}) t
    WHERE word <> ''
    GROUP BY word
    """,
)
def wc_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency: in how many documents does each word occur."""
    return (
        tokens(spark, sf_dir)
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
    )


@query(
    "wc_vocab_per_lang",
    oracle=f"""
    SELECT lang, COUNT(DISTINCT word) AS vocab_size
    FROM ({_ORACLE_TOKENS}) t
    WHERE word <> ''
    GROUP BY lang
    """,
)
def wc_vocab_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct vocabulary per language."""
    return (
        tokens(spark, sf_dir)
        .groupBy("lang")
        .agg(F.countDistinct("word").alias("vocab_size"))
    )


@query(
    "wc_rdd_twin",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM ({_ORACLE_TOKENS}) t
    WHERE word <> ''
    GROUP BY word
    """,
)
def wc_rdd_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDD flatMap/reduceByKey twin of wc_counts — the *literal*
    semantic mirror of the reference's map (main.go:115-171, partial
    combine main.go:126,150) / shuffle (main.go:86) / reduce
    (main.go:185-197) structure, kept as a cross-check (SURVEY.md §1.3).
    reduceByKey does map-side combining exactly like the reference's
    per-file maps, then hash-partitions — no global mutex needed.

    Python `re` has no \\p{{L}}, so the flatMap splits on the
    Unicode-aware `str.isalpha` boundary to match `unicode.IsLetter`.
    """
    import operator

    docs = load_table(spark, sf_dir, "documents").select("text")

    def tokenize(row):
        word_chars: list[str] = []
        for ch in row.text:
            if ch.isalpha():
                word_chars.append(ch.lower())
            elif word_chars:
                yield ("".join(word_chars), 1)
                word_chars = []
        if word_chars:
            yield ("".join(word_chars), 1)

    counts = docs.rdd.flatMap(tokenize).reduceByKey(operator.add)
    return spark.createDataFrame(counts, schema="word string, cnt long")


@query(
    "wc_vocab_approx",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS vocab_exact,
           TRUE AS approx_within_5pct
    FROM ({_ORACLE_TOKENS}) t
    WHERE word <> ''
    """,
)
def wc_vocab_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate vocabulary (HyperLogLog++) — the 100 TB-scale form
    of wc_vocab — under a SEMI-ORACLE (VERDICT r11 #6): the estimate
    itself is engine-specific (never hash-comparable), so the query
    emits the exact distinct count (hash-checked against DuckDB's) and
    the estimator's statistical contract AS A BOOLEAN — relative error
    within 5% (= 5σ of the configured rsd=0.01). A drifting estimator
    flips the boolean and fails the external hash, not just the local
    pytest (tests/test_estimators.py keeps the raw-value bound)."""
    return (
        tokens(spark, sf_dir)
        .agg(
            F.countDistinct("word").alias("vocab_exact"),
            F.approx_count_distinct("word", 0.01).alias("est"),
        )
        .select(
            F.col("vocab_exact").cast("bigint").alias("vocab_exact"),
            (
                F.abs(F.col("est") - F.col("vocab_exact"))
                <= 0.05 * F.col("vocab_exact")
            ).alias("approx_within_5pct"),
        )
    )


@query(
    "wc_vocab_hll_merge",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS vocab_exact,
           TRUE AS hll_within_3pct
    FROM ({_ORACLE_TOKENS}) t
    WHERE word <> ''
    """,
)
def wc_vocab_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch vocabulary: one Datasketches HLL sketch per
    source partition-key, unioned into the corpus estimate.

    This is the 100 TB pattern approx_count_distinct can't express:
    the PER-SOURCE sketches are themselves storable (binary column →
    parquet), so tomorrow's corpus can merge yesterday's sketches
    instead of rescanning yesterday's tokens — incremental cardinality
    at petabyte scale. Semi-oracled (VERDICT r11 #6): the exact
    vocabulary is hash-checked and the lgK=14 union estimate's 3%
    contract (~0.8% rse, 4σ headroom) rides as a boolean; pytest keeps
    the raw error bound plus merge-consistency vs the single-pass
    sketch."""
    t = tokens(spark, sf_dir)
    per_source = t.groupBy("source").agg(
        F.hll_sketch_agg("word", F.lit(14)).alias("sketch")
    )
    est = per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    )
    exact = t.agg(F.countDistinct("word").cast("bigint").alias("vocab_exact"))
    # 1-row × 1-row join: bounded BNLJ, declared in test_plan_hygiene
    return exact.crossJoin(est).select(
        "vocab_exact",
        (
            F.abs(F.col("est") - F.col("vocab_exact"))
            <= 0.03 * F.col("vocab_exact")
        ).alias("hll_within_3pct"),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry() body: the full (word, cnt) relation, ordered for
    deterministic display (Appendix B.2 — the reference's output is
    unordered only because Go map iteration is)."""
    return wc_counts(spark, sf_dir).orderBy(F.desc("cnt"), F.asc("word"))


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------
#
# The mergeable frequency summary the HLL vocabulary sketches
# (wc_vocab_hll_merge) are not: a count-min sketch answers "how often
# does word w occur" from d×w fixed counters regardless of vocabulary
# size. At 100 TB the sketch is built STREAMING from the token
# relation — a 4-row per-token fan-out into a groupBy over exactly
# _CMS_D × _CMS_W keys, map-side combined to constant state per task,
# no vocabulary-cardinality shuffle anywhere; per-source sketches add
# by bucket (sketch merge = vector sum), which is what makes it the
# incremental/streaming path. Here the fan-out runs over the already-
# aggregated (word, cnt) relation — numerically identical, one corpus
# scan cheaper.
#
# Unlike library sketches, the hash rows are the engine-portable md5
# construction (row j hashes 'j:word'), so the WHOLE sketch is
# deterministic and the query is DuckDB-oracle-checked EXACTLY — plus
# the classic invariants (estimate never undercounts; overcount
# bounded by N/_CMS_W per row) are pinned in tests/test_estimators.py.
# The audit joins the sketch against the exact top-_CMS_TOPK words so
# the overcount is visible per heavy hitter.

_CMS_D = 4  # hash rows
_CMS_W = 1024  # buckets per row
_CMS_TOPK = 50

_SPARK_MD5H = "cast(conv(substring(md5({s}), 1, 15), 16, 10) as bigint)"
_DUCK_MD5H = "CAST(('0x' || substring(md5({s}), 1, 15)) AS BIGINT)"


@query(
    "wc_cms_heavy_hitters",
    oracle=f"""
    WITH wc AS (
        SELECT word, COUNT(*) AS n
        FROM ({_ORACLE_TOKENS}) t WHERE word <> '' GROUP BY word),
    wj AS (
        SELECT word, n, j,
               ({_DUCK_MD5H.format(s="CAST(j AS VARCHAR) || ':' || word")})
                   % {_CMS_W} AS bucket
        FROM wc, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j) rows),
    sk AS (
        SELECT j, bucket, CAST(SUM(n) AS BIGINT) AS bucket_count
        FROM wj GROUP BY j, bucket),
    top AS (
        SELECT word, n FROM (
            SELECT word, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rn
            FROM wc) r
        WHERE rn <= {_CMS_TOPK})
    SELECT t.word,
           CAST(t.n AS BIGINT) AS n_exact,
           CAST(MIN(sk.bucket_count) AS BIGINT) AS est_cms,
           CAST(MIN(sk.bucket_count) - t.n AS BIGINT) AS overcount
    FROM top t
    JOIN wj ON t.word = wj.word
    JOIN sk ON wj.j = sk.j AND wj.bucket = sk.bucket
    GROUP BY t.word, t.n
    """,
)
def wc_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch audit for the exact top-{_CMS_TOPK} words:
    exact count, sketch estimate (min over the {_CMS_D} hash rows of
    the bucket sums), and the overcount the bucket collisions added.
    Deterministic md5 hash rows make the sketch itself engine-exact.

    The vocabulary-count relation is PINNED: the sketch build and the
    exact top-k are two consumers, and unpinned each replays the full
    tokenize pass over the corpus (the relation itself is vocab-sized
    (string, int64) — the cheap kind of cache)."""
    from mapreduce_wordcounter_spark.session import pin

    # The pinned plan carries a marker literal: canonicalization erases
    # alias names, so a bare tokens().groupBy(word).count() aggregate is
    # sameResult-identical to wc_counts' — the shared CacheManager would
    # silently substitute this cache into wc_counts' executed plan in
    # any session where this query built first (extra InMemoryRelation
    # exchange; r12 red suite). The Project(word, n, 1) root cannot
    # match any served query's subtree; consumers below simply never
    # reference the marker.
    wc = pin(
        tokens(spark, sf_dir)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .select("word", "n", F.lit(1).alias("_cms_pin"))
    )
    js = F.array([F.lit(j) for j in range(_CMS_D)])
    bucket = (
        F.expr(_SPARK_MD5H.format(s="concat(cast(j as string), ':', word)"))
        % _CMS_W
    )
    sk = (
        wc.select("word", "n", F.explode(js).alias("j"))
        .withColumn("bucket", bucket)
        .groupBy("j", "bucket")
        .agg(F.sum("n").alias("bucket_count"))
    )
    # Total order (n desc, word) + limit: TakeOrderedAndProject, the
    # distributed top-k — no single-partition global window. Probe-side
    # bucket hashes are computed AFTER the top-k cut: the former shared
    # wj relation fed both the sketch AND the join probe, so the _CMS_D
    # md5 fan-out ran over the whole vocabulary twice (Catalyst does
    # not dedupe the subtree) and the probe rows were immediately cut
    # to _CMS_TOPK by the join — guide §1.2: don't compute what you
    # throw away.
    top = (
        wc.orderBy(F.desc("n"), F.asc("word"))
        .limit(_CMS_TOPK)
        .select("word", F.col("n").alias("n_exact"))
    )
    wj = top.select(
        "word", "n_exact", F.explode(js).alias("j")
    ).withColumn("bucket", bucket)
    return (
        wj
        .join(F.broadcast(sk), ["j", "bucket"])
        .groupBy("word", "n_exact")
        .agg(
            F.min("bucket_count").cast("long").alias("est_cms"),
            (F.min("bucket_count") - F.first("n_exact")).cast("long").alias(
                "overcount"
            ),
        )
        .select("word", F.col("n_exact").cast("long").alias("n_exact"),
                "est_cms", "overcount")
    )


@query(
    "theta_vocab_ops",
    oracle=f"""
    WITH w AS (
        SELECT word,
               MAX(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS in_en,
               MAX(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS in_zh
        FROM ({_ORACLE_TOKENS}) t
        WHERE word <> '' AND lang IN ('en', 'zh')
        GROUP BY word)
    SELECT CAST(SUM(in_en) AS BIGINT) AS exact_en,
           CAST(SUM(in_zh) AS BIGINT) AS exact_zh,
           CAST(COUNT(*) AS BIGINT) AS exact_union,
           CAST(SUM(in_en * in_zh) AS BIGINT) AS exact_intersection,
           CAST(SUM(in_en * (1 - in_zh)) AS BIGINT) AS exact_en_minus_zh,
           TRUE AS ok_union, TRUE AS ok_intersection, TRUE AS ok_en,
           TRUE AS ok_zh, TRUE AS ok_en_minus_zh
    FROM w
    """,
)
def theta_vocab_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over per-language vocabularies: the
    mergeable way to answer "how many distinct words do en and zh
    share / not share" WITHOUT re-scanning either corpus — per-slice
    sketches are built once (map-side, fixed KB of state) and
    union/intersect/difference in constant time. Semi-oracled (VERDICT
    r11 #6): the exact distinct counts (one word-grain membership agg,
    hash-checked against DuckDB) ride with one boolean per estimate —
    each theta estimate within max(1, 5%) of its exact count (k=4096
    default → ~1.6% rse). A drifting sketch fails the external hash."""
    t = tokens(spark, sf_dir).filter(F.col("lang").isin("en", "zh"))
    sk = t.groupBy("lang").agg(F.theta_sketch_agg("word").alias("sk"))
    # Pivot the two per-lang sketches into ONE row via conditional
    # first() aggregates — no 1-row cross join needed — then do all
    # the set algebra in a single projection.
    one = sk.agg(
        F.theta_union_agg("sk").alias("sk_union"),
        F.theta_intersection_agg("sk").alias("sk_inter"),
        F.first(F.when(F.col("lang") == "en", F.col("sk")), ignorenulls=True)
        .alias("sk_en"),
        F.first(F.when(F.col("lang") == "zh", F.col("sk")), ignorenulls=True)
        .alias("sk_zh"),
    ).select(
        F.theta_sketch_estimate("sk_union").alias("est_union"),
        F.theta_sketch_estimate("sk_inter").alias("est_intersection"),
        F.theta_sketch_estimate("sk_en").alias("est_en"),
        F.theta_sketch_estimate("sk_zh").alias("est_zh"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk_en"), F.col("sk_zh"))
        ).alias("est_en_minus_zh"),
    )
    # exact references: one membership-flag agg at word grain
    w = t.groupBy("word").agg(
        F.max((F.col("lang") == "en").cast("int")).alias("in_en"),
        F.max((F.col("lang") == "zh").cast("int")).alias("in_zh"),
    )
    exact = w.agg(
        F.sum("in_en").cast("bigint").alias("exact_en"),
        F.sum("in_zh").cast("bigint").alias("exact_zh"),
        F.count("*").cast("bigint").alias("exact_union"),
        F.sum(F.col("in_en") * F.col("in_zh")).cast("bigint").alias(
            "exact_intersection"
        ),
        F.sum(F.col("in_en") * (1 - F.col("in_zh"))).cast("bigint").alias(
            "exact_en_minus_zh"
        ),
    )

    def ok(est_col: str, exact_col: str) -> object:
        return (
            F.abs(F.col(est_col) - F.col(exact_col))
            <= F.greatest(F.lit(1.0), 0.05 * F.col(exact_col))
        )

    # 1-row × 1-row join: bounded BNLJ, declared in test_plan_hygiene
    return exact.crossJoin(one).select(
        "exact_en", "exact_zh", "exact_union", "exact_intersection",
        "exact_en_minus_zh",
        ok("est_union", "exact_union").alias("ok_union"),
        ok("est_intersection", "exact_intersection").alias("ok_intersection"),
        ok("est_en", "exact_en").alias("ok_en"),
        ok("est_zh", "exact_zh").alias("ok_zh"),
        ok("est_en_minus_zh", "exact_en_minus_zh").alias("ok_en_minus_zh"),
    )


@query(
    "value_quantiles_kll",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
    FROM events
    """,
)
def value_quantiles_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketch over events.value, built as per-event-type
    partial sketches MERGED into one — the mergeable/streaming path to
    quantiles (percentile_approx re-aggregates raw values; KLL
    partials are fixed-size and add, so per-day/per-source sketches
    roll up for free). Semi-oracled (VERDICT r11 #6): the sketch's n
    is hash-checked against COUNT(*) and each quantile estimate's RANK
    contract rides as a boolean — the estimated value must sit between
    the exact interpolated percentiles at p±0.03 (default k=200 →
    ~1.65% normalized rank error at 99% confidence; 0.03 is the
    driver-gate headroom, pytest keeps the tighter 0.02 bracket)."""
    e = load_table(spark, sf_dir, "events")
    partials = e.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    merged = partials.agg(F.kll_merge_agg_double("sk").alias("msk"))
    ests = merged.select(
        F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(0.9)).alias("p90"),
        F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(0.99)).alias("p99"),
        F.kll_sketch_get_n_double(F.col("msk")).alias("n"),
    )
    brackets = e.agg(
        F.expr("percentile(value, 0.47)").alias("lo50"),
        F.expr("percentile(value, 0.53)").alias("hi50"),
        F.expr("percentile(value, 0.87)").alias("lo90"),
        F.expr("percentile(value, 0.93)").alias("hi90"),
        F.expr("percentile(value, 0.96)").alias("lo99"),
        F.expr("percentile(value, 1.0)").alias("hi99"),
    )
    # 1-row × 1-row join: bounded BNLJ, declared in test_plan_hygiene
    return ests.crossJoin(brackets).select(
        F.col("n").cast("bigint").alias("n"),
        F.col("p50").between(F.col("lo50"), F.col("hi50")).alias("ok_p50"),
        F.col("p90").between(F.col("lo90"), F.col("hi90")).alias("ok_p90"),
        F.col("p99").between(F.col("lo99"), F.col("hi99")).alias("ok_p99"),
    )


@query(
    "pyds_wordcount",
    oracle="""
    WITH vocab AS (
        SELECT string_split(
            'spark scan table join hash row batch value part key '
            || 'filter sort window group query fast slow big small data',
            ' ') AS words),
    toks AS (
        SELECT words[((d * 31 + j * 17) % 20) + 1] AS word
        FROM vocab,
             (SELECT unnest(generate_series(0, 199)) AS d) ds,
             (SELECT unnest(generate_series(0, 19)) AS j) js)
    SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word
    """,
)
def pyds_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship count over the CUSTOM Python data source
    (sources/pydatasource.py, Spark 4 DataSource API) — the connector
    itself is oracle-checked, because the generator is a deterministic
    affine pick the oracle replays in SQL. sf_dir is unused: the
    source synthesizes its partitions executor-side."""
    from mapreduce_wordcounter_spark.sources.pydatasource import register

    register(spark)  # idempotent (session-local flag)
    docs = (
        spark.read.format("synthetic_corpus")
        .option("n_docs", 200)
        .option("partitions", 4)
        .option("words_per_doc", 20)
        .load()
    )
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


from mapreduce_wordcounter_spark.registry import ORACLE as _ORACLE  # noqa: E402


@query("stream_pyds_wordcount", oracle=_ORACLE["pyds_wordcount"])
def stream_pyds_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same flagship count fed by the custom source's STREAMING
    reader — since round 6 the ARROW-batched full DataSourceStreamReader
    (synthetic_corpus_arrow: driver plans offsets/partitions, executors
    yield one vectorized RecordBatch per range; the row-tuple
    SimpleDataSourceStreamReader twin stays exercised by
    stream_pyds_sink_roundtrip and the offset-replay tests). 200 docs
    arrive as micro-batches of 100 driven by the source's offset log,
    into a complete-mode aggregate — batch/stream parity for a
    from-scratch Python connector, pinned by sharing pyds_wordcount's
    oracle. The drain watches the query's progress events until the
    committed batches account for the whole corpus (the bounded-stream
    harness; availableNow is a file-source trigger, not a Python-source
    one). sf_dir is unused: the source synthesizes its batches.

    Connector cost trail (r5 -> r7, sf-independent 200-doc stream):
    5.6 s with the row-tuple simple reader at 32 state partitions ->
    ~3.0 s via Arrow RecordBatch reads, state partitions sized to the
    20-word vocabulary (2), a tmpfs WAL, one read task per batch, and
    a job-free progress-based drain -> ~2.2 s by halving the
    micro-batch count (batch_docs 50 -> 100: the residue was 4 x
    ~0.55 s trigger cycles of pure micro-batch machinery, so fewer,
    larger Arrow batches is the correct lever — the multi-batch
    offset-log path stays exercised with two batches here and by the
    offset-replay/exactly-once tests on the simple reader)."""
    import time
    import uuid

    from mapreduce_wordcounter_spark.sources.pydatasource import register

    register(spark)  # idempotent (session-local flag)
    docs = (
        spark.readStream.format("synthetic_corpus_arrow")
        .option("n_docs", 200)
        .option("batch_docs", 100)
        .option("words_per_doc", 20)
        # one read task per 100-doc micro-batch: scheduling a second
        # task for 50 docs costs more than it parallelizes (the
        # source itself fans out to N partitions — pinned by
        # tests/test_sources.py — which is the production posture)
        .option("partitions", 1)
        .load()
    )
    agg = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    name = "pyds_stream_" + uuid.uuid4().hex[:8]
    from mapreduce_wordcounter_spark.session import scratch_dir
    from mapreduce_wordcounter_spark.streaming.windows import (
        stream_shuffle_partitions,
    )

    # Offset/commit WAL on tmpfs when available: the per-batch
    # walCommit+commitOffsets fsyncs (~100 ms/batch to /tmp disk) are
    # pure harness overhead for this bounded demo stream — a
    # production job owns a durable checkpoint dir instead.
    ckpt = scratch_dir("pyds_stream_ck_")

    # stream_shuffle_partitions(2): the stateful aggregate's partition
    # count tracks STATE size (a 20-word vocabulary), not the batch
    # session's 32 — each extra partition is a near-empty state store
    # opened+committed per micro-batch (the dominant cost of this
    # whole 200-doc query, not the connector rows; 32 -> 8 -> 2
    # measured 5.2 -> 3.6 -> 3.1 s).
    with stream_shuffle_partitions(spark, 2):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt + "/q")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            # Drain on the query's own progress events (no Spark job
            # per poll — the old per-poll aggregate both cost a job
            # and raced the next batch for scheduler slots): done when
            # committed batches account for all 200 source docs.
            deadline = time.monotonic() + 120
            got = 0
            while time.monotonic() < deadline:
                got = sum(
                    p["sources"][0]["numInputRows"] for p in q.recentProgress
                )
                if got >= 200:
                    break
                time.sleep(0.02)
            else:
                raise TimeoutError(f"stream drained only {got}/200 docs")
        finally:
            q.stop()
    return spark.table(name)


_PYDS_SINK_PATHS: dict[tuple[str, str], str] = {}


@query(
    "pyds_roundtrip_wordcount",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(cnt) AS BIGINT) AS total_tokens
    FROM (SELECT word, COUNT(*) AS cnt
          FROM ({_ORACLE_TOKENS}) t
          WHERE word <> ''
          GROUP BY word)
    """,
)
def pyds_roundtrip_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the CUSTOM Python data source WRITER
    (sources/pydatasource.py make_sink_datasource — the two-phase-
    commit JSONL sink): the flagship word counts are written through
    the sink once per (session, sf_dir), read back from the committed
    part files, and re-aggregated — and the result must equal the
    oracle's direct aggregate, which proves the writer lost, gained,
    and mangled nothing. With the reader, stream-reader, and writer
    demos this closes the full Spark 4 Python connector API surface.

    Scale: the sink write is task-parallel (one part file + commit
    message per partition; driver sees only the bounded manifest);
    the read-back is a plain partition-parallel JSON scan."""
    import os

    from mapreduce_wordcounter_spark.session import scratch_dir
    from mapreduce_wordcounter_spark.sources.pydatasource import (
        manifest_files,
        register_sink,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _PYDS_SINK_PATHS.get(key)
    if path is not None and not manifest_files(path):
        path = None  # at-rest artifact evicted externally -> rebuild
    if path is None:
        register_sink(spark)  # idempotent (session-local flag)
        path = os.path.join(scratch_dir("pyds_sink_"), "wc")
        _PYDS_SINK_PATHS[key] = path
        (
            wc_counts(spark, sf_dir)
            # repartition, not coalesce: AQE coalesces the tiny
            # aggregate to one partition and coalesce cannot split,
            # so this pins exactly 4 writer tasks at any sf
            .repartition(4)
            .write.format("jsonl_manifest")
            .option("path", path)
            .mode("append")
            .save()
        )
    # Manifest-driven read: only files the two-phase commit actually
    # published — never a part-* glob, which would also include orphans
    # from failed/speculative task attempts (see manifest_files).
    back = spark.read.schema("word string, cnt long").json(manifest_files(path))
    return back.agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum("cnt").cast("bigint").alias("total_tokens"),
    )


_PYDS_STREAM_SINK_PATHS: dict[str, str] = {}


@query("stream_pyds_sink_roundtrip", oracle=_ORACLE["pyds_wordcount"])
def stream_pyds_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Python-connector loop: the custom STREAM READER feeds
    raw documents micro-batch by micro-batch into the custom STREAM
    WRITER (append mode — rows, not aggregates, cross the sink), and
    the word count then runs in batch over the files the sink
    committed. Pinned to pyds_wordcount's oracle: the result is only
    right if every document crossed the stream sink exactly once —
    the end-to-end exactly-once test for both connector halves
    (reader offset replay + writer idempotent per-batch commit).
    sf_dir is unused: the source synthesizes its batches.

    Scale: each micro-batch writes task-parallel part files and a
    bounded per-batch manifest; the read-back is a plain parallel
    JSON scan. The drain is availableNow-style: the source's offset
    log is finite (200 docs), so the query stops at the last batch."""
    import os
    import time

    from mapreduce_wordcounter_spark.session import scratch_dir
    from mapreduce_wordcounter_spark.sources.pydatasource import (
        manifest_files,
        manifest_total_rows,
        register,
        register_sink,
    )

    key = spark.sparkContext.applicationId
    path = _PYDS_STREAM_SINK_PATHS.get(key)
    if path is not None and not manifest_files(path):
        path = None  # at-rest artifact evicted externally -> rebuild
    if path is None:
        register(spark)       # both idempotent
        register_sink(spark)  # (session-local flags)
        base = scratch_dir("pyds_stream_sink_")
        path = os.path.join(base, "docs")
        _PYDS_STREAM_SINK_PATHS[key] = path
        docs = (
            spark.readStream.format("synthetic_corpus")
            .option("n_docs", 200)
            .option("batch_docs", 50)
            .option("words_per_doc", 20)
            .load()
        )
        q = (
            docs.writeStream.outputMode("append")
            .format("jsonl_manifest")
            .option("path", path)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            # Drain until the COMMITTED total (per-batch manifests)
            # reaches the corpus size — counting raw part files would
            # also count uncommitted/superseded attempts.
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                n = manifest_total_rows(path)
                if n == 200:
                    break
                time.sleep(0.5)
            else:
                raise TimeoutError(f"stream sink committed only {n}/200 docs")
        finally:
            q.stop()
    # Manifest-driven read (see manifest_files): only the files each
    # batch's idempotent commit published.
    back = spark.read.schema("doc_id long, text string, n_words int").json(
        manifest_files(path)
    )
    return (
        back.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
