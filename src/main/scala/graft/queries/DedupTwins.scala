package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.cluster.ConnectedComponents
import graft.config.DedupConfig
import graft.metrics.Metrics
import graft.pairs.Candidates
import graft.sig.{Shingle, SimHash, SuffixDup}

/**
 * Driver-verifiable TWINS of the engine-native dedup operators, run over the
 * `documents` table so DuckDB can re-execute them (round-1 gap: the dedup
 * core had zero green rows in the hard correctness signal — all 11
 * engine-native queries were `no_oracle`).
 *
 * Each twin drives the SAME code paths as the pipeline — the suffix join
 * (SuffixDup), the SimHash64 Catalyst expression + pigeonhole banding +
 * salted bucket join, iterative connected components, the decision rule, and
 * the monitoring metrics — against an ANSI-SQL oracle:
 *
 *   q26  substring containment      → DuckDB `contains` join
 *   q27  SimHash near-dup + Hamming → md5-derived token hashes (the one
 *        64-bit hash both engines share: DuckDB md5_number_lower == the
 *        little-endian low 8 bytes of md5, reconstructed from Spark's md5
 *        hex), majority-vote bits, bit_count(xor) verify
 *   q28  pairs → clusters (CC)      → recursive-CTE transitive closure
 *   q29  per-row decisions          → window + threshold CASE
 *   q30  decision metrics           → counts/rates (monitoring.py:41-44)
 *   q31  score histogram            → threshold buckets (monitoring.py:293-300)
 *   q32  top parents                → group/order/limit (monitoring.py:73-86)
 *   q33  exact percentiles          → quantile_cont (A10)
 *   q34  prefix dedup               → md5 groupBy keeper (training-data
 *        boilerplate-prefix dedup; documents plants 23 shared prefixes)
 */
object DedupTwins {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def toks(c: Column): Column =
    filter(split(c, " "), x => length(x) > 0)

  /** The decision-family twins (q28–q32, q36, q37) all stand on q21's pair
    * set and its CC closure; one driver run computes each ONCE per table
    * directory and the rest reuse the persisted frame (round-2 verdict:
    * every twin recomputed the full q21+CC stack from scratch).
    *
    * Keyed by a stable per-session UUID (identityHashCode of a GC'd session
    * can collide with a new one) and cleared whenever Caches releases — a
    * memoized frame outliving its persist would silently recompute, and an
    * unbounded memo pins DataFrames (and dead sessions) for the JVM life. */
  private val memo = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  // clear on GLOBAL release only: a stream epoch's release(root) must not
  // drop interactive memos whose frames live in the global scope
  graft.util.Caches.onRelease(t => if (t.isEmpty) memo.clear())

  private def memoized(spark: SparkSession, dir: String, key: String)(
      f: => DataFrame): DataFrame =
    memo.getOrElseUpdate(s"${graft.util.Caches.sessionId(spark)}:$dir:$key",
      graft.util.Caches.persist(f))

  /** q21's exact-Jaccard pair set, computed once per (session, dir). */
  def q21Pairs(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "pairs")(Documents.q21NgramJaccard(spark, dir))

  /** The 9 parquet tables are single-split; spread row-local projections
    * as wide as their BYTES justify (Documents.spread — size-derived). */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Documents.spread(spark, dir, "documents")

  // ---- q26: substring containment over normalized text --------------------

  def q26SubstringDocs(spark: SparkSession, dir: String): DataFrame = {
    val caps = docs(spark, dir)
      .select(col("doc_id").as("id"), Shingle.normalizeCol(col("text")).as("norm"))
    SuffixDup.substringPairs(caps, DedupConfig.default)
      .orderBy("src", "dst")
  }

  val q26Sql: String =
    """WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g')) AS nrm
      |           FROM documents)
      |SELECT a.doc_id AS src, b.doc_id AS dst
      |FROM n a JOIN n b ON a.doc_id <> b.doc_id
      |WHERE len(a.nrm) >= 32 AND a.nrm <> b.nrm
      |  AND contains(' ' || b.nrm || ' ', ' ' || a.nrm || ' ')
      |ORDER BY src, dst""".stripMargin

  // ---- q27: SimHash near-dup pairs with a shared 64-bit hash ---------------

  /** Little-endian int64 of md5 bytes 8..15 — bit-identical to DuckDB's
    * `md5_number_lower`. Two 8-hex-char halves keep `conv` inside unsigned
    * 32-bit range; the OR reassembles the full (possibly negative) long. */
  def md5Lo64(c: Column): Column = {
    val h = md5(c)
    def b(pos: Int) = substring(h, pos, 2)
    val hi = concat(b(31), b(29), b(27), b(25))
    val lo = concat(b(23), b(21), b(19), b(17))
    shiftleft(conv(hi, 16, 10).cast("long"), 32)
      .bitwiseOR(conv(lo, 16, 10).cast("long"))
  }

  /** SimHash over word-3-gram md5 hashes, masked to 32 bits (bit i of the
    * sketch depends only on bit i of each hash, so the mask commutes with
    * the majority vote); candidates via 8-band/agree-4 pigeonhole keys over
    * the 32 effective bits (perfect recall for Hamming <= 4) through the
    * salted bucket join; exact bit_count(xor) verification. */
  def q27SimhashDocs(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the md5 sketch is the CPU hot path and feeds the banding
    // plus both verify joins
    val s32 = graft.util.Caches.persist(docs(spark, dir)
      .select(col("doc_id"),
        SimHash.simhash64Col(transform(Documents.shingles3(col("text")), md5Lo64(_)))
          .bitwiseAND(lit(0xFFFFFFFFL)).as("sh"))
      .where(col("sh").isNotNull))
    Candidates.saltedSelfJoinSketch(
      s32.select(col("doc_id").as("id"),
        SimHash.comboKeysNativeCol(col("sh"), 8, 4, 32).as("bks")),
      DedupConfig.default.bucketSizeCap)
      .distinct()
      .join(s32.select(col("doc_id").as("src"), col("sh").as("sha")), "src")
      .join(s32.select(col("doc_id").as("dst"), col("sh").as("shb")), "dst")
      .where(SimHash.hammingCol(col("sha"), col("shb")) <= 4)
      .select(col("src").as("da"), col("dst").as("db"),
        SimHash.hammingCol(col("sha"), col("shb")).as("hamming"))
  }

  val q27Sql: String =
    """WITH tk AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t FROM documents
      |),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
      |  FROM tk, unnest(range(1, greatest(len(t)-2, 1) + 1)) u(i)
      |),
      |h AS (SELECT doc_id, md5_number_lower(s) AS h FROM sh),
      |bits AS (
      |  SELECT doc_id, b,
      |    CASE WHEN sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
      |         THEN (1::BIGINT << b) ELSE 0 END AS bit
      |  FROM h, unnest(range(0, 32)) u(b) GROUP BY doc_id, b
      |),
      |s32 AS (SELECT doc_id, cast(sum(bit) AS bigint) AS sh FROM bits GROUP BY doc_id)
      |SELECT a.doc_id AS da, b.doc_id AS db,
      |  cast(bit_count(xor(a.sh, b.sh)) AS int) AS hamming
      |FROM s32 a JOIN s32 b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 4""".stripMargin

  // ---- q28: connected components over the exact-Jaccard edges --------------

  /** Shared SQL snippet: q21's pair set (da < db, jac >= 0.5), including
    * its df <= 256 boilerplate-shingle cap (Documents.ShingleDfCap). */
  private val pairsCte: String =
    """tk AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t FROM documents
      |),
      |shg0 AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
      |  FROM tk, unnest(range(1, greatest(len(t)-2, 1) + 1)) u(i)
      |),
      |shg AS (
      |  SELECT doc_id, s FROM (
      |    SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM shg0)
      |  WHERE df <= 256
      |),
      |sizes AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY 1),
      |shared AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
      |  FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |pairs AS (
      |  SELECT da, db, round(cast(shared AS double) / (sa.n + sb.n - shared), 4) AS jac
      |  FROM shared JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
      |  WHERE cast(shared AS double) / (sa.n + sb.n - shared) >= 0.5)""".stripMargin

  def q28CcClustersDocs(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "cc") {
      val edges = q21Pairs(spark, dir)
        .select(col("da").as("src"), col("db").as("dst"))
      val vertices = docs(spark, dir).select(col("doc_id").as("id"))
      ConnectedComponents.run(vertices, edges, DedupConfig.default.maxCcIterations)
        .select(col("id").as("doc_id"), col("cluster_id"))
    }

  val q28Sql: String =
    s"""WITH RECURSIVE $pairsCte,
      |edges AS (SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs),
      |closure(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT closure.a, edges.b FROM closure JOIN edges ON closure.b = edges.a),
      |lab AS (SELECT a AS id, least(a, min(b)) AS cluster_id FROM closure GROUP BY a)
      |SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
      |FROM documents d LEFT JOIN lab l ON l.id = d.doc_id""".stripMargin

  // ---- q29: per-row decisions (the reference decision rule) ---------------

  def q29DecisionsDocs(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "dec") {
      val clean = docs(spark, dir).select(col("doc_id").as("image_id"))
      val edges = q21Pairs(spark, dir)
        .select(col("da").as("src"), col("db").as("dst"), col("jac").as("match_score"))
      val clusters = q28CcClustersDocs(spark, dir)
        .select(col("doc_id").as("image_id"), col("cluster_id"))
      graft.Dedup.decisions(clean, edges, clusters, DedupConfig.default)
        .select(col("image_id").as("doc_id"), col("decision"),
          col("best_match_id"), col("best_score"), col("cluster_id"))
    }

  /** Decision + cluster assignment per document — one CTE stack. */
  private val decisionsCte: String =
    s"""$pairsCte,
      |edges AS (SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs),
      |closure(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT closure.a, edges.b FROM closure JOIN edges ON closure.b = edges.a),
      |lab AS (SELECT a AS id, least(a, min(b)) AS cluster_id FROM closure GROUP BY a),
      |best AS (
      |  SELECT db AS doc_id, da AS best_match_id, jac AS best_score,
      |         row_number() OVER (PARTITION BY db ORDER BY jac DESC, da ASC) AS rn
      |  FROM pairs),
      |dec AS (
      |  SELECT d.doc_id,
      |    CASE WHEN b.best_score >= 0.85 THEN 'blocked'
      |         WHEN b.best_score >= 0.70 THEN 'duplicate'
      |         ELSE 'new' END AS decision,
      |    b.best_match_id, b.best_score,
      |    coalesce(l.cluster_id, d.doc_id) AS cluster_id
      |  FROM documents d
      |  LEFT JOIN (SELECT doc_id, best_match_id, best_score FROM best WHERE rn = 1) b USING (doc_id)
      |  LEFT JOIN lab l ON l.id = d.doc_id)""".stripMargin

  val q29Sql: String =
    s"""WITH RECURSIVE $decisionsCte
      |SELECT doc_id, decision, best_match_id, best_score, cluster_id FROM dec""".stripMargin

  // ---- q30-q32: monitoring metrics over the decisions ---------------------

  def q30DedupMetricsDocs(spark: SparkSession, dir: String): DataFrame =
    Metrics.decisionMetrics(q29DecisionsDocs(spark, dir))

  val q30Sql: String =
    s"""WITH RECURSIVE $decisionsCte,
      |counts AS (SELECT decision AS metric, cast(count(*) AS double) AS value
      |           FROM dec GROUP BY decision),
      |total AS (SELECT 'total_rows' AS metric, cast(count(*) AS double) AS value FROM dec),
      |rates AS (SELECT metric || '_rate' AS metric,
      |                 round(value / (SELECT sum(value) FROM counts), 4) AS value
      |          FROM counts)
      |SELECT * FROM counts UNION ALL SELECT * FROM total UNION ALL SELECT * FROM rates""".stripMargin

  def q31ScoreHistogramDocs(spark: SparkSession, dir: String): DataFrame =
    Metrics.scoreHistogram(q21Pairs(spark, dir), "jac")

  val q31Sql: String =
    s"""WITH $pairsCte
      |SELECT CASE WHEN jac >= 0.85 THEN 'block'
      |            WHEN jac >= 0.70 THEN 'flag'
      |            ELSE 'below' END AS bucket,
      |       count(*) AS cnt
      |FROM pairs GROUP BY 1""".stripMargin

  def q32TopParentsDocs(spark: SparkSession, dir: String): DataFrame =
    Metrics.topParents(q29DecisionsDocs(spark, dir), 10)

  val q32Sql: String =
    s"""WITH RECURSIVE $decisionsCte
      |SELECT best_match_id AS parent_id, count(*) AS dup_count
      |FROM dec WHERE best_match_id IS NOT NULL
      |GROUP BY best_match_id
      |ORDER BY dup_count DESC, parent_id ASC LIMIT 10""".stripMargin

  // ---- q33: exact percentiles (A10) ----------------------------------------

  def q33Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val price = col("l_extendedprice").cast("double")
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(price, lit(0.5)), 4).as("p50"),
        round(percentile(price, lit(0.95)), 4).as("p95"),
        round(percentile(price, lit(0.99)), 4).as("p99"))
  }

  val q33Sql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(cast(l_extendedprice AS double), 0.5), 4) AS p50,
      |  round(quantile_cont(cast(l_extendedprice AS double), 0.95), 4) AS p95,
      |  round(quantile_cont(cast(l_extendedprice AS double), 0.99), 4) AS p99
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---- q34: prefix dedup (boilerplate-header dedup) -------------------------

  def q34PrefixDedupDocs(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(toks(col("text")), 1, 8))).as("pre_fp"))
      .groupBy(col("pre_fp"))
      .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keeper"))
      .where(col("copies") > 1)

  val q34Sql: String =
    """SELECT md5(array_to_string(list_filter(string_split(text, ' '), x -> len(x) > 0)[1:8], ' ')) AS pre_fp,
      |  count(*) AS copies, min(doc_id) AS keeper
      |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin

  // ---- q36: average match score (reference `app/tasks.py:220-226`) ---------

  def q36AvgMatchScore(spark: SparkSession, dir: String): DataFrame =
    q29DecisionsDocs(spark, dir).agg(
      round(avg(col("best_score")), 4).as("avg_match_score"),
      count(col("best_score")).as("matched_rows"),
      count(lit(1)).as("total_rows"))

  val q36Sql: String =
    s"""WITH RECURSIVE $decisionsCte
      |SELECT round(avg(best_score), 4) AS avg_match_score,
      |  count(best_score) AS matched_rows, count(*) AS total_rows
      |FROM dec""".stripMargin

  // ---- q37: decision timeline (reference `app/api/monitoring.py:189-213`;
  //           doc_id arrival-order buckets stand in for the day axis — the
  //           documents schema pins no timestamp, matching the engine's
  //           batch-as-time-axis convention) --------------------------------

  def q37DecisionTimeline(spark: SparkSession, dir: String): DataFrame =
    q29DecisionsDocs(spark, dir)
      .groupBy(floor(col("doc_id") / 100).cast("long").as("arrival_bucket"),
        col("decision"))
      .agg(count(lit(1)).as("cnt"),
        round(avg(col("best_score")), 4).as("avg_score"))

  val q37Sql: String =
    s"""WITH RECURSIVE $decisionsCte
      |SELECT cast(floor(doc_id / 100) AS bigint) AS arrival_bucket, decision,
      |  count(*) AS cnt, round(avg(best_score), 4) AS avg_score
      |FROM dec GROUP BY 1, 2""".stripMargin

  // ---- q38: duplicate_history event log (reference `migrations/schema.sql:
  //           95-119` — match_method, was_blocked per detection EVENT, a
  //           queryable log separate from the audit table). Drives the REAL
  //           `Dedup.duplicateHistory` over a verified-like pair set whose
  //           `sources` union three generators (ngram / substring / simhash),
  //           so the driver checks the method-attribution join, not just the
  //           decision rule. `detected_at`/`batch` are dropped — the dump
  //           must be deterministic. -----------------------------------------

  def q38DuplicateHistory(spark: SparkSession, dir: String): DataFrame = {
    val dec = q29DecisionsDocs(spark, dir)
      .select(col("doc_id").as("image_id"), col("decision"),
        col("best_match_id"), col("best_score"))
    // all three twin generators, canonicalized to (da < db) arrival order
    val meth = q21Pairs(spark, dir)
      .select(col("da"), col("db"), lit("ngram").as("m"))
      .unionByName(q26SubstringDocs(spark, dir).select(
        least(col("src"), col("dst")).as("da"),
        greatest(col("src"), col("dst")).as("db"),
        lit("substring").as("m")))
      .unionByName(q27SimhashDocs(spark, dir)
        .select(col("da"), col("db"), lit("simhash").as("m")))
    val verifiedLike = meth
      .groupBy(col("da").as("src"), col("db").as("dst"))
      .agg(sort_array(collect_set(col("m"))).as("sources"))
    graft.Dedup.duplicateHistory(dec, verifiedLike)
      .select(col("image_id").as("doc_id"), col("best_match_id"),
        col("best_score"), col("was_blocked"), col("match_method"))
  }

  /** The simhash CTEs reuse `tk`/`shg0` from `pairsCte` (same tokenization,
    * same distinct 3-gram strings) — only the md5 hash/majority-vote stack
    * is simhash-specific. */
  val q38Sql: String =
    s"""WITH RECURSIVE $decisionsCte,
      |nrm AS (SELECT doc_id, trim(regexp_replace(lower(text), '[^\\p{L}\\p{N}]+', ' ', 'g')) AS nrm
      |        FROM documents),
      |sub AS (
      |  SELECT least(a.doc_id, b.doc_id) AS da, greatest(a.doc_id, b.doc_id) AS db
      |  FROM nrm a JOIN nrm b ON a.doc_id <> b.doc_id
      |  WHERE len(a.nrm) >= 32 AND a.nrm <> b.nrm
      |    AND contains(' ' || b.nrm || ' ', ' ' || a.nrm || ' ')),
      |h2 AS (SELECT doc_id, md5_number_lower(s) AS h FROM shg0),
      |bits2 AS (
      |  SELECT doc_id, b,
      |    CASE WHEN sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
      |         THEN (1::BIGINT << b) ELSE 0 END AS bit
      |  FROM h2, unnest(range(0, 32)) u(b) GROUP BY doc_id, b),
      |s32x AS (SELECT doc_id, cast(sum(bit) AS bigint) AS sh FROM bits2 GROUP BY doc_id),
      |simp AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db
      |  FROM s32x a JOIN s32x b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.sh, b.sh)) <= 4),
      |meth AS (
      |  SELECT da, db, 'ngram' AS m FROM pairs
      |  UNION SELECT da, db, 'substring' FROM sub
      |  UNION SELECT da, db, 'simhash' FROM simp),
      |mm AS (SELECT da, db, string_agg(m, '+' ORDER BY m) AS match_method
      |       FROM meth GROUP BY da, db)
      |SELECT d.doc_id, d.best_match_id, d.best_score,
      |  (d.decision = 'blocked') AS was_blocked, mm.match_method
      |FROM dec d LEFT JOIN mm ON mm.da = d.best_match_id AND mm.db = d.doc_id
      |WHERE d.decision <> 'new'""".stripMargin

  // ---- exact_dedup_corpus: hash-groupBy exact dedup, oracle-checked --------
  //   (round-4 verdict #6: this operator was a rows-only entry; documents has
  //   NO natural byte-identical texts — 500/500 distinct — so the corpus is
  //   documents reshaped into the image+caption schema with PLANTED exact
  //   copies of every 5th doc, a derivation both engines express identically.
  //   The Spark side drives the REAL pipeline path: Candidates.exactRepMapFull
  //   (repTag groupBy+join-back, the exact-group stage of Dedup.candidates).)

  /** Corpus-shaped rows from documents: caption = text, metadata from the
    * table's own columns, phash = the md5-low64 shared hash (q27), plus a
    * byte-identical copy ("dup-…", sorting after its original) of every
    * 5th doc. */
  private def plantedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir).select(
      col("doc_id"),
      concat(lit("doc-"), lpad(col("doc_id").cast("string"), 10, "0")).as("image_id"),
      col("text").as("caption"),
      col("n_chars").cast("int").as("w"),
      length(col("lang")).cast("int").as("h"),
      col("source").as("fmt"),
      md5Lo64(col("text")).as("phash"))
    base.drop("doc_id").unionByName(
      base.where(pmod(col("doc_id"), lit(5)) === 0)
        .withColumn("image_id", concat(lit("dup-"), substring(col("image_id"), 5, 10)))
        .drop("doc_id"))
  }

  def exactDedupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val feats = plantedCorpus(spark, dir)
      .withColumn("norm", Shingle.normalizeCol(col("caption")))
    Candidates.exactRepMapFull(feats)
      .groupBy(col("rep").as("keeper"))
      .agg(count(lit(1)).as("copies"))
      .where(col("copies") > 1)
      .orderBy("keeper")
  }

  /** Grouping twin: phash is a pure function of text, so grouping by
    * md5(text) partitions rows exactly as the engine's md5-low64 phash
    * (modulo 2^-64 truncation collisions); rep = min member id. */
  val exactDedupCorpusSql: String =
    """WITH c AS (
      |  SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS image_id,
      |         text, CAST(n_chars AS INT) AS w, CAST(len(lang) AS INT) AS h,
      |         source AS fmt
      |  FROM documents
      |  UNION ALL
      |  SELECT 'dup-' || lpad(CAST(doc_id AS VARCHAR), 10, '0'),
      |         text, CAST(n_chars AS INT), CAST(len(lang) AS INT), source
      |  FROM documents WHERE doc_id % 5 = 0
      |), k AS (
      |  SELECT image_id,
      |         trim(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g')) AS norm,
      |         w, h, fmt, md5(text) AS ph
      |  FROM c)
      |SELECT min(image_id) AS keeper, CAST(count(*) AS BIGINT) AS copies
      |FROM k GROUP BY norm, w, h, fmt, ph HAVING count(*) > 1
      |ORDER BY keeper""".stripMargin

  // ---- substring_pairs_corpus: the suffix pass with planted fragments ------
  //   (round-4 verdict #6: q26 verifies the suffix join on documents' NATURAL
  //   containment only; this twin additionally PLANTS token-aligned prefix
  //   fragments — the corpus-generator shape — and oracle-checks the union.)

  def substringPairsCorpus(spark: SparkSession, dir: String): DataFrame = {
    val cfg = DedupConfig.default
    val norms = docs(spark, dir).select(
      col("doc_id"),
      concat(lit("doc-"), lpad(col("doc_id").cast("string"), 10, "0")).as("id"),
      Shingle.normalizeCol(col("text")).as("norm"))
    val frags = norms.where(pmod(col("doc_id"), lit(7)) === 0)
      .withColumn("norm", array_join(slice(split(col("norm"), " "), 1, 8), " "))
      .where(length(col("norm")) >= cfg.substringMinLen)
      .select(concat(lit("frag-"), substring(col("id"), 5, 10)).as("id"), col("norm"))
    SuffixDup.substringPairs(
      norms.select("id", "norm").unionByName(frags), cfg)
      .orderBy("src", "dst")
  }

  val substringPairsCorpusSql: String =
    """WITH n0 AS (
      |  SELECT doc_id, 'doc-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS id,
      |         trim(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g')) AS nrm
      |  FROM documents
      |), fr AS (
      |  SELECT 'frag-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS id,
      |         array_to_string(list_slice(string_split(nrm, ' '), 1, 8), ' ') AS nrm
      |  FROM n0 WHERE doc_id % 7 = 0
      |), u AS (
      |  SELECT id, nrm FROM n0
      |  UNION ALL SELECT id, nrm FROM fr WHERE len(nrm) >= 32)
      |SELECT a.id AS src, b.id AS dst
      |FROM u a JOIN u b ON a.id <> b.id
      |WHERE len(a.nrm) >= 32 AND a.nrm <> b.nrm
      |  AND contains(' ' || b.nrm || ' ', ' ' || a.nrm || ' ')
      |ORDER BY src, dst""".stripMargin
}
