package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Embedding similarity-search family over `embeddings`
  * (vec_id:long, embedding:array<float>, label:int).
  *
  * Cross-engine float determinism: elements are quantized to int64
  * (round(x*1000)) before any accumulation, so dot products and norms
  * are exact integer math — identical in Spark and DuckDB regardless
  * of accumulation order / SIMD. This is the int-quantized similarity
  * trick used by production ANN systems, doubling as the parity fix.
  *
  * Scale path: brute-force top-k broadcasts the (small) query set and
  * never shuffles the corpus; IVF assignment broadcasts centroids —
  * both stay a single scan of the big side at 100 TB.
  */
object Embed {

  /** Quantized copy of the embedding: array<long>, round(x*1000). */
  private def qvec(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))

  private val qvecSql =
    "list_transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"

  /** Exact integer dot product of two quantized vectors. */
  private def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** sqrt of the quantized self-dot (double — exact input, both engines). */
  private def qnorm(a: Column): Column = sqrt(qdot(a, a).cast("double"))

  /** L2 norms + quantized self-dot — the parity canary for the family. */
  def q26EmbedNorm(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .withColumn("q", qvec(col("embedding")))
      .select(col("vec_id"), col("label"),
        qdot(col("q"), col("q")).as("qdot_self"),
        round(qnorm(col("q")) / 1000.0, 6).as("l2_norm"))

  val q26Sql: String =
    s"""SELECT vec_id, label,
       |  cast(list_dot_product(q, q) as bigint) AS qdot_self,
       |  round(sqrt(cast(list_dot_product(q, q) as double)) / 1000.0, 6) AS l2_norm
       |FROM (SELECT vec_id, label, $qvecSql AS q FROM embeddings)""".stripMargin

  /** Brute-force cosine top-k: query set = vec_id < 10 (broadcast),
    * k = 3 nearest per query, rank by exact integer-derived cosine.
    * Norms are computed once per side BEFORE the join — at 100 TB the
    * corpus norm is a per-row map over one scan, not per-pair work. */
  def q27CosineTopK(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).withColumn("q", qvec(col("embedding")))
      .withColumn("nrm", qnorm(col("q")))
    val queries = e.select(col("vec_id").as("query_id"), col("q").as("qa"),
      col("nrm").as("na")).filter(col("query_id") < 10)
    val corpus = e.select(col("vec_id").as("cand_id"), col("q").as("qb"),
      col("nrm").as("nb"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("cand_id"))
    corpus.join(broadcast(queries), col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim",
        qdot(col("qa"), col("qb")).cast("double") / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("cand_id"), col("rank").cast("long").as("rank"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  val q27Sql: String =
    s"""WITH q AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
       |sims AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       |    cast(list_dot_product(a.qv, b.qv) as double) /
       |      (sqrt(cast(list_dot_product(a.qv, a.qv) as double)) *
       |       sqrt(cast(list_dot_product(b.qv, b.qv) as double))) AS cos_sim
       |  FROM q a JOIN q b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
       |SELECT query_id, cand_id, rank, round(cos_sim, 6) AS cos_sim
       |FROM (SELECT *, row_number() OVER
       |        (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
       |      FROM sims)
       |WHERE rank <= 3""".stripMargin

  /** IVF coarse assignment: centroids = vec_id < 8 (broadcast); assign
    * every vector to its nearest centroid — the scale path for ANN
    * (probe only matching cells at query time).
    *
    * Shape note (r6, measured): the 8× broadcast-NLJ inflation feeds a
    * NARROW (vec_id, centroid_id, cos_sim) sort + WindowGroupLimit
    * top-1, so the window exchange moves ≤1 row per vector per task —
    * already the cheap plan. A map-side argmax fold over a broadcast
    * centroid array (no inflation at all) was tried and measured ~35%
    * SLOWER at sf0.1: higher-order-function lambdas evaluate
    * interpreted, outside whole-stage codegen, and the nested
    * fold-of-dot-products costs more than the flat projection the NLJ
    * shape codegens. Kept as-is deliberately. */
  def q28IvfAssign(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).withColumn("q", qvec(col("embedding")))
    val cents = e.select(col("vec_id").as("centroid_id"), col("q").as("cv"))
      .filter(col("centroid_id") < 8)
    val w = Window.partitionBy("vec_id").orderBy(col("cos_sim").desc, col("centroid_id"))
    e.join(broadcast(cents), lit(true))
      .withColumn("cos_sim",
        qdot(col("q"), col("cv")).cast("double") / (qnorm(col("q")) * qnorm(col("cv"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_assigned"),
        round(dsum(round(col("cos_sim"), 6)), 6).as("sum_sim"))
  }

  val q28Sql: String =
    s"""WITH q AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
       |assign AS (
       |  SELECT v.vec_id, c.vec_id AS centroid_id,
       |    cast(list_dot_product(v.qv, c.qv) as double) /
       |      (sqrt(cast(list_dot_product(v.qv, v.qv) as double)) *
       |       sqrt(cast(list_dot_product(c.qv, c.qv) as double))) AS cos_sim,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      cast(list_dot_product(v.qv, c.qv) as double) /
       |        (sqrt(cast(list_dot_product(v.qv, v.qv) as double)) *
       |         sqrt(cast(list_dot_product(c.qv, c.qv) as double))) DESC, c.vec_id) AS rn
       |  FROM q v JOIN q c ON c.vec_id < 8)
       |SELECT centroid_id, count(*) AS n_assigned,
       |  round(cast(sum(cast(round(cos_sim, 6) as decimal(18,4))) as double), 6) AS sum_sim
       |FROM assign WHERE rn = 1 GROUP BY centroid_id""".stripMargin

  /** The ±1 hyperplane weight matrix, computed driver-side with the
    * same md5 derivation the DuckDB oracle uses (JVM MessageDigest md5
    * == Spark md5 == DuckDB md5) — shipped as a literal, so the hot
    * path does array lookups instead of 8×64 md5 calls per row. */
  private lazy val lshWeights: Seq[Seq[Long]] = {
    def h60jvm(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    (0 until 8).map(p => (0 until 64).map(i =>
      if (h60jvm(s"$p|$i") % 2 == 1) 1L else -1L))
  }

  /** All 8 hyperplane sign bits of a quantized vector as ONE map-side
    * column: Σ_p (proj_p >= 0 ? 1L << p : 0) — value-identical to the
    * old explode(0..7) → per-plane proj → groupBy(vec_id) sum(bit << p)
    * (same addends, integer sum), but computed without inflating the
    * corpus 8× and without the re-group shuffle (guide §2.4). */
  private def bucketCol(q: Column): Column = {
    val wLit = typedLit(lshWeights)
    (0 until 8).map { p =>
      val proj = aggregate(
        zip_with(q, element_at(wLit, lit(p + 1)), (x, w) => x * w),
        lit(0L), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH bucketing over embeddings: 8 deterministic hyperplanes drawn
    * from md5 of (plane, dim) — sign bits form the bucket key. r6: the
    * bucket is a single map-side expression; the only exchange left is
    * the final groupBy(bucket). */
  def q29EmbedLsh(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).withColumn("q", qvec(col("embedding")))
      .withColumn("bucket", bucketCol(col("q")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec_id"))

  val q29Sql: String =
    s"""WITH q AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
       |proj AS (
       |  SELECT vec_id, p,
       |    list_sum(list_transform(generate_series(0, len(qv) - 1),
       |      i -> qv[i + 1] * (CASE WHEN ${h60Sql("concat(cast(p as varchar), '|', cast(i as varchar))")} % 2 = 1
       |                        THEN 1 ELSE -1 END))) AS proj
       |  FROM q, (SELECT unnest(generate_series(0, 7)) AS p)),
       |buckets AS (
       |  SELECT vec_id,
       |    cast(sum(cast((CASE WHEN proj >= 0 THEN 1 ELSE 0 END) as bigint) << p) as bigint) AS bucket
       |  FROM proj GROUP BY vec_id)
       |SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec_id
       |FROM buckets GROUP BY bucket""".stripMargin

  /** Embedding-cosine near-dup pairs — the ANN near-dup operator shape:
    * candidates come ONLY from LSH-bucket collisions (q29's hyperplane
    * buckets — never all-pairs), then the exact quantized cosine
    * verifies each candidate. At 100 TB the pair join is bounded by
    * bucket occupancy (add planes to shrink buckets); the verify is one
    * integer dot product per surviving pair. Threshold 0.2 marks the
    * "most similar" tail of this synthetic corpus (max pairwise cosine
    * ≈ 0.4 — random embeddings have no true dups; real corpora would
    * use ~0.95 with the identical plan). */
  def q40EmbedNearDup(s: SparkSession, d: String): DataFrame = {
    // shape note (r6, measured): a map-side bucketCol variant that
    // carried vectors straight into the bucket self-join (dropping the
    // explode/regroup and both re-attach joins) measured ~20% slower at
    // sf0.1 — the 8 per-plane interpreted HOF projections per row cost
    // more than the exchanges they removed, and the re-attach joins
    // broadcast at this scale. Kept on the original shape.
    val e = embeddings(s, d).withColumn("q", qvec(col("embedding")))
    val wLit = typedLit(lshWeights)
    val buckets = e.withColumn("p", explode(sequence(lit(0), lit(7))))
      .withColumn("proj",
        aggregate(
          zip_with(col("q"), element_at(wLit, col("p") + 1), (x, w) => x * w),
          lit(0L), (acc, v) => acc + v))
      .withColumn("bit", when(col("proj") >= 0, lit(1)).otherwise(lit(0)))
      .groupBy("vec_id")
      .agg(sum(expr("cast(bit as bigint) << p")).as("bucket"))
    val a = buckets.select(col("vec_id").as("vec_a"), col("bucket"))
    val b = buckets.select(col("vec_id").as("vec_b"), col("bucket"))
    val qv = e.select(col("vec_id"), col("q"), qnorm(col("q")).as("nrm"))
    a.join(b, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
      .join(qv.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nrm").as("na")), "vec_a")
      .join(qv.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nrm").as("nb")), "vec_b")
      .withColumn("cos_sim",
        qdot(col("qa"), col("qb")).cast("double") / (col("na") * col("nb")))
      .filter(col("cos_sim") >= 0.2)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  val q40Sql: String =
    s"""WITH q AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
       |proj AS (
       |  SELECT vec_id, p,
       |    list_sum(list_transform(generate_series(0, len(qv) - 1),
       |      i -> qv[i + 1] * (CASE WHEN ${h60Sql("concat(cast(p as varchar), '|', cast(i as varchar))")} % 2 = 1
       |                        THEN 1 ELSE -1 END))) AS proj
       |  FROM q, (SELECT unnest(generate_series(0, 7)) AS p)),
       |buckets AS (
       |  SELECT vec_id,
       |    cast(sum(cast((CASE WHEN proj >= 0 THEN 1 ELSE 0 END) as bigint) << p) as bigint) AS bucket
       |  FROM proj GROUP BY vec_id),
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM buckets a JOIN buckets b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |cos AS (
       |  SELECT vec_a, vec_b,
       |    cast(list_dot_product(x.qv, y.qv) as double) /
       |      (sqrt(cast(list_dot_product(x.qv, x.qv) as double)) *
       |       sqrt(cast(list_dot_product(y.qv, y.qv) as double))) AS cos_sim
       |  FROM pairs JOIN q x ON x.vec_id = vec_a JOIN q y ON y.vec_id = vec_b)
       |SELECT vec_a, vec_b, round(cos_sim, 6) AS cos_sim
       |FROM cos WHERE cos_sim >= 0.2""".stripMargin

  /** IVF probe — the ANN SEARCH path that q28's coarse assignment
    * exists for: each query vector probes only its nprobe=2 nearest
    * cells and ranks the exact cosine among that cell-bounded candidate
    * set. At 100 TB: centroids broadcast, the corpus is scanned once to
    * tag cells (or pre-materialized partitioned BY cell — then the probe
    * reads only matching partitions), and the candidate join is bounded
    * by cell occupancy, never all-pairs. Queries = vec_id < 5. */
  def q43IvfProbe(s: SparkSession, d: String): DataFrame = {
    // shape note (r6, measured): like q28, the assignment windows are
    // already narrow + WindowGroupLimit-pruned; a map-side fold variant
    // (broadcast centroid array, interpreted HOF lambdas) measured ~25%
    // slower at sf0.1 — kept on the codegen-friendly NLJ+window shape.
    val e = embeddings(s, d).withColumn("q", qvec(col("embedding")))
      .withColumn("nrm", qnorm(col("q")))
    val cents = e.select(col("vec_id").as("centroid_id"), col("q").as("cv"),
      col("nrm").as("cnrm")).filter(col("centroid_id") < 8)
    // corpus → nearest cell (q28's assignment)
    val wCell = Window.partitionBy("vec_id").orderBy(col("c_sim").desc, col("centroid_id"))
    val assigned = e.join(broadcast(cents), lit(true))
      .withColumn("c_sim",
        qdot(col("q"), col("cv")).cast("double") / (col("nrm") * col("cnrm")))
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("cand_id"), col("q").as("qc"),
        col("nrm").as("cnrmv"), col("centroid_id").as("cell"))
    // query → its nprobe=2 nearest cells
    val wProbe = Window.partitionBy("query_id").orderBy(col("c_sim").desc, col("centroid_id"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nrm").as("qnrm"))
      .join(broadcast(cents), lit(true))
      .withColumn("c_sim",
        qdot(col("qq"), col("cv")).cast("double") / (col("qnrm") * col("cnrm")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2)
      .select(col("query_id"), col("qq"), col("qnrm"), col("centroid_id").as("cell"))
    // candidates = corpus rows in the probed cells; exact-cosine top-3
    val wTop = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("cand_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos_sim",
        qdot(col("qq"), col("qc")).cast("double") / (col("qnrm") * col("cnrmv")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("cand_id"),
        col("rank").cast("long").as("rank"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  val q43Sql: String =
    s"""WITH q AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
       |cents AS (SELECT vec_id AS centroid_id, qv AS cv FROM q WHERE vec_id < 8),
       |assigned AS (
       |  SELECT vec_id AS cand_id, qv AS qc, cell FROM (
       |    SELECT v.vec_id, v.qv, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        cast(list_dot_product(v.qv, c.cv) as double) /
       |          (sqrt(cast(list_dot_product(v.qv, v.qv) as double)) *
       |           sqrt(cast(list_dot_product(c.cv, c.cv) as double))) DESC,
       |        c.centroid_id) AS rn
       |    FROM q v JOIN cents c ON true)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, qq, cell FROM (
       |    SELECT v.vec_id AS query_id, v.qv AS qq, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        cast(list_dot_product(v.qv, c.cv) as double) /
       |          (sqrt(cast(list_dot_product(v.qv, v.qv) as double)) *
       |           sqrt(cast(list_dot_product(c.cv, c.cv) as double))) DESC,
       |        c.centroid_id) AS rn
       |    FROM q v JOIN cents c ON true WHERE v.vec_id < 5)
       |  WHERE rn <= 2),
       |cand AS (
       |  SELECT p.query_id, a.cand_id,
       |    cast(list_dot_product(p.qq, a.qc) as double) /
       |      (sqrt(cast(list_dot_product(p.qq, p.qq) as double)) *
       |       sqrt(cast(list_dot_product(a.qc, a.qc) as double))) AS cos_sim
       |  FROM probes p JOIN assigned a ON a.cell = p.cell AND a.cand_id <> p.query_id)
       |SELECT query_id, cand_id, rank, round(cos_sim, 6) AS cos_sim
       |FROM (SELECT *, row_number() OVER
       |        (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
       |      FROM cand)
       |WHERE rank <= 3""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_ivf_probe"     -> q43IvfProbe _,
    "q26_embed_norm"    -> q26EmbedNorm _,
    "q27_cosine_topk"   -> q27CosineTopK _,
    "q28_ivf_assign"    -> q28IvfAssign _,
    "q29_embed_lsh"     -> q29EmbedLsh _,
    "q40_embed_neardup" -> q40EmbedNearDup _,
  )

  val oracle: Map[String, String] = Map(
    "q43_ivf_probe"     -> q43Sql,
    "q26_embed_norm"    -> q26Sql,
    "q27_cosine_topk"   -> q27Sql,
    "q28_ivf_assign"    -> q28Sql,
    "q29_embed_lsh"     -> q29Sql,
    "q40_embed_neardup" -> q40Sql,
  )
}
