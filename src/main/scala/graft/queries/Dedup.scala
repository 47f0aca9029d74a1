package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Deduplication family over `documents` — exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, rolling-hash fingerprinting. All hashing
  * is md5-derived so the DuckDB oracle reproduces bit-identical values.
  *
  * Scale notes (100 TB): every query here is shuffle-on-key only —
  * shingle explode is map-side, signatures are groupBy(doc) partial-agg,
  * LSH pair generation joins on band signature (never all-pairs).
  */
object Dedup {

  private def toks(c: org.apache.spark.sql.Column) =
    split(trim(lower(c)), "\\s+")

  /** Word 3-gram shingles, for docs with >= 3 tokens. `dedup` controls
    * the per-(doc, sh) distinct: q21's document-frequency / size counts
    * need it; the MIN-aggregating consumers (q22/q23/q45 minhash) do
    * NOT — min over a bag equals min over its distinct set — so they
    * skip the distinct's full shuffle of the shingle set (guide §2.4:
    * remove shuffles outright). */
  private def shingled(s: SparkSession, d: String,
                       dedup: Boolean = true): DataFrame = {
    val sh = documents(s, d)
      .withColumn("w", toks(col("text")))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", explode(transform(
        sequence(lit(1), size(col("w")) - 2),
        i => concat_ws(" ", slice(col("w"), i, lit(3))))))
      .select("doc_id", "source", "sh")
    if (dedup) sh.distinct() else sh
  }

  private val shingleCte: String =
    """shingles AS (
      |  SELECT DISTINCT doc_id, source,
      |    unnest([array_to_string(w[i:i+2], ' ') for i in generate_series(1, len(w)-2)]) AS sh
      |  FROM (SELECT doc_id, source, string_split_regex(trim(lower(text)), '\s+') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3)""".stripMargin

  /** Exact dedup: hash-groupBy on normalized text, first-occurrence keep
    * (enqueue-side dedup gate semantics, utils/queue_utils.py:61-66). */
  def q20DedupExact(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("k").orderBy("doc_id")
    documents(s, d)
      .withColumn("k", md5(lower(trim(col("text")))))
      .withColumn("dup_rank", row_number().over(w))
      .withColumn("group_size", count(lit(1)).over(Window.partitionBy("k")))
      .select(col("doc_id"), col("k").as("content_key"),
        col("dup_rank").cast("long").as("dup_rank"),
        col("group_size"), (col("dup_rank") === 1).as("keep"))
  }

  val q20Sql: String =
    """SELECT doc_id, k AS content_key, dup_rank, group_size, dup_rank = 1 AS keep
      |FROM (SELECT doc_id, k,
      |    row_number() OVER (PARTITION BY k ORDER BY doc_id) AS dup_rank,
      |    count(*) OVER (PARTITION BY k) AS group_size
      |  FROM (SELECT doc_id, md5(lower(trim(text))) AS k FROM documents))""".stripMargin

  /** Hot shingles (stopword n-grams) make the equi-join quadratic: one
    * shingle present in k docs yields k² pair rows. Standard winnowing
    * practice drops shingles above a document-frequency cap BEFORE pair
    * generation; jaccard is then computed consistently over the capped
    * shingle space (sizes too). At 100 TB this bounds every join group
    * at MaxShingleDf² rows. */
  val MaxShingleDf = 50

  /** n-gram Jaccard near-dup: pairs within a source sharing >= 1
    * (non-hot) shingle, jaccard = |A∩B| / |A∪B| over the capped shingle
    * space (exact ints → exact double).
    *
    * Shape (r4, VERDICT r3 #8): single-pass group-and-explode. The df
    * cap makes every (source, sh) group ≤ MaxShingleDf docs, so
    * collecting the group's (doc_id, n_sh) structs into one agg buffer
    * is bounded at 50 entries — the unbounded-hot-shingle concern that
    * justified r3's self-join shape disappears once the cap runs FIRST.
    * Each group then emits its ≤ df² ordered pairs map-side, already
    * carrying both docs' shingle counts, so the plan is 4 key shuffles
    * (df window, n_sh window, group, pair agg) with NO joins and no
    * re-used subtree to checkpoint. The r3 alternative (checkpoint +
    * self-join + two size joins) is recorded in PLANS.md; it measured
    * ~1.9× slower at sf0.1. */
  def q21NgramJaccard(s: SparkSession, d: String): DataFrame = {
    val wDf = Window.partitionBy("source", "sh")
    val wDoc = Window.partitionBy("doc_id")
    val sh = shingled(s, d)
      .withColumn("__df", count(lit(1)).over(wDf))
      .filter(col("__df") <= MaxShingleDf)
      .withColumn("n_sh", count(lit(1)).over(wDoc))
    sh.groupBy("source", "sh")
      .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("ds"))
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"),
        min("a.n_sh").as("n_a"), min("b.n_sh").as("n_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6))
      .filter(col("jaccard") >= 0.02)
      .select("doc_a", "doc_b", "inter", "jaccard")
  }

  val q21Sql: String =
    s"""WITH $shingleCte,
       |capped AS (
       |  SELECT doc_id, source, sh FROM (
       |    SELECT *, count(*) OVER (PARTITION BY source, sh) AS df
       |    FROM shingles)
       |  WHERE df <= $MaxShingleDf),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM capped GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM capped a JOIN capped b
       |    ON a.source = b.source AND a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter,
       |  round(cast(inter as double) / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
       |FROM pairs
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE round(cast(inter as double) / (sa.n_sh + sb.n_sh - inter), 6) >= 0.02""".stripMargin

  /** MinHash signatures: 8 hash functions h_i(x) = md5(i || '|' || x),
    * signature_i = min over shingles (string min — md5 hex orders
    * uniformly). Long format (doc_id, i, minhash).
    *
    * Computed WIDE (r6): one groupBy(doc_id) with 8 min aggregates —
    * map-side partial collapses each task's shingles to one row per doc
    * BEFORE the exchange — then exploded to the long format AFTER the
    * aggregation (8 rows per doc, not 8 per shingle pre-shuffle; the
    * old `explode(0..7)`-first shape shuffled the shingle set 8×).
    * Values identical by construction: min(md5("i|" ++ sh)) over the
    * same shingle bag either way (the q22 oracle gates it). */
  def q22MinhashSig(s: SparkSession, d: String): DataFrame = {
    val aggs = (0 until 8).map(i =>
      min(md5(concat(lit(s"$i|"), col("sh")))).as(s"m$i"))
    shingled(s, d, dedup = false)
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        posexplode(array((0 until 8).map(i => col(s"m$i")): _*)))
      .select(col("doc_id"), col("pos").cast("long").as("i"),
        col("col").as("minhash"))
  }

  val q22Sql: String =
    s"""WITH $shingleCte
       |SELECT doc_id, i, min(md5(concat(cast(i as varchar), '|', sh))) AS minhash
       |FROM shingles, (SELECT unnest(generate_series(0, 7)) AS i)
       |GROUP BY doc_id, i""".stripMargin

  /** MinHash-LSH candidate pairs: 4 bands × 2 rows; pair iff some band
    * signature matches (the shingle→minhash→band→bucket-join scale path:
    * no all-pairs comparison ever materializes).
    *
    * The signatures are computed WIDE — one groupBy(doc_id) with 8 min
    * aggregates over per-shingle md5 columns — instead of reusing
    * q22's long format, whose `explode(0..7)` inflates every shingle
    * row 8× before the shuffle. Values are identical by construction
    * (min over md5(i || '|' || sh) either way; the q23/q45 DuckDB
    * oracles gate it); the band explode afterwards is 4 rows per DOC,
    * not 8 per shingle. */
  def q23MinhashLsh(s: SparkSession, d: String): DataFrame = {
    // dedup=false: min over the shingle bag == min over its distinct
    // set, so the distinct's extra shuffle is dropped (r6)
    val sh = shingled(s, d, dedup = false)
    val aggs = (0 until 8).map(i =>
      min(md5(concat(lit(s"$i|"), col("sh")))).as(s"m$i"))
    val wide = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    // pinned ONCE (same sharing as before): both join sides would
    // otherwise recompute the whole shingle→minhash pipeline. LAZY
    // checkpoint (r6): the first consumer's stage materializes the
    // blocks — the eager variant paid a dedicated job for it.
    val bandSig = wide.select(col("doc_id"), explode(array(
        (0 until 4).map(b => struct(lit(b).as("band"),
          concat_ws("|", col(s"m${2 * b}"), col(s"m${2 * b + 1}")).as("band_sig"))): _*
      )).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.band_sig").as("band_sig"))
      .localCheckpoint(false)
    val a = bandSig.select(col("doc_id").as("doc_a"), col("band"), col("band_sig"))
    val b = bandSig.select(col("doc_id").as("doc_b"), col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** The full shingle→minhash→band→bucket-join pipeline as CTEs, shared
    * by q23 (the pairs themselves) and q45 (clusters over the pairs). */
  private val lshPairCtes: String =
    s"""$shingleCte,
       |sig AS (
       |  SELECT doc_id, i, min(md5(concat(cast(i as varchar), '|', sh))) AS minhash
       |  FROM shingles, (SELECT unnest(generate_series(0, 7)) AS i)
       |  GROUP BY doc_id, i),
       |band_sig AS (
       |  SELECT doc_id, cast(i // 2 as int) AS band,
       |    concat(min(CASE WHEN i % 2 = 0 THEN minhash END), '|',
       |           min(CASE WHEN i % 2 = 1 THEN minhash END)) AS band_sig
       |  FROM sig GROUP BY 1, 2),
       |lsh_pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM band_sig a JOIN band_sig b
       |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id)""".stripMargin

  val q23Sql: String =
    s"""WITH $lshPairCtes
       |SELECT doc_a, doc_b FROM lsh_pairs""".stripMargin

  /** SimHash (16-bit): per-token 60-bit hash, bit-majority vote weighted
    * by token multiplicity. */
  def q24Simhash(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("tok", explode(toks(col("text"))))
      .withColumn("h", h60(col("tok")))
      .withColumn("j", explode(sequence(lit(0), lit(15))))
      .withColumn("bit", expr("(shiftright(h, j) & 1)"))
      .groupBy("doc_id", "j")
      .agg(sum(col("bit") * 2 - 1).as("vote"))
      .groupBy("doc_id")
      .agg(sum(when(col("vote") >= 0, expr("shiftleft(1L, j)")).otherwise(lit(0L))).as("simhash"))

  val q24Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents),
       |bits AS (
       |  SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS vote
       |  FROM (SELECT doc_id, ${h60Sql("tok")} AS h FROM tok),
       |       (SELECT unnest(generate_series(0, 15)) AS j)
       |  GROUP BY doc_id, j)
       |SELECT doc_id,
       |  cast(sum(CASE WHEN vote >= 0 THEN (cast(1 as bigint) << j) ELSE 0 END) as bigint) AS simhash
       |FROM bits GROUP BY doc_id""".stripMargin

  /** Document fingerprinting: rolling char 8-gram hashes; keep the min
    * fingerprint + distinct count (winnowing-lite). */
  def q25DocFingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(length(col("text")) >= 8)
      .withColumn("g", explode(sequence(lit(1), length(col("text")) - 7)))
      .withColumn("fp", h60(col("text").substr(col("g"), lit(8))))
      .groupBy("doc_id")
      .agg(min(col("fp")).as("min_fp"), countDistinct(col("fp")).as("n_distinct_fp"))

  val q25Sql: String =
    s"""SELECT doc_id, min(fp) AS min_fp, count(DISTINCT fp) AS n_distinct_fp
       |FROM (
       |  SELECT doc_id, ${h60Sql("substr(text, g, 8)")} AS fp
       |  FROM (SELECT doc_id, text,
       |          unnest(generate_series(1, length(text) - 7)) AS g
       |        FROM documents WHERE length(text) >= 8))
       |GROUP BY doc_id""".stripMargin

  /** Dedup clusters: connected components over the LSH candidate pairs
    * (q23) by iterative min-label propagation, then canonical-doc
    * selection — the "pairs → clusters → keep one" step that turns
    * near-dup candidates into an actual dedup decision. Every document
    * is a node (docs in no pair are singleton clusters and kept), the
    * cluster id is the component's min doc_id, and exactly one doc per
    * cluster has keep = true.
    *
    * Scale shape (100 TB): the edge set is the LSH candidate pairs —
    * orders of magnitude smaller than the corpus, since only near-dup
    * candidates ever appear. Each round is one shuffle-on-key join
    * (edges ⋈ labels) + one groupBy — no all-pairs, no broadcast of
    * anything unbounded — and rounds are bounded by component diameter,
    * which for near-dup clusters is tiny (docs in one cluster share
    * band signatures transitively). localCheckpoint() per round
    * truncates the lineage: the classic iterative-Spark failure mode is
    * an exponentially growing plan, not the data. Rounds are
    * O(log diameter), not O(diameter): each round propagates over the
    * real edges AND the current label pointers (two-hop min-label — the
    * label-shortcutting idea behind large-star/small-star [Kiveris et
    * al., "Connected Components in MapReduce"], folded into the same
    * single join). Convergence is detected by the exact changed-row
    * count (labels only ever decrease, so changed == 0 is the fixpoint)
    * — one driver-side Long per round, never a collect of rows; the
    * round count of the last run is exported as `lastCcRounds` and
    * reported by Bench. */
  def q45DedupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = q23MinhashLsh(s, d)
    val nodes = documents(s, d).select("doc_id")
    val labels = connectedComponents(nodes, pairs, "doc_a", "doc_b")
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"), (col("doc_id") === col("label")).as("keep"))
  }

  /** Round count of the most recent connectedComponents run (driver-
    * side diagnostic; Bench reports it as `cc_rounds`). */
  val lastCcRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** TWO-HOP min-label propagation to fixpoint: every node ends with
    * the smallest node id in its connected component. `nodes` must
    * carry a long `doc_id` column; `pairs` the two endpoint columns
    * (undirected, endpoints need not appear in any particular order).
    * Returned frame: (doc_id, label). Reusable over any candidate-pair
    * source (LSH bands, phash buckets, embedding buckets).
    *
    * Each round joins the labels against the real edges UNION the
    * current label pointers (label(u) → u): a node therefore sees its
    * neighbors' labels AND label(label(u)) in the same min — pointer
    * jumping folded into the one join+groupBy, so the label graph's
    * depth roughly halves per round and rounds are O(log diameter)
    * instead of O(diameter) (ChainCc test: a 512-chain converges in
    * ≤ 12 rounds). Every propagated value is some same-component node's
    * label, so the fixpoint is exactly the plain propagation fixpoint:
    * the component min. */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          aCol: String, bCol: String): DataFrame = {
    // LAZY localCheckpoints (r6): the checkpoint still truncates lineage
    // and pins blocks, but materialization rides the FIRST action that
    // reads it — round 1's convergence count — instead of one eager job
    // per checkpoint. Jobs per q45 run drop from ~(3 + 2·rounds) to
    // ~(rounds + 2), which is also what makes the query robust on a
    // contended driver (each job is a scheduling round trip).
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .localCheckpoint(false)
    // the loop runs ONLY over pair-incident nodes: every other node is
    // a singleton whose label is itself, forever. At corpus scale this
    // is the load-bearing cut — 10^10 docs with a near-dup pair set
    // orders of magnitude smaller must not shuffle the corpus once per
    // round, only the connected subset.
    val inPairs = edges.select(col("u").as("doc_id")).distinct().localCheckpoint(false)
    // initial labels: a NARROW projection of the pinned inPairs — its
    // own checkpoint was a redundant materialization of the same rows
    var labels = inPairs
      .select(col("doc_id"), col("doc_id").as("label"))
    // fixpoint detection by EXACT changed-row count (labels only ever
    // decrease, so changed == 0 is the fixpoint) — not a label-sum
    // compare, which overflows Long at ~10^10 × 10^10-magnitude ids
    // (ANSI mode would throw; wraparound could falsely converge)
    // one two-hop propagation round as a PLAN (no materialization):
    // label pointers ride along as extra propagation edges — label(u)→u
    // hands u the value label(label(u)). Label values are themselves
    // node ids (initially self; afterwards mins over other labels), so
    // the join always finds them in `labels`.
    def round(l: DataFrame): DataFrame = {
      val aug = edges.unionByName(
        l.select(col("label").as("u"), col("doc_id").as("v")))
      val prop = aug
        .join(l.select(col("doc_id").as("u"), col("label").as("ulabel")), "u")
        .groupBy("v").agg(min("ulabel").as("nlabel"))
        .withColumnRenamed("v", "doc_id")
      // passthrough columns (e.g. the __old snapshot) ride along
      val keep = l.columns.filterNot(_ == "label").map(col).toSeq
      l.join(prop, Seq("doc_id"), "left")
        .select(keep :+
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"): _*)
    }
    var converged = false
    var rounds = 0
    // ONE job per round: the lazy checkpoint is materialized by the
    // convergence count itself (the count's job computes the step,
    // pins its blocks, and truncates lineage on job completion) — the
    // eager-checkpoint shape paid a second job per round just to read
    // the changed-row count off already-pinned blocks. (Fusing two
    // rounds per checkpoint was measured SLOWER at sf0.1 — the inner
    // round's subtree is referenced three times and ReuseExchange does
    // not collapse it under AQE — so the loop stays one-round-per-job.)
    while (!converged) {
      rounds += 1
      val step = round(labels.withColumn("__old", col("label")))
        .localCheckpoint(false)
      converged = step.filter(col("label") =!= col("__old")).count() == 0
      labels = step.drop("__old")
    }
    lastCcRounds.set(rounds)
    val singletons = nodes.join(inPairs, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("label"))
    labels.unionByName(singletons)
  }

  /** DuckDB twin: transitive closure by recursive CTE — reach(node,
    * label) enumerates every label that can reach node through the
    * undirected pair edges; min per node is the component min, i.e.
    * exactly the propagation fixpoint the Spark loop computes. */
  val q45Sql: String =
    s"""WITH RECURSIVE $lshPairCtes,
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
       |  UNION ALL
       |  SELECT doc_b AS u, doc_a AS v FROM lsh_pairs),
       |reach(node, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node),
       |cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node),
       |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY cluster_id)
       |SELECT cc.doc_id, cc.cluster_id, sizes.cluster_size,
       |  cc.doc_id = cc.cluster_id AS keep
       |FROM cc JOIN sizes USING (cluster_id)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_dedup_exact"     -> q20DedupExact _,
    "q21_ngram_jaccard"   -> q21NgramJaccard _,
    "q22_minhash_sig"     -> q22MinhashSig _,
    "q23_minhash_lsh"     -> q23MinhashLsh _,
    "q24_simhash"         -> q24Simhash _,
    "q25_doc_fingerprint" -> q25DocFingerprint _,
    "q45_dedup_clusters"  -> q45DedupClusters _,
  )

  val oracle: Map[String, String] = Map(
    "q20_dedup_exact"     -> q20Sql,
    "q21_ngram_jaccard"   -> q21Sql,
    "q22_minhash_sig"     -> q22Sql,
    "q23_minhash_lsh"     -> q23Sql,
    "q24_simhash"         -> q24Sql,
    "q25_doc_fingerprint" -> q25Sql,
    "q45_dedup_clusters"  -> q45Sql,
  )
}
