package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Text-analysis queries over `documents` — the training-data-pipeline
  * text ops (clean, token stats, quality score, language-ID) plus the
  * reference's caption-cleaning chain (utils/text_utils.py:28-45 →
  * SURVEY.md §2.8 X1-X6, §2.3 F2/F7).
  */
object Text {

  /** X1-X4 cleaning chain: strip <tags>, [brackets], newlines,
    * lower+trim, charset whitelist; F2 reject flag (digit/latin
    * detector is moot on this corpus, the whitelist is the op). */
  def q16TextClean(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("clean",
        trim(regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(lower(col("text")), "<[^>]*>", ""),
              "\\[[^\\]]*\\]", ""),
            "\\n", " "),
          "[^0-9a-zа-яё\\- ]", "")))
      .select(col("doc_id"), col("clean"), length(col("clean")).cast("long").as("clean_len"))

  val q16Sql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(text),
      |    '<[^>]*>', '', 'g'), '\[[^\]]*\]', '', 'g'), '\n', ' ', 'g'),
      |    '[^0-9a-zа-яё\- ]', '', 'g')) AS clean,
      |  length(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(text),
      |    '<[^>]*>', '', 'g'), '\[[^\]]*\]', '', 'g'), '\n', ' ', 'g'),
      |    '[^0-9a-zа-яё\- ]', '', 'g'))) AS clean_len
      |FROM documents""".stripMargin

  /** X6/F7: whitespace tokenization + token stats; min-words filter. */
  def q17TokenStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("token_chars", length(regexp_replace(col("text"), "\\s", "")).cast("long"))
      .filter(col("n_tokens") >= 5)
      .select(col("doc_id"), col("n_tokens"), col("token_chars"),
        round(col("token_chars").cast("double") / col("n_tokens"), 6).as("avg_token_len"))

  val q17Sql: String =
    """SELECT doc_id, n_tokens, token_chars,
      |  round(cast(token_chars as double) / n_tokens, 6) AS avg_token_len
      |FROM (SELECT doc_id,
      |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |    length(regexp_replace(text, '\s', '', 'g')) AS token_chars
      |  FROM documents)
      |WHERE n_tokens >= 5""".stripMargin

  /** Quality scoring: stopword ratio, hyphen/digit ratio, length band —
    * the is_bad_subs/is_bad_piece family recast for documents
    * (utils/text_utils.py:14-25, utils/audio_utils.py:11-33). */
  def q18QualityScore(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop", size(filter(col("toks"),
        t => t.isin("the", "a", "and", "of"))).cast("long"))
      .withColumn("stop_ratio", round(col("n_stop").cast("double") / col("n_tokens"), 6))
      .withColumn("len_ok", col("n_chars").between(100, 2000))
      .withColumn("quality",
        round(when(col("len_ok"), lit(1.0)).otherwise(lit(0.0)) *
          (lit(1.0) - col("stop_ratio")), 6))
      .select("doc_id", "n_tokens", "n_stop", "stop_ratio", "quality")

  val q18Sql: String =
    """SELECT doc_id, n_tokens, n_stop,
      |  round(cast(n_stop as double) / n_tokens, 6) AS stop_ratio,
      |  round((CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1.0 ELSE 0.0 END) *
      |        (1.0 - round(cast(n_stop as double) / n_tokens, 6)), 6) AS quality
      |FROM (SELECT doc_id, n_chars,
      |    len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
      |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |        t -> t IN ('the', 'a', 'and', 'of'))) AS n_stop
      |  FROM documents)""".stripMargin

  /** Language-ID by marker-token profile (n-gram heuristic family):
    * argmax of per-class marker counts with deterministic tiebreak. */
  def q19LangId(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .withColumn("c_en", size(filter(col("toks"), t => t.isin("the", "a", "and"))).cast("long"))
      .withColumn("c_code", size(filter(col("toks"), t => t.isin("spark", "sql", "query", "hash"))).cast("long"))
      .withColumn("c_data", size(filter(col("toks"), t => t.isin("table", "row", "column", "batch"))).cast("long"))
      .withColumn("lang_pred",
        when(col("c_en") >= col("c_code") && col("c_en") >= col("c_data"), "en")
          .when(col("c_code") >= col("c_data"), "code")
          .otherwise("data"))
      .select("doc_id", "c_en", "c_code", "c_data", "lang_pred")

  val q19Sql: String =
    """SELECT doc_id, c_en, c_code, c_data,
      |  CASE WHEN c_en >= c_code AND c_en >= c_data THEN 'en'
      |       WHEN c_code >= c_data THEN 'code'
      |       ELSE 'data' END AS lang_pred
      |FROM (SELECT doc_id,
      |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |        t -> t IN ('the','a','and'))) AS c_en,
      |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |        t -> t IN ('spark','sql','query','hash'))) AS c_code,
      |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |        t -> t IN ('table','row','column','batch'))) AS c_data
      |  FROM documents)""".stripMargin

  /** BPE-ish regex tokenization (the GPT-2 pre-tokenizer shape,
    * simplified to constructs Java regex and RE2 share — no lookahead,
    * and whitespace as an EXPLICIT class: Java's \s includes U+000B
    * vertical tab, RE2's does not, so \s itself is not cross-engine):
    * contraction suffixes | space?+letters | space?+digits |
    * space?+punct-run. Token counts from this pattern approximate BPE
    * token budgets well enough for corpus sizing, entirely map-side. */
  val WsClass: String = " \\t\\n\\f\\r" // chars both engines call whitespace
  val BpePattern: String =
    s"'(?:s|t|re|ve|m|ll|d)| ?[a-zа-яё]+| ?[0-9]+| ?[^${WsClass}a-zа-яё0-9]+"

  def q42BpeTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("pieces", regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0)))
      .withColumn("n_bpe", size(col("pieces")).cast("long"))
      .withColumn("n_ws", size(split(trim(col("text")), s"[$WsClass]+")).cast("long"))
      .select(col("doc_id"), col("n_bpe"), col("n_ws"),
        round(col("n_bpe").cast("double") / col("n_ws"), 6).as("bpe_per_word"),
        coalesce(try_element_at(col("pieces"), lit(1)), lit("")).as("first_piece"))

  /** The pattern starts with an apostrophe — double it for the SQL
    * string literal (DuckDB strings are not backslash-escaped, so the
    * regex backslashes pass through unchanged). */
  private val BpePatternSql: String = BpePattern.replace("'", "''")

  val q42Sql: String =
    s"""SELECT doc_id, n_bpe, n_ws,
       |  round(cast(n_bpe as double) / n_ws, 6) AS bpe_per_word,
       |  coalesce(pieces[1], '') AS first_piece
       |FROM (SELECT doc_id,
       |    regexp_extract_all(lower(text), '$BpePatternSql') AS pieces,
       |    len(regexp_extract_all(lower(text), '$BpePatternSql')) AS n_bpe,
       |    len(string_split_regex(trim(text), '[$WsClass]+')) AS n_ws
       |  FROM documents)""".stripMargin

  /** q47: deterministic stratified sampling — the corpus-MIXING op of
    * a training-data pipeline (per-source keep rates, e.g. upweight
    * curated sources, downsample bulk scrapes). The keep decision is a
    * pure hash threshold per row (`h60(doc_id || salt) mod 1000 <
    * rate`), so it is: reproducible across runs, partitions, and
    * engines (no RNG state, no seed-per-partition trap), stable under
    * repartitioning, and map-side only — at 100 TB the sample is a
    * filter fused into the scan, no shuffle, no driver coordination.
    * Rates per mille by source tier (src0-4 curated .. src15-19 bulk). */
  def q47StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val idx = substring(col("source"), 4, 6).cast("int")
    val rate = when(idx < 5, 900).when(idx < 10, 500)
      .when(idx < 15, 250).otherwise(100)
    documents(s, d)
      .withColumn("rate_per_mille", rate.cast("long"))
      .withColumn("bucket",
        pmod(h60(concat(col("doc_id").cast("string"), lit("#mix"))), lit(1000L)))
      .filter(col("bucket") < col("rate_per_mille"))
      .select("doc_id", "source", "rate_per_mille", "bucket")
  }

  val q47Sql: String =
    s"""SELECT doc_id, source, rate_per_mille, bucket
       |FROM (
       |  SELECT doc_id, source,
       |    cast(CASE WHEN idx < 5 THEN 900 WHEN idx < 10 THEN 500
       |              WHEN idx < 15 THEN 250 ELSE 100 END as bigint) AS rate_per_mille,
       |    ${h60Sql("concat(cast(doc_id as varchar), '#mix')")} % 1000 AS bucket
       |  FROM (SELECT doc_id, source, cast(substr(source, 4) as int) AS idx
       |        FROM documents))
       |WHERE bucket < rate_per_mille""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_text_clean"    -> q16TextClean _,
    "q17_token_stats"   -> q17TokenStats _,
    "q18_quality_score" -> q18QualityScore _,
    "q19_lang_id"       -> q19LangId _,
    "q42_bpe_tokens"    -> q42BpeTokens _,
    "q47_stratified_sample" -> q47StratifiedSample _,
  )

  val oracle: Map[String, String] = Map(
    "q16_text_clean"    -> q16Sql,
    "q17_token_stats"   -> q17Sql,
    "q18_quality_score" -> q18Sql,
    "q19_lang_id"       -> q19Sql,
    "q42_bpe_tokens"    -> q42Sql,
    "q47_stratified_sample" -> q47Sql,
  )
}
