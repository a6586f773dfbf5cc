package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossHash
import QueryUtil._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language-ID heuristic, content fingerprinting —
  * the per-document preprocessing stages of a training-data pipeline.
  *
  * Everything is a codegen'd built-in expression over one scan — no
  * UDFs, no shuffle except the final fingerprint aggregation (keyed by
  * doc_id, which is the natural partitioning for per-doc work at
  * 100 TB). Ratios are emitted as integer parts-per-million
  * (`floor(1e6·a/b)`), which is bit-identical across engines because
  * both divide the same exact integers in IEEE double.
  */
object TextQueries {

  private def toks: Column = split(col("text"), " ")

  // ------------------------------------------------------ token stats
  /** Whitespace + regex token counting with distinct ratio and a mean
    * token length in ppm.
    */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        size(regexp_extract_all(col("text"), lit("[a-z]{4,}"), lit(0)))
          .cast("long").as("n_long_tokens"),
        length(regexp_replace(col("text"), " ", "")).cast("long")
          .as("n_letter_chars"))
      .withColumn("mean_token_len_ppm",
        ppm(col("n_letter_chars"), col("n_tokens")))

  val textStatsSql: String =
    s"""SELECT doc_id, lang,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       |  CAST(len(regexp_extract_all(text, '[a-z]{4,}')) AS BIGINT) AS n_long_tokens,
       |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS n_letter_chars,
       |  ${sqlPpm("length(regexp_replace(text, ' ', '', 'g'))",
                   "len(string_split(text, ' '))")} AS mean_token_len_ppm
       |FROM documents""".stripMargin

  // --------------------------------------------- BPE-ish tokenization
  /** BPE-style pre-tokenization counting: the GPT-2 pre-tokenizer
    * shape reduced to its ASCII core — a token is a letter run, a
    * digit run, or a single non-alphanumeric glyph (`[a-z]+|[0-9]+|
    * [^a-z0-9 ]`). Subword models split INSIDE these pre-tokens, so
    * their count upper-bounds whitespace tokens and is the budget
    * number a training pipeline actually meters. Pure per-row regex
    * expressions — Java and RE2 agree on this alternation over the
    * all-ASCII corpus; one scan, no shuffle.
    */
  def textTokenBpe(spark: SparkSession, dir: String): DataFrame = {
    val pat = lit("[a-z]+|[0-9]+|[^a-z0-9 ]")
    val pieces = regexp_extract_all(col("text"), pat, lit(0))
    table(spark, dir, "documents")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_ws_tokens"),
        size(pieces).cast("long").as("n_bpe_pieces"),
        size(array_distinct(pieces)).cast("long").as("n_distinct_pieces"),
        aggregate(pieces, lit(0L), (acc, p) => acc + length(p))
          .as("piece_chars"))
      .withColumn("pieces_per_ws_token_ppm",
        ppm(col("n_bpe_pieces"), col("n_ws_tokens")))
  }

  val textTokenBpeSql: String = {
    val pieces = "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')"
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |  CAST(len($pieces) AS BIGINT) AS n_bpe_pieces,
       |  CAST(len(list_distinct($pieces)) AS BIGINT) AS n_distinct_pieces,
       |  CAST(COALESCE(list_sum(list_transform($pieces, p -> length(p))), 0)
       |    AS BIGINT) AS piece_chars,
       |  ${sqlPpm(s"len($pieces)", "len(string_split(text, ' '))")}
       |    AS pieces_per_ws_token_ppm
       |FROM documents""".stripMargin
  }

  // ---------------------------------------------------- heavy hitters
  /** Corpus heavy hitters: global top-20 tokens by frequency. The
    * plan is the one that survives a 100 TB corpus: partial (map-side)
    * counts per token → one shuffle keyed by token → global top-k as
    * TakeOrderedAndProject (per-partition heap, never a full sort).
    * Deterministic tiebreak on the token itself.
    */
  def textHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(explode(toks).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(20)

  val textHeavyHittersSql: String =
    """SELECT tok, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok
      |ORDER BY n DESC, tok ASC
      |LIMIT 20""".stripMargin

  // --------------------------------------------------- quality score
  /** Quality scoring: stopword ratio + lexical diversity → bucket.
    * The thresholds are arbitrary but fixed; what matters is that the
    * scoring pipeline (ratios → bucket) is the real shape of a
    * training-data quality filter.
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val stop = size(filter(toks, t => t === "the" || t === "a"))
    val base = table(spark, dir, "documents")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        stop.cast("long").as("n_stopwords"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("stop_ppm", ppm(col("n_stopwords"), col("n_tokens")))
      .withColumn("diversity_ppm", ppm(col("n_distinct"), col("n_tokens")))
    base.withColumn("quality",
      when(col("stop_ppm") > 120000, "low")
        .when(col("diversity_ppm") > 400000, "high")
        .otherwise("mid"))
  }

  val textQualitySql: String = {
    val stop = "len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a'))"
    val ntok = "len(string_split(text, ' '))"
    val ndis = "len(list_distinct(string_split(text, ' ')))"
    s"""WITH b AS (
       |  SELECT doc_id, CAST($ntok AS BIGINT) AS n_tokens,
       |    CAST($stop AS BIGINT) AS n_stopwords,
       |    CAST($ndis AS BIGINT) AS n_distinct,
       |    ${sqlPpm(stop, ntok)} AS stop_ppm,
       |    ${sqlPpm(ndis, ntok)} AS diversity_ppm
       |  FROM documents)
       |SELECT doc_id, n_tokens, n_stopwords, n_distinct, stop_ppm,
       |  diversity_ppm,
       |  CASE WHEN stop_ppm > 120000 THEN 'low'
       |       WHEN diversity_ppm > 400000 THEN 'high'
       |       ELSE 'mid' END AS quality
       |FROM b""".stripMargin
  }

  // -------------------------------------------------------- lang id
  /** Language-ID by character-bigram scoring: each candidate language
    * has a fixed marker-bigram set; score = total occurrences; argmax
    * with a fixed tie order. Tiny marker sets, but the real n-gram
    * scorer shape — swap in bigger tables for production.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he"),
    "fr" -> Seq("le", "ou"),
    "de" -> Seq("ch", "ei"),
    "es" -> Seq("el", "la"),
    "zh" -> Seq("sh", "ng"))

  // literal (non-regex) replace: same count semantics for plain bigrams,
  // no regex engine in the hot loop, no escaping concerns
  private def bigramCount(text: Column, bg: String): Column =
    ((length(text) - length(replace(text, lit(bg), lit("")))) / 2)
      .cast("long")

  private def sqlBigramCount(bg: String): String =
    s"CAST((length(text) - length(replace(text, '$bg', ''))) / 2 AS BIGINT)"

  /** Adds one `score_<lang>` column per candidate language to any
    * frame with a `text` column — factored so composed pipelines
    * (pipeline_e2e) run the IDENTICAL scorer as the standalone query.
    */
  private[analytics] def langScored(df: DataFrame): DataFrame =
    langMarkers.foldLeft(df) { case (d, (lang, bgs)) =>
      d.withColumn(s"score_$lang",
        bgs.map(bigramCount(col("text"), _)).reduce(_ + _))
    }

  /** The argmax language over [[langScored]]'s score columns.
    * foldRight keeps declaration order as tie-break priority (en
    * first); all-zero scores read as undetermined.
    */
  private[analytics] def langPred: Column = {
    val best = greatest(langMarkers.map(m => col(s"score_${m._1}")): _*)
    langMarkers.foldRight(lit("und")) { case ((lang, _), acc) =>
      when(col(s"score_$lang") === best && best > 0, lang).otherwise(acc)
    }
  }

  def textLangid(spark: SparkSession, dir: String): DataFrame =
    langScored(table(spark, dir, "documents")).select(
      (col("doc_id") +: col("lang").as("actual_lang") +:
        langMarkers.map(m => col(s"score_${m._1}"))) :+
        langPred.as("pred_lang"): _*)

  /** Shared oracle pieces of the langid scorer (the `s` CTE computing
    * per-language scores, and the argmax CASE) — used by both the
    * per-document query and the evaluation matrix so the classifier
    * definition can never drift between them.
    */
  /** The bare `(…) AS score_<lang>` select-list items — shared with
    * composed pipelines that need the scorer inline over a different
    * source relation.
    */
  private[analytics] val sqlLangScoreList: String =
    langMarkers.map { case (lang, bgs) =>
      s"(${bgs.map(sqlBigramCount).mkString(" + ")}) AS score_$lang"
    }.mkString(",\n  ")

  private val sqlLangScores: String =
    s"""s AS (
       |  SELECT doc_id, lang AS actual_lang,
       |  $sqlLangScoreList
       |  FROM documents)""".stripMargin

  private[analytics] val sqlLangPred: String = {
    val best = s"greatest(${langMarkers.map(m => s"score_${m._1}").mkString(", ")})"
    langMarkers.map { case (lang, _) =>
      s"WHEN score_$lang = $best AND $best > 0 THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
  }

  val textLangidSql: String =
    s"""WITH $sqlLangScores
       |SELECT doc_id, actual_lang,
       |  ${langMarkers.map(m => s"score_${m._1}").mkString(", ")},
       |  $sqlLangPred AS pred_lang
       |FROM s""".stripMargin

  // ------------------------------------------- langid evaluation
  /** Confusion matrix of the langid heuristic against the corpus's
    * ground-truth `lang` label — the classifier-quality monitor every
    * pipeline runs before trusting a filter: one (actual, predicted)
    * cell per combination that occurs, with the cell's share of its
    * actual row (recall decomposition) and of its predicted column
    * (precision decomposition) in exact ppm. The matrix is
    * vocabulary²-sized (≤ |langs|·|langs+1| cells) — every join after
    * the one corpus-size count aggregate is metadata-scale, and the
    * row/column totals broadcast.
    */
  def textLangidEval(spark: SparkSession, dir: String): DataFrame = {
    val pred = textLangid(spark, dir)
      .select(coalesce(col("actual_lang"), lit("<null>")).as("actual_lang"),
        col("pred_lang"))
    val cm = pred.groupBy(col("actual_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val rowT = cm.groupBy(col("actual_lang")).agg(sum(col("n")).as("n_actual"))
    val colT = cm.groupBy(col("pred_lang")).agg(sum(col("n")).as("n_pred"))
    cm.join(broadcast(rowT), "actual_lang")
      .join(broadcast(colT), "pred_lang")
      .select(col("actual_lang"), col("pred_lang"), col("n"),
        ppm(col("n"), col("n_actual")).as("share_of_actual_ppm"),
        ppm(col("n"), col("n_pred")).as("share_of_pred_ppm"))
      .orderBy(col("actual_lang"), col("pred_lang"))
  }

  val textLangidEvalSql: String =
    s"""WITH $sqlLangScores,
       |p AS (
       |  SELECT COALESCE(actual_lang, '<null>') AS actual_lang,
       |    $sqlLangPred AS pred_lang
       |  FROM s),
       |cm AS (
       |  SELECT actual_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM p GROUP BY 1, 2),
       |rt AS (SELECT actual_lang, CAST(SUM(n) AS BIGINT) AS n_actual
       |  FROM cm GROUP BY 1),
       |ct AS (SELECT pred_lang, CAST(SUM(n) AS BIGINT) AS n_pred
       |  FROM cm GROUP BY 1)
       |SELECT cm.actual_lang, cm.pred_lang, cm.n,
       |  ${sqlPpm("cm.n", "rt.n_actual")} AS share_of_actual_ppm,
       |  ${sqlPpm("cm.n", "ct.n_pred")} AS share_of_pred_ppm
       |FROM cm
       |JOIN rt USING (actual_lang)
       |JOIN ct USING (pred_lang)
       |ORDER BY actual_lang, pred_lang""".stripMargin

  // ---------------------------------------------------- fingerprint
  /** Document fingerprint: position-weighted token-hash sum mod P,
    * plus the content min-hash. Order-sensitive (swapping two tokens
    * changes it), associative-safe (sum of exact ints), and
    * cross-engine via [[CrossHash.md5Long]].
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        // per-term mod keeps every term < P, so the int64 sum is safe
        // up to ~2^32 tokens per doc (an unreduced P·pos term would
        // overflow ANSI Sum at ~92k tokens)
        ((CrossHash.md5Long(col("tok")) % CrossHash.P) *
          (col("pos") + 1) % CrossHash.P).as("term"),
        (CrossHash.md5Long(col("tok")) % CrossHash.P).as("h"))
      .groupBy(col("doc_id"))
      .agg((sum(col("term")) % CrossHash.P).as("fingerprint"),
        min(col("h")).as("min_hash"),
        count(lit(1)).as("n_tokens"))

  val textFingerprintSql: String = {
    val h = CrossHash.sqlMd5Long("t.toks[g.pos]")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |e AS (
       |  SELECT t.doc_id, g.pos, ($h % ${CrossHash.P}) AS h
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(t.toks))) AS pos) g)
       |SELECT doc_id, CAST(SUM(h * pos % ${CrossHash.P}) % ${CrossHash.P} AS BIGINT) AS fingerprint,
       |  MIN(h) AS min_hash, COUNT(*) AS n_tokens
       |FROM e GROUP BY doc_id""".stripMargin
  }

  /** Corpus-level adjacent-bigram statistics: count, marginals, and an
    * association ratio in ppm — the PMI shape with every operand an
    * exact integer (a log-based PMI would hit libm's cross-engine ulp
    * differences; the ratio `n_ab·N / (n_a·n_b)` doesn't). One explode
    * + three partial-aggregatable groupBys. The marginal joins carry
    * NO broadcast hint: the marginals are VOCABULARY-sized (10^8+
    * terms on a web corpus), so a forced broadcast is an executor OOM
    * at scale — a shuffle join on the term key is the right plan
    * there, and below the autoBroadcastJoinThreshold Catalyst/AQE
    * still broadcasts on its own. Only the 1-row `total` keeps the
    * hint.
    */
  def textCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val pairs = docs.select(posexplode(toks).as(Seq("pos", "tok")),
        col("doc_id"))
      .withColumn("next_tok", lead(col("tok"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .where(col("next_tok").isNotNull)
    val bigrams = pairs.groupBy(col("tok"), col("next_tok"))
      .agg(count(lit(1)).as("n_ab"))
    val left = pairs.groupBy(col("tok")).agg(count(lit(1)).as("n_a"))
    val right = pairs.groupBy(col("next_tok")).agg(count(lit(1)).as("n_b"))
    val total = pairs.agg(count(lit(1)).as("n_total"))
    bigrams
      .join(left, Seq("tok"))
      .join(right, Seq("next_tok"))
      .crossJoin(broadcast(total))
      .where(col("n_ab") >= 20)
      .select(col("tok"), col("next_tok"), col("n_ab"), col("n_a"),
        col("n_b"),
        ppm(col("n_ab") * col("n_total"), col("n_a") * col("n_b"))
          .as("assoc_ppm"))
  }

  val textCooccurrenceSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |p AS (
       |  SELECT doc_id, g.i AS pos, toks[g.i] AS tok, toks[g.i + 1] AS next_tok
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g),
       |bigrams AS (SELECT tok, next_tok, COUNT(*) AS n_ab FROM p GROUP BY 1, 2),
       |l AS (SELECT tok, COUNT(*) AS n_a FROM p GROUP BY 1),
       |r AS (SELECT next_tok, COUNT(*) AS n_b FROM p GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS n_total FROM p)
       |SELECT b.tok, b.next_tok, b.n_ab, l.n_a, r.n_b,
       |  ${sqlPpm("b.n_ab * tot.n_total", "l.n_a * r.n_b")} AS assoc_ppm
       |FROM bigrams b JOIN l USING (tok) JOIN r USING (next_tok), tot
       |WHERE b.n_ab >= 20""".stripMargin

  /** Inverted index: token → document frequency + the first 10 posting
    * doc_ids. The postings head is computed by [[graft.functions.BottomKAgg]],
    * a typed aggregator whose buffer is at most 10 longs, so reducer-side
    * state per token really is bounded and the partial buffers merge
    * map-side — the shape that survives a 100 TB corpus where a stopword's
    * full posting list (collect_list would buffer it whole before any
    * slice) wouldn't fit on one reducer.
    */
  def textInvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val bottomk = udaf(graft.functions.BottomKAgg(10))
    table(spark, dir, "documents")
      .select(explode(array_distinct(toks)).as("tok"), col("doc_id"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"),
        bottomk(col("doc_id")).as("postings_head"))
  }

  val textInvertedIndexSql: String =
    """WITH t AS (
      |  SELECT DISTINCT doc_id, u.tok
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |    LATERAL (SELECT unnest(toks) AS tok) u)
      |SELECT tok, COUNT(*) AS df,
      |  array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings_head
      |FROM t GROUP BY tok""".stripMargin

  // ------------------------------------------- repetition filters
  /** Repetition-based quality signals in the style of the Gopher /
    * MassiveText filters: duplicate-token ratio, duplicate-3-gram
    * ratio, and the fraction of all 2-grams taken by the single most
    * frequent 2-gram. High values mean boilerplate or degenerate
    * repetition — the standard cheap pre-filter before any model sees
    * the text. The n-gram ratios are pure array expressions (one scan,
    * no shuffle); the top-2-gram share needs one doc-keyed aggregation,
    * which is the natural partitioning for per-doc work at scale.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents").where(size(toks) >= 3)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val top = d.select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
      .withColumn("next_tok", lead(col("tok"), 1).over(w))
      .where(col("next_tok").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("next_tok"))
        .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("top_2gram_n"), sum(col("n")).as("n_2grams"))
    val tri = transform(sequence(lit(1), size(toks) - 2),
      i => concat_ws(" ", slice(toks, i, lit(3))))
    d.select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_tok_distinct"),
        size(tri).cast("long").as("n_3grams"),
        size(array_distinct(tri)).cast("long").as("n_3distinct"))
      .join(top, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        ppm(col("n_tokens") - col("n_tok_distinct"), col("n_tokens"))
          .as("dup_token_ppm"),
        ppm(col("n_3grams") - col("n_3distinct"), col("n_3grams"))
          .as("dup_3gram_ppm"),
        col("top_2gram_n").cast("long").as("top_2gram_n"),
        ppm(col("top_2gram_n"), col("n_2grams")).as("top_2gram_ppm"))
  }

  val textRepetitionSql: String = {
    val tri = "list_transform(generate_series(1, len(toks) - 2)," +
      " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |g2 AS (
       |  SELECT doc_id, toks[i.i] || ' ' || toks[i.i+1] AS bg
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) i),
       |c2 AS (SELECT doc_id, bg, COUNT(*) AS n FROM g2 GROUP BY 1, 2),
       |top AS (SELECT doc_id, CAST(MAX(n) AS BIGINT) AS top_2gram_n,
       |  CAST(SUM(n) AS BIGINT) AS n_2grams FROM c2 GROUP BY 1),
       |tri AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_tok_distinct,
       |    CAST(len($tri) AS BIGINT) AS n_3grams,
       |    CAST(len(list_distinct($tri)) AS BIGINT) AS n_3distinct
       |  FROM t)
       |SELECT tri.doc_id, tri.n_tokens,
       |  ${sqlPpm("tri.n_tokens - tri.n_tok_distinct", "tri.n_tokens")}
       |    AS dup_token_ppm,
       |  ${sqlPpm("tri.n_3grams - tri.n_3distinct", "tri.n_3grams")}
       |    AS dup_3gram_ppm,
       |  top.top_2gram_n,
       |  ${sqlPpm("top.top_2gram_n", "top.n_2grams")} AS top_2gram_ppm
       |FROM tri JOIN top ON tri.doc_id = top.doc_id""".stripMargin
  }

  // ------------------------------------------------------- TF-IDF
  /** Top-3 TF-IDF terms per document, with a LINEAR idf (`N/df`)
    * instead of the textbook `log(N/df)`: log goes through libm, whose
    * last-ulp rounding differs between engines, while `tf·N/(len·df)`
    * is one IEEE divide on exact integers — bit-identical everywhere.
    * Ranking by a monotone transform of idf preserves the top-k per
    * document for any fixed tf, and the pipeline shape (term explode →
    * doc-term counts → term document-frequency join → per-doc top-k)
    * is exactly the scaled one: both aggregations are single-key
    * shuffles, and the df table joins by term.
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    // corpus size as a broadcast 1-row aggregate (same lazy shape as
    // the oracle's `n AS (SELECT COUNT(*)...)` CTE) — no eager count
    // job at construction time
    val nDocs = d.agg(count(lit(1)).as("nd"))
    val tf = d.select(col("doc_id"), size(toks).as("doc_len"),
        explode(toks).as("term"))
      .groupBy(col("doc_id"), col("doc_len"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ppm(col("tf") * col("nd"), col("doc_len") * col("df"))
          .as("score_ppm"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 3)
  }

  // --------------------------------------------------------- BM25
  /** BM25 retrieval scoring of every document against a fixed query
    * term set — the ranking-function sibling of [[textTfidf]] and the
    * batch shape of a relevance-labelling stage (score a corpus against
    * a probe query, keep the best k). Standard Okapi parameters
    * k1 = 1.2, b = 0.75; the textbook `log`-IDF is replaced by the
    * same linear idf ratio [[textTfidf]] uses ((2N−2df+1)/(2df+1), the
    * Robertson argument without the log) so every arithmetic step is
    * IEEE +,·,/ on exact integers — correctly rounded and bit-identical
    * across engines, where libm's `log` is not.
    *
    * Scale shape: the token explode is map-side and the query-term
    * filter drops non-matching tokens before anything shuffles, so the
    * (doc, term) aggregation moves only matches (∝ matched docs × |Q|);
    * the df table is |Q| rows and the corpus length stats one row, both
    * broadcast; the final top-100 compiles to TakeOrderedAndProject —
    * nothing in the plan grows beyond the match set at 100 TB.
    */
  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    val qterms = Seq("query", "join", "stream")
    val d = table(spark, dir, "documents")
    val stats = d.agg(count(lit(1)).as("nd"),
      sum(size(toks).cast("long")).as("st"))
    val tf = d.select(col("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .where(col("term").isin(qterms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dd = (c: Column) => c.cast("double")
    // written in the exact operator order of the SQL twin: IEEE + , · ,
    // / are correctly rounded, so identical trees give identical bits
    val idf = dd(lit(2) * col("nd") - lit(2) * col("df") + lit(1)) /
      dd(lit(2) * col("df") + lit(1))
    val tfc = dd(col("tf")) * lit(2.2) /
      (dd(col("tf")) + lit(0.3) +
        lit(0.9) * dd(col("dl")) * dd(col("nd")) / dd(col("st")))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(lit(1e6) * idf * tfc).cast("long").as("score_ppm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("score_ppm")).as("bm25_ppm"))
      .orderBy(col("bm25_ppm").desc, col("doc_id").asc)
      .limit(100)
  }

  val textBm25Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |             CAST(SUM(len(toks)) AS BIGINT) AS st FROM t),
      |e AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, u.term
      |  FROM t, LATERAL (SELECT unnest(toks) AS term) u
      |  WHERE u.term IN ('query', 'join', 'stream')),
      |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM e GROUP BY 1, 2, 3),
      |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |sc AS (
      |  SELECT f.doc_id,
      |    CAST(FLOOR(1000000.0
      |      * (CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE)
      |         / CAST(2 * d.df + 1 AS DOUBLE))
      |      * (CAST(f.tf AS DOUBLE) * 2.2
      |         / (CAST(f.tf AS DOUBLE) + 0.3
      |            + 0.9 * CAST(f.dl AS DOUBLE) * CAST(s.nd AS DOUBLE)
      |              / CAST(s.st AS DOUBLE)))) AS BIGINT) AS score_ppm
      |  FROM tf f JOIN dfq d USING (term), s)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
      |  CAST(SUM(score_ppm) AS BIGINT) AS bm25_ppm
      |FROM sc GROUP BY doc_id
      |ORDER BY bm25_ppm DESC, doc_id ASC
      |LIMIT 100""".stripMargin

  val textTfidfSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |e AS (
       |  SELECT doc_id, len(toks) AS doc_len, u.term
       |  FROM t, LATERAL (SELECT unnest(toks) AS term) u),
       |tf AS (SELECT doc_id, doc_len, term, COUNT(*) AS tf
       |  FROM e GROUP BY 1, 2, 3),
       |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS nd FROM documents)
       |SELECT doc_id, term, tf, df, score_ppm, rnk FROM (
       |  SELECT f.doc_id, f.term, f.tf, d.df,
       |    ${sqlPpm("f.tf * n.nd", "f.doc_len * d.df")} AS score_ppm,
       |    row_number() OVER (PARTITION BY f.doc_id ORDER BY
       |      ${sqlPpm("f.tf * n.nd", "f.doc_len * d.df")} DESC,
       |      f.term ASC) AS rnk
       |  FROM tf f JOIN dfq d USING (term), n)
       |WHERE rnk <= 3""".stripMargin

  // --------------------------------------------- explode_outer
  /** Null-preserving lateral expansion: `explode_outer` keeps a row
    * (with NULL) for documents whose match list is empty, where plain
    * `explode` silently drops them — the difference between "no
    * matches" being observable and vanishing. The match pattern is
    * deliberately rare so both branches carry real rows.
    */
  def explodeOuterDocs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        explode_outer(regexp_extract_all(col("text"), lit("[a-z]*qu[a-z]*"),
          lit(0))).as("match"))

  val explodeOuterDocsSql: String =
    """SELECT doc_id, u.m AS match
      |FROM (
      |  SELECT doc_id, regexp_extract_all(text, '[a-z]*qu[a-z]*') AS l
      |  FROM documents),
      |  LATERAL (SELECT unnest(
      |    CASE WHEN len(l) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE l END)
      |    AS m) u""".stripMargin

  // ------------------------------------------------ PII scanning
  /** PII pattern scan — the redaction pre-pass every training-data
    * pipeline runs before anything else sees the text: per-document
    * counts of email-, phone-, IPv4- and long-numeric-ID-shaped
    * substrings plus a combined flag. The patterns avoid backslash
    * escapes entirely (character classes only) so the identical
    * pattern string is handed to both engines' regex libraries — no
    * escape-translation layer to drift. Pure per-row expressions: zero
    * shuffles at any corpus size, and the counts piggyback on a single
    * scan of the text column.
    */
  private val PiiEmail =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
  private val PiiPhone = "[0-9]{3}[-][0-9]{3,4}[-][0-9]{4}"
  private val PiiIpv4 =
    "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  private val PiiIdLike = "[0-9]{9,}"

  /** Match count of `pat` against an arbitrary text expression — the
    * ONE helper both the scan and the redactor (Scala + SQL sides)
    * share, so count semantics can never drift between the report and
    * the apply path.
    */
  private def piiCount(pat: String, textExpr: String = "text"): Column =
    size(expr(s"regexp_extract_all($textExpr, '$pat', 0)")).cast("long")

  private def sqlPiiCount(pat: String, textExpr: String = "text"): String =
    s"CAST(len(regexp_extract_all($textExpr, '$pat')) AS BIGINT)"

  /** Any-PII predicate over the four detector patterns — shared with
    * the provenance scorecard so "has PII" means the same thing in
    * every report ([[textPii]]'s has_pii column is this expression).
    */
  private[analytics] def hasPii: Column =
    piiCount(PiiEmail) + piiCount(PiiPhone) + piiCount(PiiIpv4) +
      piiCount(PiiIdLike) > 0

  private[analytics] def sqlHasPii: String =
    s"${sqlPiiCount(PiiEmail)} + ${sqlPiiCount(PiiPhone)} + " +
      s"${sqlPiiCount(PiiIpv4)} + ${sqlPiiCount(PiiIdLike)} > 0"

  def textPii(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        piiCount(PiiEmail).as("n_email"),
        piiCount(PiiPhone).as("n_phone"),
        piiCount(PiiIpv4).as("n_ipv4"),
        piiCount(PiiIdLike).as("n_idlike"),
        hasPii.as("has_pii"))
      .orderBy(col("doc_id"))

  val textPiiSql: String = {
    def n(pat: String): String = sqlPiiCount(pat)
    s"""SELECT doc_id,
       |  ${n(PiiEmail)} AS n_email,
       |  ${n(PiiPhone)} AS n_phone,
       |  ${n(PiiIpv4)} AS n_ipv4,
       |  ${n(PiiIdLike)} AS n_idlike,
       |  $sqlHasPii AS has_pii
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------ PII redaction APPLIED
  /** PII redaction applied — the write path [[textPii]] only reports
    * on: every match of the four detector patterns is replaced by a
    * typed placeholder, in a fixed pattern order (IP before bare-digit
    * runs, so an address is typed `<IP>`, not swallowed as `<ID>`).
    * Output carries the redaction count, the redacted length, and
    * md5(redacted_text) instead of the text itself — the result is a
    * verification report, not a second corpus (same contract as
    * [[PipelineQueries.pipelineRemoveChunks]]).
    *
    * Scale shape: pure per-row expressions inside whole-stage codegen
    * — no shuffle, no state; the ORDER BY exists only to keep the
    * result a deterministic report. Placeholders contain no digits, so
    * later patterns can never re-match inside an earlier replacement —
    * that invariant (not luck) is what makes the sequential fold
    * order-stable on both engines.
    */
  private val PiiRedactions = Seq(
    PiiEmail -> "<EMAIL>", PiiPhone -> "<PHONE>",
    PiiIpv4 -> "<IP>", PiiIdLike -> "<ID>")

  def textPiiRedact(spark: SparkSession, dir: String): DataFrame = {
    // count-as-you-fold: each pattern is counted against the text AS
    // IT STANDS when that pattern runs, so a span swallowed by an
    // earlier replacement (an id-run inside an email, an IP inside a
    // handle) is never double-counted — n_redacted is exactly the
    // number of spans replaced
    val (redacted, nRedacted) =
      PiiRedactions.foldLeft((col("text"), lit(0L))) {
        case ((t, n), (pat, repl)) =>
          (regexp_replace(t, pat, repl),
            n + size(regexp_extract_all(t, lit(pat), lit(0))).cast("long"))
      }
    table(spark, dir, "documents")
      .select(col("doc_id"),
        nRedacted.as("n_redacted"),
        length(redacted).cast("long").as("redacted_len"),
        md5(redacted.cast("binary")).as("redacted_hash"))
      .orderBy(col("doc_id"))
  }

  val textPiiRedactSql: String = {
    val steps = PiiRedactions.zipWithIndex.map { case ((pat, repl), i) =>
      s"""r${i + 1} AS (
         |  SELECT doc_id, regexp_replace(t, '$pat', '$repl', 'g') AS t,
         |    n + ${sqlPiiCount(pat, "t")} AS n
         |  FROM r$i)"""
    }
    s"""WITH r0 AS (
       |  SELECT doc_id, text AS t, CAST(0 AS BIGINT) AS n FROM documents),
       |${steps.mkString(",\n")}
       |SELECT doc_id, n AS n_redacted,
       |  CAST(length(t) AS BIGINT) AS redacted_len,
       |  md5(t) AS redacted_hash
       |FROM r${PiiRedactions.size}
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------ LM-frequency score
  /** Language-model-proxy scoring without a language model: each
    * document's mean CORPUS frequency of its token bigrams — the
    * integer-exact stand-in for the perplexity-bucket filter every
    * pretraining pipeline runs (CCNet shape). High mean frequency =
    * boilerplate made of corpus-common word pairs; low = rare/novel
    * text. A real perplexity needs log-probs (libm → ulp drift across
    * engines); the mean-count signal ranks documents the same
    * direction and stays exactly hash-checkable.
    *
    * Plan: one explode to (doc, bigram), ONE shuffle keyed by bigram
    * for corpus counts (map-side partial agg), a shuffled join back on
    * the bigram key — the count table is vocabulary²-sized so it is
    * NEVER broadcast (the advisor-flagged OOM class) — then a doc_id
    * regroup. Documents with fewer than 2 tokens have no bigrams and
    * drop out, mirrored exactly by the oracle.
    */
  def textLmScore(spark: SparkSession, dir: String): DataFrame = {
    val bg = table(spark, dir, "documents")
      .select(col("doc_id"), toks.as("ts"))
      .where(size(col("ts")) >= 2) // Spark sequence(0,-1) would DEscend
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("ts")) - 2),
          i => concat_ws(" ", element_at(col("ts"), (i + 1).cast("int")),
            element_at(col("ts"), (i + 2).cast("int"))))).as("bg"))
      .cache() // feeds both the corpus counts and the per-doc join
    val counts = bg.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    bg.join(counts, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cnt")).as("sum_freq"))
      .withColumn("mean_bigram_freq_x1e6",
        ppm(col("sum_freq"), col("n_bigrams")))
  }

  val textLmScoreSql: String =
    s"""WITH ts AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])) AS bg
       |  FROM ts),
       |counts AS (SELECT bg, COUNT(*) AS cnt FROM bg GROUP BY bg)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(cnt) AS BIGINT) AS sum_freq,
       |  ${sqlPpm("SUM(cnt)", "COUNT(*)")} AS mean_bigram_freq_x1e6
       |FROM bg JOIN counts USING (bg)
       |GROUP BY doc_id""".stripMargin

  // --------------------------------------- held-out backoff LM
  /** Stupid-backoff bigram language model with a REAL train/score
    * split: the model trains on the 90% of documents with
    * `doc_id % 10 ≠ 0` and scores the held-out 10% — so unseen
    * bigrams actually occur and the backoff path is exercised, unlike
    * a same-corpus score where every bigram trivially exists
    * ([[textLmScore]] is that in-corpus frequency baseline). Per
    * held-out position: `P(w₂|w₁) = cnt(w₁w₂)/cnt(w₁)` when the
    * bigram was seen, else the Brants stupid-backoff
    * `0.4 · cnt(w₂)/total` — both as exact integer-ratio ppm floors
    * (no libm log, so cross-engine bit-identical). Output per scored
    * doc: bigram count, how often it backed off, and the mean ppm.
    *
    * Scale shape: bigram and unigram count tables are
    * VOCABULARY-keyed, so their joins shuffle on the token key with
    * NO broadcast hint (10⁸+ terms on a web corpus would OOM a forced
    * broadcast — the [[textCooccurrence]] rule); the total is one
    * broadcast row; scoring is a per-row CASE and the rollup a
    * partial-aggregatable doc_id groupBy. Nothing holds unbounded
    * per-key state.
    */
  def textLmBackoff(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    def bigramsOf(df: DataFrame): DataFrame = df
      .select(col("doc_id"), toks.as("ts"))
      .where(size(col("ts")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("ts")) - 2),
          i => struct(element_at(col("ts"), (i + 1).cast("int")).as("w1"),
            element_at(col("ts"), (i + 2).cast("int")).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val dd = (c: Column) => c.cast("double")
    val trainDocs = d.where(col("doc_id") % 10 =!= 0)
    val bgCnt = bigramsOf(trainDocs)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bc"))
    val trainToks = trainDocs.select(explode(toks).as("w"))
    val uni = trainToks.groupBy(col("w")).agg(count(lit(1)).as("uc"))
    val tot = trainToks.agg(count(lit(1)).as("tt"))
    bigramsOf(d.where(col("doc_id") % 10 === 0))
      .join(bgCnt, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("uc").as("uc1")),
        Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("uc").as("uc2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        // seen bigram implies seen w1, so uc1 is never null here
        when(col("bc").isNotNull,
          floor(lit(1e6) * dd(col("bc")) / dd(col("uc1"))))
          .otherwise(floor(lit(4e5) * dd(coalesce(col("uc2"), lit(0L))) /
            dd(col("tt"))))
          .cast("long").as("p_ppm"),
        col("bc").isNull.cast("long").as("backoff"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("backoff")).as("n_backoff"),
        floor(dd(sum(col("p_ppm"))) / dd(count(lit(1)))).cast("long")
          .as("lm_ppm"))
  }

  val textLmBackoffSql: String =
    """WITH tr AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE doc_id % 10 <> 0),
      |te AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE doc_id % 10 = 0),
      |trb AS (
      |  SELECT t[i] AS w1, t[i + 1] AS w2
      |  FROM tr, LATERAL (SELECT unnest(generate_series(1, len(t) - 1))
      |    AS i) g),
      |bc AS (SELECT w1, w2, COUNT(*) AS bc FROM trb GROUP BY 1, 2),
      |tru AS (SELECT unnest(t) AS w FROM tr),
      |uni AS (SELECT w, COUNT(*) AS uc FROM tru GROUP BY w),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM tru),
      |teb AS (
      |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      |  FROM te, LATERAL (SELECT unnest(generate_series(1, len(t) - 1))
      |    AS i) g),
      |sc AS (
      |  SELECT e.doc_id,
      |    CASE WHEN b.bc IS NOT NULL
      |      THEN CAST(floor(1000000.0 * CAST(b.bc AS DOUBLE)
      |        / CAST(u1.uc AS DOUBLE)) AS BIGINT)
      |      ELSE CAST(floor(400000.0 * CAST(COALESCE(u2.uc, 0) AS DOUBLE)
      |        / CAST(t.tt AS DOUBLE)) AS BIGINT) END AS p_ppm,
      |    CASE WHEN b.bc IS NULL THEN 1 ELSE 0 END AS backoff
      |  FROM teb e
      |  LEFT JOIN bc b ON e.w1 = b.w1 AND e.w2 = b.w2
      |  LEFT JOIN uni u1 ON e.w1 = u1.w
      |  LEFT JOIN uni u2 ON e.w2 = u2.w
      |  CROSS JOIN tot t)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(backoff) AS BIGINT) AS n_backoff,
      |  CAST(floor(CAST(SUM(p_ppm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
      |    AS BIGINT) AS lm_ppm
      |FROM sc GROUP BY doc_id""".stripMargin

  // --------------------------------------- interpolated Kneser-Ney LM
  /** Interpolated Kneser-Ney bigram LM on the same 90/10 held-out
    * split as [[textLmBackoff]] — the smoothing that actually ships in
    * n-gram LMs (Chen & Goodman 1999): absolute discount D = 0.75 on
    * the seen-bigram mass, redistributed through the CONTINUATION
    * distribution (how many distinct contexts a word follows, not how
    * often it occurs — the "San Francisco" correction):
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *            + (D · N₁₊(w₁·)/c(w₁·)) · (N₁₊(·w₂)/|bigram types|)
    *
    * with full backoff to the continuation term for unseen contexts.
    * Every ingredient is an exact integer off the train bigram-count
    * table; the probability is ONE identically-parenthesized double
    * expression in both engines (products of exact small ints, IEEE
    * division — bit-deterministic, same discipline as [[QueryUtil
    * .ppm]]), floored to ppm per position, mean-floored per doc.
    *
    * Scale shape: identical to [[textLmBackoff]] — all derived tables
    * (counts, contexts, continuation fan-ins) are VOCABULARY-keyed
    * with no broadcast hints; `|bigram types|` is one broadcast row;
    * the train bigram table is cached across its four derivations and
    * released in `finally`.
    */
  def textLmKneserNey(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    def bigramsOf(df: DataFrame): DataFrame = df
      .select(col("doc_id"), toks.as("ts"))
      .where(size(col("ts")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("ts")) - 2),
          i => struct(element_at(col("ts"), (i + 1).cast("int")).as("w1"),
            element_at(col("ts"), (i + 2).cast("int")).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val dd = (c: Column) => c.cast("double")
    val bgCnt = bigramsOf(d.where(col("doc_id") % 10 =!= 0))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bc"))
    bgCnt.cache() // context, fan-in, type-count, and the score join
    try {
      // c(w₁·) as the CONTEXT total (Σ over following words) and
      // N₁₊(w₁·) as the distinct-continuation count — both straight
      // off the distinct-pair count table
      val ctx = bgCnt.groupBy(col("w1"))
        .agg(sum(col("bc")).as("ctx1"), count(lit(1)).as("n1f"))
      val rev = bgCnt.groupBy(col("w2")).agg(count(lit(1)).as("n1r"))
      val types = bgCnt.agg(count(lit(1)).as("btypes"))
      val pcont = dd(coalesce(col("n1r"), lit(0L))) / dd(col("btypes"))
      bigramsOf(d.where(col("doc_id") % 10 === 0))
        .join(bgCnt, Seq("w1", "w2"), "left")
        .join(ctx, Seq("w1"), "left")
        .join(rev, Seq("w2"), "left")
        .crossJoin(broadcast(types))
        .select(col("doc_id"),
          when(col("ctx1").isNotNull,
            floor(lit(1e6) * (
              greatest(dd(coalesce(col("bc"), lit(0L))) - lit(0.75),
                lit(0.0)) / dd(col("ctx1")) +
                ((lit(0.75) * dd(col("n1f"))) / dd(col("ctx1"))) * pcont)))
            .otherwise(floor(lit(1e6) * pcont))
            .cast("long").as("p_ppm"),
          col("ctx1").isNull.cast("long").as("unseen"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("unseen")).as("n_unseen_ctx"),
          floor(dd(sum(col("p_ppm"))) / dd(count(lit(1)))).cast("long")
            .as("kn_ppm"))
        // 10% of the corpus — small; materialize before the cache drops
        .localCheckpoint(true)
    } finally bgCnt.unpersist()
  }

  val textLmKneserNeySql: String = {
    val pcont =
      "(CAST(COALESCE(r.n1r, 0) AS DOUBLE) / CAST(t.btypes AS DOUBLE))"
    s"""WITH tr AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |  WHERE doc_id % 10 <> 0),
       |te AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |  WHERE doc_id % 10 = 0),
       |trb AS (
       |  SELECT t[i] AS w1, t[i + 1] AS w2
       |  FROM tr, LATERAL (SELECT unnest(generate_series(1, len(t) - 1))
       |    AS i) g),
       |bc AS (SELECT w1, w2, COUNT(*) AS bc FROM trb GROUP BY 1, 2),
       |ctx AS (SELECT w1, SUM(bc) AS ctx1, COUNT(*) AS n1f
       |  FROM bc GROUP BY w1),
       |rev AS (SELECT w2, COUNT(*) AS n1r FROM bc GROUP BY w2),
       |ty AS (SELECT CAST(COUNT(*) AS BIGINT) AS btypes FROM bc),
       |teb AS (
       |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
       |  FROM te, LATERAL (SELECT unnest(generate_series(1, len(t) - 1))
       |    AS i) g),
       |sc AS (
       |  SELECT e.doc_id,
       |    CASE WHEN c.ctx1 IS NOT NULL
       |      THEN CAST(floor(1000000.0 * (
       |        greatest(CAST(COALESCE(b.bc, 0) AS DOUBLE) - 0.75, 0.0)
       |          / CAST(c.ctx1 AS DOUBLE) +
       |        ((0.75 * CAST(c.n1f AS DOUBLE)) / CAST(c.ctx1 AS DOUBLE))
       |          * $pcont)) AS BIGINT)
       |      ELSE CAST(floor(1000000.0 * $pcont) AS BIGINT) END AS p_ppm,
       |    CASE WHEN c.ctx1 IS NULL THEN 1 ELSE 0 END AS unseen
       |  FROM teb e
       |  LEFT JOIN bc b ON e.w1 = b.w1 AND e.w2 = b.w2
       |  LEFT JOIN ctx c ON e.w1 = c.w1
       |  LEFT JOIN rev r ON e.w2 = r.w2
       |  CROSS JOIN ty t)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(unseen) AS BIGINT) AS n_unseen_ctx,
       |  CAST(floor(CAST(SUM(p_ppm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
       |    AS BIGINT) AS kn_ppm
       |FROM sc GROUP BY doc_id""".stripMargin
  }

  // --------------------------------- per-source distribution distance
  /** Per-source TOKEN-DISTRIBUTION DIVERGENCE from the corpus: the
    * total-variation distance between each source's unigram
    * distribution and the whole-corpus distribution — the mixture
    * diagnostic that says WHICH source's language is off before any
    * model sees it (a crawl gone template-heavy or language-drifted
    * moves its unigram mass; TV is the worst-case probability gap any
    * event can show). Chosen over KL/JS precisely because it needs no
    * logarithm: with integer counts, TV = Σ|cnt_s·N − cnt_c·n_s| /
    * (2·n_s·N) has an EXACT integer numerator — computed in
    * DECIMAL(38,0) (DuckDB: HUGEINT) so the products survive
    * petabyte-scale token counts where int64 would overflow — and the
    * single final division is one IEEE op on identical exact operands
    * in both engines.
    *
    * Scale shape: one corpus tokenize → (source, token) partial-
    * aggregating count (the same shuffle any per-source vocab needs),
    * a vocabulary-keyed join of source counts against corpus counts
    * (outer: a token a source never emits still contributes its
    * corpus mass), and a per-source fold — no broadcast of anything
    * vocabulary-sized.
    */
  def textSourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val tok = table(spark, dir, "documents")
      .select(col("source"), explode(toks).as("w"))
    val bySrc = tok.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("cs"))
    val corpus = tok.groupBy(col("w")).agg(count(lit(1)).as("cc"))
    val nSrc = tok.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val total = tok.count()
    // outer join on the vocab key: tokens missing from a source count
    // |0·N − cc·ns| = cc·ns — the mass the source fails to cover
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val full = nSrc.crossJoin(corpus)
      .join(bySrc, Seq("source", "w"), "left_outer")
      .select(col("source"), col("ns"),
        abs(coalesce(col("cs"), lit(0L)).cast(dec) * lit(total) -
          col("cc").cast(dec) * col("ns")).as("num"))
    full.groupBy(col("source"))
      .agg(max(col("ns")).as("n_tokens"), sum(col("num")).as("tv_num"))
      .select(col("source"), col("n_tokens"),
        floor(lit(1e6) * col("tv_num").cast("double") /
          (lit(2.0) * col("n_tokens").cast("double") * lit(total.toDouble)))
          .cast("long").as("tv_ppm"))
  }

  val textSourceDivergenceSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |bysrc AS (SELECT source, w, COUNT(*) AS cs FROM tok GROUP BY 1, 2),
      |corpus AS (SELECT w, COUNT(*) AS cc FROM tok GROUP BY w),
      |nsrc AS (SELECT source, COUNT(*) AS ns FROM tok GROUP BY source),
      |tot AS (SELECT COUNT(*) AS n FROM tok),
      |fl AS (
      |  SELECT s.source, s.ns,
      |    abs(CAST(COALESCE(b.cs, 0) AS HUGEINT) * (SELECT n FROM tot)
      |      - CAST(c.cc AS HUGEINT) * s.ns) AS num
      |  FROM nsrc s CROSS JOIN corpus c
      |  LEFT JOIN bysrc b ON b.source = s.source AND b.w = c.w)
      |SELECT source, CAST(MAX(ns) AS BIGINT) AS n_tokens,
      |  CAST(floor(1e6 * CAST(SUM(num) AS DOUBLE)
      |    / (2.0 * CAST(MAX(ns) AS DOUBLE)
      |       * CAST((SELECT n FROM tot) AS DOUBLE))) AS BIGINT) AS tv_ppm
      |FROM fl GROUP BY source""".stripMargin

  // ------------------------------------------------ Count-Min sketch
  /** Count-Min sketch over corpus tokens, with its guarantees measured
    * in-band: [[CmDepth]] affine hash rows × [[CmWidth]] cells (the
    * shared CrossHash family, so both engines place every token in the
    * identical cells), point estimates for the exact top-20 tokens as
    * `min` over rows. The sketch NEVER undercounts (est ≥ exact, the
    * CM guarantee) — `overcount = est − exact ≥ 0` rides along per
    * token so the gate itself proves it.
    *
    * Scale shape: ONE corpus pass — the groupBy(token) collapses the
    * corpus to its VOCABULARY (partial-aggregating, the same shuffle
    * the exact top-20 needs anyway); the ×[[CmDepth]] explode and the
    * [[CmDepth]]·[[CmWidth]] = 4096-cell rollup then run over
    * frequency-weighted vocab rows, so sketch-build work scales with
    * |vocab|, not corpus tokens (a weighted insert is CM's update
    * semantics exactly). Partial aggregation still collapses each
    * partition to ≤4096 rows before the cell shuffle — the property
    * that makes CM THE streaming/distributed counting summary
    * (constant state at any corpus size; the streaming Misra–Gries
    * twin lives in StreamHeavyHitters).
    */
  val CmDepth = 4
  val CmWidth = 1024L

  def sketchCountmin(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "documents")
      .select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .cache() // sketch build + exact top-20 both read the vocab table
    try {
      val h = CrossHash.md5Long(col("tok"))
      val cells = counts.select(col("n"),
        posexplode(array((0 until CmDepth).map(d =>
          CrossHash.affine(h, d) % CmWidth): _*)).as(Seq("d", "cell")))
        .groupBy(col("d"), col("cell"))
        .agg(sum(col("n")).as("cellcount"))
      val top = counts.orderBy(col("n").desc, col("tok").asc).limit(20)
      val probes = top.select(col("tok"), col("n"),
        posexplode(array((0 until CmDepth).map(d =>
          CrossHash.affine(CrossHash.md5Long(col("tok")), d) % CmWidth): _*))
          .as(Seq("pd", "pcell")))
      probes.join(broadcast(cells),
          col("pd") === col("d") && col("pcell") === col("cell"))
        .groupBy(col("tok"), col("n"))
        .agg(min(col("cellcount")).as("est_n"))
        .withColumn("overcount", col("est_n") - col("n"))
        .orderBy(col("n").desc, col("tok").asc)
        .localCheckpoint(true) // 20 rows; frees the vocab cache below
    } finally counts.unpersist()
  }

  val sketchCountminSql: String = {
    val h = CrossHash.sqlMd5Long("tok")
    val cell = s"((${CrossHash.sqlCoefA("d.d")} * (($h) % ${CrossHash.P}) " +
      s"+ ${CrossHash.sqlCoefB("d.d")}) % ${CrossHash.P}) % $CmWidth"
    s"""WITH tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |dd AS (SELECT unnest(generate_series(0, ${CmDepth - 1})) AS d),
       |cells AS (
       |  SELECT d.d, $cell AS cell, COUNT(*) AS cellcount
       |  FROM tok, dd d GROUP BY 1, 2),
       |top AS (
       |  SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok
       |  ORDER BY n DESC, tok ASC LIMIT 20),
       |probes AS (
       |  SELECT t.tok, t.n, d.d AS pd, $cell AS pcell
       |  FROM (SELECT tok, n FROM top) t, dd d),
       |est AS (
       |  SELECT p.tok, p.n, MIN(c.cellcount) AS est_n
       |  FROM probes p JOIN cells c ON p.pd = c.d AND p.pcell = c.cell
       |  GROUP BY p.tok, p.n)
       |SELECT tok, n, CAST(est_n AS BIGINT) AS est_n,
       |  CAST(est_n - n AS BIGINT) AS overcount
       |FROM est
       |ORDER BY n DESC, tok ASC""".stripMargin
  }

  // ----------------------------------- BPE tokenizer merge round
  /** One round of BPE tokenizer TRAINING — the pair-counting + merge
    * step (Sennrich et al.) that text_token_bpe's pre-tokenizer
    * feeds: adjacent character-pair frequencies weighted by word
    * frequency, the top candidates ranked deterministically
    * (count DESC, pair ASC — the random tiebreak replaced), and for
    * each candidate the number of merges that would ACTUALLY apply
    * (non-overlapping left-to-right, exactly `replace()` semantics in
    * both engines — 'aaa' counts two 'aa' pair positions but admits
    * only one merge; shipping both numbers pins that BPE subtlety).
    *
    * Scale shape: training runs on the WORD-FREQUENCY table, not the
    * corpus — one shuffle collapses the corpus to its vocabulary,
    * pair counting aggregates to the alphabet² key space, and the
    * apply-count joins the 10 candidates back against the vocabulary
    * as a broadcast. Corpus size only affects the first aggregate.
    */
  def textBpeMerge(spark: SparkSession, dir: String): DataFrame = {
    val words = table(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .cache() // feeds pair counting AND the apply-count join
    val top = words
      .select(col("w"), col("wc"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("wc")).as("pair_count"),
        countDistinct(col("w")).as("n_words"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(10)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pair_count").desc, col("pair"))).cast("long"))
    words.crossJoin(broadcast(top)) // 10 candidates stream past the vocab
      .groupBy(col("rank"), col("pair"), col("pair_count"), col("n_words"))
      .agg(sum(col("wc") *
        (length(col("w")) - length(expr("replace(w, pair, '_')"))))
        .as("applied"))
      .orderBy(col("rank"))
  }

  val textBpeMergeSql: String =
    """WITH words AS (
      |  SELECT w, COUNT(*) AS wc FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) >= 2 GROUP BY w),
      |pairs AS (
      |  SELECT substring(w, i, 2) AS pair, w, wc
      |  FROM words, LATERAL (SELECT unnest(generate_series(1,
      |    length(w) - 1)) AS i) s),
      |top AS (
      |  SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_count,
      |    COUNT(DISTINCT w) AS n_words
      |  FROM pairs GROUP BY pair
      |  ORDER BY pair_count DESC, pair LIMIT 10),
      |ranked AS (
      |  SELECT pair, pair_count, n_words,
      |    ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS rank
      |  FROM top)
      |SELECT rank, pair, pair_count, n_words,
      |  CAST(SUM(wc * (length(w) - length(replace(w, pair, '_'))))
      |    AS BIGINT) AS applied
      |FROM ranked, words
      |GROUP BY rank, pair, pair_count, n_words
      |ORDER BY rank""".stripMargin

  // ----------------------------------- BPE tokenizer training loop
  /** Multi-round BPE tokenizer TRAINING — the full Sennrich loop that
    * [[textBpeMerge]]'s single round previews: [[BpeRounds]] rounds of
    * (count adjacent pairs over the evolving segmentation → pick the
    * top pair → apply the merge), emitting the merge table a real
    * tokenizer build produces — per round the chosen pair, its
    * weighted occurrence count, the number of merges that actually
    * applied, and the corpus token count after the round.
    *
    * The merge is TRUE greedy left-to-right BPE, not a string
    * `replace` (which corrupts token boundaries once multi-char
    * tokens exist: pair `b·c` must not fire inside tokens `ab·c`).
    * Formulated relationally so both engines execute it identically:
    * explode each word's segmentation to (pos, tok) rows, mark
    * candidate positions (`tok=A ∧ next=B`), group CONSECUTIVE
    * candidates into islands (`pos − running-candidate-count` is
    * constant inside a run), and merge the even offsets of each
    * island — exactly the positions a left-to-right scan merges,
    * including the `A=B` chain case (`a a a a` → `aa aa`, never
    * `aa a a`). A merged position's successor row is dropped and the
    * survivors reassemble ordered by position.
    *
    * Scale shape: the corpus collapses to its word-frequency table
    * once (the only corpus-sized shuffle); every round then works on
    * vocabulary×word-length rows keyed by the word — pair counting is
    * a partial-aggregating groupBy to the token-pair key space, the
    * argmax is one TakeOrderedAndProject row broadcast back, and the
    * merge windows all share the word partitioning (one exchange,
    * reused across the round's four window stages). Nothing after
    * the first aggregate grows with corpus size; the merge table the
    * loop emits IS the trained artifact a tokenizer service ships.
    * The oracle is a GENERATED unrolled-CTE program sharing
    * [[BpeRounds]], so the engines cannot disagree on round count.
    */
  val BpeRounds = 4

  def textBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val cachedFrames = scala.collection.mutable.ArrayBuffer[DataFrame]()
    try {
      val (reports, vocab) = bpeTrainLoop(spark, dir, cachedFrames)
      // the trainer IS the vocabulary's nightly build job: republish
      // the final word→segmentation through the artifact seam every
      // run (honest training cost stays in this query's bench slot),
      // so text_bpe_apply and every other consumer ride the publish
      // instead of lazily re-training. The write evaluates straight
      // off the loop's caches (still alive here) — no separate
      // checkpoint pass over the vocabulary
      SessionArtifact.rebuild(spark, dir, "bpe_vocab")(vocab)
      // eager: 4 metadata rows; lets the finally release every cache
      reports.reduce(_ unionAll _).orderBy(col("round")).localCheckpoint(true)
    } finally cachedFrames.foreach(_.unpersist())
  }

  /** The trainer loop shared by [[textBpeTrain]] (which ships the
    * per-round report) and [[textBpeApply]] (which ships the FINAL
    * word→segmentation the merges produce). Returns the round
    * reports and the final vocabulary segmentation; every frame it
    * caches lands in `cachedFrames` for the caller's finally.
    */
  private def bpeTrainLoop(spark: SparkSession, dir: String,
      cachedFrames: scala.collection.mutable.ArrayBuffer[DataFrame])
      : (Seq[DataFrame], DataFrame) = {
    {
      // `seq` stays an ARRAY across rounds (the string form is built
      // once at the end for the published artifact): the old string
      // join → split round-trip rebuilt and re-tokenized every word's
      // segmentation once per round for nothing.
      var cur = table(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) >= 2)
        .groupBy(col("w")).agg(count(lit(1)).as("wc"))
        .withColumn("seq",
          split(trim(regexp_replace(col("w"), "(.)", "$1 ")), " "))
      val wWin = Window.partitionBy(col("w")).orderBy(col("pos"))
      val reports = (1 to BpeRounds).map { r =>
        val tk = cur
          .select(col("w"), col("wc"),
            posexplode(col("seq")).as(Seq("pos", "tok")))
          .withColumn("nxt", lead(col("tok"), 1).over(wWin))
          .cache() // feeds the pair argmax AND the merge pass
        cachedFrames += tk
        val top1 = tk.where(col("nxt").isNotNull)
          .groupBy(col("tok").as("pa"), col("nxt").as("pb"))
          .agg(sum(col("wc")).as("pair_count"))
          .orderBy(col("pair_count").desc,
            concat(col("pa"), lit(" "), col("pb")).asc)
          .limit(1) // TakeOrderedAndProject: one row leaves the cluster
        // candidate marking → island grouping → even-offset merge.
        // The island-first cidx is carried FORWARD along the same
        // (w, pos) ordering every other window here uses (a run start
        // is a candidate whose predecessor is not; last(_, ignoreNulls)
        // propagates its cidx through the run) — the previous
        // min-over-(w, pos−cidx) spelling forced a second in-partition
        // SORT by (w, grp) plus a third back to (w, pos) per round.
        // Equal by construction: distinct candidate runs can never
        // share a (pos − cidx) value, so the min over that island IS
        // the run-first cidx.
        val marked = tk.crossJoin(broadcast(top1))
          .withColumn("cand", coalesce(
            col("tok") === col("pa") && col("nxt") === col("pb"),
            lit(false)))
          .withColumn("cidx", sum(when(col("cand"), 1L).otherwise(0L))
            .over(wWin.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
        val runFirst = last(
          when(col("cand") &&
            !coalesce(lag(col("cand"), 1).over(wWin), lit(false)),
            col("cidx")), ignoreNulls = true)
          .over(wWin.rowsBetween(Window.unboundedPreceding,
            Window.currentRow))
        val merged = marked
          .withColumn("mrg",
            col("cand") && (col("cidx") - runFirst) % 2 === 0)
          .withColumn("skip",
            coalesce(lag(col("mrg"), 1).over(wWin), lit(false)))
          .cache() // feeds the round report AND the reassembly
        cachedFrames += merged
        val repR = merged
          .withColumn("pair", concat(col("pa"), lit(" "), col("pb")))
          .groupBy(col("pair"), col("pair_count"))
          .agg(sum(when(col("mrg"), col("wc")).otherwise(0L)).as("applied"),
            sum(when(!col("skip"), col("wc")).otherwise(0L))
              .as("tokens_after"))
          .select(lit(r.toLong).as("round"), col("pair"), col("pair_count"),
            col("applied"), col("tokens_after"))
        cur = merged.where(!col("skip"))
          .withColumn("out",
            when(col("mrg"), concat(col("pa"), col("pb")))
              .otherwise(col("tok")))
          .groupBy(col("w"), col("wc"))
          .agg(expr(
            "transform(array_sort(collect_list(struct(pos, out)))," +
              " s -> s.out)").as("seq"))
        repR
      }
      // artifact/oracle surface keeps the space-joined string form
      (reports, cur.withColumn("seq", array_join(col("seq"), " ")))
    }
  }

  // ------------------------------------- BPE tokenizer applied
  /** The trained tokenizer APPLIED — [[textBpeTrain]] learns the
    * merge table; this reads the trained word→segmentation table (a
    * session artifact published through the manifest sink — built once
    * by the same loop, the shape a tokenizer service actually ships)
    * and tokenizes the corpus with it, shipping the per-source bill:
    * word and piece counts, fertility (pieces per word, exact ppm)
    * and the compression the merges bought vs character-level
    * tokenization. The number a pretraining-budget owner actually
    * pays for — `text_fertility` reports it for the FIXED GPT-2-style
    * pre-tokenizer; this one reports it for the tokenizer this corpus
    * trained.
    *
    * Tokenization is a JOIN, not a re-derivation: the corpus's words
    * look up their final segmentation in the trained vocabulary (the
    * loop's last state — one vocabulary-keyed shuffle join; words
    * under the trainer's 2-char floor tokenize to themselves via the
    * left join's COALESCE). Both engines run the identical generated
    * loop, so segmentations — and therefore every count — hash-match.
    */
  def textBpeApply(spark: SparkSession, dir: String): DataFrame = {
    // the trained vocabulary is a SESSION ARTIFACT: text_bpe_train is
    // the gated trainer (full loop, benched honestly every run); the
    // apply job reads the published word→segmentation table — a
    // tokenizer service ships the merge table, it does not retrain per
    // tokenization batch. The full-loop oracle below re-proves the
    // published segmentation every verify run.
    val seg = SessionArtifact.table(spark, dir, "bpe_vocab") {
      val cachedFrames = scala.collection.mutable.ArrayBuffer[DataFrame]()
      try {
        bpeTrainLoop(spark, dir, cachedFrames)._2
          // eager while the loop caches are alive; vocab-sized
          .localCheckpoint(true)
      } finally cachedFrames.foreach(_.unpersist())
    }.select(col("w"), size(split(col("seq"), " ")).cast("long")
      .as("n_pieces"))
    val words = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("w"))
    words.join(seg, Seq("w"), "left")
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(coalesce(col("n_pieces"), lit(1L))).as("n_pieces"),
        sum(length(col("w")).cast("long")).as("n_chars"))
      .withColumn("fertility_ppm", ppm(col("n_pieces"), col("n_words")))
      .withColumn("compression_ppm", ppm(col("n_pieces"), col("n_chars")))
  }

  /** Shared generated CTE body (`words`, `w0`, the [[BpeRounds]]
    * round blocks) reused verbatim by [[textBpeTrainSql]] and
    * [[textBpeApplySql]] so the two programs can never train
    * different tokenizers.
    */
  private lazy val sqlBpeCtes: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val p = r - 1
      s"""tk$r AS (
         |  SELECT w, wc,
         |    unnest(generate_series(1, len(string_split(seq, ' ')))) AS pos,
         |    unnest(string_split(seq, ' ')) AS tok
         |  FROM w$p),
         |tl$r AS (
         |  SELECT *, lead(tok) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |  FROM tk$r),
         |top$r AS (
         |  SELECT tok AS pa, nxt AS pb, CAST(SUM(wc) AS BIGINT) AS pair_count
         |  FROM tl$r WHERE nxt IS NOT NULL
         |  GROUP BY tok, nxt
         |  ORDER BY pair_count DESC, tok || ' ' || nxt ASC LIMIT 1),
         |c1$r AS (
         |  SELECT t.*, p.pa, p.pb, p.pair_count,
         |    COALESCE(t.tok = p.pa AND t.nxt = p.pb, FALSE) AS cand
         |  FROM tl$r t, top$r p),
         |c2$r AS (
         |  SELECT *,
         |    SUM(CASE WHEN cand THEN 1 ELSE 0 END) OVER (PARTITION BY w
         |      ORDER BY pos ROWS UNBOUNDED PRECEDING) AS cidx
         |  FROM c1$r),
         |c3$r AS (SELECT *, pos - cidx AS grp FROM c2$r),
         |c4$r AS (
         |  SELECT *, cand AND ((cidx - MIN(CASE WHEN cand THEN cidx END)
         |    OVER (PARTITION BY w, grp)) % 2 = 0) AS mrg
         |  FROM c3$r),
         |c5$r AS (
         |  SELECT *, COALESCE(lag(mrg) OVER (PARTITION BY w ORDER BY pos),
         |    FALSE) AS skip
         |  FROM c4$r),
         |rep$r AS (
         |  SELECT CAST($r AS BIGINT) AS round, pa || ' ' || pb AS pair,
         |    pair_count,
         |    CAST(SUM(CASE WHEN mrg THEN wc ELSE 0 END) AS BIGINT) AS applied,
         |    CAST(SUM(CASE WHEN NOT skip THEN wc ELSE 0 END) AS BIGINT)
         |      AS tokens_after
         |  FROM c5$r GROUP BY pa, pb, pair_count),
         |w$r AS (
         |  SELECT w, wc, string_agg(CASE WHEN mrg THEN pa || pb ELSE tok END,
         |    ' ' ORDER BY pos) AS seq
         |  FROM c5$r WHERE NOT skip GROUP BY w, wc)""".stripMargin
    }.mkString(",\n")
    s"""words AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wc FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) >= 2 GROUP BY w),
       |w0 AS (
       |  SELECT w, wc, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq
       |  FROM words),
       |$rounds""".stripMargin
  }

  val textBpeTrainSql: String = {
    val unions = (1 to BpeRounds).map(r => s"SELECT * FROM rep$r")
      .mkString("\nUNION ALL\n")
    s"""WITH $sqlBpeCtes
       |$unions
       |ORDER BY round""".stripMargin
  }

  val textBpeApplySql: String =
    s"""WITH $sqlBpeCtes,
       |seg AS (
       |  SELECT w, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_pieces
       |  FROM w$BpeRounds),
       |toks AS (
       |  SELECT d.doc_id, d.source, unnest(string_split(d.text, ' ')) AS w
       |  FROM documents d),
       |j AS (
       |  SELECT t.doc_id, t.source, t.w,
       |    COALESCE(s.n_pieces, 1) AS np
       |  FROM toks t LEFT JOIN seg s ON t.w = s.w)
       |SELECT source,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  COUNT(*) AS n_words,
       |  CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(length(w)) AS BIGINT) AS n_chars,
       |  ${sqlPpm("SUM(np)", "COUNT(*)")} AS fertility_ppm,
       |  ${sqlPpm("SUM(np)", "SUM(length(w))")} AS compression_ppm
       |FROM j GROUP BY source""".stripMargin
  /** Histogram quantile sketch — the MERGEABLE distributed-quantile
    * primitive (the role t-digest/KLL play in real engines, in the
    * deterministic equi-width form both engines reproduce exactly):
    * one map-side-combinable aggregate collapses any corpus to ≤ 256
    * bucket counts, quantiles are then rank-interpolated inside the
    * covering bucket in pure integer arithmetic. The in-band `exact_*`
    * columns re-derive each quantile with the engines' EXACT
    * percentile (which must gather a group's values — the very cost
    * the sketch exists to avoid at 100 TB) and publish the sketch's
    * error in ppm, so the approximation quality ships with the answer.
    *
    * Joins after the histogram are all on ≤ 256-row metadata;
    * `t − 1 − cum_prev` is the rank offset inside the covering bucket
    * and the interpolation divide is exact integer `div`.
    */
  // bucket width: 256 buckets cover prices < 131 072 — comfortably
  // past the ~105 000 price ceiling, so the clamp bucket stays empty.
  // Error contract: vs the rank-t ORDER STATISTIC the sketch is
  // within one bucket width by construction (the statistic lies in
  // the covering bucket). The in-band exact_* columns interpolate at
  // rank q·(n−1)+1, which on data with a wide value gap under a
  // quantile can sit below the covering bucket — on this table
  // adjacent order statistics are dense, so the one-bucket bound
  // holds for the interpolated value too (asserted in spec for THIS
  // data, not claimed universally).
  val QW = 512L

  def sketchQuantile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = table(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("x"))
      .cache() // feeds the histogram, the count, and the exact check
    val hist = li
      .groupBy(least(floor(col("x") / QW).cast("long"), lit(255L)).as("b"))
      .agg(count(lit(1)).as("n_b"))
    val wb = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum", sum(col("n_b")).over(wb))
      .withColumn("cum_prev", col("cum") - col("n_b"))
    val n = li.agg(count(lit(1)).as("n_total"))
    // ONE array-percentile pass: a single aggregation buffer instead
    // of three (measured 3× on the dominant cost of this query —
    // the exact check is the expensive half the sketch exists to
    // replace, so it shouldn't pay per-quantile)
    val exact = li.agg(percentile(col("x"),
      array(lit(0.5), lit(0.9), lit(0.99))).as("es"))
      .select(col("es")(0).as("e50"), col("es")(1).as("e90"),
        col("es")(2).as("e99"))
    Seq(0.5, 0.9, 0.99).toDF("q")
      .crossJoin(broadcast(n))
      .withColumn("t",
        least(floor(col("q") * col("n_total")).cast("long") + 1,
          col("n_total")))
      .join(broadcast(cum),
        col("cum_prev") < col("t") && col("cum") >= col("t"))
      .withColumn("est",
        col("b") * QW + expr(s"((t - 1 - cum_prev) * $QW) div n_b"))
      .crossJoin(broadcast(exact))
      .withColumn("exact_cents",
        floor(when(col("q") === 0.5, col("e50"))
          .when(col("q") === 0.9, col("e90"))
          .otherwise(col("e99")) * 100).cast("long"))
      .select(col("q"), col("t"), col("est"), col("exact_cents"),
        ppm(abs(col("est") * 100 - col("exact_cents")),
          col("exact_cents")).as("err_ppm"))
  }

  val sketchQuantileSql: String =
    s"""WITH x AS (SELECT l_extendedprice AS x FROM lineitem),
       |hist AS (
       |  SELECT least(CAST(floor(x / $QW) AS BIGINT), 255) AS b,
       |    COUNT(*) AS n_b
       |  FROM x GROUP BY 1),
       |cum AS (
       |  SELECT b, n_b,
       |    CAST(SUM(n_b) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cum
       |  FROM hist),
       |cum2 AS (SELECT b, n_b, cum, cum - n_b AS cum_prev FROM cum),
       |nt AS (SELECT COUNT(*) AS n_total FROM x),
       |qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
       |  CAST(0.99 AS DOUBLE)]) AS q),
       |tg AS (
       |  SELECT q,
       |    least(CAST(floor(q * n_total) AS BIGINT) + 1, n_total) AS t
       |  FROM qs, nt),
       |est AS (
       |  SELECT q, t,
       |    b * $QW + ((t - 1 - cum_prev) * $QW) // n_b AS est
       |  FROM tg JOIN cum2 ON cum_prev < t AND cum >= t),
       |ex AS (
       |  SELECT quantile_cont(x, 0.5) AS e50, quantile_cont(x, 0.9) AS e90,
       |    quantile_cont(x, 0.99) AS e99
       |  FROM x),
       |sc AS (
       |  SELECT q, t, est,
       |    CAST(floor((CASE WHEN q = 0.5 THEN e50 WHEN q = 0.9 THEN e90
       |      ELSE e99 END) * 100) AS BIGINT) AS exact_cents
       |  FROM est, ex)
       |SELECT q, t, est, exact_cents,
       |  ${sqlPpm("abs(est * 100 - exact_cents)", "exact_cents")} AS err_ppm
       |FROM sc""".stripMargin

  // --------------------------------------- vocabulary coverage / OOV
  /** Tokenizer-vocabulary coverage per source: build the top-
    * [[VocabK]] corpus vocabulary (count DESC, token ASC — the
    * deterministic tiebreak makes the cut exact in both engines) and
    * report, per source, total tokens, in-vocabulary tokens, coverage
    * ppm, and distinct out-of-vocabulary TYPES — the
    * "will this tokenizer fragment this source into bytes" number a
    * mixing decision needs BEFORE training on a new source.
    *
    * Scale shape: one vocabulary-keyed count (partial-aggregatable),
    * the top-K cut compiles to TakeOrderedAndProject (per-partition
    * heaps, no global sort), and the membership join is against the
    * K-row BOUNDED broadcast — the token stream itself shuffles only
    * for the per-source rollup keys. The distinct-OOV count runs on
    * (source, token) pairs, vocabulary-bounded on the in-vocab side.
    */
  val VocabK = 1024

  def textVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(VocabK)
      .select(col("tok"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_vocab"), lit(0L))).as("n_in_vocab"),
        countDistinct(when(col("in_vocab").isNull, col("tok")))
          .as("n_oov_types"))
      .select(col("source"), col("n_tokens"), col("n_in_vocab"),
        col("n_oov_types"),
        ppm(col("n_in_vocab"), col("n_tokens")).as("coverage_ppm"))
  }

  val textVocabCoverageSql: String =
    s"""WITH tk AS (
       |  SELECT source, u.tok
       |  FROM (SELECT source, string_split(text, ' ') AS ts
       |        FROM documents) t,
       |    LATERAL (SELECT unnest(ts) AS tok) u),
       |v AS (
       |  SELECT tok, 1 AS in_vocab FROM (
       |    SELECT tok, COUNT(*) AS c FROM tk GROUP BY 1
       |    ORDER BY c DESC, tok LIMIT $VocabK)),
       |j AS (
       |  SELECT tk.source, tk.tok, v.in_vocab
       |  FROM tk LEFT JOIN v ON tk.tok = v.tok)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(COALESCE(in_vocab, 0)) AS BIGINT) AS n_in_vocab,
       |  CAST(COUNT(DISTINCT CASE WHEN in_vocab IS NULL THEN tok END)
       |    AS BIGINT) AS n_oov_types,
       |  ${sqlPpm("SUM(COALESCE(in_vocab, 0))", "COUNT(*)")}
       |    AS coverage_ppm
       |FROM j GROUP BY source""".stripMargin

  // --------------------------------------------- tokenizer fertility
  /** Per-source tokenizer fertility: pieces emitted per whitespace
    * word under the BPE-ish pre-tokenizer, plus the mean piece
    * length — the "will tokenization inflate this source's token
    * bill" table read NEXT TO [[textVocabCoverage]] when weighting a
    * mixture (coverage says how much is out-of-vocabulary; fertility
    * says how many pieces even the in-vocabulary text costs; a
    * source can be fine on one and terrible on the other). All exact
    * integer sums over [[textTokenBpe]]'s per-document counts — the
    * per-doc and per-source views can never disagree.
    *
    * Scale shape: the per-doc scorer is pure per-row expressions in
    * the scan; this adds one partial-aggregating groupBy to
    * |sources| rows and a broadcast-able doc→source attach.
    */
  def textFertility(spark: SparkSession, dir: String): DataFrame =
    textTokenBpe(spark, dir)
      .join(table(spark, dir, "documents").select(col("doc_id"),
        col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws_tokens")).as("ws_tokens"),
        sum(col("n_bpe_pieces")).as("bpe_pieces"),
        sum(col("piece_chars")).as("piece_chars"))
      .withColumn("fertility_ppm", ppm(col("bpe_pieces"), col("ws_tokens")))
      .withColumn("mean_piece_len_ppm",
        ppm(col("piece_chars"), col("bpe_pieces")))

  val textFertilitySql: String =
    s"""WITH t AS ($textTokenBpeSql)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(t.n_ws_tokens) AS BIGINT) AS ws_tokens,
       |  CAST(SUM(t.n_bpe_pieces) AS BIGINT) AS bpe_pieces,
       |  CAST(SUM(t.piece_chars) AS BIGINT) AS piece_chars,
       |  ${sqlPpm("SUM(t.n_bpe_pieces)", "SUM(t.n_ws_tokens)")}
       |    AS fertility_ppm,
       |  ${sqlPpm("SUM(t.piece_chars)", "SUM(t.n_bpe_pieces)")}
       |    AS mean_piece_len_ppm
       |FROM t JOIN documents d ON t.doc_id = d.doc_id
       |GROUP BY d.source""".stripMargin

  // ------------------------------------- synthetic-text watermark scan
  /** Kirchenbauer-style watermark detection over the corpus — the scan
    * a training pipeline runs to keep WATERMARKED MODEL OUTPUT out of
    * its data. The scheme's detector needs no model: token i is
    * "green" iff hash(prev_token, token) lands in the green half of
    * the vocabulary partition seeded by its predecessor (γ = 1/2), so
    * un-watermarked text greens ~half its bigram transitions while a
    * watermarked generator greens nearly all of them. Per doc:
    * scored transitions T, green count g, and the one-proportion
    * z-score (2g − T)/√T in millesimals — every operand an exact
    * integer, √ and ÷ correctly-rounded IEEE, so the score is
    * bit-identical across engines. `flagged` uses z ≥ 2 (the
    * screening threshold; production detection uses z ≥ 4 on longer
    * spans — at γT this small the loose threshold keeps the flag
    * non-vacuous on clean text, where ~2% false-positive by design).
    *
    * Scale: a pure per-row array fold inside whole-stage codegen —
    * one scan, zero shuffles, zero joins; the 100 TB cost is the read.
    */
  def textWatermark(spark: SparkSession, dir: String): DataFrame = {
    val t = toks
    val n = size(t)
    val green = size(filter(sequence(lit(2), n),
      i => CrossHash.md5Long(
        concat(element_at(t, i - 1), lit("|"), element_at(t, i))) % 2 === 0))
    table(spark, dir, "documents")
      .select(col("doc_id"),
        (n - 1).cast("long").as("n_scored"),
        when(n >= 2, green).otherwise(0).cast("long").as("n_green"))
      .select(col("doc_id"), col("n_scored"), col("n_green"),
        when(col("n_scored") >= 1,
          floor(lit(1000) *
            (lit(2) * col("n_green") - col("n_scored")).cast("double") /
            sqrt(col("n_scored").cast("double"))).cast("long"))
          .otherwise(0L).as("z_mille"))
      .withColumn("flagged",
        when(col("z_mille") >= 2000, 1L).otherwise(0L))
  }

  val textWatermarkSql: String = {
    val h = CrossHash.sqlMd5Long("toks[i-1] || '|' || toks[i]")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    CAST(len(toks) - 1 AS BIGINT) AS n_scored,
       |    CAST(CASE WHEN len(toks) >= 2 THEN
       |      len(list_filter(generate_series(2, len(toks)),
       |        i -> $h % 2 = 0))
       |    ELSE 0 END AS BIGINT) AS n_green
       |  FROM t)
       |SELECT doc_id, n_scored, n_green,
       |  CASE WHEN n_scored >= 1 THEN
       |    CAST(FLOOR(1000 * CAST(2 * n_green - n_scored AS DOUBLE)
       |      / sqrt(CAST(n_scored AS DOUBLE))) AS BIGINT)
       |  ELSE 0 END AS z_mille,
       |  CAST(CASE WHEN (CASE WHEN n_scored >= 1 THEN
       |    CAST(FLOOR(1000 * CAST(2 * n_green - n_scored AS DOUBLE)
       |      / sqrt(CAST(n_scored AS DOUBLE))) AS BIGINT)
       |  ELSE 0 END) >= 2000 THEN 1 ELSE 0 END AS BIGINT) AS flagged
       |FROM g""".stripMargin
  }

  // --------------------------------------- vocabulary growth (Heaps)
  /** Vocabulary saturation over ingest order — the Heaps-law curve a
    * corpus owner reads before paying for more crawl: cut the corpus
    * into ten doc-id-range slices (ingest order IS the id order, so a
    * slice is "the next 10% of data collected"), and for each slice
    * report documents/tokens added, NEW vocabulary first seen there,
    * and the cumulative type-token ratio. A flat `new_terms` tail says
    * more of the same crawl buys no diversity; a linear one says the
    * corpus is still growing its vocabulary.
    *
    * All-integer: a term's first occurrence is `min(doc_id)` — exact,
    * order-independent — and slice membership is
    * `⌊10·id/(max_id+1)⌋`, a pure range rule that needs no
    * corpus-sized sort or window (the count-decile alternative would
    * ntile-sort every doc; id ranges are the shard boundaries a real
    * ingest already has). Plan: one vocabulary aggregation with
    * map-side combine (the only corpus-sized shuffle, |vocab| rows
    * out), one per-doc scan folded straight to 10 rows, cumulative
    * windows over the 10-row frame; max_id rides in as 1-row
    * broadcast aggregates.
    */
  def textVocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val maxId = docs.agg(max(col("doc_id")).as("mx"))
    // exact INTEGER division (`div`), matching the oracle's `//` at any
    // id scale — the double-typed Divide+floor twin would drift once
    // 10·doc_id exceeds 2^53
    def bucketOf(id: String): Column =
      expr(s"CAST((10 * $id) div (mx + 1) AS BIGINT)")
    val perSlice = docs.crossJoin(maxId) // 1-row broadcast
      .select(bucketOf("doc_id").as("bucket"),
        size(col("toks")).cast("long").as("n_toks"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val firstSeen = docs
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("term")).agg(min(col("doc_id")).as("first_seen"))
    val newTerms = firstSeen.crossJoin(maxId)
      .select(bucketOf("first_seen").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_terms"))
    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    perSlice.join(newTerms, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_terms"))
      .withColumn("cum_docs", sum(col("n_docs")).over(cum))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(cum))
      .withColumn("cum_vocab", sum(col("new_terms")).over(cum))
      .withColumn("ttr_ppm", ppm(col("cum_vocab"), col("cum_tokens")))
      .orderBy(col("bucket"))
  }

  val textVocabGrowthSql: String =
    s"""WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
       |d AS (
       |  SELECT CAST(doc_id * 10 // (mx + 1) AS BIGINT) AS bucket,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
       |  FROM documents, mx),
       |db AS (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens
       |  FROM d GROUP BY 1),
       |fs AS (
       |  SELECT term, MIN(doc_id) AS first_seen FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |    FROM documents) GROUP BY 1),
       |tb AS (
       |  SELECT CAST(first_seen * 10 // ((SELECT mx FROM mx) + 1)
       |      AS BIGINT) AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS new_terms
       |  FROM fs GROUP BY 1),
       |j AS (
       |  SELECT db.bucket, db.n_docs, db.n_tokens,
       |    COALESCE(tb.new_terms, 0) AS new_terms
       |  FROM db LEFT JOIN tb ON db.bucket = tb.bucket)
       |SELECT bucket, n_docs, n_tokens, new_terms,
       |  CAST(SUM(n_docs) OVER w AS BIGINT) AS cum_docs,
       |  CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
       |  CAST(SUM(new_terms) OVER w AS BIGINT) AS cum_vocab,
       |  ${sqlPpm("SUM(new_terms) OVER w", "SUM(n_tokens) OVER w")}
       |    AS ttr_ppm
       |FROM j
       |WINDOW w AS (ORDER BY bucket
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY bucket""".stripMargin

  // ------------------------------------------------ TextRank keywords
  /** TextRank keyword scoring (Mihalcea & Tarau, EMNLP 2004 — public
    * paper): build the word co-occurrence graph (undirected, window
    * ≤[[TextrankWindow]] positions, corpus-summed edge weights) and
    * power-iterate the damped weighted PageRank
    * `S(v) = (1−d) + d·Σ_u w(u,v)/W(u)·S(u)` for [[TextrankRounds]]
    * rounds, all in exact integer micro-units: per-edge contribution
    * is `(S(u)·w) div W(u)`, the damping fold
    * `150000 + (850000·Σ) div 1e6` — no libm, bit-identical
    * cross-engine. Output: the [[TextrankTopK]] highest-scored words
    * with score and rank, the keyword table a corpus card ships.
    *
    * Scale shape: the position frame explodes once and self-joins on
    * (doc_id, pos+off) — an equi join co-partitioned by doc, window-
    * bounded rows; edges aggregate map-side to a VOCABULARY²-bounded
    * frame (never broadcast — the textCooccurrence rule); each
    * iteration is one edge-keyed join + word-keyed aggregate over
    * vocabulary-sized frames, checkpointed so the plan stays flat.
    * Unlike [[graft.analytics.EventQueries.eventsMarkovStationary]]
    * (driver-folded over the TYPE-pair matrix, bounded by a dozen
    * types), the word graph is vocabulary-sized — 10⁷ vertices on a
    * web corpus — so the iteration stays distributed. The final
    * ranking top-k's the vocabulary frame (TakeOrderedAndProject,
    * plan-pinned) before any global window forms.
    */
  val TextrankRounds = 5
  val TextrankWindow = 2
  /** Report cap: the final ranking keeps the top-k words only, so the
    * tail compiles to TakeOrderedAndProject (O(k) per partition)
    * instead of a single-partition global row_number over the whole
    * vocabulary — at web-corpus vocabulary sizes that window was the
    * query's only single-partition stage. Far above the test corpora's
    * 31-word vocabulary, so every oracle hash is unchanged; the
    * row_number that assigns ordinals afterwards runs over ≤k rows.
    */
  val TextrankTopK = 1000

  def textTextrank(spark: SparkSession, dir: String): DataFrame = {
    // pairs come straight off the token array (one codegen'd explode
    // per offset — no corpus self-join, no cache): for offset k, the
    // (i, i+k) word pairs of every document
    val d = table(spark, dir, "documents")
    val pairs = (1 to TextrankWindow).map { off =>
      d.where(size(toks) > off)
        .select(explode(transform(sequence(lit(0), size(toks) - 1 - off),
          i => struct(
            least(element_at(toks, (i + 1).cast("int")),
              element_at(toks, (i + 1 + off).cast("int"))).as("u"),
            greatest(element_at(toks, (i + 1).cast("int")),
              element_at(toks, (i + 1 + off).cast("int"))).as("v"))))
          .as("p"))
        .where(col("p.u") =!= col("p.v"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
    }.reduce(_ unionByName _)
    val und = pairs.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("w"))
    val sym = und.unionByName(
      und.select(col("v").as("u"), col("u").as("v"), col("w")))
      .localCheckpoint(true)
    val wsum = sym.groupBy(col("u")).agg(sum(col("w")).as("wtot"))
    val verts = sym.select(col("u")).distinct()
    var s = verts.withColumn("score", lit(1000000L))
      .localCheckpoint(true)
    for (_ <- 1 to TextrankRounds) {
      val contrib = sym.join(s, "u").join(wsum, "u")
        .select(col("v"),
          expr("(score * w) div wtot").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("inflow"))
      s = verts.join(contrib, col("u") === col("v"), "left_outer")
        .select(col("u"),
          (lit(150000L) +
            expr("(850000 * coalesce(inflow, 0L)) div 1000000"))
            .as("score"))
        .localCheckpoint(true)
    }
    // top-k the vocabulary-sized score frame (TakeOrderedAndProject),
    // THEN number the survivors — the global window touches ≤k rows
    val w = Window.orderBy(col("score").desc, col("word").asc)
    s.select(col("u").as("word"), col("score"))
      .orderBy(col("score").desc, col("word").asc)
      .limit(TextrankTopK)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  val textTextrankSql: String = {
    val offs = (1 to TextrankWindow).map { off =>
      s"""SELECT LEAST(a.w, b.w) AS u, GREATEST(a.w, b.w) AS v
         |FROM tp a JOIN tp b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + $off
         |WHERE a.w <> b.w""".stripMargin
    }.mkString("\nUNION ALL\n")
    val rounds = (1 to TextrankRounds).map { r =>
      s"""c$r AS (
         |  SELECT e.v, CAST(SUM((s.score * e.w) // ws.wtot) AS BIGINT)
         |    AS inflow
         |  FROM sym e JOIN s${r - 1} s ON e.u = s.u
         |  JOIN wsum ws ON e.u = ws.u
         |  GROUP BY e.v),
         |s$r AS MATERIALIZED (
         |  SELECT vt.u,
         |    CAST(150000 + (850000 * COALESCE(c.inflow, 0)) // 1000000
         |      AS BIGINT) AS score
         |  FROM verts vt LEFT JOIN c$r c ON vt.u = c.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |tp AS MATERIALIZED (
       |  SELECT doc_id, i.i AS pos, ts[i.i] AS w
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)))
       |    AS i) i),
       |und AS (
       |  SELECT u, v, COUNT(*) AS w FROM ($offs) GROUP BY u, v),
       |sym AS MATERIALIZED (
       |  SELECT u, v, w FROM und
       |  UNION ALL SELECT v AS u, u AS v, w FROM und),
       |wsum AS (SELECT u, SUM(w) AS wtot FROM sym GROUP BY u),
       |verts AS (SELECT DISTINCT u FROM sym),
       |s0 AS (SELECT u, CAST(1000000 AS BIGINT) AS score FROM verts),
       |$rounds
       |SELECT word, score, rank FROM (
       |  SELECT u AS word, score,
       |    CAST(row_number() OVER (ORDER BY score DESC, u ASC) AS BIGINT)
       |      AS rank
       |  FROM s$TextrankRounds)
       |WHERE rank <= $TextrankTopK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_textrank" -> (textTextrank _),
    "text_vocab_growth" -> (textVocabGrowth _),
    "text_watermark" -> (textWatermark _),
    "text_fertility" -> (textFertility _),
    "text_bpe_merge" -> (textBpeMerge _),
    "text_bpe_train" -> (textBpeTrain _),
    "text_bpe_apply" -> (textBpeApply _),
    "sketch_quantile" -> (sketchQuantile _),
    "text_lm_score" -> (textLmScore _),
    "text_lm_backoff" -> (textLmBackoff _),
    "text_lm_kn" -> (textLmKneserNey _),
    "sketch_countmin" -> (sketchCountmin _),
    "text_pii" -> (textPii _),
    "text_pii_redact" -> (textPiiRedact _),
    "explode_outer_docs" -> (explodeOuterDocs _),
    "text_repetition" -> (textRepetition _),
    "text_bm25" -> (textBm25 _),
    "text_tfidf" -> (textTfidf _),
    "text_stats" -> (textStats _),
    "text_source_divergence" -> (textSourceDivergence _),
    "text_token_bpe" -> (textTokenBpe _),
    "text_heavy_hitters" -> (textHeavyHitters _),
    "text_vocab_coverage" -> (textVocabCoverage _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_langid_eval" -> (textLangidEval _),
    "text_fingerprint" -> (textFingerprint _),
    "text_cooccurrence" -> (textCooccurrence _),
    "text_inverted_index" -> (textInvertedIndex _))

  val oracles: Map[String, String] = Map(
    "text_textrank" -> textTextrankSql,
    "text_vocab_growth" -> textVocabGrowthSql,
    "text_watermark" -> textWatermarkSql,
    "text_bpe_merge" -> textBpeMergeSql,
    "text_bpe_train" -> textBpeTrainSql,
    "text_bpe_apply" -> textBpeApplySql,
    "sketch_quantile" -> sketchQuantileSql,
    "text_lm_score" -> textLmScoreSql,
    "text_lm_backoff" -> textLmBackoffSql,
    "text_lm_kn" -> textLmKneserNeySql,
    "sketch_countmin" -> sketchCountminSql,
    "text_pii" -> textPiiSql,
    "text_pii_redact" -> textPiiRedactSql,
    "explode_outer_docs" -> explodeOuterDocsSql,
    "text_repetition" -> textRepetitionSql,
    "text_bm25" -> textBm25Sql,
    "text_tfidf" -> textTfidfSql,
    "text_stats" -> textStatsSql,
    "text_source_divergence" -> textSourceDivergenceSql,
    "text_token_bpe" -> textTokenBpeSql,
    "text_heavy_hitters" -> textHeavyHittersSql,
    "text_vocab_coverage" -> textVocabCoverageSql,
    "text_fertility" -> textFertilitySql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_langid_eval" -> textLangidEvalSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_cooccurrence" -> textCooccurrenceSql,
    "text_inverted_index" -> textInvertedIndexSql)
}
