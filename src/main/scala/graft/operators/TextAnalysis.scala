package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, stopword-profile language ID, quality scoring,
  * and shingle-hash document fingerprinting.
  *
  * Everything is built from codegen'd array/string expressions — one
  * narrow map stage, no UDFs, no shuffle — so a 100 TB corpus scans at
  * parquet-reader speed and the operators fuse into whatever pipeline
  * follows (dedup, filtering, bucketing).
  */
object TextAnalysis {

  /** Per-language stopword profiles for the n-gram/stopword language
    * heuristic. Tiny on purpose: broadcast as literals into codegen. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"),
    "fr" -> Seq("le", "la", "et", "les", "un", "est"),
    "zh" -> Seq("de", "le", "shi", "he", "zai"))

  private def tokens(text: Column): Column = split(text, " ")

  private def hits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  /** BPE-ish subword pattern: alpha runs, digit runs, or single
    * non-alphanumeric symbols — the usual pre-tokenization granularity
    * feeding a byte-pair encoder. */
  val subwordPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Corpus-grounded token rarity: for each document, the average
    * DOCUMENT FREQUENCY of its (frequency-weighted) tokens —
    * the no-transcendentals stand-in for unigram log-likelihood
    * scoring (low mean_df ⇒ rare/gibberish vocabulary, high ⇒ common
    * language; threshold per corpus). Deliberately avoids log():
    * libm transcendentals are not bit-portable across engines, while
    * this is integer sums with ONE final division — deterministic and
    * oracle-checkable. Two shuffles (df count, per-doc sum), both
    * partial-aggregable; tokens travel as 60-bit hashes. */
  def tokenRarity(df: DataFrame, idCol: String, textCol: String,
                  hotK: Int = 1024): DataFrame = {
    val ex = Dedup.spreadById(df, idCol, textCol)
      .select(col(idCol), explode(tokens(col(textCol))).as("t"))
      .select(col(idCol), hash60(col("t")).as("th"))
    val docFreq = ex.select(col(idCol), col("th")).distinct()
      .groupBy("th").agg(count(lit(1)).as("df"))
    // The token-hash key is Zipfian — a stopword's rows would all land
    // on one reducer. Resolve the top-hotK high-DF head MAP-SIDE
    // (broadcast equi + broadcast anti join, no shuffle of the hot
    // rows); only tail keys — bounded per-key cardinality by
    // construction — take the shuffle join. docFreq appears three
    // times in the plan; AQE's stage cache reuses the materialized
    // exchange across appearances (ReusedExchange, asserted in
    // PlanSpec on the executed plan — at 100 TB, persist docFreq or
    // stage it to a table if the residual duplicate matters).
    // Identical (id, df) multiset either way; integer sums are
    // order-independent, so the result is unchanged.
    val head = docFreq.orderBy(col("df").desc, col("th")).limit(hotK)
    val hot = ex.join(broadcast(head), "th")
    val cold = ex.join(broadcast(head.select("th")), Seq("th"), "left_anti")
      .join(docFreq, "th")
    hot.unionByName(cold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("df")).as("sum_df"))
      .select(col(idCol), col("n_tokens"), col("sum_df"),
        r4(col("sum_df") / col("n_tokens").cast("double")).as("mean_df"))
  }

  /** TF-IDF ranked retrieval: the top-k documents for a bag of query
    * terms, scored sum_t tf(t,d) · ⌊N·10⁶ / df(t)⌋. The idf weight is
    * the floor of a single IEEE division (portable bit-for-bit across
    * engines — same reason [[tokenRarity]] avoids log(); the 10⁶ scale
    * keeps integer precision on the rare-term end), so the whole score
    * is integer arithmetic and the DuckDB oracle checks it exactly.
    *
    * Scale shape: tokens filter to the query vocabulary MAP-SIDE
    * before anything shuffles (the explode never materializes
    * non-query terms past the scan stage), tf is a partial-aggregable
    * grouped count, df derives from tf (|terms| rows — broadcast), and
    * the final top-k is a single-column TakeOrdered. On a 100 TB
    * corpus the only full-data cost is the scan + one narrow shuffle
    * of (doc, term) counts for the handful of query terms.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], k: Int = 20): DataFrame = {
    val ex = Dedup.spreadById(docs, idCol, textCol)
      .select(col(idCol), explode(tokens(col(textCol))).as("t"))
      .filter(col("t").isInCollection(terms))
    val tf = ex.groupBy(col(idCol), col("t")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    tf.join(broadcast(dfreq), "t")
      .crossJoin(broadcast(nDocs))
      .withColumn("w", floor(col("n_docs") * lit(1000000.0) / col("df")).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("w")).as("score"),
        count(lit(1)).as("n_query_terms"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Inverted-index build: per token, the document frequency plus a
    * bounded sorted posting sample (first `sampleK` doc ids) — the
    * retrieval-index companion to [[tfidfTopK]] and the seed for any
    * keyword-search or doc-lookup service over the corpus.
    *
    * Scale shape: the (token, doc) grain reduces by `distinct` with
    * map-side combine; df is a partial-aggregable grouped count (the
    * Zipfian token key is absorbed by partial aggregation — a
    * stopword's count combines within each map task); and the posting
    * arrays are CAPPED BEFORE collection via rank pushdown
    * ([[Ranking.topKPerGroup]] → WindowGroupLimit), so no executor
    * ever buffers an unbounded stopword posting list. Uncapped full
    * postings at 100 TB would be a different storage layout (doc-id
    * runs, delta-encoded) — the bounded sample is the DataFrame-shaped
    * contract.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    sampleK: Int = 16): DataFrame = {
    // stage the distinct (doc, token) grain once: it feeds both the df
    // count and the rank-capped postings branch — without the snapshot
    // each branch re-runs the scan + explode + distinct
    val ex = Dedup.spreadById(docs, idCol, textCol)
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .distinct()
      .localCheckpoint(true)
    val dfreq = ex.groupBy("token").agg(count(lit(1)).as("df"))
    val capped = Ranking.topKPerGroup(ex, Seq("token"), Seq(col("doc_id").asc), sampleK)
    val postings = capped.groupBy("token")
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
    dfreq.join(postings, "token")
  }

  /** One BPE training round: corpus-wide counts of ADJACENT subword
    * pre-token pairs ([[subwordPattern]] granularity), ranked — the
    * top pair is exactly the next merge a byte-pair encoder would
    * learn. Iterating (merge, re-count) yields the full vocabulary;
    * one round as a relational query is the distributed-counting
    * heart of that loop, and the part that must scale to the corpus.
    *
    * Scale shape: pair extraction is a narrow array expression per
    * row (no self-join — adjacency is positional within the doc),
    * the count is one partial-aggregable shuffle (Zipfian pair key
    * absorbed map-side like every token count here), and the top-k is
    * a TakeOrdered. */
  def bpeMergeCandidates(docs: DataFrame, textCol: String,
                         k: Int = 20): DataFrame = {
    // spread first: the regex + pair lambdas are CPU-bound and a
    // single-row-group scan would otherwise run them on one task
    // (same rationale as Dedup.spreadById); adjacency via zip_with of
    // the token array against its own shift — no per-index element_at
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val toks = regexp_extract_all(lower(col(textCol)), lit(subwordPattern), lit(0))
    val pairs = zip_with(
      slice(col("__toks"), lit(1), size(col("__toks")) - 1),
      slice(col("__toks"), lit(2), size(col("__toks")) - 1),
      (a, b) => concat_ws(" ", a, b))
    docs.select(col(textCol)).repartition(parts)
      .select(toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(explode(pairs).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Cluster labeling: the top-k most frequent tokens per embedding
    * cluster — the human-readable summary that turns an opaque
    * `(id, cell)` assignment ([[Similarity.kmeansRefine]] /
    * [[Similarity.ivfAssign]]) into "what is this cluster about",
    * and the standard first diagnostic after clustering a corpus.
    *
    * Scale shape: tokens join the (id, cell) assignment on id (the
    * assignment is vectors-not-tokens sized; Spark picks broadcast vs
    * shuffle by stats), counts reduce per (cell, token) with map-side
    * combine, and the top-k runs as rank pushdown over the already
    * tiny (cells × vocab) frame.
    */
  def clusterTopTerms(docs: DataFrame, idCol: String, textCol: String,
                      assign: DataFrame, assignIdCol: String = "id",
                      k: Int = 5): DataFrame = {
    val ex = Dedup.spreadById(docs, idCol, textCol)
      .select(col(idCol).as("__did"), explode(tokens(col(textCol))).as("token"))
    val cellTok = ex
      .join(assign.select(col(assignIdCol).as("__did"), col("cell")), "__did")
      .groupBy("cell", "token").agg(count(lit(1)).as("n"))
    Ranking.topKPerGroup(cellTok, Seq("cell"), Seq(col("n").desc, col("token").asc), k)
      .select("cell", "rnk", "token", "n")
  }

  /** Token / lexical statistics: whitespace tokens plus the BPE-ish
    * regex subword count. */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    df
      .withColumn("n_tokens", size(t))
      .withColumn("n_subword_tokens",
        size(regexp_extract_all(col(textCol), lit(subwordPattern), lit(0))))
      .withColumn("n_distinct_tokens", size(array_distinct(t)))
      .withColumn("type_token_ratio", r4(size(array_distinct(t)) / size(t).cast("double")))
      .withColumn("avg_token_len",
        r4((length(col(textCol)) - (size(t) - 1)) / size(t).cast("double")))
  }

  /** Stopword-profile language ID: count stopword hits per language,
    * pick the argmax with a fixed priority order on ties (the order of
    * [[stopwords]]). 'und' (undetermined) when nothing matches.
    */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val hitCols = stopwords.map { case (lang, words) => lang -> hits(col(textCol), words) }
    val total = hitCols.map(_._2).reduce(_ + _)
    val pred = hitCols.zipWithIndex.foldRight(lit("und")) { case (((lang, h), i), els) =>
      val rest = hitCols.drop(i + 1)
      val isMax = rest.foldLeft(h > 0) { case (c, (_, h2)) => c && h >= h2 }
      when(isMax, lang).otherwise(els)
    }
    df.withColumn("lang_pred", pred)
      .withColumn("stopword_hits", total)
  }

  /** Composite quality score in [0,1]: length saturation, lexical
    * diversity, stopword presence — the standard cheap pre-filter
    * before expensive dedup/embedding stages. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val n = size(t).cast("double")
    val diversity = size(array_distinct(t)) / n
    val stop = hits(col(textCol), stopwords.flatMap(_._2).distinct) / n
    df.withColumn("quality_score",
      r4(least(n / 100, lit(1.0)) * 0.4 + diversity * 0.3 + least(stop * 5, lit(1.0)) * 0.3))
  }

  /** The keep/drop decision a corpus pipeline publishes after the
    * cheap signal pass: too-short, predicted-language mismatch, and
    * low composite quality, in that priority order (the FIRST failing
    * gate names the drop reason, the convention that makes funnel
    * accounting of a cleaning pipeline additive). Pure composition of
    * [[tokenStats]] + [[languageId]] + [[qualityScore]] — still one
    * narrow codegen'd map over the corpus, no shuffle. */
  def corpusFilter(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, minTokens: Int = 10,
                   minQuality: Double = 0.5): DataFrame = {
    val scored = qualityScore(languageId(tokenStats(docs, textCol), textCol), textCol)
    scored.select(col(idCol), col(langCol), col("lang_pred"),
        col("n_tokens"), col("quality_score"))
      .withColumn("drop_reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("lang_pred") =!= col(langCol), "lang_mismatch")
          .when(col("quality_score") < minQuality, "low_quality")
          .otherwise("kept"))
      .withColumn("keep", col("drop_reason") === "kept")
  }

  /** Shingle-hash fingerprint: min over word-3-gram hash60s — one long
    * per document (a 1-permutation MinHash; equal fingerprints ⇒ likely
    * near-duplicates). Null for texts shorter than `n` words. */
  def fingerprint(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    df.withColumn("fingerprint",
      array_min(transform(wordShingles(col(textCol), n), s => hash60(s))))

  /** Gopher-style repetition signals: the fraction of all word
    * bigrams taken by the single most frequent one, plus totals — the
    * standard cheap detector for degenerate boilerplate ("click here
    * click here …") that survives token-level stats. Two
    * partial-aggregable shuffles on (doc, bigram-hash) then (doc);
    * bigrams travel as 60-bit hashes, never strings. Ties need no
    * break: only the max COUNT matters. Docs under 2 words emit no
    * bigrams and are dropped (nothing to measure). */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // raw (non-distinct) bigrams — Funcs.wordShingles dedups, which is
    // exactly what a repetition detector must NOT do
    val words = split(col(textCol), " ")
    val bigrams = when(size(words) >= 2,
      transform(sequence(lit(1), size(words) - 1),
        i => concat_ws(" ", slice(words, i, lit(2))))).otherwise(array())
    // spread before the interpreted bigram lambda (same rationale as
    // Dedup.spreadById: one parquet row group = one task otherwise)
    val big = Dedup.spreadById(df, idCol, textCol)
      .select(col(idCol), explode(bigrams).as("bg"))
      .select(col(idCol), hash60(col("bg")).as("bh"))
      .groupBy(col(idCol), col("bh")).agg(count(lit(1)).as("c"))
    big.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_bigrams"),
        max(col("c")).as("top_bigram_count"))
      .select(col(idCol), col("n_bigrams"), col("top_bigram_count"),
        r4(col("top_bigram_count") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"))
  }

  /** PII-ish surface signals: email/URL pattern counts and the digit
    * character fraction — the cheap pre-redaction triage pass. The
    * regexes stay in the RE2-compatible subset (no backrefs, no
    * lookaround) so the DuckDB oracle runs the SAME patterns. Pure
    * narrow map, codegen'd regexp/length expressions. */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val urlPattern = "https?://[^ ]+"

  def piiSignals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("email_count", regexp_count(t, lit(emailPattern)).cast("long"))
      .withColumn("url_count", regexp_count(t, lit(urlPattern)).cast("long"))
      .withColumn("digit_frac",
        r4(length(regexp_replace(t, "[^0-9]", "")) /
          nullifZero(length(t)).cast("double")))
  }

  /** Cross-document duplicated-n-gram fraction: for each document, the
    * share of its DISTINCT word n-grams that appear in at least one
    * OTHER document — the inter-document companion to
    * [[repetitionSignals]] (which is within-doc) and the standard
    * boilerplate/template detector in web-corpus pipelines: navigation
    * chrome, license headers and mirrored passages score high long
    * before full-document dedup would fire.
    *
    * Plan shape: shingle hashes (computed once, 60-bit longs) →
    * document-frequency count → join back → per-doc aggregate. Both
    * aggregations partial-aggregate map-side; the join key is a
    * 3-gram hash, whose frequency distribution is far flatter than
    * unigrams', so no Zipf-head handling is needed (contrast
    * [[tokenRarity]]). A doc counts as "sharing" an n-gram with itself
    * never: df ≥ 2 means at least one other doc (per-doc shingles are
    * distinct by construction). */
  def crossDocDupNgrams(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3): DataFrame = {
    val ex = Dedup.withShingles(Dedup.spreadById(df, idCol, textCol), textCol, n)
      .filter(size(col("shingles")) > 0)
      .select(col(idCol), explode(col("shingles")).as("s"))
      .select(col(idCol), hash60(col("s")).as("sh"))
    val docFreq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    ex.join(docFreq, "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("df") >= 2, lit(1L)).otherwise(lit(0L))).as("dup_ngrams"))
      .select(col(idCol), col("n_ngrams"), col("dup_ngrams"),
        r4(col("dup_ngrams") / col("n_ngrams").cast("double")).as("dup_frac"))
  }

  /** Exact heavy-hitter vocabulary: the top-k tokens by document
    * frequency (vocab mining / stopword discovery over a new corpus).
    * Two partial-aggregable shuffles — distinct (doc, token), then
    * count per token — and a TakeOrderedAndProject top-k, so no full
    * sort and no skew exposure: a stopword's rows combine map-side in
    * both aggregates. The (doc_freq desc, token asc) tie-break makes
    * the cut deterministic. The rank window runs over k rows only. */
  def vocabTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Seq(col("doc_freq").desc, col("token").asc)
    Dedup.spreadById(df, idCol, textCol)
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .distinct()
      .groupBy("token").agg(count(lit(1)).as("doc_freq"))
      .orderBy(order: _*)
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
  }
}
