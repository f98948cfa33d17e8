package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs._

/** Deduplication operators for training-data pipelines, each designed
  * around its 100 TB shuffle profile:
  *
  *  - exact key dedup: one shuffle on the key, bounded window state;
  *  - exact content dedup: shuffle on a 128-bit content hash, never on
  *    the content itself;
  *  - MinHash + LSH banding: candidate generation shuffles only
  *    (band, key) pairs — O(docs × bands) small rows — and the
  *    quadratic verify step runs per-bucket, not per-corpus;
  *  - SimHash: one 60-bit signature per doc, banded for Hamming-ball
  *    candidate lookup.
  *
  * All hashing uses the md5-derived [[graft.functions.Funcs.hash60]]
  * family so results are engine-portable and deterministic (no seed
  * drift between runs — important for incremental dedup at scale).
  */
object Dedup {

  /** Exact dedup on a key, keeping the first row by `orderCols`
    * (deterministic iff `orderCols` is a total order within key).
    * The distributed form of the reference's dropDuplicates (P10). */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact content dedup: group by md5(content), keep min id as the
    * representative and count the group. */
  def exactContentGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("dup_count"))

  /** Distinct word-n-gram shingles per doc (adds `shingles`). */
  def withShingles(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.withColumn("shingles", wordShingles(col(textCol), n))

  /** MinHash signature (adds `sig`: array of numHashes longs).
    * sig[i] = min over shingles of hash60(i || '|' || shingle). */
  def withMinhash(df: DataFrame, numHashes: Int): DataFrame =
    df.withColumn("sig",
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(col("shingles"), s => hash60Seeded(i, s)))))

  /** LSH banding: explode to (band, band_key) rows. rowsPerBand
    * consecutive signature entries are concatenated into the bucket
    * key; docs sharing any band key become candidates. */
  def lshBands(df: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col(idCol), col("shingles"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
      .as(Seq("band", "band_key")))

  /** Exact Jaccard over shingle sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b)).cast("double")

  /** MinHash-LSH near-duplicate pairs: band-bucket candidates, then
    * exact-Jaccard verification ≥ threshold. Output: (id1, id2,
    * jaccard) with id1 < id2.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                      threshold: Double = 0.5): DataFrame = {
    val shingled = withShingles(docs.select(col(idCol), col(textCol)), textCol, n)
      .filter(size(col("shingles")) > 0)
    val banded = lshBands(withMinhash(shingled, numHashes), idCol, bands, numHashes / bands)
    val l = banded.select(col(idCol).as("id1"), col("shingles").as("s1"),
      col("band"), col("band_key"))
    val r = banded.select(col(idCol).as("id2"), col("shingles").as("s2"),
      col("band"), col("band_key"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), r4(jaccard(col("s1"), col("s2"))).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** All-pairs n-gram Jaccard ≥ threshold, blocked on shared shingles
    * (exact — a pair is emitted iff it shares ≥1 shingle, and any pair
    * with Jaccard > 0 shares one). The candidate join is the scale
    * bottleneck (hot shingles ⇒ skew); prefer [[minhashLshPairs]]
    * beyond ~10⁶ docs or cap shingle document-frequency first.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val shingled = withShingles(docs.select(col(idCol), col(textCol)), textCol, n)
      .filter(size(col("shingles")) > 0)
    val exploded = shingled.select(col(idCol), col("shingles"),
      explode(col("shingles")).as("shingle"))
    val l = exploded.select(col(idCol).as("id1"), col("shingles").as("s1"), col("shingle"))
    val r = exploded.select(col(idCol).as("id2"), col("shingles").as("s2"), col("shingle"))
    l.join(r, "shingle")
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "s1", "s2").distinct()
      .select(col("id1"), col("id2"), r4(jaccard(col("s1"), col("s2"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 60-bit SimHash over distinct tokens (adds `simhash`).
    * bit j set ⇔ Σ_tokens (bit_j(hash60(token))·2 − 1) > 0.
    * Built as a SQL lambda expression because bit index j is a runtime
    * column inside the lambda (the Scala shiftright helper only takes
    * literal shifts).
    */
  def withSimhash(df: DataFrame, textCol: String, bits: Int = 60): DataFrame = {
    val h = "conv(substring(md5(t), 1, 15), 16, 10)"
    df.withColumn("__hashes",
        expr(s"transform(array_distinct(split($textCol, ' ')), t -> cast($h as bigint))"))
      .withColumn("simhash", expr(
        s"""aggregate(
           |  transform(sequence(0, ${bits - 1}), j ->
           |    if(size(filter(__hashes, h -> (shiftright(h, j) & 1) = 1)) * 2 - size(__hashes) > 0,
           |       shiftleft(1L, j), 0L)),
           |  0L, (acc, x) -> acc + x)""".stripMargin))
      .drop("__hashes")
  }

  /** SimHash near-duplicate pairs: band the 60-bit signature into
    * `bands` chunks (Hamming distance ≤ bands−1 guarantees one exact
    * band match), candidate-join per band, verify
    * bit_count(xor) ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    val bandBits = 60 / bands
    val mask = (1L << bandBits) - 1
    val sh = withSimhash(docs.select(col(idCol), col(textCol)), textCol)
    val banded = sh.select(col(idCol), col("simhash"), posexplode(
        expr(s"transform(sequence(0, ${bands - 1}), b -> shiftright(simhash, b * $bandBits) & $mask)"))
      .as(Seq("band", "band_key")))
    val l = banded.select(col(idCol).as("id1"), col("simhash").as("sh1"),
      col("band"), col("band_key"))
    val r = banded.select(col(idCol).as("id2"), col("simhash").as("sh2"),
      col("band"), col("band_key"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        expr("bit_count(sh1 ^ sh2)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
