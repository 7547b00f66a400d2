package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.SketchExprs._

/** Deduplication suite for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. All candidate generation is bucket-local
  * (band join), so the pair space never goes quadratic in corpus size —
  * the 100 TB shape is: shuffle by band key, join within buckets, verify
  * exactly. AQE's skew-join handling splits oversized band buckets at
  * runtime; pair outputs are deduplicated across bands by a final groupBy.
  */
object Dedup {

  /** Lowercased word tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles (distinct), falling back to whole-text for very
    * short docs.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", t))))
  }

  /** Exact duplicate groups on arbitrary key columns: (key..., n) with n>1.
    * Group on a 64-bit hash first so the shuffle carries 8-byte keys, then
    * verify within group (hash collision-safe via min/max equality check).
    */
  def exactDupGroups(df: DataFrame, key: Column): DataFrame =
    df.groupBy(xxhash64(key).as("key_hash"))
      .agg(count(lit(1)).as("n"), min(key).as("k_min"), max(key).as("k_max"))
      .where(col("n") > 1 && col("k_min") === col("k_max"))
      .select(col("k_min").as("key"), col("n"))

  /** Exact Jaccard similarity between two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(1.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))

  /** MinHash + LSH near-dup pairs: shingle -> k-min-hash signature -> band
    * buckets -> bucket-local self-join -> exact-Jaccard verification.
    *
    * @param bands  signature is split into `bands` bands of `numHashes/bands`
    *               rows; a pair is a candidate if any band matches.
    * @return (a, b, jaccard) with a < b and jaccard >= threshold.
    */
  def minhashPairs(df: DataFrame, id: Column, text: Column, threshold: Double = 0.8,
      numHashes: Int = 64, bands: Int = 32): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    val withSig = df
      .select(id.as("id"), shingles(text).as("sh"))
      .withColumn("sig", minhashSig(col("sh"), numHashes))
      .withColumn("bands", array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows))): _*))
    // ONE shuffle: aggregate bucket members per (band, bucket-hash), then
    // expand i<j pairs intra-row — the sig/shingle subtree is computed once
    // (a two-sided self-join would recompute and shuffle it twice)
    val buckets = withSig
      .select(posexplode(col("bands")).as(Seq("band", "bh")), col("id"), col("sh"))
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("ms"))
      .where(size(col("ms")) > 1)
    // index-pair expansion: element_at instead of slice() (slice would copy
    // the heavy member array O(n^2) times per bucket); jaccard via ONE
    // array_intersect with |union| = |a|+|b|-|inter|
    def member(ix: Column): Column = element_at(col("ms"), ix + 1)
    val pairs = buckets.select(explode(flatten(
      transform(sequence(lit(0), size(col("ms")) - 2), i =>
        transform(sequence(i + 1, size(col("ms")) - 1), j => {
          val a = member(i); val b = member(j)
          val inter = size(array_intersect(a.getField("sh"), b.getField("sh")))
          struct(
            least(a.getField("id"), b.getField("id")).as("a"),
            greatest(a.getField("id"), b.getField("id")).as("b"),
            (inter.cast("double") /
              (size(a.getField("sh")) + size(b.getField("sh")) - inter)).as("jaccard"))
        }))))
      .as("p"))
    pairs.select(col("p.a").as("a"), col("p.b").as("b"), col("p.jaccard").as("jaccard"))
      .where(col("jaccard") >= threshold)
      .groupBy(col("a"), col("b")).agg(first(col("jaccard")).as("jaccard"))
  }

  /** n-gram Jaccard near-dup pairs without LSH: exact, via a single-shingle
    * inverted index (rare-shingle blocking). Smaller corpora / validation
    * baseline for the MinHash path.
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      threshold: Double = 0.8, n: Int = 3): DataFrame = {
    val withSh = df.select(id.as("id"), shingles(text, n).as("sh"))
    val inv = withSh.select(col("id"), col("sh"), explode(col("sh")).as("shingle"))
    val l = inv.select(col("shingle"), col("id").as("a"), col("sh").as("sha"))
    val r = inv.select(col("shingle"), col("id").as("b"), col("sh").as("shb"))
    l.join(r, Seq("shingle"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(first(col("sha")).as("sha"), first(col("shb")).as("shb"))
      .select(col("a"), col("b"), jaccard(col("sha"), col("shb")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit signature, banded into 16-bit chunks
    * (any-equal-chunk = candidate — guarantees recall for hamming <= 3 by
    * pigeonhole over 4 chunks), verified by exact hamming distance.
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3): DataFrame = {
    val withSig = df.select(id.as("id"), simhash64(tokens(text)).as("sig"))
    val chunked = withSig.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(lit(0xffffL))): _*)).as(Seq("chunk", "cv")))
    val l = chunked.select(col("chunk"), col("cv"), col("id").as("a"), col("sig").as("siga"))
    val r = chunked.select(col("chunk"), col("cv"), col("id").as("b"), col("sig").as("sigb"))
    l.join(r, Seq("chunk", "cv"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("siga").bitwiseXOR(col("sigb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .groupBy(col("a"), col("b")).agg(min(col("hamming")).as("hamming"))
  }

  /** Embedding near-dup pairs: random-hyperplane LSH (deterministic seeded
    * planes) -> bucket join -> exact cosine verification.
    */
  def embeddingCosinePairs(df: DataFrame, id: Column, vec: Column,
      minCosine: Double = 0.95, nBits: Int = 16, bands: Int = 4): DataFrame = {
    val sig = Similarity.hyperplaneSig(vec, nBits)
    val rows = nBits / bands
    val withSig = df.select(id.as("id"), vec.as("v"), sig.as("sig"))
      .withColumn("bands", array((0 until bands).map(b =>
        xxhash64(lit(b), shiftright(col("sig"), b * rows).bitwiseAND(lit((1L << rows) - 1)))): _*))
    val buckets = withSig.select(col("id"), col("v"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    val l = buckets.select(col("band"), col("bh"), col("id").as("a"), col("v").as("va"))
    val r = buckets.select(col("band"), col("bh"), col("id").as("b"), col("v").as("vb"))
    l.join(r, Seq("band", "bh"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(first(cosineSim(col("va"), col("vb"))).as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}
