package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.SketchExprs._

/** Deduplication suite for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. All candidate generation is bucket-local
  * (band join), so the pair space never goes quadratic in corpus size —
  * the 100 TB shape is: shuffle compact keys by band, generate candidates
  * from capped buckets, verify exactly. AQE's skew-join handling splits
  * oversized band buckets at runtime.
  */
object Dedup {

  /** Lowercased word tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles in document order (repeats kept), falling back to
    * whole-text for very short docs.
    */
  def rawShingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** Word n-gram shingles (distinct). */
  def shingles(text: Column, n: Int = 3): Column =
    array_distinct(rawShingles(text, n))

  /** Exact duplicate groups on an arbitrary key column: (key, n) with n>1.
    *
    * Group on a 64-bit hash first so the shuffle carries 8-byte keys; hash
    * collisions (detected via min/max key inequality inside a bucket — at
    * 10^12 keys a handful of 64-bit collisions are EXPECTED) are resolved by
    * a second aggregation on the true key restricted to the collided
    * buckets, so a real duplicate group sharing a bucket with another key is
    * still reported. The resolve pass re-scans the input filtered by a
    * broadcast of the (near-empty) collided-hash set — at most a few rows
    * survive the filter, so its shuffle is negligible.
    */
  def exactDupGroups(df: DataFrame, key: Column): DataFrame =
    exactDupGroupsWithHash(df, key, xxhash64(_))

  /** Testable variant: inject a weak hash to force collisions. */
  private[graft] def exactDupGroupsWithHash(df: DataFrame, key: Column,
      hashFn: Column => Column): DataFrame = {
    val hashed = df.select(key.as("key")).withColumn("key_hash", hashFn(col("key")))
    val g = hashed.groupBy(col("key_hash"))
      .agg(count(lit(1)).as("n"), min(col("key")).as("k_min"), max(col("key")).as("k_max"))
      .where(col("n") > 1)
    val clean = g.where(col("k_min") === col("k_max"))
      .select(col("k_min").as("key"), col("n"))
    val collided = g.where(col("k_min") =!= col("k_max")).select(col("key_hash"))
    val resolved = hashed.join(broadcast(collided), Seq("key_hash"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
      .select(col("key"), col("n"))
    clean.unionByName(resolved)
  }

  /** Exact Jaccard similarity between two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(1.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))

  /** MinHash + LSH near-dup pairs: shingle -> k-min-hash signature -> band
    * buckets -> capped intra-bucket candidate pairs (signature-estimate
    * prefilter) -> exact-Jaccard verification over ONE extra scan.
    *
    * Scale shape: the band shuffle carries only (band, bucket-hash, id,
    * signature) — the shingle arrays never ride the x`bands` fan-out (they
    * did in v1: a measured x32 shuffle-volume multiplier). Buckets are
    * capped at `maxBucket` members (deterministic by id order) so one
    * degenerate mega-bucket — mass-duplicated boilerplate, a real 100 TB
    * phenomenon — cannot go quadratic; use [[minhashBucketStats]] to audit
    * what a cap would drop. Candidate pairs are prefiltered by the unbiased
    * signature estimate (matching minhash components / numHashes >=
    * threshold - estMargin; at 64 hashes the estimate's sigma is ~0.05 so
    * the default margin is ~4 sigma), then exactly verified by fetching the
    * two shingle sets per surviving pair with one scan + one shuffle.
    *
    * @return (a, b, jaccard) with a < b and exact jaccard >= threshold.
    */
  def minhashPairs(df: DataFrame, id: Column, text: Column, threshold: Double = 0.8,
      numHashes: Int = 64, bands: Int = 32, maxBucket: Int = 256,
      estMargin: Double = 0.2, inputPartitions: Int = 0): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    // Small single-split inputs (one parquet row group) pin the signature
    // stage — the CPU-heavy part — to one task; callers pass inputPartitions
    // to fan it out. At real scale the scan has thousands of splits and the
    // knob stays 0 (no extra shuffle).
    val in = if (inputPartitions > 0) df.repartition(inputPartitions) else df
    val withSh = in.select(id.as("id"), shingles(text).as("sh"))
    val withSig = withSh.select(col("id"), minhashSig(col("sh"), numHashes).as("sig"))
    // NB: the band-hash array must reference `sig` as a literal-indexed array
    // of static slices (NOT transform/sequence with sig inside the lambda) —
    // a lambda-bound formulation re-evaluates the minhash per band element
    // after optimizer inlining (measured 176s vs 23s on sf0.1, 2026-08-16).
    val bandRows = withSig.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows))): _*))
        .as(Seq("band", "bh")))
    // ONE candidate shuffle: aggregate bucket members per (band, bucket),
    // deterministically capped, then expand i<j pairs intra-row
    val buckets = bandRows
      .groupBy(col("band"), col("bh"))
      .agg(slice(sort_array(collect_list(struct(col("id"), col("sig")))),
        1, maxBucket).as("ms"))
      .where(size(col("ms")) > 1)
    def member(ix: Column): Column = element_at(col("ms"), ix + 1)
    val estMatches = lit((math.ceil((threshold - estMargin) * numHashes)).toInt)
    val candidates = buckets.select(explode(flatten(
      transform(sequence(lit(0), size(col("ms")) - 2), i =>
        filter(
          transform(sequence(i + 1, size(col("ms")) - 1), j => {
            val a = member(i); val b = member(j)
            val matches = size(filter(
              zip_with(a.getField("sig"), b.getField("sig"),
                (x, y) => x === y), m => m))
            struct(
              least(a.getField("id"), b.getField("id")).as("a"),
              greatest(a.getField("id"), b.getField("id")).as("b"),
              matches.as("m"))
          }),
          p => p.getField("m") >= estMatches))))
      .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(lit(1)) // dedupe across bands
      .select(struct(col("a"), col("b")).as("p"))
    // exact verify: ONE scan of the shingle table, joined to both pair sides
    val sides = candidates
      .select(col("p"), explode(array(col("p.a"), col("p.b"))).as("id"))
    sides.join(withSh, Seq("id"))
      .groupBy(col("p"))
      .agg(min_by(col("sh"), col("id")).as("sha"), max_by(col("sh"), col("id")).as("shb"),
        count(lit(1)).as("nsides"))
      .where(col("nsides") === 2)
      .select(col("p.a").as("a"), col("p.b").as("b"),
        jaccard(col("sha"), col("shb")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Band-bucket occupancy audit for [[minhashPairs]]: per-bucket member
    * counts above `minSize`, descending — run before choosing `maxBucket`
    * on a new corpus (a capped bucket trades recall inside mass-duplicated
    * boilerplate clusters for a quadratic-explosion guarantee).
    */
  def minhashBucketStats(df: DataFrame, id: Column, text: Column,
      numHashes: Int = 64, bands: Int = 32, minSize: Long = 2): DataFrame = {
    val rows = numHashes / bands
    val withSig = df.select(id.as("id"), shingles(text).as("sh"))
      .select(col("id"), minhashSig(col("sh"), numHashes).as("sig"))
    withSig.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows))): _*))
        .as(Seq("band", "bh")))
      .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minSize)
      .orderBy(col("n").desc)
  }

  /** n-gram Jaccard near-dup pairs without LSH: EXACT, via prefix filtering
    * (the AllPairs/PPJoin principle, Bayardo et al. WWW'07 / Xiao et al.
    * ICDE'08): under a global shingle order by ascending document frequency,
    * two sets with Jaccard >= t must share a shingle within each one's
    * first |d| - ceil(t*|d|) + 1 shingles — so the inverted index is built
    * over only that rare-shingle prefix. A naive full-shingle index join
    * goes quadratic on any common shingle (measured 271 s on 5 k docs at
    * sf0.1); the prefix index keeps exact recall while candidates stay
    * near-linear. Pipeline: df-count shuffle (linear) -> per-doc rank
    * window (shuffle by id) -> prefix-index self-join -> one shingle fetch
    * per surviving candidate side -> exact Jaccard verify.
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      threshold: Double = 0.8, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withSh = df.select(id.as("id"), shingles(text, n).as("sh"))
    val inv = withSh.select(col("id"), size(col("sh")).as("len"),
      explode(col("sh")).as("shingle"))
    val dfreq = inv.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val prefix = inv.join(dfreq, Seq("shingle"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("shingle"))))
      .where(col("rn") <= col("len") - ceil(lit(threshold) * col("len")) + 1)
      .select(col("shingle"), col("id"))
    val candidates = prefix.join(prefix.withColumnRenamed("id", "b"), Seq("shingle"))
      .where(col("id") < col("b"))
      .select(col("id").as("a"), col("b"))
      .groupBy(col("a"), col("b")).agg(lit(1))
      .select(struct(col("a"), col("b")).as("p"))
    // exact verify: ONE scan of the shingle table joined to both pair sides
    val sides = candidates
      .select(col("p"), explode(array(col("p.a"), col("p.b"))).as("id"))
    sides.join(withSh, Seq("id"))
      .groupBy(col("p"))
      .agg(min_by(col("sh"), col("id")).as("sha"), max_by(col("sh"), col("id")).as("shb"),
        count(lit(1)).as("nsides"))
      .where(col("nsides") === 2)
      .select(col("p.a").as("a"), col("p.b").as("b"),
        jaccard(col("sha"), col("shb")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit signature, bucketed with the
    * generalized block scheme (Manku et al., "Detecting Near-Duplicates for
    * Web Crawling", WWW'07): the signature splits into `maxHamming +
    * cleanBlocks` blocks; every combination of `cleanBlocks` blocks forms a
    * table key. By pigeonhole, <= maxHamming flipped bits leave at least
    * `cleanBlocks` blocks untouched, so every qualifying pair shares at
    * least one table key — recall is exact, then candidates are verified by
    * exact hamming distance.
    *
    * Scale: table-key width is 64*cleanBlocks/(maxHamming+cleanBlocks) bits.
    * The default cleanBlocks=2 gives ~25-bit keys at maxHamming=3 (3.3e7
    * buckets — sub-quadratic at 10^12 docs, vs the 16-bit / 65k-bucket
    * single-chunk scheme this replaces). For large radii (>= 6) the key
    * shrinks below ~16 bits and MinHash is the better tool.
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3, cleanBlocks: Int = 2,
      inputPartitions: Int = 0): DataFrame = {
    require(maxHamming >= 1 && cleanBlocks >= 1)
    val m = maxHamming + cleanBlocks
    require(m <= 64, "too many blocks")
    // block b covers bits [64*b/m, 64*(b+1)/m)
    def blockVal(sig: Column, b: Int): Column = {
      val loBit = 64 * b / m; val hiBit = 64 * (b + 1) / m
      shiftrightunsigned(sig, loBit).bitwiseAND(lit((1L << (hiBit - loBit)) - 1))
    }
    val tables = (0 until m).combinations(cleanBlocks).toSeq
    val in = if (inputPartitions > 0) df.repartition(inputPartitions) else df
    val withSig = in.select(id.as("id"), simhash64(tokens(text)).as("sig"))
    val keyed = withSig.select(col("id"), col("sig"),
      posexplode(array(tables.zipWithIndex.map { case (blocks, t) =>
        xxhash64(lit(t) +: blocks.map(b => blockVal(col("sig"), b)): _*)
      }: _*)).as(Seq("table", "tk")))
    val l = keyed.select(col("table"), col("tk"), col("id").as("a"), col("sig").as("siga"))
    val r = keyed.select(col("table"), col("tk"), col("id").as("b"), col("sig").as("sigb"))
    l.join(r, Seq("table", "tk"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("siga").bitwiseXOR(col("sigb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .groupBy(col("a"), col("b")).agg(min(col("hamming")).as("hamming"))
  }

  /** Benchmark decontamination screening: per-doc count of distinct word
    * n-grams shared with a benchmark/eval corpus (the standard
    * pretraining-data hygiene step — docs overlapping an eval set leak test
    * answers into training). Benchmark suites are tiny relative to the
    * corpus, so their distinct-shingle set rides a broadcast hash join: the
    * corpus side streams map-side with NO shuffle of document data; the only
    * shuffle is the per-doc overlap count aggregation (partial map-side
    * combine, (id, long) rows).
    *
    * @return (id, n_overlap) for docs with >= minOverlap shared n-grams.
    */
  def contaminationOverlap(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, n: Int = 3,
      minOverlap: Int = 1): DataFrame = {
    val benchGrams = bench.select(explode(shingles(benchText, n)).as("g")).distinct()
    val docGrams = docs.select(id.as("id"), explode(shingles(text, n)).as("g"))
    docGrams.join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }

  /** Duplicate-cluster resolution: connected components over an undirected
    * near-dup pair list ((a, b) edges from [[minhashPairs]] /
    * [[simhashPairs]] / [[embeddingCosinePairs]]), so transitive chains
    * (a~b, b~c) collapse into one cluster with a canonical id (the minimum
    * member). The standard keep-one-per-cluster step of a dedup pipeline.
    *
    * Algorithm: min-label propagation with pointer doubling — each round
    * takes the min over (self, neighbors' labels, label-of-label), so chains
    * collapse in O(log diameter) rounds, not O(diameter) (a 1000-link chain
    * — pathological but possible under transitive near-dup merging —
    * converges in ~10 rounds). Every shuffle carries thin (long, long)
    * rows; the convergence flag rides the same aggregation that produces
    * the round's labels (the old label is carried through the union, so no
    * second comparison job runs per round). Each round's result is
    * materialized with `localCheckpoint` — the self-join + two unions grow
    * the LOGICAL plan ~4x per round, so without lineage truncation the plan
    * tree (not the data) explodes combinatorially (measured: driver OOM in
    * explainString after ~6 rounds).
    *
    * @return (id, cluster) — one row per node that appears in any pair.
    */
  def dupClusters(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // materialize the pair list ONCE: the symmetric edge view reads it twice
    // (union of both directions), and without this the caller's whole
    // candidate-generation pipeline (e.g. the minhash LSH plan) executes
    // twice just to build the edges
    val p = pairs.select(col("a").cast("long").as("u"), col("b").cast("long").as("v"))
      .localCheckpoint()
    val edges = p.select(col("u").as("x"), col("v").as("y"))
      .unionByName(p.select(col("v").as("x"), col("u").as("y")))
    var labels = edges.select(col("x").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val neighbor = edges.join(labels.withColumnRenamed("id", "y"), Seq("y"))
        .select(col("x").as("id"), col("label"))
      // pointer doubling: v also adopts the label of its current label node
      // (labels always point at graph nodes, so the self-join resolves)
      val hop = labels.as("l")
        .join(labels.select(col("id").as("label"), col("label").as("l2")), Seq("label"))
        .select(col("id"), col("l2").as("label"))
      // old label rides as min(old): exactly one row per id carries it
      // eager localCheckpoint = the round's one materializing action; it
      // also truncates lineage so the per-round plan stays constant-size
      val next = labels.select(col("id"), col("label"), col("label").as("old"))
        .unionByName(neighbor.withColumn("old", lit(Long.MaxValue)))
        .unionByName(hop.withColumn("old", lit(Long.MaxValue)))
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"), min(col("old")).as("old"))
        .localCheckpoint()
      val changed = next.where(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next.select(col("id"), col("label"))
      converged = changed == 0
      iter += 1
    }
    p.unpersist()
    require(converged, s"dupClusters: not converged after $maxIters rounds " +
      "(pathological chain graph — raise maxIters)")
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Embedding near-dup pairs: random-hyperplane LSH (deterministic in-plan
    * hash-derived planes, any dimensionality — see [[Similarity.bandKeys]])
    * -> bucket join -> exact cosine verification.
    *
    * Default banding (16 bands x 16 bits) keeps 65k buckets per band —
    * sized for ~0.95-cosine recall ~0.95 while staying sub-quadratic at
    * corpus scale (the previous 4x4-bit default had 16 buckets per band:
    * quadratic at any real size).
    */
  def embeddingCosinePairs(df: DataFrame, id: Column, vec: Column,
      minCosine: Double = 0.95, bands: Int = 16, rowsPerBand: Int = 16,
      dims: Int = 64): DataFrame = {
    val keys = Similarity.bandKeys(vec, bands, rowsPerBand, dims)
    val buckets = df.select(id.as("id"), vec.as("v"),
      posexplode(keys).as(Seq("band", "bh")))
    val l = buckets.select(col("band"), col("bh"), col("id").as("a"), col("v").as("va"))
    val r = buckets.select(col("band"), col("bh"), col("id").as("b"), col("v").as("vb"))
    l.join(r, Seq("band", "bh"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(first(cosineSim(col("va"), col("vb"))).as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}
