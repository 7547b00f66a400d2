package graft.gen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.schema.{Doc, Span}

/** Deterministic synthetic interleaved-corpus generator (no external data,
  * no RNG): each id derives a doc whose defect class is `id % NumClasses`,
  * so expected violation counts are closed-form in n — the driver's DuckDB
  * oracle recomputes them with a CASE over ids (FIXTURES.md §7).
  *
  * Class table (violations per doc):
  *   0 -> valid                              (0)
  *   1 -> duplicate 001                      (1 non_repeatable_field)
  *   2 -> missing 245                        (1 missing_required_field)
  *   3 -> 100+110 main entries               (1 multiple_1xx_fields)
  *   4 -> 006 data of length 6               (1 control_field_length_invalid)
  *   5 -> 336 with indicators "11"           (2 invalid_indicator)
  *   6 -> 020 with disallowed $t             (1 subfield_not_allowed)
  *   7 -> 010 with repeated non-rep $a       (1 non_repeatable_subfield)
  *   8 -> leader with bad record status 'x'  (1 string_pattern_mismatch)
  */
object Synth {

  val NumClasses = 9

  /** Violations contributed by each defect class (closed-form oracle). */
  val violationsPerClass: Array[Int] = Array(0, 1, 1, 1, 1, 2, 1, 1, 1)

  val ruleIdPerClass: Array[String] = Array(
    null, "non_repeatable_field", "missing_required_field", "multiple_1xx_fields",
    "control_field_length_invalid", "invalid_indicator", "subfield_not_allowed",
    "non_repeatable_subfield", "string_pattern_mismatch")

  def doc(id: Long): Doc = {
    val cls = (((id % NumClasses) + NumClasses) % NumClasses).toInt
    val b = Vector.newBuilder[Span]
    var off = 0
    def add(kind: String, text: String, mediaRef: String = null): Unit = {
      b += Span(kind, text, mediaRef, off); off += 1
    }
    val leader =
      if (cls == 8) "00454xam a22001575i 4500" else "00454cam a22001575i 4500"
    add("LDR", leader)
    add("001", f"on$id%012d")
    if (cls == 1) add("001", f"on$id%012d")
    if (cls == 4) add("006", "m|||||")
    add("008", "190306s2017    ht a   j      000 1 hat d")
    if (cls == 7) add("010", "  $a2001627090$a2001627091")
    if (cls == 6) add("020", "  $a9781234567897$tbad")
    if (cls == 3) { add("100", "1 $aAuthor, Synth"); add("110", "1 $aOrg, Synth") }
    add("050", " 4$aF00")
    if (cls != 2) add("245", s"00$$aTitle no. $id :$$bsynthetic /$$cGenerator")
    add("300", "  $a100 pages :")
    if (cls == 5) add("336", "11$astill image$bsti$2rdacontent")
    add("500", s"  $$aDeterministic note ${id * 2654435761L}")
    add("media", "", s"asset-${id % 1024}")
    add("910", s"  $$aRL$id")
    Doc(s"doc-$id", b.result())
  }

  /** Distributed generation: ids 0..n-1 -> Dataset[Doc]; parallelism follows
    * spark.range partitioning (scales to any n, no driver materialization).
    */
  def corpus(spark: SparkSession, n: Long,
      numPartitions: Option[Int] = None): Dataset[Doc] = {
    import spark.implicits._
    val ids = numPartitions.map(p => spark.range(0, n, 1, p)).getOrElse(spark.range(n))
    ids.map(id => doc(id))
  }

  /** Corpus from an existing id column (e.g. the driver's documents table). */
  def corpusFromIds(ids: Dataset[java.lang.Long]): Dataset[Doc] = {
    import ids.sparkSession.implicits._
    ids.map(id => doc(id.longValue()))
  }

  def corpusDF(spark: SparkSession, n: Long): DataFrame = corpus(spark, n).toDF()

  /** Realistic-mix doc: mostly clean, `defectPermille`/1000 docs carry one
    * deterministic defect class (hash-scattered, not striped, so defects
    * land uniformly across partitions). Healthy-corpus shape for benchmarks;
    * the striped `doc(id)` stays the oracle-checkable generator.
    */
  def docMixed(id: Long, defectPermille: Int): Doc = {
    val h = graft.expr.Mix64.mix(id)
    val cls =
      if (java.lang.Long.remainderUnsigned(h, 1000L) < defectPermille)
        1 + java.lang.Long.remainderUnsigned(h >>> 17, 8L).toInt
      else 0
    doc(id * NumClasses + cls) // reuse the striped generator's class layout
  }

  def corpusMixed(spark: SparkSession, n: Long, defectPermille: Int,
      numPartitions: Option[Int] = None): Dataset[Doc] = {
    import spark.implicits._
    val ids = numPartitions.map(p => spark.range(0, n, 1, p)).getOrElse(spark.range(n))
    ids.map(id => docMixed(id, defectPermille))
  }
}
