package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.checks.SpanInvariant
import graft.gen.Synth

/** Span-sequence invariant check: order (offset == position) and media_ref
  * presence, detected via HOFs with no explode.
  */
class SpanInvariantSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("clean corpus passes; reorder and media_ref corruption are caught per row") {
    val docs = Synth.corpusDF(spark, 90)
    val clean = SpanInvariant.check(docs)
    assert(clean.where(!$"span_order_ok" || !$"media_ref_ok").count() == 0)

    // corrupt order: reverse the spans of every 7th doc (offsets then run
    // n-1..0, mismatching positions)
    val reordered = docs.withColumn("spans",
      when(substring($"doc_id", 5, 20).cast("long") % 7 === 0, reverse($"spans")).otherwise($"spans"))
    val r = SpanInvariant.check(reordered)
    assert(r.where(!$"span_order_ok").count() ==
      docs.where(substring($"doc_id", 5, 20).cast("long") % 7 === 0).count())
    assert(r.where(!$"media_ref_ok").count() == 0) // reversal keeps pairing

    // corrupt media: null out media_ref on every 11th doc's media spans
    val stripped = docs.withColumn("spans",
      when(substring($"doc_id", 5, 20).cast("long") % 11 === 0,
        transform($"spans", s => struct(
          s.getField("kind").as("kind"), s.getField("text").as("text"),
          lit(null).cast("string").as("media_ref"),
          s.getField("offset").as("offset"))))
        .otherwise($"spans"))
    val m = SpanInvariant.check(stripped)
    assert(m.where(!$"media_ref_ok").count() ==
      docs.where(substring($"doc_id", 5, 20).cast("long") % 11 === 0).count())
    assert(m.where(!$"span_order_ok").count() == 0)

    // empty spans are vacuously ordered and media-consistent
    val empty = Seq(("d0", Seq.empty[graft.schema.Span])).toDF("doc_id", "spans")
    val e = SpanInvariant.check(empty).collect().head
    assert(e.getAs[Boolean]("span_order_ok") && e.getAs[Boolean]("media_ref_ok"))
  }

  test("the check is explode-free whole-stage codegen (north-star constraint)") {
    val plan = SpanInvariant.check(Synth.corpusDF(spark, 9))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"explode in the invariant check:\n$plan")
    assert(!plan.contains("Exchange"), s"shuffle in the invariant check:\n$plan")
  }
}
