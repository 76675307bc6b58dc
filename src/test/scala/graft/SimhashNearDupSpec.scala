package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Banded SimHash pair join: pigeonhole guarantees EXACT results for
  * hamming <= 3 — must equal the brute-force n² comparison. */
class SimhashNearDupSpec extends AnyFunSuite with SparkTestBase {

  Seq(1, 3).foreach { mh =>
    test(s"banded join equals brute force on real documents (maxHamming=$mh)") {
      val docs = graft.sources.Tables.load(spark, sf0001, "documents")
        .where(col("doc_id") < 120)
      val banded = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = mh)
        .select("doc_a", "doc_b", "hamming")
      val sigs = Dedup.simhash(docs, "doc_id", "text")
      val brute = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
        .where(col("hamming") <= mh)
      assert(banded.count() === brute.count())
      assert(banded.exceptAll(brute).count() === 0)
      assert(brute.exceptAll(banded).count() === 0)
      assert(banded.count() > 0, "fixture should contain near-dup simhashes")
    }
  }
}
