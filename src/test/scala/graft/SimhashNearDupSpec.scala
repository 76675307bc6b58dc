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

  Seq(1, 3).foreach { mh =>
    test(s"64-bit banded join equals brute force (maxHamming=$mh)") {
      val docs = graft.sources.Tables.load(spark, sf0001, "documents")
        .where(col("doc_id") < 120)
      val banded = Dedup.simhashNearDup64(docs, "doc_id", "text", maxHamming = mh)
        .select("doc_a", "doc_b", "hamming")
      val sigs = Dedup.simhash64(docs, "doc_id", "text")
      val brute = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("bit_count(a.simhash64 ^ b.simhash64)").cast("long").as("hamming"))
        .where(col("hamming") <= mh)
      assert(banded.count() === brute.count())
      assert(banded.exceptAll(brute).count() === 0)
      assert(brute.exceptAll(banded).count() === 0)
    }
  }

  test("64-bit fingerprint refines the 16-bit one: fewer collisions, bits 0,4,8,… agree") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val s16 = Dedup.simhash(docs, "doc_id", "text")
    val s64 = Dedup.simhash64(docs, "doc_id", "text")
    // positional consistency: 64-bit bit 4j carries the SAME vote as
    // 16-bit bit j (both are the top bit of md5 nibble j)
    val joined = s16.join(s64, "doc_id")
      .withColumn("fold16", (0 until 16).map(j =>
        when(expr(s"(simhash64 >> ${63 - 4 * j}) & 1") === 1,
          lit(1L << (15 - j))).otherwise(lit(0L))).reduce(_ + _))
    assert(joined.where(col("fold16") =!= col("simhash")).count() === 0)
    // collision reduction: strictly more distinct 64-bit signatures
    // (remaining 64-bit collisions are genuine near-dup documents whose
    // token bags coincide — not fingerprint weakness)
    val d16 = s16.select("simhash").distinct().count()
    val d64 = s64.select("simhash64").distinct().count()
    assert(d64 > d16, s"expected 64-bit to separate more docs: $d64 vs $d16")
  }
}
