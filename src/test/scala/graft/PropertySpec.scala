package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, OrderedIndex, OrderedMerge}

/** Property-based invariants (SURVEY §5 rebuild test plan): time-order
  * preservation under merge, dense-id allocation semantics, as-of join
  * vs. brute force, parse∘format identity for the RTS time format.
  * ScalaCheck generators sampled under fixed seeds (no scalatestplus
  * bridge in the offline cache) — failures are reproducible. */
class PropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def ts(ms: Long) = new Timestamp(1330000000000L + ms)

  test("merge of arbitrary sorted streams is non-decreasing in time") {
    val streamsGen = Gen.listOfN(4, Gen.listOfN(20, Gen.chooseNum(0L, 100000L)))
    samples(streamsGen, 8).foreach { streams =>
      val dfs = streams.zipWithIndex.map { case (times, i) =>
        times.sorted.zipWithIndex
          .map { case (t, j) => (i.toLong * 1000 + j, ts(t)) }
          .toDF("id", "time")
      }
      val merged = OrderedMerge.merge("time", dfs: _*)
      assert(merged.count() === streams.map(_.size).sum)
      assert(OrderedMerge.inversions(merged, "time") === 0)
    }
  }

  test("OrderedIndex assigns exactly 0..n-1 in sort order, any partitioning") {
    val namesGen = Gen.zip(
      Gen.listOfN(25, Gen.identifier.map(_.take(8))), Gen.chooseNum(1, 5))
    samples(namesGen, 8).foreach { case (names, parts) =>
      val distinct = names.distinct.filter(_.nonEmpty)
      val df = distinct.toDF("name").repartition(parts)
      val got = OrderedIndex.attach(df, Seq(col("name")), "idx")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = distinct.sorted.zipWithIndex
        .map { case (n, i) => n -> i.toLong }.toMap
      assert(got === want, s"parts=$parts")
    }
  }

  test("as-of join equals per-row brute-force latest-prior lookup") {
    val evGen = Gen.listOfN(15,
      Gen.zip(Gen.oneOf("A", "B"), Gen.chooseNum(0L, 50L)))
    samples(Gen.zip(evGen, evGen), 8).foreach { case (leftRaw, rightRaw) =>
      val left = leftRaw.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t * 1000)) }
        .toDF("lid", "k", "t")
      val right = rightRaw.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t * 1000), t * 1.5) }
        .toDF("rid", "k", "rt", "v")
      val joined = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt",
          Seq("v" -> "last_v"), rightTie = Seq("rid"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      // brute force: row with max (rt, rid) among rt <= t per left row
      val expected = leftRaw.zipWithIndex.map { case ((k, t), i) =>
        val cands = rightRaw.zipWithIndex.collect {
          case ((rk, rt), ri) if rk == k && rt <= t => (rt, ri.toLong)
        }
        i.toLong -> (if (cands.isEmpty) None
          else Some(rightRaw(cands.max._2.toInt)._2 * 1.5))
      }.toMap
      assert(joined === expected)
    }
  }

  test("range join equals the naive inequality join on random inputs") {
    import graft.operators.RangeJoin
    val pointsGen = Gen.listOfN(40, Gen.zip(Gen.oneOf("A", "B"), Gen.chooseNum(0L, 200L)))
    val intervalsGen = Gen.listOfN(10,
      Gen.zip(Gen.oneOf("A", "B"), Gen.chooseNum(0L, 200L), Gen.chooseNum(0L, 80L)))
    val widthGen = Gen.oneOf(1L, 13L, 64L, 500L)
    samples(Gen.zip(pointsGen, intervalsGen, widthGen), 6).foreach {
      case (ps, is, w) =>
        val points = ps.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("pid", "k", "t")
        val intervals = is.zipWithIndex
          .map { case ((k, s, len), i) => (i.toLong, k, s, s + len) }
          .toDF("iid", "k", "s", "e")
        val naive = points.join(intervals,
            points("k") === intervals("k") && col("t") >= col("s") && col("t") <= col("e"))
          .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val bucketed = RangeJoin.pointInInterval(points, intervals,
            Seq("k"), "t", "s", "e", w)
          .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(bucketed === naive, s"width=$w")
    }
  }

  test("salted join equals plain join on random skewed inputs") {
    import graft.operators.SkewJoin
    val bigGen = Gen.listOfN(60, Gen.frequency(
      4 -> Gen.const("hot"), 1 -> Gen.oneOf("a", "b", "c", "zz")))
    val smallGen = Gen.someOf(Seq("hot", "a", "b", "c", "d"))
    samples(Gen.zip(bigGen, smallGen, Gen.chooseNum(1, 9)), 6).foreach {
      case (bigKeys, smallKeys, nSalt) =>
        val big = bigKeys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
          .toDF("id", "key")
        val small = smallKeys.toSeq.map(k => (k, k.length)).toDF("key", "w")
        val plain = big.join(small, "key")
          .select("id", "w").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
        val salted = SkewJoin.salted(big, small, Seq("key"), col("id"), nSalt)
          .select("id", "w").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
        assert(salted === plain, s"nSalt=$nSalt")
    }
  }

  test("streaming pure-Scala simhash64 equals the expression pipeline on random text") {
    // random tokens incl. punctuation, digits, empty runs, unicode —
    // edge shapes the fixture corpus doesn't exercise
    val tokGen = Gen.oneOf(
      Gen.identifier.map(_.take(6)),
      Gen.numStr.map(_.take(4)),
      Gen.oneOf("...", "?!", "a,b", "Ünïcode", "ÅÄÖ", "x"),
      Gen.const(""))
    val textGen = Gen.listOfN(12, tokGen).map(_.mkString(" "))
    val texts = samples(textGen, 40).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fromExpr = graft.operators.Dedup.simhash64(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      // docs with zero tokens produce no expression row — skip those
      fromExpr.get(i.toLong).foreach { sig =>
        assert(graft.streaming.StreamingNearDup.simhash64(t) === sig,
          s"mismatch for text '$t'")
      }
    }
    assert(fromExpr.nonEmpty)
  }

  test("RTS time parse is the inverse of format (round-trip identity)") {
    val msGen = Gen.chooseNum(0L, 4102444800000L)
    val ms = samples(msGen, 32)
    val fmt = graft.model.Schemas.rtsTimeFormat
    val bad = ms.toDF("ms")
      .select(timestamp_millis(col("ms")).as("t"))
      .select(col("t"),
        to_timestamp(date_format(col("t"), fmt), fmt).as("rt"))
      .where(col("t") =!= col("rt"))
      .count()
    assert(bad === 0)
  }

  test("hashSplit bucket equals an independent pure-Java md5 for arbitrary ids") {
    // engine-independence: the Column expression (md5/substring/conv)
    // must agree with a from-scratch MessageDigest recomputation for
    // any long id, including negatives — the property that lets any
    // engine (DuckDB oracle included) re-derive the assignment
    def reference(id: Long, salt: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:$salt".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val idsGen = Gen.listOfN(200, Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    samples(idsGen, 4).foreach { ids =>
      val got = graft.operators.Splits
        .hashSplit(ids.distinct.toDF("id"), "id", "s42",
          Seq(("train", 90), ("val", 5), ("test", 5)))
        .select("id", "bucket").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      ids.distinct.foreach { id =>
        assert(got(id) === reference(id, "s42"), s"id $id")
      }
    }
  }
}
