package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning primitive a managed
  * training corpus needs between releases: classify every document id
  * as added / removed / changed / unchanged across two versions
  * WITHOUT comparing text bytes across the wire. Each side reduces to
  * (id, md5(content)) in its own scan — the join then moves 16-byte
  * digests, not documents — and one full-outer hash join on the id
  * produces the verdict. At 100 TB: two column-pruned scans + one
  * hash exchange on the id; content equality by digest (the same
  * md5 both engines share, so the q140 oracle is exact). */
object SnapshotDiff {

  def diff(v1: DataFrame, v2: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val a = v1.select(col(idCol).as("__id"),
      md5(col(contentCol).cast("binary")).as("h1"))
    val b = v2.select(col(idCol).as("__id"),
      md5(col(contentCol).cast("binary")).as("h2"))
    a.join(b, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") =!= col("h2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
