package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity dictionary (UID subsystem) — the reference maps entity
  * strings (market names, security ISINs) to fixed-width numeric ids
  * with a bidirectional HBase table plus a locked allocator row
  * (`marketdb-core/.../uid/UIDProvider.scala:40-44`, allocation with
  * row lock `:267-336`; widths 1 B market / 3 B security,
  * `core/MarketDB.scala:23-24`).
  *
  * In the Spark rebuild Parquet already dictionary-encodes strings, so
  * the UID table survives as a *capability*: stable integer surrogate
  * keys for entities, used via broadcast hash join (no shuffle of the
  * fact side). Allocation is deterministic batch assignment —
  * `row_number() over (order by name)` offset by the current max id —
  * which preserves the reference's guarantees (immutable ids, no reuse,
  * forward + reverse lookup, exhaustion error) without a distributed
  * lock.
  */
object UidDictionary {

  /** Build a fresh dictionary `(name, uid)` from the distinct values of
    * `nameCol`, ids dense from 1 in lexicographic name order
    * (deterministic across reruns — SURVEY §7 "Hard parts").
    * Allocation via OrderedIndex (range sort + zipWithIndex) so a
    * many-million-entity dictionary never funnels through one task. */
  def build(df: DataFrame, nameCol: String): DataFrame =
    OrderedIndex.attach(
      df.select(col(nameCol).as("name"))
        .where(col("name").isNotNull)
        .distinct(),
      Seq(col("name")), "uid", startAt = 1L)

  /** Extend an existing dictionary with any new names, never renumbering
    * existing entries (ids are immutable and never reused,
    * `UIDProvider.scala:27-29`). `maxWidthBytes` reproduces the
    * fixed-width exhaustion check (`UIDProvider.scala:256-265`). */
  def extend(existing: DataFrame, df: DataFrame, nameCol: String,
      maxWidthBytes: Int = 8): DataFrame = {
    val maxId = existing.agg(coalesce(max(col("uid")), lit(0L))).head().getLong(0)
    val fresh = OrderedIndex.attach(
      df.select(col(nameCol).as("name"))
        .where(col("name").isNotNull)
        .distinct()
        .join(existing.select("name"), Seq("name"), "left_anti"),
      Seq(col("name")), "uid", startAt = maxId + 1)
    val capacity = if (maxWidthBytes >= 8) Long.MaxValue else (1L << (8 * maxWidthBytes)) - 1
    val newMax = fresh.agg(coalesce(max(col("uid")), lit(0L))).head().getLong(0)
    require(newMax <= capacity,
      s"uid space exhausted: $newMax > $capacity ($maxWidthBytes bytes)")
    existing.unionByName(fresh)
  }

  /** Forward lookup join name→uid (`UIDProvider.scala:111-139`):
    * broadcast the dictionary — dims are tiny relative to facts. */
  def encode(facts: DataFrame, dict: DataFrame, nameCol: String,
      uidCol: String): DataFrame =
    facts.join(
      broadcast(dict.select(col("name").as(nameCol), col("uid").as(uidCol))),
      Seq(nameCol), "left")

  /** Reverse lookup uid→name (`UIDProvider.scala:79-109`). */
  def decode(facts: DataFrame, dict: DataFrame, uidCol: String,
      nameCol: String): DataFrame =
    facts.join(
      broadcast(dict.select(col("uid").as(uidCol), col("name").as(nameCol))),
      Seq(uidCol), "left")
}
