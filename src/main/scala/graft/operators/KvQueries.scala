package graft.operators

import graft.catalog.QueryDef
import graft.kv.KvStore
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's KV query surface (SURVEY.md §2.3) over the driver's
  * `events` table: the event stream is interpreted as a KV op log
  * (seq = event_id — the linearization order the Raft log provides in the
  * reference), replayed to final per-key state, and sharded with the
  * reference's key2shard function.
  */
object KvQueries {

  /** events → op log: signup starts a fresh state (put), everything else
    * appends. Deterministic, engine-neutral derivation.
    */
  def opLog(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id").as("seq"),
      when(col("event_type") === "signup", lit("put"))
        .otherwise(lit("append")).as("op"),
      concat(lit("u"), (col("user_id") % 50).cast("string")).as("key"),
      concat(substring(col("event_type"), 1, 1),
             (col("event_id") % 97).cast("string")).as("value"))

  private val opLogSql =
    """SELECT event_id AS seq,
      |       CASE WHEN event_type = 'signup' THEN 'put' ELSE 'append' END AS op,
      |       'u' || CAST(user_id % 50 AS VARCHAR) AS key,
      |       substr(event_type, 1, 1) || CAST(event_id % 97 AS VARCHAR) AS value
      |FROM events""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- batch replay: final state per key (put/append fold) ----
    QueryDef(
      "q24_kv_replay",
      s"""WITH ops AS ($opLogSql),
         |lp AS (SELECT *, max(CASE WHEN op = 'put' THEN seq END)
         |                 OVER (PARTITION BY key) AS last_put FROM ops)
         |SELECT key, string_agg(value, '' ORDER BY seq) AS value
         |FROM lp
         |WHERE last_put IS NULL OR seq >= last_put
         |GROUP BY key
         |ORDER BY key""".stripMargin) { (s, dir) =>
      KvStore.replay(opLog(s, dir)).orderBy("key")
    }.copy(headline = true),

    // ---- key2shard distribution: first byte mod 10 ----
    // Raw numeric keys so the first byte (and thus the shard) varies.
    QueryDef(
      "q25_kv_shard",
      """SELECT ascii(substr(CAST(user_id AS VARCHAR), 1, 1)) % 10 AS shard,
        |       count(*)                 AS n_ops,
        |       count(DISTINCT user_id)  AS n_keys
        |FROM events
        |GROUP BY 1
        |ORDER BY shard""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(KvStore.shardCol(col("user_id").cast("string")).as("shard"),
                col("user_id"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_ops"), countDistinct(col("user_id")).as("n_keys"))
        .orderBy("shard")
    },

    // ---- shard controller: Join/Leave/Move/Query rebalance sequence ----
    // The greedy rebalance (ascending-gid targets, strip-highest, hand
    // lowest free shards to lowest underfull gid) is fully deterministic,
    // so the oracle is the hand-derived golden assignment for this op
    // sequence. Invariants (coverage, balance, minimal movement) are
    // property-tested in ShardCtrlerSpec; this pins the exact algorithm.
    QueryDef(
      "q59_shard_rebalance",
      """SELECT * FROM (VALUES (0, 3), (1, 2), (2, 3), (3, 3), (4, 2),
        |                      (5, 2), (6, 2), (7, 4), (8, 4), (9, 4))
        |       AS t(shard, gid)
        |ORDER BY shard""".stripMargin) { (s, _) =>
      import s.implicits._
      val ctl = new graft.kv.ShardCtrler()
      ctl.join(Map(1 -> Seq("a")))
      ctl.join(Map(2 -> Seq("b"), 3 -> Seq("c")))
      ctl.leave(Seq(1))
      ctl.move(0, 3)
      ctl.join(Map(4 -> Seq("d")))
      ctl.latest.shards.zipWithIndex.map { case (g, sh) => (sh, g) }
        .toDF("shard", "gid")
        .orderBy("shard")
    }
  )
}
