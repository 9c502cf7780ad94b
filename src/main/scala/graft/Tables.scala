package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet readers for the driver corpus (TESTDATA.md / FIXTURES.md §B).
  *
  * Scale note: these are plain `spark.read.parquet` scans so Catalyst can
  * push filters and prune columns into the scan; at cluster scale the same
  * call reads a partitioned directory tree and partition-prunes for free.
  *
  * `events.parquet` stores `ts` as Parquet INT64 TIMESTAMP(NANOS,false).
  * Spark 4 refuses it ([PARQUET_TYPE_ILLEGAL]) unless
  * `spark.sql.legacy.parquet.nanosAsLong=true`, which reads it as LongType
  * (nanoseconds since epoch). The driver-owned sessions don't set the flag,
  * so it is set dynamically here before any `events` read.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** DataFrame (= analyzed plan) cache per (session, dir, table): building
    * a parquet DataFrame lists the directory and reads footers for schema
    * inference — ~0.1-0.3 s per call that Verify/Bench would otherwise pay
    * ~200× across the registry. Plans are immutable, so reuse is safe. The
    * session key is a random UUID minted per session — unlike an identity
    * hash, it can never ALIAS between a collected session and a new one in
    * a long-lived JVM (the r11 correctness hazard this fixes: hash reuse
    * after GC handing session B a plan bound to dead session A). Retention
    * is deliberate and unchanged from the identity-hash version: cached
    * DataFrames reference their session, so entries live for the JVM —
    * bounded by (sessions ever created × tables), a few KB of plan each in
    * this harness's 1-2-session processes.
    */
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), DataFrame]()

  private val sessionIds: java.util.Map[SparkSession, String] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Per-session UUID via a weak identity map — the ONE place that may
    * key on a live SparkSession: the String value holds no reference back
    * to the session, so the weak key actually works (a map whose VALUES
    * are DataFrames would pin its session keys forever — DataFrames
    * reference their session). Caches elsewhere key on this UUID instead.
    */
  private[graft] def sessionKey(spark: SparkSession): String =
    sessionIds.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    planCache.computeIfAbsent(
      (sessionKey(spark), sfDir, name),
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Register every corpus table as a temp view, for spark.sql operators. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => read(spark, sfDir, n).createOrReplaceTempView(n))
}
