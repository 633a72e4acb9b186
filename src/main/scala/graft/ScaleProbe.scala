package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe (SURVEY §6): time SparkEntry queries against
  * perturbed 1×/2×/4× replicas of the sf tables, to catch super-linear
  * operators BEFORE they sink a 100 TB run (this is how
  * lsh_verified_pairs' fixed-band quadratic was found in r5).
  *
  * Replicas are perturbed so they don't create cross-replica matches —
  * more DATA, not more duplicates:
  *   - documents: replica i gets fresh doc_ids and case-flipped text
  *     with a replica-salt prefix (not near-dups of the original);
  *   - orders: fresh order keys AND fresh customer keys (per-customer
  *     order density stays constant — the honest "more customers" growth
  *     model for keyed self-joins);
  *   - embeddings: fresh vec_ids, sign-flipped alternating dims.
  * Other tables are reused from the base dir unchanged.
  *
  * Usage: runMain graft.ScaleProbe <query> [<query> ...]
  *   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PROBE_FACTORS
  *   (default "1,2,4"), SPARK_GRAFT_PROBE_RUNS (default 3, median),
  *   SPARK_GRAFT_PROBE_AXIS: "width" (default) or "depth".
  *
  * Axes: "width" replicates KEYS (more assets/docs/vectors, constant
  * per-key history) — the shuffle/partition scaling question. "depth"
  * replicates per-key HISTORY (same asset ids, each replica's events
  * shifted past the previous calendar span, fresh event_ids) — the
  * axis width probes can never see, and the dangerous one for the
  * recursive-fold family (kama/heikin_ashi/supertrend/psar/
  * fisher_transform accumulate per-asset arrays, where an O(h²)
  * copy constant hides from any more-assets probe). In depth mode
  * only `events` is replicated; the other tables ride at 1×.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val axis = sys.env.getOrElse("SPARK_GRAFT_PROBE_AXIS", "width")
    require(axis == "width" || axis == "depth" || axis == "zipf",
      s"unknown probe axis: $axis")
    val factors = sys.env.getOrElse("SPARK_GRAFT_PROBE_FACTORS", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftConf.tune(spark)
    // Ad-hoc conf overrides for probe experiments, e.g.
    // SPARK_GRAFT_PROBE_CONF="spark.sql.adaptive.coalescePartitions.enabled=false"
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    spark.sparkContext.setLogLevel("WARN")

    def replicate(table: String, factor: Int, dir: String): Unit = {
      // Lazily read only inside the replicated branches (the events
      // branch reads via Tables.events instead, never through this).
      def src = Tables.read(spark, base, table)
      val out = table match {
        case t if (axis == "depth" || axis == "zipf") && t != "events" =>
          null // 1×, copied below
        case "events" if axis == "zipf" =>
          // Hot-key axis: replica i>0 re-lands EVERY event on one user
          // (user_id = 0) with fresh event_ids, so at factor f the hot
          // key carries (f−1)/f of all rows — the Zipf shape AQE's
          // skew split never fixes for window partitions (it only
          // splits sort-merge joins). Dates/ts unchanged: the skew is
          // in the KEY, not the calendar.
          val ev = Tables.events(spark, base)
          val maxE = ev.agg(max("event_id")).head.getLong(0) + 1
          (0 until factor).map { i =>
            if (i == 0) ev
            else ev.withColumn("user_id", lit(0L))
              .withColumn("event_id", col("event_id") + lit(i * maxE))
          }.reduce(_ unionByName _)
        case "events" if axis == "depth" =>
          // History-depth replication: replica i shifts every event
          // i·(span+1) days forward under the SAME asset ids, so each
          // asset's series gets `factor`× longer — no new keys, no new
          // collisions (fresh event_ids; shifted dates never overlap).
          val ev = Tables.events(spark, base)
          val span = ev.agg(
            (datediff(max(col("ts").cast("date")), min(col("ts").cast("date"))) + 1)
              .as("d")).head.getInt(0)
          val maxE = ev.agg(max("event_id")).head.getLong(0) + 1
          (0 until factor).map { i =>
            ev.withColumn("ts", col("ts") + expr(s"INTERVAL ${i.toLong * span} DAYS"))
              .withColumn("event_id", col("event_id") + lit(i * maxE))
          }.reduce(_ unionByName _)
        case "documents" =>
          val maxId = src.agg(max("doc_id")).head.getLong(0) + 1
          // Replica texts must share NO shingles with the base or each
          // other — a case flip is NOT enough on an already-lowercase
          // corpus (lower(text) == text made even replicas near-dups of
          // the base, quadratically inflating the pair probes). A
          // per-replica Caesar rotation rewrites every character, so
          // replicas add DATA, never duplicates.
          val alphabet = "abcdefghijklmnopqrstuvwxyz"
          (0 until factor).map { i =>
            if (i == 0) src
            else {
              val shift = (i - 1) % 25 + 1
              val rotated = alphabet.drop(shift) + alphabet.take(shift)
              src.select(
                (col("doc_id") + lit(i * maxId)).as("doc_id"),
                concat(lit(s"r$i "),
                  translate(lower(col("text")), alphabet, rotated)).as("text"),
                col("lang"), col("source"), col("n_chars"))
            }
          }.reduce(_ unionByName _)
        case "orders" =>
          val maxK = src.agg(max("o_orderkey")).head.getLong(0) + 1
          val maxC = src.agg(max("o_custkey")).head.getLong(0) + 1
          (0 until factor).map { i =>
            src.select(
              (col("o_orderkey") + lit(i * maxK)).as("o_orderkey"),
              (col("o_custkey") + lit(i * maxC)).as("o_custkey"),
              col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
              col("o_orderpriority"))
          }.reduce(_ unionByName _)
        case "embeddings" =>
          val maxId = src.agg(max("vec_id")).head.getLong(0) + 1
          (0 until factor).map { i =>
            if (i == 0) src
            else src.select(
              (col("vec_id") + lit(i * maxId)).as("vec_id"),
              transform(col("embedding"),
                (x, j) => when(pmod(j + lit(i), lit(2)) === 0, -x).otherwise(x)).as("embedding"),
              col("label"))
          }.reduce(_ unionByName _)
        case "lineitem" =>
          val maxO = src.agg(max("l_orderkey")).head.getLong(0) + 1
          val maxS = src.agg(max("l_suppkey")).head.getLong(0) + 1
          val maxP = src.agg(max("l_partkey")).head.getLong(0) + 1
          (0 until factor).map { i =>
            src.withColumn("l_orderkey", col("l_orderkey") + lit(i * maxO))
              .withColumn("l_suppkey", col("l_suppkey") + lit(i * maxS))
              .withColumn("l_partkey", col("l_partkey") + lit(i * maxP))
          }.reduce(_ unionByName _)
        case "events" =>
          // Go through Tables.events, which schema-probes the raw file
          // (nanos-as-long OR µs TIMESTAMP_NTZ) and yields a uniform
          // TimestampType ts; the replica then writes standard µs
          // parquet TIMESTAMP, which Tables.events passes through
          // unchanged on re-read. Fresh user_ids (asset_ids) per
          // replica: constant per-key density, the honest growth model
          // for every panel operator.
          val ev = Tables.events(spark, base)
          val maxU = ev.agg(max("user_id")).head.getLong(0) + 1
          val maxE = ev.agg(max("event_id")).head.getLong(0) + 1
          (0 until factor).map { i =>
            ev.withColumn("user_id", col("user_id") + lit(i * maxU))
              .withColumn("event_id", col("event_id") + lit(i * maxE))
          }.reduce(_ unionByName _)
        case _ => null // unreplicated tables are file-copied below
      }
      // File count scales with the factor: a fixed coalesce(4) capped
      // the replicated store at 4 files → 4 scan tasks for the whole
      // 8× corpus, which measured as a phantom superlinear bend in
      // scan-bound queries (parallelism starvation, not query cost).
      if (out != null)
        out.coalesce(4 * factor).write.mode("overwrite").parquet(s"$dir/$table.parquet")
      else {
        // raw file copy for the small unreplicated dims
        val from = java.nio.file.Paths.get(s"$base/$table.parquet")
        val to = java.nio.file.Paths.get(s"$dir/$table.parquet")
        java.nio.file.Files.createDirectories(to.getParent)
        java.nio.file.Files.copy(from, to,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    val allTables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    factors.foreach { f =>
      val dir = s"/tmp/scaleprobe/$axis-f$f"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      allTables.foreach(t => replicate(t, f, dir))
    }

    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = factors.map { f =>
        val dir = s"/tmp/scaleprobe/$axis-f$f"
        val samples = (1 to runs).map { _ =>
          // Optional per-stage breakdown (SPARK_GRAFT_PROBE_STAGES=1):
          // stage wall-times + task counts for the slowest stages of the
          // LAST run — the "where did the 8× second go" view.
          val stages = new scala.collection.mutable.ArrayBuffer[(Int, Long, Int, String)]
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val si = sc.stageInfo
              for (s <- si.submissionTime; c <- si.completionTime)
                stages.synchronized {
                  stages += ((si.stageId, c - s, si.numTasks,
                    si.name.takeWhile(_ != '(').trim))
                }
            }
          }
          val wantStages = sys.env.get("SPARK_GRAFT_PROBE_STAGES").contains("1")
          if (wantStages) spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          if (wantStages) {
            spark.sparkContext.removeSparkListener(listener)
            val top = stages.sortBy(-_._2).take(6)
              .map { case (id, ms, n, nm) => f"s$id[$nm]=${ms / 1000.0}%.1fs/${n}t" }
            println(s"[stages] $name ${f}x " + top.mkString(" "))
          }
          dt
        }.sorted
        f -> samples(samples.length / 2)
      }
      println(s"[probe] $name " +
        times.map { case (f, t) => f"${f}x=$t%.2fs" }.mkString(" "))
    }
    spark.stop()
  }
}
