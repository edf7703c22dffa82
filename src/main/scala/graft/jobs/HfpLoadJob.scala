package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{DaySink, FsUtil, HfpCsvSource, ParquetDaySink}

/** The reference's whole day-load orchestration (hfpTask.ts:13-151) as
  * one idempotent batch job: per event group — scan the group+date CSV
  * prefix, cast, key-filter, route, anti-join against the sink's
  * existing keys for that operating day, append.
  *
  * Faithful behaviors (SURVEY.md §3):
  *  - groups processed in the fixed order StopEvent, OtherEvent,
  *    VehiclePosition (hfpTask.ts:83-86)
  *  - VehiclePosition rows with `journey_type != 'journey'` route to
  *    `unsignedevent` (insertHfpFromBlobStream.ts:62-70)
  *  - the VP dedup build side is the UNION of vehicleposition and
  *    unsignedevent keys (hfpTask.ts:100-103)
  *  - dedup keys are read BEFORE the group's write starts (read
  *    isolation, hfpTask.ts:97-111)
  *  - re-running a day inserts nothing new (idempotency,
  *    hfpStorage.ts:15-16) — at-least-once within a run, healed by
  *    re-run dedup; no transactions, same as the reference
  *
  * Scale: each group is scan → narrow ops → one broadcast/shuffled
  * anti-join → partitioned append; the sink layout (`oday=` partitions)
  * makes the next run's key scan partition-pruned.
  */
object HfpLoadJob {

  /** X2 — CLI date validation (reference index.ts:9-21): the job takes
    * one operating-day argument, which must be a real `YYYY-MM-DD`
    * calendar date; anything else aborts before any Spark work. Returns
    * the normalized ISO date or a Left(reason).
    */
  def validateDate(arg: String): Either[String, String] =
    if (!arg.matches("\\d{4}-\\d{2}-\\d{2}"))
      Left(s"invalid date '$arg': expected YYYY-MM-DD")
    else
      try Right(java.time.LocalDate.parse(arg).toString)
      catch { case e: java.time.format.DateTimeParseException =>
        Left(s"invalid date '$arg': ${e.getMessage}") }

  /** Build the sink from the CLI's sink argument: a `jdbc:` URL selects
    * the reference's actual sink shape (Postgres), anything else is a
    * warehouse directory for the parquet twin. Credentials and batching
    * come from the secrets-resolved environment (X1,
    * [[graft.sources.SecretsConfig]]) with the reference's exact keys:
    * PGUSER/PGPASSWORD, EVENT_BATCH_SIZE, INSERT_CONCURRENCY
    * (constants.ts:35-52).
    */
  private[graft] def sinkFor(arg: String,
      env: Map[String, String] = sys.env,
      secretsPath: String = graft.sources.SecretsConfig.DefaultSecretsPath): DaySink =
    if (arg.startsWith("jdbc:")) {
      val e = graft.sources.SecretsConfig.resolve(env, secretsPath)
      // fail FAST on missing credentials, like the reference's
      // required-config resolution (constants.ts:35-43) — a silent ""
      // default would surface only at connect time (or connect
      // unauthenticated if the server allows it)
      val missing = Seq("PGUSER", "PGPASSWORD")
        .filterNot(k => e.get(k).exists(_.trim.nonEmpty))
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"jdbc sink requires ${missing.mkString(" and ")} in the " +
            "environment or /run/secrets")
      def num(key: String, dflt: Int): Int =
        e.get(key).flatMap(_.trim.toIntOption).getOrElse(dflt)
      // the USED values must be the VALIDATED values: the user is
      // trimmed (identifiers never legitimately carry edge whitespace —
      // a secrets file preserving a trailing space would pass the
      // presence check yet send " app " to the driver, failing auth at
      // connect time, exactly the late failure the fail-fast check
      // exists to avoid). The password only sheds the trailing
      // newline a secrets FILE appends — interior/edge spaces can be a
      // legitimate part of a password, so they pass through verbatim.
      graft.sources.JdbcDaySink(
        url = arg,
        user = e("PGUSER").trim,
        password = e("PGPASSWORD").replaceAll("[\r\n]+$", ""),
        batchSize = num("EVENT_BATCH_SIZE", 1000),
        numPartitions = num("INSERT_CONCURRENCY", 100),
        // engine extension (no reference analog — the reference applies
        // postgres_schema.sql by out-of-band migration): opt-in
        // create-if-absent bootstrap so a load pointed at an empty
        // database gets the migration's column types
        bootstrapDdl = e.get("GRAFT_BOOTSTRAP_DDL")
          .exists(v => Set("1", "true", "yes").contains(v.trim.toLowerCase)))
    } else ParquetDaySink(arg)

  /** CLI entry: `HfpLoadJob <csvRoot> <sinkDirOrJdbcUrl> <date>` —
    * validates the date (X2), then runs [[loadDay]] and prints
    * per-table row counts.
    */
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println("usage: HfpLoadJob <csvRoot> <sinkDirOrJdbcUrl> <YYYY-MM-DD>")
      sys.exit(2)
    }
    validateDate(args(2)) match {
      case Left(reason) =>
        System.err.println(reason)
        sys.exit(2)
      case Right(date) =>
        // resolve the sink BEFORE any Spark work so a misconfigured
        // jdbc: run is a usage error, not a late connect failure
        val sink =
          try sinkFor(args(1))
          catch { case e: IllegalArgumentException =>
            System.err.println(e.getMessage)
            sys.exit(2)
          }
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
          .config("spark.sql.session.timeZone", "UTC")
          .getOrCreate()
        try loadDay(spark, args(0), sink, date)
          .foreach { case (t, n) => println(s"$t: $n") }
        finally spark.stop()
    }
  }

  /** Fixed group order and group→table map (utils/hfp.ts:54-58). */
  val groups: Seq[(String, String)] = Seq(
    "StopEvent" -> "stopevent",
    "OtherEvent" -> "otherevent",
    "VehiclePosition" -> "vehicleposition")

  /** The traffic-light-priority route — schema-declared but dead in the
    * reference (postgres_schema.sql:1-61 declares the table; no code
    * path routes to it), so it is opt-in here: `loadDay(...,
    * includeLightPriority = true)` appends this group after the fixed
    * three.
    */
  val lightPriorityGroup: (String, String) =
    "LightPriorityEvent" -> "lightpriorityevent"

  /** Load one day from `csvRoot/csv/<group>/<date>*` into
    * `sinkDir/<table>/oday=...` parquet. Returns rows appended per
    * table.
    */
  def loadDay(spark: SparkSession, csvRoot: String, sinkDir: String,
      date: String): Map[String, Long] =
    loadDay(spark, csvRoot, ParquetDaySink(sinkDir), date)

  /** Sink-parameterized day load: same orchestration against either the
    * parquet warehouse twin or a real JDBC database ([[DaySink]]). All
    * path probes go through the Hadoop FileSystem API ([[FsUtil]]) —
    * `java.io.File` would be always-false on `hdfs://`/`abfss://` URIs,
    * silently loading nothing.
    */
  def loadDay(spark: SparkSession, csvRoot: String, sink: DaySink,
      date: String, includeLightPriority: Boolean = false): Map[String, Long] = {
    val results = scala.collection.mutable.LinkedHashMap[String, Long]()
    val dayGroups =
      if (includeLightPriority) groups :+ lightPriorityGroup else groups
    dayGroups.foreach { case (group, table) =>
      // S1 blob-list analog: does this group have any files for the
      // date prefix? (globStatus, not a local-FS directory probe). The
      // fixed prefix is escaped so a csvRoot containing glob
      // metacharacters ([, {, *) stays literal — only the trailing `*`
      // is pattern syntax. The same escaped pattern feeds the CSV
      // reader, which resolves paths with the same glob grammar.
      val pattern = FsUtil.escapeGlob(s"$csvRoot/csv/$group/$date") + "*"
      if (FsUtil.globNonEmpty(spark, pattern)) {
        val isTlp = group == lightPriorityGroup._1
        val raw =
          if (isTlp) HfpCsvSource.readLightPriority(spark, pattern)
          else HfpCsvSource.read(spark, pattern)
        val typed0 = (if (isTlp) HfpCsvSource.castAllLightPriority(raw)
          else HfpCsvSource.castAll(raw))
          .where(col("uuid").isNotNull && col("uuid") =!= "") // C4
        // the VP group feeds TWO routes — persist so the CSV scan+cast
        // runs once for both, not once per route
        val typed =
          if (group == "VehiclePosition") typed0.persist() else typed0
        // C5 routing: only the VP group splits
        val routes: Seq[(String, DataFrame)] =
          if (group == "VehiclePosition")
            Seq(
              "vehicleposition" -> typed.where(col("journey_type") === "journey"),
              "unsignedevent" -> typed.where(
                col("journey_type").isNull || col("journey_type") =!= "journey"))
          else Seq(table -> typed)
        // A1 build side, read BEFORE writes start; VP unions both tables.
        // PINNED (eager localCheckpoint) so the key set is frozen at
        // group start, matching the reference's snapshot-then-write
        // order (hfpTask.ts:97-111): a lazy frame would re-run the key
        // scan at route 2's action and observe route 1's just-appended
        // keys, dropping a uuid that appears in BOTH VP routes within
        // one run (the reference inserts both rows) — see
        // [[pinnedBuildSide]] for why a persist+count pin is not enough
        // against the parquet sink.
        val rawBuild =
          if (group == "VehiclePosition")
            sink.existingKeys(spark, "vehicleposition", date)
              .union(sink.existingKeys(spark, "unsignedevent", date))
          else sink.existingKeys(spark, table, date)
        val (buildSide, unpin) = pinnedBuildSide(rawBuild)
        try routes.foreach { case (targetTable, df) =>
          // r16 (guide §1.4/§5): ONE action per route — the appended-row
          // count rides the write itself as an observed metric, so the
          // scan+cast+anti-join streams straight into the sink. The old
          // persist→count→append shape ran two jobs per route and
          // round-tripped every fresh row through the block store; at
          // 100 TB that cache write/read is a full extra copy of the
          // day. A zero-row route now issues a zero-row append (a no-op
          // INSERT on JDBC; a _SUCCESS-only dir on parquet, which the
          // `oday=*` existence probes already handle — NOTES #56b).
          val fresh = df.join(buildSide, Seq("uuid"), "left_anti")
          val obs = org.apache.spark.sql.Observation()
          sink.append(fresh.observe(obs, count(lit(1)).as("n")), targetTable)
          val n = obs.get("n").asInstanceOf[Long]
          results(targetTable) = results.getOrElse(targetTable, 0L) + n
        } finally {
          unpin()
          if (group == "VehiclePosition") typed.unpersist(blocking = false)
        }
      }
    }
    results.toMap
  }

  /** Estimated broadcast bytes per key row: a 36-char uuid is ~56 bytes
    * as an UnsafeRow (8B null bits + 8B offset/len word + padded
    * string), and the driver-collected BroadcastHashJoin relation
    * (hashed relation map + object headers) typically carries 3-4× that
    * — so ~224 bytes end to end. Sizing by raw string bytes alone would
    * let a "40 MB" key set pressure a default driver heap with the real
    * ~160 MB relation.
    */
  private[graft] val BroadcastKeyRowBytes = 224L

  /** One day's keys broadcast below this many rows; above it the
    * anti-join shuffles. Derived from the session's own
    * `autoBroadcastJoinThreshold` over [[BroadcastKeyRowBytes]] — the
    * same budget Spark applies when a source DOES report statistics
    * (default 10 MB → ~46k keys), so disabling auto-broadcast (-1)
    * disables this hint too. Spark can never pick the broadcast itself
    * here: a JDBC relation reports no statistics, so without the
    * count-derived hint even a 100-row key side sort-merges (SURVEY §7
    * hard part 2).
    */
  private[graft] def broadcastKeyRows(spark: SparkSession): Long = {
    val thresholdBytes = spark.sessionState.conf.autoBroadcastJoinThreshold
    if (thresholdBytes <= 0) 0L else thresholdBytes / BroadcastKeyRowBytes
  }

  /** Materialize the dedup build side once and apply the broadcast hint
    * when the counted size allows. Returns the frame to join against
    * plus a cleanup to run after the routes loop.
    *
    * This must be `localCheckpoint()` (eager), NOT persist+count: a
    * cached plan that still reads the sink path is INVALIDATED by the
    * first route's own append — `InsertIntoHadoopFsRelation` runs
    * `refreshByPath` over every cached plan touching the written path —
    * and the recompute re-lists the directory, so route 2 would observe
    * route 1's just-appended keys after all (dropping a uuid that
    * arrives in both VP routes within one run; the reference inserts
    * both, hfpTask.ts:97-111). The checkpoint cuts lineage: the key set
    * becomes materialized rows with no file source left in the plan for
    * the refresh to touch. The count doubles as the build-side
    * statistic a JDBC relation never has, so small key sets get an
    * explicit broadcast for the anti-join.
    */
  private[graft] def pinnedBuildSide(raw: DataFrame): (DataFrame, () => Unit) = {
    // Failure-mode trade, chosen deliberately: a checkpoint block lost
    // to executor decommissioning (e.g. dynamic allocation) ABORTS the
    // group instead of recomputing — and that is the correct side,
    // because a recompute would observe the routes' own appends and
    // silently drop rows (wrong results), while the load is idempotent
    // and a re-run heals an abort.
    val pinned = raw.localCheckpoint() // eager: materializes + cuts lineage
    val n = pinned.count()
    // free the checkpointed blocks once the routes are written — safe
    // because nothing reads the frame afterwards (a checkpointed RDD
    // cannot be recomputed once its blocks are gone)
    val cleanup: () => Unit = () => pinned.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
    val limit = broadcastKeyRows(raw.sparkSession)
    (if (limit > 0 && n <= limit) broadcast(pinned) else pinned, cleanup)
  }
}
