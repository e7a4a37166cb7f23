package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables
import graft.util.Cols._

/** Event-stream analytics over the `events` table. `ts` is epoch-nanos
  * BIGINT (see [[graft.model.Tables.events]]); all time math stays in
  * exact integer nanoseconds, which DuckDB mirrors via `epoch_ns(ts)`.
  * These are the batch duals of the Structured Streaming ops in
  * graft.streaming — same logical windows, watermark added there.
  */
object EventQueries {

  private final val HourNs = 3600L * 1000 * 1000 * 1000
  private final val GapNs = 30L * 60 * 1000 * 1000 * 1000 // 30 min session gap

  // Tumbling window aggregation (1h buckets).
  private val tumbling = Q(
    "ev_tumbling_window",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(
          expr(s"ts div $HourNs").as("hour_bucket"),
          $"event_type",
        )
        .agg(
          count(lit(1)).as("n"),
          sum(cents($"value")).as("value_cents"),
        )
        .orderBy($"hour_bucket", $"event_type")
    },
    Some(s"""SELECT epoch_ns(ts) // $HourNs AS hour_bucket, event_type,
            |       count(*) AS n,
            |       CAST(sum(${centsSql("value")}) AS BIGINT) AS value_cents
            |FROM events
            |GROUP BY hour_bucket, event_type
            |ORDER BY hour_bucket, event_type""".stripMargin),
  )

  // HOPPING (sliding) windows via Spark's native TimeWindow operator:
  // 10-minute windows every 5 minutes, so each event lands in exactly
  // two overlapping windows. The TimeWindow rewrite is an Expand (one
  // replicated row per overlapped window) feeding one partial
  // aggregation — the same map-side-combine shape as tumbling, x2
  // rows; nothing is stateful or ordered, so the plan scales like any
  // groupBy. The oracle replays the window assignment as exact
  // integer-microsecond arithmetic over an explicit k in {0,1} fanout.
  private val hopping = Q(
    "ev_hopping_window",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("tus", timestamp_micros(expr("ts div 1000")))
        .groupBy(window($"tus", "10 minutes", "5 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"), sum(cents($"value")).as("value_cents"))
        .select(
          unix_micros($"window.start").as("wstart_us"),
          $"event_type", $"n", $"value_cents")
        .orderBy($"wstart_us", $"event_type")
    },
    Some(s"""WITH e AS (
            |  SELECT epoch_ns(ts) // 1000 AS us, event_type,
            |         ${centsSql("value")} AS c
            |  FROM events),
            |w AS (
            |  SELECT us - us % 300000000 - k * 300000000 AS wstart_us,
            |         event_type, c
            |  FROM e, (SELECT unnest([0, 1]) AS k))
            |SELECT wstart_us, event_type, count(*) AS n,
            |       CAST(sum(c) AS BIGINT) AS value_cents
            |FROM w
            |GROUP BY wstart_us, event_type
            |ORDER BY wstart_us, event_type""".stripMargin),
  )

  // SCD2 / CDC interval build: collapse each user's event-type stream
  // into change-history rows [valid_from, valid_to) — the
  // slowly-changing-dimension shape a warehouse merge emits. Two
  // window passes over one user-partitioned sort (lag to find change
  // points, lead to close intervals); the open current row keeps a
  // NULL valid_to. Interval bounds are integer MICROseconds — the
  // finest unit both engines read identically from TIMESTAMP_NS
  // parquet — so they hash-match exactly.
  private val scd2 = Q(
    "ev_scd2_intervals",
    (s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val segs = Window.partitionBy($"user_id").orderBy($"valid_from")
      Tables.events(s, d)
        .withColumn("prev_type", lag($"event_type", 1).over(byUser))
        .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
        // micro-, not nanoseconds: DuckDB truncates TIMESTAMP_NS
        // parquet to us precision on read, so us is the finest unit
        // both engines agree on exactly
        .select($"user_id", $"event_type", expr("ts div 1000").as("valid_from"))
        .withColumn("valid_to", lead($"valid_from", 1).over(segs))
        .orderBy($"user_id", $"valid_from")
    },
    Some("""SELECT user_id, event_type, valid_from,
           |       lead(valid_from, 1) OVER (
           |         PARTITION BY user_id ORDER BY valid_from) AS valid_to
           |FROM (
           |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS valid_from
           |  FROM (
           |    SELECT user_id, event_type, ts, event_id,
           |           lag(event_type, 1) OVER (
           |             PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
           |    FROM events)
           |  WHERE prev_type IS NULL OR prev_type <> event_type)
           |ORDER BY user_id, valid_from""".stripMargin),
  )

  // Sessionization: a new session starts after a >30 min gap per user;
  // session id = running count of session starts (classic gap-and-island).
  private val sessionize = Q(
    "ev_sessionize",
    (s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("is_start",
          when($"prev_ts".isNull || $"ts" - $"prev_ts" > GapNs, 1L).otherwise(0L))
        .withColumn("session_seq", sum($"is_start").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(
          $"user_id", $"event_id",
          concat($"user_id", lit("-"), $"session_seq").as("session_id"),
        )
        .orderBy($"user_id", $"event_id")
    },
    Some(s"""SELECT user_id, event_id,
            |       user_id || '-' || session_seq AS session_id
            |FROM (
            |  SELECT user_id, event_id,
            |         sum(is_start) OVER (PARTITION BY user_id
            |                             ORDER BY ts, event_id
            |                             ROWS BETWEEN UNBOUNDED PRECEDING
            |                             AND CURRENT ROW) AS session_seq
            |  FROM (
            |    SELECT user_id, event_id, ts,
            |           CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
            |                  OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > $GapNs
            |                THEN 1 ELSE 0 END AS is_start
            |    FROM events
            |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
            |ORDER BY user_id, event_id""".stripMargin),
  )

  // Per-user funnel-ish pivot: conditional aggregation by event type.
  private val funnel = Q(
    "ev_type_pivot",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .agg(
          sum(when($"event_type" === "signup", 1L).otherwise(0L)).as("n_signup"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_purchase"),
          sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_error"),
          count(lit(1)).as("n_total"),
        )
        .orderBy($"user_id")
    },
    Some("""SELECT user_id,
           |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           |       count(*) AS n_total
           |FROM events
           |GROUP BY user_id
           |ORDER BY user_id""".stripMargin),
  )

  // As-of join shape: attach to every event the most recent prior (or
  // simultaneous) 'signup' event of the same user. Expressed as a
  // running conditional max over the event-time order — the
  // shuffle-once window formulation of a time-series as-of join.
  private val asOf = Q(
    "ev_asof_last_signup",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("last_signup_id",
          max(when($"event_type" === "signup", $"event_id")).over(w))
        .select($"user_id", $"event_id", $"last_signup_id")
        .orderBy($"user_id", $"event_id")
    },
    Some("""SELECT user_id, event_id,
           |       max(CASE WHEN event_type = 'signup' THEN event_id END)
           |         OVER (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |         AS last_signup_id
           |FROM events
           |ORDER BY user_id, event_id""".stripMargin),
  )

  // Semi-structured payloads via Spark 4 VARIANT: parse once, extract
  // typed fields lazily — the scale-friendly way to query JSON columns
  // (shredded binary instead of per-query string parsing).
  private val variantJson = Q(
    "ev_variant_json",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(
          $"event_id",
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k_field"),
        )
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
           |       CAST(json_extract_string(props, '$.k') AS INT) AS k_field
           |FROM events
           |ORDER BY event_id""".stripMargin),
  )

  // Stream/batch parity, DRIVER-GATED: the same tumbling aggregation
  // executed as an actual Structured Streaming query — parquet file
  // source → stateful streaming aggregation → memory sink (complete
  // mode, so after all files are consumed the sink holds exactly the
  // batch answer) — and checked against the SAME DuckDB oracle as the
  // batch query. This oracle-gates the streaming execution path
  // (FileStreamSource, state store, complete-mode sink), not just its
  // batch dual; watermarked/append-mode variants live in
  // graft.streaming and are spec-verified (append emission timing is
  // trigger-dependent, so only the complete-mode agg is byte-stable).
  /** Expose the events parquet data as a DIRECTORY for
    * FileStreamSource via symlinks in a temp dir (no copy). Handles
    * both a single-file events.parquet and a Spark-written directory
    * dataset (whose part files must be linked individually — a
    * symlinked subdirectory would not be listed). A hive-partitioned
    * layout (part files under key=value subdirectories) would silently
    * stream a subset of the data, so it fails loudly instead. Callers
    * must clean up eagerly via [[deleteStreamDir]] once the streaming
    * query has stopped (the memory sink holds the rows by then) —
    * deleteOnExit would accumulate one hook entry + temp dir per
    * invocation across a long bench/correctness session.
    */
  private def makeStreamDir(d: String): java.nio.file.Path = {
    val src = java.nio.file.Paths.get(s"$d/events.parquet").toAbsolutePath
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream-events")
    try {
      val files: Seq[java.nio.file.Path] =
        if (java.nio.file.Files.isDirectory(src)) {
          import scala.jdk.CollectionConverters._
          val listing = java.nio.file.Files.list(src) // close: holds an fd
          val children = try listing.iterator().asScala.toSeq finally listing.close()
          children.find(java.nio.file.Files.isDirectory(_)).foreach { sub =>
            throw new IllegalArgumentException(
              s"unsupported partitioned events layout: subdirectory $sub under $src")
          }
          children.filter(_.getFileName.toString.endsWith(".parquet"))
        } else Seq(src)
      files.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.createSymbolicLink(streamDir.resolve(s"part-$i.parquet"), f)
      }
      streamDir
    } catch {
      // callers only guard AFTER this returns: a half-built dir
      // (failed symlink, partitioned-layout refusal) must not leak
      case e: Throwable => deleteStreamDir(streamDir); throw e
    }
  }

  /** Gate-scoped streaming confs, applied around every stream-parity
    * body and restored after: (1) checkpoint root on tmpfs (/dev/shm)
    * when present — the offset/commit/state-store logs are pure gate
    * overhead and fsync-bound on a real disk; each gate gets a fresh
    * root (no stale-checkpoint resume) deleted recursively on exit;
    * (2) shuffle partitions set DATA-PROPORTIONALLY by [[gateParts]]
    * — every stateful operator runs one state store PER partition PER
    * batch, so the 32-partition default spends more on store setup
    * than on a bounded fixture's data (measured 5.1 → 2.5 s on the
    * stream-stream join alone at the old fixed pin), while grown
    * fixtures want the state SHARDED (gateParts' scaladoc has the
    * grow_sf10 measurements).
    */
  /** A transient gate-fixture dir on tmpfs when the host has one —
    * gate parquet/NDJSON/checkpoint I/O is pure overhead on a disk.
    */
  private[operators] def gateTempDir(prefix: String): java.nio.file.Path = {
    val tmpfs = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(tmpfs))
      java.nio.file.Files.createTempDirectory(tmpfs, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }

  /** `noDataBatches = true` keeps Spark's watermark-advance no-data
    * micro-batches ON for gates whose EMISSION depends on them — the
    * event-time-timeout sessionizer emits its final open sessions in
    * exactly such a batch (measured: turning them off there silently
    * drops the timeout-emitted rows; the oracle catches it). Every
    * other gate's contract emits on data batches alone (complete-mode
    * aggregates, arrival-emitting dedup/join, stateless sinks), and
    * the no-data batch is a second full state-store round — pure
    * overhead (round-7 floor probe: ~0.75 s per warm trivial stateful
    * query; dropping no-data batches + the 8→2 partition pin cut the
    * nine-gate suite 19.8 → 14.8 s like-for-like; the pin has since
    * become the [[gateParts]] data-proportional floor — 2 at every
    * sf ≤ 0.1 fixture, sharded upward as the fixture grows).
    */
  /** Data-proportional gate partition count from the events fixture's
    * on-disk size — no Spark job, just file metadata. The 2-partition
    * floor is the measured sf0.1 fixture optimum (state-store setup
    * dominates tiny state); each +16 MiB of fixture adds a partition
    * up to 32, because at grown scale the state itself dominates and
    * wants sharding (measured at grow_sf10, 10M events:
    * ev_stream_dedup_xbatch 252.8 s at the old fixed 2, 199.4 s at
    * the derived 13, 171.3 s at a hand-picked 16 — the "production
    * wants many partitions" doc note, now the default instead of a
    * knob; sf ≤ 0.1 fixtures stay below the 16 MiB step, so the
    * catalogue keeps the measured 2 bit-identically).
    * SPARK_GRAFT_STREAM_CONF still overrides (applied last).
    */
  private def fixtureBytes(eventsDir: Option[String]): Long =
    eventsDir.flatMap { d =>
      try {
        val p = java.nio.file.Paths.get(s"$d/events.parquet")
        if (java.nio.file.Files.isDirectory(p)) {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(p)
          try Some(walk.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size).sum)
          finally walk.close()
        } else Some(java.nio.file.Files.size(p))
      } catch { case _: Exception => None }
    }.getOrElse(0L)

  private def gateParts(bytes: Long): Int =
    math.max(2, math.min(32, (bytes / (16L << 20)).toInt))

  /** Data-proportional state-store provider (round-8 A/B,
    * probes/state_store_round8.jsonl): the default HDFS-backed store
    * wins while state is memory-comfortable (sf0.1 3.0 s vs RocksDB
    * 4.3 s; grow_sf1/18 MB 13.1 s vs 27.1 s — per-store JNI + file
    * overhead swamps small state), RocksDB wins once state outgrows
    * the heap's comfort zone (grow_sf10/206 MB fixture, 10M keyed
    * events: HDFS 189.4 s vs RocksDB 117.1 s = 0.62x). Crossover
    * pinned at 64 MiB of fixture (log-midpoint of the measured
    * bracket); SPARK_GRAFT_STREAM_CONF still overrides (applied
    * last), so either arm stays reachable per-run.
    */
  private[operators] val RocksBytes = 64L << 20
  private[graft] def gateProvider(bytes: Long): Option[String] =
    if (bytes >= RocksBytes)
      Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    else None

  /** Evidence surface for the grow-scale re-probe (round-8 ask #6):
    * the provider the LAST gate body actually ran under — the
    * data-proportional default, or the SPARK_GRAFT_STREAM_CONF
    * override if one replaced it — so a probe can assert RocksDB
    * engaged INSIDE the real gate path rather than inferring it from
    * the fixture size alone. (None = Spark's built-in default, i.e.
    * the HDFS-backed provider.)
    */
  @volatile private[graft] var lastGateProvider: Option[String] = None

  private[operators] def withStreamGateConfs[T](
      s: org.apache.spark.sql.SparkSession,
      noDataBatches: Boolean = false,
      eventsDir: Option[String] = None)(body: => T): T = {
    val ckRoot = Some(gateTempDir("graft-ckpt"))
    val ckKey = "spark.sql.streaming.checkpointLocation"
    val prevCk = s.conf.getOption(ckKey)
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = s.conf.getOption(noDataKey)
    // Extra gate-scoped session confs (probe/tuning surface, applied
    // LAST so a probe can override any gate default):
    // SPARK_GRAFT_STREAM_CONF / -Dgraft.stream.conf = "k=v;k2=v2",
    // set for the gate body and restored after.
    val extra: Seq[(String, String)] = sys.props.get("graft.stream.conf")
      .orElse(sys.env.get("SPARK_GRAFT_STREAM_CONF"))
      .map(_.split(";").toSeq.filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); (k.trim, v.trim) })
      .getOrElse(Seq.empty)
    val prevExtra = extra.map { case (k, _) => (k, s.conf.getOption(k)) }
    val bytes = fixtureBytes(eventsDir)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = s.conf.getOption(provKey)
    s.conf.set("spark.sql.shuffle.partitions", gateParts(bytes).toString)
    s.conf.set(noDataKey, noDataBatches.toString)
    gateProvider(bytes).foreach(s.conf.set(provKey, _))
    extra.foreach { case (k, v) => s.conf.set(k, v) }
    ckRoot.foreach(p => s.conf.set(ckKey, p.toString))
    lastGateProvider = s.conf.getOption(provKey)
    try body
    finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevProv match {
        case Some(v) => s.conf.set(provKey, v)
        case None => s.conf.unset(provKey)
      }
      prevNoData match {
        case Some(v) => s.conf.set(noDataKey, v)
        case None => s.conf.unset(noDataKey)
      }
      prevExtra.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
      prevCk match {
        case Some(v) => s.conf.set(ckKey, v)
        case None => s.conf.unset(ckKey)
      }
      ckRoot.foreach(deleteRecursively)
    }
  }

  /** Recursive delete for gate temp trees (children-first walk) — the
    * ONE implementation the operator gates share.
    */
  private[operators] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  private def deleteStreamDir(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val listing = java.nio.file.Files.list(dir)
    try listing.iterator().asScala.toSeq.foreach(java.nio.file.Files.deleteIfExists)
    finally listing.close()
    java.nio.file.Files.deleteIfExists(dir)
  }

  private val streamParity = Q(
    "ev_stream_tumbling_parity",
    (s, d) => withStreamGateConfs(s, eventsDir = Some(d)) {
      import s.implicits._
      // Batch read first: fixes the nanosAsLong conf and provides the
      // schema the streaming source needs.
      val schema = Tables.eventsRaw(s, d).schema
      val streamDir = makeStreamDir(d)
      try {
        val stream = Tables.normalizeEvents(
          s.readStream.schema(schema).parquet(streamDir.toString))
        val agg = stream
          .groupBy(expr(s"ts div $HourNs").as("hour_bucket"), $"event_type")
          .agg(count(lit(1)).as("n"), sum(cents($"value")).as("value_cents"))
        val sink = "ev_stream_parity_sink"
        val q = agg.writeStream
          .outputMode("complete").format("memory").queryName(sink).start()
        try q.processAllAvailable()
        finally q.stop()
        s.table(sink)
          .select($"hour_bucket", $"event_type", $"n", $"value_cents")
          .orderBy($"hour_bucket", $"event_type")
      } finally deleteStreamDir(streamDir)
    },
    tumbling.oracle, // identical result contract to the batch query
  )

  // Stream/batch parity for the HOPPING window: the same native
  // TimeWindow assignment (10 min / 5 min slide) run as a real
  // streaming query in complete mode over the file-stream fixture —
  // overlapping windows are the case where streaming state holds TWO
  // live windows per key, which tumbling parity never exercises. Same
  // oracle as the batch `ev_hopping_window`.
  private val hoppingStreamParity = Q(
    "ev_stream_hopping_parity",
    (s, d) => withStreamGateConfs(s, eventsDir = Some(d)) {
      import s.implicits._
      val schema = Tables.eventsRaw(s, d).schema
      val streamDir = makeStreamDir(d)
      try {
        val stream = Tables.normalizeEvents(
          s.readStream.schema(schema).parquet(streamDir.toString))
        val agg = stream
          .withColumn("tus", timestamp_micros(expr("ts div 1000")))
          .groupBy(window($"tus", "10 minutes", "5 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"), sum(cents($"value")).as("value_cents"))
        val sink = "ev_stream_hopping_sink"
        val q = agg.writeStream
          .outputMode("complete").format("memory").queryName(sink).start()
        try q.processAllAvailable()
        finally q.stop()
        s.table(sink)
          .select(
            unix_micros($"window.start").as("wstart_us"),
            $"event_type", $"n", $"value_cents")
          .orderBy($"wstart_us", $"event_type")
      } finally deleteStreamDir(streamDir)
    },
    hopping.oracle, // identical result contract to the batch query
  )

  // Stream/batch parity for STATEFUL sessionization, DRIVER-GATED: the
  // flatMapGroupsWithState path (graft.streaming.StreamingOps
  // .sessionize — keyed state, event-time timeout) run as a real
  // streaming query over the same file-stream fixture as
  // ev_stream_tumbling_parity, checked against a DuckDB replay of its
  // exact emission semantics. Two ways a session is emitted:
  //  (a) closed by a later event of the same user (> gap silence in
  //      the data) — always emitted;
  //  (b) the user's final open session times out once the terminal
  //      watermark (max event time - 10 min) passes session_end + gap.
  // A final session younger than that stays in state forever on a
  // bounded fixture — exactly the append-mode contract — so the oracle
  // reproduces (a) ∪ (b) rather than the batch gap-island total. Time
  // math is in epoch MILLIS (Timestamp.getTime in the state function;
  // ns//1e6 in the oracle) with a 30-min gap and 10-min watermark.
  private val sessionStreamParity = Q(
    "ev_stream_session_parity",
    // noDataBatches: the timeout-emission half of this gate's contract
    // (path (b) below) fires IN a watermark-advance no-data batch
    (s, d) => withStreamGateConfs(s, noDataBatches = true, eventsDir = Some(d)) {
      import s.implicits._
      val schema = Tables.eventsRaw(s, d).schema
      val streamDir = makeStreamDir(d)
      try {
        val events = Tables.normalizeEvents(
          s.readStream.schema(schema).parquet(streamDir.toString))
          .select(
            $"event_id",
            // epoch-nanos BIGINT → TimestampType (micros); ms flooring
            // happens in Timestamp.getTime, mirrored by the oracle
            timestamp_micros(expr("ts div 1000")).as("ts"),
            $"user_id", $"event_type", $"value")
          .as[graft.streaming.StreamingOps.Event]
        val sessions =
          graft.streaming.StreamingOps.sessionize(events, gapMs = 30L * 60 * 1000)
        val sink = "ev_stream_session_sink"
        val q = sessions.toDF().writeStream
          .outputMode("append").format("memory").queryName(sink).start()
        try {
          q.processAllAvailable()
          // The (a) ∪ (b) oracle below is the emission semantics of a
          // SINGLE data micro-batch (+ the timeout batch). The file
          // source puts all available files in one batch by default;
          // if a layout/option change ever splits them, sessions
          // straddle batches differently and setTimeoutTimestamp can
          // throw under an advanced watermark — fail loudly here
          // instead of surfacing as an oracle mismatch.
          val dataBatches = q.recentProgress.count(_.numInputRows > 0)
          require(dataBatches == 1,
            s"session-parity fixture must land in one micro-batch, got $dataBatches")
        } finally q.stop()
        s.table(sink)
          .select(
            $"user_id",
            unix_millis($"session_start").as("start_ms"),
            unix_millis($"session_end").as("end_ms"),
            $"n_events")
          .orderBy($"user_id", $"start_ms")
      } finally deleteStreamDir(streamDir)
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS ms FROM events),
           |flags AS (
           |  SELECT user_id, event_id, ms,
           |         CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
           |              THEN 1 ELSE 0 END AS is_start
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
           |isl AS (
           |  SELECT user_id, ms,
           |         sum(is_start) OVER (PARTITION BY user_id ORDER BY ms, event_id
           |                             ROWS BETWEEN UNBOUNDED PRECEDING
           |                             AND CURRENT ROW) AS seq
           |  FROM flags),
           |sess AS (
           |  SELECT user_id, seq, min(ms) AS start_ms, max(ms) AS end_ms,
           |         count(*) AS n_events
           |  FROM isl GROUP BY user_id, seq),
           |wm AS (SELECT max(ms) - 600000 AS w FROM e),
           |lastseq AS (SELECT user_id, max(seq) AS mx FROM sess GROUP BY user_id)
           |SELECT s.user_id, s.start_ms, s.end_ms, s.n_events
           |FROM sess s JOIN lastseq l USING (user_id), wm
           |WHERE s.seq < l.mx OR s.end_ms + 1800000 < wm.w
           |ORDER BY user_id, start_ms""".stripMargin),
  )

  // Streaming exact-dedup parity, DRIVER-GATED: the watermark-bounded
  // dropDuplicatesWithinWatermark path (graft.streaming.StreamingOps
  // .dedup) run as a real streaming query over the file-stream
  // fixture. Every input row is deterministically DOUBLED first
  // (explode of a 2-element array), so the operator must collapse
  // each pair back to exactly one row; because the two copies are
  // byte-identical and created by the same explode, they always land
  // in the same micro-batch and first-seen order cannot matter —
  // which is what makes the streaming output (and so the oracle)
  // exact. The replay is the distinct row set: event_id is unique in
  // the fixture, so SELECT-all-columns is the watermark-window
  // first-seen result regardless of batch layout.
  private val dedupStreamParity = Q(
    "ev_stream_dedup_parity",
    (s, d) => withStreamGateConfs(s, eventsDir = Some(d)) {
      import s.implicits._
      val schema = Tables.eventsRaw(s, d).schema
      val streamDir = makeStreamDir(d)
      try {
        val events = Tables.normalizeEvents(
          s.readStream.schema(schema).parquet(streamDir.toString))
          .select(
            $"event_id",
            timestamp_micros(expr("ts div 1000")).as("ts"),
            $"user_id", $"event_type", $"value")
        val doubled = events
          .withColumn("copy", explode(array(lit(0), lit(1)))).drop("copy")
        val sink = "ev_stream_dedup_sink"
        val q = graft.streaming.StreamingOps.dedup(doubled, Seq("event_id"))
          .writeStream.outputMode("append").format("memory").queryName(sink).start()
        try {
          q.processAllAvailable()
          // same pin as the session gate: the oracle (= the full
          // distinct row set) is only right when everything lands in
          // ONE data micro-batch — a multi-batch layout would silently
          // drop rows >10min behind the first batch's watermark. Fail
          // loudly on a layout change instead of as an oracle diff.
          // (Cross-batch semantics are the JOB of ev_stream_dedup_xbatch.)
          val dataBatches = q.recentProgress.count(_.numInputRows > 0)
          require(dataBatches == 1,
            s"dedup-parity fixture must land in one micro-batch, got $dataBatches")
        } finally q.stop()
        s.table(sink)
          .select($"event_id", unix_millis($"ts").as("ts_ms"), $"user_id",
            $"event_type", cents($"value").as("value_cents"))
          .orderBy($"event_id")
      } finally deleteStreamDir(streamDir)
    },
    Some(s"""SELECT event_id, epoch_ns(ts) // 1000000 AS ts_ms, user_id,
            |       event_type, ${centsSql("value")} AS value_cents
            |FROM events
            |ORDER BY event_id""".stripMargin),
  )

  /** Write `df` as exactly ONE parquet file named `name` inside `dir`
    * with an explicit mtime — the unit of micro-batch layout control
    * for cross-batch fixtures (FileStreamSource orders by modification
    * time, and `maxFilesPerTrigger=1` then maps one file to one
    * batch).
    */
  private def writeBatchFile(
      df: org.apache.spark.sql.DataFrame,
      dir: java.nio.file.Path,
      name: String,
      mtimeMs: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-xbatch-write")
    def rmTree(p: java.nio.file.Path): Unit = deleteRecursively(p)
    try {
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val listing = java.nio.file.Files.list(tmp)
      val part =
        try listing.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet"))
        finally listing.close()
      require(part.isDefined, s"parquet write to $tmp produced no part file")
      val target = java.nio.file.Files.move(part.get, dir.resolve(name))
      java.nio.file.Files.setLastModifiedTime(
        target, java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    } finally {
      // recursive (a failed write leaves _temporary/ subtrees) and
      // non-throwing: cleanup must never mask the real write failure
      try rmTree(tmp)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  // CROSS-BATCH streaming-dedup gate, DRIVER-GATED: the piece
  // ev_stream_dedup_parity's same-batch doubling cannot exercise —
  // dropDuplicatesWithinWatermark's actual job across micro-batches.
  // Three single-file batches (maxFilesPerTrigger=1, mtime-ordered;
  // state eviction happens at END of batch, so expiry needs a batch
  // BETWEEN first-seen and the duplicate's arrival):
  //   b1 all original events (max event time = mx, watermark W = 7d);
  //   b2 100 fresh new-key rows at mx+20d — its end-of-batch cleanup
  //      runs with eviction watermark mx-W and evicts every key older
  //      than mx-2W;
  //   b3 duplicates with FRESH event times (mx+21d; dedup keys on
  //      event_id only, so the dup row's own ts decides lateness) of
  //      (a) keys younger than mx-6d — state live, MUST collapse; and
  //      (b) keys older than mx-15d — state evicted, MUST re-emit.
  // Oracle = originals ∪ advancers ∪ (b) and none of (a): a dedup
  // failure adds rows, a state-expiry failure removes rows, so both
  // watermark windows are distinguished by the hash. All boundary
  // comparisons are done in MILLIS on both sides (floor(ns/1e6)), and
  // every synthetic timestamp is an exact ms multiple, so the two
  // engines select identical row sets. The margins (6d vs 7d, 15d vs
  // 14d) keep every key a full day away from an eviction boundary.
  private val dedupCrossBatch = Q(
    "ev_stream_dedup_xbatch",
    (s, d) => withStreamGateConfs(s, eventsDir = Some(d)) {
      import s.implicits._
      val DayMs = 86400000L
      val ev = Tables.events(s, d) // ts: epoch-nanos BIGINT
      val schema = ev.schema
      val mxRow = ev.agg(max(expr("ts div 1000000")), max($"event_id")).head()
      val mxMs = mxRow.getLong(0)
      // advancer ids start past the live key range — a fixed base
      // (say 10M) would COLLIDE with real event_ids at sf > 10
      // (n_ev = 1M·sf), making the engine silently dedup advancers
      // while the oracle still emits them
      val idBase = mxRow.getLong(1) + 1
      def nsOfMs(c: org.apache.spark.sql.Column) = c * lit(1000000L)
      val advancers = s.range(100).select(
        ($"id" + idBase).as("event_id"),
        nsOfMs(lit(mxMs + 20 * DayMs)).as("ts"),
        $"id".as("user_id"),
        lit("click").as("event_type"),
        lit(0.0).as("value"),
        lit("""{"k": 0}""").as("props"))
      val dups = ev
        .filter(expr("ts div 1000000") > mxMs - 6 * DayMs ||
          expr("ts div 1000000") < mxMs - 15 * DayMs)
        .select($"event_id",
          nsOfMs(lit(mxMs + 21 * DayMs) + $"event_id" % 1000).as("ts"),
          $"user_id", $"event_type", $"value", $"props")
      val streamDir = java.nio.file.Files.createTempDirectory("graft-xbatch")
      try {
        val now = System.currentTimeMillis()
        writeBatchFile(ev, streamDir, "0-events.parquet", now - 120000)
        writeBatchFile(advancers, streamDir, "1-advance.parquet", now - 60000)
        writeBatchFile(dups, streamDir, "2-dups.parquet", now)
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(streamDir.toString)
          .select(
            $"event_id",
            timestamp_micros(expr("ts div 1000")).as("ts"),
            $"user_id", $"event_type", $"value")
        val sink = "ev_stream_dedup_xbatch_sink"
        val q = graft.streaming.StreamingOps
          .dedup(stream, Seq("event_id"), watermark = "7 days")
          .writeStream.outputMode("append").format("memory").queryName(sink).start()
        try {
          q.processAllAvailable()
          // the gate's whole point is the cross-batch layout: one file
          // per micro-batch. A layout/option regression must fail
          // loudly here, not as an opaque oracle diff.
          val dataBatches = q.recentProgress.count(_.numInputRows > 0)
          require(dataBatches == 3,
            s"cross-batch dedup fixture must land in 3 micro-batches, got $dataBatches")
        } finally q.stop()
        s.table(sink)
          .select($"event_id", unix_millis($"ts").as("ts_ms"), $"user_id",
            $"event_type", cents($"value").as("value_cents"))
          .orderBy($"event_id", $"ts_ms")
      } finally deleteStreamDir(streamDir)
    },
    Some(s"""WITH m AS (SELECT max(epoch_ns(ts) // 1000000) AS mx,
            |                  max(event_id) + 1 AS idbase
            |           FROM events),
            |orig AS (
            |  SELECT event_id, epoch_ns(ts) // 1000000 AS ts_ms, user_id,
            |         event_type, ${centsSql("value")} AS value_cents
            |  FROM events),
            |adv AS (
            |  SELECT idbase + range AS event_id, mx + 1728000000 AS ts_ms,
            |         range AS user_id, 'click' AS event_type,
            |         CAST(0 AS BIGINT) AS value_cents
            |  FROM range(100), m),
            |dup AS (
            |  SELECT event_id, mx + 1814400000 + event_id % 1000 AS ts_ms,
            |         user_id, event_type, value_cents
            |  FROM orig, m
            |  WHERE ts_ms < mx - 1296000000)
            |SELECT * FROM orig
            |UNION ALL SELECT * FROM adv
            |UNION ALL SELECT * FROM dup
            |ORDER BY event_id, ts_ms""".stripMargin),
  )

  // STREAM-STREAM interval join, DRIVER-GATED: the remaining flagship
  // Structured Streaming shape — two watermarked streams joined on an
  // equi key + an EVENT-TIME RANGE (purchase within 30 min after a
  // click by the same user). The range condition on the watermarked
  // timestamp columns is what lets Spark bound both join states; an
  // inner join emits a match as soon as both sides have arrived, so
  // on a single-batch bounded fixture the emitted set is exactly the
  // batch join — which is the oracle. Timestamp arithmetic is
  // microsecond-exact on both engines (Spark TimestampType is micros
  // = ns div 1000; the oracle replays epoch_ns // 1000), so the
  // window boundaries cannot drift by a floor.
  private val streamStreamJoin = Q(
    "ev_stream_stream_join",
    (s, d) => withStreamGateConfs(s, eventsDir = Some(d)) {
      import s.implicits._
      val schema = Tables.eventsRaw(s, d).schema
      val streamDir = makeStreamDir(d)
      try {
        val ev = Tables.normalizeEvents(
          s.readStream.schema(schema).parquet(streamDir.toString))
          .select(
            $"event_id",
            timestamp_micros(expr("ts div 1000")).as("ts"),
            $"user_id", $"event_type")
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id".as("cid"), $"user_id".as("cu"), $"ts".as("ct"))
          .withWatermark("ct", "10 minutes")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id".as("pid"), $"user_id".as("pu"), $"ts".as("pt"))
          .withWatermark("pt", "10 minutes")
        val joined = clicks.join(purchases,
          $"cu" === $"pu" &&
            $"pt" >= $"ct" && $"pt" <= $"ct" + expr("INTERVAL 30 MINUTES"))
        val sink = "ev_stream_stream_sink"
        // A stream-stream join runs FOUR state stores per shuffle
        // partition (the 32-partition default spent ~2x the query's
        // runtime on store setup, measured 5.1 -> 2.5 s at 8) — the
        // partition pin now comes from withStreamGateConfs.
        val q = joined.writeStream
          .outputMode("append").format("memory").queryName(sink).start()
        try {
          q.processAllAvailable()
          // single-batch pin, same rationale as the dedup gate: a
          // multi-batch layout could drop late rows at the watermark
          // and surface as an opaque diff
          val dataBatches = q.recentProgress.count(_.numInputRows > 0)
          require(dataBatches == 1,
            s"stream-stream fixture must land in one micro-batch, got $dataBatches")
        } finally q.stop()
        s.table(sink)
          .select($"cid", $"pid", $"cu".as("user_id"),
            unix_millis($"ct").as("ct_ms"), unix_millis($"pt").as("pt_ms"))
          .orderBy($"cid", $"pid")
      } finally deleteStreamDir(streamDir)
    },
    Some("""SELECT c.event_id AS cid, p.event_id AS pid, c.user_id,
           |       epoch_ns(c.ts) // 1000000 AS ct_ms,
           |       epoch_ns(p.ts) // 1000000 AS pt_ms
           |FROM events c JOIN events p
           |  ON c.user_id = p.user_id
           | AND c.event_type = 'click' AND p.event_type = 'purchase'
           | AND epoch_ns(p.ts) // 1000 >= epoch_ns(c.ts) // 1000
           | AND epoch_ns(p.ts) // 1000 <= epoch_ns(c.ts) // 1000 + 1800000000
           |ORDER BY cid, pid""".stripMargin),
  )

  // CDC apply: the event stream read as a change log keyed by user_id —
  // 'signup' upserts, 'click'/'view'/'purchase' update, 'error' is a
  // tombstone. The merged snapshot is last-writer-wins per key in
  // (ts, event_id) order, dropping keys whose FINAL change is a
  // tombstone — the standard change-data-capture materialization a
  // lakehouse MERGE INTO performs. One shuffle on the key; both window
  // frames share the same partitioning so Catalyst plans a single
  // exchange feeding consecutive Window operators. At 100 TB the key
  // shuffle is the floor for any CDC merge; nothing here adds to it.
  private val cdcMerge = Q(
    "ev_cdc_merge",
    (s, d) => {
      import s.implicits._
      // microsecond precision on both the ordering and the output:
      // DuckDB reads TIMESTAMP(NANOS) parquet at micro precision, so
      // ranking on raw nanos would tie-break differently there.
      val byKey = Window.partitionBy($"user_id")
      val latest = byKey.orderBy($"ts_us".desc, $"event_id".desc)
      Tables.events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("rn", row_number().over(latest))
        .withColumn("n_changes", count(lit(1)).over(byKey))
        .filter($"rn" === 1 && $"event_type" =!= "error")
        .select(
          $"user_id",
          $"event_type".as("last_type"),
          cents($"value").as("last_value_cents"),
          $"ts_us".as("last_ts_us"),
          $"n_changes",
        )
        .orderBy($"user_id")
    },
    Some(s"""SELECT user_id, last_type, last_value_cents, last_ts_us,
            |       n_changes
            |FROM (
            |  SELECT user_id, event_type AS last_type,
            |         ${centsSql("value")} AS last_value_cents,
            |         epoch_ns(ts) // 1000 AS last_ts_us,
            |         count(*) OVER (PARTITION BY user_id) AS n_changes,
            |         row_number() OVER (PARTITION BY user_id
            |             ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC)
            |           AS rn
            |  FROM events)
            |WHERE rn = 1 AND last_type <> 'error'
            |ORDER BY user_id""".stripMargin),
  )

  // Streaming dual of ev_cdc_merge, DRIVER-GATED: the change log
  // consumed as a stream with the snapshot maintained as a COMPLETE-
  // mode keyed aggregation — max_by over the (ts_us, event_id) change
  // order keeps exactly the last writer per key as batches arrive, the
  // memory sink holds the CURRENT materialized snapshot after every
  // micro-batch (the streaming table a lakehouse CDC apply maintains),
  // and tombstoned keys are filtered on read-out. Same oracle as the
  // batch query: the final snapshot after the last batch must be
  // bit-identical to the batch merge.
  private val cdcStreamParity = Q(
    "ev_stream_cdc_parity",
    (s, d) => withStreamGateConfs(s, eventsDir = Some(d)) {
      import s.implicits._
      val schema = Tables.eventsRaw(s, d).schema
      val streamDir = makeStreamDir(d)
      try {
        val snapshot = Tables.normalizeEvents(
          s.readStream.schema(schema).parquet(streamDir.toString))
          .select($"user_id", $"event_id", $"event_type",
            expr("ts div 1000").as("ts_us"), cents($"value").as("value_cents"))
          .groupBy($"user_id")
          .agg(
            max_by(
              struct($"event_type", $"value_cents", $"ts_us"),
              struct($"ts_us", $"event_id")).as("last"),
            count(lit(1)).as("n_changes"),
          )
        val sink = "ev_stream_cdc_sink"
        val q = snapshot.writeStream
          .outputMode("complete").format("memory").queryName(sink).start()
        try q.processAllAvailable() finally q.stop()
        s.table(sink)
          .filter($"last.event_type" =!= "error")
          .select(
            $"user_id",
            $"last.event_type".as("last_type"),
            $"last.value_cents".as("last_value_cents"),
            $"last.ts_us".as("last_ts_us"),
            $"n_changes",
          )
          .orderBy($"user_id")
      } finally deleteStreamDir(streamDir)
    },
    cdcMerge.oracle, // identical contract: stream snapshot == batch merge
  )

  // Gaps-and-islands: per user, maximal runs of CONSECUTIVE active
  // hours (an hour is active if it has ≥1 event). The hour-minus-
  // row_number difference is constant within a run, so one window pass
  // plus one groupBy turns runs into islands — no self-join, no
  // iteration. The pre-aggregation to (user, hour) shrinks the window
  // input to active hours only, so the sort under the window is over
  // the bounded (user × active-hour) set, not raw events.
  private val gapsIslands = Q(
    "ev_gaps_islands",
    (s, d) => {
      import s.implicits._
      val perHour = Tables.events(s, d)
        .groupBy($"user_id", expr(s"ts div $HourNs").as("hr"))
        .agg(count(lit(1)).as("n_ev"))
      val w = Window.partitionBy($"user_id").orderBy($"hr")
      perHour
        .withColumn("grp", $"hr" - row_number().over(w))
        .groupBy($"user_id", $"grp")
        .agg(
          min($"hr").as("start_hr"),
          max($"hr").as("end_hr"),
          count(lit(1)).as("n_hours"),
          sum($"n_ev").as("n_events"),
        )
        .select($"user_id", $"start_hr", $"end_hr", $"n_hours", $"n_events")
        .orderBy($"user_id", $"start_hr")
    },
    Some(s"""WITH per_hour AS (
            |  SELECT user_id, epoch_ns(ts) // $HourNs AS hr,
            |         count(*) AS n_ev
            |  FROM events GROUP BY user_id, hr),
            |grps AS (
            |  SELECT user_id, hr, n_ev,
            |         hr - row_number() OVER (PARTITION BY user_id ORDER BY hr)
            |           AS grp
            |  FROM per_hour)
            |SELECT user_id, min(hr) AS start_hr, max(hr) AS end_hr,
            |       count(*) AS n_hours, CAST(sum(n_ev) AS BIGINT) AS n_events
            |FROM grps GROUP BY user_id, grp
            |ORDER BY user_id, start_hr""".stripMargin),
  )

  // Time-series resampling with LOCF gap fill: each user's hourly
  // series is densified over [first active hour, last active hour]
  // (sequence + explode — a generator, not a shuffle) and missing
  // hours carry the last observed hourly value forward
  // (last(ignoreNulls) over an unbounded-preceding row frame). The
  // window input is the DENSIFIED (user, hour) grid, bounded by
  // users × span-hours — never raw events; at 100 TB this is the
  // standard resample shape (one groupBy to hours, one per-key span,
  // one ordered pass per key).
  private val gapFill = Q(
    "ev_gap_fill",
    (s, d) => {
      import s.implicits._
      val perHour = Tables.events(s, d)
        .groupBy($"user_id", expr(s"ts div $HourNs").as("hr"))
        .agg(count(lit(1)).as("n_ev"), sum(cents($"value")).as("val_cents"))
      val slots = perHour
        .groupBy($"user_id")
        .agg(min($"hr").as("h0"), max($"hr").as("h1"))
        .select($"user_id", explode(sequence($"h0", $"h1")).as("hr"))
      val w = Window.partitionBy($"user_id").orderBy($"hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      slots
        .join(perHour, Seq("user_id", "hr"), "left_outer")
        .select(
          $"user_id", $"hr",
          coalesce($"n_ev", lit(0L)).as("n_events"),
          last($"val_cents", ignoreNulls = true).over(w).as("locf_cents"),
          $"n_ev".isNull.as("is_filled"),
        )
        .orderBy($"user_id", $"hr")
    },
    Some(s"""WITH per_hour AS (
            |  SELECT user_id, epoch_ns(ts) // $HourNs AS hr,
            |         count(*) AS n_ev,
            |         CAST(sum(${centsSql("value")}) AS BIGINT) AS val_cents
            |  FROM events GROUP BY user_id, hr),
            |spans AS (
            |  SELECT user_id, min(hr) AS h0, max(hr) AS h1
            |  FROM per_hour GROUP BY user_id),
            |slots AS (
            |  SELECT user_id, unnest(generate_series(h0, h1)) AS hr
            |  FROM spans),
            |j AS (
            |  SELECT s.user_id, s.hr, p.n_ev, p.val_cents
            |  FROM slots s LEFT JOIN per_hour p USING (user_id, hr))
            |SELECT user_id, hr,
            |       COALESCE(n_ev, 0) AS n_events,
            |       last_value(val_cents IGNORE NULLS) OVER (
            |         PARTITION BY user_id ORDER BY hr
            |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            |         AS locf_cents,
            |       n_ev IS NULL AS is_filled
            |FROM j
            |ORDER BY user_id, hr""".stripMargin),
  )

  // ORDERED funnel: signup -> first click AFTER it -> first purchase
  // AFTER that, per user (the sequence constraint is what distinguishes
  // a funnel from the type-count pivot above — a purchase before the
  // click must not count). Three min-aggregates chained by
  // strictly-later joins, every stage keyed on user_id: at 100 TB one
  // hash partitioning by user is produced once and reused by all three
  // aggregations and both left joins (Exchange reuse), so the whole
  // funnel costs a single shuffle of the events table; nothing is
  // ordered or windowed, so no per-user sort materializes.
  private val orderedFunnel = Q(
    "ev_funnel_steps",
    (s, d) => {
      import s.implicits._
      // All time math in integer MICROseconds: DuckDB stores TIMESTAMP
      // at us precision, so comparing at ns would tie-break differently
      // on sub-us neighbors. Dividing FIRST makes both engines see the
      // same timeline, ties included.
      val ev = Tables.events(s, d)
        .select($"user_id", $"event_type", expr("ts div 1000").as("ts"))
      val s1 = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("t_signup"))
      val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
        .filter($"ts" > $"t_signup")
        .groupBy($"user_id").agg(min($"ts").as("t_click"))
      val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
        .filter($"ts" > $"t_click")
        .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .select($"user_id", $"t_signup", $"t_click", $"t_purchase",
          when($"t_purchase".isNotNull, 3)
            .when($"t_click".isNotNull, 2).otherwise(1).as("steps_completed"))
        .orderBy($"user_id")
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts FROM events),
           |s1 AS (SELECT user_id, min(ts) AS t_signup
           |       FROM e WHERE event_type = 'signup' GROUP BY user_id),
           |s2 AS (SELECT e.user_id, min(e.ts) AS t_click
           |       FROM e JOIN s1 USING (user_id)
           |       WHERE e.event_type = 'click' AND e.ts > s1.t_signup
           |       GROUP BY e.user_id),
           |s3 AS (SELECT e.user_id, min(e.ts) AS t_purchase
           |       FROM e JOIN s2 USING (user_id)
           |       WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
           |       GROUP BY e.user_id)
           |SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
           |       CASE WHEN s3.t_purchase IS NOT NULL THEN 3
           |            WHEN s2.t_click IS NOT NULL THEN 2
           |            ELSE 1 END AS steps_completed
           |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
           |ORDER BY user_id""".stripMargin),
  )

  // Cohort retention matrix: users bucketed by the epoch-week of their
  // first signup; each later activity week becomes a (cohort_week,
  // week_offset) cell counting distinct active users — the standard
  // retention triangle. One aggregate builds the cohort table, one
  // distinct-count builds the matrix; both key on user/cohort so the
  // events shuffle happens once and the distinct is a partial-agg
  // pipeline, never a collect. Weeks are exact integer ns division
  // (epoch-aligned, not calendar), replayed by DuckDB verbatim.
  private val retention = Q(
    "ev_retention_cohorts",
    (s, d) => {
      import s.implicits._
      val WeekNs = 7L * 86400 * 1000 * 1000 * 1000
      val ev = Tables.events(s, d)
      val cohort = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(expr(s"min(ts) div $WeekNs").as("cohort_week"))
      ev.join(cohort, "user_id")
        .select($"user_id", $"cohort_week",
          (expr(s"ts div $WeekNs") - $"cohort_week").as("week_offset"))
        .filter($"week_offset" >= 0)
        .groupBy($"cohort_week", $"week_offset")
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort_week", $"week_offset")
    },
    Some(s"""WITH c AS (SELECT user_id, min(epoch_ns(ts)) // ${7L * 86400 * 1000 * 1000 * 1000} AS cohort_week
            |           FROM events WHERE event_type = 'signup' GROUP BY user_id)
            |SELECT cohort_week,
            |       (epoch_ns(e.ts) // ${7L * 86400 * 1000 * 1000 * 1000}) - cohort_week AS week_offset,
            |       count(DISTINCT e.user_id) AS n_users
            |FROM events e JOIN c USING (user_id)
            |WHERE (epoch_ns(e.ts) // ${7L * 86400 * 1000 * 1000 * 1000}) - cohort_week >= 0
            |GROUP BY cohort_week, week_offset
            |ORDER BY cohort_week, week_offset""".stripMargin),
  )

  // EXPONENTIAL smoothing (EWMA, α = 1/4) of each user's value
  // series in event-time order — the metric-smoothing / anomaly-
  // baseline primitive. EWMA is a genuine RECURSION (each output
  // depends on the previous output), which no window frame can
  // express; the distributed shape is the per-key ordered fold:
  // one shuffle groups each user's events, an in-row sort_array puts
  // them in (ts, event_id) order, and a codegen'd aggregate() lambda
  // folds the smoothed series left-to-right. Integer cents with
  // truncating division keep every step exact and order-independent
  // across engines — the float recursion would compound ulp drift
  // per step. Per-key state is the user's own event list, the same
  // documented bound as sessionize/collect-based ops (a 100 TB
  // deployment shards long-lived users by session or time slice
  // first); values are non-negative by schema so Spark's toward-zero
  // `div` and DuckDB's `//` agree at every step.
  private val ewmaSmooth = Q(
    "ev_ewma_smooth",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id",
          struct($"ts", $"event_id", cents($"value").as("cents")).as("e"))
        .groupBy($"user_id")
        .agg(sort_array(collect_list($"e")).as("es"))
        .select($"user_id", explode(expr(
          """aggregate(
            |  es,
            |  cast(array() as array<struct<ts:bigint,event_id:bigint,ewma:bigint>>),
            |  (acc, x) -> concat(acc, array(named_struct(
            |    'ts', x.ts, 'event_id', x.event_id,
            |    'ewma', CASE WHEN size(acc) = 0 THEN x.cents
            |                 ELSE (x.cents + 3 * element_at(acc, -1).ewma) div 4
            |            END))))""".stripMargin)).as("o"))
        .select($"user_id", $"o.ts".as("ts"), $"o.event_id".as("event_id"),
          $"o.ewma".as("ewma_cents"))
        .orderBy($"user_id", $"ts", $"event_id")
    },
    Some(s"""WITH RECURSIVE e AS (
            |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
            |         ${centsSql("value")} AS cents,
            |         row_number() OVER (PARTITION BY user_id
            |                            ORDER BY epoch_ns(ts), event_id) AS rn
            |  FROM events),
            |w(user_id, rn, ts, event_id, ewma_cents) AS (
            |  SELECT user_id, rn, ts, event_id, cents FROM e WHERE rn = 1
            |  UNION ALL
            |  SELECT e.user_id, e.rn, e.ts, e.event_id,
            |         (e.cents + 3 * w.ewma_cents) // 4
            |  FROM w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1)
            |SELECT user_id, ts, event_id, ewma_cents
            |FROM w ORDER BY user_id, ts, event_id""".stripMargin),
  )

  // DAU / WAU / MAU + STICKINESS — the product-analytics staple:
  // distinct active users per day, per trailing 7-day window, per
  // trailing 30-day window, and DAU/MAU in exact ppm. Trailing
  // DISTINCT counts can't ride a window frame, so the exact
  // formulation is the textbook contribution fanout: the DISTINCT
  // (user, day) pairs (one corpus-pass aggregate) explode to the ≤7
  // (resp. ≤30) target days their activity keeps alive, then one
  // distinct-count per (window, day). Shuffle volume is user-days ×
  // 37 — bounded by ACTIVITY, not events; at sketch-tolerant scale
  // the HLL entry (qa_hll_distinct_sketch) is the mergeable
  // alternative, this is the exact one. Days clip to the observed
  // range so edge windows are partial (the standard dashboard
  // convention).
  private val activeUsers = Q(
    "ev_active_users",
    (s, d) => {
      import s.implicits._
      val DayNs = 86400L * 1000 * 1000 * 1000
      val userDays = Tables.events(s, d)
        .select($"user_id", expr(s"ts div ${DayNs}L").as("day"))
        .distinct()
        .localCheckpoint() // feeds dau + both fanouts + the day range
      val maxDay = userDays.agg(max($"day")).head().getLong(0)
      def windowed(win: Int, name: String) = userDays
        .select($"user_id", explode(sequence($"day",
          least($"day" + (win - 1), lit(maxDay)))).as("day"))
        .groupBy($"day").agg(countDistinct($"user_id").as(name))
      val dau = userDays.groupBy($"day").agg(countDistinct($"user_id").as("dau"))
      dau
        .join(windowed(7, "wau"), "day")
        .join(windowed(30, "mau"), "day")
        .select($"day", $"dau", $"wau", $"mau",
          expr("1000000 * dau div mau").as("stickiness_ppm"))
        .orderBy($"day")
    },
    Some("""WITH au_ud AS (
           |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
           |  FROM events),
           |au_max AS (SELECT max(day) AS md FROM au_ud),
           |au_d AS (
           |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
           |  FROM au_ud GROUP BY 1),
           |au_w AS (
           |  SELECT t.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
           |  FROM au_ud u CROSS JOIN au_max,
           |       LATERAL (SELECT unnest(generate_series(
           |         u.day, least(u.day + 6, au_max.md))) AS day) t
           |  GROUP BY 1),
           |au_m AS (
           |  SELECT t.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
           |  FROM au_ud u CROSS JOIN au_max,
           |       LATERAL (SELECT unnest(generate_series(
           |         u.day, least(u.day + 29, au_max.md))) AS day) t
           |  GROUP BY 1)
           |SELECT d.day, d.dau, w.wau, m.mau,
           |       1000000 * d.dau // m.mau AS stickiness_ppm
           |FROM au_d d JOIN au_w w USING (day) JOIN au_m m USING (day)
           |ORDER BY d.day""".stripMargin),
  )

  // COHORT LTV CURVES — the monetary sibling of the retention
  // triangle: per signup-week cohort, CUMULATIVE purchase revenue per
  // week offset (the "how much has a week-N-old cohort spent by week
  // k" curve growth teams plan against). Revenue is exact integer
  // cents; the cumulative sum is a window over the ≤cohorts×weeks
  // MATRIX rows, never events — the same histogram-shaped discipline
  // as retention/percentile-rank. Cohort table is user-keyed (one
  // aggregate) and joined back broadcast.
  private val cohortLtv = Q(
    "ev_cohort_ltv",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val WeekNs = 7L * 86400 * 1000 * 1000 * 1000
      val ev = Tables.events(s, d)
      val cohort = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(expr(s"min(ts) div $WeekNs").as("cohort_week"))
      val matrix = ev.filter($"event_type" === "purchase")
        .join(broadcast(cohort), "user_id")
        .select($"cohort_week",
          (expr(s"ts div $WeekNs") - $"cohort_week").as("week_offset"),
          cents($"value").as("cents"))
        .filter($"week_offset" >= 0)
        .groupBy($"cohort_week", $"week_offset")
        .agg(sum($"cents").as("week_revenue_cents"))
      matrix
        .withColumn("cum_revenue_cents", sum($"week_revenue_cents").over(
          Window.partitionBy($"cohort_week").orderBy($"week_offset")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy($"cohort_week", $"week_offset")
    },
    Some {
      val w = 7L * 86400 * 1000 * 1000 * 1000
      s"""WITH lv_c AS (
         |  SELECT user_id, min(epoch_ns(ts)) // $w AS cohort_week
         |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
         |lv_m AS (
         |  SELECT cohort_week,
         |         (epoch_ns(e.ts) // $w) - cohort_week AS week_offset,
         |         CAST(sum(${centsSql("e.value")}) AS BIGINT)
         |           AS week_revenue_cents
         |  FROM events e JOIN lv_c USING (user_id)
         |  WHERE e.event_type = 'purchase'
         |    AND (epoch_ns(e.ts) // $w) - cohort_week >= 0
         |  GROUP BY 1, 2)
         |SELECT cohort_week, week_offset, week_revenue_cents,
         |       CAST(sum(week_revenue_cents) OVER (
         |         PARTITION BY cohort_week ORDER BY week_offset
         |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
         |FROM lv_m
         |ORDER BY cohort_week, week_offset""".stripMargin
    },
  )

  // TOKEN-BUCKET RATE-LIMIT REPLAY — the quota-enforcement audit
  // ("which requests WOULD a 2-token / 1-per-6-hour limiter have
  // dropped"): capacity and refill tracked in integer NANOSECONDS of
  // credit (1 token = 21600e9 ns, cap = 2 tokens), so every step is
  // exact — refill is just the elapsed ns clamped at cap, a spend is
  // one token's worth. A genuine per-key recursion (state = credit
  // after the previous event) like the EWMA fold: one shuffle groups
  // each user, an in-row ordered aggregate() folds the bucket
  // left-to-right. Buckets start FULL (the limiter's cold-start
  // convention).
  private val rateLimit = Q(
    "ev_rate_limit",
    (s, d) => {
      import s.implicits._
      val Tok = 21600L * 1000 * 1000 * 1000 // 1 token in ns of credit
      val Cap = 2 * Tok
      Tables.events(s, d)
        .select($"user_id", struct($"ts", $"event_id").as("e"))
        .groupBy($"user_id")
        .agg(sort_array(collect_list($"e")).as("es"))
        .select($"user_id", explode(expr(
          s"""aggregate(
             |  es,
             |  cast(array() as array<struct<ts:bigint,event_id:bigint,
             |       allowed:boolean,credit:bigint>>),
             |  (acc, x) -> concat(acc, array(
             |    CASE WHEN size(acc) = 0 THEN
             |      named_struct('ts', x.ts, 'event_id', x.event_id,
             |        'allowed', true, 'credit', ${Cap}L - ${Tok}L)
             |    ELSE
             |      CASE WHEN least(${Cap}L, element_at(acc, -1).credit
             |                 + (x.ts - element_at(acc, -1).ts)) >= ${Tok}L
             |        THEN named_struct('ts', x.ts, 'event_id', x.event_id,
             |          'allowed', true,
             |          'credit', least(${Cap}L, element_at(acc, -1).credit
             |                    + (x.ts - element_at(acc, -1).ts)) - ${Tok}L)
             |        ELSE named_struct('ts', x.ts, 'event_id', x.event_id,
             |          'allowed', false,
             |          'credit', least(${Cap}L, element_at(acc, -1).credit
             |                    + (x.ts - element_at(acc, -1).ts)))
             |      END
             |    END)))""".stripMargin)).as("o"))
        .select($"user_id", $"o.ts".as("ts"), $"o.event_id".as("event_id"),
          $"o.allowed".as("allowed"), $"o.credit".as("credit_ns"))
        .orderBy($"user_id", $"ts", $"event_id")
    },
    Some("""WITH RECURSIVE rl_e AS (
           |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
           |         row_number() OVER (PARTITION BY user_id
           |                            ORDER BY epoch_ns(ts), event_id) AS rn
           |  FROM events),
           |rl_w(user_id, rn, ts, event_id, allowed, credit) AS (
           |  SELECT user_id, rn, ts, event_id, true,
           |         CAST(43200000000000 - 21600000000000 AS BIGINT)
           |  FROM rl_e WHERE rn = 1
           |  UNION ALL
           |  SELECT e.user_id, e.rn, e.ts, e.event_id,
           |         least(43200000000000, w.credit + (e.ts - w.ts))
           |           >= 21600000000000,
           |         CASE WHEN least(43200000000000, w.credit + (e.ts - w.ts))
           |                   >= 21600000000000
           |              THEN least(43200000000000, w.credit + (e.ts - w.ts))
           |                   - 21600000000000
           |              ELSE least(43200000000000, w.credit + (e.ts - w.ts))
           |         END
           |  FROM rl_w w JOIN rl_e e
           |    ON e.user_id = w.user_id AND e.rn = w.rn + 1)
           |SELECT user_id, ts, event_id, allowed, credit AS credit_ns
           |FROM rl_w ORDER BY user_id, ts, event_id""".stripMargin),
  )

  // MARKOV TRANSITION MATRIX over per-user event sequences — the
  // user-behavior model behind next-action prediction and funnel
  // diagnosis: count consecutive (from_type → to_type) transitions in
  // each user's event-time order, then normalize per from-state to
  // exact ppm probabilities. One user-keyed window shuffle produces
  // the transition pairs; everything after operates on the ≤|types|²
  // matrix rows (the per-from totals are a window over those compact
  // rows, not a second corpus pass). Row-stochastic by construction —
  // the spec asserts each from-state's probabilities sum to ~1e6
  // (short of it only by per-cell truncation).
  private val markovTransitions = Q(
    "ev_markov_transitions",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val matrix = Tables.events(s, d)
        .withColumn("to_type", lead($"event_type", 1).over(byUser))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("cnt"))
      matrix
        .withColumn("n_from",
          sum($"cnt").over(Window.partitionBy($"from_type")))
        .select($"from_type", $"to_type", $"cnt",
          expr("1000000 * cnt div n_from").as("prob_ppm"))
        .orderBy($"from_type", $"to_type")
    },
    Some("""WITH mk_p AS (
           |  SELECT event_type AS from_type,
           |         lead(event_type) OVER (PARTITION BY user_id
           |                                ORDER BY ts, event_id) AS to_type
           |  FROM events),
           |mk_m AS (
           |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
           |  FROM mk_p WHERE to_type IS NOT NULL GROUP BY 1, 2)
           |SELECT from_type, to_type, cnt,
           |       1000000 * cnt
           |         // CAST(sum(cnt) OVER (PARTITION BY from_type) AS BIGINT)
           |         AS prob_ppm
           |FROM mk_m
           |ORDER BY from_type, to_type""".stripMargin),
  )

  // EWMA-RESIDUAL ANOMALY DETECTION — the composed metric monitor:
  // each event's PREDICTION RESIDUAL |value − previous smoothed state|
  // (the EWMA fold above, now also emitting the pre-update baseline)
  // is compared against a ROBUST per-type threshold, 3× the median
  // residual (the qa_mad_outliers discrete-order-statistic device —
  // a mean/σ threshold would let the anomalies poison their own
  // gate). Every stage is exact integers, so the flagged set
  // hash-gates. Scale shape: one user-keyed fold shuffle (the EWMA
  // bound), one histogram-rows-only median window per type, the
  // ≤|types|-row threshold table broadcasts back — no corpus
  // self-join anywhere. First events per user have no baseline and
  // are never flagged.
  private val ewmaAnomaly = Q(
    "ev_ewma_anomaly",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"event_type")
      val resid = Tables.events(s, d)
        .select($"user_id",
          struct($"ts", $"event_id", cents($"value").as("cents"),
            $"event_type".as("et")).as("e"))
        .groupBy($"user_id")
        .agg(sort_array(collect_list($"e")).as("es"))
        .select($"user_id", explode(expr(
          """aggregate(
            |  es,
            |  cast(array() as array<struct<ts:bigint,event_id:bigint,
            |       cents:bigint,et:string,ewma:bigint,prev:bigint>>),
            |  (acc, x) -> concat(acc, array(named_struct(
            |    'ts', x.ts, 'event_id', x.event_id, 'cents', x.cents,
            |    'et', x.et,
            |    'ewma', CASE WHEN size(acc) = 0 THEN x.cents
            |                 ELSE (x.cents + 3 * element_at(acc, -1).ewma) div 4
            |            END,
            |    'prev', CASE WHEN size(acc) = 0 THEN CAST(NULL AS BIGINT)
            |                 ELSE element_at(acc, -1).ewma END))))"""
            .stripMargin)).as("o"))
        .select($"user_id", $"o.ts".as("ts"), $"o.event_id".as("event_id"),
          $"o.et".as("event_type"), $"o.cents".as("cents"),
          abs($"o.cents" - $"o.prev").as("residual"))
      val med = resid.filter($"residual".isNotNull)
        .withColumn("rn", row_number().over(w.orderBy($"residual", $"event_id")))
        .withColumn("n", count(lit(1)).over(w))
        .groupBy($"event_type")
        .agg(max(when($"rn" === expr("(n + 1) div 2"), $"residual"))
          .as("med_residual"))
      resid.join(broadcast(med), "event_type")
        .filter($"residual" > $"med_residual" * 3)
        .select($"user_id", $"ts", $"event_id", $"event_type", $"cents",
          $"residual", $"med_residual")
        .orderBy($"user_id", $"ts", $"event_id")
    },
    Some(s"""WITH RECURSIVE an_e AS (
            |  SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type,
            |         ${centsSql("value")} AS cents,
            |         row_number() OVER (PARTITION BY user_id
            |                            ORDER BY epoch_ns(ts), event_id) AS rn
            |  FROM events),
            |an_w(user_id, rn, ewma) AS (
            |  SELECT user_id, rn, cents FROM an_e WHERE rn = 1
            |  UNION ALL
            |  SELECT e.user_id, e.rn, (e.cents + 3 * w.ewma) // 4
            |  FROM an_w w JOIN an_e e
            |    ON e.user_id = w.user_id AND e.rn = w.rn + 1),
            |an_r AS (
            |  SELECT e.user_id, e.ts, e.event_id, e.event_type, e.cents,
            |         abs(e.cents - lag(w.ewma) OVER (
            |           PARTITION BY e.user_id ORDER BY e.rn)) AS residual
            |  FROM an_e e JOIN an_w w
            |    ON w.user_id = e.user_id AND w.rn = e.rn),
            |an_m AS (
            |  SELECT event_type,
            |         max(CASE WHEN rn2 = (n + 1) // 2 THEN residual END)
            |           AS med_residual
            |  FROM (SELECT event_type, residual,
            |               row_number() OVER (PARTITION BY event_type
            |                 ORDER BY residual, event_id) AS rn2,
            |               count(*) OVER (PARTITION BY event_type) AS n
            |        FROM an_r WHERE residual IS NOT NULL)
            |  GROUP BY event_type)
            |SELECT r.user_id, r.ts, r.event_id, r.event_type, r.cents,
            |       r.residual, m.med_residual
            |FROM an_r r JOIN an_m m USING (event_type)
            |WHERE r.residual > 3 * m.med_residual
            |ORDER BY r.user_id, r.ts, r.event_id""".stripMargin),
  )

  // INCREMENTAL VIEW MAINTENANCE for an algebraic aggregate: the
  // per-user lifetime rollup is maintained as MERGEABLE PARTIAL STATE
  // (count, sum, min, max — all combine associatively), so a new batch
  // never triggers a recompute over history. This entry splits the
  // corpus at a cutoff into "materialized base" and "arriving delta",
  // computes each side's partials INDEPENDENTLY (in production the
  // base partials are the stored view — the raw history is never
  // rescanned), and merges with a second-stage aggregate whose input
  // is 2 rows per user, not the event history. The oracle is the full
  // recompute — the IVM contract is exactly that merge(base, delta) ==
  // recompute(all), which the hash gate pins. At 100 TB the delta pass
  // touches only new files and the merge cost is O(|state| + |delta|);
  // the shuffle key is user_id on both sides, so the merge co-locates
  // with the stored state's layout. All columns integer (cents,
  // nanos).
  private val ivmMerge = Q(
    "ev_ivm_merge",
    (s, d) => {
      import s.implicits._
      // 2024-01-21 00:00 UTC in nanos: base = first 20 days of the
      // 30-day fixture, delta = the rest.
      val cutNs = 1705795200L * 1000000000L
      val ev = Tables.events(s, d)
        .select($"user_id", $"ts", cents($"value").as("c"))
      def partials(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"user_id").agg(
          count(lit(1)).as("n"),
          sum($"c").as("sc"),
          min($"ts").as("mn"),
          max($"ts").as("mx"))
      val base = partials(ev.filter($"ts" < cutNs))
      val delta = partials(ev.filter($"ts" >= cutNs))
      base.unionByName(delta)
        .groupBy($"user_id")
        .agg(
          sum($"n").as("n_events"),
          sum($"sc").as("value_cents"),
          min($"mn").as("first_ts"),
          max($"mx").as("last_ts"))
        .select($"user_id", $"n_events", $"value_cents",
          $"first_ts", $"last_ts",
          ($"last_ts" - $"first_ts").as("span_ns"))
        .orderBy($"user_id")
    },
    Some(s"""SELECT user_id,
            |       count(*) AS n_events,
            |       CAST(sum(${centsSql("value")}) AS BIGINT) AS value_cents,
            |       min(epoch_ns(ts)) AS first_ts,
            |       max(epoch_ns(ts)) AS last_ts,
            |       max(epoch_ns(ts)) - min(epoch_ns(ts)) AS span_ns
            |FROM events
            |GROUP BY user_id
            |ORDER BY user_id""".stripMargin),
  )

  // MULTI-TOUCH LINEAR ATTRIBUTION (the marketing-analytics staple
  // next to the funnel: split each conversion's credit equally across
  // the touchpoints that preceded it). Conversions are purchases;
  // touchpoints are the user's view/click events in the 7 days
  // before (strictly earlier, ns-exact). Credit is EXACT ppm via the
  // same largest-remainder device as td_token_budget_alloc: each
  // touch gets 1e6 div n, the 1e6 mod n remainder goes to the most
  // recent touches (recency rank, total-ordered by ts desc, event_id
  // desc) — so per-conversion credit sums to EXACTLY 1e6, and the
  // channel roll-up is exact. Untouched conversions credit a
  // '(direct)' channel in full, so Σ credit == 1e6 · conversions is
  // a closed-book invariant. Scale shape: the touch join is
  // user-keyed (hash join; fanout bounded by per-user 7-day
  // activity), the rank window partitions per conversion (bounded
  // the same way), the roll-up is a |channels|-key agg.
  private val attributionLinear = Q(
    "ev_attribution_linear",
    (s, d) => {
      import s.implicits._
      val WeekNs = 7L * 86400 * 1000 * 1000 * 1000
      val conv = Tables.events(s, d).filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("cts"), $"event_id".as("cid"))
      val touch = Tables.events(s, d)
        .filter($"event_type".isin("view", "click"))
        .select($"user_id".as("tuid"), $"event_type".as("channel"),
          $"ts".as("tts"), $"event_id".as("tid"))
      // the window predicate lives IN the join condition: a
      // conversion whose touches are all out-of-window must still
      // surface as one null row → '(direct)', not vanish
      val attributed = conv.join(touch,
          $"user_id" === $"tuid" && $"tts" < $"cts" &&
            $"cts" - $"tts" <= WeekNs, "left")
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy($"user_id", $"cid")))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id", $"cid")
            .orderBy($"tts".desc, $"tid".desc)))
        .select(
          coalesce($"channel", lit("(direct)")).as("channel"),
          when($"tts".isNull, lit(1000000L))
            .otherwise(expr("1000000 div n") +
              when($"rn" <= expr("1000000 % n"), 1L).otherwise(0L))
            .as("credit_ppm"))
      attributed.groupBy($"channel")
        .agg(count(lit(1)).as("n_touchpoints"),
          sum($"credit_ppm").as("credit_ppm_total"))
        .orderBy($"channel")
    },
    Some(s"""WITH at_conv AS (
            |  SELECT user_id, epoch_ns(ts) AS cts, event_id AS cid
            |  FROM events WHERE event_type = 'purchase'),
            |at_touch AS (
            |  SELECT user_id, event_type AS channel,
            |         epoch_ns(ts) AS tts, event_id AS tid
            |  FROM events WHERE event_type IN ('view', 'click')),
            |at_j AS (
            |  SELECT c.user_id, c.cid, t.channel, t.tts, t.tid
            |  FROM at_conv c LEFT JOIN at_touch t
            |    ON t.user_id = c.user_id AND t.tts < c.cts
            |   AND c.cts - t.tts <= ${7L * 86400 * 1000 * 1000 * 1000}),
            |at_r AS (
            |  SELECT *, count(*) OVER (PARTITION BY user_id, cid) AS n,
            |         row_number() OVER (PARTITION BY user_id, cid
            |                            ORDER BY tts DESC, tid DESC) AS rn
            |  FROM at_j),
            |at_c AS (
            |  SELECT coalesce(channel, '(direct)') AS channel,
            |         CASE WHEN tts IS NULL THEN 1000000
            |              ELSE 1000000 // n
            |                   + CASE WHEN rn <= 1000000 % n THEN 1 ELSE 0 END
            |         END AS credit_ppm
            |  FROM at_r)
            |SELECT channel, count(*) AS n_touchpoints,
            |       CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_total
            |FROM at_c GROUP BY channel
            |ORDER BY channel""".stripMargin),
  )

  // SEASONAL-NAIVE FORECAST BACKTEST — the baseline every forecasting
  // system is judged against (and the monitoring loop that judges
  // it): predict each (type, day)'s revenue as the revenue exactly 7
  // days earlier, then score the backtest with exact integer error
  // accounting — MAE in cents (truncating div) and WAPE in ppm
  // (Σ|err|·1e6 DIV Σactual — the weighted form avoids MAPE's
  // per-day division entirely, so no float and no div-by-zero days).
  // Scale shape: ONE corpus pass collapses events to the (type, day)
  // daily table (≤ |types|·days rows); the lag-7 self-join and all
  // scoring run on that table — corpus-size-free after the first
  // aggregate, the same shape as the retention/LTV matrices.
  private val forecastBacktest = Q(
    "ev_forecast_backtest",
    (s, d) => {
      import s.implicits._
      val DayNs = 86400L * 1000 * 1000 * 1000
      val daily = Tables.events(s, d)
        .groupBy($"event_type", expr(s"ts div $DayNs").as("day"))
        .agg(sum(cents($"value")).as("actual"))
        .localCheckpoint() // both sides of the lag-7 self-join
      val pred = daily.select($"event_type", ($"day" + 7).as("day"),
        $"actual".as("predicted"))
      daily.join(pred, Seq("event_type", "day"))
        .select($"event_type", abs($"actual" - $"predicted").as("err"), $"actual")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          expr("sum(err) div count(*)").as("mae_cents"),
          expr("(sum(err) * 1000000) div sum(actual)").as("wape_ppm"))
        .orderBy($"event_type")
    },
    Some(s"""WITH fb_daily AS (
            |  SELECT event_type,
            |         epoch_ns(ts) // ${86400L * 1000 * 1000 * 1000} AS day,
            |         CAST(sum(${centsSql("value")}) AS BIGINT) AS actual
            |  FROM events GROUP BY 1, 2),
            |fb_j AS (
            |  SELECT a.event_type, abs(a.actual - p.actual) AS err, a.actual
            |  FROM fb_daily a JOIN fb_daily p
            |    ON p.event_type = a.event_type AND p.day = a.day - 7)
            |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
            |       CAST(sum(err) AS BIGINT) // count(*) AS mae_cents,
            |       (CAST(sum(err) AS BIGINT) * 1000000)
            |         // CAST(sum(actual) AS BIGINT) AS wape_ppm
            |FROM fb_j GROUP BY 1
            |ORDER BY event_type""".stripMargin),
  )

  // POINT-IN-TIME FEATURE MATRIX (the feature-store materialization
  // pattern: for every label event, assemble features computed ONLY
  // from data strictly before it — the leakage-free training-set
  // build every ML pipeline runs). Labels are purchases; features
  // are (a) days since the user's last prior signup (as-of), (b/c)
  // trailing-7-day view and click counts (RANGE frames ending 1 ns
  // before the label, so same-timestamp events never leak in), and
  // (d) lifetime spend so far (ROWS frame to the previous row under
  // the (ts, event_id) total order). Everything rides ONE user-keyed
  // shuffle and per-user window frames — the per-key bound of the
  // sessionize family; no self-joins, no corpus-wide sort.
  private val featureMatrix = Q(
    "ev_feature_matrix",
    (s, d) => {
      import s.implicits._
      val WeekNs = 7L * 86400 * 1000 * 1000 * 1000
      val DayNs = 86400L * 1000 * 1000 * 1000
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val rowsPrev = byUser.rowsBetween(Window.unboundedPreceding, -1)
      val range7d = Window.partitionBy($"user_id").orderBy($"ts")
        .rangeBetween(-WeekNs, -1)
      Tables.events(s, d)
        .select($"user_id", $"event_id", $"ts", $"event_type",
          cents($"value").as("v"))
        .withColumn("last_signup",
          max(when($"event_type" === "signup", $"ts")).over(rowsPrev))
        .withColumn("v7_views",
          count(when($"event_type" === "view", lit(1))).over(range7d))
        .withColumn("v7_clicks",
          count(when($"event_type" === "click", lit(1))).over(range7d))
        .withColumn("cum_spend",
          coalesce(sum(when($"event_type" === "purchase", $"v")).over(rowsPrev),
            lit(0L)))
        .filter($"event_type" === "purchase")
        .select($"user_id", $"event_id",
          coalesce(expr(s"(ts - last_signup) div $DayNs"), lit(-1L))
            .as("days_since_signup"),
          $"v7_views", $"v7_clicks", $"cum_spend".as("cum_spend_cents"),
          $"v".as("label_cents"))
        .orderBy($"user_id", $"event_id")
    },
    Some(s"""WITH fm_e AS (
            |  SELECT user_id, event_id, epoch_ns(ts) AS ts, event_type,
            |         ${centsSql("value")} AS v
            |  FROM events),
            |fm_w AS (
            |  SELECT *,
            |         max(CASE WHEN event_type = 'signup' THEN ts END)
            |           OVER (PARTITION BY user_id ORDER BY ts, event_id
            |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            |           AS last_signup,
            |         count(CASE WHEN event_type = 'view' THEN 1 END)
            |           OVER (PARTITION BY user_id ORDER BY ts
            |                 RANGE BETWEEN ${7L * 86400 * 1000 * 1000 * 1000}
            |                 PRECEDING AND 1 PRECEDING) AS v7_views,
            |         count(CASE WHEN event_type = 'click' THEN 1 END)
            |           OVER (PARTITION BY user_id ORDER BY ts
            |                 RANGE BETWEEN ${7L * 86400 * 1000 * 1000 * 1000}
            |                 PRECEDING AND 1 PRECEDING) AS v7_clicks,
            |         coalesce(sum(CASE WHEN event_type = 'purchase' THEN v END)
            |           OVER (PARTITION BY user_id ORDER BY ts, event_id
            |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            |           0) AS cum_spend
            |  FROM fm_e)
            |SELECT user_id, event_id,
            |       coalesce((ts - last_signup) // ${86400L * 1000 * 1000 * 1000},
            |                -1) AS days_since_signup,
            |       CAST(v7_views AS BIGINT) AS v7_views,
            |       CAST(v7_clicks AS BIGINT) AS v7_clicks,
            |       CAST(cum_spend AS BIGINT) AS cum_spend_cents,
            |       v AS label_cents
            |FROM fm_w
            |WHERE event_type = 'purchase'
            |ORDER BY user_id, event_id""".stripMargin),
  )

  // TOP SESSION PATHS ("user journeys"): the first three event types
  // of every 30-min-gap session, joined '>'-separated, counted
  // corpus-wide — the product-analytics readout built on the same
  // gap-and-island device as ev_sessionize. The path assembles
  // IN-ROW: each session's events collect under the (user, session)
  // key (bounded by session length), sort by (ts, event_id), slice 3
  // — never a corpus-wide ordered window. Top-10, ties total-ordered
  // by path.
  private val topPaths = Q(
    "ev_top_paths",
    (s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("is_start",
          when($"prev_ts".isNull || $"ts" - $"prev_ts" > GapNs, 1L).otherwise(0L))
        .withColumn("session_seq", sum($"is_start").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_seq")
        .agg(sort_array(collect_list(struct($"ts", $"event_id", $"event_type")))
          .as("es"))
        .select(expr(
          "array_join(transform(slice(es, 1, 3), x -> x.event_type), '>')")
          .as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n_sessions"))
        .orderBy($"n_sessions".desc, $"path")
        .limit(10)
    },
    Some(s"""WITH tp_s AS (
            |  SELECT user_id, event_id, ts, event_type,
            |         sum(is_start) OVER (PARTITION BY user_id
            |                             ORDER BY ts, event_id
            |                             ROWS BETWEEN UNBOUNDED PRECEDING
            |                             AND CURRENT ROW) AS session_seq
            |  FROM (
            |    SELECT user_id, event_id, epoch_ns(ts) AS ts, event_type,
            |           CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
            |                  OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > $GapNs
            |                THEN 1 ELSE 0 END AS is_start
            |    FROM events
            |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))),
            |tp_p AS (
            |  SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
            |  FROM (
            |    SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
            |                                 ORDER BY ts, event_id) AS rn
            |    FROM tp_s)
            |  WHERE rn <= 3
            |  GROUP BY user_id, session_seq)
            |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
            |FROM tp_p GROUP BY path
            |ORDER BY n_sessions DESC, path
            |LIMIT 10""".stripMargin),
  )

  // ACTIVITY CONCENTRATION / LORENZ SHARES (the "what % of traffic
  // comes from the top 1% of users" capacity question, and the skew
  // early-warning for every user-keyed shuffle in this file). Exact
  // event share of the top {1,5,10,20,50}% most-active users, ppm.
  // The device is the qa_percentile_rank discipline: reduce to the
  // ACTIVITY HISTOGRAM (distinct per-user event counts — a bounded
  // value domain however many users exist), run the two cumulative
  // windows over those compact rows, then resolve each percentile's
  // k = ⌈U·p/100⌉ against its boundary histogram class; users inside
  // one class are interchangeable (identical count), so the partial-
  // class share (k − cum_prev)·c is EXACT, not an approximation.
  // Cross products in DECIMAL(38,0)/HUGEINT.
  private val paretoConcentration = Q(
    "ev_pareto_concentration",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val perUser = Tables.events(s, d)
        .groupBy($"user_id").agg(count(lit(1)).as("c"))
      val hist = perUser.groupBy($"c").agg(count(lit(1)).as("nu"))
      val w = Window.orderBy($"c".desc)
      val cum = hist
        .withColumn("cum_u", sum($"nu").over(w))
        .withColumn("cum_e", sum(($"c" * $"nu").cast("decimal(38,0)")).over(w))
      val tot = perUser.agg(count(lit(1)).as("users"),
        sum($"c".cast("decimal(38,0)")).as("events"))
      val kdf = s.range(0, 1).select(
        explode(array(lit(1L), lit(5L), lit(10L), lit(20L), lit(50L))).as("pct"))
        .crossJoin(broadcast(tot))
        .select($"pct", $"users", $"events",
          expr("(users * pct + 99) div 100").as("k"))
      cum.join(broadcast(kdf), $"cum_u" - $"nu" < $"k" && $"k" <= $"cum_u")
        .select($"pct", $"k".as("top_users"),
          ($"cum_e" - ($"cum_u" - $"k").cast("decimal(38,0)") * $"c")
            .cast("long").as("events_top"),
          expr("((cum_e - CAST(cum_u - k AS DECIMAL(38,0)) * c) * 1000000)" +
            " div events").as("share_ppm"))
        .orderBy($"pct")
    },
    Some("""WITH pc_u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
            |              FROM events GROUP BY 1),
            |pc_h AS (SELECT c, CAST(count(*) AS BIGINT) AS nu
            |         FROM pc_u GROUP BY 1),
            |pc_c AS (SELECT c, nu,
            |                CAST(sum(nu) OVER (ORDER BY c DESC) AS BIGINT)
            |                  AS cum_u,
            |                CAST(sum(c * nu) OVER (ORDER BY c DESC) AS HUGEINT)
            |                  AS cum_e
            |         FROM pc_h),
            |pc_t AS (SELECT CAST(count(*) AS BIGINT) AS users,
            |                CAST(sum(c) AS HUGEINT) AS events FROM pc_u),
            |pc_k AS (SELECT pct, users, events,
            |                (users * pct + 99) // 100 AS k
            |         FROM (SELECT unnest([1, 5, 10, 20, 50]) AS pct)
            |         CROSS JOIN pc_t)
            |SELECT CAST(k.pct AS BIGINT) AS pct,
            |       CAST(k.k AS BIGINT) AS top_users,
            |       CAST(c.cum_e - (c.cum_u - k.k)::HUGEINT * c.c AS BIGINT)
            |         AS events_top,
            |       CAST(((c.cum_e - (c.cum_u - k.k)::HUGEINT * c.c) * 1000000)
            |            // k.events AS BIGINT) AS share_ppm
            |FROM pc_k k JOIN pc_c c ON c.cum_u - c.nu < k.k AND k.k <= c.cum_u
            |ORDER BY pct""".stripMargin),
  )

  // DISCRETE-TIME HAZARD CURVE (the survival-analysis view of user
  // lifetime — Kaplan-Meier's discrete sibling, chosen because the
  // hazard table needs NO cumulative product, so it stays rational/
  // integer-exact where the KM survivor curve would need floats).
  // Lifetime = whole days between a user's first and last event;
  // deaths(t) = users whose lifetime is exactly t; at_risk(t) =
  // users surviving AT LEAST t = the DESCENDING cumulative sum over
  // the lifetime histogram — bounded by the day span whatever the
  // user count, the same histogram-window discipline as
  // ev_pareto_concentration. hazard_ppm = deaths·10⁶ div at_risk.
  private val hazardCurve = Q(
    "ev_hazard_curve",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val DayNs = 86400L * 1000 * 1000 * 1000
      val life = Tables.events(s, d)
        .groupBy($"user_id")
        .agg(expr(s"(max(ts) - min(ts)) div $DayNs").as("t"))
      val hist = life.groupBy($"t").agg(count(lit(1)).as("deaths"))
      val w = Window.orderBy($"t".desc)
      hist.withColumn("at_risk", sum($"deaths").over(w))
        .select($"t".as("t_days"), $"at_risk", $"deaths",
          expr("(deaths * 1000000) div at_risk").as("hazard_ppm"))
        .orderBy($"t_days")
    },
    Some(s"""WITH hz_l AS (
            |  SELECT user_id,
            |         (max(epoch_ns(ts)) - min(epoch_ns(ts)))
            |           // ${86400L * 1000 * 1000 * 1000} AS t
            |  FROM events GROUP BY 1),
            |hz_h AS (SELECT t, CAST(count(*) AS BIGINT) AS deaths
            |         FROM hz_l GROUP BY 1)
            |SELECT t AS t_days,
            |       CAST(sum(deaths) OVER (ORDER BY t DESC) AS BIGINT)
            |         AS at_risk,
            |       deaths,
            |       CAST((deaths * 1000000)
            |            // (sum(deaths) OVER (ORDER BY t DESC)) AS BIGINT)
            |         AS hazard_ppm
            |FROM hz_h
            |ORDER BY t_days""".stripMargin),
  )

  // DAU/WAU STICKINESS (the standard engagement ratio: what fraction
  // of this week's actives showed up today). Exact trailing-7-day
  // distinct users via the decomposition that scales: reduce the
  // event stream ONCE to distinct (user, day) — ≤ one row per user
  // per day however many events — fan each row out to the ≤ 7 window
  // ends it supports, and re-distinct. Shuffle volume is 7·|user-days|,
  // linear in the reduced table, never in raw events; no sliding
  // count-distinct window state. Window days are joined back to REAL
  // active days so no phantom trailing days appear; the first six
  // days carry their honest partial windows.
  private val dauWau = Q(
    "ev_dau_wau_stickiness",
    (s, d) => {
      import s.implicits._
      val DayNs = 86400L * 1000 * 1000 * 1000
      val ud = Tables.events(s, d)
        .select($"user_id", expr(s"ts div $DayNs").as("day"))
        .distinct()
      val dau = ud.groupBy($"day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select($"user_id", explode(sequence(lit(0L), lit(6L))).as("off"),
          $"day")
        .select($"user_id", ($"day" + $"off").as("day"))
        .distinct()
        .groupBy($"day").agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("day"))
        .select($"day", $"dau", $"wau",
          expr("(dau * 1000000) div wau").as("stickiness_ppm"))
        .orderBy($"day")
    },
    Some(s"""WITH dw_ud AS (
            |  SELECT DISTINCT user_id,
            |         epoch_ns(ts) // ${86400L * 1000 * 1000 * 1000} AS day
            |  FROM events),
            |dw_dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
            |           FROM dw_ud GROUP BY 1),
            |dw_wau AS (
            |  SELECT day, CAST(count(*) AS BIGINT) AS wau FROM (
            |    SELECT DISTINCT user_id, u.day + o.off AS day
            |    FROM dw_ud u CROSS JOIN range(0, 7) o(off))
            |  GROUP BY 1)
            |SELECT d.day, d.dau, w.wau,
            |       CAST((d.dau * 1000000) // w.wau AS BIGINT)
            |         AS stickiness_ppm
            |FROM dw_dau d JOIN dw_wau w USING (day)
            |ORDER BY d.day""".stripMargin),
  )

  // FUNNEL TIME-TO-CONVERT (the latency half of the funnel story —
  // ev_funnel_steps counts WHO converts, this measures HOW LONG each
  // hop takes). Per funnel hop, exact median and p90 of the
  // first-completion delta in whole seconds, via the
  // qa_histogram_quantile device: reduce pairs to the (hop, seconds)
  // histogram — bounded by the corpus time span in seconds, never by
  // user count — then one cumulative window per hop and the
  // inverse-CDF pick at cum·1000 ≥ p·n. Timestamps compare in µs (the
  // funnel file's tie-break discipline); deltas floor to seconds only
  // at histogram time.
  private val funnelTtc = Q(
    "ev_funnel_time_to_convert",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select($"user_id", $"event_type", expr("ts div 1000").as("tus"))
      val s1 = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"tus").as("t1"))
      val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
        .filter($"tus" > $"t1")
        .groupBy($"user_id").agg(min($"tus").as("t2"))
      val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
        .filter($"tus" > $"t2")
        .groupBy($"user_id").agg(min($"tus").as("t3"))
      val d1 = s2.join(s1, "user_id")
        .select(lit("1_signup_to_click").as("step"),
          expr("(t2 - t1) div 1000000").as("d_s"))
      val d2 = s3.join(s2, "user_id")
        .select(lit("2_click_to_purchase").as("step"),
          expr("(t3 - t2) div 1000000").as("d_s"))
      val hist = d1.unionByName(d2)
        .groupBy($"step", $"d_s").agg(count(lit(1)).as("c"))
      val wcum = Window.partitionBy($"step").orderBy($"d_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.partitionBy($"step")
      hist
        .withColumn("cum", sum($"c").over(wcum))
        .withColumn("n", sum($"c").over(wall))
        .select($"step", $"n", $"cum", $"d_s",
          explode(typedLit(Seq(500, 900))).as("p_milli"))
        .filter($"cum" * 1000 >= $"p_milli" * $"n")
        .groupBy($"step", $"p_milli")
        .agg(max($"n").as("n_pairs"), min($"d_s").as("q_s"))
        .orderBy($"step", $"p_milli")
    },
    Some("""WITH tc_e AS (
            |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus
            |  FROM events),
            |tc_1 AS (SELECT user_id, min(tus) AS t1 FROM tc_e
            |         WHERE event_type = 'signup' GROUP BY 1),
            |tc_2 AS (SELECT e.user_id, min(tus) AS t2
            |         FROM tc_e e JOIN tc_1 USING (user_id)
            |         WHERE event_type = 'click' AND tus > t1 GROUP BY 1),
            |tc_3 AS (SELECT e.user_id, min(tus) AS t3
            |         FROM tc_e e JOIN tc_2 USING (user_id)
            |         WHERE event_type = 'purchase' AND tus > t2 GROUP BY 1),
            |tc_d AS (
            |  SELECT '1_signup_to_click' AS step, (t2 - t1) // 1000000 AS d_s
            |  FROM tc_2 JOIN tc_1 USING (user_id)
            |  UNION ALL
            |  SELECT '2_click_to_purchase', (t3 - t2) // 1000000
            |  FROM tc_3 JOIN tc_2 USING (user_id)),
            |tc_h AS (SELECT step, d_s, CAST(count(*) AS BIGINT) AS c
            |         FROM tc_d GROUP BY 1, 2),
            |tc_c AS (
            |  SELECT step, d_s,
            |         CAST(sum(c) OVER (PARTITION BY step ORDER BY d_s
            |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
            |         CAST(sum(c) OVER (PARTITION BY step) AS BIGINT) AS n
            |  FROM tc_h)
            |SELECT step, CAST(p_milli AS INT) AS p_milli,
            |       CAST(max(n) AS BIGINT) AS n_pairs,
            |       CAST(min(d_s) AS BIGINT) AS q_s
            |FROM tc_c CROSS JOIN (SELECT unnest([500, 900]) AS p_milli)
            |WHERE cum * 1000 >= p_milli * n
            |GROUP BY step, p_milli
            |ORDER BY step, p_milli""".stripMargin),
  )

  // RFM SEGMENTATION (the classic CRM cube: recency / frequency /
  // monetary quintiles, Hughes 1994). Scores are VALUE quintiles
  // (score 1 = lowest fifth) cut by the exact inverse-CDF device:
  // recency (days since last event) and frequency histograms are
  // exact — both value domains are bounded (day span; max per-user
  // activity) — while monetary uses the qa_histogram_quantile 256-bin
  // edge resolution (cent sums are user-many, so the bin width IS the
  // documented quantization). The quintile EDGES pivot to one
  // broadcast row, so scoring is a map-only pass over the per-user
  // aggregate; the output is the ≤125-cell segment cube. Window state
  // everywhere is histogram-sized, never user-sized.
  private val rfmSegments = Q(
    "ev_rfm_segments",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.util.Cols.cents
      val DayNs = 86400L * 1000 * 1000 * 1000
      val users0 = Tables.events(s, d).groupBy($"user_id")
        .agg(expr(s"max(ts div $DayNs)").as("last_day"),
          count(lit(1)).as("f"), sum(cents($"value")).as("m"))
      val maxDay = users0.agg(max($"last_day").as("d0"))
      val mb = users0.agg(min($"m").as("mmin"), max($"m").as("mmax"))
      val u = users0.crossJoin(broadcast(maxDay)).crossJoin(broadcast(mb))
        .select($"user_id", ($"d0" - $"last_day").as("r"), $"f",
          expr("(m - mmin) div greatest(CAST(1 AS BIGINT)," +
            " (mmax - mmin) div 256 + 1)").as("mb"))
        .localCheckpoint() // feeds three histograms AND the scoring pass
      def edges(c: String): org.apache.spark.sql.DataFrame = {
        val hist = u.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        val wc = Window.orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist.withColumn("cum", sum($"cnt").over(wc))
          .withColumn("n", sum($"cnt").over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .select($"v", $"cum", $"n",
            explode(typedLit(Seq(200, 400, 600, 800))).as("p"))
          .filter($"cum" * 1000 >= $"p" * $"n")
          .groupBy($"p").agg(min($"v").as("t"))
          .agg(
            max(when($"p" === 200, $"t")).as(s"${c}_t1"),
            max(when($"p" === 400, $"t")).as(s"${c}_t2"),
            max(when($"p" === 600, $"t")).as(s"${c}_t3"),
            max(when($"p" === 800, $"t")).as(s"${c}_t4"))
      }
      u.crossJoin(broadcast(edges("r")))
        .crossJoin(broadcast(edges("f")))
        .crossJoin(broadcast(edges("mb")))
        .select(
          expr("1 + CAST(r > r_t1 AS INT) + CAST(r > r_t2 AS INT)" +
            " + CAST(r > r_t3 AS INT) + CAST(r > r_t4 AS INT)")
            .cast("long").as("r_score"),
          expr("1 + CAST(f > f_t1 AS INT) + CAST(f > f_t2 AS INT)" +
            " + CAST(f > f_t3 AS INT) + CAST(f > f_t4 AS INT)")
            .cast("long").as("f_score"),
          expr("1 + CAST(mb > mb_t1 AS INT) + CAST(mb > mb_t2 AS INT)" +
            " + CAST(mb > mb_t3 AS INT) + CAST(mb > mb_t4 AS INT)")
            .cast("long").as("m_score"))
        .groupBy($"r_score", $"f_score", $"m_score")
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"r_score", $"f_score", $"m_score")
    },
    Some(s"""WITH rf_u0 AS (
            |  SELECT user_id,
            |         max(epoch_ns(ts) // ${86400L * 1000 * 1000 * 1000})
            |           AS last_day,
            |         CAST(count(*) AS BIGINT) AS f,
            |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            |           AS m
            |  FROM events GROUP BY 1),
            |rf_b AS (SELECT max(last_day) AS d0, min(m) AS mmin,
            |                max(m) AS mmax FROM rf_u0),
            |rf_u AS (
            |  SELECT user_id, d0 - last_day AS r, f,
            |         (m - mmin) // greatest(1, (mmax - mmin) // 256 + 1)
            |           AS mb
            |  FROM rf_u0 CROSS JOIN rf_b),
            |rf_ps AS (SELECT unnest([200, 400, 600, 800]) AS p),
            |rf_er AS (
            |  SELECT max(CASE WHEN p = 200 THEN t END) AS r_t1,
            |         max(CASE WHEN p = 400 THEN t END) AS r_t2,
            |         max(CASE WHEN p = 600 THEN t END) AS r_t3,
            |         max(CASE WHEN p = 800 THEN t END) AS r_t4
            |  FROM (SELECT p, min(v) AS t FROM (
            |          SELECT v, cum, n, p FROM (
            |            SELECT v, sum(cnt) OVER (ORDER BY v
            |                   ROWS UNBOUNDED PRECEDING) AS cum,
            |                   sum(cnt) OVER () AS n
            |            FROM (SELECT r AS v, count(*) AS cnt FROM rf_u
            |                  GROUP BY 1)) CROSS JOIN rf_ps
            |          WHERE cum * 1000 >= p * n)
            |        GROUP BY p)),
            |rf_ef AS (
            |  SELECT max(CASE WHEN p = 200 THEN t END) AS f_t1,
            |         max(CASE WHEN p = 400 THEN t END) AS f_t2,
            |         max(CASE WHEN p = 600 THEN t END) AS f_t3,
            |         max(CASE WHEN p = 800 THEN t END) AS f_t4
            |  FROM (SELECT p, min(v) AS t FROM (
            |          SELECT v, cum, n, p FROM (
            |            SELECT v, sum(cnt) OVER (ORDER BY v
            |                   ROWS UNBOUNDED PRECEDING) AS cum,
            |                   sum(cnt) OVER () AS n
            |            FROM (SELECT f AS v, count(*) AS cnt FROM rf_u
            |                  GROUP BY 1)) CROSS JOIN rf_ps
            |          WHERE cum * 1000 >= p * n)
            |        GROUP BY p)),
            |rf_em AS (
            |  SELECT max(CASE WHEN p = 200 THEN t END) AS mb_t1,
            |         max(CASE WHEN p = 400 THEN t END) AS mb_t2,
            |         max(CASE WHEN p = 600 THEN t END) AS mb_t3,
            |         max(CASE WHEN p = 800 THEN t END) AS mb_t4
            |  FROM (SELECT p, min(v) AS t FROM (
            |          SELECT v, cum, n, p FROM (
            |            SELECT v, sum(cnt) OVER (ORDER BY v
            |                   ROWS UNBOUNDED PRECEDING) AS cum,
            |                   sum(cnt) OVER () AS n
            |            FROM (SELECT mb AS v, count(*) AS cnt FROM rf_u
            |                  GROUP BY 1)) CROSS JOIN rf_ps
            |          WHERE cum * 1000 >= p * n)
            |        GROUP BY p))
            |SELECT CAST(1 + CAST(r > r_t1 AS INT) + CAST(r > r_t2 AS INT)
            |            + CAST(r > r_t3 AS INT) + CAST(r > r_t4 AS INT)
            |            AS BIGINT) AS r_score,
            |       CAST(1 + CAST(f > f_t1 AS INT) + CAST(f > f_t2 AS INT)
            |            + CAST(f > f_t3 AS INT) + CAST(f > f_t4 AS INT)
            |            AS BIGINT) AS f_score,
            |       CAST(1 + CAST(mb > mb_t1 AS INT) + CAST(mb > mb_t2 AS INT)
            |            + CAST(mb > mb_t3 AS INT) + CAST(mb > mb_t4 AS INT)
            |            AS BIGINT) AS m_score,
            |       CAST(count(*) AS BIGINT) AS n_users
            |FROM rf_u CROSS JOIN rf_er CROSS JOIN rf_ef CROSS JOIN rf_em
            |GROUP BY 1, 2, 3
            |ORDER BY 1, 2, 3""".stripMargin),
  )

  // POSITION-BASED (U-SHAPE) ATTRIBUTION — the 40/20/40 model ad
  // platforms ship next to linear: first and last touch take 40%
  // each, the middle touches split the remaining 20%. Same
  // conv/touch tables, 7-day in-join window, '(direct)' fallback and
  // exact-ppm bookkeeping as ev_attribution_linear; the middle split
  // uses the same largest-remainder device (200000 div (n−2), the
  // 200000 mod (n−2) remainder to the MOST RECENT middles), so
  // Σ credit == 10⁶ · conversions stays a closed-book invariant.
  // n = 1 takes the full 10⁶; n = 2 splits 50/50. Scale shape
  // identical to the linear entry: user-keyed join, per-conversion
  // bounded windows, |channels|-key roll-up.
  private val attributionPosition = Q(
    "ev_attribution_position",
    (s, d) => {
      import s.implicits._
      val WeekNs = 7L * 86400 * 1000 * 1000 * 1000
      val conv = Tables.events(s, d).filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("cts"), $"event_id".as("cid"))
      val touch = Tables.events(s, d)
        .filter($"event_type".isin("view", "click"))
        .select($"user_id".as("tuid"), $"event_type".as("channel"),
          $"ts".as("tts"), $"event_id".as("tid"))
      val attributed = conv.join(touch,
          $"user_id" === $"tuid" && $"tts" < $"cts" &&
            $"cts" - $"tts" <= WeekNs, "left")
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy($"user_id", $"cid")))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id", $"cid")
            .orderBy($"tts", $"tid")))
        .select(
          coalesce($"channel", lit("(direct)")).as("channel"),
          when($"tts".isNull, lit(1000000L))
            .otherwise(expr(
              """CASE WHEN n = 1 THEN 1000000
                |     WHEN n = 2 THEN 500000
                |     WHEN rn = 1 OR rn = n THEN 400000
                |     ELSE 200000 div (n - 2)
                |          + (CASE WHEN n - rn <= 200000 % (n - 2)
                |             THEN 1 ELSE 0 END)
                |END""".stripMargin)).as("credit_ppm"))
      attributed.groupBy($"channel")
        .agg(count(lit(1)).as("n_touchpoints"),
          sum($"credit_ppm").as("credit_ppm_total"))
        .orderBy($"channel")
    },
    Some(s"""WITH ap_conv AS (
            |  SELECT user_id, epoch_ns(ts) AS cts, event_id AS cid
            |  FROM events WHERE event_type = 'purchase'),
            |ap_touch AS (
            |  SELECT user_id, event_type AS channel,
            |         epoch_ns(ts) AS tts, event_id AS tid
            |  FROM events WHERE event_type IN ('view', 'click')),
            |ap_j AS (
            |  SELECT c.user_id, c.cid, t.channel, t.tts, t.tid
            |  FROM ap_conv c LEFT JOIN ap_touch t
            |    ON t.user_id = c.user_id AND t.tts < c.cts
            |   AND c.cts - t.tts <= ${7L * 86400 * 1000 * 1000 * 1000}),
            |ap_r AS (
            |  SELECT *, count(*) OVER (PARTITION BY user_id, cid) AS n,
            |         row_number() OVER (PARTITION BY user_id, cid
            |                            ORDER BY tts, tid) AS rn
            |  FROM ap_j),
            |ap_c AS (
            |  SELECT coalesce(channel, '(direct)') AS channel,
            |         CASE WHEN tts IS NULL THEN 1000000
            |              WHEN n = 1 THEN 1000000
            |              WHEN n = 2 THEN 500000
            |              WHEN rn = 1 OR rn = n THEN 400000
            |              ELSE 200000 // (n - 2)
            |                   + (CASE WHEN n - rn <= 200000 % (n - 2)
            |                      THEN 1 ELSE 0 END)
            |         END AS credit_ppm
            |  FROM ap_r)
            |SELECT channel, CAST(count(*) AS BIGINT) AS n_touchpoints,
            |       CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_total
            |FROM ap_c GROUP BY 1
            |ORDER BY channel""".stripMargin),
  )

  // STATIONARY DISTRIBUTION of the user-journey Markov chain — the
  // fixed point ev_markov_transitions only tabulates: three power
  // iterations of π·P in integer micro-units (πᵗ⁺¹(j) = Σᵢ πᵗ(i)·
  // p_ij div 10⁶, truncation per term — exact and replayable, where a
  // float iteration could never hash-gate). The corpus work is ONE
  // lag-window transition count; the iteration runs on the
  // checkpointed ≤ |types|²-row matrix, so iteration cost is
  // corpus-free. Each step is replayed verbatim by an unrolled oracle
  // CTE.
  private val MarkovIters = 3
  private val markovStationary = Q(
    "ev_markov_stationary",
    (s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val matrix = Tables.events(s, d)
        .withColumn("to_type", lead($"event_type", 1).over(byUser))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // ≤ |types|² rows; feeds margins + 3 steps
      val p = matrix
        .join(broadcast(matrix.groupBy($"from_type").agg(sum($"cnt").as("n_from"))),
          Seq("from_type"))
        .select($"from_type", $"to_type",
          expr("1000000 * cnt div n_from").as("p_e6"))
        .localCheckpoint()
      val states = p.select($"from_type".as("state")).distinct()
      val k = states.count()
      // Degenerate corpus (no user has two consecutive events ⇒ no
      // transitions ⇒ k = 0): short-circuit to the empty frame the
      // oracle's empty CTE chain produces instead of throwing
      // ArithmeticException on the driver-side 1000000 / 0.
      if (k == 0) {
        states.select($"state".as("event_type"), lit(0L).as("pi_e6"))
      } else {
        var pi = states.select($"state", lit(1000000L / k).as("pi_e6"))
        for (_ <- 1 to MarkovIters) {
          pi = p.join(pi, $"from_type" === $"state")
            .groupBy($"to_type")
            .agg(sum(expr("pi_e6 * p_e6 div 1000000")).as("pi_e6"))
            .select($"to_type".as("state"), $"pi_e6")
        }
        pi.select($"state".as("event_type"), $"pi_e6").orderBy($"event_type")
      }
    },
    Some {
      val steps = (1 to MarkovIters).map { i =>
        s"""mks_r$i AS (
           |  SELECT p.to_type AS state,
           |         CAST(sum(r.pi_e6 * p.p_e6 // 1000000) AS BIGINT) AS pi_e6
           |  FROM mks_p p JOIN mks_r${i - 1} r ON p.from_type = r.state
           |  GROUP BY 1)"""
      }.mkString(",\n")
      s"""WITH mks_t AS (
         |  SELECT event_type AS from_type,
         |         lead(event_type) OVER (PARTITION BY user_id
         |                                ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |mks_m AS (
         |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
         |  FROM mks_t WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |mks_p AS (
         |  SELECT from_type, to_type,
         |         1000000 * cnt
         |           // CAST(sum(cnt) OVER (PARTITION BY from_type) AS BIGINT)
         |           AS p_e6
         |  FROM mks_m),
         |mks_r0 AS (
         |  SELECT from_type AS state,
         |         CAST(1000000 // (SELECT count(DISTINCT from_type) FROM mks_m)
         |              AS BIGINT) AS pi_e6
         |  FROM (SELECT DISTINCT from_type FROM mks_m)),
         |$steps
         |SELECT state AS event_type, pi_e6 FROM mks_r$MarkovIters
         |ORDER BY event_type""".stripMargin
    },
  )

  // INTER-EVENT-TIME QUANTILES — the latency/engagement staple: per
  // event type, the p50/p90/p99 of the gaps between a user's
  // CONSECUTIVE events of that type. The gap derivation is one
  // (user, type)-partitioned lag window (per-entity bounded, the
  // sessionize shape); the per-type quantiles are the exact
  // order-statistic pattern of qa_quantile_disc (its bounded-memory
  // histogram dual exists there too). Gaps are integer milliseconds
  // from the epoch-nanos ts — no float anywhere.
  private val interEventQuantiles = Q(
    "ev_inter_event_quantiles",
    (s, d) => {
      import s.implicits._
      val byUserType = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts", $"event_id")
      val gaps = Tables.events(s, d)
        .withColumn("prev_ts", lag($"ts", 1).over(byUserType))
        .filter($"prev_ts".isNotNull)
        .select($"event_type", $"user_id", $"event_id",
          expr("(ts - prev_ts) div 1000000").as("gap_ms"))
      val w = Window.partitionBy($"event_type")
      val byGap = w.orderBy($"gap_ms", $"user_id", $"event_id")
      gaps
        .withColumn("rn", row_number().over(byGap))
        .withColumn("n", count(lit(1)).over(w))
        .groupBy($"event_type")
        .agg(
          max($"n").as("n_gaps"),
          max(when($"rn" === expr("(n * 50 + 99) div 100"), $"gap_ms")).as("p50_ms"),
          max(when($"rn" === expr("(n * 90 + 99) div 100"), $"gap_ms")).as("p90_ms"),
          max(when($"rn" === expr("(n * 99 + 99) div 100"), $"gap_ms")).as("p99_ms"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type,
           |       CAST(max(n) AS BIGINT) AS n_gaps,
           |       max(CASE WHEN rn = (n * 50 + 99) // 100 THEN gap_ms END) AS p50_ms,
           |       max(CASE WHEN rn = (n * 90 + 99) // 100 THEN gap_ms END) AS p90_ms,
           |       max(CASE WHEN rn = (n * 99 + 99) // 100 THEN gap_ms END) AS p99_ms
           |FROM (
           |  SELECT event_type, gap_ms,
           |         row_number() OVER (PARTITION BY event_type
           |           ORDER BY gap_ms, user_id, event_id) AS rn,
           |         count(*) OVER (PARTITION BY event_type) AS n
           |  FROM (
           |    SELECT event_type, user_id, event_id,
           |           (epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
           |              PARTITION BY user_id, event_type
           |              ORDER BY ts, event_id)) // 1000000 AS gap_ms
           |    FROM events)
           |  WHERE gap_ms IS NOT NULL)
           |GROUP BY event_type
           |ORDER BY event_type""".stripMargin),
  )

  // BURST DETECTION — the ops-alerting primitive: an (event_type,
  // hour) bucket bursts when its count exceeds 3× the mean of its
  // trailing 24 OBSERVED hourly buckets, with a 12-observed-bucket
  // minimum history so the first hours never alert. NOTE the
  // contract is observed buckets, not wall-clock hours: empty hours
  // emit no bucket row, so for sparse event types the baseline can
  // span far more than 24 wall-clock hours — deliberate here (the
  // baseline is "this type's recent typical ACTIVE hour", robust to
  // idle periods; a wall-clock variant would need gap-filled buckets
  // whose zero rows dilute the mean toward always-alerting on any
  // activity). The comparison is CROSS-MULTIPLIED (cnt·n_prev >
  // 3·sum_prev) so no mean is materialized and the predicate is
  // integer-exact on both engines. One (type, hour) partial agg on
  // the corpus; the trailing window runs over the ≤ types·hours
  // bucket artifact, partitioned by type — never whole-data.
  private val burstDetection = Q(
    "ev_burst_detection",
    (s, d) => {
      import s.implicits._
      val byHour = Tables.events(s, d)
        .groupBy($"event_type", expr(s"ts div $HourNs").as("hour_bucket"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy($"event_type").orderBy($"hour_bucket")
        .rowsBetween(-24, -1)
      byHour
        .withColumn("sum_prev", sum($"cnt").over(w))
        .withColumn("n_prev", count($"cnt").over(w))
        .filter($"n_prev" >= 12 && $"cnt" * $"n_prev" > $"sum_prev" * 3)
        .select($"event_type", $"hour_bucket", $"cnt", $"sum_prev", $"n_prev")
        .orderBy($"event_type", $"hour_bucket")
    },
    Some(s"""WITH bd_h AS (
            |  SELECT event_type, epoch_ns(ts) // $HourNs AS hour_bucket,
            |         CAST(count(*) AS BIGINT) AS cnt
            |  FROM events GROUP BY 1, 2),
            |bd_w AS (
            |  SELECT event_type, hour_bucket, cnt,
            |         CAST(sum(cnt) OVER (PARTITION BY event_type
            |           ORDER BY hour_bucket
            |           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
            |           AS BIGINT) AS sum_prev,
            |         CAST(count(cnt) OVER (PARTITION BY event_type
            |           ORDER BY hour_bucket
            |           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
            |           AS BIGINT) AS n_prev
            |  FROM bd_h)
            |SELECT event_type, hour_bucket, cnt, sum_prev, n_prev
            |FROM bd_w
            |WHERE n_prev >= 12 AND cnt * n_prev > sum_prev * 3
            |ORDER BY event_type, hour_bucket""".stripMargin),
  )

  // POINT-IN-TIME FEATURE JOIN (the feature-store / training-matrix
  // primitive): for every label event (purchase) build leakage-safe
  // features from the trailing 7-day window STRICTLY BEFORE the label
  // timestamp — last value and count per behaviour type. Unlike the
  // single-column as-of join this is the multi-feature fan-in shape:
  // one user-keyed band join (equi on user_id, ts-range as residual —
  // never a cross), one (label, type) window for "last", one
  // conditional agg for the pivot. Pair count is bounded by
  // per-user·window activity, the same per-entity bound the
  // sessionize family documents; values are integer cents so the
  // matrix hash-gates exactly.
  private val WeekNs = 7L * 86400 * 1000 * 1000 * 1000
  private val pitFeatures = Q(
    "ev_pit_features",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val labels = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("label_id"), $"ts".as("lts"))
      val feats = ev.filter($"event_type".isin("click", "view", "error"))
        .select($"user_id", $"event_type".as("ft"), $"ts".as("fts"),
          $"event_id".as("fid"), cents($"value").as("v"))
      val j = labels.join(feats, Seq("user_id"))
        .filter($"fts" < $"lts" && $"fts" >= $"lts" - WeekNs)
      val ranked = j.withColumn("rn", row_number().over(
        Window.partitionBy($"label_id", $"ft")
          .orderBy($"fts".desc, $"fid".desc)))
      val agg = ranked.groupBy($"label_id").agg(
        sum(when($"ft" === "click", 1L).otherwise(0L)).as("click_cnt"),
        sum(when($"ft" === "view", 1L).otherwise(0L)).as("view_cnt"),
        sum(when($"ft" === "error", 1L).otherwise(0L)).as("error_cnt"),
        max(when($"ft" === "click" && $"rn" === 1, $"v")).as("click_last"),
        max(when($"ft" === "view" && $"rn" === 1, $"v")).as("view_last"),
        max(when($"ft" === "error" && $"rn" === 1, $"v")).as("error_last"))
      labels.join(agg, Seq("label_id"), "left")
        .select($"user_id", $"label_id",
          coalesce($"click_cnt", lit(0L)).as("click_cnt"),
          coalesce($"click_last", lit(0L)).as("click_last_cents"),
          coalesce($"view_cnt", lit(0L)).as("view_cnt"),
          coalesce($"view_last", lit(0L)).as("view_last_cents"),
          coalesce($"error_cnt", lit(0L)).as("error_cnt"),
          coalesce($"error_last", lit(0L)).as("error_last_cents"))
        .orderBy($"label_id")
    },
    Some(s"""WITH pit_l AS (
            |  SELECT user_id, event_id AS label_id, epoch_ns(ts) AS lts
            |  FROM events WHERE event_type = 'purchase'),
            |pit_f AS (
            |  SELECT user_id, event_type AS ft, epoch_ns(ts) AS fts,
            |         event_id AS fid, ${centsSql("value")} AS v
            |  FROM events WHERE event_type IN ('click', 'view', 'error')),
            |pit_j AS (
            |  SELECT l.label_id, f.ft, f.fts, f.fid, f.v
            |  FROM pit_l l JOIN pit_f f
            |    ON l.user_id = f.user_id
            |   AND f.fts < l.lts AND f.fts >= l.lts - $WeekNs),
            |pit_r AS (
            |  SELECT label_id, ft, v,
            |         row_number() OVER (PARTITION BY label_id, ft
            |                            ORDER BY fts DESC, fid DESC) AS rn
            |  FROM pit_j),
            |pit_a AS (
            |  SELECT label_id,
            |         CAST(sum(CASE WHEN ft = 'click' THEN 1 ELSE 0 END)
            |              AS BIGINT) AS click_cnt,
            |         max(CASE WHEN ft = 'click' AND rn = 1 THEN v END)
            |           AS click_last,
            |         CAST(sum(CASE WHEN ft = 'view' THEN 1 ELSE 0 END)
            |              AS BIGINT) AS view_cnt,
            |         max(CASE WHEN ft = 'view' AND rn = 1 THEN v END)
            |           AS view_last,
            |         CAST(sum(CASE WHEN ft = 'error' THEN 1 ELSE 0 END)
            |              AS BIGINT) AS error_cnt,
            |         max(CASE WHEN ft = 'error' AND rn = 1 THEN v END)
            |           AS error_last
            |  FROM pit_r GROUP BY label_id)
            |SELECT l.user_id, l.label_id,
            |       CAST(coalesce(a.click_cnt, 0) AS BIGINT) AS click_cnt,
            |       CAST(coalesce(a.click_last, 0) AS BIGINT) AS click_last_cents,
            |       CAST(coalesce(a.view_cnt, 0) AS BIGINT) AS view_cnt,
            |       CAST(coalesce(a.view_last, 0) AS BIGINT) AS view_last_cents,
            |       CAST(coalesce(a.error_cnt, 0) AS BIGINT) AS error_cnt,
            |       CAST(coalesce(a.error_last, 0) AS BIGINT) AS error_last_cents
            |FROM pit_l l LEFT JOIN pit_a a ON l.label_id = a.label_id
            |ORDER BY l.label_id""".stripMargin),
  )

  // ATTRIBUTION-WINDOW SENSITIVITY — the sweep a marketing analyst
  // runs before trusting any attribution number: how many
  // (conversion, touch) pairs does each channel keep at a 1-day /
  // 3-day / 7-day lookback, and how many conversions still have ANY
  // in-window touch? One user-keyed pair join at the WIDEST window
  // (the same bounded per-user join as ev_attribution_linear — the
  // narrower windows are subsets, so the sweep is conditional sums
  // over one pass, the td_threshold_sweep discipline, never three
  // joins), then per-channel conditional counts plus a distinct-
  // conversion rollup per window. All counts integer-exact.
  private val attributionWindowSweep = Q(
    "ev_attribution_window_sweep",
    (s, d) => {
      import s.implicits._
      val DayNs = 86400L * 1000 * 1000 * 1000
      val conv = Tables.events(s, d).filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("cts"), $"event_id".as("cid"))
      val touch = Tables.events(s, d)
        .filter($"event_type".isin("view", "click"))
        .select($"user_id".as("tuid"), $"event_type".as("channel"),
          $"ts".as("tts"))
      conv.join(touch,
          $"user_id" === $"tuid" && $"tts" < $"cts" &&
            $"cts" - $"tts" <= 7 * DayNs)
        .select($"channel", $"user_id", $"cid", ($"cts" - $"tts").as("dt"))
        .groupBy($"channel")
        .agg(
          sum(when($"dt" <= DayNs, 1L).otherwise(0L)).as("pairs_1d"),
          sum(when($"dt" <= 3 * DayNs, 1L).otherwise(0L)).as("pairs_3d"),
          count(lit(1)).as("pairs_7d"),
          countDistinct(when($"dt" <= DayNs,
            concat($"user_id", lit(":"), $"cid"))).as("convs_1d"),
          countDistinct(when($"dt" <= 3 * DayNs,
            concat($"user_id", lit(":"), $"cid"))).as("convs_3d"),
          countDistinct(concat($"user_id", lit(":"), $"cid")).as("convs_7d"))
        .orderBy($"channel")
    },
    Some(s"""WITH aw_conv AS (
            |  SELECT user_id, epoch_ns(ts) AS cts, event_id AS cid
            |  FROM events WHERE event_type = 'purchase'),
            |aw_touch AS (
            |  SELECT user_id, event_type AS channel, epoch_ns(ts) AS tts
            |  FROM events WHERE event_type IN ('view', 'click')),
            |aw_p AS (
            |  SELECT t.channel, c.user_id, c.cid, c.cts - t.tts AS dt
            |  FROM aw_conv c JOIN aw_touch t
            |    ON t.user_id = c.user_id AND t.tts < c.cts
            |   AND c.cts - t.tts <= ${7L * 86400 * 1000 * 1000 * 1000})
            |SELECT channel,
            |       CAST(sum(CASE WHEN dt <= ${86400L * 1000 * 1000 * 1000}
            |                     THEN 1 ELSE 0 END) AS BIGINT) AS pairs_1d,
            |       CAST(sum(CASE WHEN dt <= ${3 * 86400L * 1000 * 1000 * 1000}
            |                     THEN 1 ELSE 0 END) AS BIGINT) AS pairs_3d,
            |       CAST(count(*) AS BIGINT) AS pairs_7d,
            |       CAST(count(DISTINCT CASE WHEN dt <= ${86400L * 1000 * 1000 * 1000}
            |                     THEN user_id || ':' || cid END) AS BIGINT)
            |         AS convs_1d,
            |       CAST(count(DISTINCT CASE WHEN dt <= ${3 * 86400L * 1000 * 1000 * 1000}
            |                     THEN user_id || ':' || cid END) AS BIGINT)
            |         AS convs_3d,
            |       CAST(count(DISTINCT user_id || ':' || cid) AS BIGINT)
            |         AS convs_7d
            |FROM aw_p GROUP BY channel
            |ORDER BY channel""".stripMargin),
  )

  // LATE-DATA / WATERMARK AUDIT — the accounting every
  // watermark-configured streaming job needs BEFORE picking its
  // delay: replay the stream in arrival order (event_id is the ingest
  // sequence), hold the watermark the engine would hold
  // (max event-time seen over all PRIOR arrivals, minus a 10-minute
  // allowed delay — Spark's withWatermark contract), and count per
  // event type how many events would have been dropped as late, plus
  // the worst lateness. The naive formulation is a GLOBAL running max
  // over arrival order — one partition sorting the whole stream, the
  // classic scale-killer. This implementation is the two-level
  // PREFIX-SCAN shape instead: bucket arrivals by event_id div 10k,
  // compute each event's prior-max WITHIN its bucket (parallel
  // windows, one per bucket), reduce buckets to per-bucket maxima
  // (tiny table), take the exclusive prefix max ACROSS buckets (a
  // window over |stream|/10k rows), and combine — prior events are
  // exactly (same bucket, smaller id) ∪ (earlier buckets), so
  // greatest(within, carry) IS the global running max. At 10^12
  // events the bucket table is 10^8 narrow rows; the same device
  // nests to three levels before that window is ever the bottleneck.
  // The oracle replays the NAIVE global window — two formulations,
  // one result, which is the point of the gate.
  private val lateDataAudit = Q(
    "ev_late_data_audit",
    (s, d) => {
      import s.implicits._
      val delayUs = 600L * 1000000
      val e = Tables.events(s, d)
        .select($"event_id", $"event_type",
          expr("ts div 1000").as("us"),
          expr("event_id div 10000").as("bucket"))
      val inBucket = Window.partitionBy($"bucket").orderBy($"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val overBuckets = Window.orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = e.groupBy($"bucket").agg(max($"us").as("bmax"))
        .select($"bucket", max($"bmax").over(overBuckets).as("carry"))
      e.withColumn("within", max($"us").over(inBucket))
        .join(broadcast(carry), Seq("bucket"))
        .select($"event_type", $"us",
          greatest(coalesce($"within", lit(Long.MinValue)),
            coalesce($"carry", lit(Long.MinValue))).as("prior_max"))
        .withColumn("late_us",
          when($"prior_max" =!= Long.MinValue &&
            $"prior_max" - delayUs > $"us",
            $"prior_max" - delayUs - $"us"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          count($"late_us").as("late_n"),
          coalesce(max($"late_us"), lit(0L)).as("max_late_us"))
        // integer div, not a double divide + cast: a quotient one ulp
        // under an integer would truncate differently than the
        // oracle's flooring //
        .select($"event_type", $"n", $"late_n",
          expr("late_n * 1000000 div n").as("late_ppm"), $"max_late_us")
        .orderBy($"event_type")
    },
    Some("""WITH e AS (
           |  SELECT event_id, event_type, epoch_ns(ts) // 1000 AS us
           |  FROM events),
           |p AS (
           |  SELECT event_type, us,
           |         max(us) OVER (ORDER BY event_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |           AS prior_max
           |  FROM e),
           |l AS (
           |  SELECT event_type, us,
           |         CASE WHEN prior_max - 600000000 > us
           |              THEN prior_max - 600000000 - us END AS late_us
           |  FROM p)
           |SELECT event_type, count(*) AS n,
           |       count(late_us) AS late_n,
           |       count(late_us) * 1000000 // count(*) AS late_ppm,
           |       CAST(coalesce(max(late_us), 0) AS BIGINT) AS max_late_us
           |FROM l
           |GROUP BY event_type
           |ORDER BY event_type""".stripMargin),
  )

  def all: Seq[Q] =
    Seq(tumbling, hopping, scd2, sessionize, funnel, asOf, variantJson,
      cdcMerge, cdcStreamParity, gapsIslands, gapFill,
      streamParity, hoppingStreamParity, sessionStreamParity,
      dedupStreamParity, dedupCrossBatch, streamStreamJoin,
      orderedFunnel, retention, ewmaSmooth, ewmaAnomaly, markovTransitions,
      rateLimit, cohortLtv, activeUsers, ivmMerge, attributionLinear,
      forecastBacktest, featureMatrix, topPaths, paretoConcentration,
      hazardCurve, dauWau, funnelTtc, rfmSegments, attributionPosition,
      pitFeatures, markovStationary, interEventQuantiles, burstDetection,
      attributionWindowSweep, lateDataAudit)
}
