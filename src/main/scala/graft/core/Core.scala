package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine operator: the Spark implementation plus (when the
  * semantics are SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver hash-compares against. Keys are the SURVEY.md §2 contract keys.
  */
final case class Q(
    key: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Table readers. One parquet dir per scale factor; tables are plain
  * parquet files so Spark's FileSourceScan gives us column pruning,
  * predicate pushdown into row groups, and split-level parallelism for
  * free — at 100 TB these become partitioned directory trees and the
  * same reader works unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-(session, path) memo of ANALYZED base relations. Creating a
    * DataFrame over a parquet path is not free: the driver lists the
    * directory and reads a footer to infer the schema EVERY
    * `spark.read.parquet` call (~30–100 ms each) — and the engine's
    * 400+ query functions each re-open their tables per invocation, so
    * a full bench pays that metadata cost hundreds of times over for
    * corpus dirs that are immutable for the life of the run (the same
    * immutability contract [[IndexCache]]'s fingerprint memo already
    * relies on). Memoizing the DataFrame reuses the resolved relation —
    * file listing + schema — exactly like registering the tables in a
    * catalog once (the guide's filesourcePartitionFileCacheSize point);
    * NO row data is cached, every query still scans parquet. Scratch
    * and per-test dirs (`graft-run-`/`graft-test-` — mutated mid-JVM by
    * design) are never memoized, so a re-staged test corpus can't be
    * served a stale file listing.
    *
    * Lifetime note (r15 ADVICE): entries are keyed by the session
    * OBJECT and never evicted, so a cached relation — and its owning
    * session — lives for the JVM. That is the intended economics for
    * the bench/verify mains (one session, cold JVM per run). A
    * long-lived host that churns through many sessions over the same
    * immutable paths would retain one DataFrame per (session, path);
    * entries for a STOPPED session are never served again unless the
    * same session object is reused after stop(), which Spark does not
    * do in this codebase (sessions here are created once per main or
    * per test suite and stopped at exit).
    */
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def mutableDir(dir: String): Boolean =
    dir.contains("graft-run-") || dir.contains("graft-test-")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureUtcConf(spark)
    val path = s"$dir/$name.parquet"
    if (mutableDir(dir)) spark.read.parquet(path)
    else relCache.computeIfAbsent((spark, path), _ => spark.read.parquet(path))
  }

  /** On-disk bytes of a table/archive path — recursive regular-file
    * walk (a partitioned/nested layout must sum its leaves, not the
    * directory inode sizes a flat listFiles() reports). Used to derive
    * size-proportional knobs (skew thresholds, trigger caps, shard
    * counts): a fixed byte constant that is right at one SF is wrong
    * at 100× — deriving from the archive keeps task counts and epoch
    * counts roughly scale-invariant.
    */
  def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(path))
  }

  /** Pin the session timezone to UTC — once, at every table front
    * door. The archive contract defines all time semantics in UTC
    * (SURVEY §1.3) and every DuckDB oracle reads the naive timestamps
    * as such, but Spark's timestamp display functions (year, to_date,
    * casts) read the SESSION timezone; an externally-built non-UTC
    * session would silently shift rows across date/filter boundaries
    * in every timestamp-touching twin. Same healing contract as the
    * nanos flag: write only when the value differs, never repeatedly.
    */
  private[graft] def ensureUtcConf(spark: SparkSession): Unit =
    if (spark.conf.get("spark.sql.session.timeZone") != "UTC") {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default (PARQUET_TYPE_ILLEGAL). We read it as a long of nanos
    * (legacy nanosAsLong) and derive `ms` = epoch milliseconds via
    * integer division (nanos ≈ 1.7e18 exceeds double's 2^53 mantissa, so
    * a float division would corrupt it). DuckDB truncates the same
    * column to µs; epoch_ms(ts) there equals `ms` here, which is the
    * only time representation verified queries may emit (SURVEY §1.3).
    *
    * The nanosAsLong flag is session-level and belongs in the session
    * builder (see [[Sessions.config]]). The driver contract, however,
    * may invoke query functions with an externally-built session
    * (SURVEY §1), so `ensureNanosConf` heals an unset flag exactly once
    * — it only writes when the value is absent/false, never repeatedly,
    * so concurrent queries cannot race on conflicting values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    ensureNanosConf(spark)
    // same analyzed-relation memo as [[t]] (the nanos heal above runs
    // before the first — schema-fixing — read of the session)
    val path = s"$dir/events.parquet"
    val raw =
      if (mutableDir(dir)) spark.read.parquet(path)
      else relCache.computeIfAbsent((spark, path), _ => spark.read.parquet(path))
    // UTC heal runs in the shared parquet front door ([[ensureUtcConf]]
    // via [[t]]); it covers msExpr's NTZ→LTZ cast on the
    // MICROS-generation schema too.
    raw.withColumn("ms", msExpr(raw.schema))
  }

  /** Epoch-millisecond expression for the archive's `ts` column, robust
    * to both generations of the events schema: parquet TIMESTAMP(NANOS)
    * read as a long of nanos (legacy nanosAsLong — see [[events]]) and
    * parquet TIMESTAMP(MICROS) read as TIMESTAMP_NTZ. The session
    * timezone is pinned to UTC ([[Sessions.config]]), so the NTZ
    * wall-clock IS the instant and the NTZ→LTZ cast is exact. Both
    * branches are integer-only (a float division of epoch nanos would
    * exceed double's 2^53 mantissa and corrupt low-order millis).
    * DuckDB's `epoch_ms(ts)` equals this in either generation, which is
    * the only time representation verified queries may emit (SURVEY
    * §1.3). Every `ts` consumer — batch or streaming — derives `ms`
    * through this one definition so a future schema change lands here.
    */
  def msExpr(schema: org.apache.spark.sql.types.StructType): Column =
    schema("ts").dataType match {
      // FLOOR division (pmod spelling), matching DuckDB's epoch_ms —
      // which floors — for pre-epoch timestamps; a bare `div` would
      // truncate a negative nanos/micros value one ms too high.
      case org.apache.spark.sql.types.LongType =>
        expr(Det.fdivExpr("ts", "1000000"))
      case _ =>
        expr(Det.fdivExpr("unix_micros(cast(ts as timestamp_ltz))", "1000"))
    }

  /** Memoized "archive has zero rows" probe for the empty-corpus
    * guards at the streaming front doors (~20 call sites, each a
    * LocalLimit(1) scan job per invocation). Same immutability
    * contract and mutable-dir escape as [[t]]'s relation memo.
    */
  private val emptyCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Boolean]()

  def eventsEmpty(spark: SparkSession, dir: String): Boolean =
    if (mutableDir(dir)) events(spark, dir).isEmpty
    else emptyCache.computeIfAbsent((spark, dir),
      _ => Boolean.box(events(spark, dir).isEmpty))

  /** Heal the nanos-timestamp read conf (see [[events]]). Public within
    * the engine so streaming front doors that read the events parquet
    * directly (Replay, StreamJoin, StatefulSessions) can heal an
    * externally-built session before their first raw read.
    */
  private[graft] def ensureNanosConf(spark: SparkSession): Unit = {
    // every caller that needs the nanos heal is also a time consumer —
    // heal the session timezone at the same door
    ensureUtcConf(spark)
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
  }

  /** FileStreamSource wants a directory or a glob; brace-globbing the
    * file name streams a single archive file with its parent as base.
    * A directory path passes through unchanged in effect (its last
    * segment braces to itself). Hadoop glob metacharacters in the file
    * name — including the comma, which is an ALTERNATION SEPARATOR
    * inside braces and would silently match the wrong files (zero-row
    * "successful" replay) — are backslash-escaped first. One definition
    * for every streaming front door.
    */
  private def splitLast(path: String): (String, String) = {
    val slash = path.lastIndexOf('/')
    (path.substring(0, slash + 1), path.substring(slash + 1))
  }

  private def escapeName(name: String): String =
    name.replaceAll("([\\\\*?\\[\\]{}^!,])", "\\\\$1")

  /** Escape Hadoop glob metacharacters in the final path segment —
    * Spark's BATCH readers also glob their paths, so a literal
    * `[v1]`-style file name needs this before any `spark.read`.
    */
  private[graft] def escapeGlob(path: String): String = {
    val (dir, name) = splitLast(path)
    dir + escapeName(name)
  }

  private[graft] def srcGlob(path: String): String = {
    val (dir, name) = splitLast(path)
    s"$dir{${escapeName(name)}}"
  }
}

/** THE gzip-NDJSON archive record (the reference's native wire format):
  * one definition shared by the batch scan (`scan_text_gz`), the
  * streaming replay front door (`Replay.replayTextGz`) and the archive
  * staging writers — so the schema the archive is WRITTEN with and the
  * schema it is PARSED with can never drift apart (a drifted field would
  * silently null out under PERMISSIVE from_json).
  */
object Ndjson {
  import org.apache.spark.sql.types._

  /** The archive record fields, in wire order. `props` stays a raw JSON
    * string (JSON-in-JSON, parsed on demand downstream).
    */
  val fields: Seq[StructField] = Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("ms", LongType), StructField("props", StringType))

  /** Parse schema for clean lines. */
  val recordSchema: StructType = StructType(fields)

  /** Parse schema with the declared corrupt-record column (PERMISSIVE
    * from_json never yields a null struct — malformed lines surface ONLY
    * through this column).
    */
  val corruptColumn = "_corrupt"
  val corruptSchema: StructType =
    StructType(fields :+ StructField(corruptColumn, StringType))

  /** Stage the events table as a gzip NDJSON archive (content
    * deterministically derived from the parquet archive) and return the
    * directory. Keeps Spark's source partitioning: N part files ⇒ N
    * parallel decompress tasks downstream (.gz is not splittable — the
    * reference's one-reader-per-file model).
    *
    * Cached per (label, source dir) per JVM: the archive is FIXTURE —
    * the staged bytes are a pure function of the source — so the batch
    * scan and the streaming replay that read the same label share one
    * staging write instead of re-encoding the corpus each. A caller
    * that intends to MUTATE its copy (the corrupt-archive test) uses
    * its own label and stays isolated.
    */
  /** Target shard count for the staged gz layout: .gz is not
    * splittable, so the DECODE parallelism of every later scan/replay
    * is exactly the file count — a one-file source archive (the sf0.1
    * fixture) would serialize 60k decompress+parse rows through one
    * task. Hash-partitioned on event_id (deterministic file contents,
    * unlike round-robin), capped so tiny archives don't fragment; a
    * 100 TB stager sizes this to target-MB-per-file the same way.
    */
  private val GzStageShards = 8

  def stageGz(spark: SparkSession, dir: String, label: String,
      durable: Boolean = true): String =
    IndexCache.dir(s"$label|$dir", durable = durable) {
      val out = TmpDirs.dir(label)
      Tables.events(spark, dir)
        .repartition(GzStageShards, col("event_id"))
        .select(to_json(struct(fields.map(f => col(f.name)): _*)).as("value"))
        .write.mode("overwrite").option("compression", "gzip").text(out)
      out
    }
}

/** All scratch space (streaming sinks, checkpoints, state dirs) lives
  * under ONE per-JVM root that a shutdown hook removes — repeated
  * Verify/Bench runs leave no orphaned /tmp/graft-* dirs. Dirs are
  * deleted at exit, not per query, because a replayed sink outlives the
  * query function that created it (the returned DataFrame may still be
  * consumed by the caller).
  */
object TmpDirs {
  /** Scratch medium selection: prefer a memory-backed filesystem
    * (`/dev/shm`, tmpfs) when it exists with comfortable headroom,
    * else the JVM default tmpdir. Scratch here is checkpoints, staged
    * archives, and replay sinks — all reaped at JVM exit — and every
    * streaming micro-batch pays offset-log/state/commit fsyncs into
    * it, so a disk-backed /tmp (ext4 on this box) charges rotational
    * latency to per-batch fixed cost that a real deployment would put
    * on fast local NVMe or object storage. Overridable
    * (SPARK_GRAFT_TMP) for boxes where /dev/shm is small or shared;
    * the 16 GiB floor keeps a loaded tmpfs from being picked over a
    * roomy disk.
    */
  private def scratchBase: java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val floor = 16L << 30
    val envTmp = sys.env.get("SPARK_GRAFT_TMP").map(Paths.get(_))
    // an override pointing nowhere must fail LOUDLY, not silently land
    // scratch on tmpfs — the operator asked for a specific medium
    envTmp.filterNot(Files.isDirectory(_)).foreach { p =>
      System.err.println(s"[graft] WARN: SPARK_GRAFT_TMP='$p' is not a " +
        "directory; ignoring the override (scratch falls back to " +
        "/dev/shm or java.io.tmpdir)")
    }
    envTmp.filter(Files.isDirectory(_))
      .orElse(Some(Paths.get("/dev/shm")).filter { p =>
        try Files.isDirectory(p) && Files.isWritable(p) &&
          Files.getFileStore(p).getUsableSpace > floor
        catch { case _: Throwable => false }
      })
      .getOrElse(Paths.get(System.getProperty("java.io.tmpdir")))
  }

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(scratchBase, "graft-run-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmrf(p)))
    p
  }

  /** Once the chosen medium drops below this headroom, NEW scratch dirs
    * land on the disk-backed JVM tmpdir instead — the one-time medium
    * pick is re-validated per allocation, so a long run of staged
    * archives degrades to disk instead of exhausting a RAM-backed
    * tmpfs mid-run (ENOSPC / OOM-killer). Checked per [[dir]] call —
    * one statfs syscall against parquet-write costs.
    */
  private val LowWater = 4L << 30

  private lazy val diskRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")), "graft-run-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmrf(p)))
    p
  }

  private val pressureWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** A fresh scratch directory `<root>/<prefix>-<n>` — or under the
    * disk-backed fallback root when the scratch medium is under
    * pressure (see [[LowWater]]).
    */
  def dir(prefix: String): String = {
    val base = try {
      if (java.nio.file.Files.getFileStore(root).getUsableSpace < LowWater &&
          !root.startsWith(diskRoot.getParent)) {
        if (pressureWarned.compareAndSet(false, true)) {
          System.err.println(s"[graft] WARN: scratch medium '$root' below " +
            s"${LowWater >> 30} GiB headroom; new scratch dirs fall back " +
            s"to '${diskRoot.getParent}'")
        }
        diskRoot
      } else root
    } catch { case _: Throwable => root }
    java.nio.file.Files.createTempDirectory(base, prefix + "-").toString
  }

  /** A STABLE scratch directory `<root>/<name>` — the same path every
    * call with the same name (unlike [[dir]]): the warehouse-location
    * model for PERSISTED index artifacts, where a later job must be
    * able to find the table again by name. Still reaped at JVM exit.
    */
  def stable(name: String): String = {
    val p = root.resolve(name)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Best-effort recursive delete for non-root scratch (the
    * IndexCache's losing concurrent store write).
    */
  private[core] def rmrfPath(p: java.nio.file.Path): Unit = rmrf(p)

  /** Recreate `src`'s tree under `dst` via HARDLINKS (fall back to a
    * byte copy per file when the filesystems differ or linking is
    * unsupported). Parquet part files are immutable once written, so a
    * linked base is safe to share; the use case is copy-on-first-use
    * staging (index_append): a fresh writable view of a pristine
    * store artifact per invocation without re-writing its bytes.
    */
  private[graft] def linkOrCopyTree(src: String, dst: String): Unit = {
    import java.nio.file._
    import java.nio.file.attribute.BasicFileAttributes
    val (s, t) = (Paths.get(src), Paths.get(dst))
    Files.createDirectories(t)
    Files.walkFileTree(s, new SimpleFileVisitor[Path] {
      override def preVisitDirectory(d: Path, a: BasicFileAttributes) = {
        Files.createDirectories(t.resolve(s.relativize(d)))
        FileVisitResult.CONTINUE
      }
      override def visitFile(f: Path, a: BasicFileAttributes) = {
        val out = t.resolve(s.relativize(f))
        try Files.createLink(out, f)
        catch { case _: Throwable =>
          Files.copy(f, out, StandardCopyOption.REPLACE_EXISTING) }
        FileVisitResult.CONTINUE
      }
    })
  }

  private def rmrf(p: java.nio.file.Path): Unit = {
    import java.nio.file._
    import java.nio.file.attribute.BasicFileAttributes
    if (Files.exists(p)) Files.walkFileTree(p, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path, a: BasicFileAttributes) = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      override def postVisitDirectory(d: Path, e: java.io.IOException) = {
        Files.deleteIfExists(d); FileVisitResult.CONTINUE
      }
    })
  }
}

/** Eagerly materialize a small derived relation to scratch parquet and
  * read it back. This is cross-branch reuse WITHOUT `persist()`: Catalyst
  * has no cross-branch subtree sharing, so a self-join recomputes its
  * input twice — but caching leaks entries into the caller's session
  * (the driver contract allows an externally built session that invokes
  * many queries, where per-query `persist` without a safe unpersist
  * point accumulates). A scratch-parquet round trip has the same reuse
  * effect, costs one small write, and cleans itself up via [[TmpDirs]].
  * At real scale the materialized signature/band table is the artifact
  * you'd persist to storage once anyway.
  */
object Mat {
  def apply(s: SparkSession, df: DataFrame, name: String): DataFrame = {
    val p = TmpDirs.dir(name)
    df.write.mode("overwrite").parquet(p)
    s.read.parquet(p)
  }

  /** Archive-size threshold below which a SUB-CORPUS derived relation
    * (distinct users, edge lists, vocabulary ledgers) may materialize
    * as an executor-local eager checkpoint instead of a parquet spill.
    * localCheckpoint storage is non-replicated — an executor loss after
    * the cut has no recompute path — so above the gate the
    * fault-tolerant [[Mat]] spelling is used (r15 VERDICT ask #9).
    */
  private val LocalCheckpointMaxArchiveBytes = 2L << 30

  /** Materialize a derived relation that several plan branches consume:
    * eager localCheckpoint on small archives (no parquet round trip),
    * scratch-parquet spill above the gate. The gate reads directory
    * bytes — no extra job — like every other size-derived knob.
    */
  def gated(s: SparkSession, df: DataFrame, name: String, archive: String): DataFrame =
    if (Tables.dirBytes(archive) <= LocalCheckpointMaxArchiveBytes)
      df.localCheckpoint(true)
    else apply(s, df, name)
}

/** Per-JVM cache of DERIVED INDEX ARTIFACTS — materialized relations
  * that are pure deterministic functions of an (immutable) archive dir:
  * LSH signature tables, IVF quantized components and trained
  * assignments. Production economics are build-once/query-many: an
  * index is built when the corpus lands and amortized over every query
  * after, so recomputing it inside each of the several operators that
  * share it (the ANN family + its recall gate) mis-charges the build
  * N×. The FIRST caller builds and pays (the cost stays visible in
  * that operator's bench timing); later callers read the materialized
  * parquet. Keys embed the source dir (plus any index parameters), so
  * distinct corpora — including per-test staged dirs — never collide;
  * storage lives in [[TmpDirs]] and is reaped at JVM exit. Results are
  * bit-identical with or without a hit (the build is deterministic),
  * which is why Verify's hash gate is unaffected.
  */
object IndexCache {
  private val paths = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** CROSS-JVM durable layer under the (per-JVM) in-memory map: index
    * artifacts whose key names an IMMUTABLE corpus directory persist
    * to a content-keyed store under the system tmpdir and RELOAD in
    * later JVMs instead of rebuilding — the production economics
    * (an index is built when the corpus lands, then every job opens
    * it by name) applied across process boundaries, which is exactly
    * what a cold `Bench` run is. Keys embedding a per-JVM scratch
    * fixture dir (`graft-run-`) or a per-test staged dir
    * (`graft-test-`) stay session-local: those corpora die with the
    * JVM, so persisting their artifacts would only grow the store
    * with unreachable entries (and every scalatest JVM stages dozens).
    *
    * [[IndexStoreVersion]] salts the content key: any round that
    * changes an artifact's SEMANTICS (training rule, layout, encoding)
    * must bump it, or a stale store would serve old artifacts — the
    * DuckDB hash gate would catch the drift, but the bump makes it
    * structurally impossible. The key ALSO folds in a fingerprint of
    * the corpus directory it names (sorted file names + sizes +
    * mtimes), so regenerated data at the same path — a testdata
    * refresh between rounds, a user re-pointing a dir — can never be
    * served a stale index trained on the old bytes: only Verify runs
    * behind the DuckDB hash gate; Bench and the scale-proof suite
    * would otherwise record wrong numbers silently. Writes go to a
    * pid-suffixed temp dir then move atomically into place; a
    * concurrent loser deletes its copy and reads the winner's.
    */
  private[graft] val IndexStoreVersion = "v15-fprint"

  /** Entries older than this are reaped at store open: test-JVM
    * leftovers and superseded versions would otherwise accumulate on
    * the RAM-backed tmpfs until reboot.
    */
  private val StoreTtlMillis = 3L * 24 * 3600 * 1000

  /** Soft size cap: when the store exceeds this at open, oldest
    * entries are evicted (hits refresh an entry's mtime, so eviction
    * is LRU-ish). Sized well under the 16 GiB medium floor so the
    * store can never be the thing that pushes scratch to disk.
    */
  private val StoreCapBytes = 12L << 30

  /** Cap eviction never touches an entry whose mtime is inside this
    * window (hits refresh mtime): a concurrently running JVM may still
    * hold its path in the per-JVM cache and read it again mid-run.
    */
  private val EvictSafetyMillis = 2L * 3600 * 1000

  /** The store lives on the same medium policy as scratch — a
    * RAM-backed tmpfs when one has headroom — but OUTSIDE the reaped
    * per-JVM root: tmpfs files persist across process exits (only a
    * reboot clears them), and serving index artifacts from disk was
    * measured to double iterative consumers' times at sf1 (every
    * bfs/kcore/hits iteration re-reads its edge artifact). Falls back
    * to the JVM tmpdir when no roomy tmpfs exists.
    *
    * The root is PER-USER (`graft-index-store-<user>`, 0700 where the
    * filesystem supports POSIX permissions) and ownership-checked
    * before trust: a world-shared fixed path on a multi-user box would
    * let another account pre-populate digest dirs and serve arbitrary
    * parquet as a trusted index artifact. A pre-existing root owned by
    * someone else is NOT used — the store degrades to session-local
    * (durable lookups disabled) rather than read an untrusted cache.
    */
  private lazy val storeRoot: Option[java.nio.file.Path] = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.PosixFilePermissions
    val floor = 16L << 30
    val base = Some(Paths.get("/dev/shm")).filter { p =>
      try Files.isDirectory(p) && Files.isWritable(p) &&
        Files.getFileStore(p).getUsableSpace > floor
      catch { case _: Throwable => false }
    }.getOrElse(Paths.get(System.getProperty("java.io.tmpdir")))
    val user = sys.props.getOrElse("user.name", "unknown")
    val p = base.resolve(s"graft-index-store-$user")
    try {
      if (!Files.exists(p)) {
        try Files.createDirectories(p,
          PosixFilePermissions.asFileAttribute(
            PosixFilePermissions.fromString("rwx------")))
        catch { case _: UnsupportedOperationException =>
          Files.createDirectories(p) }
      }
      val owner = Files.getOwner(p).getName
      if (owner != user) {
        System.err.println(s"[graft] WARN: index store '$p' is owned by " +
          s"'$owner', not '$user'; durable index store DISABLED for this JVM")
        None
      } else { sweep(p); Some(p) }
    } catch { case t: Throwable =>
      System.err.println(s"[graft] WARN: index store unavailable ($t); " +
        "durable index store disabled for this JVM")
      None
    }
  }

  /** Open-time reclamation: torn pid-suffixed temps from crashed JVMs
    * (> 6 h old), entries past [[StoreTtlMillis]], the legacy
    * world-shared `graft-index-store` root from earlier versions, and
    * — if the store still exceeds [[StoreCapBytes]] — oldest entries
    * first until under cap. All deletions are of pure caches (every
    * entry is a deterministic function of its key), so the worst case
    * of an over-eager sweep is a rebuild.
    */
  private def sweep(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val now = System.currentTimeMillis()
    try {
      val legacy = root.getParent.resolve("graft-index-store")
      if (Files.isDirectory(legacy) &&
          Files.getOwner(legacy).getName == sys.props.getOrElse("user.name", ""))
        TmpDirs.rmrfPath(legacy)
    } catch { case _: Throwable => () }
    try {
      def listed(p: java.nio.file.Path): List[java.nio.file.Path] = {
        val st = Files.list(p)
        try st.iterator().asScala.toList finally st.close()
      }
      val entries = listed(root)
      def mtime(p: java.nio.file.Path): Long =
        try Files.getLastModifiedTime(p).toMillis catch { case _: Throwable => 0L }
      entries.foreach { e =>
        val name = e.getFileName.toString
        val age = now - mtime(e)
        if ((name.contains(".") && age > 6L * 3600 * 1000) || age > StoreTtlMillis)
          TmpDirs.rmrfPath(e)
      }
      def treeSize(p: java.nio.file.Path): Long =
        try {
          val st = Files.walk(p)
          try st.iterator().asScala
            .filter(Files.isRegularFile(_)).map(f =>
              try Files.size(f) catch { case _: Throwable => 0L }).sum
          finally st.close()
        } catch { case _: Throwable => 0L }
      // Cap eviction skips entries touched within the safety window: a
      // CONCURRENT JVM resolves a store path into its per-JVM cache at
      // first hit and may read it again much later in a long bench run —
      // evicting a just-refreshed entry from another process would turn
      // that JVM's next read into a mid-run failure (the read path also
      // self-heals by rebuilding, but not evicting live entries is the
      // cheaper half of the fix).
      val live = listed(root)
        .map(e => (e, mtime(e), treeSize(e))).sortBy(_._2)
      var total = live.map(_._3).sum
      live.iterator.takeWhile(_ => total > StoreCapBytes)
        .filter { case (_, mt, _) => now - mt > EvictSafetyMillis }
        .foreach { case (e, _, sz) =>
          System.err.println(s"[graft] index store over cap; evicting " +
            s"'${e.getFileName}' (${sz >> 20} MiB)")
          TmpDirs.rmrfPath(e); total -= sz
      }
    } catch { case _: Throwable => () }
  }

  /** Cheap content fingerprint of the corpus directory a key names —
    * the key convention is `label|params…|<dir>`, so the final
    * `|`-segment is probed as a path. Recursive (sorted) walk of file
    * names + sizes + mtimes, capped at 16384 entries (a corpus dir is
    * tables-of-parquet-parts, typically well under that); non-existent
    * or non-directory tails contribute an empty fingerprint, keeping
    * the digest a pure function of the key string as before.
    */
  private def corpusFingerprint(key: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val tail = key.substring(key.lastIndexOf('|') + 1)
    try {
      val p = Paths.get(tail)
      if (!Files.isDirectory(p)) ""
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val st = Files.walk(p)
        val all = try st.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map { f =>
            val (sz, mt) =
              try (Files.size(f), Files.getLastModifiedTime(f).toMillis)
              catch { case _: Throwable => (0L, 0L) }
            (p.relativize(f).toString, sz, mt)
          }.toSeq
        finally st.close()
        all.sortBy(_._1).take(16384).foreach { case (rel, sz, mt) =>
          md.update(s"$rel:$sz:$mt\n".getBytes("UTF-8"))
        }
        // totals over EVERY entry (uncapped): a corpus with >16384 files
        // regenerated only in later-sorted files still changes the key
        md.update((s"#n=${all.size}:bytes=${all.iterator.map(_._2).sum}" +
          s":maxmt=${if (all.isEmpty) 0L else all.iterator.map(_._3).max}\n")
          .getBytes("UTF-8"))
        md.digest().map("%02x".format(_)).mkString
      }
    } catch { case _: Throwable => "" }
  }

  /** Per-JVM memo of corpus fingerprints: a corpus dir is immutable for
    * the life of a run, and fingerprinting it per durable lookup would
    * charge a directory walk to every ANN-family key.
    */
  private val fprints = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Artifact-key prefixes excluded from the durable store for this
    * JVM (SPARK_GRAFT_STORE_BYPASS, comma-separated). Measurement
    * knob for scaling sweeps: a key whose work product IS a staged
    * artifact (sim_ann_recall's eval tables, assortativity's co-edge
    * rollup) must stage COLD in a sweep leg or its scaling law reads
    * a warm-store ~0 s and passes vacuously — bypassing the store for
    * exactly those prefixes keeps every other artifact warm (their
    * cost is subtracted per-key anyway) while the charged ones build
    * and land in `index_staging` where bench_ratio's --charge folds
    * them back into the key.
    */
  private lazy val bypassPrefixes: Seq[String] =
    sys.env.get("SPARK_GRAFT_STORE_BYPASS").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  private def durableDir(key: String): Option[java.nio.file.Path] =
    if (key.contains("graft-run-") || key.contains("graft-test-") ||
        bypassPrefixes.exists(key.startsWith)) None
    else storeRoot.map { root =>
      val tail = key.substring(key.lastIndexOf('|') + 1)
      val fp = fprints.computeIfAbsent(tail, _ => corpusFingerprint(key))
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$IndexStoreVersion|$key|$fp".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      root.resolve(dig)
    }

  /** Keys served from the cross-JVM store this JVM (vs built): Bench
    * emits this so a near-zero per-key time can be attributed to a
    * warm artifact instead of reading as a free operator.
    */
  private val storeHitKeys =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def storeHits: Set[String] = {
    import scala.jdk.CollectionConverters._
    storeHitKeys.asScala.toSet
  }

  /** Per-JVM ledger of cold-build costs (key → seconds). Bench reads
    * this between queries to move staging time OUT of whichever query
    * happened to be the family's first consumer and into a dedicated
    * `index_staging` metric — the build is amortized over every later
    * consumer in production, so charging it to one query's number
    * mis-grades that query.
    */
  private val stagedSecs = new java.util.concurrent.ConcurrentHashMap[String, Double]()

  def stagingLog: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    stagedSecs.asScala.toMap
  }

  /** NOT computeIfAbsent: an index build may itself stage a nested
    * index (co-edges builds on co-pairs), and a nested computeIfAbsent
    * on the same map throws "Recursive update". Double-checked
    * putIfAbsent is re-entrant; a concurrent duplicate build wastes
    * work but first-write-wins keeps every reader consistent.
    */
  def apply(s: SparkSession, key: String, build: => DataFrame): DataFrame =
    try applyOnce(s, key, build)
    catch { case t: Throwable =>
      // Self-heal against cross-JVM eviction: another process's
      // open-time sweep (TTL/cap) may rm-rf a store entry AFTER this
      // JVM resolved it into the per-JVM paths cache — a later
      // read.parquet of the evicted path then throws mid-run. Drop the
      // cached resolution and rebuild once (every entry is a pure
      // function of its key, so the worst case is the build cost).
      System.err.println(s"[graft] index '$key' read failed " +
        s"(${t.getClass.getSimpleName}); dropping cached path and rebuilding")
      paths.remove(key)
      applyOnce(s, key, build)
    }

  private def applyOnce(s: SparkSession, key: String, build: => DataFrame): DataFrame = {
    val cached = paths.get(key)
    val path = if (cached != null) cached else {
      val durable = durableDir(key)
      val hit = durable.filter(dp =>
        java.nio.file.Files.exists(dp.resolve("_SUCCESS")))
      val p = hit match {
        case Some(dp) =>
          // cross-JVM reload: the build is skipped entirely; no staging
          // cost is ledgered because none was paid. The hit is ledgered
          // (bench attribution) and refreshes the entry's mtime (LRU
          // eviction order in [[sweep]]).
          System.err.println(s"[graft] index '$key' reloaded from store")
          storeHitKeys.add(key)
          try java.nio.file.Files.setLastModifiedTime(dp,
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          catch { case _: Throwable => () }
          dp.toString
        case None =>
          val t0 = System.nanoTime()
          // Build into TmpDirs scratch FIRST (which has its own
          // low-water disk fallback), then migrate into the store —
          // an ENOSPC or any other IOException against a full store
          // medium degrades to serving the scratch copy instead of
          // failing the whole query, mirroring [[dir]]'s behavior.
          val sp = TmpDirs.dir("idx")
          build.write.mode("overwrite").parquet(sp)
          val out = durable match {
            case Some(dp) =>
              // copy into a pid-suffixed sibling, then one atomic move —
              // concurrent JVMs race benignly (loser reads the winner)
              val tmp = dp.resolveSibling(
                dp.getFileName.toString + "." + ProcessHandle.current().pid())
              try {
                copyTree(java.nio.file.Paths.get(sp), tmp)
                java.nio.file.Files.move(tmp, dp,
                  java.nio.file.StandardCopyOption.ATOMIC_MOVE)
                dp.toString
              } catch {
                case _: java.nio.file.FileAlreadyExistsException |
                    _: java.nio.file.AccessDeniedException |
                    _: java.nio.file.DirectoryNotEmptyException =>
                  TmpDirs.rmrfPath(tmp); dp.toString
                case _: java.io.IOException =>
                  TmpDirs.rmrfPath(tmp); sp // store unusable: serve the build
              }
            case None => sp
          }
          val secs = (System.nanoTime() - t0) / 1e9
          stagedSecs.put(key, secs)
          // staging cost is also visible inline for ad-hoc runs
          System.err.println(f"[graft] index '$key' staged in $secs%.2f s")
          out
      }
      val prev = paths.putIfAbsent(key, p)
      if (prev != null) prev else p
    }
    s.read.parquet(path)
  }

  /** PATH-valued artifacts — staged archive LAYOUTS (KPL frame files,
    * gzip NDJSON encodes, date-partitioned trees) rather than derived
    * relations. Same build-once/query-many economics and the same bench
    * attribution as the DataFrame overload: the staged bytes are a pure
    * function of the source dir, written once when the corpus lands,
    * then read by every scan/replay of that layout — so the cold write
    * belongs to `index_staging`, not to whichever query ran first.
    *
    * Same putIfAbsent re-entrancy rationale as [[apply]], with the same
    * trade: two CONCURRENT first callers both execute the (expensive
    * Spark write) build and the loser's directory is orphaned until
    * JVM-exit reaping — acceptable because builds are idempotent pure
    * functions of the key and suites stage disjoint archives; if
    * parallel suites ever contend on one archive, switch to a per-key
    * future map (ConcurrentHashMap[String, Future[String]]) rather
    * than computeIfAbsent (nested builds would deadlock it).
    */
  def dir(key: String, durable: Boolean = true)(build: => String): String = {
    val cached = paths.get(key)
    // re-validate a cached store resolution: another JVM's sweep may
    // have evicted the entry since it was first resolved — a missing
    // layout must re-stage, not hand consumers a dangling path
    if (cached != null &&
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(cached))) cached
    else {
      if (cached != null) {
        System.err.println(s"[graft] staged layout '$key' vanished " +
          "(cross-JVM eviction); re-staging")
        paths.remove(key, cached)
      }
      val durableP = if (durable) durableDir(key) else None
      val hit = durableP.filter(dp =>
        java.nio.file.Files.exists(dp.resolve("_GRAFT_STAGED")))
      val p = hit match {
        case Some(dp) =>
          System.err.println(s"[graft] index '$key' reloaded from store")
          storeHitKeys.add(key)
          try java.nio.file.Files.setLastModifiedTime(dp,
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          catch { case _: Throwable => () }
          dp.toString
        case None =>
          val t0 = System.nanoTime()
          val built = build
          val out = durableP match {
            case Some(dp) =>
              // migrate the built layout into the store (copy — the
              // build may sit on a different filesystem), marker last
              // so a torn copy never reads as staged, then one atomic
              // move into place
              val tmp = dp.resolveSibling(
                dp.getFileName.toString + "." + ProcessHandle.current().pid())
              try {
                copyTree(java.nio.file.Paths.get(built), tmp)
                java.nio.file.Files.createFile(tmp.resolve("_GRAFT_STAGED"))
                java.nio.file.Files.move(tmp, dp,
                  java.nio.file.StandardCopyOption.ATOMIC_MOVE)
                dp.toString
              } catch {
                case _: java.nio.file.FileAlreadyExistsException |
                    _: java.nio.file.AccessDeniedException |
                    _: java.nio.file.DirectoryNotEmptyException =>
                  TmpDirs.rmrfPath(tmp); dp.toString
                case _: java.io.IOException =>
                  TmpDirs.rmrfPath(tmp); built // store unusable: serve the build
              }
            case None => built
          }
          val secs = (System.nanoTime() - t0) / 1e9
          stagedSecs.put(key, secs)
          System.err.println(f"[graft] index '$key' staged in $secs%.2f s")
          out
      }
      val prev = paths.putIfAbsent(key, p)
      if (prev != null) prev else p
    }
  }

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file._
    import java.nio.file.attribute.BasicFileAttributes
    Files.createDirectories(dst)
    Files.walkFileTree(src, new SimpleFileVisitor[Path] {
      override def preVisitDirectory(d: Path, a: BasicFileAttributes) = {
        Files.createDirectories(dst.resolve(src.relativize(d)))
        FileVisitResult.CONTINUE
      }
      override def visitFile(f: Path, a: BasicFileAttributes) = {
        Files.copy(f, dst.resolve(src.relativize(f)),
          StandardCopyOption.REPLACE_EXISTING)
        FileVisitResult.CONTINUE
      }
    })
  }
}

/** Per-JVM streaming-query lifecycle counter. Every streaming key pays
  * a Spark-fixed per-query-lifetime cost (start/plan/checkpoint/stop —
  * measured 0.2–1.0 s per lifecycle by StreamCostProbe) that a
  * long-lived deployment pays once per query LIFETIME, not per drain.
  * Bench diffs this counter around each key so the emitted record can
  * split a streaming key's time into (lifecycle floor, operator share)
  * — the number to watch round-over-round is the operator share.
  */
object StreamMeter {
  private val n = new java.util.concurrent.atomic.AtomicLong()
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Register the counting listener once per session. */
  def ensure(s: SparkSession): Unit = if (registered.add(s)) {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    s.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = {
        n.incrementAndGet(); ()
      }
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
  }

  def lifecycles: Long = n.get()
}

/** Session-build configuration shared by Verify / Bench / tests so every
  * entry point constructs an identical engine session.
  */
object Sessions {
  /** Default state-store shard count for the engine's stateful streaming
    * queries (windowed agg, stream-stream join, flatMapGroupsWithState).
    *
    * A streaming query pins its state partitioning to
    * spark.sql.shuffle.partitions AT FIRST START (it is recorded in the
    * checkpoint), and every state partition is a live state-store
    * instance paying per-batch snapshot/fsync overhead — a stream-stream
    * join runs FOUR stores per partition. The engine's batch default
    * (one partition per core) is the wrong shape for streams: state
    * overhead scales with shard count, not data. This knob is a
    * deployment parameter — size it to sustained state volume (at 100 TB
    * you raise it into the hundreds so each store's keyspace fits in
    * executor memory). The default of 4 suits up to ~10^6 state keys —
    * the bench-SF families hold ≤10^3 (hour×type windows, user ids) and
    * the StreamCostProbe measures ~0.1–0.2 s of per-query store
    * overhead RECLAIMED per halving, so the run-to-completion shape
    * stops paying for shards its state never fills.
    */
  val StreamStateShards: Int = {
    // Validate here: a bare .toInt in object init would surface a typo'd
    // env var as an ExceptionInInitializerError on first Sessions access
    // (masking the cause), and 0/negative would fail every stateful
    // streaming query at runtime. Fall back loudly instead.
    val default = 4
    sys.env.get("SPARK_GRAFT_STREAM_SHARDS") match {
      case None => default
      case Some(raw) => raw.toIntOption.filter(_ > 0).getOrElse {
        System.err.println(
          s"[graft] WARN: SPARK_GRAFT_STREAM_SHARDS='$raw' is not a " +
            s"positive integer; using default $default")
        default
      }
    }
  }

  /** Run `body` with spark.sql.shuffle.partitions temporarily set to
    * `n`, restoring the caller's value after. The conf is read when a
    * STREAMING query starts, so wrapping start()..awaitTermination()
    * scopes the state shard count to that query. Relies on the engine's
    * single-threaded driver contract (SURVEY §1) — a concurrent batch
    * query in the same session would observe the narrowed value.
    */
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T =
    withConfs(s, "spark.sql.shuffle.partitions" -> n.toString)(body)

  /** Run `body` with session confs temporarily set, restoring (or
    * unsetting) each caller value after — the generalization of
    * [[withShufflePartitions]] for streaming-scoped knobs. Same
    * single-threaded-driver caveat.
    */
  def withConfs[T](s: SparkSession, kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** Scope for ONE engine streaming query: state shards narrowed to
    * [[StreamStateShards]] and — when `noDataBatch = false` — the
    * trailing no-data micro-batch disabled.
    *
    * Spark appends a zero-row micro-batch after the last data batch to
    * advance the watermark (noDataMicroBatches, default on). That batch
    * is pure fixed cost — a full state-store load/commit cycle across
    * every shard (measured ~0.3–0.5 s per stateful query at 8 shards on
    * this box) — and it changes the RESULT only for sinks whose final
    * rows are emitted BY the watermark advance:
    *
    *  - append-mode OUTER stream-stream joins (null rows emit when the
    *    watermark proves no match can arrive) and append-mode windowed
    *    aggs (windows finalize past the watermark) NEED it — those call
    *    sites pass `noDataBatch = true`;
    *  - complete-mode aggs re-emit the same full result, dedup sinks
    *    emit on arrival (the watermark only evicts state), Update-mode
    *    session folds emit summaries that are invariant to an interval
    *    merely closing (closed + open totals are what's emitted), and
    *    inner stream-stream joins emit matches immediately — for all of
    *    these the no-data batch is dead weight and is turned off.
    *
    * At 100 TB this knob is irrelevant (one batch's fixed cost amortizes
    * over a long-lived query); it matters exactly in the run-to-
    * completion AvailableNow shape Verify/Bench execute, where every
    * key pays query startup + each micro-batch as marginal cost.
    */
  /** Optional state-store provider override for A/B measurement
    * (`SPARK_GRAFT_STATE_PROVIDER=rocksdb`). Default stays the
    * HDFS-backed in-memory provider: for the AvailableNow
    * run-to-completion shape the engine's keys execute — tiny state,
    * 1–2 micro-batches, 4 shards — RocksDB pays native-instance spin-up
    * and snapshot zip/upload per shard per commit that the in-memory
    * provider never does (measured r16: no win, see
    * OPTIMIZATION_r16.md). The knob stays so a long-lived large-state
    * deployment (where RocksDB's off-heap state wins) can flip it
    * without a code change.
    */
  private val StateProviderConfs: Seq[(String, String)] =
    sys.env.get("SPARK_GRAFT_STATE_PROVIDER") match {
      case Some("rocksdb") => Seq(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
          "false")
      case _ => Nil
    }

  def streamScope[T](s: SparkSession, noDataBatch: Boolean = false)(body: => T): T =
    withConfs(s,
      Seq("spark.sql.shuffle.partitions" -> StreamStateShards.toString,
        "spark.sql.streaming.noDataMicroBatches.enabled" -> noDataBatch.toString)
        ++ StateProviderConfs: _*)(body)
  def config(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.withExtensions(new graft.plans.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // v2 commit algorithm renames task files inline instead of a
      // serial job-commit pass — matters for the replay sink's many
      // ≤500-record put-batch files.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
}

/** Determinism helpers (SURVEY.md §2.3). The driver hash-compares our
  * parquet dump against DuckDB, so every float that passed through an
  * order-dependent accumulation must be rounded the SAME way in both
  * engines. Two engine-agnostic tricks:
  *
  *  1. Money sums accumulate EXACTLY in decimal (Spark decimal sum and
  *     DuckDB decimal sum are both exact), then cast once to double —
  *     summation order can no longer matter.
  *  2. Rounding uses floor(x * 10^n + 0.5) / 10^n rather than round():
  *     Spark's round() goes through Java BigDecimal's shortest-repr
  *     while DuckDB rounds the scaled binary value — they disagree near
  *     .5 boundaries. floor/mul/add are IEEE-deterministic and identical
  *     in both engines.
  *
  * Known bound on the DOUBLE → DECIMAL cast itself (the `Dec`-typed
  * exact sums): Spark rounds the double's shortest decimal
  * representation (BigDecimal HALF_UP) while DuckDB rounds the scaled
  * binary value — inputs with ≥7 fractional decimal digits sitting at
  * a scale-6 .5 boundary can yield decimal operands 1e-6 apart before
  * any sum. The archive contract (SURVEY §1.3) pins value columns to
  * 2 decimals, where the boundary cannot arise; a >6-decimal source
  * would need to quantize to integers (round(x·10^k)) before casting,
  * as the cent-ledger operators already do.
  */
object Det {
  val Dec: DecimalType = DecimalType(20, 6)

  /** Deterministic half-up-ish rounding: identical bit pattern in any
    * IEEE-754 engine evaluating the same double.
    */
  def dround(c: Column, n: Int): Column = {
    val f = math.pow(10, n)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** Order-independent money sum, 2 decimals. */
  def moneySum(c: Column): Column =
    dround(sum(c.cast(Dec)).cast("double"), 2)

  /** Order-independent average (exact decimal sum / count), 4 decimals. */
  def moneyAvg(c: Column): Column =
    dround(sum(c.cast(Dec)).cast("double") / count(c), 4)

  /** FLOOR integer division as a SQL-expression string. Spark's `div`
    * truncates toward zero while the DuckDB oracles use `//` (floor),
    * so a negative dividend — e.g. a pre-epoch ms — lands one bucket
    * apart under a bare `div`. `x - pmod(x, k)` is always an exact
    * multiple of k, so the final `div` is exact floor division for
    * any sign of x (and of a column divisor k).
    */
  def fdivExpr(e: String, k: String): String =
    s"(($e) - pmod(($e), ($k))) div ($k)"
}

/** DuckDB-side spellings of the Det helpers, for oracle SQL strings. */
object OSql {
  def sround(e: String, n: Int): String =
    s"floor(($e) * 1e$n + 0.5) / 1e$n"

  def msum(e: String): String =
    sround(s"CAST(SUM(CAST($e AS DECIMAL(20,6))) AS DOUBLE)", 2)

  def mavg(e: String): String =
    sround(s"CAST(SUM(CAST($e AS DECIMAL(20,6))) AS DOUBLE) / count($e)", 4)
}
