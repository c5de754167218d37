package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Minimal lakehouse table format: versioned snapshots of parquet
  * file-groups with a JSON commit log — the capability slice the
  * reference platform gets from Hive Metastore + object storage
  * (reference: internal/controller/metastore.go manages the catalog,
  * minio.go the storage; tables live under DataHouseDir,
  * api/v1alpha1/ninecluster_types.go:29).
  *
  * Layout:
  * {{{
  *   <path>/_graft_log/v00000.json   // {"version":0,"action":"create","dirs":["d0"]}
  *   <path>/d0/part-*.parquet        // file group written by commit 0
  *   <path>/d1/...                   // appended by commit 1
  * }}}
  *
  * A version's snapshot is the union of its listed file-group dirs.
  * Append adds a dir; row-level DML (merge/delete/update/agg-merge) is
  * FILE-GROUP-GRANULAR copy-on-write: stats-sidecar pruning picks the
  * groups that can contain affected rows, only those are rewritten into
  * a new group, and untouched dirs ride the commit forward verbatim
  * (old groups stay for time travel). The commit point is an atomic
  * rename of the log JSON; on an object store this maps to a
  * conditional PUT. Readers resolve the latest committed version and
  * never see partial writes (snapshot isolation).
  *
  * Scale notes: metadata is O(commits), data files never move on
  * append; merge shuffles once on the key and rewrites only the groups
  * its key range intersects; compaction is the standard bin-pack
  * rewrite targeting ~128 MB files.
  *
  * Merge-on-read deletion vectors (`_dv/`, B46) need NO conditional
  * PUT on an object store: every DV file is written under a unique
  * name and only applies once the commit referencing it publishes —
  * write-once immutable objects, with the commit's own conditional
  * PUT as the sole synchronization point (losers' files are inert
  * orphans vacuumed later).
  */
object LakeTable {

  /** `cdcDir`: change-records dir under `_cdc/` published atomically
    * with the commit (None = commit produced no change records —
    * pre-enablement history, layout rewrites, pruned no-ops).
    */
  /** `txn`: (application id, application version) recorded with the
    * commit — the idempotent-write marker [[appendOnce]] checks.
    */
  final case class Commit(version: Long, action: String, dirs: Seq[String],
      cdcDir: Option[String] = None, ts: Long = 0L,
      txn: Option[(String, Long)] = None,
      dvFiles: Seq[String] = Nil)

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(path: String) = new Path(path, "_graft_log")

  // ---- log checkpointing (the Delta `_last_checkpoint` capability) ---
  //
  // Without a checkpoint, resolving the latest version LISTS the whole
  // log — O(commits) per read, a real metadata bottleneck once a
  // streaming upsert writer has committed 10⁵-10⁶ times. Every Nth
  // publish (and every vacuum) refreshes a single `_checkpoint.json`
  // hint; resolution then reads the hint and probes the ≤ N-commit
  // tail with existence checks — O(N), independent of table age. The
  // hint is advisory only: absent, torn, or pointing at a vacuumed
  // version, resolution falls back to the full listing, and a failed
  // hint write never fails a commit.

  private[graft] val CheckpointInterval = 10L

  /** Diagnostic/test hook: log-resolution cost in file-level ops — each
    * open and existence probe counts 1, a directory listing counts one
    * PER ENTRY (matching what object-store list paging actually costs).
    */
  private[graft] val logOps = new java.util.concurrent.atomic.LongAdder

  private def checkpointFile(path: String) = new Path(logDir(path), "_checkpoint.json")

  private def writeCheckpoint(spark: SparkSession, path: String, v: Long): Unit =
    try {
      val p = checkpointFile(path)
      val out = fsOf(spark, p).create(p, true)
      try out.write(s"""{"version":$v}""".getBytes(StandardCharsets.UTF_8))
      finally out.close()
    } catch { case _: java.io.IOException => () } // hint only

  private def checkpointVersion(spark: SparkSession, path: String): Option[Long] =
    try {
      val p = checkpointFile(path)
      val fs = fsOf(spark, p)
      logOps.increment()
      if (!fs.exists(p)) None
      else {
        logOps.increment()
        val in = fs.open(p)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong)
      }
    } catch { case _: Exception => None } // torn/corrupt hint → listing

  def currentVersion(spark: SparkSession, path: String): Option[Long] = {
    val ld = logDir(path)
    val fs = fsOf(spark, ld)
    val fromCheckpoint = checkpointVersion(spark, path).filter { v0 =>
      logOps.increment()
      fs.exists(commitFile(path, v0)) // stale-beyond-vacuum hint → listing
    }.map { v0 =>
      var v = v0
      while ({ logOps.increment(); fs.exists(commitFile(path, v + 1)) }) v += 1
      v
    }
    fromCheckpoint.orElse {
      if (!fs.exists(ld)) None
      else {
        val names = fs.listStatus(ld).map(_.getPath.getName)
        logOps.add(names.length.toLong)
        val vs = names
          .filter(n => n.startsWith("v") && n.endsWith(".json"))
          .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
        if (vs.isEmpty) None else Some(vs.max)
      }
    }
  }

  private def commitFile(path: String, v: Long) = new Path(logDir(path), f"v$v%05d.json")

  def readCommit(spark: SparkSession, path: String, version: Long): Commit = {
    val p = commitFile(path, version)
    val fs = fsOf(spark, p)
    logOps.increment()
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val ver = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(body).get.group(1).toLong
    val action = """"action"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(body).get.group(1)
    val dirs = """"dirs"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(body).get.group(1)
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    val cdc = """"cdc"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(body).map(_.group(1))
    val ts = """"ts"\s*:\s*(\d+)""".r.findFirstMatchIn(body)
      .map(_.group(1).toLong).getOrElse(0L)
    val txn = for {
      app <- """"txnApp"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(body).map(_.group(1))
      tv <- """"txnVer"\s*:\s*(-?\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong)
    } yield (app, tv)
    val dv = """"dv"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(body)
      .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
    Commit(ver, action, dirs, cdc, ts, txn, dv)
  }

  /** Read a commit iff its file exists; a MISSING file (below a
    * clone's base, or vacuumed past) → None. Any OTHER failure —
    * transient IO, throttling, a torn/corrupt body — rethrows:
    * callers that treat None as "this version references nothing"
    * (vacuum's keep-set, the CDC slice walk) would otherwise turn a
    * store hiccup into permanent deletion of live data.
    */
  private[graft] def readCommitOpt(spark: SparkSession, path: String,
      version: Long): Option[Commit] =
    try Some(readCommit(spark, path, version))
    catch { case _: java.io.FileNotFoundException => None }

  /** A committer lost the per-version claim: some other writer
    * published this version first. Retryable — the table simply moved;
    * rebase on the new head and try the next version. Subtype of
    * IllegalStateException so pre-existing handlers keep working.
    */
  final class CommitRaceLostException(msg: String) extends IllegalStateException(msg)

  /** Optimistic-concurrency abort: the operation read table state a
    * concurrent writer changed (or rebasing retries were exhausted),
    * and blindly re-publishing could lose or resurrect rows. The
    * caller should re-run the whole operation against the new
    * snapshot — the Delta ConcurrentModificationException contract.
    */
  final class ConcurrentWriteException(msg: String) extends IllegalStateException(msg)

  private[graft] def writeCommit(spark: SparkSession, path: String, c: Commit): Unit = {
    val target = commitFile(path, c.version)
    val tmp = new Path(logDir(path), s".tmp-v${c.version}-${java.util.UUID.randomUUID.toString.take(8)}.json")
    val fs = fsOf(spark, target)
    fs.mkdirs(logDir(path))
    val json = s"""{"version":${c.version},"action":"${c.action}",""" +
      s""""dirs":[${c.dirs.map(d => "\"" + d + "\"").mkString(",")}]""" +
      c.cdcDir.map(d => s""","cdc":"$d"""").getOrElse("") +
      c.txn.map { case (app, ver) =>
        s""","txnApp":"$app","txnVer":$ver""" }.getOrElse("") +
      (if (c.dvFiles.isEmpty) ""
       else s""","dv":[${c.dvFiles.map(d => "\"" + d + "\"").mkString(",")}]""") +
      s""","ts":${if (c.ts > 0) c.ts else System.currentTimeMillis()}}"""
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // Local-FS (and POSIX) rename silently REPLACES an existing target,
    // so rename alone is not exclusive: two racers at the same version
    // would both "succeed" and one commit would vanish. Claim the
    // version first with an exclusive create of a lock marker
    // (create(overwrite=false) throws if it exists) — on an object
    // store this maps to a conditional PUT (If-None-Match) of the
    // commit object itself. Content atomicity still comes from the
    // tmp→target rename; the "." prefix keeps markers out of the
    // version listing.
    val lock = new Path(logDir(path), f".claim-v${c.version}%05d")
    val claimed = tryExclusiveCreate(fs, lock)
    if (!claimed) {
      fs.delete(tmp, false)
      throw new CommitRaceLostException(s"commit v${c.version} lost the race for $target")
    }
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      // Distinguish "rename failed, nothing published" from "target
      // already exists": releasing the claim in the second case would
      // let a retrying committer re-claim and silently REPLACE the
      // published commit (local-FS rename overwrites) — the exact
      // double-publish the lock prevents. Keep the claim when the
      // target is live; release it only when the version is truly
      // unpublished so the next committer can retry.
      if (fs.exists(target))
        throw new IllegalStateException(
          s"commit v${c.version} already published at $target")
      fs.delete(lock, false)
      throw new IllegalStateException(s"commit v${c.version} rename failed for $target")
    }
    // Published. Refresh the resolution hint every Nth commit (the
    // winner does it — losers threw above).
    if (c.version > 0 && c.version % CheckpointInterval == 0)
      writeCheckpoint(spark, path, c.version)
  }

  /** One atomic exclusive create — the claim primitive both the commit
    * log and the table-meta CAS use. Hadoop's RawLocalFileSystem
    * implements create(overwrite=false) as a non-atomic
    * exists()-then-create, so two local racers could both "claim";
    * java.nio CREATE_NEW is a single atomic O_EXCL open — used
    * whenever the path is local. For a remote store,
    * fs.create(overwrite=false) stands in for the conditional PUT
    * (If-None-Match) the store would provide.
    */
  private def tryExclusiveCreate(fs: org.apache.hadoop.fs.FileSystem, lock: Path): Boolean = {
    val lockUri = fs.makeQualified(lock).toUri
    if (lockUri.getScheme == "file") {
      try { java.nio.file.Files.createFile(java.nio.file.Paths.get(lockUri.getPath)); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { fs.create(lock, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }

  /** Exclusive-create a claim file CARRYING an ownership token. The
    * token makes a non-atomic reclaim (delete-then-create) detectable:
    * the publisher re-reads the claim immediately before the meta
    * rename and aborts if another writer's token replaced its own.
    * On the local scheme the existence check (createFile) is atomic
    * and the token lands in a second write — a racer that steals the
    * claim in that gap makes the WRITE fail (no CREATE option), which
    * reports as not-owned: spurious loss is safe, silent double-own
    * is not.
    */
  private def tryExclusiveCreateToken(
      fs: org.apache.hadoop.fs.FileSystem, lock: Path, token: String): Boolean = {
    val lockUri = fs.makeQualified(lock).toUri
    if (lockUri.getScheme == "file") {
      try {
        val p = java.nio.file.Paths.get(lockUri.getPath)
        java.nio.file.Files.createFile(p)
        java.nio.file.Files.write(p, token.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException => false // claim stolen mid-write
      }
    } else {
      try {
        val out = fs.create(lock, false)
        try out.write(token.getBytes(StandardCharsets.UTF_8)) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  /** The token currently recorded in a claim file; None if unreadable
    * (deleted, or a tokenless claim from an in-flight racer).
    */
  private def claimToken(
      fs: org.apache.hadoop.fs.FileSystem, lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        if (n <= 0) None else Some(new String(buf, 0, n, StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  private def writeGroup(spark: SparkSession, path: String, v: Long, df: DataFrame,
      partitionBy: Seq[String]): String = {
    // Type normalization: a column arriving NARROWER than the table's
    // recorded type (an INT literal into a BIGINT column) up-casts
    // in-stream (codegen'd, lossless only) — storing the narrower
    // physical type would poison later mergeSchema reads with
    // CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE. First write (create) has
    // no schema to align to and passes through.
    val aligned =
      if (currentVersion(spark, path).isEmpty) df
      else {
        val t = tableSchema(spark, path)
        df.schema.fields.foldLeft(df) { case (d, f) =>
          t.fields.find(_.name.equalsIgnoreCase(f.name)) match {
            case Some(tf) if tf.dataType != f.dataType &&
                org.apache.spark.sql.catalyst.expressions.Cast
                  .canUpCast(f.dataType, tf.dataType) =>
              d.withColumn(f.name, col(f.name).cast(tf.dataType))
            case _ => d
          }
        }
      }
    // CHECK constraints guard every API-verb write in-stream: an
    // assert_true filter per constraint (codegen'd, no extra pass) —
    // the first violating row fails the job before anything commits.
    // SQL semantics: NULL passes (coalesce to true).
    val guarded = tableChecks(spark, path).foldLeft(aligned) { case (d, (n, sql)) =>
      import org.apache.spark.sql.functions.{assert_true, expr, lit}
      d.filter(assert_true(expr(s"coalesce(($sql), true)"),
        lit(s"CHECK constraint $n violated: $sql")).isNull)
    }
    // Optimize-write (Delta's optimizeWrite): a 100 TB table dies by a
    // thousand small files — every upstream task fragment becomes a
    // file, and metadata/open costs dominate reads long before data
    // does. With spark.graft.optimizeWrite.targetBytes set, the frame
    // is re-bucketed so each task writes ~one target-sized file: the
    // file count follows the DATA SIZE (estimated from plan statistics
    // — the B52 report makes these real for graft sources), not the
    // incoming task count. Partitioned writes hash on the partition
    // columns so one hive-partition's rows collapse into few tasks
    // instead of tasks×partitions fragments. The price is one extra
    // shuffle of the written data — the same trade Delta makes; leave
    // the conf unset for write paths where upstream layout is already
    // right. Unknown/unbounded size estimates skip the rewrite.
    val sized = spark.conf.getOption("spark.graft.optimizeWrite.targetBytes")
      .map(_.toLong).filter(_ > 0) match {
      case Some(t) =>
        val est = guarded.queryExecution.optimizedPlan.stats.sizeInBytes
        if (est <= 0 || est >= BigInt(Long.MaxValue) / 2) guarded
        else {
          val n = math.min(10000L, (est.toLong + t - 1) / t).toInt.max(1)
          if (partitionBy.nonEmpty)
            guarded.repartition(n, partitionBy.map(org.apache.spark.sql.functions.col): _*)
          else guarded.repartition(n)
        }
      case None => guarded
    }
    // Unique suffix: concurrent writers racing for the same version
    // must stage DISTINCT dirs — only the commit rename decides the
    // winner; the loser's dir is orphaned (vacuum reclaims it).
    val dir = s"d$v-${java.util.UUID.randomUUID.toString.take(8)}"
    val w = sized.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(new Path(path, dir).toString)
    writeStats(spark, path, dir)
    dir
  }

  // ---- per-file column statistics (Doris/Delta-style file skipping) --

  /** Sidecar name inside each file-group dir; the underscore keeps it
    * invisible to parquet directory scans.
    */
  private val StatsFile = "_stats.tsv"

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  /** Footer → sidecar lines for ONE file (runs on executors). */
  private val StatStringCap = 64

  /** Lower-bound truncation: a prefix compares ≤ the full string. The
    * cut lands on a CODE-POINT boundary — an unpaired high surrogate
    * at the cut would be mangled by the sidecar's UTF-8 encoding and
    * the persisted bound would no longer equal what was computed.
    */
  private def truncStatMin(s: String): String =
    if (s.length <= StatStringCap) s
    else s.substring(0,
      if (Character.isHighSurrogate(s.charAt(StatStringCap - 1))) StatStringCap - 1
      else StatStringCap)

  /** Upper-bound truncation: prefix with the last kept char bumped —
    * compares > every string carrying the original prefix. The bump
    * char must survive the sidecar's UTF-8 round trip, so positions
    * where it can't are skipped: a surrogate (either half — bumping a
    * low one would also strand its high partner in the prefix), 0xD7FF
    * (bumps INTO the surrogate range; URLEncoder would persist it as
    * '?', an unsound SMALLER bound), and Char.MaxValue (no bump
    * exists). If no position qualifies (degenerate), keep the full
    * value rather than emit an unsound bound.
    */
  private def truncStatMax(s: String): String =
    if (s.length <= StatStringCap) s
    else {
      def bumpable(c: Char): Boolean =
        c != Char.MaxValue && c != '\uD7FF' && !Character.isSurrogate(c)
      var i = StatStringCap - 1
      while (i >= 0 && !bumpable(s.charAt(i))) i -= 1
      if (i < 0) s
      else s.substring(0, i) + (s.charAt(i) + 1).toChar
    }

  /** Exact numeric comparison of two sidecar stat strings. Integral
    * stats serialize as exact decimal strings (a double round-trip
    * corrupts |v| > 2^53 and can round a min UP — unsound for pruning
    * and for the bounds the HMS facade serves), so comparisons go
    * through BigDecimal; mixed old (double-form "123.0") and new
    * (long-form "123") lines merge losslessly. Non-finite doubles
    * (Infinity) fall back to IEEE ordering.
    */
  private[graft] def numCmp(a: String, b: String): Int =
    try new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    catch { case _: NumberFormatException =>
      java.lang.Double.compare(a.toDouble, b.toDouble) }

  /** Exact comparison of a sidecar stat string to a query-bound
    * Number: integral bound types stay in BigDecimal (no double
    * detour); throws NumberFormatException if `v` is not numeric —
    * callers treat that as "unknown, keep the file".
    */
  private[graft] def cmpStatToNumber(v: String, n: Number): Int =
    try {
      val nb = n match {
        case l: java.lang.Long    => java.math.BigDecimal.valueOf(l.longValue())
        case i: java.lang.Integer => java.math.BigDecimal.valueOf(i.longValue())
        case s: java.lang.Short   => java.math.BigDecimal.valueOf(s.longValue())
        case b: java.lang.Byte    => java.math.BigDecimal.valueOf(b.longValue())
        case bi: java.math.BigInteger => new java.math.BigDecimal(bi)
        case bd: java.math.BigDecimal => bd
        case _ => java.math.BigDecimal.valueOf(n.doubleValue()) // throws on NaN/Inf
      }
      new java.math.BigDecimal(v).compareTo(nb)
    } catch { case _: NumberFormatException if isNumeric(v) =>
      // non-finite on either side: IEEE ordering is still the right
      // conservative answer (NaN sorts greatest, matches nothing real)
      java.lang.Double.compare(v.toDouble, n.doubleValue()) }

  private def isNumeric(s: String): Boolean =
    try { s.toDouble; true } catch { case _: NumberFormatException => false }

  private def statsLinesOf(conf: org.apache.hadoop.conf.Configuration,
      file: Path, rel: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val meta = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, file,
      org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    val mins = scala.collection.mutable.Map.empty[String, (Char, String)]
    val maxs = scala.collection.mutable.Map.empty[String, (Char, String)]
    // Per-column null totals (field 6) and the file's row count
    // (field 7): exact from the footer when every block reports them;
    // they let the HMS facade serve real numNulls/NDV bounds instead
    // of fabricated zeros. -1 = unknown.
    val nulls = scala.collection.mutable.Map.empty[String, Long]
    var fileRows = 0L
    meta.getBlocks.asScala.foreach { b =>
      fileRows += b.getRowCount
      b.getColumns.asScala.foreach { c =>
        val st = c.getStatistics
        if (st != null) {
          val nm = c.getPath.toDotString
          nulls.updateWith(nm) {
            case Some(-1L) => Some(-1L)
            case prev if st.isNumNullsSet =>
              Some(prev.getOrElse(0L) + st.getNumNulls)
            case _ => Some(-1L)
          }
        }
        if (st != null && st.hasNonNullValue) {
          val colName = c.getPath.toDotString
          (st.genericGetMin, st.genericGetMax) match {
            case (mn: Number, mx: Number) =>
              // INT32/INT64 footer stats arrive as boxed integrals:
              // keep them EXACT (see numCmp) instead of detouring
              // through Double.
              def encNum(n: Number): String = n match {
                case _: java.lang.Long | _: java.lang.Integer |
                     _: java.lang.Short | _: java.lang.Byte => n.longValue().toString
                case _ => n.doubleValue().toString
              }
              val (lo, hi) = (encNum(mn), encNum(mx))
              mins.updateWith(colName) {
                case Some((k, v)) if k == 'n' && numCmp(v, lo) <= 0 => Some((k, v))
                case _ => Some(('n', lo)) }
              maxs.updateWith(colName) {
                case Some((k, v)) if k == 'n' && numCmp(v, hi) >= 0 => Some((k, v))
                case _ => Some(('n', hi)) }
            case (mn: org.apache.parquet.io.api.Binary, mx: org.apache.parquet.io.api.Binary) =>
              // Sidecar lines must stay METADATA-sized on document-
              // scale string columns: a megabyte text column would
              // otherwise put two megabytes of min/max into every
              // file's stats line (×10⁶ files). Truncate like parquet
              // column indexes do — min to a PREFIX (a prefix sorts ≤
              // the value: still a sound lower bound), max to a prefix
              // with its last kept char BUMPED (sorts > any string it
              // prefixes: still a sound upper bound). Bounds loosen,
              // pruning stays conservative-correct.
              val (lo, hi) = (truncStatMin(mn.toStringUsingUTF8),
                truncStatMax(mx.toStringUsingUTF8))
              mins.updateWith(colName) {
                case Some((k, v)) if k == 's' && v <= lo => Some((k, v))
                case _ => Some(('s', lo)) }
              maxs.updateWith(colName) {
                case Some((k, v)) if k == 's' && v >= hi => Some((k, v))
                case _ => Some(('s', hi)) }
            case _ => () // booleans etc. — not useful for skipping
          }
        }
      }
    }
    val lines = mins.keySet.intersect(maxs.keySet).toSeq.sorted.map { colName =>
      val (k, lo) = mins(colName); val (_, hi) = maxs(colName)
      val nn = nulls.getOrElse(colName, -1L)
      s"${enc(rel)}\t${enc(colName)}\t$k\t${enc(lo)}\t${enc(hi)}\t$nn\t$fileRows"
    }
    // A file with no stat-bearing column still records its row count
    // (empty column marker) so the null/row aggregation sees EVERY
    // file — absent-column nulls and the snapshot row count stay exact.
    if (lines.isEmpty && fileRows > 0)
      Seq(s"${enc(rel)}\t\t-\t\t\t-1\t$fileRows")
    else lines
  }

  /** Harvest per-file per-column min/max from the parquet FOOTERS of a
    * just-written group (metadata-only — no data re-read) into
    * `<dir>/_stats.tsv` lines
    * `file \t column \t kind \t min \t max \t nulls \t fileRows`
    * (kind n=numeric, s=string; nulls -1 = footer didn't report;
    * pre-upgrade 5-field lines still parse). Integral bounds are
    * exact decimal strings — never a double round-trip — and a file
    * with no stat-bearing column writes a row-count marker line so
    * the null/row aggregation sees every file. The footer reads are
    * DISTRIBUTED
    * (one tiny task per batch of files): at 100 TB a commit can add
    * thousands of files, and a serial driver loop over footer RPCs
    * would become the commit bottleneck. Commit-log-level stats are
    * what serve point lookups without opening files — the OLAP-engine
    * trick the reference gets from Doris (doris.go).
    */
  private def writeStats(spark: SparkSession, path: String, dir: String): Unit = {
    val dirPath = new Path(path, dir)
    val fs = fsOf(spark, dirPath)
    val base = fs.makeQualified(dirPath).toString
    val files = Seq.newBuilder[(String, String)] // (full, rel)
    val it = fs.listFiles(dirPath, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val full = fs.makeQualified(f.getPath).toString
        files += ((full, full.stripPrefix(base + "/")))
      }
    }
    val fileList = files.result()
    // Driver memory stance: a typical commit's stat lines (files x
    // stat columns) collect fine, but the harvest must not be the
    // reason a 10^6-file commit OOMs the driver — past the threshold,
    // sort DISTRIBUTED and stream the lines through toLocalIterator
    // (the bloom build's shape: one partition in driver memory at a
    // time). Below it, skip the extra sort stage and keep small-commit
    // latency.
    val StreamThreshold = 65536
    // Below this many files the footer harvest runs on the driver
    // (no Spark job); above it, distributed (executors read footers).
    val DriverHarvestThreshold = 32
    val out = new java.io.BufferedOutputStream(
      fs.create(new Path(dirPath, StatsFile), true))
    try {
      if (fileList.isEmpty) out.write("\n".getBytes(StandardCharsets.UTF_8))
      else if (fileList.size <= DriverHarvestThreshold) {
        // Small commit: read the handful of footers on the driver
        // thread. A parallelize() job for <= 32 footers costs a full
        // scheduler round-trip (~100 ms) to distribute microseconds of
        // work — and per-commit latency is what streaming sinks and
        // metadata-sized writes actually pay per micro-batch.
        val conf = spark.sparkContext.hadoopConfiguration
        val lines = fileList.flatMap { case (full, rel) =>
          statsLinesOf(conf, new Path(full), rel) }.sorted
        lines.foreach(l => out.write((l + "\n").getBytes(StandardCharsets.UTF_8)))
      } else {
        val confB = org.apache.spark.sql.graftglue.Glue
          .broadcastHadoopConf(spark.sparkContext)
        val lineRdd = spark.sparkContext
          .parallelize(fileList, math.max(1, math.min(fileList.size, 64)))
          .flatMap { case (full, rel) =>
            statsLinesOf(org.apache.spark.sql.graftglue.Glue.confOf(confB),
              new Path(full), rel)
          }
        val it: Iterator[String] =
          if (fileList.size <= StreamThreshold) lineRdd.collect().sorted.iterator
          else lineRdd.sortBy(identity).toLocalIterator
        while (it.hasNext)
          out.write((it.next() + "\n").getBytes(StandardCharsets.UTF_8))
      }
    } finally out.close()
  }

  /** Inclusive conjunctive bounds on one column; None = unbounded. */
  final case class ColumnBounds(lo: Option[Any], hi: Option[Any])

  /** Parsed sidecar lines of one group root (raw split fields; empty
    * when the sidecar is absent). Shared by the snapshot aggregates
    * and the per-partition stats slice.
    */
  private def sidecarLines(spark: SparkSession, path: String,
      root: String): Seq[Array[String]] = {
    val statsPath = new Path(new Path(path, root), StatsFile)
    val fs = fsOf(spark, statsPath)
    if (!fs.exists(statsPath)) return Nil
    val in = fs.open(statsPath)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    body.split("\n").filter(_.nonEmpty).map(_.split("\t")).toSeq
  }

  /** Per-PARTITION column stats: (kind, min, max) plus exact
    * (rows, nulls) aggregated over ONLY the files under the given
    * leaf dirs (absolute path strings under `path`) — the partition
    * slice of the sidecar harvest, serving the HMS facade's
    * `get_partition_column_statistics`. Returns (bounds, rows,
    * nulls); nulls is None when any contributing line predates the
    * null/row fields.
    */
  private[graft] def leafColumnStats(spark: SparkSession, path: String,
      leafDirs: Seq[String])
      : (Map[String, (Char, String, String)], Option[(Long, Map[String, Long])]) = {
    val base = fsOf(spark, new Path(path)).makeQualified(new Path(path)).toString
    // leaf -> (group root, rel prefix under the root; "" = whole group)
    val slices = leafDirs.map { l =>
      val q = fsOf(spark, new Path(l)).makeQualified(new Path(l)).toString
      val entry = q.stripPrefix(base + "/")
      val root = groupRoot(entry)
      (root, q.stripPrefix(
        fsOf(spark, new Path(path, root)).makeQualified(new Path(path, root)).toString)
        .stripPrefix("/"))
    }.distinct
    val acc = scala.collection.mutable.Map.empty[String, (Char, String, String)]
    val dropped = scala.collection.mutable.Set.empty[String]
    val perFile = scala.collection.mutable.Map.empty[String, (Long, Map[String, Long])]
    var nullsKnown = true
    slices.groupBy(_._1).foreach { case (root, ss) =>
      val prefixes = ss.map(_._2)
      sidecarLines(spark, path, root)
        .filter(a => a.length >= 5 && {
          val rel = dec(a(0))
          prefixes.exists(p => p.isEmpty || rel.startsWith(p + "/"))
        })
        .foreach { a =>
          val c = dec(a(1))
          if (c.nonEmpty && !dropped(c)) {
            val (kind, mn, mx) = (a(2).head, dec(a(3)), dec(a(4)))
            acc.get(c) match {
              case None => acc(c) = (kind, mn, mx)
              case Some((k0, lo, hi)) if k0 == kind =>
                val (nlo, nhi) =
                  if (kind == 'n')
                    (if (numCmp(mn, lo) < 0) mn else lo,
                     if (numCmp(mx, hi) > 0) mx else hi)
                  else (if (mn < lo) mn else lo, if (mx > hi) mx else hi)
                acc(c) = (kind, nlo, nhi)
              case Some(_) => dropped += c; acc.remove(c)
            }
          }
          if (a.length < 7) nullsKnown = false
          else {
            val file = root + "/" + dec(a(0))
            val rows = a(6).toLong
            val (_, m) = perFile.getOrElse(file, (rows, Map.empty[String, Long]))
            perFile(file) = (rows,
              if (c.isEmpty) m else m + (c -> a(5).toLong))
          }
        }
    }
    val nulls =
      if (!nullsKnown) None
      else {
        val totalRows = perFile.valuesIterator.map(_._1).sum
        val allCols = perFile.valuesIterator.flatMap(_._2.keysIterator).toSet
        val m = allCols.flatMap { c =>
          var total = 0L; var known = true
          perFile.valuesIterator.foreach { case (rows, cm) =>
            cm.get(c) match {
              case Some(n) if n >= 0L => total += n
              case Some(_)            => known = false
              case None               => total += rows
            }
          }
          if (known) Some(c -> total) else None
        }.toMap
        Some((totalRows, m))
      }
    (acc.toMap, nulls)
  }

  /** Snapshot-wide (kind, min, max) per column, aggregated from the
    * per-group stats sidecars — what the HMS facade serves external
    * optimizers as table column statistics. Kind 'n' compares
    * numerically, 's' lexicographically (truncated string bounds are
    * sound: the stored min is ≤ the true min, the stored max ≥).
    * O(groups) tiny sidecar reads; columns whose sidecars disagree on
    * kind (a widened/retyped history) are dropped rather than merged
    * unsoundly.
    */
  private[graft] def aggregatedColumnStats(spark: SparkSession, path: String)
      : Map[String, (Char, String, String)] = {
    val cur = currentVersion(spark, path).getOrElse(return Map.empty)
    val roots = readCommit(spark, path, cur).dirs.map(groupRoot).distinct
    val acc = scala.collection.mutable.Map.empty[String, (Char, String, String)]
    val dropped = scala.collection.mutable.Set.empty[String]
    roots.foreach { root =>
      sidecarLines(spark, path, root).filter(_.length >= 5)
        .foreach { a =>
          val (c, kind, mn, mx) = (dec(a(1)), a(2).head, dec(a(3)), dec(a(4)))
          if (c.nonEmpty && !dropped(c)) acc.get(c) match {
            case None => acc(c) = (kind, mn, mx)
            case Some((k0, lo, hi)) if k0 == kind =>
              val (nlo, nhi) =
                if (kind == 'n')
                  (if (numCmp(mn, lo) < 0) mn else lo,
                   if (numCmp(mx, hi) > 0) mx else hi)
                else (if (mn < lo) mn else lo, if (mx > hi) mx else hi)
              acc(c) = (kind, nlo, nhi)
            case Some(_) => dropped += c; acc.remove(c)
          }
        }
    }
    acc.toMap
  }

  /** Exact snapshot row count and per-column null totals, aggregated
    * from sidecar fields 6-7 (per-column nulls, per-file rows). A
    * column with NO stat line in a file has no non-null values there
    * (numeric/string parquet stats exist whenever a value does), so
    * that file's whole row count is null for it. Returns None when any
    * contributing line predates the fields (pre-upgrade sidecars):
    * better no number than a wrong one — the same stance the HMS
    * facade takes for the stats it cannot know. Columns whose footers
    * didn't report null counts are absent from the map, the rest stay
    * exact.
    */
  private[graft] def aggregatedColumnNulls(spark: SparkSession, path: String)
      : Option[(Long, Map[String, Long])] = {
    val cur = currentVersion(spark, path).getOrElse(return None)
    val roots = readCommit(spark, path, cur).dirs.map(groupRoot).distinct
    // file -> (rows, col -> nulls); -1 nulls = footer didn't say
    val perFile = scala.collection.mutable.Map.empty[String, (Long, Map[String, Long])]
    roots.foreach { root =>
      // a MISSING sidecar hides that group's rows entirely → unknown;
      // an existing-but-empty one (empty create) holds zero rows and
      // contributes nothing — correct as-is
      if (!fsOf(spark, new Path(path, root))
        .exists(new Path(new Path(path, root), StatsFile))) return None
      sidecarLines(spark, path, root).foreach { a =>
        if (a.length < 7) return None // pre-upgrade sidecar
        val file = root + "/" + dec(a(0))
        val rows = a(6).toLong
        val col = dec(a(1))
        val (_, m) = perFile.getOrElse(file, (rows, Map.empty[String, Long]))
        perFile(file) = (rows,
          if (col.isEmpty) m else m + (col -> a(5).toLong))
      }
    }
    val totalRows = perFile.valuesIterator.map(_._1).sum
    val allCols = perFile.valuesIterator.flatMap(_._2.keysIterator).toSet
    val nulls = allCols.flatMap { c =>
      var total = 0L
      var known = true
      perFile.valuesIterator.foreach { case (rows, m) =>
        m.get(c) match {
          case Some(n) if n >= 0L => total += n
          case Some(_)            => known = false // footer had no null count
          case None               => total += rows // column absent: all null there
        }
      }
      if (known) Some(c -> total) else None
    }.toMap
    Some((totalRows, nulls))
  }

  /** A commit entry may name a whole file-group dir (`d3-ab12`) or —
    * after a partition-granular DML — a partition SUBDIR of one
    * (`d3-ab12/g=en`). The group root is the entry minus its trailing
    * `col=value` segments; it anchors the stats sidecar, the
    * `basePath` option (so reads recover partition columns), and
    * vacuum's referenced-dir check. Group dir names (`dN-uuid`) never
    * contain '=', and Hive-escaping (%3D) keeps '=' out of encoded
    * partition values, so the strip is unambiguous.
    */
  private[graft] def groupRoot(entry: String): String = {
    val segs = entry.split("/")
    segs.reverse.dropWhile(_.contains("=")).reverse.mkString("/")
  }

  /** Filesystem-independent group identity: the group root's LAST path
    * segment (`d3-ab12cd34`). Commit entries can be relative names or
    * ABSOLUTE URIs (shallow clones, branches) — deletion-vector file
    * names can only embed the bare segment, so every DV group match
    * normalizes through this. The uuid suffix in group names makes
    * last-segment collisions across roots negligible.
    */
  private[graft] def groupKey(entry: String): String = {
    val r = groupRoot(entry)
    r.substring(r.lastIndexOf('/') + 1)
  }

  /** One data file's pruning outcome: its path, the finest commit
    * entry that could carry it (its partition leaf dir — the entry
    * itself for flat files), and whether its stats/partition values
    * intersect the bounds.
    */
  private[graft] final case class PrunedFile(file: String, leaf: String, kept: Boolean,
      len: Long = 0L)

  /** One commit entry's pruning outcome: the entry (as named in the
    * commit), the qualified GROUP ROOT path (a valid `basePath` read
    * option), and its files' outcomes.
    */
  private[graft] final case class PrunedDir(dir: String, base: String,
      files: Seq[PrunedFile]) {
    def kept: Seq[String] = files.collect { case f if f.kept => f.file }
  }

  /** Hive-style path unescape (`%xx` sequences, the encoding Spark
    * writes into partition dir names).
    */
  private[graft] def unescapePath(s: String): String =
    if (!s.contains('%')) s
    else {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length) {
          try { sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
          catch { case _: NumberFormatException => sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

  /** Per-dir stats/partition pruning: for each dir, the files whose
    * [min,max] sidecar stats AND partition-dir values (`col=value`
    * path segments are exact per-file bounds — the layout's free
    * statistics) intersect every bound. `flat` is false when any file
    * sits under a partition subdir — a bare file-list read of those
    * would lose the partition columns, so only callers that either
    * need the keep/empty DECISION (DML group pruning) or re-read with
    * `basePath` may use a non-flat result. Files or columns without
    * stats are always kept: skipping is an optimization, never a
    * filter.
    */
  private[graft] def pruneFilesByDir(spark: SparkSession, path: String, dirs: Seq[String],
      bounds: Map[String, ColumnBounds]): (Seq[PrunedDir], Boolean) = {
    // Groups written before a RENAME COLUMN carry stats (and possibly
    // partition dirs) under the old physical name — resolve each bound
    // column's prior names once so those files still prune instead of
    // degrading to must-read.
    val renameChain = tableRenames(spark, path)
    val priorNames: Map[String, Seq[String]] =
      if (renameChain.isEmpty) Map.empty
      else bounds.keys.map { c =>
        var cur = c
        val out = Seq.newBuilder[String]
        renameChain.reverse.foreach { r =>
          if (r.to == cur) { out += r.old; cur = r.old }
        }
        c -> out.result()
      }.toMap
    var flat = true
    val out = dirs.map { d =>
      val dirPath = new Path(path, d) // the entry (maybe a partition subdir)
      val root = groupRoot(d)
      val rootPath = new Path(path, root)
      val fs = fsOf(spark, dirPath)
      val statsPath = new Path(rootPath, StatsFile)
      // (file, column) -> (kind, min, max) — rels are group-root-relative
      val stats: Map[(String, String), (Char, String, String)] =
        if (!fs.exists(statsPath)) Map.empty
        else {
          val in = fs.open(statsPath)
          val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
          body.split("\n").filter(_.nonEmpty).map(_.split("\t"))
            .filter(a => a.length >= 5 && a(1).nonEmpty)
            .map(a => (dec(a(0)), dec(a(1))) -> (a(2).head, dec(a(3)), dec(a(4)))).toMap
        }
      val base = fs.makeQualified(rootPath).toString
      val acc = Seq.newBuilder[PrunedFile]
      val it = fs.listFiles(dirPath, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          val rel = fs.makeQualified(f.getPath).toString.stripPrefix(base + "/")
          if (rel.contains("/")) flat = false // partition-encoded layout
          // col -> partition value (None = __HIVE_DEFAULT_PARTITION__).
          val partVals: Map[String, Option[String]] =
            rel.split("/").dropRight(1).toSeq.filter(_.contains("="))
              .map { seg =>
                val i = seg.indexOf('=')
                val raw = unescapePath(seg.substring(i + 1))
                seg.substring(0, i) ->
                  (if (raw == "__HIVE_DEFAULT_PARTITION__") None else Some(raw))
              }.toMap
          // Exact bound check against a partition value; None = the
          // column is not partition-encoded for this file.
          def partOverlaps(column: String, b: ColumnBounds): Option[Boolean] =
            partVals.get(column).map {
              case None => false // NULL partition: comparisons never match
              case Some(v) =>
                def side(bound: Option[Any], okC: Int => Boolean,
                    okS: (String, String) => Boolean): Boolean = bound.forall {
                  case n: Number => scala.util.Try(cmpStatToNumber(v, n))
                    .toOption.forall(okC)
                  case s: String => okS(v, s)
                  case _ => true
                }
                side(b.lo, _ >= 0, _ >= _) && side(b.hi, _ <= 0, _ <= _)
            }
          val overlaps = bounds.forall { case (column, b) =>
            val names = column +: priorNames.getOrElse(column, Nil)
            names.iterator.flatMap(nm => partOverlaps(nm, b)).nextOption()
              .getOrElse(names.iterator.flatMap(nm => stats.get((rel, nm))).nextOption() match {
              case Some(('n', mn, mx)) =>
                b.lo.forall { case l: Number =>
                  scala.util.Try(cmpStatToNumber(mx, l)).toOption.forall(_ >= 0)
                  case _ => true } &&
                b.hi.forall { case h: Number =>
                  scala.util.Try(cmpStatToNumber(mn, h)).toOption.forall(_ <= 0)
                  case _ => true }
              case Some(('s', mn, mx)) =>
                b.lo.forall { case l: String => mx >= l; case _ => true } &&
                b.hi.forall { case h: String => mn <= h; case _ => true }
              case _ => true // no stats: must read it
            })
          }
          val leaf =
            if (!rel.contains("/")) d
            else root + "/" + rel.substring(0, rel.lastIndexOf('/'))
          acc += PrunedFile(f.getPath.toString, leaf, overlaps, f.getLen)
        }
      }
      PrunedDir(d, base, acc.result())
    }
    (out, flat)
  }

  /** Enumerate (partition values, leaf dir) across group dirs — the
    * explicit PartitionSpec a cross-group partitioned scan needs
    * (Spark cannot DISCOVER partitions across multiple file-group
    * roots; see Glue.partitionedParquetScanBuilder). Values follow
    * `partCols` order; None = null partition.
    */
  private[graft] def partitionLeaves(spark: SparkSession, dirPaths: Seq[String],
      partCols: Seq[String]): Seq[(Seq[Option[String]], Path)] = {
    val seen = scala.collection.mutable.LinkedHashMap
      .empty[String, (Seq[Option[String]], Path)]
    dirPaths.foreach { p =>
      val dirPath = new Path(p)
      val fs = fsOf(spark, dirPath)
      if (fs.exists(dirPath)) {
        // Partition values parse relative to the GROUP ROOT, so a
        // subdir entry (…/d0/g=b) still yields its k=v segments.
        val base = fs.makeQualified(new Path(groupRoot(p))).toString
        val it = fs.listFiles(dirPath, true)
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) {
            val parent = fs.makeQualified(f.getPath.getParent)
            if (!seen.contains(parent.toString)) {
              val kvs = parent.toString.stripPrefix(base).stripPrefix("/")
                .split("/").filter(_.contains("=")).map { seg =>
                  val i = seg.indexOf('=')
                  val raw = unescapePath(seg.substring(i + 1))
                  seg.substring(0, i) ->
                    (if (raw == "__HIVE_DEFAULT_PARTITION__") None else Some(raw))
                }.toMap
              seen(parent.toString) = (partCols.map(kvs.getOrElse(_, None)), parent)
            }
          }
        }
      }
    }
    seen.values.toSeq
  }

  /** Flat-layout file pruning (see [[pruneFilesByDir]]); None when the
    * layout is partition-encoded and a bare file list would lose the
    * partition columns.
    */
  private[graft] def pruneFiles(spark: SparkSession, path: String, dirs: Seq[String],
      bounds: Map[String, ColumnBounds]): Option[Seq[String]] = {
    val (pruned, flat) = pruneFilesByDir(spark, path, dirs, bounds)
    if (flat) Some(pruned.flatMap(_.kept)) else None
  }

  /** Read the surviving files of a prune: flat layouts as one file
    * list, partition-encoded layouts per dir under its `basePath` so
    * the partition columns are recovered from the paths.
    */
  private def readPruned(spark: SparkSession, path: String, pruned: Seq[PrunedDir],
      flat: Boolean, version: Option[Long]): DataFrame = {
    val nonEmpty = pruned.filter(_.kept.nonEmpty)
    if (nonEmpty.isEmpty) read(spark, path, version).limit(0)
    else if (flat)
      spark.read.option("mergeSchema", "true").parquet(nonEmpty.flatMap(_.kept): _*)
    else nonEmpty.map { pd =>
      spark.read.option("mergeSchema", "true").option("basePath", pd.base)
        .parquet(pd.kept: _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** File-skipping range read: keep only the files of the snapshot
    * whose `[min,max]` for `column` intersects `[lo, hi]` (both
    * inclusive; pass lo==hi for a point lookup); the residual
    * predicate is applied on top, so the result is exactly
    * `read(...).where(column between lo and hi)` at a fraction of the
    * files opened.
    */
  def readRange(spark: SparkSession, path: String, column: String,
      lo: Any, hi: Any, version: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = version.orElse(currentVersion(spark, path))
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val c = readCommit(spark, path, v)
    val (pruned, flat) = pruneFilesByDir(spark, path, c.dirs,
      Map(column -> ColumnBounds(Some(lo), Some(hi))))
    // A DV'd snapshot (B46) keeps the same file skipping — vectors key
    // by (file, row) so pruning whole files is sound — with the
    // vector filter applied on the surviving files.
    val dv = dvFor(spark, path, v, c.dirs)
    val base =
      if (dv.nonEmpty) readPrunedDv(spark, path, pruned, flat, dv,
        tableSchema(spark, path, Some(v)))
      else readPruned(spark, path, pruned, flat, Some(v))
    base.where(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  // ---- per-file bloom sidecars (point lookups on UNCLUSTERED columns) --

  /** Sidecar name per file-group dir: `rel \t column \t base64(bloom)`. */
  private val BloomFile = "_blooms.tsv"

  /** Build per-file bloom-filter sidecars for `columns` over the
    * current snapshot. Min/max skipping (the free footer stats) is
    * useless for a column the layout is NOT clustered on — every
    * file's [min,max] spans the domain — but a bloom answers "value
    * definitely absent from this file" regardless of layout. Opt-in,
    * because unlike the footer harvest it costs one column-pruned scan
    * of the group (the same trade Delta/Doris make for bloom indexes).
    *
    * The scan is distributed: each task builds partial blooms for the
    * files in its partition, partials OR-merge per (file, column) —
    * identical create parameters make them mergeable — and the driver
    * only streams the final one-bloom-per-file lines to the sidecar
    * (~`-ln(fpp)/ln(2)^2/8` bytes per row capacity, ≈120 KB per file
    * at 100k rows / 1% fpp).
    */
  def buildBlooms(spark: SparkSession, path: String, columns: Seq[String],
      expectedRowsPerFile: Long = 100000L, fpp: Double = 0.01): Unit = {
    import org.apache.spark.util.sketch.BloomFilter
    val v = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val c = readCommit(spark, path, v)
    c.dirs.foreach { d =>
      val dirPath = new Path(path, d)
      val fs = fsOf(spark, dirPath)
      val base = fs.makeQualified(dirPath).toString
      val cols = columns
      val df = spark.read.parquet(dirPath.toString)
        .select(input_file_name().as("__file") +: cols.map(col): _*)
      import spark.implicits._
      val partials = df.mapPartitions { rows =>
        val acc = scala.collection.mutable.Map.empty[(String, String), BloomFilter]
        rows.foreach { r =>
          val file = r.getString(0)
          var i = 0
          while (i < cols.length) {
            if (!r.isNullAt(i + 1)) {
              val bf = acc.getOrElseUpdate((file, cols(i)),
                BloomFilter.create(expectedRowsPerFile, fpp))
              r.get(i + 1) match {
                case l: java.lang.Long => bf.putLong(l)
                case n: java.lang.Integer => bf.putLong(n.longValue())
                case s: String => bf.putString(s)
                case other => bf.putString(other.toString)
              }
            }
            i += 1
          }
        }
        acc.iterator.map { case ((f, cn), bf) =>
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          (f, cn, bos.toByteArray)
        }
      }
      val merged = partials
        .groupByKey { case (f, cn, _) => (f, cn) }
        .reduceGroups { (a, b) =>
          val x = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a._3))
          x.mergeInPlace(BloomFilter.readFrom(new java.io.ByteArrayInputStream(b._3)))
          val bos = new java.io.ByteArrayOutputStream()
          x.writeTo(bos)
          (a._1, a._2, bos.toByteArray)
        }
        .map(_._2)
      val out = fs.create(new Path(dirPath, BloomFile), true)
      try {
        // toLocalIterator: one final bloom per (file, column) streams
        // through the driver — never the whole set at once.
        val it = merged.toLocalIterator()
        while (it.hasNext) {
          val (f, cn, bytes) = it.next()
          val rel = new Path(f).toString match {
            case full if full.startsWith(base + "/") => full.stripPrefix(base + "/")
            case full => fs.makeQualified(new Path(full)).toString.stripPrefix(base + "/")
          }
          val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
          out.write(s"${enc(rel)}\t${enc(cn)}\t$b64\n".getBytes(StandardCharsets.UTF_8))
        }
      } finally out.close()
    }
  }

  /** Point lookup using BOTH skipping tiers: footer min/max first,
    * then bloom "definitely absent" on whatever sidecars exist. Files
    * without a bloom entry are kept — skipping is an optimization,
    * never a filter. Returns exactly `read(...).where(column = value)`
    * opening only the files that might contain the value.
    */
  def readPoint(spark: SparkSession, path: String, column: String, value: Any,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, path))
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val base = pointCandidateFiles(spark, path, column, value, Some(v)) match {
      case Some(files) if files.isEmpty => read(spark, path, Some(v)).limit(0)
      case Some(files) => spark.read.option("mergeSchema", "true").parquet(files: _*)
      case None =>
        // Partition-encoded layout: no bloom tier, but stats +
        // partition-value pruning still apply (basePath read keeps
        // the partition columns).
        val c = readCommit(spark, path, v)
        val (pruned, flat) = pruneFilesByDir(spark, path, c.dirs,
          Map(column -> ColumnBounds(Some(value), Some(value))))
        readPruned(spark, path, pruned, flat, Some(v))
    }
    base.where(col(column) === lit(value))
  }

  /** Files a point lookup must open: footer-stats prune, then bloom
    * "definitely absent" per surviving file. None = partitioned layout
    * (file-level pruning unsafe). Also used by specs to assert skipping.
    */
  private[graft] def pointCandidateFiles(spark: SparkSession, path: String,
      column: String, value: Any, version: Option[Long] = None): Option[Seq[String]] = {
    import org.apache.spark.util.sketch.BloomFilter
    val v = version.orElse(currentVersion(spark, path)).get
    val c = readCommit(spark, path, v)
    // cache per-dir sidecar parses: (dir -> (rel, column) -> bloom b64)
    val sidecars = scala.collection.mutable.Map.empty[String, Map[(String, String), String]]
    def sidecarOf(dirPath: Path, fs: FileSystem): Map[(String, String), String] =
      sidecars.getOrElseUpdate(dirPath.toString, {
        val bloomPath = new Path(dirPath, BloomFile)
        if (!fs.exists(bloomPath)) Map.empty
        else {
          val in = fs.open(bloomPath)
          val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
          body.split("\n").filter(_.nonEmpty).map(_.split("\t"))
            .collect { case Array(r, cn, b64) => (dec(r), dec(cn)) -> b64 }.toMap
        }
      })
    pruneFiles(spark, path, c.dirs, Map(column -> ColumnBounds(Some(value), Some(value))))
      .map { files =>
        files.filter { f =>
          val fp = new Path(f)
          val fs = fsOf(spark, fp.getParent)
          val base = fs.makeQualified(fp.getParent).toString
          val rel = fs.makeQualified(fp).toString.stripPrefix(base + "/")
          sidecarOf(fp.getParent, fs).get((rel, column)) match {
            case None => true // no bloom: must read the file
            case Some(b64) =>
              val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(
                java.util.Base64.getDecoder.decode(b64)))
              value match {
                case l: java.lang.Long => bf.mightContainLong(l)
                case n: java.lang.Integer => bf.mightContainLong(n.longValue())
                case s: String => bf.mightContainString(s)
                case other => bf.mightContainString(other.toString)
              }
          }
        }
      }
  }

  /** Append-driven STREAMING read of the table (the Delta
    * streaming-source usage): a file stream over the table's
    * file-group dirs — every appended group's files arrive as a
    * micro-batch, offsets checkpoint per file, so a restarted stream
    * resumes exactly after what it has processed (spec-verified).
    * Contract (same as Delta's source): the table must be
    * APPEND-ONLY while streamed — a COW rewrite (merge/delete/
    * compact) writes a consolidated group the glob would replay as
    * new rows. This is the file-glob approximation of a log-aware
    * source; a commit-log-driven DSv2 MicroBatchStream (skipping
    * orphaned racer dirs, erroring on rewrites) is the planned
    * upgrade.
    */
  def streamAppends(spark: SparkSession, path: String): DataFrame = {
    val schema = read(spark, path).schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(new Path(path, "d*").toString)
  }

  /** Zero-copy SHALLOW CLONE (the Delta capability): the clone's first
    * commit references the source snapshot's file groups by ABSOLUTE
    * path — no data moves, clone cost is one commit-log write
    * regardless of table size. The clone's version numbering continues
    * from the source's (returned) so copied mapping-chain stamps stay
    * comparable with both the referenced dirs and clone-side writes. The clone then evolves independently:
    * its own appends/merges/compactions write under its own root
    * (`new Path(path, dir)` resolves absolute shared dirs to the
    * source and relative new dirs to the clone), and its vacuum only
    * ever deletes `d*` dirs under its OWN root, never shared ones.
    * Caveat shared with Delta: vacuuming the SOURCE below the cloned
    * snapshot orphans the clone's shared files — pin source retention
    * to the clone point. Deletion-vector state at the cloned version
    * PINS into the clone's own `_dv` (group identity is the dir's
    * last path segment, [[groupKey]]), so a clone of a merge-on-read
    * table serves the vectored state, isolated from later source DML.
    */
  def shallowClone(spark: SparkSession, sourcePath: String, targetPath: String,
      version: Option[Long] = None): Long = {
    val v = version.orElse(currentVersion(spark, sourcePath))
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $sourcePath"))
    val c = readCommit(spark, sourcePath, v)
    val srcFs = fsOf(spark, new Path(sourcePath))
    // Fully-qualified URIs (scheme + authority), not bare paths: a
    // clone rooted on a DIFFERENT filesystem/bucket must keep reading
    // the source's dirs — `new Path(parent, child)` resolves a
    // scheme-bearing child to itself, so qualified refs survive every
    // reader; a bare /path would silently rebind to the clone's FS.
    val absDirs = c.dirs.map(d =>
      srcFs.makeQualified(new Path(sourcePath, d)).toString)
    // The clone's version numbering CONTINUES past everything it
    // copies — source head, referenced dir versions, mapping-chain
    // stamps — so the one version axis [[groupVersionOf]] compares
    // stays totally ordered: copied stamps confine to the source-named
    // groups they predate, and every clone-side write (dir version >
    // base) postdates the whole copied chain. Starting the clone at 0
    // instead would put fresh clone data "before" copied stamps and a
    // copied DROP tombstone would capture it.
    val base = (Seq(v) ++ c.dirs.map(groupVersionOf).filter(_ > 0) ++
      tableMappings(spark, sourcePath).map(_.stamp)).max + 1
    val p = new Path(targetPath)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, true)
    invalidateSchemaCache(spark, targetPath)
    // PIN the source's deletion-vector state (B46): the clone's reads
    // resolve DVs from its OWN `_dv`, so the resolved per-group state
    // at the cloned version is re-serialized there under v0 — blob
    // keys are absolute file paths and stay valid (no file moves), and
    // later source deletes can never leak into the pinned snapshot.
    val dvNames = dvResolve(spark, sourcePath, v, c.dirs).toSeq.sortBy(_._1)
      .map { case (g, (_, files)) => writeDvFile(spark, targetPath, base, g, files) }
    // Carry the TABLE META verbatim (partition spec, sort order, CHECK
    // constraints, DV flag, column-mapping chain): without it a clone
    // of a partitioned table loses pruning/partition columns and a
    // clone of a renamed/dropped/widened table would serve the OLD
    // physical schema. Clone-side reads apply copied mappings to the
    // source-named dirs under the copied stamps (groupVersionOf parses
    // source version numbers out of the absolute refs).
    val srcMeta = tableMetaFile(sourcePath)
    if (srcFs.exists(srcMeta)) {
      val in = srcFs.open(srcMeta)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      fs.mkdirs(logDir(targetPath))
      val out = fs.create(tableMetaFile(targetPath), true)
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }
    writeCommit(spark, targetPath, Commit(base, "clone", absDirs, dvFiles = dvNames))
    base
  }

  /** Delta DEEP CLONE: an independent PHYSICAL copy of the snapshot,
    * vs [[shallowClone]]'s O(1) metadata pin. The copy reads through
    * the source's deletion vectors — the clone materializes the
    * RESOLVED state, so no DV debt travels — and re-applies the
    * recorded partition layout, sort order and CHECK constraints;
    * stats sidecars are rebuilt on the copied files. O(data): the
    * backup/migration verb (survives source vacuum/drop), where
    * shallow clone is the dev/test-against-prod verb.
    */
  def deepClone(spark: SparkSession, sourcePath: String, targetPath: String,
      version: Option[Long] = None): Long = {
    val v = version.orElse(currentVersion(spark, sourcePath))
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $sourcePath"))
    val p = new Path(targetPath)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, true)
    create(spark, targetPath, read(spark, sourcePath, Some(v)),
      partitionBy = tablePartitioning(spark, sourcePath))
    val sort = tableSortBy(spark, sourcePath)
    if (sort.nonEmpty) setSortBy(spark, targetPath, sort)
    tableChecks(spark, sourcePath).foreach { case (n, sql) =>
      addCheck(spark, targetPath, n, sql) }
    // ANALYZE results stay valid (identical data, logical names) —
    // re-stamped to the clone's own create version.
    val ndv = tableNdv(spark, sourcePath)
    if (ndv.nonEmpty)
      writeTableMeta(spark, targetPath, tablePartitioning(spark, targetPath),
        metaSchema(spark, targetPath), tableSortBy(spark, targetPath),
        tableChecks(spark, targetPath), dvEnabled(spark, targetPath),
        ndv = Some(ndv.map { case (c, r) => c -> r.copy(asOf = 0L) }),
        expectVer = Some(currentMetaVer(spark, targetPath)))
    0L
  }

  // Table-level partitioning, recorded at create: every COW rewrite
  // (merge/delete/update/replace/agg-merge/compact) re-applies it, so
  // DML never silently degrades a partition-pruned layout into flat
  // files — the pruning a reader relies on survives mutations.
  private def tableMetaFile(path: String) = new Path(logDir(path), "_table.json")

  /** Partition columns the table was created with (empty = flat). */
  def tablePartitioning(spark: SparkSession, path: String): Seq[String] =
    tableMetaBody(spark, path).flatMap(
      """"partitionBy"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(_)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq))
      .getOrElse(Nil)

  /** Sort-order columns recorded for native writes (empty = none). */
  def tableSortBy(spark: SparkSession, path: String): Seq[String] =
    tableMetaBody(spark, path).flatMap(
      """"sortBy"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(_)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq))
      .getOrElse(Nil)

  /** Record a write sort order (the Iceberg `write.sort.by` table
    * property): subsequent NATIVE writes range-distribute flat tables
    * on these columns (and sort within the partition leaves of
    * partitioned ones), so data files land with DISJOINT footer
    * min/max ranges and the stats pruner (B18) opens only the files a
    * point/range read can match. Metadata-only — existing files are
    * untouched until rewritten.
    */
  def setSortBy(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    val expect = currentMetaVer(spark, path)
    writeTableMeta(spark, path, tablePartitioning(spark, path),
      metaSchema(spark, path), cols, tableChecks(spark, path), dvEnabled(spark, path),
      expectVer = Some(expect))
  }

  /** DSv2 per-column statistics for SupportsReportStatistics scans —
    * what Spark's OWN cost-based optimizer (join reorder keys on
    * rowCount × NDV) consumes: NDV and string lengths from the stored
    * ANALYZE results, null counts footer-exact from the sidecars.
    * Snapshot-level, so callers must only attach it to UNPRUNED scans.
    */
  private[graft] def v2ColumnStats(spark: SparkSession, path: String,
      cols: Seq[String]): java.util.Map[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    val m = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    val ndv = tableNdv(spark, path)
    val nulls = aggregatedColumnNulls(spark, path)
      .map(_._2).getOrElse(Map.empty[String, Long])
    cols.foreach { c =>
      val nd = ndv.get(c)
      val nn = nulls.get(c)
      if (nd.isDefined || nn.isDefined) {
        m.put(org.apache.spark.sql.connector.expressions.Expressions.column(c),
          new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def distinctCount(): java.util.OptionalLong =
              nd.fold(java.util.OptionalLong.empty())(r =>
                java.util.OptionalLong.of(r.ndv))
            override def nullCount(): java.util.OptionalLong =
              nn.fold(java.util.OptionalLong.empty())(java.util.OptionalLong.of)
            override def maxLen(): java.util.OptionalLong =
              nd.filter(_.maxLen >= 0).fold(java.util.OptionalLong.empty())(r =>
                java.util.OptionalLong.of(r.maxLen))
            override def avgLen(): java.util.OptionalLong =
              nd.filter(_.avgLen >= 0).fold(java.util.OptionalLong.empty())(r =>
                java.util.OptionalLong.of(math.round(r.avgLen)))
          })
      }
    }
    m
  }

  /** One column's stored ANALYZE result: approximate distinct count,
    * string length stats (-1 when not a string column), and the
    * snapshot version it measured — Hive/Delta ANALYZE semantics:
    * stats are as-of their collection, staleness is the caller's
    * trade, and a planner treats them as estimates.
    */
  final case class ColumnNdv(ndv: Long, maxLen: Long, avgLen: Double, asOf: Long)

  /** Stored ANALYZE results by column (empty until [[analyze]] runs). */
  def tableNdv(spark: SparkSession, path: String): Map[String, ColumnNdv] =
    tableMetaBody(spark, path).flatMap(
      """"ndvB64"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(_)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
          .map { b64 =>
            val s = new String(java.util.Base64.getDecoder.decode(b64), StandardCharsets.UTF_8)
            val a = s.split("\t")
            a(0) -> ColumnNdv(a(1).toLong, a(2).toLong, a(3).toDouble, a(4).toLong)
          }.toMap))
      .getOrElse(Map.empty)

  /** ANALYZE TABLE: one distributed aggregate pass collecting
    * approx_count_distinct per column (HLL — exact below its sparse
    * threshold, ~2-5% beyond) plus max/avg byte length for strings,
    * recorded in the table meta via the CAS (so concurrent DDL can't
    * be lost) and stamped with the snapshot version measured. This is
    * what upgrades the HMS facade's served numDVs from a sound bound
    * to a real estimate — the statistic CBOs (Hive/Trino/Spark) key
    * join-order decisions on — and makes string columns servable
    * (StringColumnStatsData needs lengths). Unlike the footer
    * sidecars, the scan applies deletion vectors: DV'd rows don't
    * count. O(data) but single-pass and column-pruned to the targets;
    * at 100 TB you run it per-partition-load or sampled, same as
    * every warehouse. Empty `cols` = all atomic columns.
    */
  def analyze(spark: SparkSession, path: String,
      cols: Seq[String] = Nil): Map[String, ColumnNdv] = {
    import org.apache.spark.sql.functions._
    // CAS token BEFORE the first read (writeTableMeta's contract): the
    // stats are keyed by the column names read HERE, so a concurrent
    // rename publishing during the aggregate must fail this publish
    // (retryable) — capturing the token at the end would let the stale
    // pre-rename names overwrite the renamed meta (caught by the
    // MetaIntegritySpec analyze-vs-rename race).
    val expect = currentMetaVer(spark, path)
    val v = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val df = read(spark, path, Some(v))
    val atomic: org.apache.spark.sql.types.DataType => Boolean = {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.BooleanType |
           org.apache.spark.sql.types.DateType | org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    val targets =
      (if (cols.isEmpty) df.schema.fields.toSeq
       else cols.flatMap(c => df.schema.fields.find(_.name.equalsIgnoreCase(c))))
        .filter(f => atomic(f.dataType))
    if (targets.isEmpty) return tableNdv(spark, path)
    val aggs = targets.zipWithIndex.flatMap { case (f, i) =>
      val base = approx_count_distinct(col(f.name)).as(s"__ndv$i")
      f.dataType match {
        case org.apache.spark.sql.types.StringType =>
          Seq(base, max(octet_length(col(f.name))).cast("long").as(s"__max$i"),
            avg(octet_length(col(f.name))).as(s"__avg$i"))
        case _ => Seq(base)
      }
    }
    val row = df.agg(aggs.head, aggs.drop(1): _*).head()
    val fresh = targets.zipWithIndex.map { case (f, i) =>
      val ndv = row.getAs[Long](s"__ndv$i")
      val (mx, av) = f.dataType match {
        case org.apache.spark.sql.types.StringType =>
          (if (row.isNullAt(row.fieldIndex(s"__max$i"))) -1L
           else row.getAs[Long](s"__max$i"),
           if (row.isNullAt(row.fieldIndex(s"__avg$i"))) -1.0
           else row.getAs[Double](s"__avg$i"))
        case _ => (-1L, -1.0)
      }
      f.name -> ColumnNdv(ndv, mx, av, v)
    }.toMap
    val merged = tableNdv(spark, path) ++ fresh
    writeTableMeta(spark, path, tablePartitioning(spark, path),
      metaSchema(spark, path), tableSortBy(spark, path), tableChecks(spark, path),
      dvEnabled(spark, path), ndv = Some(merged),
      expectVer = Some(expect))
    merged
  }

  /** Stats WRITE-BACK: record externally-computed column statistics
    * (an HMS client's ANALYZE — Hive's `update_table_column_statistics`
    * verb) into the same store [[analyze]] fills, so an external
    * engine's stats round-trip through the facade and feed Spark's own
    * CBO identically. Same CAS discipline as analyze: the token is
    * captured BEFORE the merge read, so a concurrent DDL (rename)
    * publishing mid-verb fails this publish instead of being
    * overwritten with stale column names.
    */
  def recordNdv(spark: SparkSession, path: String,
      fresh: Map[String, ColumnNdv]): Map[String, ColumnNdv] = {
    val expect = currentMetaVer(spark, path)
    val merged = tableNdv(spark, path) ++ fresh
    writeTableMeta(spark, path, tablePartitioning(spark, path),
      metaSchema(spark, path), tableSortBy(spark, path), tableChecks(spark, path),
      dvEnabled(spark, path), ndv = Some(merged), expectVer = Some(expect))
    merged
  }

  /** Drop one column's stored ANALYZE/write-back record (Hive's
    * `delete_table_column_statistics`). No-op when absent.
    */
  def dropNdv(spark: SparkSession, path: String, colName: String): Unit = {
    val expect = currentMetaVer(spark, path)
    val cur = tableNdv(spark, path)
    val remaining = cur.filterNot(_._1.equalsIgnoreCase(colName))
    if (remaining.size == cur.size) return
    writeTableMeta(spark, path, tablePartitioning(spark, path),
      metaSchema(spark, path), tableSortBy(spark, path), tableChecks(spark, path),
      dvEnabled(spark, path), ndv = Some(remaining), expectVer = Some(expect))
  }

  /** Stored PER-PARTITION ANALYZE/write-back records, by Hive
    * partition name ("col=v/col2=v2") then column. Same staleness
    * semantics as [[tableNdv]]; the partition name is base64-wrapped
    * inside each entry so partition VALUES may contain any character.
    */
  def partitionNdv(spark: SparkSession, path: String)
      : Map[String, Map[String, ColumnNdv]] =
    tableMetaBody(spark, path).flatMap(
      """"pndvB64"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(_)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
          .map { b64 =>
            val s = new String(java.util.Base64.getDecoder.decode(b64), StandardCharsets.UTF_8)
            val a = s.split("\t")
            val part = new String(java.util.Base64.getDecoder.decode(a(0)), StandardCharsets.UTF_8)
            (part, a(1), ColumnNdv(a(2).toLong, a(3).toLong, a(4).toDouble, a(5).toLong))
          }
          .groupBy(_._1)
          .map { case (p, g) => p -> g.map(t => t._2 -> t._3).toMap }))
      .getOrElse(Map.empty)

  /** PARTITION-level stats write-back (Hive's
    * `update_partition_column_statistics`): merge one partition's
    * externally-computed column records into the per-partition store
    * the HMS facade serves reads from. Same CAS discipline as
    * [[recordNdv]] — the token is captured before the merge read.
    */
  def recordPartitionNdv(spark: SparkSession, path: String, partName: String,
      fresh: Map[String, ColumnNdv]): Unit = {
    val expect = currentMetaVer(spark, path)
    val cur = partitionNdv(spark, path)
    val merged = cur + (partName -> (cur.getOrElse(partName, Map.empty) ++ fresh))
    writeTableMeta(spark, path, tablePartitioning(spark, path),
      metaSchema(spark, path), tableSortBy(spark, path), tableChecks(spark, path),
      dvEnabled(spark, path), pndv = Some(merged), expectVer = Some(expect))
  }

  /** Drop one partition-column record — or, with colName null, ALL of
    * the partition's records (the Hive wire's
    * `delete_partition_column_statistics` convention, mirroring the
    * table-level verb). No-op when absent.
    */
  def dropPartitionNdv(spark: SparkSession, path: String, partName: String,
      colName: String): Unit = {
    val expect = currentMetaVer(spark, path)
    val cur = partitionNdv(spark, path)
    val pruned = cur.get(partName) match {
      case None => return
      case Some(_) if colName == null => cur - partName
      case Some(cols) =>
        val remaining = cols.filterNot(_._1.equalsIgnoreCase(colName))
        if (remaining.size == cols.size) return
        if (remaining.isEmpty) cur - partName else cur + (partName -> remaining)
    }
    writeTableMeta(spark, path, tablePartitioning(spark, path),
      metaSchema(spark, path), tableSortBy(spark, path), tableChecks(spark, path),
      dvEnabled(spark, path), pndv = Some(pruned), expectVer = Some(expect))
  }

  /** PARTITION EVOLUTION (the Iceberg marquee): change the table's
    * partition spec WITHOUT rewriting a byte of data. Metadata-only —
    * subsequent appends and COW rewrites lay their new file groups out
    * under the new spec while existing groups keep theirs; the read
    * path already unions per-group layouts by name (partition columns
    * surface from paths or data files interchangeably) and the stats
    * pruner derives each FILE's partition values from its own path, so
    * old-spec and new-spec groups each prune under whatever layout
    * they actually have. At 100 TB this is the difference between
    * "repartitioning the table" being a metadata commit vs a
    * multi-day rewrite. Old snapshots are untouched: time travel
    * before the spec change reads exactly what it always did.
    */
  def setPartitioning(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    val expect = currentMetaVer(spark, path)
    writeTableMeta(spark, path, cols, metaSchema(spark, path),
      tableSortBy(spark, path), tableChecks(spark, path), dvEnabled(spark, path),
      // spec changed while data exists → old and new groups may differ
      markMixed = currentVersion(spark, path).isDefined,
      expectVer = Some(expect))
  }

  /** One column-mapping change, stamped with the first table version
    * it does NOT apply to: a group whose dir version < stamp was
    * written under the pre-change schema and needs the mapping at scan
    * assembly; groups at/after wrote the current schema natively. The
    * stamp is what disambiguates DROP-then-re-ADD of the same name:
    * without it, a chain entry would capture the RE-ADDED column in
    * groups that postdate the change.
    */
  private[graft] sealed trait MapRec { def stamp: Long }
  /** RENAME (and, via a tombstone target, DROP): physical `old` in
    * pre-stamp groups is what the logical schema calls `to`.
    */
  private[graft] final case class RenameRec(old: String, to: String, stamp: Long)
      extends MapRec {
    def dropped: Boolean = to.startsWith(DroppedPrefix)
  }
  /** TYPE WIDENING: pre-stamp groups carry `col` at a narrower
    * physical type; scan assembly casts them to `toDdl`.
    */
  private[graft] final case class WidenRec(col: String, toDdl: String, stamp: Long)
      extends MapRec
  private[graft] val DroppedPrefix = "__graft_dropped_"

  /** The ordered column-mapping chain (renames, drops, type widenings)
    * — the Delta column-mapping analogue. Metadata-only: no change on
    * this chain ever rewrites a file; readers apply each group exactly
    * the entries that postdate it, and the next COW rewrite migrates.
    */
  def tableMappings(spark: SparkSession, path: String): Seq[MapRec] =
    tableMetaBody(spark, path).flatMap(
      """"mappingsB64"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(_)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
          .map { b64 =>
            val s = new String(java.util.Base64.getDecoder.decode(b64), StandardCharsets.UTF_8)
            s.split("\t") match {
              case Array("r", o, n, v) => RenameRec(o, n, v.toLong)
              case Array("w", c, t, v) => WidenRec(c, t, v.toLong)
              case other => throw new IllegalStateException(
                s"bad mapping record '${other.mkString("\\t")}' in the $path table meta")
            }
          }))
      .getOrElse(Nil)

  /** Rename/drop entries only — what prior-name resolution (stats
    * pruning) consumes.
    */
  def tableRenames(spark: SparkSession, path: String): Seq[RenameRec] =
    tableMappings(spark, path).collect { case r: RenameRec => r }

  /** RENAME COLUMN as a metadata-only change (ALTER TABLE ... RENAME
    * COLUMN): no file is rewritten. The rename chain applies at read
    * time per file group, so old-physical-name and new-name groups
    * serve one logical schema; writes after the rename use the new
    * name natively; pruning consults sidecar stats under BOTH names.
    * Applies to the whole table (all snapshots) — the Delta
    * column-mapping semantic: rename is logical, history shows the
    * current logical names.
    */
  def renameColumn(spark: SparkSession, path: String, oldName: String,
      newName: String): Unit = {
    val sch = tableSchema(spark, path)
    require(sch.fieldNames.contains(oldName), s"no column $oldName in ${sch.fieldNames.mkString(",")}")
    require(!sch.fieldNames.contains(newName), s"column $newName already exists")
    // A CHECK holding the old name would silently stop resolving on
    // the next write — reject, like dropColumn does.
    val ref = ("""\b""" + java.util.regex.Pattern.quote(oldName) + """\b""").r
    tableChecks(spark, path).foreach { case (cn, expr) =>
      require(ref.findFirstIn(expr).isEmpty,
        s"cannot rename $oldName: CHECK constraint $cn references it ($expr)")
    }
    appendMapping(spark, path, oldName, newName)
  }

  /** DROP COLUMN as a metadata-only change (B59): no file is
    * rewritten. The column maps to a reserved tombstone name on the
    * same stamped chain renames use; scan assembly projects tombstones
    * away, so every snapshot serves the narrowed schema while old
    * files keep their bytes. Re-ADDing the same name later is safe:
    * the stamp confines the tombstone mapping to pre-drop groups, so
    * the new column's data in newer groups is never captured. The
    * next COW rewrite / compaction physically sheds the column.
    */
  def dropColumn(spark: SparkSession, path: String, name: String): Unit = {
    val sch = tableSchema(spark, path)
    require(sch.fieldNames.contains(name), s"no column $name in ${sch.fieldNames.mkString(",")}")
    require(sch.fields.length > 1, s"cannot drop the only column $name")
    require(!tablePartitioning(spark, path).contains(name),
      s"cannot drop partition column $name (change the partition spec first)")
    require(!tableSortBy(spark, path).contains(name),
      s"cannot drop sort column $name (clear write.sort.by first)")
    val ref = ("""\b""" + java.util.regex.Pattern.quote(name) + """\b""").r
    tableChecks(spark, path).foreach { case (cn, expr) =>
      require(ref.findFirstIn(expr).isEmpty,
        s"cannot drop $name: CHECK constraint $cn references it ($expr)")
    }
    appendMapping(spark, path, name,
      DroppedPrefix + java.util.UUID.randomUUID.toString.take(8))
  }

  /** ALTER COLUMN TYPE as a metadata-only change (B61), restricted to
    * LOSSLESS widenings (the Delta/Iceberg type-widening sets): no
    * file is rewritten; pre-change groups keep the narrow physical
    * type and scan assembly casts them per group; writes after the
    * change carry the wide type natively; the next COW rewrite
    * migrates. Lossy conversions (narrowing, long→double past 2^53,
    * scale truncation) reject.
    */
  /** The Delta/Iceberg lossless type-widening set. */
  private[graft] def losslessWidening(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (f, t) if f == t => false // no-op rejects loudly at the caller
      case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
      case (ShortType, IntegerType | LongType | DoubleType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) =>
        t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
      case _ => false
    }
  }

  def widenColumn(spark: SparkSession, path: String, name: String,
      newType: org.apache.spark.sql.types.DataType): Unit = {
    val sch = tableSchema(spark, path)
    require(sch.fieldNames.contains(name), s"no column $name in ${sch.fieldNames.mkString(",")}")
    require(!tablePartitioning(spark, path).contains(name),
      s"cannot change the type of partition column $name")
    val from = sch(name).dataType
    require(losslessWidening(from, newType),
      s"$from -> $newType is not a lossless widening for $name")
    appendToChain(spark, path, WidenRec(name, newType.catalogString, 0L),
      metaUpdate = m => org.apache.spark.sql.types.StructType(
        m.fields.map(f => if (f.name == name) f.copy(dataType = newType) else f)))
  }

  private def appendMapping(spark: SparkSession, path: String, oldName: String,
      newName: String): Unit = {
    val dropped = newName.startsWith(DroppedPrefix)
    appendToChain(spark, path, RenameRec(oldName, newName, 0L),
      metaUpdate = m => org.apache.spark.sql.types.StructType(
        if (dropped) m.fields.filterNot(_.name == oldName)
        else m.fields.map(f => if (f.name == oldName) f.copy(name = newName) else f)),
      partsUpdate = _.map(c => if (c == oldName) newName else c))
  }

  private def appendToChain(spark: SparkSession, path: String, rec: MapRec,
      metaUpdate: org.apache.spark.sql.types.StructType => org.apache.spark.sql.types.StructType,
      partsUpdate: Seq[String] => Seq[String] = identity): Unit = {
    // CAS token FIRST: the chain/schema/spec reads below feed the new
    // meta, so a concurrent DDL publishing after them must fail this
    // write rather than be silently overwritten (last-writer-wins on
    // the chain would drop its entry — column identity corruption).
    val expect = currentMetaVer(spark, path)
    commitColumnDdl(spark, path, expect, Seq(rec),
      partsUpdate(tablePartitioning(spark, path)),
      // renames follow through the write sort order too — a stale old
      // name there would break the next native write's distribution
      partsUpdate(tableSortBy(spark, path)),
      metaSchema(spark, path).map(metaUpdate))
  }

  /** ONE atomic multi-change column DDL (ALTER TABLE with several
    * clauses): all mapping records land on the chain in statement
    * order under a single stamp and ONE meta CAS — a statement that
    * fails validation persists nothing, and a rename of a column
    * ADDed in the same statement works because `finalSchema` is the
    * caller's fold over every clause. `parts`/`sortBy` are the fold's
    * incrementally-renamed partition spec and sort order (computed
    * clause by clause — re-deriving them here from disk via a rename
    * map mis-follows chained renames), and `expectVer` is the CAS
    * token the caller captured BEFORE its first meta read, per
    * writeTableMeta's contract — a concurrent DDL publishing between
    * those reads and this commit must fail the CAS, not be
    * overwritten.
    */
  private[graft] def alterColumnsAtomic(spark: SparkSession, path: String,
      recs: Seq[MapRec], finalSchema: org.apache.spark.sql.types.StructType,
      parts: Seq[String], sortBy: Seq[String], expectVer: Long): Unit =
    commitColumnDdl(spark, path, expectVer, recs, parts, sortBy, Some(finalSchema))

  /** The CAS token for a caller-composed meta mutation (the metaVer a
    * multi-read DDL captures before its first meta read).
    */
  private[graft] def metaCasToken(spark: SparkSession, path: String): Long =
    currentMetaVer(spark, path)

  /** Shared stamp-and-publish tail of every column DDL: computes the
    * confinement stamp, appends `recs` (in order, one shared stamp) to
    * the chain, and writes the table meta once under `expect`'s CAS.
    */
  private def commitColumnDdl(spark: SparkSession, path: String, expect: Long,
      recs: Seq[MapRec], parts: Seq[String], sortBy: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType]): Unit = {
    // Stamp = the next data version: every EXISTING group (dir version
    // <= current) carries the pre-change physical schema; groups
    // written from here on use the new logical schema natively. The
    // stamp also clears the largest dir-NAME version in the head — a
    // shallow clone references source dirs whose names carry the
    // SOURCE's version numbers, and a clone-side change must still
    // postdate all of them.
    val cur = currentVersion(spark, path)
    val maxDirVer = cur.map(v => readCommit(spark, path, v).dirs.map { e =>
      val k = groupKey(e)
      if (k.startsWith("d") && k.indexOf('-') > 1)
        try k.substring(1, k.indexOf('-')).toLong catch { case _: NumberFormatException => -1L }
      else -1L
    }.foldLeft(-1L)(math.max)).getOrElse(-1L)
    // STAGED dirs too (on disk, not yet committed): a blind append
    // racing this DDL has already named its dir with the pre-change
    // data inside — the stamp must land ABOVE it or that group's
    // version would equal the stamp and its old-name data would never
    // map. One root listing; same cost class as the meta read.
    val stagedMax = {
      val root = new Path(path); val fs = fsOf(spark, root)
      if (!fs.exists(root)) -1L
      else fs.listStatus(root).iterator.map(_.getPath.getName)
        .filter(n => n.startsWith("d") && n.indexOf('-') > 1)
        .flatMap(n => scala.util.Try(n.substring(1, n.indexOf('-')).toLong).toOption)
        .foldLeft(-1L)(math.max)
    }
    val stamp = math.max(cur.getOrElse(-1L), math.max(maxDirVer, stagedMax)) + 1
    val stamped = recs.map {
      case r: RenameRec => r.copy(stamp = stamp)
      case w: WidenRec  => w.copy(stamp = stamp)
    }
    // ANALYZE entries follow the DDL: a renamed column keeps its stats
    // under the new name, a dropped one sheds them (a later re-ADD of
    // the same name must NOT inherit the dead column's NDV — stats for
    // a different column under a reused name are worse than none),
    // widening keeps them (lossless, same value set).
    val ndvFollowed = stamped.foldLeft(tableNdv(spark, path)) {
      case (m, r: RenameRec) if r.dropped => m - r.old
      case (m, r: RenameRec) =>
        m.get(r.old).fold(m)(v => (m - r.old) + (r.to -> v))
      case (m, _) => m
    }
    // ...and the PER-PARTITION records follow the same rule, per
    // partition — preserving them verbatim would leave stale keys
    // that a re-ADDed column would resurrect (the exact hazard the
    // comment above forbids for table stats).
    val pndvFollowed = partitionNdv(spark, path).map { case (pn, cols) =>
      pn -> stamped.foldLeft(cols) {
        case (m, r: RenameRec) if r.dropped => m - r.old
        case (m, r: RenameRec) =>
          m.get(r.old).fold(m)(v => (m - r.old) + (r.to -> v))
        case (m, _) => m
      }
    }.filter(_._2.nonEmpty)
    writeTableMeta(spark, path, parts, schema, sortBy,
      tableChecks(spark, path), dvEnabled(spark, path),
      // pre-change groups and post-change groups must read per root —
      // only when the chain actually grew (schema-only DDL keeps the
      // single-scan fast path)
      markMixed = cur.isDefined && stamped.nonEmpty,
      mappings = if (stamped.isEmpty) None
                 else Some(tableMappings(spark, path) ++ stamped),
      ndv = Some(ndvFollowed),
      pndv = Some(pndvFollowed),
      expectVer = Some(expect))
  }

  /** Apply the mapping chain to one file group's frame. Only entries
    * stamped AFTER the group's creation version apply (the group was
    * written under the pre-change schema); within those, the presence
    * guards keep re-introduced names from double-mapping and widening
    * casts fire only while the physical type still differs. Entries
    * apply in chain order, so a widen recorded before a later rename
    * sees the column under its then-current name. Tombstone targets
    * are projected away at the end.
    */
  private def applyMappings(df: DataFrame, mappings: Seq[MapRec],
      groupVersion: Long): DataFrame = {
    val mapped = mappings.foldLeft(df) {
      case (d, r: RenameRec) =>
        if (groupVersion < r.stamp && d.columns.contains(r.old)
            && !d.columns.contains(r.to)) d.withColumnRenamed(r.old, r.to)
        else d
      case (d, w: WidenRec) =>
        if (groupVersion < w.stamp && d.columns.contains(w.col)) {
          val target = org.apache.spark.sql.types.DataType.fromDDL(w.toDdl)
          if (d.schema(w.col).dataType != target)
            d.withColumn(w.col, org.apache.spark.sql.functions.col(w.col).cast(target))
          else d
        } else d
    }
    val tombs = mapped.columns.filter(_.startsWith(DroppedPrefix))
    if (tombs.isEmpty) mapped else mapped.drop(tombs.toIndexedSeq: _*)
  }

  /** A group dir's creation version, parsed from its `dN-uuid` name.
    * Absolute-URI entries (shallow-clone / branch references) parse the
    * same way: clone dirs carry the SOURCE table's version numbers, the
    * copied chain's stamps are source-version-based (directly
    * comparable), and [[shallowClone]] starts the clone's own
    * numbering ABOVE everything it copied — so one version axis spans
    * referenced and native groups. Collapsing absolute refs to
    * MinValue instead would discard the stamp confinement: a source
    * that dropped then re-added a column would have the re-added data
    * tombstoned in every clone.
    */
  private def groupVersionOf(entry: String): Long = {
    val k = groupKey(entry)
    if (k.startsWith("d") && k.indexOf('-') > 1)
      try k.substring(1, k.indexOf('-')).toLong
      catch { case _: NumberFormatException => Long.MinValue }
    else Long.MinValue
  }

  /** True once a partition-spec change may have left groups with
    * different directory layouts (see writeTableMeta).
    */
  private[graft] def hasMixedLayouts(spark: SparkSession, path: String): Boolean =
    tableMetaBody(spark, path).exists(_.contains("\"mixedLayouts\":true"))

  /** The raw `_table.json` body, or None when the table has none.
    * FAILS LOUDLY on a malformed body — the schema chain in this file
    * now determines column identity, so "unparseable → empty chain"
    * would silently serve wrong columns; with the tmp+rename write
    * protocol a torn body can only mean real corruption.
    */
  private def tableMetaBody(spark: SparkSession, path: String): Option[String] = {
    val p = tableMetaFile(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      if (!(body.startsWith("{") && body.trim.endsWith("}")))
        throw new IllegalStateException(
          s"corrupt table meta at $p (${body.length} bytes): ${body.take(80)}")
      Some(body)
    }
  }

  /** Monotonic table-meta version — the CAS token every `_table.json`
    * mutation claims. 0 = no meta yet (or a pre-versioning file).
    */
  private def currentMetaVer(spark: SparkSession, path: String): Long =
    tableMetaBody(spark, path).flatMap(
      """"metaVer"\s*:\s*(\d+)""".r.findFirstMatchIn(_).map(_.group(1).toLong))
      .getOrElse(0L)

  /** One writer for every `_table.json` mutation so no path drops a
    * key another recorded (updateSchemaMeta used to erase nothing only
    * because partitioning was the single other key).
    *
    * Concurrency: the meta is read-modify-write state (DDL reads the
    * chain/checks/spec it extends), so publication is a CAS — the
    * writer claims `.claim-meta-v<expect+1>` with an atomic exclusive
    * create and renames a tmp file in; content atomicity comes from
    * the rename (readers never see a torn body), lost updates from the
    * claim (two DDLs racing from the same base: one wins, the loser
    * gets ConcurrentWriteException and must re-run against the new
    * meta). Callers that read meta state to compute the new value pass
    * the `expectVer` they captured BEFORE those reads.
    */
  private def writeTableMeta(spark: SparkSession, path: String, parts: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType],
      sortBy: Seq[String],
      checks: Seq[(String, String)],
      dvMode: Boolean,
      markMixed: Boolean = false,
      mappings: Option[Seq[MapRec]] = None,
      ndv: Option[Map[String, ColumnNdv]] = None,
      pndv: Option[Map[String, Map[String, ColumnNdv]]] = None,
      expectVer: Option[Long] = None): Unit = {
    val expect = expectVer.getOrElse(currentMetaVer(spark, path))
    val fields = Seq.newBuilder[String]
    fields += s""""partitionBy":[${parts.map(c => "\"" + c + "\"").mkString(",")}]"""
    // ANALYZE results: explicit new map, or preserved from current meta
    val nd = ndv.getOrElse(tableNdv(spark, path))
    if (nd.nonEmpty) {
      val enc = nd.toSeq.sortBy(_._1).map { case (c, r) =>
        "\"" + java.util.Base64.getEncoder.encodeToString(
          s"$c\t${r.ndv}\t${r.maxLen}\t${r.avgLen}\t${r.asOf}"
            .getBytes(StandardCharsets.UTF_8)) + "\""
      }
      fields += s""""ndvB64":[${enc.mkString(",")}]"""
    }
    // per-partition ANALYZE/write-back records, preserved like ndv
    val pnd = pndv.getOrElse(partitionNdv(spark, path))
    if (pnd.nonEmpty) {
      val enc = pnd.toSeq.sortBy(_._1).flatMap { case (part, colsMap) =>
        val pb = java.util.Base64.getEncoder.encodeToString(
          part.getBytes(StandardCharsets.UTF_8))
        colsMap.toSeq.sortBy(_._1).map { case (c, r) =>
          "\"" + java.util.Base64.getEncoder.encodeToString(
            s"$pb\t$c\t${r.ndv}\t${r.maxLen}\t${r.avgLen}\t${r.asOf}"
              .getBytes(StandardCharsets.UTF_8)) + "\""
        }
      }
      fields += s""""pndvB64":[${enc.mkString(",")}]"""
    }
    // mapping chain: explicit new value, or preserved from the current meta
    val ren = mappings.getOrElse(tableMappings(spark, path))
    if (ren.nonEmpty) {
      val enc = ren.map { r =>
        val line = r match {
          case RenameRec(o, n, v) => s"r\t$o\t$n\t$v"
          case WidenRec(c, t, v)  => s"w\t$c\t$t\t$v"
        }
        "\"" + java.util.Base64.getEncoder.encodeToString(
          line.getBytes(StandardCharsets.UTF_8)) + "\""
      }
      fields += s""""mappingsB64":[${enc.mkString(",")}]"""
    }
    // MONOTONIC mixed-layout marker (partition evolution, B53): set
    // when a spec change leaves groups of different layouts behind,
    // preserved by every later meta rewrite. Readers route mixed
    // tables through the per-group-root union (always correct) and
    // keep the single-scan fast path for never-evolved flat tables.
    if (markMixed || hasMixedLayouts(spark, path)) fields += "\"mixedLayouts\":true"
    if (dvMode) fields += "\"dvMode\":true"
    if (sortBy.nonEmpty)
      fields += s""""sortBy":[${sortBy.map(c => "\"" + c + "\"").mkString(",")}]"""
    if (checks.nonEmpty) {
      // name TAB sql, base64 per entry: constraint SQL may contain any
      // character, so it never touches the JSON-ish syntax above
      val encoded = checks.map { case (n, sql) =>
        "\"" + java.util.Base64.getEncoder.encodeToString(
          s"$n\t$sql".getBytes(StandardCharsets.UTF_8)) + "\""
      }
      fields += s""""checksB64":[${encoded.mkString(",")}]"""
    }
    schema.foreach { sch =>
      val b64 = java.util.Base64.getEncoder.encodeToString(
        sch.json.getBytes(StandardCharsets.UTF_8))
      fields += s""""schemaB64":"$b64""""
    }
    fields += s""""metaVer":${expect + 1}"""
    val meta = tableMetaFile(path)
    val fs = fsOf(spark, meta)
    fs.mkdirs(logDir(path))
    val lock = new Path(logDir(path), f".claim-meta-v${expect + 1}%05d")
    val token = java.util.UUID.randomUUID.toString
    if (!tryExclusiveCreateToken(fs, lock, token)) {
      // The claim may be an ORPHAN: a writer that crashed between
      // claiming and publishing leaves the claim on disk with metaVer
      // still at `expect`, which would brick every future meta
      // mutation. Reclaimable iff the version is UNPUBLISHED (metaVer
      // didn't move — a published v<expect+1> means this CAS genuinely
      // lost) AND the claim is older than the lease (a younger claim
      // is a live writer mid-publish). Lease default 15 min,
      // tunable via spark.graft.meta.claimLeaseMs.
      val leaseMs = spark.conf.getOption("spark.graft.meta.claimLeaseMs")
        .map(_.toLong).getOrElse(15L * 60 * 1000)
      val reclaimed = currentMetaVer(spark, path) == expect && {
        val age =
          try System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
          catch { case _: java.io.FileNotFoundException => -1L } // racer mid-flight
        age > leaseMs && { fs.delete(lock, false); tryExclusiveCreateToken(fs, lock, token) }
      }
      if (!reclaimed)
        throw new ConcurrentWriteException(
          s"table-meta change lost the race at $meta (expected metaVer $expect): " +
          "a concurrent DDL published first — re-run against the new table state")
    }
    val tmp = new Path(logDir(path),
      s".tmp-meta-${java.util.UUID.randomUUID.toString.take(8)}.json")
    val out = fs.create(tmp, true)
    try out.write(("{" + fields.result().mkString(",") + "}")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // Ownership re-verify: the reclaim path's delete-then-create is
    // NOT atomic — two reclaimers both past the lease check can
    // interleave (A deletes+creates, B deletes A's fresh claim and
    // creates its own) and each believes it owns the claim. The token
    // written at create time disambiguates: whoever's token is in the
    // claim file NOW owns the publish; the other aborts instead of
    // silently overwriting a metaVer that already carried a DDL. The
    // metaVer re-read closes the second ordering (B stat'd the orphan
    // before A replaced it, A published in between): a version that
    // already moved means the claim B holds is for a SPENT version.
    // Residual (accepted): if BOTH reclaimers pass this re-verify
    // before either renames — A's whole delete+create+verify landing
    // inside B's verify→rename gap — both publish. That needs two
    // writers to see the SAME claim lease-expired (a crashed third
    // writer plus a 15-minute standoff) and then a sub-millisecond
    // interleave; full closure needs a compare-and-swap primitive the
    // filesystem API doesn't offer — on a store that has one
    // (conditional PUT), tryExclusiveCreateToken is the swap point.
    if (!claimToken(fs, lock).contains(token)
        || currentMetaVer(spark, path) != expect) {
      fs.delete(tmp, false)
      throw new ConcurrentWriteException(
        s"table-meta claim for $meta was reclaimed by a concurrent writer " +
        s"(expected metaVer $expect): re-run against the new table state")
    }
    if (!fs.rename(tmp, meta)) {
      // HDFS-semantics stores refuse a rename onto an existing target
      // (local FS replaces atomically). The claim already serialized
      // writers, so delete+rename is race-free there; the not-found
      // window it opens for readers is the store's own trade.
      if (fs.exists(meta)) fs.delete(meta, false)
      if (!fs.rename(tmp, meta)) {
        fs.delete(tmp, false)
        // Release the claim: metaVer stays at `expect`, so keeping the
        // claim would block every future mutation until lease expiry.
        fs.delete(lock, false)
        throw new IllegalStateException(s"table-meta rename failed for $meta")
      }
    }
  }

  /** CHECK constraints recorded on the table as (name, boolean SQL).
    * Enforced on every write path: API verbs through the writeGroup
    * guard, native DSv2 writes through a per-row bound predicate in
    * the task writer. SQL-standard semantics: NULL passes.
    */
  def tableChecks(spark: SparkSession, path: String): Seq[(String, String)] =
    tableMetaBody(spark, path).flatMap { body =>
      """"checksB64"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(body)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
          .map { b64 =>
            val s = new String(java.util.Base64.getDecoder.decode(b64), StandardCharsets.UTF_8)
            val i = s.indexOf('\t')
            (s.substring(0, i), s.substring(i + 1))
          })
    }.getOrElse(Nil)

  /** Add a CHECK constraint (the Delta `ALTER TABLE ADD CONSTRAINT`
    * capability): EXISTING data is validated first — one scan; a
    * violated constraint is rejected rather than recorded — then the
    * constraint guards every subsequent write.
    */
  def addCheck(spark: SparkSession, path: String, name: String, sql: String): Unit = {
    import org.apache.spark.sql.functions.{expr => fexpr}
    val expect = currentMetaVer(spark, path)
    val existing = tableChecks(spark, path)
    require(!existing.exists(_._1 == name), s"constraint $name already exists")
    val violations =
      read(spark, path).where(fexpr(s"NOT coalesce(($sql), true)")).limit(1).count()
    require(violations == 0,
      s"cannot add CHECK constraint $name: existing rows violate ($sql)")
    writeTableMeta(spark, path, tablePartitioning(spark, path),
      metaSchema(spark, path), tableSortBy(spark, path), existing :+ (name -> sql),
      dvEnabled(spark, path), expectVer = Some(expect))
  }

  def dropCheck(spark: SparkSession, path: String, name: String): Unit = {
    val expect = currentMetaVer(spark, path)
    writeTableMeta(spark, path, tablePartitioning(spark, path),
      metaSchema(spark, path), tableSortBy(spark, path),
      tableChecks(spark, path).filterNot(_._1 == name), dvEnabled(spark, path),
      expectVer = Some(expect))
  }

  /** Delta's enableDeletionVectors table property: when ON, SQL DELETE
    * and UPDATE route through the merge-on-read verbs (deleteMor /
    * updateMor) instead of copy-on-write group rewrites.
    */
  def dvEnabled(spark: SparkSession, path: String): Boolean =
    tableMetaBody(spark, path).exists(
      """"dvMode"\s*:\s*true""".r.findFirstIn(_).isDefined)

  def setDvMode(spark: SparkSession, path: String, on: Boolean): Unit = {
    val expect = currentMetaVer(spark, path)
    writeTableMeta(spark, path, tablePartitioning(spark, path),
      metaSchema(spark, path), tableSortBy(spark, path), tableChecks(spark, path), on,
      expectVer = Some(expect))
  }

  /** Create (or replace) the table as version 0. */
  def create(spark: SparkSession, path: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): Long = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, true)
    invalidateSchemaCache(spark, path)
    val dir = writeGroup(spark, path, 0L, df, partitionBy)
    if (partitionBy.nonEmpty) {
      // The schema rides along (base64 of its JSON, dodging escaping):
      // an EMPTY partitioned create writes no parquet files at all, so
      // schema inference has nothing to read until the first insert —
      // the meta is the fallback that keeps DDL-then-INSERT resolvable.
      writeTableMeta(spark, path, partitionBy, Some(df.schema), Nil, Nil, dvMode = false)
    }
    writeCommit(spark, path, Commit(0L, "create", Seq(dir)))
    0L
  }

  /** Schema recorded in the table meta, if any. */
  private def metaSchema(spark: SparkSession, path: String)
      : Option[org.apache.spark.sql.types.StructType] =
    tableMetaBody(spark, path).flatMap(
      """"schemaB64"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(_)
        .map(m => org.apache.spark.sql.types.DataType.fromJson(
          new String(java.util.Base64.getDecoder.decode(m.group(1)), StandardCharsets.UTF_8))
          .asInstanceOf[org.apache.spark.sql.types.StructType]))

  /** Record `schema` (and keep the partitioning) in the table meta —
    * the ALTER TABLE ADD COLUMNS persistence: files stay untouched,
    * reads surface the new columns as NULL until data arrives.
    */
  private[graft] def updateSchemaMeta(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val expect = currentMetaVer(spark, path)
    writeTableMeta(spark, path, tablePartitioning(spark, path), Some(schema),
      tableSortBy(spark, path), tableChecks(spark, path), dvEnabled(spark, path),
      expectVer = Some(expect))
  }

  /** Bounded process-wide schema cache. Schema derivation walks every
    * group root with a mergeSchema read — one Spark inference JOB per
    * root — and Spark's analyzer asks a table for its schema many
    * times per statement (schema(), capabilities(), scan build, write
    * build), so an uncached INSERT into a multi-group table was paying
    * ~30 sequential ~100 ms inference jobs of pure re-derivation. The
    * key is exact: (qualified path, data version, meta version) —
    * any write moves the data version, any DDL moves the metaVer, so
    * entries are immutable once computed. LRU-bounded; access-ordered.
    */
  private val schemaCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long, Long), org.apache.spark.sql.types.StructType](
          64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long, Long), org.apache.spark.sql.types.StructType])
            : Boolean = size() > 256
      })

  /** Footer-merged FILE schema per (qualified path + sorted dir set,
    * -, metaVer) — the single-scan partitioned read's inference
    * result. The dir set pins the snapshot exactly (any write changes
    * it), so entries are immutable; same LRU bound as the table-schema
    * cache, same path-wide invalidation on create/clone/drop.
    */
  private val fileSchemaCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long, Long), org.apache.spark.sql.types.StructType](
          64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long, Long), org.apache.spark.sql.types.StructType])
            : Boolean = size() > 256
      })

  /** Separator between the qualified table path and the dir-set suffix
    * in fileSchemaCache keys. ONE constant shared by key construction
    * and invalidation — the two sites diverging (NUL here, " " there)
    * silently turns the re-create purge into a no-op.
    */
  private val FileSchemaKeySep = "\u0000"

  /** Drop every cached schema for `path`. Needed when a table is
    * RE-CREATED at the same path (create-replace, clone onto an
    * existing path, catalog DROP + CREATE): the new generation starts
    * again at data version 0 and may reuse the old metaVer, so the
    * (path, dataVer, metaVer) key would collide and serve the DROPPED
    * generation's schema. In-JVM only — a re-create from another host
    * is the same caveat as any non-notifying store; the first write
    * or DDL there moves a version component and self-heals.
    */
  private[graft] def invalidateSchemaCache(spark: SparkSession, path: String): Unit = {
    val q = fsOf(spark, new Path(path)).makeQualified(new Path(path)).toString
    schemaCache.synchronized {
      schemaCache.keySet.removeIf(k => k._1 == q)
    }
    fileSchemaCache.synchronized {
      // file-schema keys prefix with the same qualified path
      fileSchemaCache.keySet.removeIf(k => k._1.startsWith(q + FileSchemaKeySep))
    }
  }

  /** Table schema: the UNION of the snapshot's file-inferred schema
    * and the meta-recorded one (create-time for empty partitioned
    * tables, updated by ALTER TABLE ADD COLUMNS) — file-evolved and
    * DDL-evolved columns both surface, each nullable until data lands.
    */
  def tableSchema(spark: SparkSession, path: String,
      version: Option[Long] = None): org.apache.spark.sql.types.StructType = {
    val resolved = version.orElse(currentVersion(spark, path))
    val key = resolved.map(v => (
      fsOf(spark, new Path(path)).makeQualified(new Path(path)).toString,
      v, currentMetaVer(spark, path)))
    key.flatMap(k => Option(schemaCache.get(k))) match {
      case Some(hit) => hit
      case None =>
        val computed = tableSchemaUncached(spark, path, resolved)
        key.foreach(k => schemaCache.put(k, computed))
        computed
    }
  }

  private def tableSchemaUncached(spark: SparkSession, path: String,
      version: Option[Long]): org.apache.spark.sql.types.StructType = {
    val inferred =
      try Some(read(spark, path, version).schema)
      catch { case e: org.apache.spark.sql.AnalysisException =>
        metaSchema(spark, path) match {
          case Some(m) => return m
          case None => throw e
        }
      }
    val i = inferred.get
    metaSchema(spark, path) match {
      case Some(m) =>
        val have = i.fieldNames.toSet
        val byName = m.fields.map(f => f.name -> f).toMap
        org.apache.spark.sql.types.StructType(
          // The meta schema's field METADATA (column DEFAULTs,
          // comments) is authoritative over whatever the files
          // round-tripped: files pin the metadata of their write
          // time, and ALTER COLUMN SET/DROP DEFAULT must take effect
          // without rewriting them.
          i.fields.map(f => byName.get(f.name) match {
            case Some(mf) => f.copy(metadata = mf.metadata)
            case None => f
          }) ++ m.fields.filterNot(f => have(f.name)).map(_.copy(nullable = true)))
      case None => i
    }
  }

  /** Append a new file group; existing groups are untouched.
    *
    * BLIND-APPEND optimistic concurrency (the Delta semantic): an
    * append reads no table data, so it conflicts with NO concurrent
    * commit — losing the version-claim race rebases the already-staged
    * group onto the new head and retries the METADATA commit only.
    * N concurrent appenders each write their data exactly once and
    * all N succeed at consecutive versions; at 100 TB this is the
    * difference between a multi-writer ingest fleet and "retry the
    * whole job". Data written under a since-evolved partition spec or
    * column mapping stays correct: the group keeps its write-time
    * layout/names and the per-group readers (B57/B58) assemble it.
    */
  def append(spark: SparkSession, path: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    // No explicit layout → the table's CURRENT spec (which partition
    // evolution may have changed since create): new groups always land
    // under the spec in force at write time.
    val spec = if (partitionBy.nonEmpty) partitionBy else tablePartitioning(spark, path)
    val dir = writeGroup(spark, path, prev + 1, df, spec)
    commitBlindAppend(spark, path, prev, dir, txn = None)
  }

  /** Publish an already-staged group as an append, rebasing past
    * concurrent winners (their commits plus this dir compose — blind
    * appends have an empty read set). Claim losses where the winner's
    * publish is still in flight (claim marker up, commit rename not
    * yet visible) back off briefly and re-resolve.
    */
  private def commitBlindAppend(spark: SparkSession, path: String, basePrev: Long,
      dir: String, txn: Option[(String, Long)]): Long = {
    var prev = basePrev
    var attempts = 0
    while (true) {
      val c = readCommit(spark, path, prev)
      val v = prev + 1
      // CDC: an append's change records ARE the appended rows, so no
      // change file is written at all — the commit carries an `@dir`
      // marker and readers synthesize (change_type='insert',
      // _commit_version=v) from the data group. Appends with the feed
      // on pay ZERO write amplification (the Delta insert-only-commit
      // optimization); only row-mutating commits write change files.
      val cdc = cdcKey(spark, path).map(_ => "@" + dir)
      try {
        writeCommit(spark, path, Commit(v, "append", c.dirs :+ dir, cdc, txn = txn))
        return v
      } catch {
        case e: CommitRaceLostException =>
          attempts += 1
          if (attempts >= 32)
            throw new ConcurrentWriteException(
              s"append to $path gave up after $attempts rebases: ${e.getMessage}")
          val head = currentVersion(spark, path).getOrElse(prev)
          if (head < v) Thread.sleep(5L * attempts) // winner mid-publish
          prev = math.max(head, prev)
      }
    }
    -1L // unreachable
  }

  /** Latest application version `appId` has committed to this table
    * (the Delta `txnVersion` idempotent-write query). Newest-first
    * walk over the retained log — bounded by vacuum retention; a
    * writer restarting after a long gap pays one log sweep, then its
    * next marker is near the head again.
    */
  def txnVersion(spark: SparkSession, path: String, appId: String): Option[Long] = {
    val cur = currentVersion(spark, path).getOrElse(return None)
    (cur to 0L by -1).iterator.flatMap { v =>
      try readCommit(spark, path, v).txn.collect { case (a, tv) if a == appId => tv }
      catch { case _: java.io.FileNotFoundException => None } // vacuumed tail
    }.maxOption
  }

  /** IDEMPOTENT append (the Delta `txnAppId`/`txnVersion` contract —
    * what turns an at-least-once foreachBatch file sink into
    * exactly-once): the write commits only if `appId` has not already
    * committed a version ≥ `appVersion`; a replayed micro-batch after
    * a restart becomes a no-op. Returns true when this call committed.
    * A concurrent-racer loss re-checks and retries, so two replays of
    * the same (appId, appVersion) can never both land.
    */
  def appendOnce(spark: SparkSession, path: String, df: DataFrame,
      appId: String, appVersion: Long, partitionBy: Seq[String] = Nil): Boolean = {
    var attempts = 0
    var staged: Option[String] = None
    while (true) {
      // The idempotence check runs before EVERY commit attempt (not
      // just the first): a race loss may have been to our own twin
      // replaying the same (appId, appVersion). A staged-but-unneeded
      // dir is an orphan vacuum reclaims — same as any race loser.
      if (txnVersion(spark, path, appId).exists(_ >= appVersion)) return false
      val prev = currentVersion(spark, path)
        .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
      val c = readCommit(spark, path, prev)
      val v = prev + 1
      val spec = if (partitionBy.nonEmpty) partitionBy
        else tablePartitioning(spark, path)
      // Stage the data ONCE; retries after a lost race rebase the same
      // group dir (blind appends read nothing — only the metadata
      // commit needs redoing).
      val dir = staged.getOrElse {
        val d = writeGroup(spark, path, v, df, spec); staged = Some(d); d
      }
      val cdc = cdcKey(spark, path).map(_ => "@" + dir)
      try {
        writeCommit(spark, path,
          Commit(v, "append", c.dirs :+ dir, cdc, txn = Some(appId -> appVersion)))
        return true
      } catch {
        case e: CommitRaceLostException =>
          // Lost the version race: someone else committed v (possibly
          // OUR twin replaying the same batch) — re-check and retry.
          attempts += 1
          if (attempts >= 8)
            throw new ConcurrentWriteException(
              s"appendOnce($appId, $appVersion) gave up after $attempts rebases: ${e.getMessage}")
          if (currentVersion(spark, path).exists(_ < v))
            Thread.sleep(5L * attempts) // winner mid-publish
      }
    }
    false // unreachable
  }

  // ---- native-DSv2 staged commits -----------------------------------
  //
  // The native BatchWrite/StreamingWrite path (GraftWrite.scala) has
  // its TASKS write parquet straight into a staged group dir under the
  // table root; these driver-side verbs turn a staged dir into a
  // commit through the same file-group/commit-log protocol as the API
  // verbs — one place decides atomicity. `keepFiles` are the
  // dir-relative paths the committed task messages name: anything else
  // in the staged dir is debris from zombie/speculative task attempts
  // and is removed before the stats harvest, so a task the scheduler
  // abandoned mid-write can never leak duplicate rows into the commit.

  private[graft] sealed trait StagedMode
  private[graft] object StagedMode {
    case object Append extends StagedMode
    /** Full-table overwrite as a NEW VERSION pointing only at the
      * staged group — history-preserving (time travel keeps the old
      * snapshot), unlike `create` which resets the table.
      */
    case object Overwrite extends StagedMode
    /** INSERT OVERWRITE ... PARTITION (static) / replaceWhere. */
    final case class ReplaceWhere(predicate: org.apache.spark.sql.Column) extends StagedMode
    /** Dynamic partition overwrite: replace exactly the partitions
      * present in the staged data; every other partition carries
      * forward (as partition-subdir entries when a group is split).
      */
    case object DynamicPartitions extends StagedMode
  }

  private[graft] def commitStaged(spark: SparkSession, path: String, stagedDir: String,
      keepFiles: Seq[String], mode: StagedMode, txn: Option[(String, Long)] = None,
      createPartitionBy: Seq[String] = Nil,
      createSchema: Option[org.apache.spark.sql.types.StructType] = None): Long = {
    import StagedMode._
    val stagedPath = new Path(path, stagedDir)
    val fs = fsOf(spark, stagedPath)
    if (!fs.exists(stagedPath)) fs.mkdirs(stagedPath)
    val keep = keepFiles.toSet
    val base = fs.makeQualified(stagedPath).toString
    val files = fs.listFiles(stagedPath, true)
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val rel = fs.makeQualified(f.getPath).toString.stripPrefix(base + "/")
        if (!keep(rel)) fs.delete(f.getPath, false)
      }
    }
    writeStats(spark, path, stagedDir)
    val hasData = keepFiles.nonEmpty
    currentVersion(spark, path) match {
      case None =>
        // First write to a fresh path: create at version 0 (the staged
        // dir IS the v0 group). Partitioned DDL tables already exist
        // (the catalog's createTable commits v0), so createPartitionBy
        // only matters for path-based first writes.
        if (createPartitionBy.nonEmpty) {
          val b64 = java.util.Base64.getEncoder.encodeToString(
            createSchema.getOrElse(org.apache.spark.sql.types.StructType(Nil))
              .json.getBytes(StandardCharsets.UTF_8))
          val meta = tableMetaFile(path)
          val out = fsOf(spark, meta).create(meta, true)
          try out.write(
            (s"""{"partitionBy":[${createPartitionBy.map(c => "\"" + c + "\"").mkString(",")}],""" +
              s""""schemaB64":"$b64"}""").getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
        writeCommit(spark, path, Commit(0L, "create", Seq(stagedDir), None, txn = txn))
        0L
      case Some(prev) =>
        val c = readCommit(spark, path, prev)
        val v = prev + 1
        val parts = tablePartitioning(spark, path)
        mode match {
          case Append =>
            // Zero-write-amplification CDC marker, like append().
            val cdc = if (hasData) cdcKey(spark, path).map(_ => "@" + stagedDir) else None
            val dirs = if (hasData) c.dirs :+ stagedDir else c.dirs
            writeCommit(spark, path, Commit(v, "append", dirs, cdc, txn = txn))
          case Overwrite =>
            val cdc = cdcKey(spark, path).map { k =>
              writeCdc(spark, path, v, diffFrames(read(spark, path, Some(prev)),
                readDirs(spark, path, Seq(stagedDir)), k, preimages = true))
            }
            writeCommit(spark, path, Commit(v, "overwrite", Seq(stagedDir), cdc, txn = txn))
          case ReplaceWhere(pred) =>
            val (touched, untouched) = splitDirs(spark, path, c.dirs,
              predicateBounds(read(spark, path, Some(prev)), pred))
            val old =
              if (touched.isEmpty) read(spark, path, Some(prev)).limit(0)
              else readDirsLive(spark, path, touched, prev)
            val rewritten =
              if (touched.isEmpty) None
              else Some(writeGroup(spark, path, v,
                old.where(!coalesce(pred, lit(false))), parts))
            val cdc = cdcKey(spark, path).map { k =>
              writeCdc(spark, path, v, diffFrames(old,
                readDirs(spark, path, rewritten.toSeq :+ stagedDir), k, preimages = true))
            }
            writeCommit(spark, path,
              Commit(v, "replace", (untouched ++ rewritten) :+ stagedDir, cdc, txn = txn))
          case DynamicPartitions =>
            require(parts.nonEmpty,
              "dynamic partition overwrite requires a partitioned table")
            val replaced = partitionLeaves(spark, Seq(stagedPath.toString), parts)
              .map(_._1).toSet
            val tableQ = fs.makeQualified(new Path(path)).toString
            def rel(p: Path): String = p.toString.stripPrefix(tableQ + "/")
            val keepDirs = Seq.newBuilder[String]
            val droppedLeaves = Seq.newBuilder[String]
            c.dirs.foreach { entry =>
              val leaves = partitionLeaves(spark,
                Seq(new Path(path, entry).toString), parts)
              val (drop, keepL) = leaves.partition { case (values, _) => replaced(values) }
              if (drop.isEmpty) keepDirs += entry
              else {
                keepL.foreach { case (_, leaf) => keepDirs += rel(leaf) }
                droppedLeaves ++= drop.map { case (_, leaf) => rel(leaf) }
              }
            }
            val cdc = cdcKey(spark, path).map { k =>
              val ds = droppedLeaves.result()
              val oldDf =
                if (ds.isEmpty) read(spark, path, Some(prev)).limit(0)
                else readDirsLive(spark, path, ds, prev)
              writeCdc(spark, path, v, diffFrames(oldDf,
                readDirs(spark, path, Seq(stagedDir)), k, preimages = true))
            }
            writeCommit(spark, path,
              Commit(v, "replace", keepDirs.result() :+ stagedDir, cdc, txn = txn))
        }
        v
    }
  }

  /** TIMESTAMP AS OF resolution: the newest version whose commit time
    * is ≤ `tsMillis` (None = the table didn't exist yet). Commits
    * record wall-clock publish time; the walk is newest-first so the
    * common "recent timestamp" case reads O(1) commits (an ancient
    * timestamp walks the retained log — bounded by vacuum retention).
    */
  def versionAt(spark: SparkSession, path: String, tsMillis: Long): Option[Long] = {
    val cur = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    var v = cur
    while (v >= 0) {
      val ok = try readCommit(spark, path, v).ts <= tsMillis
      catch { case _: java.io.FileNotFoundException => return None } // vacuumed past
      if (ok) return Some(v)
      v -= 1
    }
    None
  }

  /** Snapshot read; `version` selects an older snapshot (time travel).
    * mergeSchema tolerates per-group schema evolution (add-column).
    * Deletion vectors recorded at or before the snapshot (B46
    * merge-on-read) are applied; rewritten groups shed theirs by dir
    * rename, older snapshots read pre-delete state by version.
    */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, path))
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val c = readCommit(spark, path, v)
    readDirsDv(spark, path, c.dirs, dvFor(spark, path, v, c.dirs), withPos = false)
  }

  // ---- deletion vectors (merge-on-read DELETE, B46) -----------------

  private def dvDirPath(path: String) = new Path(path, "_dv")

  /** Parse a DV file name `v<version>-<uuid8>-<group>.dv` →
    * (version, group). The uuid makes racing writers' files distinct;
    * only the name the PUBLISHED commit references counts.
    */
  private def parseDvName(n: String): Option[(Long, String)] = {
    if (!n.startsWith("v") || !n.endsWith(".dv")) return None
    val core = n.stripSuffix(".dv")
    val c1 = core.indexOf('-')
    if (c1 < 2) return None
    val c2 = core.indexOf('-', c1 + 1)
    if (c2 < 0) return None
    scala.util.Try((core.substring(1, c1).toLong, core.substring(c2 + 1))).toOption
  }

  /** Resolved DV state per group at `version`: group root →
    * (publishing file name, file_path → roaring blob). DVs are
    * CUMULATIVE per (version, group), so one file per group resolves
    * the state; a candidate only counts if the commit of its version
    * actually references it (an orphan from a lost commit race never
    * applies). One listing + one commit read per DV'd group-version.
    */
  private def dvResolve(spark: SparkSession, path: String, version: Long,
      dirs: Seq[String]): Map[String, (String, Map[String, Array[Byte]])] = {
    val d = dvDirPath(path)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) return Map.empty
    val groups = dirs.map(groupKey).toSet
    // Verification: a candidate applies iff the commit of its version
    // references it. A VACUUMED commit (file gone) accepts its
    // survivors — vacuum already removed every unreferenced orphan, so
    // what remains below the horizon is exactly the resolved state.
    val commitDv = scala.collection.mutable.Map.empty[Long, Option[Set[String]]]
    def referenced(v: Long): Option[Set[String]] = commitDv.getOrElseUpdate(v,
      readCommitOpt(spark, path, v).map(_.dvFiles.toSet))
    fs.listStatus(d).map(_.getPath.getName)
      .flatMap(n => parseDvName(n).map { case (v, g) => (v, g, n) })
      .filter { case (v, g, _) => v <= version && groups(g) }
      .groupBy(_._2)
      .flatMap { case (g, cands) =>
        cands.sortBy(-_._1).collectFirst {
          case (v, _, n) if referenced(v).forall(_.contains(n)) =>
            g -> (n, readDvFile(spark, path, n))
        }
      }
  }

  /** [[dvResolve]] without the file names — the read-path view. */
  private[graft] def dvFor(spark: SparkSession, path: String, version: Long,
      dirs: Seq[String]): Map[String, Map[String, Array[Byte]]] =
    dvResolve(spark, path, version, dirs).map { case (g, (_, m)) => g -> m }

  private def readDvFile(spark: SparkSession, path: String,
      name: String): Map[String, Array[Byte]] = {
    val p = new Path(dvDirPath(path), name)
    val in = new java.io.DataInputStream(fsOf(spark, p).open(p))
    try {
      val n = in.readInt()
      (0 until n).map { _ =>
        val f = in.readUTF()
        val bytes = new Array[Byte](in.readInt())
        in.readFully(bytes)
        f -> bytes
      }.toMap
    } finally in.close()
  }

  /** Write one group's cumulative DV under a UNIQUE name (racing
    * writers never clobber each other); returns the name for the
    * commit to reference — only referenced files ever apply.
    * Conf-parameterized so EXECUTOR tasks can call it (the
    * distributed MOR tail ships the session conf by broadcast).
    */
  private def writeDvFileWith(conf: org.apache.hadoop.conf.Configuration,
      path: String, v: Long, group: String,
      files: Map[String, Array[Byte]]): String = {
    val name = f"v$v%05d-${java.util.UUID.randomUUID.toString.take(8)}-$group.dv"
    val p = new Path(dvDirPath(path), name)
    val out = new java.io.DataOutputStream(p.getFileSystem(conf).create(p, true))
    try {
      out.writeInt(files.size)
      files.foreach { case (f, bytes) =>
        out.writeUTF(f)
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    } finally out.close()
    name
  }

  private def writeDvFile(spark: SparkSession, path: String, v: Long, group: String,
      files: Map[String, Array[Byte]]): String =
    writeDvFileWith(spark.sparkContext.hadoopConfiguration, path, v, group, files)

  /** Merge-on-read DELETE (the Delta/Iceberg-v3 deletion-vector
    * capability): matching rows are marked in per-file roaring bitmaps
    * keyed by parquet `_metadata` (file_path, row_index) — NO data
    * file is rewritten, the commit re-references every existing dir,
    * and write cost tracks the DELETED row count, not the touched
    * file-group size (the point-delete shape COW pays a group rewrite
    * for). Reads apply the vectors at scan time; `compact` purges them
    * back to the fast path; time travel before the delete sees the
    * rows; the CDC feed gets real delete records (the matched rows are
    * in hand). DVs accumulate per group: each delete writes the UNION
    * of prior and new marks, so readers resolve one DV file per group.
    */
  def deleteMor(spark: SparkSession, path: String, predicate: org.apache.spark.sql.Column): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val v = prev + 1
    val c = readCommit(spark, path, prev)
    val dv0 = dvFor(spark, path, prev, c.dirs)
    val live = readDirsDv(spark, path, c.dirs, dv0, withPos = true)
    if (!live.columns.contains("__file")) { // empty DDL table: no files
      writeCommit(spark, path, Commit(v, "delete-mor", c.dirs))
      return v
    }
    val matched = live.where(predicate)
    val marks = matched.groupBy(col("__file"))
      .agg(graft.functions.Bitmaps.bitmapBuild(col("__pos")).as("bm"))
      .toDF("__file", "bm")
    val dvNames = mergeAndWriteDv(spark, path, v, c.dirs, dv0, marks)
    if (dvNames.isEmpty) { // nothing matched: pure metadata commit
      writeCommit(spark, path, Commit(v, "delete-mor", c.dirs))
      return v
    }
    val cdc = cdcKey(spark, path).map { k =>
      val rows = matched.drop("__file", "__pos")
      writeCdc(spark, path, v, diffFrames(rows, rows.limit(0), k, preimages = true))
    }
    writeCommit(spark, path, Commit(v, "delete-mor", c.dirs, cdc, dvFiles = dvNames))
    v
  }

  /** Delta RESTORE: roll the table back to `toVersion`'s state as a
    * NEW commit re-referencing that snapshot's dirs — O(1) in data
    * size, history preserved (the rolled-back versions stay
    * time-travelable until vacuum). Deletion-vector state pins by
    * REWRITING toVersion's per-group vector state under the new
    * version — an EMPTY vector file masks interim vectors for groups
    * that had none at toVersion. CDC (if enabled) records the full
    * state diff, the Delta-CDF restore contract.
    */
  def restore(spark: SparkSession, path: String, toVersion: Long): Long = {
    val cur = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    require(toVersion <= cur, s"cannot restore $path to future version $toVersion (current $cur)")
    val old = readCommit(spark, path, toVersion)
    val v = cur + 1
    val restoredGroups = old.dirs.map(groupKey).toSet
    val stateAtTo = dvResolve(spark, path, toVersion, old.dirs)
    // groups of the restored snapshot with ANY vector file ≤ cur need
    // pinning (interim MOR deletes would otherwise leak into v)
    val d = dvDirPath(path)
    val fs = fsOf(spark, d)
    val groupsWithAny =
      if (!fs.exists(d)) Set.empty[String]
      else fs.listStatus(d).map(_.getPath.getName)
        .flatMap(parseDvName).filter(_._1 <= cur).map(_._2).toSet
        .intersect(restoredGroups)
    val dvNames = groupsWithAny.toSeq.sorted.map { g =>
      writeDvFile(spark, path, v, g,
        stateAtTo.get(g).map(_._2).getOrElse(Map.empty))
    }
    val cdc = cdcKey(spark, path).map { k =>
      writeCdc(spark, path, v, diffFrames(read(spark, path, Some(cur)),
        read(spark, path, Some(toVersion)), k, preimages = true))
    }
    writeCommit(spark, path, Commit(v, "restore", old.dirs, cdc, dvFiles = dvNames))
    v
  }

  // ---- named tags (Iceberg tags: human-readable snapshot pins) ------

  private def tagsFile(path: String) = new Path(logDir(path), "_tags.json")

  /** All tags: name → pinned version. */
  def tags(spark: SparkSession, path: String): Map[String, Long] = {
    val p = tagsFile(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toLong).toMap
    }
  }

  private def writeTags(spark: SparkSession, path: String, t: Map[String, Long]): Unit = {
    val p = tagsFile(path)
    val out = fsOf(spark, p).create(p, true)
    try out.write(("{" + t.toSeq.sortBy(_._1)
      .map { case (n, v) => s""""$n":$v""" }.mkString(",") + "}")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Pin `name` to `version` (the Iceberg tag): `VERSION AS OF 'name'`
    * resolves through it. Version must exist at tag time; vacuum does
    * NOT consult tags (document tags as retention-advisory like Delta
    * names nothing — pin retention accordingly).
    */
  def setTag(spark: SparkSession, path: String, name: String, version: Long): Unit = {
    require(name.nonEmpty && !name.forall(_.isDigit),
      s"tag '$name' must be non-numeric (numeric strings resolve as versions)")
    // The tags file is write-by-format/read-by-regex: a quote or
    // backslash in a name would corrupt it and silently drop or alter
    // OTHER tags on the next read — reject at the door instead.
    require(name.forall(c => c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"tag '$name' may only contain letters, digits, '.', '_', '-'")
    readCommit(spark, path, version) // existence check, throws if absent
    writeTags(spark, path, tags(spark, path) + (name -> version))
  }

  def dropTag(spark: SparkSession, path: String, name: String): Unit =
    writeTags(spark, path, tags(spark, path) - name)

  /** Resolve a version STRING: numeric = the version itself, anything
    * else = a tag name.
    */
  def resolveVersion(spark: SparkSession, path: String, spec: String): Long =
    if (spec.forall(_.isDigit)) spec.toLong
    else tags(spark, path).getOrElse(spec,
      throw new IllegalArgumentException(s"no tag '$spec' on $path"))

  /** Shared MOR tail, fully distributed: the per-file mark bitmaps
    * stay in `marks` (columns `__file`, `bm`) — tasks group them by
    * file-group, union each group's new marks into its prior
    * cumulative DV (broadcast; the read path already materialized it
    * for the vector filter) and write that group's DV file from the
    * EXECUTOR; the driver collects only the written NAMES (the
    * bloom-build shape). Driver memory no longer scales with
    * touched-file count, so a broad DELETE over 10⁶ files collects
    * 10⁶ short strings, not 10⁶ bitmap blobs. Returns the names for
    * the commit to reference; empty = no row matched.
    */
  private def mergeAndWriteDv(spark: SparkSession, path: String, v: Long,
      dirs: Seq[String], dv0: Map[String, Map[String, Array[Byte]]],
      marks: DataFrame): Seq[String] = {
    import org.apache.spark.sql.graftglue.Glue
    val roots = dirs.map(groupKey).distinct
    val confBc = Glue.broadcastConf(spark.sparkContext, Glue.sessionHadoopConf(spark))
    val dv0Bc = spark.sparkContext.broadcast(dv0)
    val pathStr = path
    val vv = v
    marks.select(col("__file").cast("string"), col("bm")).rdd
      .map { r =>
        val f = r.getString(0)
        val g = roots.find(g => f.contains(s"/$g/")).getOrElse(
          throw new IllegalStateException(
            s"matched file $f is under no group of v${vv - 1}"))
        (g, (f, r.getAs[Array[Byte]](1)))
      }
      // One task per touched group: a group's DV file is one writer's
      // output by construction, and its size is bounded by that
      // group's file count — the same bound the file itself has.
      .groupByKey(math.max(1,
        math.min(roots.size, spark.sparkContext.defaultParallelism)))
      .map { case (g, files) =>
        val prevFiles = dv0Bc.value.getOrElse(g, Map.empty)
        val newFiles = files.toMap
        val merged = (prevFiles.keySet ++ newFiles.keySet).map { f =>
          val bm = new org.roaringbitmap.longlong.Roaring64Bitmap
          prevFiles.get(f).foreach(b => bm.or(graft.plans.BitmapCodec.deser(b)))
          newFiles.get(f).foreach(b => bm.or(graft.plans.BitmapCodec.deser(b)))
          f -> graft.plans.BitmapCodec.ser(bm)
        }.toMap
        writeDvFileWith(Glue.confOf(confBc), pathStr, vv, g, merged)
      }.collect().toSeq
  }

  /** Merge-on-read UPDATE: the matched rows' OLD positions are marked
    * in deletion vectors (no group rewrite) and their NEW images land
    * as one appended group — a single atomic commit referencing every
    * old dir plus the update group. Write cost ∝ updated rows; CHECK
    * constraints guard the new images through the writeGroup funnel;
    * CDC gets preimage/postimage update pairs from the rows in hand.
    */
  def updateMor(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val v = prev + 1
    val c = readCommit(spark, path, prev)
    val dv0 = dvFor(spark, path, prev, c.dirs)
    val live = readDirsDv(spark, path, c.dirs, dv0, withPos = true)
    if (!live.columns.contains("__file")) {
      writeCommit(spark, path, Commit(v, "update-mor", c.dirs))
      return v
    }
    val matched = live.where(predicate)
    val marks = matched.groupBy(col("__file"))
      .agg(graft.functions.Bitmaps.bitmapBuild(col("__pos")).as("bm"))
      .toDF("__file", "bm")
    val dvNames = mergeAndWriteDv(spark, path, v, c.dirs, dv0, marks)
    if (dvNames.isEmpty) {
      writeCommit(spark, path, Commit(v, "update-mor", c.dirs))
      return v
    }
    val oldRows = matched.drop("__file", "__pos")
    val newRows = assignments.foldLeft(oldRows) { case (acc, (cn, e)) =>
      acc.withColumn(cn, e)
    }
    val dir = writeGroup(spark, path, v, newRows, tablePartitioning(spark, path))
    val cdc = cdcKey(spark, path).map { k =>
      writeCdc(spark, path, v, diffFrames(oldRows, newRows, k, preimages = true))
    }
    writeCommit(spark, path, Commit(v, "update-mor", c.dirs :+ dir, cdc, dvFiles = dvNames))
    v
  }

  /** True iff the group dir holds at least one parquet file (a
    * schema-only create writes an EMPTY group).
    */
  private def hasParquet(spark: SparkSession, dirPath: Path): Boolean = {
    val fs = fsOf(spark, dirPath)
    if (!fs.exists(dirPath)) return false
    val it = fs.listFiles(dirPath, true)
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) return true
    false
  }

  /** Change data feed between two snapshots (the Delta-CDF / Iceberg
    * changelog capability): diff the keyed rows of `fromVersion` and
    * `toVersion` into insert/update/delete records. Row identity is
    * `key`; change detection is an 8-byte xxhash over the (sorted)
    * columns, so the full-outer join shuffles each side once on the
    * key carrying only (key, hash) plus the output columns — never a
    * quadratic compare. Inserts/updates carry the NEW row values,
    * deletes the OLD — the standard CDC contract a downstream
    * incremental consumer needs.
    */
  def changes(spark: SparkSession, path: String, key: String,
      fromVersion: Long, toVersion: Long): DataFrame =
    changes(spark, path, key, fromVersion, toVersion, preimages = false)

  /** As [[changes]]; with `preimages = true` updates emit TWO records
    * — `update_preimage` (old values) and `update_postimage` (new) —
    * the Delta-CDF contract that makes the feed ALGEBRAICALLY
    * consumable: a downstream aggregate refreshes by subtracting
    * preimage/delete contributions and adding postimage/insert ones,
    * no base rescan. Single pass: the per-row record set is built as
    * an array and exploded, so the diff join never re-executes.
    */
  def changes(spark: SparkSession, path: String, key: String,
      fromVersion: Long, toVersion: Long, preimages: Boolean): DataFrame =
    diffFrames(read(spark, path, Some(fromVersion)),
      read(spark, path, Some(toVersion)), key, preimages)

  /** Keyed diff of two row sets — the core of [[changes]], also used
    * by CDC-on-write to diff only the touched file groups of a DML
    * commit (untouched groups are common to both snapshots and cancel
    * out of the full-outer join by construction).
    *
    * Row identity contract: `key` must be UNIQUE per side. The join is
    * null-safe (`<=>`), so a single NULL-keyed row diffs like any
    * other key value instead of surfacing as a spurious delete+insert
    * pair; side presence is tracked with explicit marker columns, not
    * key nullness. Change detection compares one xxhash64 over the
    * data columns — a 64-bit old/new collision (P ≈ 2⁻⁶⁴ per updated
    * row) would silently drop that update; widen to two seeded hashes
    * if feeding a ledger where that is unacceptable.
    */
  private def diffFrames(oldDf: DataFrame, newDf: DataFrame, key: String,
      preimages: Boolean): DataFrame = {
    // union of both schemas, key first, stable order
    val dataCols = (oldDf.columns ++ newDf.columns).distinct.filter(_ != key).sorted
    def hashed(df: DataFrame, tag: String) = {
      val have = df.columns.toSet
      val aligned = df.select(col(key).as(s"${tag}_k") +: lit(1).as(s"${tag}_present") +:
        dataCols.map(c => (if (have(c)) col(c) else lit(null)).as(s"${tag}_$c")): _*)
      aligned.withColumn(s"${tag}_h",
        xxhash64(dataCols.map(c => col(s"${tag}_$c")): _*))
    }
    val o = hashed(oldDf, "o")
    val n = hashed(newDf, "n")
    val j = n.join(o, n("n_k") <=> o("o_k"), "full")
    val changeType = when(col("o_present").isNull, "insert")
      .when(col("n_present").isNull, "delete")
      .when(col("n_h") =!= col("o_h"), "update")
    val flagged = j.withColumn("change_type", changeType)
      .where(col("change_type").isNotNull)
    if (!preimages) {
      // Not coalesce(new, old): an update that sets a column to NULL
      // must surface that NULL, not resurrect the old value.
      flagged.select(col("change_type") +:
        coalesce(col("n_k"), col("o_k")).as(key) +:
        dataCols.map(c =>
          when(col("change_type") === "delete", col(s"o_$c"))
            .otherwise(col(s"n_$c")).as(c)): _*)
    } else {
      // One record-struct per emitted row, exploded — updates yield
      // [preimage, postimage] without re-executing the diff join.
      def rec(tag: String, side: String) = struct(
        lit(tag).as("change_type") +: dataCols.map(c => col(s"${side}_$c").as(c)): _*)
      flagged
        .withColumn("recs",
          when(col("change_type") === "insert", array(rec("insert", "n")))
            .when(col("change_type") === "delete", array(rec("delete", "o")))
            .otherwise(array(rec("update_preimage", "o"), rec("update_postimage", "n"))))
        .select(coalesce(col("n_k"), col("o_k")).as(key), explode(col("recs")).as("r"))
        .select(col("r.change_type").as("change_type") +: col(key) +:
          dataCols.map(c => col(s"r.$c").as(c)): _*)
    }
  }

  // ---- change data feed on write (Delta-CDF-style change files) ------
  //
  // changes() computes a diff JOIN per read — fine ad hoc, wrong as the
  // consumption path at scale. With CDC enabled, every mutating commit
  // MATERIALIZES its change records (insert/delete/update_preimage/
  // update_postimage + _commit_version) into `_cdc/<dir>`, published
  // atomically via the commit's "cdc" field. The records are computed
  // from only the TOUCHED file groups (untouched groups are identical
  // on both sides of a diff and cancel out), so the write amplification
  // tracks the mutation size, and reading the feed — batch or streaming
  // — is a pure parquet scan with version offsets, never a join.

  private def cdcMetaFile(path: String) = new Path(logDir(path), "_cdc.json")

  /** Turn the change feed ON for a single-column row identity `key`
    * (same contract as [[changes]]). Subsequent append/merge/delete/
    * update/agg-merge commits write change files; layout rewrites
    * (compact/cluster) and pruned no-ops correctly publish none.
    * Consume with [[readChangeFeed]] or
    * `readStream.format("graft").option("readChangeFeed","true")`.
    */
  def enableCdc(spark: SparkSession, path: String, key: String): Unit = {
    val p = cdcMetaFile(path)
    val out = fsOf(spark, p).create(p, true)
    try out.write(s"""{"key":"$key"}""".getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private[graft] def cdcKey(spark: SparkSession, path: String): Option[String] = {
    val p = cdcMetaFile(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      """"key"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(body).map(_.group(1))
    }
  }

  /** Feed schema: change_type, key, data columns (sorted), _commit_version. */
  def cdcSchema(spark: SparkSession, path: String): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val key = cdcKey(spark, path).getOrElse(
      throw new IllegalStateException(s"CDC not enabled on $path (LakeTable.enableCdc)"))
    val s = read(spark, path).schema
    val keyField = s.fields.find(_.name == key).getOrElse(
      throw new IllegalStateException(s"CDC key $key not in table schema of $path"))
    StructType(
      StructField("change_type", StringType) +: keyField.copy(nullable = true) +:
        (s.fields.filter(_.name != key).sortBy(_.name).map(_.copy(nullable = true)).toSeq :+
          StructField("_commit_version", LongType)))
  }

  /** Materialize one commit's change records; returns the cdc dir name
    * (unique suffix — racers stage distinct dirs, the commit decides).
    */
  private def writeCdc(spark: SparkSession, path: String, v: Long, records: DataFrame): String = {
    val dir = s"d$v-${java.util.UUID.randomUUID.toString.take(8)}"
    records.withColumn("_commit_version", lit(v))
      .write.mode("overwrite").parquet(new Path(new Path(path, "_cdc"), dir).toString)
    dir
  }

  /** One feed contribution: a change-file dir (synthetic=false) or an
    * append's data group standing in for its own insert records
    * (synthetic=true — reader adds change_type/_commit_version).
    */
  private[graft] final case class CdcSlice(version: Long, dirPath: String, synthetic: Boolean)

  private[graft] def cdcSlices(spark: SparkSession, path: String,
      fromExclusive: Long, toInclusive: Long): Seq[CdcSlice] =
    ((fromExclusive + 1) to toInclusive).flatMap { v =>
      // Versions below a clone's base (or vacuumed past) have no
      // commit file — they contributed no change records here. Any
      // OTHER read failure rethrows: silently skipping a readable-but-
      // erroring commit would drop its changes from the feed.
      readCommitOpt(spark, path, v)
        .flatMap(_.cdcDir).map { d =>
        if (d.startsWith("@"))
          CdcSlice(v, new Path(path, d.stripPrefix("@")).toString, synthetic = true)
        else CdcSlice(v, new Path(new Path(path, "_cdc"), d).toString, synthetic = false)
      }
    }

  /** Batch read of the change feed for versions in (fromExclusive,
    * toInclusive]: change files scan as-is; append groups scan ONCE
    * (vectorized, all dirs in one scan) with `_commit_version`
    * recovered from the group dir name (`d<v>-<uuid>`) — no per-append
    * plan growth and no change-file duplication for inserts.
    */
  def readChangeFeed(spark: SparkSession, path: String,
      fromExclusive: Long = -1L, toInclusive: Long = Long.MinValue): DataFrame = {
    val hi = if (toInclusive == Long.MinValue)
      currentVersion(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no LakeTable at $path"))
    else toInclusive
    val schema = cdcSchema(spark, path)
    val slices = cdcSlices(spark, path, fromExclusive, hi)
    val (synth, real) = slices.partition(_.synthetic)
    val parts = Seq.newBuilder[DataFrame]
    if (real.nonEmpty)
      parts += spark.read.schema(schema).parquet(real.map(_.dirPath): _*)
    if (synth.nonEmpty) {
      val dataCols = schema.fields.map(_.name)
        .filter(n => n != "change_type" && n != "_commit_version")
      val raw = spark.read
        .schema(org.apache.spark.sql.types.StructType(
          schema.fields.filter(f => dataCols.contains(f.name))))
        .parquet(synth.map(_.dirPath): _*)
      parts += raw
        .withColumn("change_type", lit("insert"))
        .withColumn("_commit_version",
          regexp_extract(input_file_name(), "/d(\\d+)-[0-9a-f]{8}/", 1).cast("long"))
        .select(schema.fields.map(f => col(f.name)): _*)
    }
    parts.result().reduceOption(_.unionByName(_)).getOrElse {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(Seq.empty[org.apache.spark.sql.Row].asJava, schema)
    }
  }

  // ---- file-group-granular row-level DML -----------------------------
  //
  // MERGE/DELETE/UPDATE/agg-merge must not rewrite 100 TB to touch 0.1%
  // of rows. The commit format already supports multi-dir snapshots, so
  // each mutation (a) derives conjunctive column bounds for the rows it
  // can affect, (b) splits the snapshot's file groups into touched /
  // provably-untouched with the per-file stats sidecars, (c) rewrites
  // ONLY the touched groups into one new group, and (d) carries the
  // untouched dirs forward verbatim in the commit — the Delta/Iceberg
  // copy-on-write contract. Pruning is conservative: missing stats, a
  // partition-encoded layout, or an unextractable predicate mean
  // "touched"; skipping is an optimization, never a filter.

  /** Split a snapshot's dirs under conjunctive bounds: `untouched` =
    * every file's [min,max] provably misses the bounds on some column.
    */
  private def splitDirs(spark: SparkSession, path: String, dirs: Seq[String],
      bounds: Map[String, ColumnBounds]): (Seq[String], Seq[String]) = {
    if (bounds.isEmpty || bounds.values.forall(b => b.lo.isEmpty && b.hi.isEmpty))
      return (dirs, Nil)
    // Only the keep/empty DECISION is needed here, so partition-encoded
    // groups prune too: their `col=value` subdir names are exact bounds.
    // A partitioned group where only SOME partitions can match splits
    // into per-PARTITION entries — the commit carries the untouched
    // partition subdirs forward verbatim and only matching partitions
    // feed the rewrite (a DELETE on one partition of a 1000-partition
    // group moves 1/1000th of it).
    val (pruned, _) = pruneFilesByDir(spark, path, dirs, bounds)
    val touched = Seq.newBuilder[String]; val untouched = Seq.newBuilder[String]
    pruned.foreach { pd =>
      if (!pd.files.exists(_.kept)) untouched += pd.dir
      else {
        val leaves = pd.files.groupBy(_.leaf)
        if (leaves.keySet == Set(pd.dir) || leaves.values.forall(_.exists(_.kept)))
          touched += pd.dir // flat group, or every partition matches
        else leaves.toSeq.sortBy(_._1).foreach { case (leaf, fs) =>
          if (fs.exists(_.kept)) touched += leaf else untouched += leaf
        }
      }
    }
    (touched.result(), untouched.result())
  }

  /** min/max of the mutation source's key columns — the bounds a keyed
    * MERGE can possibly touch. One tiny aggregate over the (small,
    * relative to the table) source; non-numeric/non-string keys yield
    * no bound and fall back to full rewrite.
    */
  private def keyBounds(source: DataFrame, keys: Seq[String]): Map[String, ColumnBounds] = {
    val row = source.agg(
      min(col(keys.head)).as("l0"),
      (max(col(keys.head)).as("h0") +: keys.drop(1).zipWithIndex.flatMap { case (k, i) =>
        Seq(min(col(k)).as(s"l${i + 1}"), max(col(k)).as(s"h${i + 1}"))
      }): _*).head()
    keys.zipWithIndex.map { case (k, i) =>
      def side(v: Any): Option[Any] = v match {
        case null => None
        case n: Number => Some(n)
        case s: String => Some(s)
        case _ => None
      }
      k -> ColumnBounds(side(row.get(2 * i)), side(row.get(2 * i + 1)))
    }.toMap
  }

  /** Conservative bounds from a DELETE/UPDATE predicate: top-level AND
    * of {=, <, <=, >, >=, IN, BETWEEN-ish} comparisons between a column
    * and literals, read from the ANALYZED filter over the snapshot (so
    * Spark's own resolution and implicit casts are honored). Any
    * conjunct we cannot read contributes nothing; an OR (or any other
    * root) yields no bounds → full rewrite. A column reached through a
    * cast counts only when the cast is a loss-free up-cast (order
    * preserving — a truncating cast could prune a file that matches).
    */
  private def predicateBounds(base: DataFrame,
      predicate: org.apache.spark.sql.Column): Map[String, ColumnBounds] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import org.apache.spark.sql.types.StringType
    val condOpt = base.where(predicate).queryExecution.analyzed.collectFirst {
      case f: LFilter => f.condition
    }
    if (condOpt.isEmpty) return Map.empty
    def nameOf(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case c: Cast if Cast.canUpCast(c.child.dataType, c.dataType) => nameOf(c.child)
      case _ => None
    }
    def valueOf(e: Expression): Option[Any] =
      if (!e.foldable) None
      else e.eval() match {
        case null => None
        case v if e.dataType == StringType => Some(v.toString)
        case n: Number => Some(n)
        case _ => None
      }
    val eqB = (n: String, v: Any) => n -> ColumnBounds(Some(v), Some(v))
    val loB = (n: String, v: Any) => n -> ColumnBounds(Some(v), None)
    val hiB = (n: String, v: Any) => n -> ColumnBounds(None, Some(v))
    // Try attr-op-literal, then literal-op-attr with the bound flipped.
    def cmp(l: Expression, r: Expression,
        attrLeft: (String, Any) => (String, ColumnBounds),
        attrRight: (String, Any) => (String, ColumnBounds)): Option[(String, ColumnBounds)] =
      (for (n <- nameOf(l); v <- valueOf(r)) yield attrLeft(n, v))
        .orElse(for (n <- nameOf(r); v <- valueOf(l)) yield attrRight(n, v))
    def boundOf(e: Expression): Option[(String, ColumnBounds)] = e match {
      case EqualTo(a, b) => cmp(a, b, eqB, eqB)
      case EqualNullSafe(a, b) => cmp(a, b, eqB, eqB)
      case GreaterThan(a, b) => cmp(a, b, loB, hiB)
      case GreaterThanOrEqual(a, b) => cmp(a, b, loB, hiB)
      case LessThan(a, b) => cmp(a, b, hiB, loB)
      case LessThanOrEqual(a, b) => cmp(a, b, hiB, loB)
      case In(a, vs) =>
        val lits = vs.flatMap(valueOf)
        if (lits.size != vs.size || lits.isEmpty) None
        else nameOf(a).map { n =>
          val nums = lits.collect { case x: Number => x.doubleValue() }
          if (nums.size == lits.size)
            n -> ColumnBounds(Some(Double.box(nums.min)), Some(Double.box(nums.max)))
          else {
            val ss = lits.map(_.toString)
            n -> ColumnBounds(Some(ss.min), Some(ss.max))
          }
        }
      case _ => None
    }
    // Conjunction: using any one conjunct's bounds is a SUPERSET of the
    // true matching range — safe; intersecting tightens it.
    def tighter(a: ColumnBounds, b: ColumnBounds): ColumnBounds = {
      def pick(x: Option[Any], y: Option[Any], wantMax: Boolean) = (x, y) match {
        case (Some(p: Number), Some(q: Number)) =>
          if ((p.doubleValue > q.doubleValue) == wantMax) x else y
        case (Some(p: String), Some(q: String)) => if ((p > q) == wantMax) x else y
        case (Some(_), _) => x
        case (None, o) => o
      }
      ColumnBounds(pick(a.lo, b.lo, wantMax = true), pick(a.hi, b.hi, wantMax = false))
    }
    // Disjunction: the sound ENVELOPE — a column bounded on BOTH
    // branches keeps the wider [min(lo), max(hi)]; bounded on one
    // branch only → unbounded (rows from the other branch are free).
    // This is what makes an OR-of-partition-tuples predicate (dynamic
    // partition overwrite, IN-tuple deletes) still prune.
    def wider(a: ColumnBounds, b: ColumnBounds): ColumnBounds = {
      def pick(x: Option[Any], y: Option[Any], wantMax: Boolean): Option[Any] = (x, y) match {
        case (Some(p: Number), Some(q: Number)) =>
          if ((p.doubleValue > q.doubleValue) == wantMax) x else y
        case (Some(p: String), Some(q: String)) => if ((p > q) == wantMax) x else y
        case _ => None
      }
      ColumnBounds(pick(a.lo, b.lo, wantMax = false), pick(a.hi, b.hi, wantMax = true))
    }
    def walk(e: Expression): Map[String, ColumnBounds] = e match {
      case And(l, r) =>
        val (bl, br) = (walk(l), walk(r))
        (bl.keySet ++ br.keySet).iterator.map { k =>
          k -> ((bl.get(k), br.get(k)) match {
            case (Some(a), Some(b)) => tighter(a, b)
            case (a, b) => a.orElse(b).get
          })
        }.toMap
      case Or(l, r) =>
        val (bl, br) = (walk(l), walk(r))
        bl.keySet.intersect(br.keySet).iterator
          .map(k => k -> wider(bl(k), br(k)))
          .filter { case (_, b) => b.lo.nonEmpty || b.hi.nonEmpty }.toMap
      case other => boundOf(other).toMap
    }
    walk(condOpt.get)
  }

  /** Snapshot-subset read. Partitioned layouts with MULTIPLE groups
    * cannot go through one multi-root parquet read — Spark's partition
    * discovery requires a single base path (CONFLICTING_DIRECTORY_
    * STRUCTURES otherwise) — so each group reads under its own
    * `basePath` and the groups union by name (schema evolution via
    * allowMissingColumns, same contract as mergeSchema). Empty groups
    * (a schema-only create) contribute nothing.
    */
  private def readDirs(spark: SparkSession, path: String, dirs: Seq[String]): DataFrame =
    readDirsDv(spark, path, dirs, Map.empty, withPos = false)

  /** Touched-group read with the snapshot's deletion vectors applied.
    * EVERY copy-on-write rewrite source must read LIVE rows — a plain
    * readDirs would resurrect vectored-out rows into the rewrite.
    */
  private def readDirsLive(spark: SparkSession, path: String, dirs: Seq[String],
      version: Long): DataFrame =
    readDirsDv(spark, path, dirs, dvFor(spark, path, version, dirs), withPos = false)

  /** [[readDirs]] with deletion-vector application (B46) and optional
    * file/row-position columns. DVs and positions both ride on the
    * parquet `_metadata` struct, which only exists per SCAN — so the
    * select happens on each source frame BEFORE any union. `dv` maps
    * group root → (file_path → bitmap blob); frames whose groups carry
    * no DV skip the metadata projection entirely (zero overhead for
    * the common non-MOR table).
    */
  private def readDirsDv(spark: SparkSession, path: String, dirs: Seq[String],
      dv: Map[String, Map[String, Array[Byte]]], withPos: Boolean): DataFrame = {
    // ONE broadcast of the full vector set per read plan (executors
    // fetch it once); every DV'd frame filter references the same
    // handle instead of shipping blobs inside each task's plan bytes.
    lazy val dvBc = spark.sparkContext.broadcast(dv.values.flatten.toMap)
    def finish(df: DataFrame, groups: Seq[String]): DataFrame = {
      val hasDv = groups.exists(g => dv.get(g).exists(_.nonEmpty))
      if (!hasDv && !withPos) df
      else {
        val metaed = df
          .withColumn("__file", col("_metadata.file_path"))
          .withColumn("__pos", col("_metadata.row_index"))
        val filtered =
          if (!hasDv) metaed
          else metaed.where(!org.apache.spark.sql.graftglue.Glue.column(
            graft.plans.DvDeleted(
              org.apache.spark.sql.graftglue.Glue.expression(col("__file")),
              org.apache.spark.sql.graftglue.Glue.expression(col("__pos")), dvBc)))
        if (withPos) filtered else filtered.drop("__file", "__pos")
      }
    }
    val mappings = tableMappings(spark, path)
    val flatEntries = dirs.forall(d => groupRoot(d) == d)
    // Footer merge across groups fails hard on PHYSICAL type skew (a
    // pre-normalization group stored INT where later ones hold
    // BIGINT); the per-root union coerces instead (unionByName widens
    // per Spark's type coercion), so such a table stays READABLE and
    // compaction rewrites it clean. Writes normalize types in-stream
    // now (writeGroup / GraftWriteUtil.targetSchema), so this is the
    // legacy-data escape hatch, not a hot path.
    def mergeConflict(t: Throwable): Boolean = t != null && (
      Option(t.getMessage).exists(_.contains("CANNOT_MERGE")) || mergeConflict(t.getCause))
    if (flatEntries && tablePartitioning(spark, path).isEmpty
        && !hasMixedLayouts(spark, path)) {
      // Single-scan fast path: a table with data at rename time is
      // marked mixed and routed below, so any chain here predates
      // every dir — the min version stands in for all of them.
      try finish(applyMappings(spark.read.option("mergeSchema", "true")
        .parquet(dirs.map(d => new Path(path, d).toString): _*), mappings,
        dirs.map(groupVersionOf).min),
        dirs.map(groupKey))
      catch { case e: Throwable if mergeConflict(e) =>
        readDirsUnion(spark, path, dirs, mappings, finish) }
    } else {
      // Partitioned (or subdir-entry) layout. CLEAN snapshots (no
      // deletion vectors, no mapping chain, no position columns) read
      // as ONE explicit-PartitionSpec scan spanning every group — the
      // same single-relation shape the catalog SQL path serves — so
      // the plan does NOT grow with the number of appends between
      // compactions (one scan node and ONE footer-merge inference job
      // at 200 commits, where the per-root union below pays both per
      // group root). Partition column types come from the meta-recorded
      // schema (authoritative — the catalog path's source), never
      // re-inferred from path strings.
      val partCols = tablePartitioning(spark, path)
      if (dv.isEmpty && !withPos && mappings.isEmpty && partCols.nonEmpty) {
        val meta = metaSchema(spark, path)
        if (meta.exists(m => partCols.forall(m.fieldNames.contains))) {
          val m = meta.get
          val leaves = partitionLeaves(spark,
            dirs.map(d => new Path(path, d).toString), partCols)
          val partSchema = org.apache.spark.sql.types.StructType(partCols.map(c => m(c)))
          // The footer-merged schema is immutable per (path, dir set,
          // metaVer) — cache it so repeated reads of the same snapshot
          // skip the inference job entirely.
          val key = (fsOf(spark, new Path(path)).makeQualified(new Path(path)).toString
            + FileSchemaKeySep + dirs.sorted.mkString(","), -1L, currentMetaVer(spark, path))
          val hint = Option(fileSchemaCache.get(key))
          try org.apache.spark.sql.graftglue.Glue
            .partitionedParquetDataFrame(spark, leaves, partSchema, hint) match {
            case Some((df, merged)) =>
              if (hint.isEmpty) fileSchemaCache.put(key, merged)
              return df
            case None => () // no footers (empty create) — fall through
          }
          catch { case e: Throwable if mergeConflict(e) => () } // union coerces
        }
      }
      readDirsUnion(spark, path, dirs, mappings, finish)
    }
  }

  /** Per-group-root union read: needed when rename mappings apply PER
    * ROOT (each group carries the physical names of its write time —
    * the union lines logical columns up by name), when DVs / position
    * columns ride the per-scan `_metadata` struct, when no meta schema
    * records the partition column types, or as the type-coercing
    * fallback for physically type-skewed legacy groups. Plan size here
    * is the ROOT count; compaction collapses it to one.
    */
  private def readDirsUnion(spark: SparkSession, path: String, dirs: Seq[String],
      mappings: Seq[MapRec], finish: (DataFrame, Seq[String]) => DataFrame): DataFrame = {
    val byRoot = dirs.groupBy(groupRoot).toSeq.sortBy(_._1)
    val reads = byRoot.flatMap { case (root, entries) =>
      val entryPaths = entries.map(e => new Path(path, e).toString)
        .filter(p => hasParquet(spark, new Path(p)))
      if (entryPaths.isEmpty) None
      else Some(finish(applyMappings(spark.read.option("mergeSchema", "true")
        .option("basePath", new Path(path, root).toString)
        .parquet(entryPaths: _*), mappings, groupVersionOf(root)),
        Seq(groupKey(root))))
    }
    if (reads.nonEmpty) reads.reduce(_.unionByName(_, allowMissingColumns = true))
    else metaSchema(spark, path) match {
      // A partitioned DDL create writes NO files (partitionBy of an
      // empty frame emits nothing) — an empty frame with the
      // recorded schema keeps first-write DML (MERGE-as-insert,
      // UPDATE no-op) working on the fresh table.
      case Some(sch) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
      case None => spark.read.option("mergeSchema", "true")
        .parquet(dirs.map(d => new Path(path, d).toString): _*)
    }
  }

  /** DV-applying read over a PRUNED file subset — the merge-on-read
    * catalog-SQL serving path (B46): the same broadcast-vector filter
    * as [[readDirsDv]], over only the files that survived
    * stats/partition pruning. Sound because vectors key by
    * (file_path, row_index): dropping a whole file drops its marks
    * with it, and marks never make a row MATCH a predicate.
    */
  private[graft] def readPrunedDv(spark: SparkSession, path: String,
      pruned: Seq[PrunedDir], flat: Boolean,
      dv: Map[String, Map[String, Array[Byte]]],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    lazy val dvBc = spark.sparkContext.broadcast(dv.values.flatten.toMap)
    def finish(df: DataFrame, groups: Seq[String]): DataFrame = {
      val hasDv = groups.exists(g => dv.get(g).exists(_.nonEmpty))
      if (!hasDv) df
      else df
        .withColumn("__file", col("_metadata.file_path"))
        .withColumn("__pos", col("_metadata.row_index"))
        .where(!org.apache.spark.sql.graftglue.Glue.column(
          graft.plans.DvDeleted(
            org.apache.spark.sql.graftglue.Glue.expression(col("__file")),
            org.apache.spark.sql.graftglue.Glue.expression(col("__pos")), dvBc)))
        .drop("__file", "__pos")
    }
    val mappings = tableMappings(spark, path)
    val nonEmpty = pruned.filter(_.kept.nonEmpty)
    if (nonEmpty.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (flat && mappings.isEmpty)
      finish(spark.read.option("mergeSchema", "true")
        .parquet(nonEmpty.flatMap(_.kept): _*), nonEmpty.map(p => groupKey(p.dir)))
    else nonEmpty.map { pd =>
      finish(applyMappings(spark.read.option("mergeSchema", "true").option("basePath", pd.base)
        .parquet(pd.kept: _*), mappings, groupVersionOf(pd.dir)), Seq(groupKey(pd.dir)))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** MERGE INTO (copy-on-write upsert): rows of `source` replace
    * target rows with the same `key`; unmatched source rows insert.
    * One shuffle on the key (the anti join). File-group granular: only
    * groups whose key stats intersect the source's key range are
    * rewritten; all other dirs ride the commit forward untouched, so a
    * MERGE touching 0.1% of a 100 TB table rewrites ~0.1% of it.
    */
  def merge(spark: SparkSession, path: String, source: DataFrame, key: String): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val c = readCommit(spark, path, prev)
    val (touched, untouched) = splitDirs(spark, path, c.dirs, keyBounds(source, Seq(key)))
    // limit(0) base pins the full table schema even when no group is
    // touched (pure insert) or the source is missing columns.
    val target =
      if (touched.isEmpty) read(spark, path, Some(prev)).limit(0)
      else readDirsLive(spark, path, touched, prev)
    val kept = target.join(source.select(key), Seq(key), "left_anti")
    val merged = kept.unionByName(source, allowMissingColumns = true)
    val v = prev + 1
    val dir = writeGroup(spark, path, v, merged, tablePartitioning(spark, path))
    // CDC: diff only the touched groups against their rewrite —
    // untouched groups are on both sides of the snapshot diff and
    // produce no records, so the diff cost tracks the mutation size.
    val cdc = cdcKey(spark, path).map { k =>
      writeCdc(spark, path, v,
        diffFrames(target, readDirs(spark, path, Seq(dir)), k, preimages = true))
    }
    writeCommit(spark, path, Commit(v, "merge", untouched :+ dir, cdc))
    v
  }

  /** One WHEN clause of a generalized [[mergeInto]]. Conditions and
    * value expressions reference the target as `t.<col>` and the
    * source as `s.<col>` (the aliases mergeInto joins under).
    */
  sealed trait MergeClause { def condition: Option[org.apache.spark.sql.Column] }
  /** WHEN [NOT] MATCHED [AND cond] THEN UPDATE SET col = expr, ... */
  final case class MergeUpdate(condition: Option[org.apache.spark.sql.Column],
      set: Map[String, org.apache.spark.sql.Column]) extends MergeClause
  /** WHEN [NOT] MATCHED [AND cond] THEN DELETE */
  final case class MergeDelete(condition: Option[org.apache.spark.sql.Column])
      extends MergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT (col, ...) VALUES (expr, ...) —
    * unassigned target columns become NULL.
    */
  final case class MergeInsert(condition: Option[org.apache.spark.sql.Column],
      values: Map[String, org.apache.spark.sql.Column]) extends MergeClause

  /** Generalized MERGE INTO (the full SQL statement semantics):
    *
    * {{{
    *   MERGE INTO target t USING source s ON <condition>
    *   WHEN MATCHED [AND c] THEN UPDATE SET ... | DELETE
    *   WHEN NOT MATCHED [AND c] THEN INSERT ...
    *   WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET ... | DELETE
    * }}}
    *
    * First matching clause per category wins (SQL semantics); a row
    * matched by no clause carries through unchanged (or, for unmatched
    * source rows, is not inserted). ONE full-outer join on the merge
    * condition is the whole data plan — at scale that is a single
    * shuffle on the equi-keys of the condition.
    *
    * File-group granular like [[merge]]: equi-conjuncts `t.k = s.k`
    * in the condition bound the target rows a source batch can match,
    * so only stats-intersecting groups rewrite — UNLESS a NOT MATCHED
    * BY SOURCE clause exists, which by definition touches every target
    * row. Ambiguity guard: when the condition has equi-keys and any
    * MATCHED clause exists, a source with duplicate key tuples throws
    * (one target row would take two conflicting actions) — same
    * contract as Delta's cardinality check.
    */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
      condition: org.apache.spark.sql.Column,
      matched: Seq[MergeClause],
      notMatched: Seq[MergeInsert],
      notMatchedBySource: Seq[MergeClause] = Nil): Long = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo, Expression}
    import org.apache.spark.sql.graftglue.Glue
    require(matched.forall(!_.isInstanceOf[MergeInsert]),
      "WHEN MATCHED supports UPDATE/DELETE only")
    require(notMatchedBySource.forall(!_.isInstanceOf[MergeInsert]),
      "WHEN NOT MATCHED BY SOURCE supports UPDATE/DELETE only")
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val c = readCommit(spark, path, prev)

    // Equi-key pairs (targetCol, sourceCol) mined from the condition's
    // conjuncts — they drive file-group pruning and the dup guard.
    def sideOf(e: Expression): Option[(String, String)] = e match {
      case u: UnresolvedAttribute if u.nameParts.length == 2 &&
          (u.nameParts.head == "t" || u.nameParts.head == "s") =>
        Some((u.nameParts.head, u.nameParts(1)))
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val equiPairs = conjuncts(Glue.expression(condition)).flatMap {
      case EqualTo(a, b) => (sideOf(a), sideOf(b)) match {
        case (Some(("t", tc)), Some(("s", sc))) => Some((tc, sc))
        case (Some(("s", sc)), Some(("t", tc))) => Some((tc, sc))
        case _ => None
      }
      case _ => None
    }

    if (matched.nonEmpty && equiPairs.nonEmpty) {
      val dup = source.groupBy(equiPairs.map(p => col(p._2)): _*)
        .count().where(col("count") > 1).take(1)
      if (dup.nonEmpty) throw new IllegalStateException(
        "MERGE source has duplicate rows on the join key " +
          equiPairs.map(_._2).mkString("(", ",", ")") +
          " — a matched target row would take two conflicting actions")
    }

    // NOT MATCHED BY SOURCE reads every target row by definition.
    val bounds: Map[String, ColumnBounds] =
      if (notMatchedBySource.nonEmpty || equiPairs.isEmpty) Map.empty
      else keyBounds(source, equiPairs.map(_._2))
        .map { case (sc, b) => equiPairs.find(_._2 == sc).get._1 -> b }
    // splitDirs treats empty bounds as "everything touched" (sound).
    val (touched, untouched) = splitDirs(spark, path, c.dirs, bounds)

    val tSchema = tableSchema(spark, path, Some(prev))
    // DV-mode (B46): MERGE goes merge-on-read — affected target rows
    // are carried with their (file, position) so they can be vectored
    // out instead of rewriting their groups.
    val dvMode = dvEnabled(spark, path)
    val dv0 = if (dvMode) dvFor(spark, path, prev, c.dirs)
      else Map.empty[String, Map[String, Array[Byte]]]
    val targetRaw =
      if (touched.isEmpty) {
        val base = read(spark, path, Some(prev)).limit(0)
        if (dvMode) base.withColumn("__file", lit(null).cast("string"))
          .withColumn("__pos", lit(null).cast("long"))
        else base
      }
      else if (dvMode) readDirsDv(spark, path, touched, dv0, withPos = true)
      else readDirsLive(spark, path, touched, prev)
    // Pin the full evolved schema (touched groups may predate an added
    // column) and add presence markers for the full-outer categories.
    val outNames = tSchema.fieldNames.toSeq ++
      (if (dvMode) Seq("__file", "__pos") else Nil)
    val targetFull = tSchema.fields.foldLeft(targetRaw) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(outNames.map(col): _*)
    val t = targetFull.withColumn("__graft_tp", lit(true)).alias("t")
    val s = source.withColumn("__graft_sp", lit(true)).alias("s")
    val joined = t.join(s, condition, "full_outer")
    val tPresent = col("t.__graft_tp").isNotNull
    val sPresent = col("s.__graft_sp").isNotNull

    // First-applicable-clause index per category (-1 = none applies).
    def firstMatch(clauses: Seq[MergeClause]): Column =
      clauses.zipWithIndex.foldRight(lit(-1)) { case ((cl, i), rest) =>
        when(cl.condition.map(coalesce(_, lit(false))).getOrElse(lit(true)),
          lit(i)).otherwise(rest)
      }
    def isDelete(clauses: Seq[MergeClause], act: Column): Column =
      clauses.zipWithIndex.collect { case (_: MergeDelete, i) => act === lit(i) }
        .reduceOption(_ || _).getOrElse(lit(false))
    val mAct = firstMatch(matched)
    val nmsAct = firstMatch(notMatchedBySource)
    val insAct = firstMatch(notMatched)

    val keep =
      when(tPresent && sPresent, !isDelete(matched, mAct))
        .when(tPresent && !sPresent, !isDelete(notMatchedBySource, nmsAct))
        .otherwise(insAct =!= lit(-1))

    def valueChain(clauses: Seq[MergeClause], act: Column, colName: String,
        default: Column): Column =
      clauses.zipWithIndex.foldRight(default) {
        case ((MergeUpdate(_, set), i), rest) if set.contains(colName) =>
          when(act === lit(i), set(colName)).otherwise(rest)
        case ((MergeInsert(_, vals), i), rest) =>
          when(act === lit(i), vals.getOrElse(colName, lit(null))).otherwise(rest)
        case (_, rest) => rest
      }
    val outCols = tSchema.fields.toSeq.map { f =>
      val tCol = col(s"t.${f.name}")
      when(tPresent && sPresent, valueChain(matched, mAct, f.name, tCol))
        .when(tPresent && !sPresent, valueChain(notMatchedBySource, nmsAct, f.name, tCol))
        .otherwise(valueChain(notMatched, insAct, f.name, lit(null)))
        .cast(f.dataType).as(f.name)
    }
    val v = prev + 1
    if (dvMode) {
      // Merge-on-read: vector out every target row an action applied
      // to; append only the surviving images + inserts (pass-through
      // target rows stay in their files untouched).
      val acted = (sPresent && mAct =!= lit(-1)) || (!sPresent && nmsAct =!= lit(-1))
      val affected = joined.where(tPresent && acted)
      val marks = affected.groupBy(col("t.__file"))
        .agg(graft.functions.Bitmaps.bitmapBuild(col("t.__pos")).as("bm"))
        .toDF("__file", "bm")
      val appendRows = joined.where(keep && (!tPresent || acted)).select(outCols: _*)
      val dvNames = mergeAndWriteDv(spark, path, v, c.dirs, dv0, marks)
      val dir = writeGroup(spark, path, v, appendRows, tablePartitioning(spark, path))
      val cdc = cdcKey(spark, path).map { k =>
        val oldAffected = affected.select(tSchema.fieldNames.map(n => col(s"t.$n")).toSeq: _*)
        writeCdc(spark, path, v,
          diffFrames(oldAffected, readDirs(spark, path, Seq(dir)), k, preimages = true))
      }
      writeCommit(spark, path, Commit(v, "merge-mor", c.dirs :+ dir, cdc, dvFiles = dvNames))
      return v
    }
    val result = joined.where(keep).select(outCols: _*)

    val dir = writeGroup(spark, path, v, result, tablePartitioning(spark, path))
    val cdc = cdcKey(spark, path).map { k =>
      writeCdc(spark, path, v,
        diffFrames(targetFull, readDirs(spark, path, Seq(dir)), k, preimages = true))
    }
    writeCommit(spark, path, Commit(v, "merge", untouched :+ dir, cdc))
    v
  }

  /** AGGREGATE-key-model merge (the Doris AGGREGATE table model):
    * arriving rows whose key tuple already exists COMBINE with the
    * stored row — measures sum — instead of replacing it. This is the
    * natural ingest mode for pre-aggregated metric tables: appends of
    * per-batch partials keep the table exactly one row per key tuple
    * with running totals, no read-modify-write per row. One shuffle on
    * the key tuple (the combining groupBy); copy-on-write commit like
    * merge.
    */
  def mergeAggregate(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], sumCols: Seq[String]): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val c = readCommit(spark, path, prev)
    // A group is untouched only if its stats prove no source key tuple
    // can live in it (per-column intersection — conservative for multi
    // column keys). Untouched groups keep their one-row-per-key
    // invariant by induction; touched ∪ source re-combines to one row
    // per key, so the table-wide invariant survives the partial rewrite.
    val (touched, untouched) = splitDirs(spark, path, c.dirs, keyBounds(source, keys))
    val target =
      if (touched.isEmpty) read(spark, path, Some(prev)).limit(0)
      else readDirsLive(spark, path, touched, prev)
    val combined = target.unionByName(source, allowMissingColumns = true)
      .groupBy(keys.map(col): _*)
      .agg(sum(sumCols.head).as(sumCols.head),
        sumCols.tail.map(c => sum(c).as(c)): _*)
    val v = prev + 1
    val dir = writeGroup(spark, path, v, combined, tablePartitioning(spark, path))
    val cdc = cdcKey(spark, path).map { k =>
      writeCdc(spark, path, v,
        diffFrames(target, readDirs(spark, path, Seq(dir)), k, preimages = true))
    }
    writeCommit(spark, path, Commit(v, "merge_agg", untouched :+ dir, cdc))
    v
  }

  /** Predicate-scoped overwrite (Delta `replaceWhere` / INSERT
    * OVERWRITE semantics): atomically delete the rows matching
    * `predicate` and insert `df`, in ONE commit — a reader sees either
    * the old region or the new one, never the gap a delete-then-append
    * pair would expose. File-group granular like the other DML verbs:
    * only groups whose stats intersect the predicate bounds rewrite
    * (their non-matching rows are kept), untouched dirs carry forward,
    * and the replacement rows land in the same new group. The caller
    * is responsible for `df` actually falling inside the predicate
    * region (the Delta contract; not validated row-by-row).
    */
  def overwriteWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column, df: DataFrame): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val c = readCommit(spark, path, prev)
    val (touched, untouched) = splitDirs(spark, path, c.dirs,
      predicateBounds(read(spark, path, Some(prev)), predicate))
    val old =
      if (touched.isEmpty) read(spark, path, Some(prev)).limit(0)
      else readDirsLive(spark, path, touched, prev)
    val replaced = old.where(!coalesce(predicate, lit(false)))
      .unionByName(df, allowMissingColumns = true)
    val v = prev + 1
    val dir = writeGroup(spark, path, v, replaced, tablePartitioning(spark, path))
    val cdc = cdcKey(spark, path).map { k =>
      writeCdc(spark, path, v,
        diffFrames(old, readDirs(spark, path, Seq(dir)), k, preimages = true))
    }
    writeCommit(spark, path, Commit(v, "replace", untouched :+ dir, cdc))
    v
  }

  /** DELETE WHERE — copy-on-write rewrite keeping rows that do NOT
    * match `predicate`. SQL DELETE semantics: a NULL predicate keeps
    * the row (`!null = null` would silently delete it), hence the
    * coalesce-to-false before negating.
    */
  def delete(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val c = readCommit(spark, path, prev)
    val (touched, untouched) = splitDirs(spark, path, c.dirs,
      predicateBounds(read(spark, path, Some(prev)), predicate))
    val v = prev + 1
    if (touched.isEmpty) {
      // Nothing can match: the commit is pure metadata, zero data moved.
      writeCommit(spark, path, Commit(v, "delete", c.dirs))
    } else {
      val old = readDirsLive(spark, path, touched, prev)
      val dir = writeGroup(spark, path, v,
        old.where(!coalesce(predicate, lit(false))), tablePartitioning(spark, path))
      val cdc = cdcKey(spark, path).map { k =>
        writeCdc(spark, path, v,
          diffFrames(old, readDirs(spark, path, Seq(dir)), k, preimages = true))
      }
      writeCommit(spark, path, Commit(v, "delete", untouched :+ dir, cdc))
    }
    v
  }

  /** UPDATE ... SET col = expr WHERE predicate — copy-on-write
    * rewrite applying `assignments` to matching rows.
    */
  def update(spark: SparkSession, path: String, predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Long = {
    import org.apache.spark.sql.functions.{col, when}
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val c = readCommit(spark, path, prev)
    val (touched, untouched) = splitDirs(spark, path, c.dirs,
      predicateBounds(read(spark, path, Some(prev)), predicate))
    val v = prev + 1
    if (touched.isEmpty) {
      writeCommit(spark, path, Commit(v, "update", c.dirs))
    } else {
      val df = readDirsLive(spark, path, touched, prev)
      val updated = assignments.foldLeft(df) { case (acc, (cn, e)) =>
        acc.withColumn(cn, when(predicate, e).otherwise(col(cn)))
      }
      val dir = writeGroup(spark, path, v, updated, tablePartitioning(spark, path))
      val cdc = cdcKey(spark, path).map { k =>
        writeCdc(spark, path, v,
          diffFrames(df, readDirs(spark, path, Seq(dir)), k, preimages = true))
      }
      writeCommit(spark, path, Commit(v, "update", untouched :+ dir, cdc))
    }
    v
  }

  /** VACUUM: physically remove data dirs not referenced by any commit
    * ≥ `retainFrom` and drop the older commit entries — bounds
    * storage; time travel before the horizon is forfeited.
    */
  def vacuum(spark: SparkSession, path: String, retainFrom: Long): Long = {
    val cur = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val keepVersions = (retainFrom to cur)
    // Subdir entries (d0/g=b) pin their whole GROUP dir: reclamation is
    // group-granular — a group frees only when no retained commit
    // references any slice of it (conservative, like Delta's vacuum
    // over partially-rewritten files).
    // A version in the window may have no commit file (below a clone's
    // base, or dropped by an earlier vacuum) — nothing to pin there.
    // Missing-file ONLY: any other readCommit failure aborts the
    // vacuum — a retained commit whose dirs can't be read must never
    // fall out of the keep-set (that would delete live data).
    val keepDirs = keepVersions
      .flatMap(v => readCommitOpt(spark, path, v).map(_.dirs).getOrElse(Nil)
        .map(groupRoot)).toSet
    val root = new Path(path)
    val fs = fsOf(spark, root)
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("d") && !keepDirs.contains(n))
        fs.delete(st.getPath, true)
    }
    // Change files follow the same retention: drop cdc dirs no kept
    // commit references (includes orphaned racer dirs).
    val keepCdc = keepVersions
      .flatMap(v => readCommitOpt(spark, path, v).flatMap(_.cdcDir)).toSet
    val cdcRoot = new Path(path, "_cdc")
    if (fs.exists(cdcRoot)) fs.listStatus(cdcRoot).foreach { st =>
      if (st.isDirectory && !keepCdc.contains(st.getPath.getName))
        fs.delete(st.getPath, true)
    }
    // Deletion vectors (B46) follow data retention: keep files a
    // retained commit references, plus the RESOLVED pre-horizon state
    // per group (what a read at the horizon applies) — orphans from
    // lost commit races and superseded cumulative files go.
    val dvRoot = dvDirPath(path)
    if (fs.exists(dvRoot)) {
      val referenced = keepVersions
        .flatMap(v => readCommitOpt(spark, path, v).map(_.dvFiles).getOrElse(Nil)).toSet
      val horizonState = scala.util.Try(
        dvResolve(spark, path, retainFrom, readCommit(spark, path, retainFrom).dirs)
          .values.map(_._1).toSet).getOrElse(Set.empty)
      fs.listStatus(dvRoot).map(_.getPath.getName).filter(_.endsWith(".dv")).foreach { n =>
        if (!referenced.contains(n) && !horizonState.contains(n))
          fs.delete(new Path(dvRoot, n), false)
      }
    }
    // Refresh the hint BEFORE dropping old commits: a checkpoint left
    // pointing at a vacuumed version would force every reader through
    // the listing fallback until the next Nth commit.
    writeCheckpoint(spark, path, cur)
    (0L until retainFrom).foreach { v =>
      fs.delete(commitFile(path, v), false)
      fs.delete(new Path(logDir(path), f".claim-v$v%05d"), false)
    }
    keepDirs.size.toLong
  }

  /** Bin-pack small files into `numFiles` outputs (same data, new
    * version). At scale, numFiles = ceil(bytes / 128 MB). A recorded
    * write.sort.by order (B43) upgrades the bin-pack to SORT
    * compaction (the Iceberg rewrite-with-sort-order): range-partition
    * on the sort columns + sort within, so files written BEFORE the
    * order was set (or by non-native writers) come out range-disjoint
    * and the stats pruner serves point reads from one file.
    */
  def compact(spark: SparkSession, path: String, numFiles: Int): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val v = prev + 1
    val df = read(spark, path, Some(prev))
    val sb = tableSortBy(spark, path)
      .flatMap(c => df.columns.find(_.equalsIgnoreCase(c)))
    val packed =
      if (sb.nonEmpty)
        df.repartitionByRange(numFiles, sb.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sb.map(org.apache.spark.sql.functions.col): _*)
      else df.coalesce(numFiles)
    val dir = writeGroup(spark, path, v, packed, tablePartitioning(spark, path))
    writeCommit(spark, path, Commit(v, "compact", Seq(dir)))
    v
  }

  /** Predicate-scoped compaction (Delta `OPTIMIZE ... WHERE`): only
    * file groups whose stats/partition values intersect the predicate
    * rewrite (bin-packed, sort order honored); everything else rides
    * the commit forward untouched. The maintenance shape that actually
    * runs at 100 TB — compacting one hot partition, not the table.
    * Touched groups shed their deletion vectors (rows materialize
    * live); untouched groups keep theirs.
    */
  def compactWhere(spark: SparkSession, path: String, numFiles: Int,
      predicate: org.apache.spark.sql.Column): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val c = readCommit(spark, path, prev)
    val (touched, untouched) = splitDirs(spark, path, c.dirs,
      predicateBounds(read(spark, path, Some(prev)), predicate))
    val v = prev + 1
    if (touched.isEmpty) {
      writeCommit(spark, path, Commit(v, "compact", c.dirs))
      return v
    }
    val df = readDirsLive(spark, path, touched, prev)
    val sb = tableSortBy(spark, path)
      .flatMap(cn => df.columns.find(_.equalsIgnoreCase(cn)))
    val packed =
      if (sb.nonEmpty)
        df.repartitionByRange(numFiles, sb.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sb.map(org.apache.spark.sql.functions.col): _*)
      else df.coalesce(numFiles)
    val dir = writeGroup(spark, path, v, packed, tablePartitioning(spark, path))
    writeCommit(spark, path, Commit(v, "compact", untouched :+ dir))
    v
  }

  /** Z-order clustering rewrite: interleave the bits of the rank of
    * each clustering column (rank ≈ value's quantile bucket, so mixed
    * types and skews flatten out), range-partition by the Z-value and
    * sort within partitions, then commit as a new file group. Each
    * output file then covers a small hyper-rectangle of the clustered
    * columns, so parquet min/max file skipping prunes multi-column
    * range predicates — the Iceberg/Doris data-layout optimization.
    */
  def clusterBy(spark: SparkSession, path: String, cols: Seq[String], numFiles: Int): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val zed = zOrdered(read(spark, path, Some(prev)), cols, numFiles)
    val v = prev + 1
    val dir = writeGroup(spark, path, v, zed, Nil)
    writeCommit(spark, path, Commit(v, "cluster", Seq(dir)))
    v
  }

  /** The Z-value rewrite shared by full and incremental clustering. */
  private def zOrdered(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    // Distributed rank proxy: 2^bits approx-quantile boundaries per
    // column (one tiny aggregate, collected — cuts are |cols|×63
    // doubles); bucket = # boundaries ≤ value. No global sort, no
    // single-partition window. 6 bits = 64 buckets/column —
    // granularity well beyond any realistic file count, at ~1/20 the
    // sketch cost of 8 bits.
    val bits = 6
    val nb = (1 << bits) - 1
    val qs = array((1 to nb).map(i => lit(i.toDouble / (nb + 1))): _*)
    // Collected (not crossJoined): the per-row rank then runs as a
    // native binary search over a codegen constant instead of a
    // 63-comparison array-filter HOF that also allocated the filtered
    // array per row per column — the measured q_zorder hot loop. Same
    // count-of-bounds-<=-value semantics, identical ranks — except the
    // degenerate all-NULL/empty column, where percentile_approx yields
    // NULL, the cut array is empty and every rank is 0 (the old HOF
    // produced the constant -1 via legacy sizeOfNull). Both are
    // per-column constants, so file clustering is unaffected.
    val boundRow = df.select(cols.zipWithIndex.map { case (c, i) =>
      percentile_approx(col(c).cast("double"), qs, lit(1000)).as(s"__b$i")
    }: _*).head()
    val cuts: Seq[Array[Double]] = cols.indices.map { i =>
      if (boundRow.isNullAt(i)) Array.empty[Double]
      else boundRow.getSeq[Any](i).collect { case d: Double => d }.toArray
    }
    // fan: the rank pass is per-row work downstream of a possibly
    // under-split input; the exchange it inserts is also what the
    // range partitioner's sampling pass re-reads instead of
    // re-executing the scan (no-op at scale, Tables.fan scaladoc).
    val ranked = cols.indices.foldLeft(graft.Tables.fan(df)) { (acc, i) =>
      acc.withColumn(s"__r$i",
        graft.functions.Vectors.sortedBucket(col(cols(i)).cast("double"), cuts(i)))
    }
    val interleaved = (0 until bits).flatMap { b =>
      cols.indices.map { i =>
        shiftleft(shiftright(col(s"__r$i"), b).bitwiseAND(lit(1L)),
          b * cols.length + i)
      }
    }.reduce[org.apache.spark.sql.Column](_ + _)
    ranked.withColumn("__z", interleaved)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop((cols.indices.map(i => s"__r$i") :+ "__z"): _*)
  }

  /** Incremental clustering (the Delta liquid-clustering / Iceberg
    * rewrite-where-needed shape): Z-order-rewrite ONLY the file groups
    * committed SINCE the last `cluster` rewrite; groups that commit
    * already clustered ride forward untouched, keeping their deletion
    * vectors ([[dvResolve]] is per-group, so a carried dir's DVs keep
    * applying). A full re-cluster of a 100 TB table is a 100 TB write —
    * the steady-state maintenance op must cost ∝ newly-ingested data,
    * not table size, or it can never keep up with ingest. Falls back to
    * a full [[clusterBy]] when no prior cluster commit is retained.
    */
  def clusterByIncremental(spark: SparkSession, path: String, cols: Seq[String],
      numFiles: Int): Long = {
    val prev = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    // Newest retained `cluster` commit; a vacuumed hole below ends the
    // walk (nothing older is retained either).
    var probe = prev
    var lastCluster: Option[Commit] = None
    while (lastCluster.isEmpty && probe >= 0) {
      readCommitOpt(spark, path, probe) match {
        case Some(c) if c.action == "cluster" => lastCluster = Some(c)
        case Some(_) => probe -= 1
        case None => probe = -1
      }
    }
    lastCluster match {
      case None => clusterBy(spark, path, cols, numFiles)
      case Some(cl) =>
        val head = readCommit(spark, path, prev)
        val clustered = cl.dirs.toSet
        val kept = head.dirs.filter(clustered)
        val delta = head.dirs.filterNot(clustered)
        val v = prev + 1
        if (delta.isEmpty) {
          // Nothing new since the last rewrite: publish a marker commit
          // so the next incremental run's walk stays O(1).
          writeCommit(spark, path, Commit(v, "cluster", kept))
        } else {
          val dir = writeGroup(spark, path, v,
            zOrdered(readDirsLive(spark, path, delta, prev), cols, numFiles), Nil)
          writeCommit(spark, path, Commit(v, "cluster", kept :+ dir))
        }
        v
    }
  }

  /** DESCRIBE HISTORY (the Delta audit-log surface): one row per
    * retained commit — version, action, wall-clock time, file-group
    * count, whether it published change records. Newest first, like
    * Delta; bounded by vacuum retention.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val cur = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val rows = (cur to 0L by -1).iterator.map { v =>
      try {
        val c = readCommit(spark, path, v)
        Some((c.version, c.action, new java.sql.Timestamp(c.ts),
          c.dirs.size.toLong, c.cdcDir.isDefined))
      } catch { case _: java.io.FileNotFoundException => None } // vacuumed
    }.takeWhile(_.isDefined).flatten.toSeq
    rows.toDF("version", "action", "timestamp", "n_file_groups", "has_change_data")
  }

  /** Current-snapshot file inventory as a DataFrame (the Iceberg
    * `files` metadata-table capability, served by the graft_files SQL
    * TVF): one row per live data file with its commit entry, byte
    * size (from the same listing pruning uses) and whether deletion
    * vectors currently mask it. Metadata-only — never opens a data
    * file — so ops tooling (size skew, small-file pressure, DV debt
    * before a compaction) reads it instead of walking the store.
    */
  def filesDf(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val v = currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val commit = readCommit(spark, path, v)
    val (pruned, _) = pruneFilesByDir(spark, path, commit.dirs, Map.empty)
    val dv = dvFor(spark, path, v, commit.dirs)
    pruned.flatMap { pd =>
      // DV maps key by the scan's `_metadata.file_path` URI; compare on
      // the scheme-normalized path so `file:/x` and `file:///x` agree.
      val masked = dv.getOrElse(groupKey(pd.dir), Map.empty[String, Array[Byte]])
        .keysIterator.map(k => new Path(k).toUri.getPath).toSet
      pd.files.map { f =>
        val rel = f.file.stripPrefix(pd.base + "/")
        (v, pd.dir, rel, f.len, masked.contains(new Path(f.file).toUri.getPath))
      }
    }.toDF("version", "file_group", "file", "bytes", "has_deletes")
      .orderBy("file_group", "file")
  }

  /** Data files of a snapshot (for compaction/catalog introspection). */
  def dataFiles(spark: SparkSession, path: String, version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(currentVersion(spark, path)).get
    readCommit(spark, path, v).dirs.flatMap { d =>
      val p = new Path(path, d)
      val fs = fsOf(spark, p)
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f.getPath.toString
      }
      buf
    }
  }
}

/** Rollup materialized views over a parquet base, wired into the
  * [[graft.plans.MaterializedViewRewrite]] optimizer rule: create the
  * partials table once, register it, and plain DataFrame/SQL
  * aggregates over the base are served from it transparently.
  */
object Rollup {
  import org.apache.spark.sql.functions._
  import graft.plans.{MvDef, MvRegistry}

  /** Build (or replace) the sum/min/max/cnt partials LakeTable for
    * `basePath` grouped by `dims`, register it for auto-routing, and
    * PERSIST the registration (`_mv.json` at the base root) so every
    * session sharing the warehouse routes through it (B50). The base
    * may be a plain parquet dir or a graft LakeTable.
    */
  def createAndRegister(spark: SparkSession, basePath: String, mvPath: String,
      dims: Seq[String], measures: Seq[String]): MvDef = {
    val base =
      if (LakeTable.currentVersion(spark, basePath).isDefined)
        LakeTable.read(spark, basePath)
      else spark.read.parquet(basePath)
    val aggs = measures.flatMap(m => Seq(
      sum(col(m)).as(s"sum_$m"), min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m"))) :+
      count(lit(1)).as("cnt")
    LakeTable.create(spark, mvPath,
      base.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*))
    val d = MvDef(basePath, mvPath, dims, measures.toSet)
    // Persistence is BEST-EFFORT and only for directory bases (a
    // single-file parquet base — or a read-only location — cannot
    // carry a sidecar): the in-memory registration always lands, the
    // descriptor just makes it durable across sessions.
    try {
      val desc = MvRegistry.descriptorFile(basePath)
      val fs = desc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.getFileStatus(new Path(basePath)).isDirectory) {
        val out = fs.create(desc, true)
        try out.write(
          (s"""{"mvPath":"$mvPath","dims":"${dims.mkString(",")}",""" +
            s""""measures":"${measures.mkString(",")}"}""").getBytes("UTF-8"))
        finally out.close()
      }
    } catch { case _: Exception => () }
    MvRegistry.register(d)
    d
  }

  /** Deregister + delete the persisted descriptor (the MV table itself
    * is dropped separately, like any table).
    */
  def dropRegistration(spark: SparkSession, basePath: String): Unit = {
    MvRegistry.deregister(basePath)
    val desc = MvRegistry.descriptorFile(basePath)
    val fs = desc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(desc)) fs.delete(desc, false)
  }
}

/** Directory-of-LakeTables catalog: named tables, versions, schemas —
  * the create/list/describe surface of a metastore.
  */
final class LakeCatalog(spark: SparkSession, root: String) {

  private def tablePath(name: String) = new Path(root, name).toString

  def createTable(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Long =
    LakeTable.create(spark, tablePath(name), df, partitionBy)

  def table(name: String, version: Option[Long] = None): DataFrame =
    LakeTable.read(spark, tablePath(name), version)

  def tableNames: Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
      .filter(n => LakeTable.currentVersion(spark, tablePath(n)).isDefined).sorted
  }

  /** One row per table: name, current version, file count, columns. */
  def listTables(): DataFrame = {
    import spark.implicits._
    tableNames.map { n =>
      val v = LakeTable.currentVersion(spark, tablePath(n)).get
      val files = LakeTable.dataFiles(spark, tablePath(n)).size.toLong
      val cols = table(n).schema.fieldNames.mkString(",")
      (n, v, files, cols)
    }.toDF("table_name", "version", "n_files", "columns")
  }
}
