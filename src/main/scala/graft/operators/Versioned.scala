package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, max, min}
import org.apache.hadoop.fs.Path
import graft.operators.Checkpoints.CapOps

/** Parquet-native versioned tables — the time-travel workflow the
  * reference inherited implicitly from Delta
  * (source/pyzzle/datasource/delta.py:28, `VERSION AS OF`), rebuilt on
  * the two primitives bare parquet offers: immutable data files and
  * create-exclusive manifest publication.
  *
  * Layout under `tableDir`:
  *   - `files/<uuid>/` — immutable parquet file groups, written once,
  *     never modified or deleted by commits;
  *   - `_versions/v<n>.json` — one manifest per version listing the file
  *     groups that version reads. The manifest is the COMMIT: it is
  *     published with create-exclusive, so version numbers are an atomic
  *     total order even under concurrent committers (the loser of a
  *     create race retries at the next number — same arbiter as the
  *     merge lease), and a crashed writer leaves only unreferenced data
  *     files, never a torn version.
  *
  * Two commit modes, mirroring Delta's economics:
  *   - [[commit]] — full snapshot: writes the frame, manifest lists only
  *     the new group. Cost ∝ snapshot size.
  *   - [[append]] — writes ONLY the new rows and lists parent groups +
  *     the new one. Cost ∝ appended batch; at 100 TB this is the daily
  *     crawl path — a year of appends shares all prior files, exactly
  *     like Delta's add-only log. (Row-level updates compose as
  *     `commit(read(latest) merged)`, paying the rewrite Delta's
  *     copy-on-write also pays at file granularity.)
  *
  * Reads ([[read]], any historical version) are plain parquet scans of
  * the manifest's groups — predicate pushdown, column pruning, and
  * partition parallelism all intact; no log replay. [[diffVersions]]
  * composes with [[Snapshot.diff]] for row-level "what changed between
  * v3 and v7". */
object Versioned {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(tableDir: String, v: Long) =
    new Path(s"$tableDir/_versions/v$v.json")

  /** Largest committed version, or -1 for an empty/absent table. */
  def latestVersion(spark: SparkSession, tableDir: String): Long =
    versionBounds(spark, tableDir)._2

  /** (lowest, highest) committed version in one listing, or (-1, -1)
    * for an empty/absent table. The LOWEST version matters to the
    * incremental caches (their epoch derives from the oldest present
    * manifest, so a vacuum — which drops a prefix of the log — is
    * observable as an epoch change) AND to CDF consumers: a
    * `table_changes` read from a vacuumed-away start fails loudly, so
    * a consumer resyncs by restarting from the lowest bound — the SQL
    * surface is the `table_version_bounds('t')` TVF
    * ([[graft.sources.GraftDml]]), the programmatic one is this. */
  def versionBounds(spark: SparkSession, tableDir: String): (Long, Long) = {
    val p = new Path(s"$tableDir/_versions")
    val f = fs(spark, tableDir)
    if (!f.exists(p)) (-1L, -1L)
    else f.listStatus(p).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .foldLeft((Long.MaxValue, -1L)) { case ((lo, hi), v) =>
        (math.min(lo, v), math.max(hi, v)) } match {
        case (Long.MaxValue, hi) => (-1L, hi)
        case bounds => bounds
      }
  }

  /** CONTENT-derived epoch of a table's manifest log, for the
    * incremental per-table caches (txn watermarks, stream-unsafe
    * groups): a table deleted and re-created at the same path must
    * invalidate them, and an mtime epoch misses a re-creation inside
    * the filesystem's timestamp granularity (1 s on several) — a stale
    * watermark then silently SKIPS a legitimate batch. The epoch is an
    * FNV-1a hash of the OLDEST present manifest's text xor its version
    * number: a re-created table's v0 text always differs (fresh group
    * UUIDs and commit instant), and a vacuum that dropped the previous
    * oldest manifest rolls the epoch too (conservative: one cache
    * rebuild after a vacuum, never a stale read). -1 = unreadable. */
  private def tableEpoch(spark: SparkSession, tableDir: String, lowest: Long): Long = {
    if (lowest < 0) return -1L
    try {
      val in = fs(spark, tableDir).open(manifestPath(tableDir, lowest))
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      fnv64(raw) ^ lowest
    } catch { case _: java.io.IOException => -1L }
  }

  /** Qualified-path cache key: trailing slashes and scheme-qualified vs
    * bare spellings of one directory must hit ONE cache entry. */
  private def cacheKey(spark: SparkSession, tableDir: String): String =
    fs(spark, tableDir).makeQualified(new Path(tableDir)).toString

  /** Bounded, access-ordered (LRU) cache map — the per-table
    * incremental caches must not grow without bound in a long-lived
    * session that touches many tables. */
  private def lruMap[V](maxEntries: Int): java.util.LinkedHashMap[String, V] =
    new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, V]): Boolean = size() > maxEntries
    }

  /** `mapping` is Delta-style COLUMN MAPPING state: (logical, physical)
    * name pairs for every column of the logical schema, plus tombstones
    * `("", physical)` for dropped columns. Empty = identity (tables
    * that never renamed/dropped pay nothing). `schema` always records
    * the LOGICAL schema; file groups store PHYSICAL column names, which
    * never change once assigned — that is what makes RENAME/DROP
    * metadata-only. */
  /** `dvs` is DELETION-VECTOR state (Delta's merge-on-read deletes):
    * one entry per file group carrying a DV — (group, artifact,
    * deletedRows) where `artifact` is a parquet directory under
    * `files/` holding (rel, pos) rows: `rel` is the file's path suffix
    * after the LAST "/files/" (clone-safe — no absolute paths) and
    * `pos` its `_metadata.row_index`. Every scan of a version
    * anti-joins the DV'd groups against their artifacts; a rewrite of
    * a group materializes (drops) its entry. At most one entry per
    * group per version. */
  /** `fileRows` is the PER-GROUP row count, recorded at commit time
    * (aligned with `files` in the JSON) — the metadata every mutation's
    * planning needs (untouched-row totals, DV fraction classification).
    * Without it each DML paid one serial driver-side sidecar read PER
    * GROUP: invisible on a local FS, but at 100k groups on an object
    * store (~10-20 ms/GET) that is tens of minutes of serial driver
    * time per mutation. Empty for pre-upgrade manifests — readers fall
    * back to the sidecars once, and the next publish records it. */
  /** `fileStats` is the PER-GROUP min/max/null-count stats JSON
    * ([[GroupStats.toJson]] text, parsed on use), recorded at commit
    * time alongside `fileRows` — what moves planning-time data
    * skipping from one sidecar GET per group to ZERO metadata I/O
    * beyond the manifest itself. Coverage may be partial (pre-upgrade
    * groups, complex-typed-only groups): a group without an entry
    * conservatively falls back to its sidecar, and an absent sidecar
    * just means "cannot prune". */
  private[graft] final case class Manifest(
      files: Seq[String], nRows: Long, mode: String, committedAt: String,
      txn: Option[(String, Long)] = None,
      schemaDdl: Option[String] = None,
      constraints: Seq[(String, String)] = Seq.empty,
      mapping: Seq[(String, String)] = Seq.empty,
      dvs: Seq[(String, String, Long)] = Seq.empty,
      fileRows: Map[String, Long] = Map.empty,
      copies: Seq[String] = Seq.empty,
      fileStats: Map[String, String] = Map.empty)

  private def jsonEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def jsonUnescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Checkpoint SIDECAR path for a version — a FULL record written by
    * [[vacuum]] beside a delta record whose ancestors it is about to
    * drop, so the retention boundary stays standalone-resolvable. The
    * `c` prefix keeps it outside [[versionBounds]]'s `v*.json` match. */
  private def checkpointPath(tableDir: String, v: Long) =
    new Path(s"$tableDir/_versions/c$v.json")

  /** FNV-1a of a record's raw text — the integrity pin that chains a
    * delta record to its exact parent BYTES (and keys the resolved-
    * manifest cache safely across a table re-created at one path: a
    * different incarnation's record can never collide). */
  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.foreach { c => h ^= c.toLong; h *= 0x100000001b3L }
    h
  }

  /** Raw text of the record at `path`, FAIL-CLOSED on torn reads: on
    * the local scheme manifest content is atomic (FsAtomic links a
    * fully-written temp file into place), but other filesystems publish
    * via create(overwrite=false), whose content a racing reader can
    * observe INCOMPLETE — and a truncated manifest parsed best-effort
    * silently drops whatever fields the truncation cut (the dvs array
    * is last: dropped deletion vectors resurrect deleted rows). A
    * record must read as a complete JSON object or raise; in-flight
    * writes settle within the retry window, real corruption stays loud. */
  private def recordRaw(
      f: org.apache.hadoop.fs.FileSystem, path: Path): String = {
    var raw = ""
    var attempt = 0
    while ({
      val in = f.open(path)
      raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val t = raw.trim
      val complete = t.startsWith("{") && t.endsWith("}")
      if (!complete) {
        attempt += 1
        if (attempt >= 5)
          throw new java.io.IOException(
            s"manifest $path is incomplete after $attempt reads (torn " +
              s"write or corruption) — failing closed: ${t.take(120)}")
        Thread.sleep(10L << attempt)
      }
      !complete
    }) ()
    raw
  }

  /** Resolved manifests, LRU-cached per (table, version) under an
    * approximate BYTE bound — not an entry count: a resolved manifest
    * now embeds per-group stats JSON, so a 10k-group table's state is
    * megabytes and an entry-bounded cache would pin gigabytes of
    * driver heap across a long history walk. Records are immutable
    * once published, so an entry is valid exactly while its stored
    * hash matches the record bytes — verified on every use (against a
    * fresh read for the requested version, against the child's
    * `parent_hash` pin during a chain walk). */
  private object resolvedManifestCache {
    private val maxBytes: Long =
      sys.props.get("graft.manifest.cacheBytes")
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .getOrElse(256L * 1024 * 1024)
    private var total = 0L
    private val map =
      new java.util.LinkedHashMap[String, (Long, Long, Manifest)](64, 0.75f, true)
    private def weigh(m: Manifest): Long =
      64L + m.files.map(_.length + 24L).sum +
        m.fileStats.map { case (k, v) => k.length + v.length + 32L }.sum +
        m.fileRows.size * 56L +
        m.dvs.map(d => d._1.length + d._2.length + 40L).sum +
        m.schemaDdl.map(_.length.toLong).getOrElse(0L) +
        m.constraints.map { case (a, b) => a.length + b.length + 16L }.sum +
        m.mapping.map { case (a, b) => a.length + b.length + 16L }.sum
    def get(key: String): Option[(Long, Manifest)] = synchronized {
      Option(map.get(key)).map { case (h, _, m) => (h, m) }
    }
    def put(key: String, h: Long, m: Manifest): Unit = synchronized {
      val w = weigh(m)
      Option(map.remove(key)).foreach { case (_, ow, _) => total -= ow }
      map.put(key, (h, w, m))
      total += w
      // evict eldest-first until under budget; the just-inserted entry
      // (most recent in access order) is never evicted by its own put
      val it = map.entrySet().iterator()
      while (total > maxBytes && it.hasNext) {
        val e = it.next()
        if (e.getKey != key) { total -= e.getValue._2; it.remove() }
      }
    }
    def clear(): Unit = synchronized { map.clear(); total = 0L }
  }

  /** Test hook: drop every cached resolved manifest (simulates a cold
    * JVM so specs can exercise the full chain walk). */
  private[graft] def clearResolvedManifestCache(): Unit =
    resolvedManifestCache.clear()

  private[graft] def parseManifest(
      spark: SparkSession, tableDir: String, v: Long): Manifest =
    resolveWithHash(spark, tableDir, v)._2

  /** Resolve version `v`'s full [[Manifest]] plus its record hash: read
    * the record (always FRESH — a table re-created at the same path
    * must never serve a stale entry), then either parse it whole (a
    * full/checkpoint record) or fold it over its parent chain (a delta
    * record). The walk is ITERATIVE — bounded by heap, never the JVM
    * stack, so even a pathological never-checkpointed chain resolves
    * (or fails with a real error) instead of StackOverflowError — and
    * amortized O(1) I/O: each resolved ancestor is cached keyed by the
    * hash its child pins, so a cached parent serves without re-reading
    * and can never belong to a different table incarnation (its hash
    * would differ). A parent VACUUMED away diverts to the child's
    * checkpoint sidecar (vacuum writes one at the boundary before
    * dropping ancestors). `expectHash` carries a child's pin; a
    * mismatch fails closed. */
  private def resolveWithHash(
      spark: SparkSession, tableDir: String, v: Long,
      expectHash: Option[Long] = None): (Long, Manifest) = {
    val f = fs(spark, tableDir)
    def key(w: Long) = cacheKey(spark, tableDir) + "#" + w
    def parentRef(raw: String, w: Long): (Long, Long) = {
      val p = "\"parent\":(\\d+)".r.findFirstMatchIn(raw).map(_.group(1).toLong)
        .getOrElse(throw new IllegalStateException(
          s"delta manifest v$w of $tableDir has no parent — corrupt"))
      val ph = "\"parent_hash\":\"(-?\\d+)\"".r.findFirstMatchIn(raw)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalStateException(
          s"delta manifest v$w of $tableDir has no parent_hash — corrupt"))
      (p, ph)
    }
    val raw0 = recordRaw(f, manifestPath(tableDir, v))
    val h0 = fnv64(raw0)
    expectHash.foreach { e =>
      if (e != h0) throw new IllegalStateException(
        s"manifest v$v of $tableDir does not match the hash its child " +
          s"record pinned (expected $e, got $h0) — the log was replaced " +
          "or corrupted under a live chain; failing closed")
    }
    resolvedManifestCache.get(key(v)) match {
      case Some((ch, m)) if ch == h0 => return (h0, m)
      case _ => ()
    }
    // walk DOWN the chain, collecting unresolved delta records
    // oldest-first, until a full record, a hash-verified cached
    // ancestor, or the vacuum boundary's checkpoint sidecar
    var chain = List.empty[(Long, String, Long)] // (version, raw, hash)
    var curV = v; var curRaw = raw0; var curH = h0
    var base: Manifest = null
    while (base == null) {
      if (!curRaw.trim.startsWith("{\"delta\":")) {
        base = parseFullRecord(curRaw, curV)
        resolvedManifestCache.put(key(curV), curH, base)
      } else {
        val (p, ph) = parentRef(curRaw, curV)
        chain = (curV, curRaw, curH) :: chain
        resolvedManifestCache.get(key(p)) match {
          case Some((ch, m)) if ch == ph => base = m
          case _ =>
            val praw =
              try Some(recordRaw(f, manifestPath(tableDir, p)))
              catch { case _: java.io.FileNotFoundException => None }
            praw match {
              case Some(r) =>
                val pH = fnv64(r)
                if (pH != ph) throw new IllegalStateException(
                  s"manifest v$p of $tableDir does not match the hash " +
                    s"its child record pinned (expected $ph, got $pH) — " +
                    "the log was replaced or corrupted under a live " +
                    "chain; failing closed")
                curV = p; curRaw = r; curH = pH
              case None =>
                // vacuumed parent: curV is the retention boundary and
                // carries a checkpoint sidecar — it IS curV's state,
                // so curV leaves the fold list
                base = parseFullRecord(
                  recordRaw(f, checkpointPath(tableDir, curV)), curV)
                resolvedManifestCache.put(key(curV), curH, base)
                chain = chain.tail
            }
        }
      }
    }
    // fold forward, caching every intermediate for the next walk
    var m = base
    chain.foreach { case (cv, craw, ch) =>
      m = foldDelta(m, craw, cv)
      resolvedManifestCache.put(key(cv), ch, m)
    }
    (h0, m)
  }

  private def parseFullRecord(raw: String, v: Long): Manifest = {
    // Minimal JSON of our own writing:
    // {"version":n,"mode":"...","files":["g1",...],"n_rows":n,"committed_at":"...",
    //  "txn_app":"...","txn_batch":n}  (txn fields only on appendOnce commits)
    // files: the same linear fail-closed array scan as the other
    // arrays (the old regex parse failed OPEN — an unterminated array
    // read as "no files", an empty table).
    val files = quotedArray(raw, "files").getOrElse(Seq.empty)
    val nRows = "\"n_rows\":(\\d+)".r.findFirstMatchIn(raw).map(_.group(1).toLong).getOrElse(0L)
    val mode = "\"mode\":\"([^\"]*)\"".r.findFirstMatchIn(raw).map(_.group(1)).getOrElse("")
    val at = "\"committed_at\":\"([^\"]*)\"".r.findFirstMatchIn(raw).map(_.group(1)).getOrElse("")
    val txn = for {
      app <- "\"txn_app\":\"([^\"]*)\"".r.findFirstMatchIn(raw).map(_.group(1))
      b <- "\"txn_batch\":(-?\\d+)".r.findFirstMatchIn(raw).map(_.group(1).toLong)
    } yield (app, b)
    // schema is a JSON-escaped DDL string; scanned linearly (see
    // [[quotedArray]]'s rationale — a regex alternation per char
    // overflows the stack on a wide table's 100KB DDL).
    val schemaDdl = scanQuoted(raw, "\"schema\":\"").map(jsonUnescape)
    // constraints: a flat JSON array of escaped strings alternating
    // [name, expr, name, expr, ...].
    val constraints = quotedArray(raw, "constraints")
      .map(_.grouped(2).collect { case Seq(n, e) => (n, e) }.toSeq)
      .getOrElse(Seq.empty)
    // column mapping: flat [logical, physical, ...] pairs, same shape
    // as constraints; "" logical marks a dropped column's tombstone.
    val mapping = quotedArray(raw, "mapping")
      .map(_.grouped(2).collect { case Seq(l, p) => (l, p) }.toSeq)
      .getOrElse(Seq.empty)
    // deletion vectors: flat [group, artifact, count, ...] triples
    // (count serialized as a quoted string so the array body stays a
    // run of quoted strings like constraints/mapping).
    val dvs = quotedArray(raw, "dvs")
      .map(_.grouped(3).collect { case Seq(g, a, c) => (g, a, c.toLong) }.toSeq)
      .getOrElse(Seq.empty)
    // per-group row counts: quoted numbers aligned 1:1 with `files`
    // (absent in pre-upgrade manifests; a LENGTH MISMATCH is corruption
    // and fails closed like every other malformed field)
    val fileRows = quotedArray(raw, "file_rows") match {
      case None => Map.empty[String, Long]
      case Some(rows) =>
        if (rows.size != files.size)
          throw new IllegalStateException(
            s"manifest v$v: file_rows has ${rows.size} entries for " +
              s"${files.size} files — corrupt manifest")
        files.zip(rows.map(_.toLong)).toMap
    }
    // `copies` marks which ADDED group(s) hold a DV mutation's updated
    // row copies (vs inserts) — the change feed's postimage attribution
    // for mixed merges. Per-version annotation, never carried forward.
    val copies = quotedArray(raw, "copies").getOrElse(Seq.empty)
    // per-group stats JSON: flat [group, statsJson, ...] pairs —
    // coverage may be PARTIAL (see the Manifest field doc)
    val fileStats = quotedArray(raw, "file_stats")
      .map(_.grouped(2).collect { case Seq(g, s) => (g, s) }.toMap)
      .getOrElse(Map.empty[String, String])
    Manifest(files, nRows, mode, at, txn, schemaDdl, constraints, mapping, dvs,
      fileRows, copies, fileStats)
  }

  /** Reconstruct a delta record's full state over its resolved parent.
    * Cumulative fields fold (files/dvs/fileRows/fileStats; schema,
    * constraints and mapping inherit unless the record carries the key
    * — an EMPTY array is "changed to empty", an absent key "unchanged");
    * per-version fields (mode, n_rows, committed_at, txn, copies) come
    * from the record itself. */
  private def foldDelta(parent: Manifest, raw: String, v: Long): Manifest = {
    val removed = quotedArray(raw, "remove_files").getOrElse(Seq.empty).toSet
    val added = quotedArray(raw, "add_files").getOrElse(Seq.empty)
    val files = parent.files.filterNot(removed) ++ added
    val nRows = "\"n_rows\":(\\d+)".r.findFirstMatchIn(raw).map(_.group(1).toLong).getOrElse(0L)
    val mode = "\"mode\":\"([^\"]*)\"".r.findFirstMatchIn(raw).map(_.group(1)).getOrElse("")
    val at = "\"committed_at\":\"([^\"]*)\"".r.findFirstMatchIn(raw).map(_.group(1)).getOrElse("")
    val txn = for {
      app <- "\"txn_app\":\"([^\"]*)\"".r.findFirstMatchIn(raw).map(_.group(1))
      b <- "\"txn_batch\":(-?\\d+)".r.findFirstMatchIn(raw).map(_.group(1).toLong)
    } yield (app, b)
    val schemaDdl = scanQuoted(raw, "\"schema\":\"").map(jsonUnescape)
      .orElse(parent.schemaDdl)
    val constraints = quotedArray(raw, "constraints")
      .map(_.grouped(2).collect { case Seq(n, e) => (n, e) }.toSeq)
      .getOrElse(parent.constraints)
    val mapping = quotedArray(raw, "mapping")
      .map(_.grouped(2).collect { case Seq(l, p) => (l, p) }.toSeq)
      .getOrElse(parent.mapping)
    val dvDrop = quotedArray(raw, "dv_drop").getOrElse(Seq.empty).toSet
    val dvSet = quotedArray(raw, "dv_set")
      .map(_.grouped(3).collect { case Seq(g, a, c) => (g, a, c.toLong) }.toSeq)
      .getOrElse(Seq.empty)
    val dvSetG = dvSet.map(_._1).toSet
    val dvs = parent.dvs.filterNot(d =>
      dvDrop(d._1) || dvSetG(d._1) || removed(d._1)) ++ dvSet
    // row counts: complete iff the parent covers every carried group
    // and the record aligns a count with every added group — otherwise
    // empty (the pre-upgrade reading), same contract as full records.
    // The WRITER prefers a full record whenever a delta would degrade
    // coverage, so the empty case only survives on pre-upgrade chains.
    val addRows = quotedArray(raw, "add_file_rows").map(_.map(_.toLong))
      .getOrElse(Seq.empty)
    val addedSet = added.toSet
    val carriedRows = parent.fileRows.filter { case (g, _) => !removed(g) }
    val fileRows =
      if (addRows.size == added.size &&
          files.forall(g => carriedRows.contains(g) || addedSet(g)))
        carriedRows ++ added.zip(addRows)
      else Map.empty[String, Long]
    val addStats = quotedArray(raw, "add_file_stats")
      .map(_.grouped(2).collect { case Seq(g, s) => (g, s) }.toMap)
      .getOrElse(Map.empty[String, String])
    val fileStats =
      parent.fileStats.filter { case (g, _) => !removed(g) } ++ addStats
    val copies = quotedArray(raw, "copies").getOrElse(Seq.empty)
    val _ = v
    Manifest(files, nRows, mode, at, txn, schemaDdl, constraints, mapping, dvs,
      fileRows, copies, fileStats)
  }

  /** The JSON-escaped string starting right after `marker`, scanned
    * LINEARLY with escape awareness (returned still escaped). */
  private def scanQuoted(raw: String, marker: String): Option[String] = {
    val start = raw.indexOf(marker)
    if (start < 0) return None
    var i = start + marker.length
    val sb = new StringBuilder
    var escaped = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (escaped) { sb.append(c); escaped = false }
      else if (c == '\\') { sb.append(c); escaped = true }
      else if (c == '"') return Some(sb.toString)
      else sb.append(c)
      i += 1
    }
    // marker present but the string never closes: the manifest is
    // corrupt (the complete-object guard in parseManifest already
    // excludes torn reads) — fail closed, never "field absent".
    throw new IllegalStateException(
      s"unterminated JSON string after $marker — corrupt manifest")
  }

  /** The flat array of quoted strings stored under `key`, each entry
    * unescaped — a LINEAR scan. The natural regex for "a run of quoted
    * strings" costs one interpreter stack frame per element in Java's
    * engine and overflows on manifests with thousands of entries (a
    * 10k-group scatter delete's dvs array, a many-column mapping), so
    * array bodies must never be regex-matched. */
  private def quotedArray(raw: String, key: String): Option[Seq[String]] = {
    val marker = "\"" + key + "\":["
    val start = raw.indexOf(marker)
    if (start < 0) return None
    var i = start + marker.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var escaped = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (inStr) {
        if (escaped) { sb.append(c); escaped = false }
        else if (c == '\\') { sb.append(c); escaped = true }
        else if (c == '"') { out += jsonUnescape(sb.toString); sb.clear(); inStr = false }
        else sb.append(c)
      } else c match {
        case '"' => inStr = true
        case ']' => return Some(out.toSeq)
        case _ => () // comma / whitespace
      }
      i += 1
    }
    // Unterminated array = corrupt manifest. A best-effort PREFIX here
    // would fail OPEN: dvs is the last key, so a truncated manifest
    // would silently drop deletion-vector entries and resurrect
    // deleted rows for whoever read it.
    throw new IllegalStateException(
      s"unterminated JSON array '$key' — corrupt manifest")
  }

  private def readManifest(
      spark: SparkSession, tableDir: String, v: Long): (Seq[String], Long, String) = {
    val m = parseManifest(spark, tableDir, v)
    (m.files, m.nRows, m.mode)
  }

  /** Publish `groups` as the next version. Create-exclusive decides the
    * version number under concurrency; the data files are already
    * durable before the manifest appears, so a reader can never observe
    * a version whose data is incomplete. */
  private def manifestJson(
      v: Long, mode: String, groups: Seq[String], nRows: Long,
      txn: Option[(String, Long)], schemaDdl: Option[String],
      constraints: Seq[(String, String)] = Seq.empty,
      mapping: Seq[(String, String)] = Seq.empty,
      dvs: Seq[(String, String, Long)] = Seq.empty,
      fileRows: Option[Seq[Long]] = None,
      copies: Seq[String] = Seq.empty,
      fileStats: Map[String, String] = Map.empty,
      committedAt: Option[String] = None): String = {
    require(fileRows.forall(_.size == groups.size),
      s"file_rows (${fileRows.map(_.size)}) must align with files (${groups.size})")
    val rowsJson = fileRows.map(rs =>
      rs.map("\"" + _ + "\"").mkString(""","file_rows":[""", ",", "]"))
      .getOrElse("")
    val statsJson = statsPairsJson("file_stats", fileStats)
    val copiesJson =
      if (copies.isEmpty) ""
      else copies.map(s => "\"" + jsonEscape(s) + "\"")
        .mkString(""","copies":[""", ",", "]")
    val txnJson = txn.map { case (app, b) =>
      s""","txn_app":"$app","txn_batch":$b"""
    }.getOrElse("")
    val schemaJson = schemaDdl.map(d => s""","schema":"${jsonEscape(d)}"""").getOrElse("")
    val consJson =
      if (constraints.isEmpty) ""
      else constraints.flatMap { case (n, e) => Seq(n, e) }
        .map(s => "\"" + jsonEscape(s) + "\"").mkString(""","constraints":[""", ",", "]")
    val mapJson =
      if (mapping.isEmpty) ""
      else mapping.flatMap { case (l, p) => Seq(l, p) }
        .map(s => "\"" + jsonEscape(s) + "\"").mkString(""","mapping":[""", ",", "]")
    val dvJson =
      if (dvs.isEmpty) ""
      else dvs.flatMap { case (g, a, c) => Seq(g, a, c.toString) }
        .map(s => "\"" + jsonEscape(s) + "\"").mkString(""","dvs":[""", ",", "]")
    val at = committedAt.getOrElse(java.time.Instant.now().toString)
    s"""{"version":$v,"mode":"$mode","files":[${groups.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""n_rows":$nRows,"committed_at":"$at"$rowsJson$statsJson$copiesJson$txnJson$schemaJson$consJson$mapJson$dvJson}"""
  }

  /** A resolved [[Manifest]] re-serialized as a standalone FULL record
    * — what [[vacuum]] writes as the retention boundary's checkpoint
    * sidecar. Preserves the original `committed_at` (time travel and
    * history audit read it verbatim). */
  private def fullRecordOf(m: Manifest, v: Long): String =
    manifestJson(v, m.mode, m.files, m.nRows, m.txn, m.schemaDdl,
      m.constraints, m.mapping, m.dvs,
      if (m.files.forall(m.fileRows.contains))
        Some(m.files.map(m.fileRows)) else None,
      m.copies, m.fileStats, Some(m.committedAt))

  /** Flat [group, statsJson, ...] pairs under `key` (sorted for
    * deterministic bytes), or "" when empty. */
  private def statsPairsJson(key: String, stats: Map[String, String]): String =
    if (stats.isEmpty) ""
    else stats.toSeq.sortBy(_._1).flatMap { case (g, s) => Seq(g, s) }
      .map(s => "\"" + jsonEscape(s) + "\"")
      .mkString(s""","$key":[""", ",", "]")

  /** A DELTA record: O(churn) bytes — the file/DV changes against the
    * parent plus the per-version fields, chained to the parent's exact
    * bytes via `parent_hash`. `schemaDdl`/`constraints`/`mapping` are
    * emitted ONLY when passed Some (= changed vs the parent); an
    * absent key folds as "inherit". The leading `"delta":1` key is the
    * record-shape marker ([[resolveWithHash]] dispatches on it
    * position-pinned, immune to user content echoing the word). */
  private def deltaJson(
      v: Long, mode: String, parentV: Long, parentHash: Long,
      nRows: Long, addFiles: Seq[String], removeFiles: Seq[String],
      addRows: Option[Seq[Long]], addStats: Map[String, String],
      dvSet: Seq[(String, String, Long)], dvDrop: Seq[String],
      txn: Option[(String, Long)], schemaDdl: Option[String],
      constraints: Option[Seq[(String, String)]],
      mapping: Option[Seq[(String, String)]],
      copies: Seq[String]): String = {
    require(addRows.forall(_.size == addFiles.size),
      s"add_file_rows (${addRows.map(_.size)}) must align with " +
        s"add_files (${addFiles.size})")
    def strArr(key: String, xs: Seq[String]): String =
      if (xs.isEmpty) ""
      else xs.map(s => "\"" + jsonEscape(s) + "\"")
        .mkString(s""","$key":[""", ",", "]")
    val addJson = strArr("add_files", addFiles)
    val remJson = strArr("remove_files", removeFiles)
    val rowsJson = addRows.map(rs =>
      rs.map("\"" + _ + "\"").mkString(""","add_file_rows":[""", ",", "]"))
      .getOrElse("")
    val statsJson = statsPairsJson("add_file_stats", addStats)
    val dvSetJson =
      if (dvSet.isEmpty) ""
      else dvSet.flatMap { case (g, a, c) => Seq(g, a, c.toString) }
        .map(s => "\"" + jsonEscape(s) + "\"")
        .mkString(""","dv_set":[""", ",", "]")
    val dvDropJson = strArr("dv_drop", dvDrop)
    val copiesJson = strArr("copies", copies)
    val txnJson = txn.map { case (app, b) =>
      s""","txn_app":"$app","txn_batch":$b"""
    }.getOrElse("")
    val schemaJson = schemaDdl.map(d =>
      s""","schema":"${jsonEscape(d)}"""").getOrElse("")
    // changed-to-empty serializes as [] (quotedArray reads Some(empty)
    // — an override), unchanged omits the key (fold inherits)
    val consJson = constraints.map(cs =>
      cs.flatMap { case (n, e) => Seq(n, e) }
        .map(s => "\"" + jsonEscape(s) + "\"")
        .mkString(""","constraints":[""", ",", "]")).getOrElse("")
    val mapJson = mapping.map(ms =>
      ms.flatMap { case (l, p) => Seq(l, p) }
        .map(s => "\"" + jsonEscape(s) + "\"")
        .mkString(""","mapping":[""", ",", "]")).getOrElse("")
    s"""{"delta":1,"version":$v,"parent":$parentV,"parent_hash":"$parentHash",""" +
      s""""mode":"$mode","n_rows":$nRows,""" +
      s""""committed_at":"${java.time.Instant.now()}"""" +
      addJson + remJson + rowsJson + statsJson + dvSetJson + dvDropJson +
      copiesJson + txnJson + schemaJson + consJson + mapJson + "}"
  }

  /** Row counts for `groups` from their stats sidecars, read as ONE
    * concurrent batch (the pre-upgrade fallback must not reintroduce
    * the serial one-GET-per-group pathology it exists to retire). */
  private def sidecarRows(
      spark: SparkSession, tableDir: String,
      groups: Seq[String]): Map[String, Long] = {
    if (groups.isEmpty) return Map.empty
    val f = fs(spark, tableDir)
    groups.zip(GroupStats.readMany(
      f, groups.map(g => GroupStats.sidecarPath(tableDir, g))))
      .collect { case (g, Some(st)) => g -> st.nRows }.toMap
  }

  /** The live constraint set: the latest version's, or empty. */
  def constraints(spark: SparkSession, tableDir: String): Seq[(String, String)] = {
    val v = latestVersion(spark, tableDir)
    if (v < 0) Seq.empty
    else scala.util.Try(parseManifest(spark, tableDir, v).constraints)
      .getOrElse(Seq.empty)
  }

  /** Commit-record cadence: every Nth version (and v0, and any state a
    * delta cannot represent) publishes as a FULL record — the log's
    * CHECKPOINT; the rest publish as O(churn) delta records. 0 or 1 =
    * full records only (the pre-checkpoint behavior). */
  private def checkpointInterval(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.manifest.checkpointInterval") match {
      case None => 10L
      case Some(s) => scala.util.Try(s.toLong).getOrElse(
        throw new IllegalArgumentException(
          "spark.graft.manifest.checkpointInterval must be a number " +
            s"(0/1 = full record every commit): '$s'"))
    }

  /** Serialize and publish version `v` (create-exclusive; false = lost
    * the race). Chooses the record shape: a FULL record when `v` is a
    * checkpoint slot, the parent is missing/unreadable, or the delta
    * encoding cannot represent the transition (group order diverged,
    * row-count coverage would degrade, a recorded schema would have to
    * clear); otherwise an O(churn) DELTA record chained to the
    * parent's bytes. ONE batched sidecar pass serves both the
    * row-count fallback and the stats embed, so commit metadata I/O is
    * O(new groups) — and a checkpoint back-fills stats coverage for
    * groups older records never carried. */
  private def publishRecordAt(
      spark: SparkSession, tableDir: String, v: Long,
      mode: String, groups: Seq[String], nRows: Long,
      txn: Option[(String, Long)], schemaDdl: Option[String],
      cons: Seq[(String, String)], mapping: Seq[(String, String)],
      dvs: Seq[(String, String, Long)],
      rowsByGroup: Map[String, Long], copies: Seq[String]): Boolean = {
    val f = fs(spark, tableDir)
    val parentOpt: Option[(Long, Manifest)] =
      if (v == 0) None
      else scala.util.Try(resolveWithHash(spark, tableDir, v - 1)).toOption
    val pm = parentOpt.map(_._2)
    val knownRows = pm.map(_.fileRows).getOrElse(Map.empty) ++ rowsByGroup
    val knownStats = pm.map(_.fileStats).getOrElse(Map.empty)
    val interval = checkpointInterval(spark)
    val checkpointSlot =
      parentOpt.isEmpty || interval <= 1 || (v % interval == 0)
    val parentSet = pm.map(_.files.toSet).getOrElse(Set.empty)
    val added = groups.filterNot(parentSet)
    // one concurrent sidecar batch: row counts for groups no record
    // knows + stats for the groups this record will embed
    val needSidecar =
      (groups.filterNot(knownRows.contains) ++
        (if (checkpointSlot) groups else added).filterNot(knownStats.contains))
        .distinct
    val sidecarSt: Map[String, GroupStats.Stats] =
      if (needSidecar.isEmpty) Map.empty
      else needSidecar.zip(GroupStats.readMany(
        f, needSidecar.map(g => GroupStats.sidecarPath(tableDir, g))))
        .collect { case (g, Some(st)) => g -> st }.toMap
    val perRows = groups.map(g =>
      knownRows.get(g).orElse(sidecarSt.get(g).map(_.nRows)))
    val fileRows =
      if (perRows.forall(_.isDefined)) Some(perRows.map(_.get)) else None
    def statsOf(gs: Seq[String]): Map[String, String] =
      gs.flatMap(g => knownStats.get(g)
        .orElse(sidecarSt.get(g).map(GroupStats.toJson)).map(g -> _)).toMap
    val json = parentOpt match {
      case Some((phash, parent)) if !checkpointSlot &&
          // the delta fold must reproduce the exact file sequence
          (parent.files.filter(groups.toSet) ++ added) == groups &&
          // row-count coverage must not degrade through the fold: a
          // CARRIED group's count must come from the parent RECORD —
          // that is all foldDelta can see (a rowsByGroup entry for a
          // carried group would satisfy the writer but fold to empty)
          (fileRows.isDefined && groups.filterNot(added.toSet)
            .forall(parent.fileRows.contains)
            || fileRows.isEmpty && parent.fileRows.isEmpty) &&
          // a recorded schema cannot CLEAR through a delta (absent =
          // inherit) — never happens in practice, full record if so
          !(schemaDdl.isEmpty && parent.schemaDdl.nonEmpty) =>
        val removed = parent.files.filterNot(groups.toSet)
        val pdv = parent.dvs.map(d => d._1 -> d).toMap
        val dvSet = dvs.filterNot(d => pdv.get(d._1).contains(d))
        val ndv = dvs.map(_._1).toSet
        val removedSet = removed.toSet
        val dvDrop = parent.dvs.map(_._1)
          .filter(g => !ndv(g) && !removedSet(g))
        val addRows = fileRows.map(_ => added.map(g =>
          rowsByGroup.get(g).orElse(sidecarSt.get(g).map(_.nRows)).get))
        deltaJson(v, mode, v - 1, phash, nRows, added, removed,
          addRows, statsOf(added), dvSet, dvDrop, txn,
          if (schemaDdl == parent.schemaDdl) None else schemaDdl,
          if (cons == parent.constraints) None else Some(cons),
          if (mapping == parent.mapping) None else Some(mapping),
          copies)
      case _ =>
        manifestJson(v, mode, groups, nRows, txn, schemaDdl, cons,
          mapping, dvs, fileRows, copies, statsOf(groups))
    }
    val ok = graft.sources.FsAtomic.createExclusive(
      f, manifestPath(tableDir, v), json)
    if (ok && checkpointSlot) writeLastCheckpointPointer(f, tableDir, v)
    ok
  }

  /** Best-effort `_last_checkpoint`-style pointer beside the log: the
    * newest FULL-record version, for external tooling and cold-start
    * anchoring ([[lastCheckpoint]]). Overwrite-by-rename,
    * last-writer-wins — purely advisory, readers fall back to the
    * parent-pointer walk (bounded by the checkpoint interval) when it
    * is stale or unreadable. */
  private def writeLastCheckpointPointer(
      f: org.apache.hadoop.fs.FileSystem, tableDir: String, v: Long): Unit =
    try {
      val tmp = new Path(
        s"$tableDir/_versions/._last_checkpoint.${java.util.UUID.randomUUID()}.tmp")
      val out = f.create(tmp, true)
      try out.write(s"""{"version":$v}""".getBytes("UTF-8")) finally out.close()
      val dst = new Path(s"$tableDir/_versions/_last_checkpoint")
      if (f.exists(dst)) f.delete(dst, false)
      if (!f.rename(tmp, dst)) scala.util.Try(f.delete(tmp, false))
    } catch { case _: java.io.IOException => () }

  /** The advisory `_last_checkpoint` pointer's version, if present and
    * readable — the newest version known to carry a FULL record. */
  def lastCheckpoint(spark: SparkSession, tableDir: String): Option[Long] =
    try {
      val p = new Path(s"$tableDir/_versions/_last_checkpoint")
      val f = fs(spark, tableDir)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        "\"version\":(\\d+)".r.findFirstMatchIn(raw).map(_.group(1).toLong)
      }
    } catch { case _: java.io.IOException => None }

  private def publish(
      spark: SparkSession, tableDir: String, groups: Seq[String],
      nRows: Long, mode: String, schemaDdl: Option[String],
      constraintsOverride: Option[Seq[(String, String)]] = None,
      mapping: Seq[(String, String)] = Seq.empty,
      dvs: Seq[(String, String, Long)] = Seq.empty,
      rowsByGroup: Map[String, Long] = Map.empty): Long = {
    // Constraints are table-level metadata: every commit carries the
    // live set forward unless explicitly changed (add/dropConstraint).
    val cons = constraintsOverride.getOrElse(constraints(spark, tableDir))
    var v = latestVersion(spark, tableDir) + 1
    while (true) {
      // FsAtomic: Hadoop's local create(overwrite=false) is check-then-
      // act; a non-atomic create here could publish the SAME version
      // number twice under concurrent committers.
      if (publishRecordAt(spark, tableDir, v, mode, groups, nRows, None,
          schemaDdl, cons, mapping, dvs, rowsByGroup, Seq.empty))
        return v
      v += 1 // lost the race: next number
    }
    v // unreachable
  }

  /** OPTIMISTIC publication for HISTORY-DEPENDENT commits — Delta's
    * conflict detection, simplified to its sound core: a mutation
    * computed against parent version `expectedParent` may only land as
    * `expectedParent + 1`. If any other committer got there first, the
    * world this mutation read no longer exists — sliding to the next
    * number (what [[publish]] does for parent-independent snapshots)
    * would silently DROP the concurrent commit's effect, the classic
    * lost update. Instead the written group is deleted and a
    * `ConcurrentModificationException` tells the caller to re-run
    * against the new latest version. The create-exclusive manifest
    * makes the parent check and the publication one atomic step. */
  private def publishExpecting(
      spark: SparkSession, tableDir: String, expectedParent: Long,
      groups: Seq[String], newGroups: Seq[String], nRows: Long, mode: String,
      schemaDdl: Option[String],
      constraintsOverride: Option[Seq[(String, String)]] = None,
      mapping: Seq[(String, String)] = Seq.empty,
      dvs: Seq[(String, String, Long)] = Seq.empty,
      rowsByGroup: Map[String, Long] = Map.empty,
      copies: Seq[String] = Seq.empty): Long = {
    val f = fs(spark, tableDir)
    val cons = constraintsOverride.getOrElse(constraints(spark, tableDir))
    val target = expectedParent + 1
    if (publishRecordAt(spark, tableDir, target, mode, groups, nRows, None,
        schemaDdl, cons, mapping, dvs, rowsByGroup, copies))
      target
    else {
      newGroups.foreach(g => f.delete(new Path(s"$tableDir/files/$g"), true))
      throw new java.util.ConcurrentModificationException(
        s"$mode on $tableDir read version $expectedParent but version " +
          s"$target was committed concurrently — re-run the operation " +
          "against the new latest version")
    }
  }

  /** The schema recorded in a version's manifest, TOP-LEVEL-NULLABLE
    * (groups written before or after a column's lifetime null-fill it,
    * so no column may promise NOT NULL across versions). */
  private def storedSchema(df: DataFrame): String =
    org.apache.spark.sql.types.StructType(
      df.schema.fields.map(_.copy(nullable = true))).toDDL

  /** Schema-on-manifest scan: with a recorded schema the read is
    * INFERENCE-FREE (no sample-file footer pass — at 100 TB planning
    * cost is metadata-only) and DETERMINISTIC (column set and order come
    * from the manifest, not from whichever file the reader samples);
    * groups missing a column null-fill it — the evolution contract.
    * Pre-schema manifests fall back to parquet inference. */
  private[graft] def scanGroups(
      spark: SparkSession, tableDir: String,
      groups: Seq[String], schemaDdl: Option[String],
      mapping: Seq[(String, String)] = Seq.empty,
      helpers: Seq[Column] = Seq.empty): DataFrame = {
    val paths = groups.map(g => s"$tableDir/files/$g")
    (schemaDdl, activeMapping(mapping)) match {
      case (Some(d), am) if am.nonEmpty =>
        // COLUMN MAPPING read: groups store PHYSICAL names; the scan
        // declares the physical schema (logical types, physical names)
        // and one alias projection restores the logical view. Catalyst
        // pushes filters and pruning through the aliases, so skipping
        // and pushdown see physical names — the same names the stats
        // sidecars carry.
        val logical = org.apache.spark.sql.types.StructType.fromDDL(d)
        val physical = org.apache.spark.sql.types.StructType(
          logical.fields.map(f => f.copy(name = physicalName(am, f.name))))
        spark.read.schema(physical).parquet(paths: _*)
          .select(logical.fields.toSeq.map(f =>
            col(physicalName(am, f.name)).as(f.name)) ++ helpers: _*)
      case (Some(d), _) =>
        val logical = org.apache.spark.sql.types.StructType.fromDDL(d)
        val base = spark.read.schema(logical).parquet(paths: _*)
        if (helpers.isEmpty) base
        else base.select(logical.fields.toSeq.map(f => col(f.name)) ++ helpers: _*)
      case (None, _) =>
        val base = spark.read.parquet(paths: _*)
        if (helpers.isEmpty) base
        else base.select(base.columns.toSeq.map(col) ++ helpers: _*)
    }
  }

  /** DV row identity: the scanned file's path suffix after the LAST
    * "/files/" (matching the artifact's `rel` column — clone-safe, and
    * immune to a table path that itself contains "/files/"). */
  private def dvRelCol: Column =
    org.apache.spark.sql.functions.element_at(
      org.apache.spark.sql.functions.split(
        col("_metadata.file_path"), java.util.regex.Pattern.quote("/files/")),
      -1)

  /** Column names reserved for internal row identity ([[scanGroupsTagged]]'s
    * helpers and the probe's group tag) — refused at [[writeGroup]] so
    * a user column can never collide with (and silently break) the
    * DV anti-joins. */
  private val reservedCols =
    Set("__dv_rel", "__dv_pos", "__grp", "__file", "__cv", "__kind", "__ct")

  /** [[scanGroups]] with each group's row identity retained: adds
    * `__dv_rel` (file path suffix) and `__dv_pos` (`_metadata.row_index`)
    * BEFORE any mapping projection, so callers can anti-join deletion
    * vectors or tag rows with their group without `input_file_name()`
    * (which goes blank after a join). */
  private def scanGroupsTagged(
      spark: SparkSession, tableDir: String,
      groups: Seq[String], schemaDdl: Option[String],
      mapping: Seq[(String, String)]): DataFrame =
    scanGroups(spark, tableDir, groups, schemaDdl, mapping, helpers = Seq(
      dvRelCol.as("__dv_rel"),
      col("_metadata.row_index").as("__dv_pos")))

  /** The deletion-vector rows masking `groups` (empty frame if none):
    * (__dv_rel, __dv_pos) pairs read from the version's DV artifacts,
    * broadcast when the manifest-recorded total is small. */
  private def dvMaskRows(
      spark: SparkSession, tableDir: String,
      dvFor: Seq[(String, String, Long)]): DataFrame = {
    val artifacts = dvFor.map(_._2).distinct
    val groupSet = dvFor.map(_._1).toSet
    val raw = spark.read.parquet(artifacts.map(a => s"$tableDir/files/$a"): _*)
      // a shared artifact may carry rows for groups whose DV entry has
      // since been dropped (rewritten groups): mask only live entries
      .filter(org.apache.spark.sql.functions
        .substring_index(col("rel"), "/", 1).isin(groupSet.toSeq: _*))
      .select(col("rel").as("__dv_rel"), col("pos").as("__dv_pos"))
    val total = dvFor.map(_._3).sum
    val cap = spark.conf.getOption("spark.graft.dv.broadcastRows")
      .map(_.toLong).getOrElse(4000000L)
    if (total <= cap) org.apache.spark.sql.functions.broadcast(raw) else raw
  }

  /** A version's data: [[scanGroups]] with that version's deletion
    * vectors applied. Groups without a DV scan plain (full pushdown,
    * no join); DV'd groups anti-join their artifacts on (rel, pos).
    * This is THE read every consumer of live rows must use — a plain
    * [[scanGroups]] of a DV'd group resurrects deleted rows. */
  private[graft] def scanVersionGroups(
      spark: SparkSession, tableDir: String,
      groups: Seq[String], schemaDdl: Option[String],
      mapping: Seq[(String, String)] = Seq.empty,
      dvs: Seq[(String, String, Long)] = Seq.empty): DataFrame = {
    val groupSet = groups.toSet
    val dvFor = dvs.filter(d => groupSet(d._1))
    if (dvFor.isEmpty)
      return scanGroups(spark, tableDir, groups, schemaDdl, mapping)
    val dvGroups = dvFor.map(_._1).toSet
    val plain = groups.filterNot(dvGroups)
    val masked = scanGroupsTagged(
      spark, tableDir, groups.filter(dvGroups), schemaDdl, mapping)
      .join(dvMaskRows(spark, tableDir, dvFor),
        Seq("__dv_rel", "__dv_pos"), "left_anti")
      .drop("__dv_rel", "__dv_pos")
    if (plain.isEmpty) masked
    else scanGroups(spark, tableDir, plain, schemaDdl, mapping)
      .unionByName(masked)
  }

  /** The non-tombstone entries of a mapping; empty for identity. */
  private def activeMapping(
      mapping: Seq[(String, String)]): Seq[(String, String)] =
    mapping.filter(_._1.nonEmpty)

  private def physicalName(
      active: Seq[(String, String)], logical: String): String =
    active.collectFirst {
      case (l, p) if l.equalsIgnoreCase(logical) => p
    }.getOrElse(logical)

  /** Validate an APPEND batch's schema against the table's, returning
    * the (possibly evolved) schema DDL the new manifest should record.
    * Columns are matched by name case-insensitively (Spark's default
    * resolution); common columns must agree on type exactly. Without
    * `evolve`, any drift raises; with it, NEW columns extend the table
    * schema (appended after the existing columns, Delta's
    * mergeSchema placement) and columns MISSING from the batch are
    * tolerated (null-filled in the new group on read). */
  private def validateAppendSchema(
      df: DataFrame, parentDdl: Option[String], evolve: Boolean): Option[String] = {
    import org.apache.spark.sql.types.StructType
    val batch = StructType(df.schema.fields.map(_.copy(nullable = true)))
    parentDdl match {
      case None => Some(batch.toDDL) // pre-schema table: adopt the batch's
      case Some(ddl) =>
        val table = StructType.fromDDL(ddl)
        val tableByName = table.fields.map(f => f.name.toLowerCase -> f).toMap
        // Type equality modulo nullability: compare the sql strings of
        // the nullable-normalized types (sameType is private[sql]).
        import org.apache.spark.sql.types._
        def allNullable(dt: DataType): DataType = dt match {
          case s: StructType => StructType(s.fields.map(f =>
            f.copy(dataType = allNullable(f.dataType), nullable = true)))
          case a: ArrayType => ArrayType(allNullable(a.elementType), containsNull = true)
          case m: MapType =>
            MapType(allNullable(m.keyType), allNullable(m.valueType), valueContainsNull = true)
          case other => other
        }
        def norm(dt: DataType): String = allNullable(dt).sql
        val conflicts = batch.fields.flatMap { bf =>
          tableByName.get(bf.name.toLowerCase).collect {
            case tf if norm(tf.dataType) != norm(bf.dataType) =>
              s"${bf.name}: table ${tf.dataType.simpleString} vs batch ${bf.dataType.simpleString}"
          }
        }
        require(conflicts.isEmpty,
          s"append schema type conflict(s): ${conflicts.mkString("; ")}")
        val newCols = batch.fields.filterNot(f => tableByName.contains(f.name.toLowerCase))
        val missing = table.fields.map(_.name.toLowerCase).toSet
          .diff(batch.fields.map(_.name.toLowerCase).toSet)
        if (!evolve) {
          require(newCols.isEmpty && missing.isEmpty,
            s"append schema drift (pass evolveSchema=true to accept): " +
              s"new=[${newCols.map(_.name).mkString(",")}] " +
              s"missing=[${missing.mkString(",")}]")
          Some(ddl)
        } else Some(StructType(table.fields ++ newCols).toDDL)
    }
  }

  private def writeGroup(
      df: DataFrame, tableDir: String,
      mapping: Seq[(String, String)] = Seq.empty): (String, Long) = {
    val clash = df.columns.filter(c => reservedCols(c.toLowerCase))
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} are reserved for internal " +
        "row identity (the deletion-vector machinery) — rename the column")
    val group = java.util.UUID.randomUUID().toString
    // Under column mapping, groups always store PHYSICAL names: a
    // batch arrives with logical columns and is renamed on the way in,
    // so a later RENAME stays metadata-only for this group too.
    val am = activeMapping(mapping)
    val out =
      if (am.isEmpty) df
      else df.select(df.columns.map(c =>
        col(c).as(physicalName(am, c))).toSeq: _*)
    // A job failing MID-FLIGHT — the data write, the stats read-back,
    // or the sidecar write — leaves a directory no manifest will ever
    // reference and vacuum can never reclaim: delete it before
    // rethrowing. The cleanup delete itself is Try-wrapped so an
    // unhealthy filesystem cannot mask the root-cause exception.
    val spark = df.sparkSession
    val stats =
      try {
        // Stats are collected DURING the write (Dataset.observe): the
        // manifest row count and the group's min/max column stats come
        // from the exact rows the writer emitted, in the same job — the
        // read-back aggregate this replaces was a second full scan of
        // every committed byte. The `_stats.json` sidecar lands inside
        // the (still-unpublished) group dir, so a published version's
        // stats are always complete and vacuum reclaims them with the
        // data. See [[GroupStats]] and [[readWhere]].
        val obs = org.apache.spark.sql.Observation()
        val aggs = GroupStats.observedAggs(out)
        out.observe(obs, aggs.head, aggs.tail: _*)
          .write.parquet(s"$tableDir/files/$group")
        val st = GroupStats.fromObserved(out.schema, obs.get)
        GroupStats.write(fs(spark, tableDir),
          GroupStats.sidecarPath(tableDir, group), st)
        st
      } catch { case scala.util.control.NonFatal(e) =>
        scala.util.Try(fs(spark, tableDir)
          .delete(new Path(s"$tableDir/files/$group"), true))
        throw e
      }
    (group, stats.nRows)
  }

  /** CHECK-constraint enforcement on a freshly-written (unpublished)
    * group: ONE aggregate pass over the written files counts each
    * constraint's violations (ANSI CHECK: a row violates only when the
    * expression is FALSE — NULL passes). Any violation deletes the
    * group and raises with per-constraint counts; a constraint whose
    * expression no longer analyzes (a snapshot dropped its column)
    * raises too — Delta's rule: drop the constraint before dropping
    * the column. `schemaDdl` (the table schema the group will be read
    * under) null-fills columns the group doesn't carry, so an evolved
    * append missing a constrained column passes as NULL. */
  private def enforceConstraints(
      spark: SparkSession, tableDir: String, group: String,
      schemaDdl: Option[String], cons: Seq[(String, String)],
      mapping: Seq[(String, String)] = Seq.empty): Unit = {
    if (cons.isEmpty) return
    val path = s"$tableDir/files/$group"
    def fail(msg: String): Nothing = {
      fs(spark, tableDir).delete(new Path(path), true)
      throw new IllegalArgumentException(msg)
    }
    // Constraints are written against LOGICAL names; the group stores
    // physical ones — read through the same aliasing as scanGroups.
    val am = activeMapping(mapping)
    def logicalView: DataFrame = (schemaDdl, am) match {
      case (Some(d), m) if m.nonEmpty =>
        val logical = org.apache.spark.sql.types.StructType.fromDDL(d)
        val physical = org.apache.spark.sql.types.StructType(
          logical.fields.map(f => f.copy(name = physicalName(m, f.name))))
        spark.read.schema(physical).parquet(path)
          .select(logical.fields.map(f =>
            col(physicalName(m, f.name)).as(f.name)).toSeq: _*)
      case (Some(d), _) => spark.read.schema(
        org.apache.spark.sql.types.StructType.fromDDL(d)).parquet(path)
      case (None, _) => spark.read.parquet(path)
    }
    val aggs: Seq[Column] = cons.map { case (n, e) =>
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          !coalesce(org.apache.spark.sql.functions.expr(e), lit(true)), 1L)
          .otherwise(0L)).as(n)
    }
    val row =
      try logicalView.agg(aggs.head, aggs.tail: _*).head()
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          fail(s"CHECK constraint no longer analyzes against the written " +
            s"schema (${e.getMessage.linesIterator.next()}) — drop the " +
            "constraint before reshaping its columns")
      }
    val bad = cons.zipWithIndex.collect {
      case ((n, e), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
        s"$n (`$e`): ${row.getLong(i)} row(s)"
    }
    if (bad.nonEmpty)
      fail(s"CHECK constraint violation(s): ${bad.mkString("; ")}")
  }

  /** ALTER TABLE ADD CONSTRAINT: validate the constraint against ALL
    * current rows (one scan; any violation raises with the count and
    * nothing is committed), then publish a metadata-only version — same
    * file groups, same rows — whose manifest carries the extended
    * constraint set. Every subsequent write ([[commit]]/[[append]]/
    * [[appendOnce]]/[[delete]]/[[update]]/[[merge]]) enforces the live
    * set on the data it writes, BEFORE its manifest publishes, so a
    * published version can never contain a violating row. ANSI CHECK
    * semantics: NULL passes. Returns the new version. */
  def addConstraint(
      spark: SparkSession, tableDir: String,
      name: String, exprSql: String): Long = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"constraint name must be an identifier: '$name'")
    require(exprSql.trim.nonEmpty, "constraint expression must be non-empty")
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val existing = constraints(spark, tableDir)
    require(!existing.exists(_._1.equalsIgnoreCase(name)),
      s"constraint '$name' already exists")
    val m = parseManifest(spark, tableDir, v)
    val violations = scanVersionGroups(
      spark, tableDir, m.files, m.schemaDdl, m.mapping, m.dvs)
      .filter(!coalesce(org.apache.spark.sql.functions.expr(exprSql), lit(true)))
      .count()
    require(violations == 0L,
      s"cannot add CHECK constraint '$name' (`$exprSql`): " +
        s"$violations existing row(s) violate it")
    publishExpecting(spark, tableDir, v, m.files, Seq.empty,
      m.nRows, "add_constraint", m.schemaDdl,
      Some(existing :+ (name -> exprSql)), m.mapping, dvs = m.dvs,
      rowsByGroup = m.fileRows)
  }

  /** ALTER TABLE DROP CONSTRAINT (metadata-only). */
  def dropConstraint(
      spark: SparkSession, tableDir: String, name: String): Long = {
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val existing = constraints(spark, tableDir)
    require(existing.exists(_._1.equalsIgnoreCase(name)),
      s"no such constraint: '$name' (have ${existing.map(_._1).mkString(", ")})")
    val m = parseManifest(spark, tableDir, v)
    publishExpecting(spark, tableDir, v, m.files, Seq.empty,
      m.nRows, "drop_constraint", m.schemaDdl,
      Some(existing.filterNot(_._1.equalsIgnoreCase(name))), m.mapping,
      dvs = m.dvs, rowsByGroup = m.fileRows)
  }

  /** The identifier-boundary test "does this constraint expression
    * mention column `name`" — deliberately conservative (a false
    * positive only refuses a DDL; a false negative would break a
    * constraint silently). */
  private def constraintMentions(expr: String, name: String): Boolean =
    ("(?i)(?<![A-Za-z0-9_`])" + java.util.regex.Pattern.quote(name) +
      "(?![A-Za-z0-9_])").r.findFirstIn(expr).isDefined

  /** ALTER TABLE RENAME COLUMN — METADATA-ONLY, Delta's column mapping:
    * the logical schema changes, the data files never do. The manifest
    * records (logical → physical) name pairs; reads of EVERY version
    * resolve through that version's own mapping, so time travel to a
    * pre-rename version still shows the old name. Renaming a column a
    * CHECK constraint references is refused (drop or rewrite the
    * constraint first — Delta's rule too); so is a new name colliding
    * with any live logical or historical physical name. Returns the new
    * version. */
  def renameColumn(
      spark: SparkSession, tableDir: String,
      oldName: String, newName: String): Long = {
    require(newName.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"new column name must be an identifier: '$newName'")
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val m = parseManifest(spark, tableDir, v)
    val ddl = m.schemaDdl.getOrElse(throw new IllegalArgumentException(
      s"$tableDir has a pre-schema manifest; rename needs a recorded schema"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val field = schema.fields.find(_.name.equalsIgnoreCase(oldName))
      .getOrElse(throw new IllegalArgumentException(
        s"no such column: '$oldName' (have ${schema.fieldNames.mkString(", ")})"))
    require(!schema.fieldNames.exists(_.equalsIgnoreCase(newName)),
      s"column '$newName' already exists")
    val offenders = m.constraints.filter { case (_, e) =>
      constraintMentions(e, field.name) }
    require(offenders.isEmpty,
      s"cannot rename '$oldName': CHECK constraint(s) " +
        s"${offenders.map(_._1).mkString(", ")} reference it — " +
        "drop the constraint first")
    // Full mapping (identity entries materialize on first rename).
    val base =
      if (m.mapping.nonEmpty) m.mapping
      else schema.fieldNames.toSeq.map(n => (n, n))
    require(!base.exists(_._2.equalsIgnoreCase(newName)),
      s"cannot rename to '$newName': it is the physical name of a " +
        "renamed or dropped column; stale bytes in old file groups " +
        "would resurface under it — choose a different name")
    val mapping = base.map {
      case (l, p) if l.equalsIgnoreCase(field.name) => (newName, p)
      case other => other
    }
    val newSchema = org.apache.spark.sql.types.StructType(schema.fields.map(f =>
      if (f.name.equalsIgnoreCase(oldName)) f.copy(name = newName) else f))
    publishExpecting(spark, tableDir, v, m.files, Seq.empty,
      m.nRows, "rename_column", Some(newSchema.toDDL),
      Some(m.constraints), mapping, dvs = m.dvs, rowsByGroup = m.fileRows)
  }

  /** ALTER TABLE DROP COLUMN — METADATA-ONLY (Delta column mapping):
    * the column leaves the logical schema, its physical bytes stay in
    * the old groups (unread: every scan declares only the live physical
    * columns) and its physical name is TOMBSTONED so a future column
    * cannot accidentally resurface the stale bytes. Dropping a column a
    * CHECK constraint references is refused by name; so is dropping the
    * last column. Time travel before the drop still shows it. Returns
    * the new version. */
  def dropColumn(
      spark: SparkSession, tableDir: String, name: String): Long = {
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val m = parseManifest(spark, tableDir, v)
    val ddl = m.schemaDdl.getOrElse(throw new IllegalArgumentException(
      s"$tableDir has a pre-schema manifest; drop needs a recorded schema"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val field = schema.fields.find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"no such column: '$name' (have ${schema.fieldNames.mkString(", ")})"))
    require(schema.fields.length > 1, "cannot drop the only column")
    val offenders = m.constraints.filter { case (_, e) =>
      constraintMentions(e, field.name) }
    require(offenders.isEmpty,
      s"cannot drop '$name': CHECK constraint(s) " +
        s"${offenders.map(_._1).mkString(", ")} reference it — " +
        "drop the constraint first")
    val base =
      if (m.mapping.nonEmpty) m.mapping
      else schema.fieldNames.toSeq.map(n => (n, n))
    val physical = physicalName(activeMapping(base), field.name)
    val mapping = base.filterNot(_._1.equalsIgnoreCase(field.name)) :+
      ("" -> physical) // tombstone: the physical name stays reserved
    val newSchema = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name.equalsIgnoreCase(name)))
    publishExpecting(spark, tableDir, v, m.files, Seq.empty,
      m.nRows, "drop_column", Some(newSchema.toDDL),
      Some(m.constraints), mapping, dvs = m.dvs, rowsByGroup = m.fileRows)
  }

  /** Commit `df` as a FULL-SNAPSHOT version; returns the version number.
    * The manifest records the snapshot's schema (a snapshot may reshape
    * the table freely — it rewrites every row). */
  def commit(df: DataFrame, tableDir: String): Long = {
    val spark = df.sparkSession
    val (group, n) = writeGroup(df, tableDir)
    // Enforce against the EXACT constraint set the published manifest
    // carries: re-read per attempt, re-enforced only when the set
    // changed, published via expected-parent so a concurrent
    // addConstraint can neither be dropped from the manifest (lost
    // metadata update) nor claimed without validation.
    var enforcedFor: Option[Seq[(String, String)]] = None
    while (true) {
      val parent = latestVersion(spark, tableDir)
      val cons =
        if (parent < 0) Seq.empty[(String, String)]
        else parseManifest(spark, tableDir, parent).constraints
      if (!enforcedFor.contains(cons)) {
        enforceConstraints(spark, tableDir, group, Some(storedSchema(df)), cons)
        enforcedFor = Some(cons)
      }
      try return publishExpecting(spark, tableDir, parent, Seq(group),
        Seq.empty, n, "snapshot", Some(storedSchema(df)), Some(cons),
        rowsByGroup = Map(group -> n))
      catch { case _: java.util.ConcurrentModificationException => () }
    }
    -1L // unreachable
  }

  /** Commit `df` as an APPEND version: parent file groups are shared,
    * only the new rows are written. Returns the version number.
    * The batch's schema is validated against the table's manifest
    * schema; `evolveSchema = true` accepts NEW columns (the table
    * schema extends, old groups null-fill them on read — Delta's
    * mergeSchema) and batches missing existing columns (null-filled in
    * the new group); type conflicts always raise. */
  def append(df: DataFrame, tableDir: String, evolveSchema: Boolean = false): Long = {
    val spark = df.sparkSession
    // Fail fast on schema drift before paying the write.
    val latest0 = latestVersion(spark, tableDir)
    val m0 =
      if (latest0 < 0) None else Some(parseManifest(spark, tableDir, latest0))
    validateAppendSchema(df, m0.flatMap(_.schemaDdl), evolveSchema)
    // The group is written under the CURRENT column mapping (physical
    // names); a concurrent rename/drop between write and publish is a
    // metadata conflict the loop detects and raises on.
    val mappingAtWrite = m0.map(_.mapping).getOrElse(Seq.empty)
    val (group, n) = writeGroup(df, tableDir, mappingAtWrite)
    // Optimistic retry: the batch's data is parent-independent (the
    // group is already durable), so a concurrent commit just means
    // re-reading the new parent and re-publishing — appendOnce's loop,
    // without the watermark. Schema and constraints are re-resolved
    // against each observed parent; a violation deletes the group.
    var enforcedFor: Option[Seq[(String, String)]] = None
    while (true) {
      val parent = latestVersion(spark, tableDir)
      val (parentGroups, parentRows, parentSchema, parentCons, parentMap,
        parentDvs, parentFileRows) =
        if (parent < 0)
          (Seq.empty[String], 0L, None: Option[String],
            Seq.empty[(String, String)], Seq.empty[(String, String)],
            Seq.empty[(String, String, Long)], Map.empty[String, Long])
        else {
          val m = parseManifest(spark, tableDir, parent)
          (m.files, m.nRows, m.schemaDdl, m.constraints, m.mapping, m.dvs,
            m.fileRows)
        }
      if (parentMap != mappingAtWrite) {
        fs(spark, tableDir).delete(new Path(s"$tableDir/files/$group"), true)
        throw new java.util.ConcurrentModificationException(
          s"column mapping of $tableDir changed while appending " +
            "(concurrent RENAME/DROP COLUMN) — re-run the append")
      }
      val schema =
        try validateAppendSchema(df, parentSchema, evolveSchema)
        catch { case e: Throwable =>
          fs(spark, tableDir).delete(new Path(s"$tableDir/files/$group"), true)
          throw e
        }
      val mapping =
        try extendedMapping(parentMap, schema)
        catch { case e: Throwable =>
          fs(spark, tableDir).delete(new Path(s"$tableDir/files/$group"), true)
          throw e
        }
      if (!enforcedFor.contains(parentCons)) {
        enforceConstraints(spark, tableDir, group, schema, parentCons, mapping)
        enforcedFor = Some(parentCons)
      }
      try return publishExpecting(spark, tableDir, parent,
        parentGroups :+ group, Seq.empty, parentRows + n, "append", schema,
        Some(parentCons), mapping, dvs = parentDvs,
        rowsByGroup = parentFileRows + (group -> n))
      catch { case _: java.util.ConcurrentModificationException
          if latestVersion(spark, tableDir) != parent => () }
    }
    -1L // unreachable
  }

  /** Extend a column mapping to cover `schemaDdl`'s fields: existing
    * entries keep their physical names, NEW (evolved) columns get
    * identity entries — unless the new name collides with a physical
    * name already used by a live or DROPPED column, which would make
    * stale bytes in old groups resurface under the new column; that
    * raises (pick a different name, as Delta's column mapping also
    * requires). Identity tables (empty mapping) stay empty. */
  private def extendedMapping(
      parent: Seq[(String, String)],
      schemaDdl: Option[String]): Seq[(String, String)] = {
    if (parent.isEmpty) return parent
    val fields = schemaDdl.map(d =>
      org.apache.spark.sql.types.StructType.fromDDL(d).fields.map(_.name).toSeq)
      .getOrElse(Seq.empty)
    val newCols = fields.filterNot(f => parent.exists(_._1.equalsIgnoreCase(f)))
    newCols.foreach { c =>
      require(!parent.exists(_._2.equalsIgnoreCase(c)),
        s"cannot add column '$c': its name is the physical name of a " +
          "renamed or dropped column; stale bytes in old file groups " +
          "would resurface under it — choose a different name")
    }
    parent ++ newCols.map(c => (c, c))
  }

  /** Highest `batchId` any committed version records for `appId`, or -1
    * if none — the idempotence watermark [[appendOnce]] consults. The
    * scan is metadata-only (a few KB of JSON per version, on the
    * driver) and INCREMENTAL: manifests are immutable once published,
    * so the per-table walk is cached (v0-mtime epoch detects a table
    * re-created at the same path) and each call parses only manifests
    * it has not seen. Without this a long-running ingest would pay an
    * O(versions) manifest sweep PER BATCH — quadratic over the life of
    * a 10k-batch stream. Versions dropped by [[vacuum]] no longer
    * witness their batches, so retention must exceed the longest replay
    * window a restarting writer can attempt — the exact contract Delta
    * documents for its SetTransaction retention; the cache keeps the
    * max it witnessed BEFORE the vacuum for the session's lifetime,
    * which only widens the replay protection. */
  def lastCommittedBatch(
      spark: SparkSession, tableDir: String, appId: String): Long = {
    val (lowest, latest) = versionBounds(spark, tableDir)
    if (latest < 0) return -1L
    val epoch = tableEpoch(spark, tableDir, lowest)
    val key = cacheKey(spark, tableDir)
    txnWatermarkCache.synchronized {
      val (cachedV, marks) = Option(txnWatermarkCache.get(key)) match {
        case Some((e, v, m)) if e == epoch && v <= latest => (v, m)
        case _ => (-1L, Map.empty[String, Long])
      }
      var out = marks
      ((cachedV + 1) to latest).foreach { v =>
        val txn =
          try parseManifest(spark, tableDir, v).txn
          catch { case _: java.io.FileNotFoundException => None }
        txn.foreach { case (app, b) =>
          out = out.updated(app, math.max(out.getOrElse(app, -1L), b))
        }
      }
      txnWatermarkCache.put(key, (epoch, latest, out))
      out.getOrElse(appId, -1L)
    }
  }

  private val txnWatermarkCache =
    lruMap[(Long, Long, Map[String, Long])](256)

  /** IDEMPOTENT append — the exactly-once streaming-ingest seam, the
    * same mechanism as Delta's `txnAppId`/`txnVersion` options: the
    * commit manifest records `(appId, batchId)`, and a batch at or
    * below the app's committed watermark is a REPLAY and is skipped
    * (returns None) instead of duplicating rows. Structured Streaming's
    * `foreachBatch` is at-least-once across checkpoint restarts; this
    * turns it into exactly-once, because the replayed micro-batch
    * carries the same deterministic batchId the first attempt committed.
    *
    * Concurrency: the watermark is re-checked after every lost
    * manifest-publish race, so two racing writers of the SAME
    * (appId, batchId) — a zombie executor beside its replacement —
    * commit once: the loser observes the winner's txn and abandons its
    * (orphaned, vacuum-reclaimable) group. Writers of different appIds
    * interleave freely, as with [[append]]. Requires batchIds that are
    * monotone per appId — exactly what the streaming engine provides. */
  def appendOnce(
      df: DataFrame, tableDir: String, appId: String, batchId: Long): Option[Long] = {
    require(appId.nonEmpty && !appId.exists(c => c == '"' || c == '\\'),
      s"appId must be non-empty and quote-free: '$appId'")
    val spark = df.sparkSession
    if (lastCommittedBatch(spark, tableDir, appId) >= batchId) return None
    val latest0 = latestVersion(spark, tableDir)
    val mappingAtWrite =
      if (latest0 < 0) Seq.empty[(String, String)]
      else parseManifest(spark, tableDir, latest0).mapping
    val (group, n) = writeGroup(df, tableDir, mappingAtWrite)
    val f = fs(spark, tableDir)
    // Constraints are enforced against the EXACT set the published
    // manifest will carry (re-checked after every lost race, like
    // [[append]]): a concurrent addConstraint landing mid-commit must
    // not yield a version whose manifest claims a constraint its data
    // was never validated against.
    var enforcedFor: Option[Seq[(String, String)]] = None
    while (true) {
      if (lastCommittedBatch(spark, tableDir, appId) >= batchId) {
        // A racer committed this batch between our check and publish:
        // abandon the duplicate group (unreferenced → vacuum reclaims).
        f.delete(new Path(s"$tableDir/files/$group"), true)
        return None
      }
      val parent = latestVersion(spark, tableDir)
      val (parentGroups, parentRows, parentSchema, parentCons, parentMap,
        parentDvs, parentFileRows) =
        if (parent < 0)
          (Seq.empty[String], 0L, None: Option[String],
            Seq.empty[(String, String)], Seq.empty[(String, String)],
            Seq.empty[(String, String, Long)], Map.empty[String, Long])
        else {
          val m = parseManifest(spark, tableDir, parent)
          (m.files, m.nRows, m.schemaDdl, m.constraints, m.mapping, m.dvs,
            m.fileRows)
        }
      if (parentMap != mappingAtWrite) {
        f.delete(new Path(s"$tableDir/files/$group"), true)
        throw new java.util.ConcurrentModificationException(
          s"column mapping of $tableDir changed while appending " +
            "(concurrent RENAME/DROP COLUMN) — re-run the batch")
      }
      // Streaming batches carry a fixed schema: strict validation. A
      // drift failure deletes the already-written group — otherwise the
      // orphan is permanent (vacuum only reclaims dropped-manifest groups).
      val schema =
        try validateAppendSchema(df, parentSchema, evolve = false)
        catch { case e: Throwable =>
          f.delete(new Path(s"$tableDir/files/$group"), true)
          throw e
        }
      if (!enforcedFor.contains(parentCons)) {
        enforceConstraints(spark, tableDir, group, schema, parentCons, parentMap)
        enforcedFor = Some(parentCons)
      }
      val v = parent + 1
      if (publishRecordAt(spark, tableDir, v, "append",
          parentGroups :+ group, parentRows + n, Some(appId -> batchId),
          schema, parentCons, parentMap, parentDvs,
          parentFileRows + (group -> n), Seq.empty))
        return Some(v)
      // lost the race: loop re-reads the new latest AND the watermark
    }
    None // unreachable
  }

  /** Run a streaming query whose sink is this versioned table: each
    * micro-batch lands as ONE append version via [[appendOnce]], so the
    * table's history IS the ingest log — every batch a version, CDC
    * consumers ([[changes]]/[[pollChanges]]/[[changesStream]]) see each
    * batch exactly once, and a checkpoint-restart replay of the last
    * batch is deduplicated by the txn watermark rather than appended
    * twice. Returns the started query: drain-shaped callers
    * (AvailableNow, the default) `awaitTermination()`; long-running
    * ingest manages the handle. */
  def streamInto(
      source: DataFrame,
      tableDir: String,
      appId: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendOnce(batch, tableDir, appId, id); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Apply a curation ACTION to the latest version and commit the result
    * as a new full-snapshot version — curation with rollback. This is
    * the versioned composition of the strike operators
    * ([[Dedup.containmentStrike]], [[Dedup.paragraphStrike]],
    * [[Contamination.decontaminate]], ...): instead of handing back a
    * frame the caller must manage, the struck corpus becomes the next
    * `VERSION AS OF`, the pre-strike corpus stays readable at its own
    * version, and an over-aggressive strike is undone by reading (or
    * re-committing) the parent — the operational shape Delta users get
    * from `RESTORE`. Returns the new version number.
    *
    * Scale: the action's plan executes exactly once, as the write of the
    * new file group — no extra materialization beyond what [[commit]]
    * already does; the parent version's files are untouched (immutable
    * groups), so rollback is metadata-only. */
  def curate(spark: SparkSession, tableDir: String)(
      action: DataFrame => DataFrame): Long = {
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    snapshotExpecting(action(read(spark, tableDir, v)), tableDir, v)
  }

  /** REBASE publication for MAINTENANCE rewrites ([[compact]],
    * [[cluster]]) — Delta's OPTIMIZE conflict resolution: a compaction
    * of version P losing the publish race to PURE APPENDS must not
    * throw away its full rewrite (at 100 TB that is the whole table's
    * bytes) — the compacted groups plus the winners' APPENDED groups
    * are, together, exactly the latest version's content, so the
    * commit republishes that union at the new head. Rebase is sound
    * ONLY because compaction is row-invariant over its input: the
    * final table equals compacted(P) ∪ appends = latest. Anything
    * else among the winners — DML/snapshot (rows changed under us),
    * constraint DDL (the rewrite was never validated against it),
    * column DDL, or a column-mapped table (winner groups store
    * physical names this manifest's empty mapping would misread) —
    * deletes the written groups and raises
    * [[java.util.ConcurrentModificationException]], the pre-rebase
    * contract. Winner appends may EVOLVE the schema: the rebased
    * manifest adopts the latest schema and the compacted groups
    * null-fill the new columns, the same contract any old group has.
    * Returns the published version. */
  /** Test seam: runs once per rebase publish attempt, after the winner
    * set is read and before the conditional publish. CompactRebaseSpec
    * injects appends here to force deterministic race losses; production
    * leaves it a no-op. */
  private[graft] var rebaseAttemptHook: () => Unit = () => ()

  private[graft] def rebasePublish(
      spark: SparkSession, tableDir: String, expectedParent: Long,
      newGroups: Seq[(String, Long)],
      schemaDdl: Option[String]): Long = {
    val newRows = newGroups.map(_._2).sum
    val f = fs(spark, tableDir)
    def abandon(why: String): Nothing = {
      newGroups.foreach(g => f.delete(new Path(s"$tableDir/files/${g._1}"), true))
      throw new java.util.ConcurrentModificationException(
        s"maintenance rewrite of $tableDir read version $expectedParent " +
          s"but cannot rebase: $why — re-run against the new latest version")
    }
    var parent = expectedParent
    var extraGroups = Seq.empty[String]
    var extraRows = 0L
    var extraKnown = Map.empty[String, Long]
    var schema = schemaDdl
    while (true) {
      val latest = latestVersion(spark, tableDir)
      if (latest > parent) {
        val metas = ((parent + 1) to latest).map { w =>
          try parseManifest(spark, tableDir, w)
          catch {
            case _: java.io.FileNotFoundException =>
              abandon(s"version $w was vacuumed while rebasing")
          }
        }
        metas.zipWithIndex.foreach { case (m, i) =>
          if (m.mode != "append")
            abandon(s"concurrent version ${parent + 1 + i} is a " +
              s"'${m.mode}', not an append — the rewrite no longer " +
              "represents the table")
          if (m.mapping.nonEmpty)
            abandon("the table uses column mapping; a rebased snapshot " +
              "manifest cannot carry the winners' physical names")
        }
        // Diff baseline pinned to the rewrite's ORIGINAL read version:
        // the extras must be files(latest) \ files(expectedParent). A
        // baseline that advances with `parent` across publish retries
        // silently drops the first retry window's appended groups on a
        // second race loss (observed as a lost 1000-row append in
        // CompactRebaseSpec).
        val baseFiles =
          (try parseManifest(spark, tableDir, expectedParent)
          catch {
            case _: java.io.FileNotFoundException =>
              abandon(
                s"parent version $expectedParent was vacuumed while rebasing")
          }).files.toSet
        val latestMeta = metas.last
        extraGroups = latestMeta.files.filterNot(baseFiles)
        extraKnown = latestMeta.fileRows
        extraRows = groupRows(spark, tableDir, extraGroups,
          latestMeta.schemaDdl, known = extraKnown)
        schema = latestMeta.schemaDdl.orElse(schema)
        parent = latest
      }
      val cons = constraints(spark, tableDir)
      rebaseAttemptHook()
      val target = parent + 1
      val allGroups = newGroups.map(_._1) ++ extraGroups
      // mode 'optimize' (Delta's operation name): maintenance rewrites
      // are row-invariant, and describeHistory readers deserve the
      // "this was a compaction, not a content change" signal; every
      // CDC/stream consumer treats any non-append mode as a rewrite
      // boundary, so the semantics are unchanged.
      if (publishRecordAt(spark, tableDir, target, "optimize", allGroups,
          newRows + extraRows, None, schema, cons, Seq.empty, Seq.empty,
          newGroups.toMap ++ extraKnown, Seq.empty))
        return target
      // lost again: the loop re-reads the (grown) winner set
    }
    -1L // unreachable
  }

  /** [[commit]]'s shape for snapshots whose CONTENT derives from
    * `expectedParent` ([[curate]]): publication is
    * optimistic — a concurrent commit raises instead of being silently
    * overwritten by a snapshot that never saw it. (Maintenance rewrites
    * — compact/cluster — go through [[rebasePublish]] instead: they are
    * row-invariant, so pure-append winners merge rather than raise.
    * `curate`'s action is arbitrary — rebasing would silently skip
    * applying it to the winners' rows — so it keeps the strict raise.) */
  private def snapshotExpecting(
      df: DataFrame, tableDir: String, expectedParent: Long): Long = {
    val spark = df.sparkSession
    val (group, n) = writeGroup(df, tableDir)
    enforceConstraints(spark, tableDir, group,
      Some(storedSchema(df)), constraints(spark, tableDir))
    publishExpecting(spark, tableDir, expectedParent, Seq(group), Seq(group),
      n, "snapshot", Some(storedSchema(df)), rowsByGroup = Map(group -> n))
  }

  /** Read a version (default: latest) — `VERSION AS OF` for parquet.
    * A plain multi-path parquet scan: pushdown and pruning intact. With
    * a schema-bearing manifest the scan is inference-free and groups
    * missing an evolved column null-fill it (see [[scanGroups]]). */
  def read(spark: SparkSession, tableDir: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val m = parseManifest(spark, tableDir, v)
    require(m.files.nonEmpty, s"version $v of $tableDir lists no files")
    scanVersionGroups(spark, tableDir, m.files, m.schemaDdl, m.mapping, m.dvs)
  }

  /** TIMESTAMP AS OF: the largest version whose manifest `committed_at`
    * is at or before `ts` — Delta's second time-travel axis. Raises if
    * the table's history starts after `ts` (nothing existed then) or if
    * retention ([[vacuum]]) dropped every manifest at-or-before `ts`.
    * Metadata-only: a linear driver-side scan of the per-version JSON. */
  def versionAt(
      spark: SparkSession, tableDir: String, ts: java.time.Instant): Long = {
    val latest = latestVersion(spark, tableDir)
    require(latest >= 0, s"no versions committed under $tableDir")
    val at = (0L to latest).flatMap { v =>
      scala.util.Try(parseManifest(spark, tableDir, v)).toOption
        .filter(m => m.committedAt.nonEmpty &&
          !java.time.Instant.parse(m.committedAt).isAfter(ts))
        .map(_ => v)
    }
    require(at.nonEmpty,
      s"no version of $tableDir committed at or before $ts " +
        "(history starts later, or retention dropped it)")
    at.max
  }

  /** `TIMESTAMP AS OF` read: [[read]] at [[versionAt]]`(ts)`. */
  def readAsOf(
      spark: SparkSession, tableDir: String, ts: java.time.Instant): DataFrame =
    read(spark, tableDir, versionAt(spark, tableDir, ts))

  /** `read` + predicates with MANIFEST-LEVEL DATA SKIPPING — the
    * Delta/Iceberg data-skipping economics for versioned tables. Each
    * file group carries a min/max/null-count sidecar written at commit
    * time ([[GroupStats]]); `readWhere` resolves the predicates against
    * the table's schema, then excludes every group whose bounds prove
    * no row can match, BEFORE the scan is planned. The surviving scan
    * still applies the full predicate (skipping is an optimization,
    * never the filter), so the result is always exactly
    * `read(...).filter(preds)` — pruning can only shrink the file set.
    *
    * Why this beats parquet row-group stats at 100 TB: parquet prunes
    * per-task after scheduling; this prunes at PLANNING time from a few
    * KB of driver-side JSON, so a year-of-appends table answering a
    * one-week window never lists, opens, or schedules the other 51
    * weeks' groups. Groups without a sidecar (pre-feature tables) and
    * predicates the stats can't reason about (functions, column-vs-
    * column) are conservatively kept. */
  def readWhere(
      spark: SparkSession,
      tableDir: String,
      version: Long = -1L)(preds: Column*): DataFrame = {
    require(preds.nonEmpty, "readWhere needs at least one predicate; use read() otherwise")
    val v = if (version >= 0) version else latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val m = parseManifest(spark, tableDir, v)
    val groups = m.files
    require(groups.nonEmpty, s"version $v of $tableDir lists no files")
    val cond = preds.reduce(_ && _)
    val (kept, _) = pruneGroups(spark, tableDir, groups, m.schemaDdl, cond, m.mapping, m.fileStats)
    if (kept.isEmpty)
      scanVersionGroups(spark, tableDir, groups, m.schemaDdl, m.mapping, m.dvs)
        .filter(cond).limit(0)
    else scanVersionGroups(spark, tableDir, kept, m.schemaDdl, m.mapping, m.dvs)
      .filter(cond)
  }

  /** Partition `groups` into (mayMatch, provablyNoMatch) under `cond`
    * using the per-group stats sidecars — the planning-time skipping
    * shared by [[readWhere]], [[delete]] and [[merge]]. The predicate is
    * resolved ONCE against the full scan's schema (the optimized plan's
    * Filter has real attribute names, type-promoted literals, and
    * between/isin lowered to comparisons); groups without stats are
    * conservatively kept on the mayMatch side. Bounds come from the
    * MANIFEST's embedded stats first (`fileStats` — zero metadata I/O
    * beyond the already-parsed manifest); only groups the manifest
    * never recorded (pre-upgrade) pay the batched sidecar read. */
  private def pruneGroups(
      spark: SparkSession, tableDir: String, groups: Seq[String],
      schemaDdl: Option[String], cond: Column,
      mapping: Seq[(String, String)] = Seq.empty,
      fileStats: Map[String, String] = Map.empty): (Seq[String], Seq[String]) = {
    // Under column mapping the optimizer pushes `cond` through the
    // alias projection, so the extracted Filter already speaks PHYSICAL
    // names - the names the stats sidecars carry. A filter that cannot
    // push (nondeterministic) keeps logical names and conservatively
    // prunes nothing.
    val full = scanGroups(spark, tableDir, groups, schemaDdl, mapping)
    val resolved: Option[org.apache.spark.sql.catalyst.expressions.Expression] =
      full.filter(cond).queryExecution.optimizedPlan.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
    // No surviving Filter (a constant-true condition folds away, a
    // nondeterministic one cannot push) means the stats can prove
    // nothing — skip the whole stats pass instead of paying metadata
    // reads for scans that cannot prune.
    if (resolved.isEmpty) return (groups, Seq.empty)
    val fromManifest: Map[String, GroupStats.Stats] =
      groups.flatMap(g => fileStats.get(g)
        .flatMap(s => scala.util.Try(GroupStats.fromJson(s)).toOption)
        .map(g -> _)).toMap
    // pre-upgrade remainder: batched CONCURRENT sidecar reads (16-way
    // parallel, never one serial GET per group)
    val needSidecar = groups.filterNot(fromManifest.contains)
    val fromSidecars: Map[String, GroupStats.Stats] =
      if (needSidecar.isEmpty) Map.empty
      else {
        val f = fs(spark, tableDir)
        needSidecar.zip(GroupStats.readMany(
          f, needSidecar.map(g => GroupStats.sidecarPath(tableDir, g))))
          .collect { case (g, Some(st)) => g -> st }.toMap
      }
    val parts = groups
      .map(g => g -> fromManifest.get(g).orElse(fromSidecars.get(g)))
      .partition {
        case (_, Some(st)) => resolved.forall(e => GroupStats.mayMatch(st, e))
        case (_, None)     => true // no stats anywhere: cannot prune
      }
    (parts._1.map(_._1), parts._2.map(_._1))
  }

  /** Total rows across `groups`: manifest-recorded counts first (zero
    * I/O — `known` is the version's `fileRows` map), a one-time sidecar
    * fallback for pre-upgrade groups, one counting scan as the
    * pre-stats-table last resort. */
  private def groupRows(
      spark: SparkSession, tableDir: String, groups: Seq[String],
      schemaDdl: Option[String],
      mapping: Seq[(String, String)] = Seq.empty,
      known: Map[String, Long] = Map.empty): Long =
    if (groups.isEmpty) 0L
    else {
      val fromSidecars = sidecarRows(spark, tableDir,
        groups.filterNot(known.contains))
      val per = groups.map(g => known.get(g).orElse(fromSidecars.get(g)))
      if (per.forall(_.isDefined)) per.map(_.get).sum
      else scanGroups(spark, tableDir, groups, schemaDdl, mapping).count()
    }

  /** The file groups among `candidates` that ACTUALLY contain a row
    * matching `probe` — Delta's touched-file detection: one scan of the
    * (stats-pruned) candidates tagged with `input_file_name()`, distinct
    * on the group id, collected (bounded by the group count, never the
    * row count). Turns conservative range pruning into exact file-level
    * COW: a candidate whose bounds overlap but which holds no matching
    * row still carries over metadata-only. */
  private def touchedGroups(
      spark: SparkSession, tableDir: String, candidates: Seq[String],
      schemaDdl: Option[String],
      mapping: Seq[(String, String)] = Seq.empty,
      dvs: Seq[(String, String, Long)] = Seq.empty)(
      probe: DataFrame => DataFrame): Set[String] = {
    if (candidates.isEmpty) return Set.empty
    // Tag with the group id from the scan's own row identity (LAST
    // "/files/" segment — robust to a table path containing "/files/",
    // and, unlike input_file_name(), still populated under the DV
    // anti-join) and mask deletion vectors BEFORE probing: a DV'd row
    // must not mark its group as touched.
    val candSet = candidates.toSet
    val dvFor = dvs.filter(d => candSet(d._1))
    val tagged0 = scanGroupsTagged(spark, tableDir, candidates, schemaDdl, mapping)
    val live =
      if (dvFor.isEmpty) tagged0
      else tagged0.join(dvMaskRows(spark, tableDir, dvFor),
        Seq("__dv_rel", "__dv_pos"), "left_anti")
    val tagged = live
      .withColumn("__file", org.apache.spark.sql.functions
        .substring_index(col("__dv_rel"), "/", 1))
      .drop("__dv_rel", "__dv_pos")
    probe(tagged).select("__file").distinct().collect()
      .map(_.getString(0)).toSet
  }

  /** LIVE rows across a version's `groups`: manifest-recorded totals
    * minus the groups' deletion-vector counts — pure metadata. */
  private def liveGroupRows(
      spark: SparkSession, tableDir: String, groups: Seq[String],
      m: Manifest): Long = {
    val gs = groups.toSet
    groupRows(spark, tableDir, groups, m.schemaDdl, m.mapping, m.fileRows) -
      m.dvs.filter(d => gs(d._1)).map(_._3).sum
  }

  /** Copy-on-write `DELETE FROM ... WHERE preds` — Delta's delete
    * economics over bare parquet, in two phases:
    * 1. the stats sidecars prune to CANDIDATE groups at planning time
    *    (metadata-only, KB of driver-side JSON);
    * 2. one scan of the candidates finds the groups that actually hold
    *    a matching row ([[touchedGroups]]); only THOSE are rewritten
    *    (minus the matches), every other group carries into the new
    *    manifest METADATA-ONLY — deleting one day from a
    *    year-of-appends table rewrites one group, not 365.
    * A predicate that matches NOTHING is a pure no-op: the current
    * version number returns and no new version is committed.
    *
    * SQL DELETE null semantics: rows where the predicate evaluates NULL
    * are KEPT (survivors are `NOT coalesce(pred, false)`), exactly as
    * `DELETE FROM t WHERE p` behaves in Spark/Delta/ANSI. History is
    * intact — the parent version still reads the pre-delete rows — and
    * CDC consumers see a rewrite boundary ([[changes]] raises across it,
    * [[pollChanges]] resyncs), since a file-group difference cannot
    * represent removed rows. Returns the new (or unchanged) version. */
  /** DV-masked tagged scan of `cand` filtered to `applied`, tagged with
    * the owning group id (`__grp`), plus the per-group matched counts —
    * the shared probe behind the DV-capable mutations ([[delete]],
    * [[update]]). One scan serves both the touched-group set and the
    * fraction the DV decision needs. */
  private def probeMatches(
      spark: SparkSession, tableDir: String, cand: Seq[String],
      m: Manifest,
      claimedOf: DataFrame => DataFrame): (DataFrame, Map[String, Long]) = {
    val matchRows = claimedOf(liveTagged(spark, tableDir, cand, m))
      .withColumn("__grp", org.apache.spark.sql.functions
        .substring_index(col("__dv_rel"), "/", 1))
    val perGroup: Map[String, Long] = matchRows.groupBy("__grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (matchRows, perGroup)
  }

  /** The DV-masked, row-identity-tagged live scan of `groups` —
    * [[scanVersionGroups]] content with `__dv_rel`/`__dv_pos` kept, the
    * view claim transforms ([[deleteClaims]]/[[updateClaims]]) run on. */
  private def liveTagged(
      spark: SparkSession, tableDir: String,
      groups: Seq[String], m: Manifest): DataFrame = {
    val gs = groups.toSet
    val dvFor = m.dvs.filter(d => gs(d._1))
    val tagged0 = scanGroupsTagged(spark, tableDir, groups, m.schemaDdl, m.mapping)
    if (dvFor.isEmpty) tagged0
    else tagged0.join(dvMaskRows(spark, tableDir, dvFor),
      Seq("__dv_rel", "__dv_pos"), "left_anti")
  }

  /** Partition the matched groups into (dvGroups, rewriteGroups): a
    * group goes merge-on-read when its matched fraction of LIVE rows
    * is at or below `spark.graft.dv.maxDeleteFraction` (default 0.1;
    * 0 disables DVs). Group totals come from the manifest's recorded
    * counts (zero I/O), with a sidecar fallback only for groups a
    * pre-upgrade manifest never recorded; groups with no count at all
    * always rewrite.
    *
    * DV PRESSURE: repeated small mutations accrete positions without
    * bound (every scan pays the anti-join over them) — so a group
    * whose CUMULATIVE deleted fraction (prior vector + this mutation's
    * claims, over its total rows) would cross
    * `spark.graft.dv.maxCumulativeFraction` (default 0.5) is sent to
    * the REWRITE side instead, which materializes its vector away.
    * A group repeatedly 1%-deleted self-heals at the threshold rather
    * than carrying an ever-growing position list. */
  private def dvClassify(
      spark: SparkSession, tableDir: String,
      perGroup: Map[String, Long],
      dvByGroup: Map[String, (String, String, Long)],
      m: Manifest): (Seq[String], Seq[String]) = {
    val maxFrac = spark.conf.getOption("spark.graft.dv.maxDeleteFraction")
      .map(_.toDouble).getOrElse(0.1)
    // DVs disabled: everything rewrites — pay no sidecar I/O deciding it
    if (maxFrac <= 0.0) return (Seq.empty, perGroup.keys.toSeq.sorted)
    val cumFrac = spark.conf.getOption("spark.graft.dv.maxCumulativeFraction")
      .map(_.toDouble).getOrElse(0.5)
    val fromSidecars = sidecarRows(spark, tableDir,
      perGroup.keys.toSeq.filterNot(m.fileRows.contains))
    perGroup.keys.toSeq.sorted.partition { g =>
      maxFrac > 0.0 && {
        val total = m.fileRows.get(g).orElse(fromSidecars.get(g))
          .getOrElse(-1L)
        val prior = dvByGroup.get(g).map(_._3).getOrElse(0L)
        val live = total - prior
        live > 0 && perGroup(g).toDouble / live <= maxFrac &&
          (prior + perGroup(g)).toDouble / total <= cumFrac
      }
    }
  }

  /** Read DV artifact rows for `dvs`' groups as
    * (__dv_rel, __dv_pos, __kind) — `kind` null-filled for artifacts
    * written before claims were kind-tagged. */
  private def dvRowsKinded(
      spark: SparkSession, tableDir: String,
      dvs: Seq[(String, String, Long)]): DataFrame = {
    // mergeSchema: see the run-collapse read — a pre-kind artifact
    // must not win inference and hide `kind` from the kinded ones
    val raw0 = spark.read.option("mergeSchema", "true").parquet(
      dvs.map(_._2).distinct.map(a => s"$tableDir/files/$a"): _*)
    val raw =
      if (raw0.columns.contains("kind")) raw0
      else raw0.withColumn("kind", lit(null).cast("string"))
    raw.filter(org.apache.spark.sql.functions
        .substring_index(col("rel"), "/", 1).isin(dvs.map(_._1).distinct: _*))
      .select(col("rel").as("__dv_rel"), col("pos").as("__dv_pos"),
        col("kind").as("__kind"))
  }

  /** Write ONE position artifact for `dvGroups`: this mutation's
    * matched positions merged with the groups' prior DV rows (at most
    * one live DV entry per group, always complete). Each fresh row is
    * KIND-tagged (`kindCol`: 'delete' or 'update') so the change feed
    * can attribute a mixed merge's position growth per row. Returns
    * the new manifest entries; empty when no group takes the DV path.
    *
    * ARTIFACT-ACCRETION BOUND: when `absorb` is non-empty (the caller
    * found the new manifest would reference more than
    * `spark.graft.dv.maxArtifacts` distinct artifact directories),
    * those carried groups' vectors fold into THIS artifact too and
    * their remapped entries return alongside the fresh ones — N
    * sequential one-row deletes keep a bounded artifact count instead
    * of one directory per mutation (old directories age out via
    * vacuum's reference counting). */
  private def writeDvArtifact(
      spark: SparkSession, tableDir: String, matchRows: DataFrame,
      dvGroups: Seq[String],
      dvByGroup: Map[String, (String, String, Long)],
      perGroup: Map[String, Long],
      kindCol: Column = lit("delete"),
      absorb: Seq[(String, String, Long)] = Seq.empty): Seq[(String, String, Long)] = {
    if (dvGroups.isEmpty) return Seq.empty
    val fresh = matchRows.filter(col("__grp").isin(dvGroups: _*))
      .select(col("__dv_rel").as("rel"), col("__dv_pos").as("pos"),
        kindCol.cast("string").as("kind"))
    val prior = dvGroups.flatMap(dvByGroup.get) ++ absorb
    val merged =
      if (prior.isEmpty) fresh
      else fresh.unionByName(
        dvRowsKinded(spark, tableDir, prior)
          .select(col("__dv_rel").as("rel"), col("__dv_pos").as("pos"),
            col("__kind").as("kind")))
    val artifact = s"dv-${java.util.UUID.randomUUID()}"
    // Position artifacts are tiny relative to data (bounded by the
    // threshold fraction of the touched groups); write them as FEW
    // files — inheriting the scan's partitioning would emit one
    // near-empty part file per scan task (a 10k-group scatter
    // delete = 10k files of overhead for KBs of positions). ~4M
    // (rel, pos) rows per output file keeps big DVs under control.
    val parts = math.max(1L, (dvGroups.map(perGroup).sum +
      dvGroups.flatMap(dvByGroup.get).map(_._3).sum +
      absorb.map(_._3).sum) / 4000000L).toInt
    // partial-write cleanup: see writeGroup — an orphaned partial dv-*
    // directory is unreclaimable and poison to schema-pinned readers
    try merged.coalesce(parts).write.parquet(s"$tableDir/files/$artifact")
    catch { case scala.util.control.NonFatal(e) =>
      scala.util.Try(fs(spark, tableDir)
        .delete(new Path(s"$tableDir/files/$artifact"), true))
      throw e
    }
    dvGroups.map(g => (g, artifact,
      perGroup(g) + dvByGroup.get(g).map(_._3).getOrElse(0L))) ++
      absorb.map { case (g, _, nPos) => (g, artifact, nPos) }
  }

  /** The mutation's DV carry plan: `carried` = prior entries that
    * survive into the new manifest unchanged (groups neither rewritten
    * nor re-vectored this round); `absorb` = those same entries marked
    * for the FOLD — non-empty iff carrying them as-is would leave the
    * new manifest referencing more than `spark.graft.dv.maxArtifacts`
    * (default 8) distinct artifact directories. Callers pass `absorb`
    * to [[writeDvArtifact]] (which re-emits the absorbed entries under
    * the fresh artifact) and publish
    * `(if (absorb.isEmpty) carried else Nil) ++ dvAdditions` — the
    * absorbed groups MUST re-enter via dvAdditions or their deleted
    * rows would resurrect. */
  private def dvCarryPlan(
      spark: SparkSession, m: Manifest,
      untouched: Seq[String], dvGroups: Seq[String]):
      (Seq[(String, String, Long)], Seq[(String, String, Long)]) = {
    val unSet = untouched.toSet
    val dvSet = dvGroups.toSet
    val carried = m.dvs.filter(d => unSet(d._1) && !dvSet(d._1))
    val maxArtifacts = spark.conf.getOption("spark.graft.dv.maxArtifacts")
      .map(_.toInt).getOrElse(8)
    val absorb =
      if (dvGroups.isEmpty) Seq.empty
      else if (carried.map(_._2).distinct.size + 1 > maxArtifacts) carried
      else Seq.empty[(String, String, Long)]
    (carried, absorb)
  }

  def delete(spark: SparkSession, tableDir: String)(preds: Column*): Long = {
    require(preds.nonEmpty, "delete needs at least one predicate")
    val cond = preds.reduce(_ && _)
    val applied = coalesce(cond, lit(false))
    deleteClaims(spark, tableDir, Some(cond),
      claimedOf = _.filter(applied), keptOf = _.filter(!applied))
  }

  /** [[delete]]'s engine with the CLAIM generalized to a transform
    * pair: `claimedOf` selects the rows to remove from a (DV-masked,
    * `__dv_rel`/`__dv_pos`-tagged) live scan, `keptOf` its exact
    * complement. A predicate delete passes filters; a claim that is a
    * JOIN (the over-limit multi-column NOT IN fallback) passes
    * anti/semi joins — the DV-vs-rewrite economics are identical
    * either way. `prune` (when derivable from the claim) narrows the
    * candidate groups through the stats sidecars; `None` scans all. */
  private[graft] def deleteClaims(
      spark: SparkSession, tableDir: String, prune: Option[Column],
      claimedOf: DataFrame => DataFrame,
      keptOf: DataFrame => DataFrame): Long = {
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val m = parseManifest(spark, tableDir, v)
    require(m.files.nonEmpty, s"version $v of $tableDir lists no files")
    val cand = prune match {
      case Some(c) =>
        pruneGroups(spark, tableDir, m.files, m.schemaDdl, c, m.mapping, m.fileStats)._1
      case None => m.files
    }
    if (cand.isEmpty) return v
    // One pass over the (DV-masked) candidates yields the touched
    // groups AND each group's matched-row count — the DV decision
    // needs the fraction, so fold it into the probe instead of a
    // second scan.
    val (matchRows, perGroup) =
      probeMatches(spark, tableDir, cand, m, claimedOf)
    if (perGroup.isEmpty) return v // nothing to delete anywhere
    val dvByGroup = m.dvs.map(d => d._1 -> d).toMap
    // DELETION-VECTOR path (merge-on-read): a touched group whose
    // matched fraction of LIVE rows is at or below the threshold gets
    // its deleted positions recorded in a bitmap-sidecar artifact
    // instead of a rewrite — a GDPR-style 1-row-in-each-of-10k-groups
    // delete writes KBs of positions, not 10k groups' bytes. Scans
    // apply the DV; [[compact]]/[[cluster]] materialize it away.
    val (dvGroups, rewriteGroups) =
      dvClassify(spark, tableDir, perGroup, dvByGroup, m)
    val f = fs(spark, tableDir)
    val hit = rewriteGroups.toSet
    val (touched, untouched) = m.files.partition(hit)
    // entries that would carry over unchanged — folded into the fresh
    // artifact instead when that keeps the artifact count bounded
    val (dvCarried, dvAbsorb) = dvCarryPlan(spark, m, untouched, dvGroups)
    val dvAdditions =
      writeDvArtifact(spark, tableDir, matchRows, dvGroups, dvByGroup,
        perGroup, absorb = dvAbsorb)
    // EVERY unpublished artifact/group this mutation wrote must be
    // reclaimed on ANY failure past this point, not only on a lost
    // publish race: vacuum reclaims only manifest-referenced dirs, so
    // an orphan is permanent — and an orphaned dv-* artifact is worse
    // than dead bytes (a schema-pinned file stream could ingest it as
    // all-NULL table rows). Double deletes (enforceConstraints and
    // publishExpecting clean their own group on their own failures)
    // are harmless no-ops.
    val cleanupOnFailure =
      scala.collection.mutable.ArrayBuffer[String](dvAdditions.map(_._2).distinct: _*)
    try {
      // Rewrite path for the heavily-hit groups (classic COW).
      val (rewriteGroup, kept) =
        if (touched.isEmpty) (None, 0L)
        else {
          val survivors = keptOf(liveTagged(spark, tableDir, touched, m))
            .drop("__dv_rel", "__dv_pos")
          val (group, n) = writeGroup(survivors, tableDir, m.mapping)
          cleanupOnFailure += group
          enforceConstraints(spark, tableDir, group, m.schemaDdl, m.constraints, m.mapping)
          if (n == 0L && (untouched.nonEmpty || dvAdditions.nonEmpty)) {
            // every touched row deleted: drop the empty rewrite group
            f.delete(new Path(s"$tableDir/files/$group"), true)
            (None, 0L)
          } else (Some(group), n)
        }
      val groups = untouched ++ rewriteGroup.toSeq
      // DV entries: prior entries for groups still present and not
      // re-DV'd (nor absorbed) this round, plus this round's additions.
      val dvs = (if (dvAbsorb.isEmpty) dvCarried else Seq.empty) ++ dvAdditions
      val untouchedLive = liveGroupRows(spark, tableDir, untouched, m)
      val deletedInDv = dvGroups.map(perGroup).sum
      publishExpecting(spark, tableDir, v, groups,
        rewriteGroup.toSeq, untouchedLive - deletedInDv + kept, "delete",
        m.schemaDdl, mapping = m.mapping, dvs = dvs,
        rowsByGroup = m.fileRows ++ rewriteGroup.map(_ -> kept))
    } catch {
      case scala.util.control.NonFatal(e) =>
        cleanupOnFailure.foreach(g => scala.util.Try(
          f.delete(new Path(s"$tableDir/files/$g"), true)))
        throw e
    }
  }

  /** Copy-on-write `UPDATE ... SET assignments WHERE cond` — the third
    * leg of the DML triad ([[delete]], [[merge]]), same two-phase
    * economics: stats sidecars prune to candidates, exact touched-file
    * detection ([[touchedGroups]]) picks the groups that actually hold
    * a matching row, only those rewrite (each assignment applies under
    * `coalesce(cond, false)` — NULL-predicate rows are NOT updated,
    * ANSI semantics), everything else carries metadata-only. The
    * rewrite may not reshape the table: an assignment that would change
    * a column's type raises before any write. A no-match update returns
    * the current version unchanged. CDC: rewrite boundary, like the
    * other mutations.
    *
    * MERGE-ON-READ updates: a touched group whose matched fraction of
    * live rows is at or below `spark.graft.dv.maxDeleteFraction` is
    * NOT rewritten — the updated copies of its matched rows land in
    * one new file group and the ORIGINAL positions join the group's
    * deletion vector (Delta's DV-update shape). A scattered update
    * (one row in each of 10k groups) writes the changed rows plus KBs
    * of positions instead of 10k groups' bytes; [[changesFeed]] reads
    * such a version as update_preimage/update_postimage rows. */
  def update(
      spark: SparkSession, tableDir: String, cond: Column,
      assignments: (String, Column)*): Long = {
    val applied = cond.isNotNull && cond // NULL predicate → row untouched
    updateClaims(spark, tableDir, Some(cond),
      claimedOf = _.filter(applied), keptOf = _.filter(!applied),
      assignments: _*)
  }

  /** [[update]]'s engine with the CLAIM generalized to a transform
    * pair over the tagged live scan — see [[deleteClaims]]. Claimed
    * rows take every assignment; kept rows carry unchanged. */
  private[graft] def updateClaims(
      spark: SparkSession, tableDir: String, prune: Option[Column],
      claimedOf: DataFrame => DataFrame, keptOf: DataFrame => DataFrame,
      assignments: (String, Column)*): Long = {
    require(assignments.nonEmpty, "update needs at least one assignment")
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val m = parseManifest(spark, tableDir, v)
    require(m.files.nonEmpty, s"version $v of $tableDir lists no files")
    val cand = prune match {
      case Some(c) =>
        pruneGroups(spark, tableDir, m.files, m.schemaDdl, c, m.mapping, m.fileStats)._1
      case None => m.files
    }
    if (cand.isEmpty) return v
    val (matchRows, perGroup) =
      probeMatches(spark, tableDir, cand, m, claimedOf)
    if (perGroup.isEmpty) return v
    val resolver = org.apache.spark.sql.catalyst.analysis.caseInsensitiveResolution
    val tableCols = matchRows.columns.filterNot(reservedCols)
    assignments.foreach { case (c, _) =>
      require(tableCols.exists(resolver(_, c)),
        s"update assignment targets unknown column '$c' " +
          s"(table has ${tableCols.mkString(", ")})")
    }
    val dvByGroup = m.dvs.map(d => d._1 -> d).toMap
    val (dvGroups, rewriteGroups) =
      dvClassify(spark, tableDir, perGroup, dvByGroup, m)
    val hit = rewriteGroups.toSet
    val (touched, untouched) = m.files.partition(hit)
    def applyAssignments(df: DataFrame, under: Column): DataFrame = {
      val out = assignments.foldLeft(df) { case (d, (c, expr)) =>
        d.withColumn(c, org.apache.spark.sql.functions.when(under, expr)
          .otherwise(col(c)))
      }
      df.schema.fields.zip(out.schema.fields).foreach { case (a, b) =>
        require(a.dataType == b.dataType,
          s"update may not change column types: ${a.name} " +
            s"${a.dataType.simpleString} -> ${b.dataType.simpleString} " +
            "(cast the assignment expression to the column's type)")
      }
      out
    }
    val f = fs(spark, tableDir)
    // DV path: updated COPIES of the matched rows → one new group;
    // their original positions → the groups' deletion vectors.
    val (dvCarried, dvAbsorb) = dvCarryPlan(spark, m, untouched, dvGroups)
    val dvAdditions =
      writeDvArtifact(spark, tableDir, matchRows, dvGroups, dvByGroup,
        perGroup, kindCol = lit("update"), absorb = dvAbsorb)
    // Same orphan discipline as [[delete]]: any failure past the
    // artifact write (a constraint-violating assignment is the common
    // one) must reclaim the artifact and every group written so far —
    // vacuum cannot, and a stray dv-* artifact is poison to
    // schema-pinned file streams. Double deletes are no-ops.
    val cleanupOnFailure =
      scala.collection.mutable.ArrayBuffer[String](dvAdditions.map(_._2).distinct: _*)
    try {
      val (copiesGroup, nCopies) =
        if (dvGroups.isEmpty) (None, 0L)
        else {
          val copies = applyAssignments(
            matchRows.filter(col("__grp").isin(dvGroups: _*))
              .drop("__dv_rel", "__dv_pos", "__grp"), lit(true))
          val (g, n) = writeGroup(copies, tableDir, m.mapping)
          cleanupOnFailure += g
          enforceConstraints(spark, tableDir, g, m.schemaDdl, m.constraints, m.mapping)
          (Some(g), n)
        }
      // Rewrite path for the heavily-hit groups (classic COW).
      val (rewriteGroup, nRewrite) =
        if (touched.isEmpty) (None, 0L)
        else {
          val scan = liveTagged(spark, tableDir, touched, m)
          val content = applyAssignments(
            claimedOf(scan).drop("__dv_rel", "__dv_pos"), lit(true))
            .unionByName(keptOf(scan).drop("__dv_rel", "__dv_pos"))
          val (g, n) = writeGroup(content, tableDir, m.mapping)
          cleanupOnFailure += g
          enforceConstraints(spark, tableDir, g, m.schemaDdl, m.constraints, m.mapping)
          (Some(g), n)
        }
      val groups = untouched ++ rewriteGroup.toSeq ++ copiesGroup.toSeq
      val dvs = (if (dvAbsorb.isEmpty) dvCarried else Seq.empty) ++ dvAdditions
      val untouchedLive = liveGroupRows(spark, tableDir, untouched, m)
      // total live rows are unchanged by an update: the DV'd positions
      // are exactly offset by their updated copies
      val nRows = untouchedLive - dvGroups.map(perGroup).sum + nCopies + nRewrite
      publishExpecting(spark, tableDir, v, groups,
        rewriteGroup.toSeq ++ copiesGroup.toSeq, nRows, "update",
        m.schemaDdl, mapping = m.mapping, dvs = dvs,
        rowsByGroup = m.fileRows ++ rewriteGroup.map(_ -> nRewrite) ++
          copiesGroup.map(_ -> nCopies),
        copies = copiesGroup.toSeq)
    } catch {
      case scala.util.control.NonFatal(e) =>
        cleanupOnFailure.foreach(g => scala.util.Try(
          f.delete(new Path(s"$tableDir/files/$g"), true)))
        throw e
    }
  }

  /** Copy-on-write MERGE (upsert-by-replacement) into a versioned table:
    * target rows whose `keyCols` match a source row are REPLACED by that
    * source row, unmatched target rows are kept, unmatched source rows
    * are inserted — `MERGE WHEN MATCHED THEN UPDATE SET * WHEN NOT
    * MATCHED THEN INSERT *`.
    *
    * Delta's two-phase shape: the source's per-key min/max (ONE
    * aggregate, collected as 2·|keys| scalars) builds a range predicate
    * that prunes to CANDIDATE groups from the stats sidecars
    * (metadata-only); then one semi-join of the candidates against the
    * source keys finds the groups that actually hold a match
    * ([[touchedGroups]]) — so a source whose keys are scattered (two
    * extreme ids, or fresh insert keys beyond every bound) still
    * rewrites only the files with real matches. Soundness: a matched
    * row needs equality on EVERY key, so a group outside the source's
    * range on any key provably holds no match — a daily upsert against
    * a time-keyed 100 TB table rewrites the recent groups only.
    *
    * Contracts: the source schema must match the table's ([[append]]'s
    * no-evolution validation), and source keys must be UNIQUE — two
    * source rows matching one target row is ambiguous, and raises here
    * exactly as Delta's MERGE does. CDC consumers see a rewrite boundary
    * (same as [[delete]]). Returns the new (or unchanged) version. */
  def merge(
      spark: SparkSession,
      tableDir: String,
      source: DataFrame,
      keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val m = parseManifest(spark, tableDir, v)
    require(m.files.nonEmpty, s"version $v of $tableDir lists no files")
    val schemaDdl = validateAppendSchema(source, m.schemaDdl, evolve = false)
    // The source feeds three consumers (bounds, duplicate gate,
    // anti-join + union); pin it once so its plan runs once.
    val src = source.capLineage()
    if (src.isEmpty) return v
    val dup = src.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).limit(1).count()
    require(dup == 0L,
      s"merge source has duplicate keys on (${keyCols.mkString(", ")}); " +
        "matched-row replacement would be ambiguous (Delta MERGE raises too)")
    val bounds = src.agg(
      keyCols.flatMap(k => Seq(min(col(k)).as(s"__lo_$k"), max(col(k)).as(s"__hi_$k")))
        .head,
      keyCols.flatMap(k => Seq(min(col(k)).as(s"__lo_$k"), max(col(k)).as(s"__hi_$k")))
        .tail: _*).collect()(0)
    val rangePred = keyCols.zipWithIndex.map { case (k, i) =>
      col(k) >= lit(bounds.get(2 * i)) && col(k) <= lit(bounds.get(2 * i + 1))
    }.reduce(_ && _)
    val (cand, _) = pruneGroups(spark, tableDir, m.files, m.schemaDdl, rangePred, m.mapping, m.fileStats)
    val srcKeys = src.select(keyCols.map(col): _*)
    val hit = touchedGroups(spark, tableDir, cand, m.schemaDdl, m.mapping, m.dvs)(
      _.join(srcKeys, keyCols, "left_semi"))
    val (touched, untouched) = m.files.partition(hit)
    // Align the source to the table's column order (names already
    // validated; resolution is case-insensitive).
    val tableCols = scanGroups(spark, tableDir, m.files, m.schemaDdl, m.mapping).columns
    val srcAligned = src.select(tableCols.map(col): _*)
    val newData =
      if (touched.isEmpty) srcAligned
      else scanVersionGroups(spark, tableDir, touched, m.schemaDdl, m.mapping, m.dvs)
        .join(srcKeys, keyCols, "left_anti")
        .unionByName(srcAligned)
    val (group, n) = writeGroup(newData, tableDir, m.mapping)
    enforceConstraints(spark, tableDir, group, schemaDdl, m.constraints, m.mapping)
    val untouchedRows = liveGroupRows(spark, tableDir, untouched, m)
    publishExpecting(spark, tableDir, v, untouched :+ group, Seq(group),
      untouchedRows + n, "merge", schemaDdl, mapping = m.mapping,
      dvs = { val unSet = untouched.toSet
        m.dvs.filter(d => unSet(d._1)) },
      rowsByGroup = m.fileRows + (group -> n))
  }

  /** One clause of a general [[mergeClauses]] MERGE. Conditions and
    * assignment VALUES reference the target row as `TGT.col` and the
    * source row as `SRC.col` (the same fixed aliases the YAML merge
    * surface uses — [[Merge]]); assignment KEYS are plain target column
    * names. `condition = None` means "always". NOT-MATCHED-BY-SOURCE
    * conditions may reference only `TGT` (no source row exists). */
  sealed trait MergeClause
  object MergeClause {
    final case class MatchedUpdate(
        assignments: Seq[(String, Column)],
        condition: Option[Column] = None) extends MergeClause
    final case class MatchedDelete(
        condition: Option[Column] = None) extends MergeClause
    /** INSERT: with empty `assignments` this is INSERT * — the whole
      * source row (source schema must match the table's, as in
      * [[merge]]). With assignments it is Delta's partial-column
      * INSERT (c1, c2) VALUES (e1, e2): listed columns take their
      * expression (SRC-qualified references allowed), UNLISTED columns
      * are NULL — the reference's own upsert semantic
      * (`source/pyzzle/datasource/delta.py:146-147`). */
    final case class NotMatchedInsert(
        condition: Option[Column] = None,
        assignments: Seq[(String, Column)] = Seq.empty) extends MergeClause
    final case class NotMatchedBySourceUpdate(
        assignments: Seq[(String, Column)],
        condition: Option[Column] = None) extends MergeClause
    final case class NotMatchedBySourceDelete(
        condition: Option[Column] = None) extends MergeClause
  }

  /** GENERAL copy-on-write MERGE — the full Delta clause surface over
    * the same two-phase economics as [[merge]]:
    *
    *   WHEN MATCHED [AND c] THEN UPDATE SET a = e, ... | DELETE
    *   WHEN NOT MATCHED [AND c] THEN INSERT *
    *   WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE ... | DELETE
    *
    * Clauses are FIRST-APPLICABLE within their category, in the order
    * given (Delta's semantics); a row no clause claims is carried
    * unchanged. Matching is key equality on `keyCols` (the ON clause);
    * NULL keys never match.
    *
    * Scale shape: matched/insert work prunes exactly like [[merge]]
    * (source key range → candidate groups → exact touched-group
    * semi-join). NOT-MATCHED-BY-SOURCE clauses act on rows ABSENT from
    * the source, which any group may hold — those clauses widen the
    * rewrite to the groups whose stats admit a row satisfying their
    * conditions (an unconditional by-source clause rewrites every
    * group, exactly the cost Delta pays for it). Untouched groups
    * carry metadata-only either way.
    *
    * MERGE-ON-READ matched actions (Delta's DV-backed MERGE): a group
    * hit only by MATCHED clauses whose claimed fraction of live rows
    * is at or below `spark.graft.dv.maxDeleteFraction` is NOT
    * rewritten — delete claims join its deletion vector, update claims
    * write updated copies into one new group ([[update]]'s shape); a
    * scattered-key SQL MERGE writes positions + changed rows instead
    * of every touched group. When the merge's entire effect is a pure
    * DV delete or a pure DV update it commits under that EFFECT mode
    * ('delete'/'update'); mixed DV merges commit as 'merge' with
    * KIND-TAGGED position rows and a `copies` manifest annotation, so
    * [[changesFeed]] serves every DV merge row-level — deletes,
    * update pre/post images, and inserts, correctly attributed.
    *
    * `onResidual` is the NON-KEY remainder of a general ON clause
    * (`MERGE ... ON t.k = s.k AND <residual>`), a row-local condition
    * over `TGT.*`/`SRC.*`: matched-ness becomes key equality AND the
    * residual (ANSI MERGE — a key-equal pair failing the residual is
    * NOT matched: the source row inserts, the target row is claimable
    * by NOT-MATCHED-BY-SOURCE clauses). NULL residual = not matched.
    * Candidate pruning still runs on the key range (sound: the residual
    * only shrinks the matched set); the touched-group probe and the
    * insert anti-join evaluate the FULL condition.
    *
    * Contracts: duplicate source keys raise when a MATCHED clause
    * exists (ambiguous, as Delta raises) — and always when a residual
    * is given (two same-key source rows with different residual truth
    * cannot be disambiguated per target row here; refusal is loud,
    * never a wrong merge); with INSERT clauses the
    * source schema must match the table's; update assignments are cast
    * to the column's type and may not reshape the table. Returns the
    * new (or unchanged) version. */
  def mergeClauses(
      spark: SparkSession,
      tableDir: String,
      source: DataFrame,
      keyCols: Seq[String],
      clauses: Seq[MergeClause],
      onResidual: Option[Column] = None): Long = {
    import MergeClause._
    require(keyCols.nonEmpty, "merge needs at least one key column")
    require(clauses.nonEmpty, "merge needs at least one clause")
    val matched = clauses.collect {
      case c: MatchedUpdate => c: MergeClause
      case c: MatchedDelete => c: MergeClause
    }
    val inserts = clauses.collect { case c: NotMatchedInsert => c }
    val bySource = clauses.collect {
      case c: NotMatchedBySourceUpdate => c: MergeClause
      case c: NotMatchedBySourceDelete => c: MergeClause
    }
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val m = parseManifest(spark, tableDir, v)
    require(m.files.nonEmpty, s"version $v of $tableDir lists no files")
    // Only STAR inserts need the source to mirror the table; a partial
    // INSERT (cols) VALUES (...) source may have any shape (unlisted
    // table columns become NULL).
    val schemaDdl =
      if (inserts.exists(_.assignments.isEmpty))
        validateAppendSchema(source, m.schemaDdl, evolve = false)
      else m.schemaDdl
    val resolver = org.apache.spark.sql.catalyst.analysis.caseInsensitiveResolution
    keyCols.foreach(k => require(source.columns.exists(resolver(_, k)),
      s"merge key '$k' missing from the source " +
        s"(has ${source.columns.mkString(", ")})"))
    val src = source.capLineage()
    // ONE aggregate pass over the source decides emptiness, the
    // duplicate-key guard, AND the candidate key range — previously
    // three source-scan jobs (isEmpty, a groupBy-count dup probe, the
    // min/max bounds). count(DISTINCT struct(keys)) uses groupBy's
    // NULL-equals-NULL key equality, so the guard's semantics are
    // byte-identical to the old per-key groupBy count (a source with
    // duplicate all-NULL key tuples still raises).
    val needDup = matched.nonEmpty || onResidual.isDefined
    val needBounds = matched.nonEmpty || inserts.nonEmpty
    val aggCols: Seq[Column] =
      Seq(org.apache.spark.sql.functions.count(lit(1)).as("__n")) ++
        (if (needDup)
          Seq(org.apache.spark.sql.functions.count_distinct(
            org.apache.spark.sql.functions.struct(keyCols.map(col): _*))
            .as("__nd"))
         else Nil) ++
        (if (needBounds)
          keyCols.flatMap(k =>
            Seq(min(col(k)).as(s"__lo_$k"), max(col(k)).as(s"__hi_$k")))
         else Nil)
    val srcStats = src.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val srcEmpty = srcStats.getLong(0) == 0L
    if (srcEmpty && bySource.isEmpty) return v
    if (needDup && !srcEmpty)
      require(srcStats.getLong(0) == srcStats.getLong(srcStats.fieldIndex("__nd")),
        s"merge source has duplicate keys on (${keyCols.mkString(", ")}); " +
          "a multiply-matched target row is ambiguous (Delta MERGE raises too)")

    // Candidate groups for MATCH-driven work: the source's key range.
    val cand: Seq[String] =
      if (srcEmpty || !needBounds) Seq.empty
      else {
        val rangePred = keyCols.map { k =>
          col(k) >= lit(srcStats.get(srcStats.fieldIndex(s"__lo_$k"))) &&
            col(k) <= lit(srcStats.get(srcStats.fieldIndex(s"__hi_$k")))
        }.reduce(_ && _)
        pruneGroups(spark, tableDir, m.files, m.schemaDdl, rangePred, m.mapping, m.fileStats)._1
      }
    val srcKeys = src.select(keyCols.map(col): _*)
    val keyJoinCond = keyCols.map(k =>
      col(s"TGT.$k") === col(s"SRC.$k")).reduce(_ && _)
    // matched-ness = key equality AND the ON residual (when given)
    val matchCond = onResidual.foldLeft(keyJoinCond)(_ && _)
    val hitMatch: Set[String] =
      if (matched.isEmpty || srcEmpty) Set.empty
      else if (onResidual.isEmpty)
        touchedGroups(spark, tableDir, cand, m.schemaDdl, m.mapping, m.dvs)(
          _.join(srcKeys, keyCols, "left_semi"))
      else
        // the residual narrows the probe too: a group whose key-equal
        // pairs all fail the residual holds no matched row
        touchedGroups(spark, tableDir, cand, m.schemaDdl, m.mapping, m.dvs)(
          _.alias("TGT").join(src.alias("SRC"), matchCond, "left_semi"))
    // By-source clauses touch groups that may HOLD a claimable row:
    // prune by the (approximate) union of their conditions, then the
    // exact contains-a-row probe. Matched-ness cannot be decided per
    // group, so a group whose qualifying rows all turn out matched
    // rewrites to identical content — sound, never wrong.
    val hitBySource: Set[String] =
      if (bySource.isEmpty) Set.empty
      else {
        // the conditions speak TGT.*; the prune/probe run on the bare scan
        val bsCond = org.apache.spark.sql.graftshim.GraftSqlBridge
          .stripTgtQualifier(bySource.map {
            case NotMatchedBySourceUpdate(_, c) => c.getOrElse(lit(true))
            case NotMatchedBySourceDelete(c) => c.getOrElse(lit(true))
            case _ => lit(true)
          }.reduce(_ || _))
        val (bsCand, _) =
          pruneGroups(spark, tableDir, m.files, m.schemaDdl, bsCond, m.mapping, m.fileStats)
        touchedGroups(spark, tableDir, bsCand, m.schemaDdl, m.mapping, m.dvs)(
          _.filter(bsCond))
      }
    val hit = hitMatch ++ hitBySource

    val tableSchema = scanGroups(spark, tableDir, m.files, m.schemaDdl, m.mapping)
      .schema
    val tableCols = tableSchema.fieldNames.toSeq
    clauses.foreach {
      case MatchedUpdate(as, _) => as.foreach { case (c, _) =>
        require(tableCols.exists(resolver(_, c)),
          s"merge assignment targets unknown column '$c'") }
      case NotMatchedBySourceUpdate(as, _) => as.foreach { case (c, _) =>
        require(tableCols.exists(resolver(_, c)),
          s"merge assignment targets unknown column '$c'") }
      case NotMatchedInsert(_, as) => as.foreach { case (c, _) =>
        require(tableCols.exists(resolver(_, c)),
          s"merge INSERT targets unknown column '$c'") }
      case _ => ()
    }

    // Shared clause machinery — the aliased source, the
    // first-applicable action id, and the per-column projection — used
    // by BOTH the merge-on-read path (claimed copies) and the rewrite.
    //
    // With no MATCHED clause AND no residual the join exists only to
    // FLAG matched-ness (by-source branches test !isM; no branch
    // reads SRC columns), so join the DISTINCT key set: a dup-keyed
    // source is legal for by-source-only programs (the dup check
    // above deliberately does not run) and the full source would
    // multiply matched target rows — every copy action-0-carried =
    // silent duplication. A residual may read any SRC column, so it
    // joins the full (dup-checked) source; the residual lives in the
    // JOIN condition, so a key-equal pair failing it yields SRC
    // nulls = not matched, exactly the ANSI reading.
    val s =
      (if (matched.nonEmpty || onResidual.isDefined) src
       else srcKeys.distinct())
        .withColumn("__src_match", lit(1)).alias("SRC")
    val isM = col("SRC.__src_match").isNotNull
    // ids: matched clauses 1..n, by-source clauses 101..: first
    // matching branch of the when-chain wins = clause order.
    val branches: Seq[(Column, Int, MergeClause)] =
      matched.zipWithIndex.map { case (c, i) =>
        val cond = c match {
          case MatchedUpdate(_, cc) => cc.getOrElse(lit(true))
          case MatchedDelete(cc) => cc.getOrElse(lit(true))
          case _ => lit(true)
        }
        (isM && cond, i + 1, c)
      } ++ bySource.zipWithIndex.map { case (c, j) =>
        val cond = c match {
          case NotMatchedBySourceUpdate(_, cc) => cc.getOrElse(lit(true))
          case NotMatchedBySourceDelete(cc) => cc.getOrElse(lit(true))
          case _ => lit(true)
        }
        (!isM && cond, 101 + j, c)
      }
    val action = branches.foldLeft(org.apache.spark.sql.functions
      .when(lit(false), 0)) { case (acc, (cond, id, _)) =>
        acc.when(cond, lit(id))
      }.otherwise(lit(0))
    val dropIds = branches.collect {
      case (_, id, _: MatchedDelete) => id
      case (_, id, _: NotMatchedBySourceDelete) => id
    }
    val out = tableSchema.fields.toSeq.map { f =>
      val updates = branches.collect {
        case (_, id, MatchedUpdate(as, _))
            if as.exists(a => resolver(a._1, f.name)) =>
          (id, as.find(a => resolver(a._1, f.name)).get._2)
        case (_, id, NotMatchedBySourceUpdate(as, _))
            if as.exists(a => resolver(a._1, f.name)) =>
          (id, as.find(a => resolver(a._1, f.name)).get._2)
      }
      updates.foldLeft(org.apache.spark.sql.functions
        .when(lit(false), col(s"TGT.${f.name}"))) { case (acc, (id, value)) =>
          acc.when(col("__action") === id, value.cast(f.dataType))
        }.otherwise(col(s"TGT.${f.name}")).as(f.name)
    }

    // MERGE-ON-READ for MATCHED actions (Delta's DV-backed MERGE): a
    // touched group hit ONLY by matched clauses (a by-source clause may
    // claim rows in its groups that the per-group probe cannot rule
    // matched, so those always rewrite) whose CLAIMED fraction of live
    // rows is at or below the DV threshold is NOT rewritten — DELETE
    // claims join the group's deletion vector; UPDATE claims write
    // their updated copies into one new group and their original
    // positions join the vector (Versioned.update's shape). A
    // scattered-key SQL MERGE thus writes positions + changed rows, not
    // every touched group's bytes. Groups whose matched rows are all
    // UNCLAIMED (every clause condition false) carry over untouched.
    val maxFracOn = spark.conf.getOption("spark.graft.dv.maxDeleteFraction")
      .map(_.toDouble).getOrElse(0.1) > 0.0
    val dvEligible: Seq[String] =
      if (!maxFracOn || matched.isEmpty || srcEmpty)
        Seq.empty
      else (hitMatch -- hitBySource).toSeq.sorted
    val matchedIds: Seq[Int] = (1 to matched.size)
    val matchedDeleteIds = branches.collect {
      case (_, id, _: MatchedDelete) if id <= matched.size => id }
    val matchedUpdateIds = branches.collect {
      case (_, id, _: MatchedUpdate) if id <= matched.size => id }
    val dvByGroup = m.dvs.map(d => d._1 -> d).toMap

    // DV-masked tagged scan of `groups` joined with the source, action
    // id attached — the per-row claim view the DV path works from.
    def joinedTagged(groups: Seq[String]): DataFrame =
      liveTagged(spark, tableDir, groups, m)
        .withColumn("__grp", org.apache.spark.sql.functions
          .substring_index(col("__dv_rel"), "/", 1))
        .alias("TGT")
        .join(s, matchCond, "left")
        .withColumn("__action", action)

    // classification: per-group claimed counts (+ delete-claim counts,
    // for the CDF-compatible mode label) — ONE aggregate, nothing
    // materialized
    val (dvGroups, claimsAll, dvDeleteClaims) =
      if (dvEligible.isEmpty)
        (Seq.empty[String], Map.empty[String, Long], 0L)
      else {
        val agg = joinedTagged(dvEligible)
          .filter(col("__action").isin(matchedIds: _*))
          .groupBy("__grp")
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("__n"),
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.when(
                if (matchedDeleteIds.isEmpty) lit(false)
                else col("__action").isin(matchedDeleteIds: _*), 1L)
                .otherwise(0L)).as("__d"))
          .collect()
        val claims = agg.map(r => r.getString(0) -> r.getLong(1)).toMap
        val dels = agg.map(r => r.getString(0) -> r.getLong(2)).toMap
        val (dv, _) = dvClassify(spark, tableDir, claims, dvByGroup, m)
        (dv, claims, dv.map(g => dels.getOrElse(g, 0L)).sum)
      }
    val dvGroupSet = dvGroups.toSet
    val dvClaims = claimsAll.filter { case (g, _) => dvGroupSet(g) }
    // matched-eligible groups whose matched rows are all unclaimed:
    // nothing to do — carry over metadata-only instead of rewriting to
    // identical content
    val noopGroups: Set[String] = dvEligible.filterNot(claimsAll.contains).toSet
    val rewriteHit = hit -- dvGroupSet -- noopGroups
    val (touchedRw, untouchedFiles) = m.files.partition(rewriteHit)

    // Rewrite of the heavily-hit / by-source groups: one left join
    // against the source, a first-applicable action id per row, drops
    // filtered, updates applied column-wise (cast to the column's type
    // — the rewrite may not reshape the table).
    val rewritten: Option[DataFrame] =
      if (touchedRw.isEmpty) None
      else {
        val t = scanVersionGroups(
          spark, tableDir, touchedRw, m.schemaDdl, m.mapping, m.dvs)
          .alias("TGT")
        val withAction = t.join(s, matchCond, "left")
          .withColumn("__action", action)
        val kept =
          if (dropIds.isEmpty) withAction
          else withAction.filter(!col("__action").isin(dropIds: _*))
        Some(kept.select(out: _*))
      }

    // Inserts: source rows matching NOTHING in the candidate groups
    // (matches are provably confined there). FIRST-APPLICABLE clause
    // selection decides the inserted values: star clauses take the
    // whole source row, partial clauses take their assignment
    // expressions with unlisted table columns NULL (Delta's partial
    // INSERT — the reference's own upsert semantic).
    val inserted: Option[DataFrame] =
      if (inserts.isEmpty || srcEmpty) None
      else {
        val insAction = inserts.zipWithIndex.foldLeft(
          org.apache.spark.sql.functions.when(lit(false), 0)) {
            case (acc, (c, i)) =>
              acc.when(c.condition.getOrElse(lit(true)), lit(i + 1))
          }.otherwise(lit(0))
        // NOT MATCHED = no target row satisfies keys AND residual: with
        // a residual the anti-join must evaluate the full condition
        // against candidate target ROWS (a key-equal pair failing the
        // residual still inserts — the classic ANSI MERGE trap); the
        // keys-only anti-join stays for the residual-free path (cheaper:
        // the right side is just the key columns).
        // DV-aware: a deletion-vector'd target row no longer exists,
        // so its key must NOT block the matching source row's insert.
        val notMatchedSrc: DataFrame = onResidual match {
          case None =>
            val candKeys =
              if (cand.isEmpty) srcKeys.limit(0)
              else scanVersionGroups(spark, tableDir, cand, m.schemaDdl,
                m.mapping, m.dvs).select(keyCols.map(col): _*)
            src.alias("SRC").join(candKeys, keyCols, "left_anti")
          case Some(_) if cand.isEmpty => src.alias("SRC")
          case Some(_) =>
            src.alias("SRC").join(
              scanVersionGroups(spark, tableDir, cand, m.schemaDdl,
                m.mapping, m.dvs).alias("TGT"),
              matchCond, "left_anti")
        }
        val claimed = notMatchedSrc
          .withColumn("__ins", insAction)
          .filter(col("__ins") =!= 0)
        val out = tableSchema.fields.toSeq.map { f =>
          inserts.zipWithIndex.foldLeft(
            org.apache.spark.sql.functions
              .when(lit(false), lit(null).cast(f.dataType))) {
              case (acc, (c, i)) =>
                val value =
                  if (c.assignments.isEmpty) col(s"SRC.${f.name}") // INSERT *
                  else c.assignments.find(a => resolver(a._1, f.name))
                    .map(_._2.cast(f.dataType))
                    .getOrElse(lit(null).cast(f.dataType))
                acc.when(col("__ins") === (i + 1), value)
            }.otherwise(lit(null).cast(f.dataType)).as(f.name)
        }
        Some(claimed.select(out: _*))
      }

    val f = fs(spark, tableDir)
    if (rewritten.isEmpty && inserted.isEmpty && dvGroups.isEmpty)
      return v // nothing touched, nothing claimed, nothing to insert

    // The DV groups' CLAIMED rows, materialized once (bounded by the
    // threshold fraction of those groups): feeds the position artifact
    // and the updated copies.
    val claimedDv: Option[DataFrame] =
      if (dvGroups.isEmpty) None
      else Some(joinedTagged(dvGroups)
        .filter(col("__action").isin(matchedIds: _*))
        .capLineage())
    val dvKind =
      if (matchedDeleteIds.isEmpty) lit("update")
      else if (matchedUpdateIds.isEmpty) lit("delete")
      else org.apache.spark.sql.functions
        .when(col("__action").isin(matchedDeleteIds: _*), "delete")
        .otherwise("update")
    val (dvCarried, dvAbsorb) = dvCarryPlan(spark, m, untouchedFiles, dvGroups)
    val dvAdditions = claimedDv.map(cd =>
      writeDvArtifact(spark, tableDir, cd, dvGroups, dvByGroup, dvClaims,
        kindCol = dvKind, absorb = dvAbsorb))
      .getOrElse(Seq.empty)
    // Orphan discipline (same as delete/update): reclaim the artifact
    // and every group written so far on ANY failure past this point.
    val cleanupOnFailure =
      scala.collection.mutable.ArrayBuffer[String](dvAdditions.map(_._2).distinct: _*)
    try {
      // updated COPIES of the UPDATE-claimed rows in DV groups (DELETE
      // claims need only their positions)
      val (copiesGroup, nCopies) = claimedDv match {
        case Some(cd) if matchedUpdateIds.nonEmpty =>
          val copies = cd.filter(col("__action").isin(matchedUpdateIds: _*))
            .select(out: _*)
          val (g, nc) = writeGroup(copies, tableDir, m.mapping)
          cleanupOnFailure += g
          if (nc == 0L) { // all claims were deletes
            f.delete(new Path(s"$tableDir/files/$g"), true)
            (None, 0L)
          } else {
            enforceConstraints(spark, tableDir, g, m.schemaDdl, m.constraints, m.mapping)
            (Some(g), nc)
          }
        case _ => (None, 0L)
      }
      val pieces = rewritten.toSeq ++ inserted.toSeq
      val (newGroup, n) =
        if (pieces.isEmpty) (None, 0L)
        else {
          val newData = pieces.reduce(_ unionByName _)
          val (g, nn) = writeGroup(newData, tableDir, m.mapping)
          cleanupOnFailure += g
          enforceConstraints(spark, tableDir, g, schemaDdl, m.constraints, m.mapping)
          if (nn == 0L && (untouchedFiles.nonEmpty || copiesGroup.nonEmpty ||
            dvAdditions.nonEmpty)) {
            f.delete(new Path(s"$tableDir/files/$g"), true)
            (None, 0L)
          } else (Some(g), nn)
        }
      val groups = untouchedFiles ++ newGroup.toSeq ++ copiesGroup.toSeq
      val dvs = (if (dvAbsorb.isEmpty) dvCarried else Seq.empty) ++ dvAdditions
      val untouchedRows = liveGroupRows(spark, tableDir, untouchedFiles, m)
      val dvClaimTotal = dvGroups.map(dvClaims).sum
      val nRows = untouchedRows - dvClaimTotal + n + nCopies
      // EFFECT-mode label: a merge whose entire effect is a pure-DV
      // delete (all claims deletes, no copies, no inserts, no
      // rewrites) commits as mode 'delete', and one whose effect is
      // exactly a merge-on-read update (all claims updates, copies
      // only) as 'update'. Mixed DV merges keep mode 'merge' — the
      // feed attributes their rows via the artifact's per-row claim
      // kinds and the manifest's copies annotation.
      val mode =
        if (dvAdditions.isEmpty) "merge"
        else if (touchedRw.isEmpty && newGroup.isEmpty &&
          copiesGroup.isEmpty && dvDeleteClaims == dvClaimTotal) "delete"
        else if (touchedRw.isEmpty && newGroup.isEmpty &&
          copiesGroup.nonEmpty && dvDeleteClaims == 0L) "update"
        else "merge"
      publishExpecting(spark, tableDir, v, groups,
        newGroup.toSeq ++ copiesGroup.toSeq, nRows, mode,
        schemaDdl, mapping = m.mapping, dvs = dvs,
        rowsByGroup = m.fileRows ++ newGroup.map(_ -> n) ++
          copiesGroup.map(_ -> nCopies),
        copies = copiesGroup.toSeq)
    } catch {
      case scala.util.control.NonFatal(e) =>
        cleanupOnFailure.foreach(g => scala.util.Try(
          f.delete(new Path(s"$tableDir/files/$g"), true)))
        throw e
    }
  }

  /** OPTIMIZE-style compaction: rewrite the latest version's data as a
    * fresh file group sized to ~`targetFileBytes` output files and
    * commit it as a new SNAPSHOT version. Rows are identical (spec-
    * pinned); history is preserved — the parent version still reads its
    * own groups — and the superseded small groups are reclaimed by the
    * next [[vacuum]] once no kept version references them. Why it
    * matters at scale: an append-per-batch table accumulates one group
    * per commit, and a parquet scan's task count tracks FILE count, not
    * data size — a year of small appends turns every read into a
    * many-thousand-task scan. Compaction restores the scan shape
    * without giving up the append history or [[changes]] consumers
    * (which difference manifests, not data). Returns the new version. */
  def compact(
      spark: SparkSession,
      tableDir: String,
      targetFileBytes: Long = 128L << 20): Long = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val groups = readManifest(spark, tableDir, v)._1
    val f = fs(spark, tableDir)
    val bytes = groups.map { g =>
      f.getContentSummary(new Path(s"$tableDir/files/$g")).getLength
    }.sum
    val parts = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val df = read(spark, tableDir, v).repartition(parts.toInt)
    val (group, n) = writeGroup(df, tableDir)
    enforceConstraints(spark, tableDir, group,
      Some(storedSchema(df)), constraints(spark, tableDir))
    // Rebase-aware publication: racing pure APPENDS merge into the
    // compacted commit instead of discarding the full rewrite.
    rebasePublish(spark, tableDir, v, Seq(group -> n), Some(storedSchema(df)))
  }

  /** OPTIMIZE ZORDER BY for versioned tables: rewrite the latest
    * version Z-ORDER-CLUSTERED on `dims` into `numGroups` file groups,
    * each holding one contiguous range of the Morton curve, and commit
    * the rewrite as a new SNAPSHOT version. Because every group is a
    * small hyper-rectangle of the combined dims domain, the per-group
    * min/max sidecars ([[GroupStats]]) come out TIGHT on every layout
    * dimension at once — so [[readWhere]] with a predicate on ANY of
    * the dims prunes ~n^((d-1)/d) of the groups at planning time. This
    * is the versioned composition of [[graft.sources.Layout]]'s curve
    * with the manifest's skipping stats: append-heavy tables whose
    * groups are arrival-ordered (stats span the whole domain, nothing
    * prunes) get re-laid so the stats work, without losing history —
    * the parent version still reads its own groups, and the superseded
    * ones vacuum away.
    *
    * Cost shape (all pay-once, at rewrite time): one quantile pass for
    * the dims' bucket boundaries, one for the z-value's group edges,
    * then a single hash exchange on the group id with an in-partition
    * (group, z) sort feeding a partitioned write — the same shuffle a
    * bucketed write pays. Choose `numGroups` so groups land near the
    * size [[compact]] would target; at 1000 executors the group count
    * also bounds skip granularity: more groups = finer pruning, more
    * manifest rows. Returns the new version number. */
  def cluster(
      spark: SparkSession,
      tableDir: String,
      dims: Seq[String],
      numGroups: Int,
      bitsPerDim: Int = 8): Long = {
    require(numGroups >= 1, s"numGroups must be >= 1: $numGroups")
    val v = latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    val df = read(spark, tableDir, v)
    val boundaries = graft.sources.Layout.boundariesFor(df, dims, bitsPerDim)
    val withZ = graft.sources.Layout.withZValue(df, dims, boundaries, bitsPerDim)
    // Equi-depth edges over the z-value → group id = rank among edges.
    // Duplicate edges (few distinct z-values) just leave some groups
    // empty; the publish lists only the groups that materialized.
    // bucketRank, not size(filter(...)): ArrayFilter is CodegenFallback
    // and would drag the whole staging projection into interpreted eval.
    val gid: org.apache.spark.sql.Column =
      if (numGroups == 1) org.apache.spark.sql.functions.lit(0)
      else {
        import org.apache.spark.sql.functions._
        val probs = (1 until numGroups).map(_.toDouble / numGroups).toArray
        val edges = withZ.stat.approxQuantile("__z", probs, 1.0 / (numGroups * 4))
        graft.sources.Layout.bucketRank(col("__z").cast("double"), edges)
          .cast("int")
      }
    val staging = s"$tableDir/_staging/${java.util.UUID.randomUUID()}"
    withZ.withColumn("__gid", gid)
      .repartition(numGroups, org.apache.spark.sql.functions.col("__gid"))
      .sortWithinPartitions("__gid", "__z")
      .drop("__z")
      .write.partitionBy("__gid").parquet(staging)
    val f = fs(spark, tableDir)
    val stagingPath = new Path(staging)
    try {
      val gidDirs = f.listStatus(stagingPath)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("__gid="))
        .sortBy(_.getPath.getName.stripPrefix("__gid=").toInt)
      // ONE grouped aggregate over the staged write yields every
      // group's stats — the per-group read-back this replaces paid one
      // full scan job per gid dir. Read before the renames move the
      // dirs out of the staging root.
      val statsByGid = GroupStats.computeByKey(
        spark.read.parquet(staging), "__gid")
      val groups = gidDirs.map { s =>
        val gidNo = s.getPath.getName.stripPrefix("__gid=").toLong
        val g = java.util.UUID.randomUUID().toString
        require(f.rename(s.getPath, new Path(s"$tableDir/files/$g")),
          s"failed to move clustered group ${s.getPath} into place")
        val stats = statsByGid(gidNo)
        GroupStats.write(f, GroupStats.sidecarPath(tableDir, g), stats)
        (g, stats.nRows)
      }.toSeq
      // Rebase-aware publication (same contract as [[compact]]): racing
      // pure appends merge in as-is — their groups simply are not
      // z-clustered yet, exactly as if they had landed after.
      rebasePublish(spark, tableDir, v, groups, Some(storedSchema(df)))
    } finally {
      f.delete(stagingPath, true)
      // rmdir the shared staging root if now empty (a concurrent
      // cluster's staging dir makes this a no-op, hence the Try)
      scala.util.Try(f.delete(new Path(s"$tableDir/_staging"), false))
    }
  }

  /** CDC-style incremental read: the rows ADDED after `fromVersion`, up
    * to `toVersion` (inclusive; default latest), served by reading ONLY
    * the file groups that joined the manifest in that range — the
    * incremental-consumer seam. Planning is metadata-only (a manifest
    * set difference); the scan never touches `fromVersion`'s data, so a
    * consumer that processed v_N and asks for `changes(N)` over a
    * 100 TB table reads just the appended groups, the same
    * cost-tracks-churn shape as [[Snapshot.diff]] and the incremental
    * dedup flavors. Every version in `(fromVersion, toVersion]` must be
    * an APPEND: a snapshot rewrites the file set, so "what changed"
    * stops being a file-group difference — crossing one raises (use
    * [[diffVersions]] for a row-level diff instead). */
  /** Version modes whose manifests can only ADD file groups (append)
    * or leave them untouched (metadata-only DDL) — the modes a
    * file-group-differencing CDC window may safely cross. */
  private val appendSafeModes: Set[String] = Set(
    "append", "add_constraint", "drop_constraint",
    "rename_column", "drop_column")

  def changes(
      spark: SparkSession,
      tableDir: String,
      fromVersion: Long,
      toVersion: Long = -1L): DataFrame = {
    val to = if (toVersion >= 0) toVersion else latestVersion(spark, tableDir)
    require(fromVersion >= 0 && fromVersion <= to,
      s"invalid version range ($fromVersion, $to]")
    ((fromVersion + 1) to to).foreach { v =>
      val m = parseManifest(spark, tableDir, v)
      // Metadata-only versions (constraint and column DDL) keep the
      // file set untouched, so differencing across them stays sound —
      // a CDC consumer must not be forced to resync because someone
      // added a constraint or renamed a column mid-window. Rewrites
      // (snapshot/delete/update/merge/...) still raise.
      require(appendSafeModes(m.mode),
        s"changes($fromVersion, $to] crosses rewrite version $v " +
          s"(mode=${m.mode}); file-group differencing is only valid over " +
          "append/metadata chains — use diffVersions for a row-level diff")
    }
    val fromGroups = readManifest(spark, tableDir, fromVersion)._1.toSet
    val toManifest = parseManifest(spark, tableDir, to)
    val added = toManifest.files.filterNot(fromGroups)
    if (added.isEmpty) read(spark, tableDir, to).limit(0)
    else scanGroups(spark, tableDir, added, toManifest.schemaDdl, toManifest.mapping)
  }

  /** ROW-LEVEL CDC feed — Delta's Change Data Feed shape, derived
    * entirely from the manifest log plus deletion vectors (no extra
    * change files are ever written): every row added or removed in
    * `(fromVersion, toVersion]`, tagged with `_change_type`
    * ('insert' | 'delete' | 'update_preimage' | 'update_postimage'),
    * `_commit_version`, and `_commit_timestamp` (the version's manifest
    * `committed_at` — Delta CDF's full column triple).
    *
    *  - APPEND-safe versions emit their introduced file groups as
    *    inserts — the same metadata-only planning as [[changes]];
    *  - a PURE-DV delete (file set unchanged, deletion vectors grew)
    *    emits exactly the rows its position-diff removed: the groups
    *    are immutable, so the deleted rows' full pre-image values are
    *    still on disk, and one semi-join of the touched groups against
    *    the (rel, pos) diff recovers them — cost tracks the CHURN,
    *    never the table;
    *  - a MERGE-ON-READ update (no group removed; DVs grew and the
    *    updated copies landed as added groups) emits the DV growth as
    *    `update_preimage` and the added groups as `update_postimage`
    *    — Delta CDF's update pair, derived with zero write-time cost;
    *  - a DV-backed MERGE with mixed claims (mode 'merge', no group
    *    removed) splits its position growth per row by the artifact's
    *    claim kind (delete vs update_preimage), serves the manifest-
    *    annotated copies group as update_postimage, and any other
    *    added group as inserts;
    *  - a REWRITE (snapshot/compact/COW delete/update/merge — any
    *    version that REMOVES a file group, including a mixed
    *    DV+rewrite mutation) still raises: a file-group difference
    *    cannot attribute row identity across a rewrite (use
    *    [[diffVersions]] there).
    *
    * This is what a downstream sync (search index, cache, replica)
    * consumes to stay exact under the append + GDPR-delete lifecycle
    * without ever rescanning the table.
    *
    * REPLAY CONTRACT (same as Delta CDF): apply changes in
    * `_commit_version` order — inserts add, deletes remove,
    * update_preimage removes and update_postimage adds (or treat the
    * pair as one keyed upsert). A row updated in two versions of one
    * window emits TWO pre/post pairs, each diffed against ITS parent;
    * applying them out of version order (or applying only postimages
    * without removing preimages) double-counts. Aggregating consumers
    * that cannot key rows should group by `_commit_version` first. */
  def changesFeed(
      spark: SparkSession,
      tableDir: String,
      fromVersion: Long,
      toVersion: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.{lit => flit}
    val to = if (toVersion >= 0) toVersion else latestVersion(spark, tableDir)
    require(fromVersion >= 0 && fromVersion <= to,
      s"invalid version range ($fromVersion, $to]")
    val pieces = changesFeedPieces(spark, tableDir, fromVersion, to)
    if (pieces.isEmpty)
      read(spark, tableDir, to).limit(0)
        .withColumn("_change_type", flit("insert"))
        .withColumn("_commit_version", flit(-1L))
        .withColumn("_commit_timestamp",
          flit(new java.sql.Timestamp(0L)))
    else pieces.reduce(_ unionByName _)
  }

  /** A manifest's commit instant as a timestamp literal — the CDF's
    * `_commit_timestamp` (Delta CDF's third column). Every manifest
    * this module writes records `committed_at`; a hand-built one that
    * does not would break the CDF's declared non-null schema, so raise
    * with the version named. */
  private[graft] def commitTs(m: Manifest, v: Long): java.sql.Timestamp = {
    require(m.committedAt.nonEmpty,
      s"manifest v$v has no committed_at — cannot derive _commit_timestamp")
    // TimestampType stores MICROSECONDS; truncate here so the value is
    // identical whether read back from the column or recomputed.
    java.sql.Timestamp.from(java.time.Instant.parse(m.committedAt)
      .truncatedTo(java.time.temporal.ChronoUnit.MICROS))
  }

  /** Delta's `table_changes('t', start [, end])` contract over
    * [[changesFeed]]: INCLUSIVE start — version `startVersion`'s OWN
    * changes are served (the same reading the streaming CDF source
    * gives `startingVersion`), and a start of 0 emits version 0's full
    * content as version-0 inserts (there is no parent to difference
    * against — Delta CDF does the same for a from-genesis read).
    * `endVersion < 0` = latest. This is the SQL TVF's engine; the SQL
    * surface is `SELECT ... FROM table_changes('dir-or-table', start
    * [, end])` under [[graft.sources.GraftExtensions]]. */
  def tableChanges(
      spark: SparkSession,
      tableDir: String,
      startVersion: Long,
      endVersion: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.{lit => flit}
    require(startVersion >= 0, s"startVersion must be >= 0: $startVersion")
    val to = if (endVersion >= 0) endVersion else latestVersion(spark, tableDir)
    if (startVersion > 0) return changesFeed(spark, tableDir, startVersion - 1, to)
    val m0 = parseManifest(spark, tableDir, 0L)
    val endMeta = parseManifest(spark, tableDir, to)
    val genesis = scanVersionGroups(spark, tableDir, m0.files,
      endMeta.schemaDdl, endMeta.mapping, m0.dvs)
      .withColumn("_change_type", flit("insert"))
      .withColumn("_commit_version", flit(0L))
      .withColumn("_commit_timestamp", flit(commitTs(m0, 0L)))
    (genesis +: changesFeedPieces(spark, tableDir, 0L, to))
      .reduce(_ unionByName _)
  }

  /** [[changesFeed]]'s frames (already `_change_type` /
    * `_commit_version`-tagged) — exposed so the streaming CDF source
    * can union and re-flag them without inheriting the batch wrapper's
    * empty-range `limit(0)` (a Limit is illegal in a streaming plan).
    *
    * PLAN-SIZE bound: consecutive insert-only versions COLLAPSE into
    * ONE scan over all their groups plus a broadcast-tiny
    * (group → version) map join — a year of daily appends replays as
    * one scan, not 365 — and consecutive pure-DV mutations (deletes,
    * merge-on-read updates, AND mixed DV merges, mixed freely)
    * collapse the same way into ≤ 3 frames per run
    * ([[dvMutRunPieces]]: one min-attributed positions frame whose
    * per-row change type rides the artifact's claim kind, one
    * postimage frame, one merge-insert frame), so a from-genesis CDF
    * stream's first micro-batch (which the engine never caps) cannot
    * blow the analyzer up with per-version plan nodes however the
    * history mixes appends, deletes, updates, and merges; the plan
    * grows with the RUN boundaries, not the version count. */
  private[graft] def changesFeedPieces(
      spark: SparkSession,
      tableDir: String,
      fromVersion: Long,
      to: Long): Seq[DataFrame] = {
    import org.apache.spark.sql.functions.{lit => flit}
    val toManifest = parseManifest(spark, tableDir, to)
    // classification pass: metadata-only
    sealed trait Ev
    final case class Ins(v: Long, added: Seq[String], ts: java.sql.Timestamp) extends Ev
    // `mode` ∈ delete | update | merge — every non-rewrite DV mutation
    // joins ONE run kind; the run collapse attributes change types per
    // version (delete/update) or per ROW (merge, via the artifact's
    // claim kind), so mixed histories never pay per-version frames.
    final case class DvMut(v: Long, ts: java.sql.Timestamp,
        prev: Manifest, cur: Manifest, mode: String) extends Ev
    var prev = parseManifest(spark, tableDir, fromVersion)
    val events = scala.collection.mutable.ArrayBuffer.empty[Ev]
    ((fromVersion + 1) to to).foreach { v =>
      val cur = parseManifest(spark, tableDir, v)
      val ts = commitTs(cur, v)
      val prevSet = prev.files.toSet
      val curSet = cur.files.toSet
      // INSERT-ONLY MERGE detection: a merge that rewrote nothing and
      // touched no deletion vector only ADDED rows (the no-match
      // upsert case) — its new groups are pure inserts, same as an
      // append. Any merge that rewrote a group fails the file-subset
      // test; one that re-DV'd fails the dvs-equality test.
      val insertOnly = appendSafeModes(cur.mode) ||
        (cur.mode == "merge" && prev.files.forall(curSet) &&
          cur.dvs == prev.dvs)
      if (insertOnly) {
        val added = cur.files.filterNot(prevSet)
        if (added.nonEmpty) events += Ins(v, added, ts)
      } else if (cur.mode == "delete" && curSet == prevSet) {
        // pure-DV delete: removed rows = the per-group position growth.
        // CONSECUTIVE pure-DV mutations collapse into O(1) frames (see
        // dvMutRunPieces) — a year of daily GDPR deletes replays as
        // one artifact scan + one attribution join, not 365 frames.
        events += DvMut(v, ts, prev, cur, "delete")
      } else if (cur.mode == "update" && prev.files.forall(curSet)) {
        // merge-on-read UPDATE: the pre-images are the DV position
        // growth (same machinery as the delete branch), the
        // post-images are the version's ADDED groups — the updated
        // copies. Delta CDF's update_preimage/update_postimage pair.
        // Rides the same run consolidation as pure-DV deletes.
        events += DvMut(v, ts, prev, cur, "update")
      } else if (cur.mode == "merge" && prev.files.forall(curSet)) {
        // MIXED DV-backed MERGE (pure delete/update shapes publish
        // under their effect mode and take the branches above): the
        // position growth splits PER ROW by its artifact-recorded
        // claim kind — delete claims emit 'delete', update claims
        // 'update_preimage' — the manifest's `copies` annotation
        // yields 'update_postimage', and any other added group is
        // the insert clauses' rows. Rides the SAME run consolidation
        // as deletes/updates: the artifact's per-position kind travels
        // with the min-over-appearances attribution, so a years-of-
        // daily-merges history replays in ≤ 3 frames, not one each.
        events += DvMut(v, ts, prev, cur, "merge")
      } else {
        throw new IllegalArgumentException(
          s"changesFeed($fromVersion, $to] crosses rewrite version $v " +
            s"(mode=${cur.mode}); row-level change attribution across a " +
            "rewrite is impossible from file groups — use diffVersions")
      }
      prev = cur
    }
    // collapse consecutive insert versions into one scan + version map
    // THE two construction sites for CDF-attributed group scans —
    // every piece shape (insert runs, update postimages, merge copies
    // and inserts) goes through one of these, so the CDF column
    // construction (incl. the nullability alignment the streaming
    // source's strict schema check depends on) lives in one place.
    // LITERAL attribution: all of `groups` belongs to one version.
    def taggedScanLit(groups: Seq[String], changeType: String,
        v: Long, ts: java.sql.Timestamp): DataFrame =
      scanGroups(spark, tableDir, groups, toManifest.schemaDdl,
        toManifest.mapping)
        .withColumn("_change_type", flit(changeType))
        .withColumn("_commit_version", flit(v))
        .withColumn("_commit_timestamp", flit(ts))
    // MAP attribution: one scan over many versions' groups, each row
    // tagged with ITS group's (version, ts) through a broadcast map.
    // The encoder marks the Timestamp field nullable; coalesce it back
    // to non-nullable (never hit — every entry carries a ts) so ALL
    // pieces agree on the CDF columns' nullability.
    def taggedScanMap(entries: Seq[(String, Long, java.sql.Timestamp)],
        changeType: String, fallbackTs: java.sql.Timestamp): DataFrame = {
      import spark.implicits._
      val vmap = org.apache.spark.sql.functions.broadcast(
        entries.toDF("__grp", "__cv", "__ct")
          .withColumn("__ct", coalesce(col("__ct"), flit(fallbackTs))))
      scanGroupsTagged(spark, tableDir, entries.map(_._1),
        toManifest.schemaDdl, toManifest.mapping)
        .withColumn("__grp", org.apache.spark.sql.functions
          .substring_index(col("__dv_rel"), "/", 1))
        .join(vmap, Seq("__grp"))
        .withColumn("_change_type", flit(changeType))
        .withColumn("_commit_version", col("__cv"))
        .withColumn("_commit_timestamp", col("__ct"))
        .drop("__grp", "__cv", "__ct", "__dv_rel", "__dv_pos")
    }
    def insertPiece(run: Seq[Ins]): DataFrame =
      if (run.size == 1)
        taggedScanLit(run.head.added, "insert", run.head.v, run.head.ts)
      else taggedScanMap(
        run.flatMap(i => i.added.map(g => (g, i.v, i.ts))), "insert",
        run.head.ts)
    // A RUN of consecutive pure-DV mutations (deletes AND merge-on-read
    // updates) collapses into O(1) frames: every distinct artifact any
    // run version (plus the run's parent) references is read in ONE
    // scan, each position is attributed to the FIRST version whose
    // artifact carries it (positions only grow within a run, and every
    // artifact is the group's complete merged set — so
    // min-over-appearances is the commit version, and a position
    // already present in the parent's artifact attributes to the parent
    // and drops out); the version's MODE decides the row's change type
    // ('delete' vs 'update_preimage'). Update versions' POSTIMAGES —
    // their added copies groups — collapse into one more frame via the
    // same broadcast (group -> version) map the insert-run collapse
    // uses. Artifact compaction (absorb) remaps untouched groups to
    // fresh artifacts with UNCHANGED positions; those positions still
    // appear in the parent pair, so the min filters them — no spurious
    // changes. Plan cost: <= 2 frames per run instead of O(run length).
    def dvMutRunPieces(dvRun: Seq[DvMut]): Seq[DataFrame] = {
      import spark.implicits._
      if (dvRun.size == 1) {
        val d = dvRun.head
        if (d.mode == "delete")
          return Seq(dvGrowthRows(spark, tableDir, d.prev, d.cur, toManifest)
            .drop("__kind")
            .withColumn("_change_type", flit("delete"))
            .withColumn("_commit_version", flit(d.v))
            .withColumn("_commit_timestamp", flit(d.ts)))
        val prevSet1 = d.prev.files.toSet
        if (d.mode == "update") {
          val pre = dvGrowthRows(spark, tableDir, d.prev, d.cur, toManifest)
            .drop("__kind")
            .withColumn("_change_type", flit("update_preimage"))
            .withColumn("_commit_version", flit(d.v))
            .withColumn("_commit_timestamp", flit(d.ts))
          val post = taggedScanLit(d.cur.files.filterNot(prevSet1),
            "update_postimage", d.v, d.ts)
          return Seq(pre.unionByName(post))
        }
        // single mixed MERGE: per-row kind split of the growth, the
        // copies group as postimages, remaining added groups as inserts
        val growth = dvGrowthRows(spark, tableDir, d.prev, d.cur, toManifest)
          .withColumn("__kind", coalesce(col("__kind"), flit("update")))
        val del = growth.filter(col("__kind") === "delete").drop("__kind")
          .withColumn("_change_type", flit("delete"))
          .withColumn("_commit_version", flit(d.v))
          .withColumn("_commit_timestamp", flit(d.ts))
        val pre = growth.filter(col("__kind") =!= "delete").drop("__kind")
          .withColumn("_change_type", flit("update_preimage"))
          .withColumn("_commit_version", flit(d.v))
          .withColumn("_commit_timestamp", flit(d.ts))
        val copiesSet = d.cur.copies.toSet
        val added = d.cur.files.filterNot(prevSet1)
        val post =
          if (d.cur.copies.isEmpty) Seq.empty[DataFrame]
          else Seq(taggedScanLit(d.cur.copies, "update_postimage", d.v, d.ts))
        val insGroups = added.filterNot(copiesSet)
        val ins =
          if (insGroups.isEmpty) Seq.empty[DataFrame]
          else Seq(taggedScanLit(insGroups, "insert", d.v, d.ts))
        return Seq((Seq(del, pre) ++ post ++ ins).reduce(_ unionByName _))
      }
      val base = dvRun.head.prev
      val baseV = dvRun.head.v - 1
      // (artifact, group) -> earliest version it is the group's entry
      val entries: Seq[(String, String, Long)] =
        (base.dvs.map(e => (e._2, e._1, baseV)) ++
          dvRun.flatMap(d => d.cur.dvs.map(e => (e._2, e._1, d.v))))
          .groupBy(t => (t._1, t._2))
          .map { case ((a, g), vs) => (a, g, vs.map(_._3).min) }.toSeq
      val amap = org.apache.spark.sql.functions.broadcast(
        entries.toDF("__art", "__grp", "__v0"))
      // per-version metadata: timestamp + how to type the pre-image
      // rows — 'delete'/'update_preimage' for whole-version modes, or
      // the MERGE flag that defers to the row's artifact claim kind.
      val vmeta = org.apache.spark.sql.functions.broadcast(
        dvRun.map(d => (d.v, d.ts,
            if (d.mode == "update") "update_preimage" else "delete",
            d.mode == "merge"))
          .toDF("__v0", "__ct", "__chg", "__mrg")
          .withColumn("__ct", coalesce(col("__ct"), flit(dvRun.head.ts))))
      val sub = org.apache.spark.sql.functions.substring_index _
      // Position attribution: min version over appearances. The KIND
      // travels alongside — a position's claim kind is recorded once
      // and carried verbatim through every later merged artifact (and
      // absorb folds), so max() over appearances (null-skipping, for
      // pre-kind artifacts) recovers it exactly.
      // mergeSchema: the run may span artifacts written before claims
      // were kind-tagged beside ones written after — without the merge
      // a pre-kind file can win schema inference and silently drop the
      // `kind` column for the WHOLE read, mistyping merge delete
      // claims. The merged schema null-fills kind for old files —
      // exactly the conservative reading. Artifact file counts are
      // small (KB-scale positions), so the footer merge is cheap.
      val rawPos0 = spark.read.option("mergeSchema", "true").parquet(
        entries.map(_._1).distinct.map(a => s"$tableDir/files/$a"): _*)
      val rawPos =
        if (rawPos0.columns.contains("kind")) rawPos0
        else rawPos0.withColumn("kind", flit(null).cast("string"))
      val positions = rawPos
        .withColumn("__art", sub(sub(
          org.apache.spark.sql.functions.input_file_name(), "/files/", -1),
          "/", 1))
        .withColumn("__grp", sub(col("rel"), "/", 1))
        .select(col("rel"), col("pos"), col("kind"), col("__art"), col("__grp"))
        .join(amap, Seq("__art", "__grp"))
        .groupBy(col("rel").as("__dv_rel"), col("pos").as("__dv_pos"))
        .agg(org.apache.spark.sql.functions.min(col("__v0")).as("__v0"),
          org.apache.spark.sql.functions.max(col("kind")).as("__kind"))
        .filter(col("__v0") > lit(baseV))
      // only groups whose vector actually grew need scanning
      val baseBy = base.dvs.map(d => d._1 -> d._3).toMap
      val grownGroups = dvRun.last.cur.dvs
        .filter(d => d._3 > baseBy.getOrElse(d._1, 0L)).map(_._1)
      // coalesce on the change columns is the nullability-alignment
      // trick (encoders/min() mark them nullable; the streaming CDF
      // source holds every piece to the declared NON-NULL schema) —
      // the literal arms are never hit (every position joined a version)
      val rowChange = org.apache.spark.sql.functions.when(
        col("__mrg") && col("__kind") === "delete", flit("delete"))
        .when(col("__mrg"), flit("update_preimage"))
        .otherwise(col("__chg"))
      val preFrame = scanGroupsTagged(spark, tableDir, grownGroups,
          toManifest.schemaDdl, toManifest.mapping)
        .join(positions, Seq("__dv_rel", "__dv_pos"))
        .join(vmeta, Seq("__v0"))
        .withColumn("_change_type", coalesce(rowChange, flit("delete")))
        .withColumn("_commit_version",
          coalesce(col("__v0"), flit(dvRun.head.v)))
        .withColumn("_commit_timestamp", col("__ct"))
        .drop("__v0", "__ct", "__chg", "__mrg", "__kind", "__dv_rel", "__dv_pos")
      // postimages: update versions' added groups plus merge versions'
      // annotated copies groups — all in one scan, version-attributed
      // through the broadcast map (insertPiece's shape — the groups
      // are disjoint across versions by construction)
      val copies: Seq[(String, Long, java.sql.Timestamp)] = dvRun
        .flatMap { d =>
          if (d.mode == "update") {
            val prevSet1 = d.prev.files.toSet
            d.cur.files.filterNot(prevSet1).map(g => (g, d.v, d.ts))
          } else if (d.mode == "merge") d.cur.copies.map(g => (g, d.v, d.ts))
          else Seq.empty
        }
      // merge versions' insert-clause groups: added, not copies
      val mergeIns: Seq[(String, Long, java.sql.Timestamp)] = dvRun
        .filter(_.mode == "merge").flatMap { d =>
          val prevSet1 = d.prev.files.toSet
          val cp = d.cur.copies.toSet
          d.cur.files.filterNot(prevSet1).filterNot(cp)
            .map(g => (g, d.v, d.ts))
        }
      Seq(preFrame) ++
        (if (copies.isEmpty) Seq.empty
         else Seq(taggedScanMap(copies, "update_postimage", dvRun.head.ts))) ++
        (if (mergeIns.isEmpty) Seq.empty
         else Seq(taggedScanMap(mergeIns, "insert", dvRun.head.ts)))
    }
    val pieces = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val run = scala.collection.mutable.ArrayBuffer.empty[Ins]
    val dvRun = scala.collection.mutable.ArrayBuffer.empty[DvMut]
    def flushRun(): Unit =
      if (run.nonEmpty) { pieces += insertPiece(run.toSeq); run.clear() }
    def flushDvRun(): Unit =
      if (dvRun.nonEmpty) { pieces ++= dvMutRunPieces(dvRun.toSeq); dvRun.clear() }
    events.foreach {
      case i: Ins => flushDvRun(); run += i
      case d: DvMut => flushRun(); dvRun += d
    }
    flushRun(); flushDvRun()
    pieces.toSeq
  }

  /** The rows whose positions JOINED the deletion vectors between
    * `prev` and `cur` (full pre-image values, read back from the
    * immutable groups) — [[changesFeed]]'s delete / update_preimage
    * machinery. */
  private def dvGrowthRows(
      spark: SparkSession, tableDir: String,
      prev: Manifest, cur: Manifest, toManifest: Manifest): DataFrame = {
    val prevBy = prev.dvs.map(d => d._1 -> d).toMap
    val grown = cur.dvs.filter(d =>
      d._3 > prevBy.get(d._1).map(_._3).getOrElse(0L))
    // A published DV delete/update always grows at least one vector, so
    // this cannot fire today — but dvMaskRows on an EMPTY artifact list
    // would die in spark.read.parquet() with an opaque zero-path
    // AnalysisException; pin the invariant with a clear message so a
    // future mode-classification drift fails diagnosably.
    require(grown.nonEmpty,
      s"changesFeed: version classified as a DV mutation of $tableDir " +
        "grew no deletion vector — manifest mode/dv state is inconsistent")
    val curRows = dvRowsKinded(spark, tableDir, grown)
    val prevFor = grown.flatMap(d => prevBy.get(d._1))
    val diff =
      if (prevFor.isEmpty) curRows
      else curRows.join(dvMaskRows(spark, tableDir, prevFor),
        Seq("__dv_rel", "__dv_pos"), "left_anti")
    val total = grown.map(_._3).sum
    val cap = spark.conf.getOption("spark.graft.dv.broadcastRows")
      .map(_.toLong).getOrElse(4000000L)
    val diffSide = if (total <= cap)
      org.apache.spark.sql.functions.broadcast(diff) else diff
    // INNER join (positions are unique per group by the merged-set
    // invariant) keeps `__kind` — the per-row claim class the mixed-
    // merge feed branch splits on; plain delete/update callers drop it.
    scanGroupsTagged(spark, tableDir, grown.map(_._1),
      toManifest.schemaDdl, toManifest.mapping)
      .join(diffSide, Seq("__dv_rel", "__dv_pos"))
      .drop("__dv_rel", "__dv_pos")
  }

  /** Version history: (version, mode, n_rows), ascending. */
  def versions(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    (0L to latestVersion(spark, tableDir)).flatMap { v =>
      scala.util.Try(readManifest(spark, tableDir, v)).toOption
        .map { case (_, n, mode) => (v, mode, n) }
    }.toDF("version", "mode", "n_rows")
  }

  /** `DESCRIBE HISTORY`-style audit surface: one row per committed
    * version with mode, row count, file-group count, the commit
    * timestamp recorded in the manifest, and whether the version's file
    * groups are still fully present on disk (false after a [[vacuum]]
    * that dropped them — the row stays, so the audit trail survives the
    * data). Vacuumed-away versions whose MANIFEST was dropped do not
    * appear, matching Delta's behavior of history following retention. */
  def describeHistory(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, tableDir)
    // groups and artifacts repeat across versions: one exists/size probe
    // per DISTINCT name for the whole history, not per version — a
    // long-history audit pays O(distinct groups) driver round-trips,
    // not O(versions x groups)
    val sizeOf = scala.collection.mutable.Map.empty[String, Long]
    val existsOf = scala.collection.mutable.Map.empty[String, Boolean]
    (0L to latestVersion(spark, tableDir)).flatMap { v =>
      scala.util.Try(parseManifest(spark, tableDir, v)).toOption.map { m =>
        val present = m.files.forall(g => existsOf.getOrElseUpdate(g,
          f.exists(new Path(s"$tableDir/files/$g"))))
        val artifacts = m.dvs.map(_._2).distinct
        val dvBytes = artifacts.map(a => sizeOf.getOrElseUpdate(a,
          scala.util.Try(f.getContentSummary(
            new Path(s"$tableDir/files/$a")).getLength).getOrElse(0L))).sum
        (v, m.mode, m.nRows, m.files.size.toLong, m.committedAt, present,
          m.dvs.map(_._3).sum, artifacts.size.toLong, dvBytes)
      }
    }.toDF("version", "mode", "n_rows", "n_files", "committed_at", "readable",
      "dv_rows", "dv_files", "dv_bytes")
    // dv_rows = positions carried by the version's deletion vectors —
    // the DV-pressure gauge (rewrites/compacts drop it back to 0);
    // dv_files/dv_bytes = the ARTIFACT-ACCRETION gauge: distinct
    // position-artifact directories the version references and their
    // on-disk bytes (bounded by spark.graft.dv.maxArtifacts — repeated
    // small mutations fold into one artifact at the threshold; a
    // vacuumed-away artifact reads as 0 bytes, not an error).
    // committed_at stays the manifest's ISO-8601 instant string:
    // Instant.toString emits 0/3/6/9 fractional digits, so a fixed
    // timestamp parse would be fragile, and an audit surface wants the
    // recorded value verbatim anyway.
  }

  /** Delete file groups referenced ONLY by versions older than
    * `keepFrom` and drop those versions' manifests — the Delta VACUUM
    * analog. Retention is by VERSION (not wall-clock): everything
    * `>= keepFrom` stays fully readable, shared groups survive as long
    * as ANY kept version lists them. Returns (droppedVersions,
    * deletedGroups). Irreversible; callers choose `keepFrom` the way
    * they would a Delta retention window. */
  def vacuum(spark: SparkSession, tableDir: String, keepFrom: Long): (Long, Long) = {
    val f = fs(spark, tableDir)
    val latest = latestVersion(spark, tableDir)
    require(keepFrom >= 0 && keepFrom <= latest,
      s"keepFrom must be within [0, $latest]: $keepFrom")
    // Deletion-vector artifacts live under files/ too and follow the
    // same reference-counted lifecycle as data groups.
    val all = (0L to latest).flatMap { v =>
      scala.util.Try(parseManifest(spark, tableDir, v)).toOption
        .map(m => v -> (m.files ++ m.dvs.map(_._2).distinct))
    }
    val keptGroups = all.collect { case (v, gs) if v >= keepFrom => gs }.flatten.toSet
    val dropGroups = all.collect { case (v, gs) if v < keepFrom => gs }.flatten.toSet
      .diff(keptGroups)
    val dropVersions = all.collect { case (v, _) if v < keepFrom => v }
    // The retention BOUNDARY must stay standalone-resolvable: if its
    // record is a delta (parent chain about to be dropped), publish a
    // checkpoint sidecar (c<v>.json, a full record) FIRST — readers
    // divert to it when the parent read comes back FileNotFound. The
    // sidecar lands create-exclusive BEFORE any manifest is deleted,
    // so a racing reader always finds either the chain or the sidecar.
    if (dropVersions.nonEmpty && keepFrom > 0) {
      val raw = recordRaw(f, manifestPath(tableDir, keepFrom))
      if (raw.trim.startsWith("{\"delta\":")) {
        val m = parseManifest(spark, tableDir, keepFrom)
        val created = graft.sources.FsAtomic.createExclusive(
          f, checkpointPath(tableDir, keepFrom), fullRecordOf(m, keepFrom))
        // The sidecar is what keeps the surviving table readable: a
        // swallowed write failure followed by the manifest deletes
        // below would leave EVERY version >= keepFrom unresolvable.
        // `false` is fine only when the sidecar already exists (an
        // earlier vacuum attempt) — verify before destroying anything.
        require(created || f.exists(checkpointPath(tableDir, keepFrom)),
          s"vacuum aborted: could not write the boundary checkpoint " +
            s"sidecar ${checkpointPath(tableDir, keepFrom)} — retention " +
            "not applied, table left untouched")
      }
    }
    dropGroups.foreach(g => f.delete(new Path(s"$tableDir/files/$g"), true))
    dropVersions.foreach { v =>
      f.delete(manifestPath(tableDir, v), false)
      // a dropped version's own checkpoint sidecar (a PREVIOUS vacuum
      // boundary) goes with it
      scala.util.Try(f.delete(checkpointPath(tableDir, v), false))
    }
    (dropVersions.size.toLong, dropGroups.size.toLong)
  }

  /** Wall-clock retention — the `RETAIN n HOURS` shape on top of
    * [[vacuum]]: drop every version whose manifest `committed_at` is
    * strictly before `cutoff`, except that the LATEST version is always
    * kept (a fully-expired table must stay readable, matching Delta's
    * guarantee). `keepFrom` is the first version at-or-after the
    * cutoff, so retention stays version-contiguous: a version is never
    * dropped while an OLDER one survives. Returns (droppedVersions,
    * deletedGroups). */
  def vacuumOlderThan(
      spark: SparkSession,
      tableDir: String,
      cutoff: java.time.Instant): (Long, Long) = {
    val latest = latestVersion(spark, tableDir)
    require(latest >= 0, s"no versions committed under $tableDir")
    val keepFrom = (0L to latest).find { v =>
      scala.util.Try(parseManifest(spark, tableDir, v)).toOption.exists { m =>
        m.committedAt.nonEmpty &&
          !java.time.Instant.parse(m.committedAt).isBefore(cutoff)
      }
    }.getOrElse(latest)
    vacuum(spark, tableDir, keepFrom)
  }

  /** CDC cursor — the consumer side of [[changes]]: given the last
    * version this consumer processed, return (new rows, advanced
    * cursor, resync flag). Over an all-append window the rows are
    * served from only the appended file groups, exactly [[changes]];
    * when a snapshot/rewrite intervened (or the cursor predates
    * retention), file-group differencing is impossible, so the FULL
    * latest version is returned with `resync = true` — the consumer
    * reprocesses from scratch, the same contract as a Delta CDF reader
    * hitting a vacuumed-away range. A caller polling in a loop holds
    * only the cursor long; state never grows with the table. */
  def pollChanges(
      spark: SparkSession,
      tableDir: String,
      cursor: Long): (DataFrame, Long, Boolean) = {
    val latest = latestVersion(spark, tableDir)
    require(latest >= 0, s"no versions committed under $tableDir")
    if (cursor >= latest) return (read(spark, tableDir, latest).limit(0), latest, false)
    val windowIsAppend = cursor >= 0 &&
      scala.util.Try(readManifest(spark, tableDir, cursor)).isSuccess &&
      ((cursor + 1) to latest).forall { v =>
        scala.util.Try(parseManifest(spark, tableDir, v)).toOption
          .exists(m => appendSafeModes(m.mode))
      }
    if (windowIsAppend) (changes(spark, tableDir, cursor, latest), latest, false)
    else (read(spark, tableDir, latest), latest, true)
  }

  /** The PUSH flavor of [[pollChanges]]: tail an APPEND-ONLY versioned
    * table as a Structured Streaming source. Since round 15 this
    * DELEGATES to the manifest-driven source
    * (`spark.readStream.format("graft")`,
    * [[graft.sources.GraftStreamSource]]): offsets are table versions,
    * every micro-batch is planned from manifest ranges, and a file
    * group that is durable but unpublished is invisible BY
    * CONSTRUCTION — which closes the residual race the retired
    * file-stream implementation documented (its directory listing
    * could catch a rewrite's files before their manifest appeared; the
    * exclusion-join + guard-stream machinery that bounded that window
    * is deleted, not quarantined). Consumers get the same contract:
    * genesis emits the existing groups once, each append exactly once
    * across restarts (engine checkpoint over immutable manifests), and
    * any non-append version past genesis fails the query loudly AT
    * PLAN TIME — before a single row of it could emit.
    *
    * `schema` is retained for signature compatibility and VALIDATED:
    * the manifest already knows the table's schema, so a mismatched
    * caller expectation raises instead of silently reshaping rows.
    * Prefer `spark.readStream.format("graft").load(dir)` (plus
    * `startingVersion` / `maxVersionsPerBatch` options) in new code. */
  def changesStream(
      spark: SparkSession,
      tableDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val live = graft.sources.GraftStreamSource.tableSchema(spark, tableDir)
    require(schema == live,
      s"changesStream($tableDir): the supplied schema does not match the " +
        s"table's manifest schema (supplied: ${schema.toDDL}; manifest: " +
        s"${live.toDDL}) — pass Versioned.read(spark, dir).schema or drop " +
        "to spark.readStream.format(\"graft\").load(dir)")
    spark.readStream.format("graft").load(tableDir)
  }

  /** Version modes a STREAMING tail may live through past genesis:
    * appends and the metadata-only CONSTRAINT versions. Rewrites
    * (snapshot/compact/restore/COW DML) re-emit rows; RENAME/DROP
    * COLUMN reshape the pinned schema mid-stream — both fail the
    * query at batch-plan time ([[graft.sources.GraftStreamSource]]). */
  private[graft] val streamSafeModes: Set[String] =
    Set("append", "add_constraint", "drop_constraint")

  /** CONVERT TO GRAFT — adopt an existing plain-parquet directory as
    * version 0 of a versioned table IN PLACE, Delta's `CONVERT TO
    * DELTA` economics: the data files are MOVED (same-filesystem
    * renames) into one file group, never read-rewritten — converting a
    * 100 TB directory costs one metadata pass (the stats/schema
    * read-back aggregate) plus renames, not a copy. After conversion
    * the directory IS the table: time travel, appends, COW DML,
    * constraints and vacuum all apply; the original file names are
    * preserved inside the group.
    *
    * Restrictions (clear errors, matching the honest subset):
    * partition-directory layouts are refused (re-write via [[commit]]
    * to adopt them — declaring partition columns is a different schema
    * contract), as is a directory that already has versions. NOT
    * crash-atomic: a failure mid-move leaves some files under
    * `files/<group>/` with no manifest published — re-running after
    * moving them back (or completing the move by hand) recovers;
    * readers never see a torn table because the manifest only appears
    * at the end. Returns version 0. */
  def convert(spark: SparkSession, dir: String): Long = {
    require(latestVersion(spark, dir) < 0,
      s"$dir already has versions — it is already a graft table")
    val f = fs(spark, dir)
    val root = new Path(dir)
    require(f.exists(root), s"no such directory: $dir")
    val entries = f.listStatus(root).toSeq
    val dataFiles = entries.filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    val partDirs = entries.filter(s => s.isDirectory && {
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".") && n != "files"
    })
    require(partDirs.isEmpty,
      s"$dir has partition directories (${partDirs.map(_.getPath.getName).take(3).mkString(", ")}…) — " +
        "CONVERT adopts flat parquet layouts only; rewrite partitioned " +
        "data via commit() to adopt it")
    require(dataFiles.nonEmpty, s"no parquet files to adopt under $dir")
    // reserved-name check BEFORE any file moves (writeGroup's gate,
    // applied to adopted files)
    val previewClash = spark.read.parquet(dir).columns
      .filter(c => reservedCols(c.toLowerCase))
    require(previewClash.isEmpty,
      s"column name(s) ${previewClash.mkString(", ")} are reserved for " +
        "internal row identity (the deletion-vector machinery) — rename " +
        "before converting")
    val group = java.util.UUID.randomUUID().toString
    val gdir = new Path(s"$dir/files/$group")
    require(f.mkdirs(gdir), s"cannot create $gdir")
    dataFiles.foreach { df =>
      require(f.rename(df.getPath, new Path(gdir, df.getPath.getName)),
        s"failed to move ${df.getPath} into the file group")
    }
    val back = spark.read.parquet(gdir.toString)
    val stats = GroupStats.compute(back)
    GroupStats.write(f, GroupStats.sidecarPath(dir, group), stats)
    publish(spark, dir, Seq(group), stats.nRows, "convert",
      Some(storedSchema(back)), rowsByGroup = Map(group -> stats.nRows))
  }

  /** RESTORE: republish an earlier version's file groups as the NEW
    * latest version — Delta's `RESTORE TABLE ... TO VERSION AS OF`,
    * and like Delta's it is METADATA-ONLY: no data is read or copied,
    * the new manifest simply lists the old groups again (immutable
    * groups make this sound; [[vacuum]] keeps shared groups alive as
    * long as any kept version lists them). The undo button for a bad
    * [[curate]]/strike/compact: history keeps every intermediate state,
    * including the mistake. Mode is `snapshot` — the restored file set
    * is a rewrite boundary for CDC consumers ([[changes]] raises,
    * [[pollChanges]] resyncs), exactly as a restore should read.
    * Returns the new version number. */
  def restore(spark: SparkSession, tableDir: String, version: Long): Long = {
    val latest = latestVersion(spark, tableDir)
    require(version >= 0 && version <= latest,
      s"restore target must be within [0, $latest]: $version")
    val m = scala.util.Try(parseManifest(spark, tableDir, version)).getOrElse(
      throw new IllegalArgumentException(
        s"version $version is no longer restorable: retention dropped its manifest"))
    require(m.files.nonEmpty, s"version $version of $tableDir lists no files")
    val f = fs(spark, tableDir)
    val missing = m.files.filterNot(g => f.exists(new Path(s"$tableDir/files/$g")))
    require(missing.isEmpty,
      s"version $version is no longer restorable: vacuum dropped " +
        s"group(s) ${missing.mkString(", ")}")
    // The LIVE constraint set carries forward (not the target
    // version's): restoring to pre-constraint data must not launder a
    // violation in, so when constraints exist the restored rows are
    // validated first — the one case where restore pays a scan.
    val missingDv = m.dvs.map(_._2).distinct
      .filterNot(a => f.exists(new Path(s"$tableDir/files/$a")))
    require(missingDv.isEmpty,
      s"version $version is no longer restorable: vacuum dropped " +
        s"deletion-vector artifact(s) ${missingDv.mkString(", ")}")
    val liveCons = constraints(spark, tableDir)
    if (liveCons.nonEmpty) {
      val conds = liveCons.map { case (n, e) =>
        (n, e, scanVersionGroups(
          spark, tableDir, m.files, m.schemaDdl, m.mapping, m.dvs)
          .filter(!coalesce(org.apache.spark.sql.functions.expr(e), lit(true)))
          .count())
      }.filter(_._3 > 0)
      require(conds.isEmpty,
        "restore would violate live CHECK constraint(s): " +
          conds.map { case (n, e, c) => s"$n (`$e`): $c row(s)" }.mkString("; ") +
          " — drop the constraint first or restore a later version")
    }
    publishExpecting(spark, tableDir, latest, m.files, Seq.empty,
      m.nRows, "snapshot", m.schemaDdl, mapping = m.mapping, dvs = m.dvs,
      rowsByGroup = m.fileRows)
  }

  /** CREATE TABLE CLONE (deep): materialize `version` (default latest)
    * of `srcDir` as version 0 of a FRESH table at `dstDir`, carrying
    * the source's manifest schema and the constraint set live AT THAT
    * VERSION. The copy is a distributed read→write (one Spark job, the
    * same plan a snapshot commit pays), not a driver-side file copy —
    * at 100 TB the executors move the bytes. The clone is fully
    * independent afterwards: source history, vacuum and future writes
    * on either side never touch the other. A shallow (metadata-only)
    * clone is deliberately not offered: manifests reference file
    * groups relative to their own tableDir, so sharing groups across
    * tables would couple the two tables' vacuum lifecycles — the exact
    * caveat Delta documents for shallow clones, made unrepresentable
    * here instead. */
  def cloneTable(
      spark: SparkSession, srcDir: String, dstDir: String,
      version: Long = -1L): Long = {
    require(latestVersion(spark, dstDir) < 0,
      s"clone target already has versions: $dstDir")
    val v = if (version >= 0) version else latestVersion(spark, srcDir)
    require(v >= 0, s"no versions committed under $srcDir")
    val m = parseManifest(spark, srcDir, v)
    require(m.files.nonEmpty, s"version $v of $srcDir lists no files")
    val (group, n) = writeGroup(read(spark, srcDir, v), dstDir)
    publish(spark, dstDir, Seq(group), n, "clone", m.schemaDdl,
      Some(m.constraints), rowsByGroup = Map(group -> n))
  }

  /** Row-level diff between two versions (see [[Snapshot.diff]]). */
  def diffVersions(
      spark: SparkSession, tableDir: String, oldV: Long, newV: Long,
      idCol: String, compareCols: Seq[String]): DataFrame =
    Snapshot.diff(read(spark, tableDir, oldV), read(spark, tableDir, newV),
      idCol, compareCols)
}
