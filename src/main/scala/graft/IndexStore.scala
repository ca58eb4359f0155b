package graft

import org.apache.spark.sql.SparkSession

/** Cross-JVM store for standing index artifacts (round-13 upgrade of
  * the per-JVM [[Scratch]] memoizers): a published index survives the
  * JVM and is REUSED by every later session on the same dataset, so a
  * deployment pays each index build once per dataset version — not
  * once per process (at sf10 the triangle index alone costs ~500 s; a
  * 100 TB cluster cannot pay that per JVM).
  *
  * Layout: `$root/$name-v$formatVersion/$fingerprint/…` where the
  * fingerprint is an md5 of the SOURCE files' (name, size, mtime) — a
  * regenerated dataset changes the fingerprint, so staleness is
  * impossible by construction: a stale index is simply never found.
  * Under the fingerprint dir each PART is a [[operators.Snapshots]]
  * table (commit is manifest-atomic per part), and a `_publish`
  * sentinel table — committed LAST, with the part versions as commit
  * metadata — makes the multi-part publish atomic: a JVM that dies
  * mid-build leaves parts without a sentinel, and the next resolve
  * rebuilds (committing fresh versions; snapshot commits never touch
  * existing files, so a concurrent reader of an old version is safe).
  *
  * Concurrent builders (e.g. a bench JVM and a verify JVM racing on a
  * cold store) are benign: index builds are DETERMINISTIC functions of
  * the fingerprinted sources (md5-keyed bucketing, fixed-round
  * iteration), so both racers commit identical content and either
  * sentinel pins a valid build. Snapshot commits publish via
  * put-if-absent manifests, so the LOSER of a same-version part or
  * sentinel commit gets [[operators.ConcurrentSnapshotException]];
  * resolve catches it and degrades to waiting for the winner's
  * sentinel, then returns the winner's publish — a race never
  * crashes a query.
  *
  * FORMAT-VERSION RULE: any change to an index's schema, content
  * derivation, or partitioning MUST bump the caller's `formatVersion`
  * — it is baked into the path, so old JVMs keep reading their layout
  * and new JVMs never pick up a stale-layout artifact. (The
  * GraphSpec index-served ≡ inline-built parity pins catch a missed
  * bump at test time.)
  */
object IndexStore {

  /** Store root — stable across JVMs; overridable for deploys via the
    * env var and for tests via the system property (checked first so a
    * spec can point the store at a throwaway dir within the shared
    * test JVM).
    */
  def root: String = sys.props.get("graft.index.dir")
    .orElse(sys.env.get("SPARK_GRAFT_INDEX_DIR"))
    .getOrElse(sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_index_store")

  /** Fingerprint of the dataset files an index derives from:
    * md5 over each source's sorted (relative-name, size, mtime) rows.
    * Sources are paths relative to the dataset dir; a source may be a
    * single file or a directory (walked recursively, order-stable).
    */
  def fingerprint(d: String, sources: Seq[String]): String = {
    val rows = sources.sorted.flatMap { src =>
      val p = java.nio.file.Paths.get(d, src)
      if (!java.nio.file.Files.exists(p)) Seq(s"$src|ABSENT")
      else {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(p)
        try
          walk.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(f =>
              s"$src/${p.relativize(f)}|${java.nio.file.Files.size(f)}|" +
                s"${java.nio.file.Files.getLastModifiedTime(f).toMillis}")
            .toSeq.sorted
        finally walk.close()
      }
    }
    md5hex(rows.mkString("\n")).take(16)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def sentinelDir(base: String): String = base + "/_publish"

  /** Resolve the named multi-part index for dataset `d`.
    *
    * Published already (sentinel present for this fingerprint) →
    * returns part → table-dir WITHOUT invoking `build` (logs
    * "reused"). Otherwise runs `build`, which receives `part => dir`
    * and must commit each part as a snapshot table into that dir,
    * returning part → committed-version; resolve then publishes the
    * sentinel pinning those versions and returns the dirs.
    *
    * Reads go through `Snapshots.read(dir)` (latest): determinism of
    * the builds makes latest content-identical to the sentinel-pinned
    * version even under a build race; the pins in the sentinel meta
    * are the audit record. A part may also be a PLAIN parquet dir
    * (e.g. a partitionBy layout Snapshots does not model) — write it
    * through [[publishPlainDir]] (write-to-temp + atomic rename, so a
    * build race cannot half-overwrite a dir a peer is reading) and
    * report it with version 0; the sentinel still marks the publish
    * as complete. Prefer snapshot parts where the layout allows.
    */
  def resolve(
      s: SparkSession, name: String, formatVersion: Int, d: String,
      sources: Seq[String])(
      build: (String => String) => Map[String, Int]): Map[String, String] = {
    val fp = fingerprint(d, sources)
    val base = s"$root/$name-v$formatVersion/$fp"
    val partDir = (part: String) => s"$base/$part"
    val sent = sentinelDir(base)
    val published = operators.Snapshots.versions(s, sent)
    if (published.nonEmpty) {
      val meta = operators.Snapshots.meta(s, sent, published.last)
      val parts = meta.getOrElse("parts", "").split(",").filter(_.nonEmpty)
      System.err.println(s"[index] $name fp=$fp reused (published v${published.last})")
      touch(base) // prune() ages by LAST USE, not build time
      parts.map(p => p -> partDir(p)).toMap
    } else {
      val t0 = System.nanoTime()
      try {
        val versions = build(partDir)
        require(versions.nonEmpty, s"index $name build published no parts")
        // sentinel LAST: its single manifest is the atomic publish point
        import s.implicits._
        val sdf = Seq(1).toDF("published")
        operators.Snapshots.commit(sdf, sent, replace = true,
          meta = Map(
            "parts" -> versions.keys.toSeq.sorted.mkString(","),
            "fingerprint" -> fp) ++
            versions.map { case (p, v) => s"part_$p" -> v.toString })
        System.err.println(
          f"[index] $name fp=$fp built+published in ${(System.nanoTime() - t0) / 1e9}%.1fs")
        prune(s"$root/$name-v$formatVersion", keepFp = fp)
        versions.keys.map(p => p -> partDir(p)).toMap
      } catch {
        // race loser: a concurrent builder committed the same part or
        // sentinel version first. Builds are deterministic, so the
        // winner's publish is what we would have published — wait for
        // its sentinel and reuse it instead of crashing the query.
        case _: operators.ConcurrentSnapshotException =>
          System.err.println(
            s"[index] $name fp=$fp lost publish race; awaiting winner's sentinel")
          awaitPublished(s, name, fp, sent, partDir)
      }
    }
  }

  /** After losing a publish race: poll for the winner's sentinel (it
    * commits the sentinel LAST, possibly seconds after the part commit
    * we collided on) and return its parts. Bounded wait — if the
    * winner died between winning the part commit and publishing, we
    * surface that as an error rather than spin forever; the NEXT
    * resolve on the (sentinel-less) fingerprint rebuilds cleanly.
    */
  private def awaitPublished(
      s: SparkSession, name: String, fp: String, sent: String,
      partDir: String => String): Map[String, String] = {
    val deadline = System.nanoTime() + 10L * 60 * 1000 * 1000 * 1000 // 10 min
    while (System.nanoTime() < deadline) {
      val vs = operators.Snapshots.versions(s, sent)
      if (vs.nonEmpty) {
        val meta = operators.Snapshots.meta(s, sent, vs.last)
        val parts = meta.getOrElse("parts", "").split(",").filter(_.nonEmpty)
        System.err.println(s"[index] $name fp=$fp reused winner's publish (v${vs.last})")
        return parts.map(p => p -> partDir(p)).toMap
      }
      Thread.sleep(500)
    }
    throw new IllegalStateException(
      s"index $name fp=$fp: lost publish race but winner never published a sentinel")
  }

  /** Best-effort mtime bump so prune's age gate measures last USE. */
  private def touch(dir: String): Unit =
    try java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(dir),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Exception => () }

  /** Publish a PLAIN (non-snapshot) directory part: `write` lands the
    * data in a unique temp sibling, which is then renamed into place
    * atomically. If a racing builder won the rename, the temp copy is
    * discarded — builds are deterministic, so the winner's content is
    * identical and the loser simply reuses it. Returns the target.
    */
  def publishPlainDir(target: String)(write: String => Unit): String = {
    val t = java.nio.file.Paths.get(target)
    if (java.nio.file.Files.exists(t)) return target
    val tmp = target + ".tmp-" + java.util.UUID.randomUUID.toString.take(8)
    write(tmp)
    try java.nio.file.Files.move(java.nio.file.Paths.get(tmp), t,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      // ONLY the benign racer-won shapes — a broad FileSystemException
      // catch would swallow AtomicMoveNotSupportedException on stores
      // without atomic rename and silently publish a missing dir
      case _: java.nio.file.FileAlreadyExistsException |
          _: java.nio.file.DirectoryNotEmptyException =>
        deleteRecursively(java.nio.file.Paths.get(tmp)) // racer won; identical content
    }
    if (!java.nio.file.Files.exists(t))
      throw new IllegalStateException(
        s"publishPlainDir: rename reported success but $target does not exist")
    target
  }

  /** Prune SIBLING fingerprints older than [[PruneAgeMs]] by the fp
    * dir's mtime — which [[touch]] bumps on every reused resolve, so
    * the age gate measures LAST USE, not build time: a still-current
    * index on another dataset (e.g. the ~713 s sf10 tri index being
    * reused daily) stays fresh however old its build is. Age-gated so
    * a concurrently-live session on another dataset (bench at sf0.1
    * racing verify at sf0.01) can never lose its index mid-read;
    * truly idle dataset generations age out.
    */
  private val PruneAgeMs = 48L * 3600 * 1000

  private def prune(nameDir: String, keepFp: String): Unit =
    try {
      val dir = java.nio.file.Paths.get(nameDir)
      if (java.nio.file.Files.isDirectory(dir)) {
        import scala.jdk.CollectionConverters._
        val cutoff = System.currentTimeMillis() - PruneAgeMs
        val ls = java.nio.file.Files.list(dir)
        try ls.iterator().asScala
          .filter(p => p.getFileName.toString != keepFp)
          .filter(p => java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff)
          .foreach(deleteRecursively)
        finally ls.close()
      }
    } catch { case _: Exception => () } // pruning is best-effort

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(p)
    try
      walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { try java.nio.file.Files.deleteIfExists(f) catch { case _: Exception => () } })
    finally walk.close()
  }
}
