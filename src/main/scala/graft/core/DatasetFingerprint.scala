package graft.core

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._
import scala.util.Try

/** Content-addressed tags for session-persisted artifacts
  * ([[graft.analytics.SessionArtifact]], NearDupArtifact): an artifact
  * root is keyed by (code tag, dataset fingerprint), so a RESTARTED
  * session reuses last night's published tables iff both the data and
  * the building code are unchanged — the production nightly-artifact
  * semantics — while any change to either moves the root and forces a
  * rebuild. This replaces the per-process random jvmTag, whose
  * staleness safety came from never reusing anything.
  *
  * The dataset fingerprint hashes, for every regular file under the
  * dataset dir: its (relative path, size, mtime) plus a BOUNDED content
  * probe — the first and last 4 KiB of the file's bytes. The probe
  * closes most of the metadata-only gap: many filesystems store mtime
  * at 1 s (or coarser) granularity, and `rsync -a`/`tar` restores
  * preserve mtimes exactly, so a same-size content rewrite could
  * otherwise silently reuse a stale artifact. The residual blind spot
  * — a rewrite confined to the middle of a file that preserves size,
  * mtime, head and tail — is accepted; a real deployment keys on the
  * table format's snapshot id instead (same contract, same swap-in
  * point). Cost is one open + ≤8 KiB read per file: still
  * metadata-speed for any sane file count, and the opt-in
  * [[withCache]] scope amortizes repeat resolves (a bench pass touches
  * the same dirs hundreds of times).
  */
object DatasetFingerprint {

  private def hex(md: MessageDigest): String =
    md.digest().map(b => f"${b & 0xff}%02x").mkString

  /** Head+tail probe: first and last `ProbeBytes` of the file (the
    * whole file when smaller). Bounded per file regardless of size.
    */
  private val ProbeBytes = 4096

  private def probe(md: MessageDigest, f: Path, size: Long): Unit = {
    val ch = Files.newByteChannel(f)
    try {
      val head = java.nio.ByteBuffer.allocate(
        math.min(size, ProbeBytes.toLong).toInt)
      while (head.hasRemaining && ch.read(head) >= 0) {}
      md.update(head.array(), 0, head.position())
      if (size > ProbeBytes) {
        val tail = java.nio.ByteBuffer.allocate(
          math.min(size - ProbeBytes, ProbeBytes.toLong).toInt)
        ch.position(size - tail.capacity())
        while (tail.hasRemaining && ch.read(tail) >= 0) {}
        md.update(tail.array(), 0, tail.position())
      }
    } finally ch.close()
  }

  /** Diagnostic: number of full directory walks performed (cache
    * misses and uncached calls alike). Lets tests pin the [[withCache]]
    * amortization contract: at most one walk per dir per scope.
    */
  private[graft] val walkCount = new AtomicLong(0)

  // opt-in memoization scope: entries live only while at least one
  // withCache scope is open (depth > 0). NOT enabled by default — an
  // in-session data edit must move the fingerprint on the very next
  // resolve (ArtifactReuseSpec pins that), so only phases that KNOW
  // the dataset is frozen (a bench pass, a sweep) open the scope.
  private val cacheDepth = new AtomicLong(0)
  private val cache = new ConcurrentHashMap[String, String]()

  /** Run `body` with fingerprint memoization ON: every `of(dir)` for a
    * given dir computes (and walks + probes) at most once inside the
    * scope. Use ONLY around phases where the dataset dirs are known
    * frozen — the bench harness wraps each timed pass so hundreds of
    * artifact resolves cost one walk, while interactive/test sessions
    * keep the recompute-per-call staleness guarantee. Scopes nest;
    * the cache drops when the outermost scope exits.
    */
  def withCache[A](body: => A): A = {
    cacheDepth.incrementAndGet()
    try body
    finally if (cacheDepth.decrementAndGet() == 0) cache.clear()
  }

  /** Fingerprint of the dataset at `dir`: stable across JVMs while
    * the files are unchanged; moves on any file add/remove/resize/
    * touch/rename and on any content change visible to the head/tail
    * probe. Recomputed per call (never cached) outside a [[withCache]]
    * scope, so an in-session data change is seen by the next artifact
    * build.
    */
  def of(dir: String): String =
    if (cacheDepth.get() > 0) cache.computeIfAbsent(dir, compute)
    else compute(dir)

  private def compute(dir: String): String = {
    walkCount.incrementAndGet()
    val root = Paths.get(dir).toAbsolutePath.normalize
    val md = MessageDigest.getInstance("MD5")
    md.update(root.toString.getBytes("UTF-8"))
    if (Files.isDirectory(root)) {
      val s = Files.walk(root)
      val entries =
        try s.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(f => (s"${root.relativize(f)}", f))
          .toSeq.sortBy(_._1)
        finally s.close()
      entries.foreach { case (rel, f) =>
        val size = Files.size(f)
        md.update(
          s"$rel|$size|${Files.getLastModifiedTime(f).toMillis}\n"
            .getBytes("UTF-8"))
        probe(md, f, size)
      }
    }
    hex(md).take(12)
  }

  /** Tag of the RUNNING CODE: an artifact built by a previous build of
    * this library must not be reused by a newer one (its derivation
    * may have changed while the data did not — the consumers' oracles
    * would catch the divergence, but only after a confusing failure).
    * Hashes the code source location plus, for a classes directory,
    * the file count and max mtime (any recompile moves it); for a jar,
    * its size and mtime. Computed once per JVM — the code cannot
    * change under a running process.
    *
    * ANY failure to resolve the code source — not just a null one —
    * degrades to the per-process random tag (the old jvmTag
    * semantics): `Paths.get(url.toURI)` throws for non-file URLs
    * (nested/shaded jar `jar:file:/app.jar!/...`, container
    * classloaders), which are exactly the deployments the fallback
    * exists for, so the whole branch is Try-wrapped.
    */
  lazy val codeTag: String = {
    val md = MessageDigest.getInstance("MD5")
    val tagged = Try {
      val url = getClass.getProtectionDomain.getCodeSource.getLocation
      val p: Path = Paths.get(url.toURI)
      md.update(p.toString.getBytes("UTF-8"))
      if (Files.isDirectory(p)) {
        var n = 0L
        var maxM = 0L
        val s = Files.walk(p)
        try s.iterator().asScala.foreach { f =>
          if (Files.isRegularFile(f)) {
            n += 1
            val m = Files.getLastModifiedTime(f).toMillis
            if (m > maxM) maxM = m
          }
        } finally s.close()
        md.update(s"|$n|$maxM".getBytes("UTF-8"))
      } else if (Files.isRegularFile(p)) {
        md.update(
          s"|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}"
            .getBytes("UTF-8"))
      }
    }
    if (tagged.isFailure)
      // unresolvable code source (shaded launcher, container
      // classloader, null code source): a CONSTANT tag here would let
      // a new build silently reuse an old build's artifacts — degrade
      // to per-process freshness instead
      md.update(java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
    hex(md).take(8)
  }
}
