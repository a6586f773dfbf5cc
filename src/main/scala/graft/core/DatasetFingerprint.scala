package graft.core

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

/** Content-addressed tags for session-persisted artifacts
  * ([[graft.analytics.SessionArtifact]], NearDupArtifact): an artifact
  * root is keyed by (code tag, dataset fingerprint), so a RESTARTED
  * session reuses last night's published tables iff both the data and
  * the building code are unchanged — the production nightly-artifact
  * semantics — while any change to either moves the root and forces a
  * rebuild. This replaces the per-process random jvmTag, whose
  * staleness safety came from never reusing anything.
  *
  * The dataset fingerprint hashes the (relative path, size, mtime) of
  * every regular file under the dataset dir — the same cheap probe a
  * lake catalog's snapshot id provides. It deliberately does NOT read
  * file contents: a multi-TB dataset must fingerprint in milliseconds,
  * and any content rewrite that preserves size AND mtime to the
  * millisecond is outside the rig's threat model (a real deployment
  * keys on the table format's snapshot id instead — same contract,
  * same swap-in point).
  */
object DatasetFingerprint {

  private def hex(md: MessageDigest): String =
    md.digest().map(b => f"${b & 0xff}%02x").mkString

  /** Fingerprint of the dataset at `dir`: stable across JVMs while
    * the files are unchanged; moves on any file add/remove/resize/
    * touch. Recomputed per call (never cached) so an in-session data
    * change is seen by the next artifact build.
    */
  def of(dir: String): String = {
    val root = Paths.get(dir).toAbsolutePath.normalize
    val md = MessageDigest.getInstance("MD5")
    md.update(root.toString.getBytes("UTF-8"))
    if (Files.isDirectory(root)) {
      val s = Files.walk(root)
      val entries =
        try s.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map { f =>
            s"${root.relativize(f)}|${Files.size(f)}|" +
              s"${Files.getLastModifiedTime(f).toMillis}"
          }.toSeq.sorted
        finally s.close()
      entries.foreach(e => md.update((e + "\n").getBytes("UTF-8")))
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
    */
  lazy val codeTag: String = {
    val md = MessageDigest.getInstance("MD5")
    val src = Option(getClass.getProtectionDomain)
      .flatMap(d => Option(d.getCodeSource))
      .flatMap(s => Option(s.getLocation))
    src match {
      case Some(url) =>
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
      case None =>
        // no code source (shaded launcher, container classloader): a
        // CONSTANT tag here would let a new build silently reuse an
        // old build's artifacts — degrade to per-process freshness
        // (the old jvmTag semantics) instead
        md.update(java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
    }
    hex(md).take(8)
  }
}
