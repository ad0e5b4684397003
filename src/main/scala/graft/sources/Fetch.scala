package graft.sources

import java.io.{BufferedInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

/** S1/S2: driver-side fetch + unzip of a delta archive into a landing
  * directory — the JVM equivalent of the reference's download step
  * (`/root/reference/download.py:17-28`), closing the end-to-end
  * "delta zip -> landing dir -> ingestBatch" loop
  * (`airflow/dags/etl.py:173-188`).
  *
  * Deliberately OUT of the engine (SURVEY.md §2.1): a single-archive
  * fetch is driver work, not distributed work — the cluster takes over
  * at [[graft.streaming.Streams.ingestBatch]] on the landing dir. Only
  * entries matching `suffix` are extracted; entry names are sanitized
  * against zip-slip path escapes.
  */
object Fetch {

  /** Fetch `url` (any java.net URL scheme, e.g. file:// or https://)
    * to `destFile`, creating parent dirs. Returns the local path.
    * Connect/read timeouts are set so a stalled remote fails the
    * driver-side step instead of hanging it indefinitely. */
  def fetch(url: String, destFile: String,
      connectTimeoutMs: Int = 30000, readTimeoutMs: Int = 120000): Path = {
    val dest = Paths.get(destFile)
    Files.createDirectories(dest.getParent)
    val conn = java.net.URI.create(url).toURL.openConnection()
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    val in = new BufferedInputStream(conn.getInputStream)
    try Files.copy(in, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    dest
  }

  /** Extract `suffix`-matching entries of a zip into `landingDir`,
    * flattened to one directory (the reference's per-file landing
    * layout) with the entry's directory path folded into the filename
    * (`a/b.json` -> `a__b.json`); any residual name collision gets a
    * counter suffix, so no entry ever silently overwrites another.
    * Returns the extracted paths. */
  def unzip(zipFile: String, landingDir: String,
      suffix: String = ".json"): Seq[Path] = {
    val landing = Paths.get(landingDir)
    Files.createDirectories(landing)
    val zin = new ZipInputStream(
      new BufferedInputStream(Files.newInputStream(Paths.get(zipFile))))
    val out = Seq.newBuilder[Path]
    // seed with files already landed (possibly by a PREVIOUS archive
    // into the same dir) so the no-silent-overwrite guarantee holds
    // across calls, not just within one
    val taken = scala.collection.mutable.Set.empty[String]
    val existing = Files.list(landing)
    try existing.forEach(p => taken += p.getFileName.toString)
    finally existing.close()
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val parts = e.getName.split('/').filter(_.nonEmpty).toSeq
        // zip-slip guard per PATH COMPONENT: only a literal ".."
        // component is traversal; a filename merely containing dots
        // ("v5..1") is legitimate and must land
        val traversal = parts.exists(_ == "..")
        val name = parts.mkString("__")
        if (!e.isDirectory && name.endsWith(suffix) && !traversal) {
          // flattening can alias ("a/b.json" vs "a__b.json"): suffix a
          // counter instead of silently overwriting an earlier entry
          var unique = name
          var i = 1
          while (!taken.add(unique)) {
            unique = s"${name.stripSuffix(suffix)}.$i$suffix"
            i += 1
          }
          val target = landing.resolve(unique)
          val fos = new FileOutputStream(target.toFile)
          try zin.transferTo(fos) finally fos.close()
          out += target
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** The full S1+S2 step: fetch the archive and land its JSON files. */
  def fetchAndExtract(url: String, workDir: String,
      suffix: String = ".json"): Seq[Path] = {
    val zip = fetch(url, s"$workDir/archive.zip")
    unzip(zip.toString, s"$workDir/landing", suffix)
  }
}
