package graft.storage

/** Pure path arithmetic for storage isolation.
  * Reference: jorvik/storage/isolation.py:31-83,125-187. No Spark needed —
  * golden-tested against the reference's parametrized cases
  * (test/storage/test_isolation.py:47-129). */
object IsolationPaths {

  private def collapseSlashes(s: String): String = s.replaceAll("/+", "/")

  /** Normalize the configured mount point: strip trailing slashes, default
    * to /mnt, force a leading slash (isolation.py:43-48). */
  def normalizeMountPoint(raw: String): String = {
    val stripped = raw.replaceAll("/+$", "")
    val mp = if (stripped.isEmpty) "/mnt" else stripped
    if (mp.startsWith("/")) mp else "/" + mp
  }

  /** Rewrite `path` under `<mountPoint>/<isolationFolder>/<context>/`
    * (isolation.py:31-64, minus the existence check which needs storage). */
  def createIsolationPath(mountPointRaw: String, isolationFolderRaw: String,
                          contextRaw: String, path: String): String = {
    val mountPoint = normalizeMountPoint(mountPointRaw)
    val folder = isolationFolderRaw.stripPrefix("/").stripSuffix("/")
    val context = contextRaw.stripPrefix("/").stripSuffix("/")
    val isoSubPath =
      (if (context.isEmpty) folder else s"$folder/$context") + "/"
    collapseSlashes(path.replace(mountPoint, s"$mountPoint/$isoSubPath"))
  }

  /** Strip the isolation folder + context substrings back out
    * (isolation.py:66-83 — plain substring removal, as the reference). */
  def removeIsolationPath(isolationFolder: String, context: String,
                          path: String): String = {
    def strip(s: String, part: String): String =
      if (part.isEmpty) s else s.replace(part, "")
    collapseSlashes(strip(strip(path, isolationFolder), context))
  }

  /** Human-readable table name: drop mount/dbfs parts, then
    * `first...penult/last` (>2 parts) / `first...last` (2) / `last` (1) /
    * "Unknown" (isolation.py:125-166). */
  def verboseTableName(mountPointRaw: String, pathRaw: String): String = {
    val path = pathRaw.stripSuffix("/")
    val mountPoint =
      if (mountPointRaw == null || mountPointRaw.isEmpty) "/mnt"
      else mountPointRaw
    val parts = path.split("/")
      .filter(p => p.nonEmpty && p != "mnt" && p != "dbfs" && p != mountPoint)
    parts.length match {
      case 0 => "Unknown"
      case 1 => parts(0)
      case 2 => parts(0) + "..." + parts(1)
      case _ => parts(0) + "..." + parts(parts.length - 2) + "/" + parts.last
    }
  }

  /** `"Reading: container...bronze/table ....... path: /mnt/…"` with the
    * dots padding the prefix to column 50 (isolation.py:168-187). */
  def verbosePathLine(mountPointRaw: String, path: String,
                      operation: String): String = {
    val prefix = s"$operation: ${verboseTableName(mountPointRaw, path)}"
    val dots = "." * math.max(1, 50 - prefix.length)
    s"$prefix $dots path: $path"
  }

  /** "Table was last updated: 2 days, 5 hours, 13 minutes ago."
    * (isolation.py:104-123). */
  def lastUpdatedMessage(elapsedSeconds: Long): String = {
    val days = elapsedSeconds / 86400
    val hours = (elapsedSeconds / 3600) % 24
    val minutes = (elapsedSeconds / 60) % 60
    s"Table was last updated: $days days, $hours hours, $minutes minutes ago.\n"
  }
}
