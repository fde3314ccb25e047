package graft.core

import java.nio.file.{Files, Path}

/** The one recursive-delete helper (previously four private copies in
  * TableStore / Replay / Bench / Sf1Soak — a symlink- or race-handling
  * fix must land once, not four times). `deleteIfExists` keeps it
  * tolerant of concurrent deleters; the stream is always closed. */
object Fs {
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
