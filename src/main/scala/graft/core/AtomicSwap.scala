package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared crash-safe directory swap for every persisted-state writer
  * (merge sinks, fold sinks, watermark store, table compaction).
  *
  * Protocol: write the complete replacement to a side path, then
  * [[publish]] — move the live directory aside as the backup, rename
  * the replacement in, retire the backup. Never delete-then-rename: a
  * complete copy exists under one of the three names at every
  * interruption point, and [[heal]] restores the backup when a crash
  * landed between the two renames.
  *
  * Hadoop `FileSystem`s report most failures with a `false` return,
  * not an exception, so every mutation here is checked: a failed
  * rename must surface as an error instead of (a) reporting a
  * successful swap, or worse (b) proceeding to retire a backup that is
  * still the only copy of the data.
  */
object AtomicSwap {

  /** Raise when a Hadoop FS mutation reports failure by boolean — the
    * one checked-rename helper every swap site shares. */
  private[graft] def checked(ok: Boolean, what: String, path: Path): Unit =
    if (!ok) throw new java.io.IOException(s"$what failed for $path")

  /** Restore `target` from `backup` if a previous [[publish]] was cut
    * between its two renames. Call before any read of `target`. */
  def heal(fs: FileSystem, target: Path, backup: Path): Unit =
    if (!fs.exists(target) && fs.exists(backup))
      checked(fs.rename(backup, target), "heal: restore backup", target)

  /** Swap `tmp` — a COMPLETE replacement, fully written and closed —
    * into `target`, using `backup` as the crash-window copy. */
  def publish(fs: FileSystem, target: Path, tmp: Path, backup: Path): Unit = {
    if (fs.exists(backup)) // stale backup from an earlier healed crash
      checked(fs.delete(backup, true), "retire stale backup", backup)
    if (fs.exists(target))
      checked(fs.rename(target, backup), "move live dir aside", target)
    checked(fs.rename(tmp, target), "publish replacement", target)
    if (fs.exists(backup))
      checked(fs.delete(backup, true), "retire backup", backup)
  }

  /** Best-effort recursive delete of a LOCAL temp tree (the shared
    * cleanup for scratch work dirs — bench fixtures, stress runs).
    * Does not follow symlinks out of the tree (listFiles returns the
    * link itself; delete removes the link, not its target). */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}
