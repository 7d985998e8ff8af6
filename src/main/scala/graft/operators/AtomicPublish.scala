package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Pluggable atomic publish-if-absent — the single primitive
  * [[ManifestTable]]'s commit protocol needs from storage. Everything
  * else in the manifest stack (optimistic merge, copy-on-write
  * delete, exactly-once streaming append, vacuum) is
  * filesystem-agnostic Hadoop FS calls; only the COMMIT POINT —
  * "make this fully-written file visible at `dest` iff nothing is
  * there yet, atomically" — differs per store, so only it is a seam.
  *
  * Contract ([[ManifestTableSpec]]'s multi-writer stress pins it):
  *  - no reader may ever observe a partially-written `dest` — the
  *    publish is complete-or-absent;
  *  - of N concurrent publishes to the same `dest`, AT MOST ONE
  *    returns true; the rest return false (and the committed bytes
  *    are exactly one caller's `src`, never interleaved);
  *  - a false return leaves `src` for the caller to clean up.
  */
trait AtomicPublish {

  /** Publish the fully-written file at `src` as `dest` iff `dest`
    * does not already exist. True = this call made `dest` visible;
    * false = another writer won. Implementations may either move
    * `src` (rename-style) or copy its bytes (PUT-style) — the caller
    * deletes `src` afterwards if it still exists. */
  def publish(fs: FileSystem, src: Path, dest: Path): Boolean
}

object AtomicPublish {

  /** Object-store schemes where rename is COPY+DELETE (or eventually
    * consistent), not an atomic metadata op — handing them
    * [[RenameIfAbsent]] would silently break the commit protocol, so
    * [[forFs]] REFUSES them instead: the deployment must install its
    * conditional-PUT publisher via [[ManifestTable.usePublisher]].
    * (abfs/abfss are absent deliberately: ADLS Gen2 renames are
    * atomic in the metadata service, like HDFS.) */
  val UnsafeRenameSchemes: Set[String] =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "oss", "cos", "swift")

  /** The FS-appropriate default primitive:
    *  - `file:` → [[LocalLink]] (POSIX `link(2)` — atomic and
    *    fails-if-exists on every local filesystem, which plain
    *    local rename is NOT: `rename(2)` silently overwrites);
    *  - object-store schemes with non-atomic rename → REFUSED, loudly
    *    ([[UnsafeRenameSchemes]]) — a user deploying on S3A/GCS
    *    without reading this scaladoc must get an error, not a
    *    broken commit protocol;
    *  - anything else → [[RenameIfAbsent]] (HDFS-style no-overwrite
    *    rename, atomic in the NameNode).
    * An object-store deployment registers its own [[AtomicPublish]]
    * doing a conditional PUT (`If-None-Match: *`) of `src`'s bytes —
    * the one storage call with the same at-most-one-winner guarantee
    * there — via [[ManifestTable.usePublisher]] (the PUT-style
    * contract — copy bytes, at-most-one-winner, loser keeps `src` —
    * is pinned end-to-end by ManifestTableSpec's multi-writer stress
    * under a conditional-PUT test double). */
  def forFs(fs: FileSystem): AtomicPublish = {
    val scheme = fs.getScheme
    if (scheme == "file") LocalLink
    else if (UnsafeRenameSchemes(scheme))
      throw new IllegalArgumentException(
        s"scheme '$scheme' has no atomic no-overwrite rename (rename is " +
          "copy+delete there) — install a conditional-PUT AtomicPublish " +
          "via ManifestTable.usePublisher for this store")
    else RenameIfAbsent
  }

  /** Local-filesystem primitive: hard-link `src` to `dest`.
    * `link(2)` is the only portable local call that is BOTH atomic
    * and fails-if-exists (EEXIST) — local `rename(2)` overwrites, and
    * exists-then-rename has a lost-commit window under the
    * multi-writer stress this table supports. The java.nio drop-down
    * is deliberate and scoped here: Hadoop's RawLocalFileSystem
    * exposes no no-overwrite rename, and this object IS the
    * local-FS-specific instance of the seam. */
  object LocalLink extends AtomicPublish {
    def publish(fs: FileSystem, src: Path, dest: Path): Boolean = {
      val s = java.nio.file.Paths.get(src.toUri.getPath)
      val d = java.nio.file.Paths.get(dest.toUri.getPath)
      try { java.nio.file.Files.createLink(d, s); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    }
  }

  /** HDFS-family primitive: `FileSystem.rename` with no overwrite
    * flag, which on HDFS (and ABFS) is atomic in the metadata service
    * and returns false when `dest` exists. The `exists` pre-check is
    * a fast-path, not the guarantee — the rename itself arbitrates
    * the race. NOT safe on raw local FS (local rename overwrites —
    * that scheme routes to [[LocalLink]]) or S3A (rename is
    * copy+delete — object stores need the conditional-PUT
    * implementation). */
  object RenameIfAbsent extends AtomicPublish {
    def publish(fs: FileSystem, src: Path, dest: Path): Boolean =
      !fs.exists(dest) && fs.rename(src, dest)
  }
}
