package graft.queries

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

/** Content-keyed, cross-JVM cache for harness fixture staging.
  *
  * Several oracle-gated queries exercise PHYSICAL layouts (bucketed fact
  * tables, streaming page files). The layout write is part of the
  * operator's 100 TB story — paid once, amortized over every read — but
  * re-paying it on every bench pass mis-attributes write cost to the
  * read-side query (the round-6 q50 number was ~90% table-write). The
  * cache keys the staged directory on the SOURCE table files
  * (name + size + mtime), so a testdata regeneration invalidates it
  * automatically; builds race safely across processes (build into a
  * temp sibling, atomic rename, losers discard).
  *
  * Only the deterministic page/table FILES are cached. Run-scoped state
  * (stream checkpoints, memory-sink names) stays in fresh temp dirs —
  * a reused checkpoint would make the second drain a no-op.
  */
object FixtureCache {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Signature of one source table path (file or directory of files). */
  private def sig(p: Path): String =
    if (!Files.exists(p)) s"${p.getFileName}:absent"
    else if (Files.isDirectory(p)) {
      val st = Files.list(p)
      try st.sorted().toArray.map { f =>
        val fp = f.asInstanceOf[Path]
        s"${fp.getFileName}:${Files.size(fp)}:${Files.getLastModifiedTime(fp).toMillis}"
      }.mkString(",")
      finally st.close()
    } else s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val st = Files.list(p)
      try st.forEach(c => deleteRecursively(c))
      finally st.close()
    }
    Files.deleteIfExists(p)
  }

  /** Directory containing fixture `tag` staged from `tables` under sf
    * dir `d`; `build` runs at most once per (tag, version, source
    * content).
    *
    * `tag` must be GLOBALLY unique across every call site: the key
    * cannot see the builder, so two builders sharing a tag (and
    * source tables) silently serve each other's bytes — the
    * round-16 "spledger" collision (span ledger vs split ledger)
    * surfaced exactly this way, as a missing-subtree failure at the
    * second call site. Grep existing tags before adding one.
    *
    * `version` is the call site's BUILDER version and is part of the
    * cache key: the key cannot see the build lambda's logic, so an
    * edited builder would otherwise silently serve the previous run's
    * stale fixture from the same machine — an oracle-gate evasion
    * hazard. Bump the version whenever the staged bytes the builder
    * produces change (schema, paging, format); leave it when only the
    * source tables change (the content signature already covers that).
    *
    * A failed build deletes its partial temp directory before
    * rethrowing — correctness never depended on it (no READY marker),
    * but repeated failures must not accumulate orphaned output dirs. */
  def cached(d: String, tag: String, version: Int, tables: Seq[String])
            (build: Path => Unit): Path = {
    val content = tables.map(t => sig(Paths.get(d, s"$t.parquet"))).mkString("|")
    val key = md5hex(s"$tag|v$version|$d|$content").take(16)
    val root = Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_fx_${tag}_$key")
    if (!Files.exists(root.resolve("_GRAFT_READY"))) {
      val tmp = Files.createTempDirectory(root.getParent, s".graft_fx_$tag")
      try {
        build(tmp)
        Files.createFile(tmp.resolve("_GRAFT_READY"))
      } catch { case e: Throwable =>
        deleteRecursively(tmp)
        throw e
      }
      try Files.move(tmp, root, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileSystemException =>
        deleteRecursively(tmp) // lost the build race; the winner's dir is ready
      }
    }
    root
  }

  /** Stage a MUTABLE copy of a cached fixture subtree: gates that
    * mutate state a builder produced (the manifest stacks — deletes,
    * upserts, compactions, vacuums) copy the deterministic drained
    * fixture into their run-scoped stage instead of re-paying the
    * drain, exactly the read-side/write-side attribution the cache
    * exists for. Plain file copy — the fixtures are KB..MB-scale. */
  def copyInto(src: Path, dst: Path): Unit = {
    if (Files.isDirectory(src)) {
      Files.createDirectories(dst)
      val st = Files.list(src)
      try st.forEach(c => copyInto(c.asInstanceOf[Path],
        dst.resolve(c.asInstanceOf[Path].getFileName)))
      finally st.close()
    } else if (src.getFileName.toString != "_GRAFT_READY")
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
  }
}
