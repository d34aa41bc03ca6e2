package graft.queries

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the content-keyed fixture cache behind q50 and the
  * streaming page fixtures: build-once per (tag, version, source
  * content), automatic invalidation when the source tables OR the
  * builder version change, a READY marker that gates readers, and
  * cleanup of partial output when a build throws. */
class FixtureCacheSpec extends AnyFunSuite {

  test("builds once per content key; same key returns the staged dir without rebuilding") {
    val d = Files.createTempDirectory("fxsrc")
    Files.writeString(d.resolve("t.parquet"), "v1")
    var builds = 0
    def get() = FixtureCache.cached(d.toString, "spec", 1, Seq("t")) { tmp =>
      builds += 1
      Files.writeString(tmp.resolve("payload"), "out")
    }
    val r1 = get()
    val r2 = get()
    assert(builds == 1 && r1 == r2)
    assert(Files.exists(r1.resolve("_GRAFT_READY")))
    assert(Files.readString(r1.resolve("payload")) == "out")
  }

  test("source content change produces a new key and a rebuild") {
    val d = Files.createTempDirectory("fxsrc")
    val src = d.resolve("t.parquet")
    Files.writeString(src, "v1")
    var builds = 0
    def get() = FixtureCache.cached(d.toString, "spec", 1, Seq("t")) { tmp =>
      builds += 1
      Files.writeString(tmp.resolve("payload"), s"build$builds")
    }
    val r1 = get()
    Files.writeString(src, "v2-with-different-size") // size + mtime change
    val r2 = get()
    assert(builds == 2 && r1 != r2)
    // the old staging survives (other sf dirs may still point at it);
    // the new one carries the new payload
    assert(Files.readString(r2.resolve("payload")) == "build2")
  }

  test("an edited builder (bumped version) misses the old key and restages") {
    // the cache key cannot see the build lambda's code, so an edited
    // builder that kept tag AND version would be served the stale
    // fixture — the version bump is the discipline that prevents it,
    // and this case proves the bump actually changes the key
    val d = Files.createTempDirectory("fxsrc")
    Files.writeString(d.resolve("t.parquet"), "v1")
    val v1 = FixtureCache.cached(d.toString, "spec", 1, Seq("t"))(tmp =>
      Files.writeString(tmp.resolve("payload"), "old-builder"))
    val v2 = FixtureCache.cached(d.toString, "spec", 2, Seq("t"))(tmp =>
      Files.writeString(tmp.resolve("payload"), "new-builder"))
    assert(v1 != v2)
    assert(Files.readString(v1.resolve("payload")) == "old-builder")
    assert(Files.readString(v2.resolve("payload")) == "new-builder")
  }

  test("a throwing build deletes its partial temp dir and leaves no READY marker") {
    val d = Files.createTempDirectory("fxsrc")
    Files.writeString(d.resolve("t.parquet"), "v1")
    val boom = intercept[RuntimeException] {
      FixtureCache.cached(d.toString, "speccrash", 1, Seq("t")) { tmp =>
        Files.writeString(tmp.resolve("partial"), "junk")
        throw new RuntimeException("builder failed")
      }
    }
    assert(boom.getMessage == "builder failed")
    val tmpRoot = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val leftovers = Files.list(tmpRoot)
    try assert(!leftovers.anyMatch(p =>
      p.getFileName.toString.startsWith(".graft_fx_speccrash")))
    finally leftovers.close()
    // a retry with a working builder succeeds on the same key
    var builds = 0
    val ok = FixtureCache.cached(d.toString, "speccrash", 1, Seq("t")) { tmp =>
      builds += 1
      Files.writeString(tmp.resolve("payload"), "recovered")
    }
    assert(builds == 1 && Files.readString(ok.resolve("payload")) == "recovered")
  }

  test("distinct tags never share a staging dir even over identical sources") {
    val d = Files.createTempDirectory("fxsrc")
    Files.writeString(d.resolve("t.parquet"), "v1")
    val a = FixtureCache.cached(d.toString, "tagA", 1, Seq("t"))(tmp =>
      Files.writeString(tmp.resolve("p"), "a"))
    val b = FixtureCache.cached(d.toString, "tagB", 1, Seq("t"))(tmp =>
      Files.writeString(tmp.resolve("p"), "b"))
    assert(a != b)
    assert(Files.readString(a.resolve("p")) == "a")
    assert(Files.readString(b.resolve("p")) == "b")
  }

  test("a missing source table is a distinct (but stable) key, not an error") {
    val d = Files.createTempDirectory("fxsrc")
    var builds = 0
    def get() = FixtureCache.cached(d.toString, "spec", 1, Seq("absent")) { tmp =>
      builds += 1
      Files.writeString(tmp.resolve("p"), "x")
    }
    assert(get() == get() && builds == 1)
  }
}
