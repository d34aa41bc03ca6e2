package graft.queries

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the content-keyed fixture cache behind q50 and the
  * streaming page fixtures: build-once per (tag, source content),
  * automatic invalidation when the source tables change, and a READY
  * marker that gates readers. */
class FixtureCacheSpec extends AnyFunSuite {

  test("builds once per content key; same key returns the staged dir without rebuilding") {
    val d = Files.createTempDirectory("fxsrc")
    Files.writeString(d.resolve("t.parquet"), "v1")
    var builds = 0
    def get() = FixtureCache.cached(d.toString, "spec", Seq("t")) { tmp =>
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
    def get() = FixtureCache.cached(d.toString, "spec", Seq("t")) { tmp =>
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

  test("distinct tags never share a staging dir even over identical sources") {
    val d = Files.createTempDirectory("fxsrc")
    Files.writeString(d.resolve("t.parquet"), "v1")
    val a = FixtureCache.cached(d.toString, "tagA", Seq("t"))(tmp =>
      Files.writeString(tmp.resolve("p"), "a"))
    val b = FixtureCache.cached(d.toString, "tagB", Seq("t"))(tmp =>
      Files.writeString(tmp.resolve("p"), "b"))
    assert(a != b)
    assert(Files.readString(a.resolve("p")) == "a")
    assert(Files.readString(b.resolve("p")) == "b")
  }

  test("a missing source table is a distinct (but stable) key, not an error") {
    val d = Files.createTempDirectory("fxsrc")
    var builds = 0
    def get() = FixtureCache.cached(d.toString, "spec", Seq("absent")) { tmp =>
      builds += 1
      Files.writeString(tmp.resolve("p"), "x")
    }
    assert(get() == get() && builds == 1)
  }
}
