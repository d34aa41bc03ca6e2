package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Catalog]] — the manifest of manifests. Load-bearing claims:
  * (1) a publish is atomic and versioned — readers resolve the last
  *     published pin set, never a torn one;
  * (2) time travel: an old catalog cut keeps serving its pin set
  *     (and through it, each stack's old version) after later
  *     publishes;
  * (3) the cross-process CAS carries over unchanged — a foreign
  *     history file makes a publish from the same cut lose loudly;
  * (4) lookups refuse quietly-wrong inputs (unknown stack, duplicate
  *     pins). */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("publish / pins / pinnedVersion / time travel") {
    val cat = newRoot("graft_cat_spec")
    val v0 = Catalog.publish(spark, cat,
      Seq(("lex", "/tmp/lex", 3L), ("vec", "/tmp/vec", 7L)))
    assert(v0 == 0L)
    assert(Catalog.pinnedVersion(spark, cat, "lex") == 3L)
    assert(Catalog.pinnedVersion(spark, cat, "vec") == 7L)
    val v1 = Catalog.publish(spark, cat,
      Seq(("lex", "/tmp/lex", 4L), ("vec", "/tmp/vec", 7L)))
    assert(v1 == 1L)
    // head moved; the old cut still resolves its own pin set
    assert(Catalog.pinnedVersion(spark, cat, "lex") == 4L)
    assert(Catalog.pinnedVersion(spark, cat, "lex", Some(v0)) == 3L)
    assert(Catalog.pins(spark, cat).count() == 2L)
    // unknown stack refuses loudly
    intercept[IllegalArgumentException] {
      Catalog.pinnedVersion(spark, cat, "nope")
    }
    // duplicate stack names refuse before anything is written
    intercept[IllegalArgumentException] {
      Catalog.publish(spark, cat,
        Seq(("lex", "/tmp/a", 1L), ("lex", "/tmp/b", 2L)))
    }
  }

  test("cross-process CAS: a foreign catalog history file wins") {
    val cat = newRoot("graft_cat_race")
    Catalog.publish(spark, cat, Seq(("lex", "/tmp/lex", 1L)))
    val st = Manifest.read(spark, cat).get
    // a second process derived the same next version and published its
    // history file, crashing before its pointer swap
    val foreign = st.copy(version = st.version + 1,
      batchId = st.batchId + 1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(cat, s"manifest.v=${foreign.version}"),
      foreign.render.getBytes("UTF-8"))
    intercept[Manifest.CommitConflict] {
      Catalog.publish(spark, cat, Seq(("lex", "/tmp/lex", 2L)))
    }
    // the loser rolled the winner's pointer forward (un-wedging the
    // catalog); a retry from the advanced head lands cleanly
    assert(Manifest.read(spark, cat).contains(foreign))
    val v = Catalog.publish(spark, cat, Seq(("lex", "/tmp/lex", 2L)))
    assert(v == foreign.version + 1)
    assert(Catalog.pinnedVersion(spark, cat, "lex") == 2L)
  }
}
