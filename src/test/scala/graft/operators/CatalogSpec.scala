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

  test("vacuumRetain: retained catalog cuts floor the stack's vacuum") {
    val cat = newRoot("graft_cat_vr")
    val stack = newRoot("graft_cat_vr_stack")
    TxSketchStack.init(spark, stack)
    for (b <- 0 to 3)
      assert(TxSketchStack.commitBatch(spark, stack,
        Seq(("k", b.toLong)).toDF("key", "user"), b.toLong, "key",
        "user", 4))
    // stack head = 4; catalog cut 0 pins v1, cut 1 pins v3
    Catalog.publish(spark, cat, Seq(("s", stack, 1L)))
    Catalog.publish(spark, cat, Seq(("s", stack, 3L)))
    // head-only retention: floor at v3
    assert(Catalog.vacuumRetain(spark, cat, "s", stack) == 1)
    // one cut back: the v1 pin floors it
    assert(Catalog.vacuumRetain(spark, cat, "s", stack, 1) == 3)
    // an unpinned stack imposes nothing
    assert(Catalog.vacuumRetain(spark, cat, "other", stack, 1) == 0)
    // the floor holds end to end: vacuum with the catalog retention,
    // then the OLDER pinned cut must still snapshot-read
    TxSketchStack.vacuum(spark, stack,
      Catalog.vacuumRetain(spark, cat, "s", stack, 1))
    assert(Manifest.readAt(spark, stack, 1L).isDefined,
      "vacuum retired a version a retained catalog cut pins")
    assert(Manifest.readAt(spark, stack, 0L).isEmpty,
      "vacuum must still retire versions below the catalog floor")
    assert(TxSketchStack.estimates(TxSketchStack.resolve(spark, stack,
      version = Some(1L))).collect().head.getLong(1) == 1L)
  }

  test("vacuumRetain: a tagged cut floors the vacuum past the version window") {
    val cat = newRoot("graft_cat_tagvr")
    val stack = newRoot("graft_cat_tagvr_stack")
    TxSketchStack.init(spark, stack)
    for (b <- 0 to 3)
      assert(TxSketchStack.commitBatch(spark, stack,
        Seq(("k", b.toLong)).toDF("key", "user"), b.toLong, "key",
        "user", 4))
    Catalog.publish(spark, cat, Seq(("s", stack, 1L))) // cut 0
    Catalog.publish(spark, cat, Seq(("s", stack, 3L))) // cut 1
    Catalog.publish(spark, cat, Seq(("s", stack, 4L))) // cut 2 (head)
    // head-only window: without a tag, only v4 retains
    assert(Catalog.vacuumRetain(spark, cat, "s", stack) == 0)
    // tagging cut 0 pulls its v1 pin back into the retention set,
    // though the cut is two versions below the window
    Catalog.tag(spark, cat, "old-release", 0L)
    assert(Catalog.vacuumRetain(spark, cat, "s", stack) == 3)
    TxSketchStack.vacuum(spark, stack,
      Catalog.vacuumRetain(spark, cat, "s", stack))
    assert(Manifest.readAt(spark, stack, 1L).isDefined,
      "vacuum retired the version the tagged release pins")
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

  test("branch / fastForward: staged pins land as one swap, fenced on the fork") {
    val main = newRoot("graft_cat_wap_main")
    val stg = newRoot("graft_cat_wap_stg")
    Catalog.publish(spark, main, Seq(("lex", "/tmp/lex", 3L)))
    Catalog.branch(spark, main, stg)
    // the branch inherits main's head pin set
    assert(Catalog.pinnedVersion(spark, stg, "lex") == 3L)
    // the wave stages a new cut; main is untouched until fast-forward
    Catalog.publish(spark, stg,
      Seq(("lex", "/tmp/lex", 5L), ("vec", "/tmp/vec", 1L)))
    assert(Catalog.pinnedVersion(spark, main, "lex") == 3L)
    val vMain = Catalog.fastForward(spark, main, stg)
    assert(vMain == 1L)
    assert(Catalog.pinnedVersion(spark, main, "lex") == 5L)
    assert(Catalog.pinnedVersion(spark, main, "vec") == 1L)
    // branching over an existing staging catalog refuses
    intercept[IllegalArgumentException] {
      Catalog.branch(spark, main, stg)
    }
  }

  test("fastForward fence: a publish that landed on main mid-audit conflicts") {
    val main = newRoot("graft_cat_ff_main")
    val stg = newRoot("graft_cat_ff_stg")
    Catalog.publish(spark, main, Seq(("lex", "/tmp/lex", 3L)))
    Catalog.branch(spark, main, stg)
    Catalog.publish(spark, stg, Seq(("lex", "/tmp/lex", 5L)))
    // a hotfix publish lands on main while the audit runs
    Catalog.publish(spark, main, Seq(("lex", "/tmp/lex", 4L)))
    intercept[Manifest.CommitConflict] {
      Catalog.fastForward(spark, main, stg)
    }
    // the fence preserved the hotfix — nothing was silently dropped
    assert(Catalog.pinnedVersion(spark, main, "lex") == 4L)
    // the clean retry: re-branch from the advanced head, re-stage
    val stg2 = newRoot("graft_cat_ff_stg2")
    Catalog.branch(spark, main, stg2)
    Catalog.publish(spark, stg2, Seq(("lex", "/tmp/lex", 5L)))
    Catalog.fastForward(spark, main, stg2)
    assert(Catalog.pinnedVersion(spark, main, "lex") == 5L)
    // a never-branched catalog cannot fast-forward (no fork point)
    val loose = newRoot("graft_cat_ff_loose")
    Catalog.publish(spark, loose, Seq(("lex", "/tmp/lex", 9L)))
    intercept[IllegalArgumentException] {
      Catalog.fastForward(spark, main, loose)
    }
  }

  test("self-vacuum: history retires below the floor, tags drag it down") {
    val cat = newRoot("graft_cat_sv")
    for (v <- 1L to 5L)
      Catalog.publish(spark, cat, Seq(("s", "/tmp/s", v)))
    // no tags: head-only window retires cuts 0-3
    val vs = Catalog.vacuum(spark, cat)
    assert(vs.deletedDirs == 4 && vs.deletedManifests == 4)
    assert(Manifest.readAt(spark, cat, 3L).isEmpty)
    assert(Catalog.pinnedVersion(spark, cat, "s") == 5L)
    // tagged floor: the tag keeps its cut (and everything above)
    val cat2 = newRoot("graft_cat_sv2")
    for (v <- 1L to 5L)
      Catalog.publish(spark, cat2, Seq(("s", "/tmp/s", v)))
    Catalog.tag(spark, cat2, "rel", 1L)
    Catalog.vacuum(spark, cat2)
    assert(Manifest.readAt(spark, cat2, 0L).isEmpty, "below the tag retires")
    assert(Manifest.readAt(spark, cat2, 1L).isDefined, "the tagged cut stays")
    assert(Manifest.readAt(spark, cat2, 3L).isDefined,
      "cuts above the dragged floor stay readable")
    assert(Catalog.pinnedVersion(spark, cat2, "s",
      Some(Catalog.resolveTag(spark, cat2, "rel"))) == 2L)
  }

  test("dropBranch: abandons a staging catalog, refuses a main") {
    val main = newRoot("graft_cat_db_main")
    val stg = newRoot("graft_cat_db_stg")
    Catalog.publish(spark, main, Seq(("lex", "/tmp/lex", 3L)))
    Catalog.branch(spark, main, stg)
    Catalog.publish(spark, stg, Seq(("lex", "/tmp/lex", 9L)))
    // the audit fails; the branch abandons whole
    Catalog.dropBranch(spark, stg)
    assert(Manifest.read(spark, stg).isEmpty, "the branch must be gone")
    assert(Catalog.pinnedVersion(spark, main, "lex") == 3L,
      "main is untouched by the abandoned branch")
    // a main catalog (no fork point) refuses loudly
    intercept[IllegalArgumentException] {
      Catalog.dropBranch(spark, main)
    }
    assert(Catalog.pinnedVersion(spark, main, "lex") == 3L)
  }

  test("tags: immutable named refs, loud on re-tag and unknown names") {
    val cat = newRoot("graft_cat_tags")
    Catalog.publish(spark, cat, Seq(("lex", "/tmp/lex", 3L)))
    Catalog.publish(spark, cat, Seq(("lex", "/tmp/lex", 4L)))
    Catalog.tag(spark, cat, "release-1", 0L)
    assert(Catalog.resolveTag(spark, cat, "release-1") == 0L)
    // the tag keeps resolving the old cut after later publishes
    assert(Catalog.pinnedVersion(spark, cat, "lex",
      Some(Catalog.resolveTag(spark, cat, "release-1"))) == 3L)
    intercept[IllegalStateException] {
      Catalog.tag(spark, cat, "release-1", 1L) // tags never move
    }
    intercept[IllegalArgumentException] {
      Catalog.resolveTag(spark, cat, "release-2") // unknown name
    }
    intercept[IllegalArgumentException] {
      Catalog.tag(spark, cat, "release-3", 99L) // uncommitted version
    }
    intercept[IllegalArgumentException] {
      Catalog.tag(spark, cat, "rel/../../etc", 0L) // path-shaped name
    }
  }
}
