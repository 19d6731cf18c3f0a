package graft

import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

/** Table-level contract of the snapshot commit protocol (r15 verdict
  * directive 5): snapshot-per-commit time travel, the parent-bound
  * two-writer conflict (loser retries and sees the winner's rows — no
  * lost update), and crash-window resume at the exact interleaving the
  * protocol's one window allows.
  */
class SnapshotTableSpec extends SparkSpec {

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snaptbl").toString + "/t"

  private def df(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("k", "v")
  }

  private def rowsOf(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    d.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet

  test("snapshot per commit: ids are dense, every snapshot stays " +
      "readable by id, head follows the last commit") {
    val t = tmpTable()
    assert(SnapshotTable.currentId(spark, t) === 0L)
    assert(SnapshotTable.readCurrent(spark, t).isEmpty)
    val id1 = SnapshotTable.commit(df(1L -> "a"), t, "w1")
    val id2 = SnapshotTable.commit(df(1L -> "a", 2L -> "b"), t, "w1")
    assert((id1, id2) === ((1L, 2L)))
    assert(SnapshotTable.snapshots(spark, t) === Seq(1L, 2L))
    assert(rowsOf(SnapshotTable.readSnapshot(spark, t, 1L)) === Set(1L -> "a"))
    assert(rowsOf(SnapshotTable.readSnapshot(spark, t, 2L))
      === Set(1L -> "a", 2L -> "b"))
    val Some((head, cur)) = SnapshotTable.readCurrent(spark, t)
    assert(head === 2L)
    assert(rowsOf(cur) === Set(1L -> "a", 2L -> "b"))
  }

  test("two-writer conflict: the second claim of an id fails with " +
      "CommitConflict and its staging is cleaned up") {
    val t = tmpTable()
    SnapshotTable.commit(df(1L -> "base"), t, "w0")
    // writer A stages for id 2 (has read head 1), then writer B commits
    // id 2 first — the exact race window, driven deterministically
    val stagingA = SnapshotTable.stageOnly(df(2L -> "from-A"), t, "wA", 2L)
    val idB = SnapshotTable.commit(df(2L -> "from-B"), t, "wB", 1L)
    assert(idB === 2L)
    val e = intercept[SnapshotTable.CommitConflict] {
      SnapshotTable.claim(spark, t, 2L, stagingA)
    }
    assert(e.attempted === 2L)
    // loser's staging must be gone (no orphan data), winner's data intact
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(stagingA)))
    assert(rowsOf(SnapshotTable.readSnapshot(spark, t, 2L))
      === Set(2L -> "from-B"))
  }

  test("lost-update guard: a commit parent-bound to a stale head " +
      "conflicts instead of silently overwriting the winner") {
    val t = tmpTable()
    SnapshotTable.commit(df(1L -> "base"), t, "w0")
    val staleParent = SnapshotTable.currentId(spark, t) // A reads head 1
    SnapshotTable.commit(df(9L -> "winner"), t, "wB")   // B lands 2
    intercept[SnapshotTable.CommitConflict] {
      // A derived from head 1 and must NOT land on top of head 2
      SnapshotTable.commit(df(8L -> "stale"), t, "wA", staleParent)
    }
    assert(rowsOf(SnapshotTable.readCurrent(spark, t).get._2)
      === Set(9L -> "winner"))
  }

  test("commitMerge: the loser retries against the winner's table and " +
      "the final state contains BOTH writers' rows") {
    val t = tmpTable()
    SnapshotTable.commit(df(1L -> "base"), t, "w0")
    // A's merge function injects B's commit between A's head read and
    // A's claim on its FIRST attempt only — forcing exactly one
    // conflict, so the retry path (not the happy path) is what lands
    var bDone = false
    val finalId = SnapshotTable.commitMerge(spark, t, "wA", cur => {
      val merged = cur.get.unionByName(df(7L -> "from-A"))
      if (!bDone) {
        bDone = true
        SnapshotTable.commitMerge(spark, t, "wB",
          c => c.get.unionByName(df(8L -> "from-B")))
      }
      merged
    })
    assert(finalId === 3L) // base=1, B=2, A's retry=3
    assert(rowsOf(SnapshotTable.readCurrent(spark, t).get._2)
      === Set(1L -> "base", 7L -> "from-A", 8L -> "from-B"))
  }

  test("crash-window resume: a committed marker whose staged data was " +
      "never renamed is finished by recover, invisibly to readers") {
    val t = tmpTable()
    SnapshotTable.commit(df(1L -> "a"), t, "w1")
    SnapshotTable.commit(df(1L -> "a", 2L -> "b"), t, "w1")
    // simulate the crash: undo commit 2's final rename, leaving marker +
    // staged data — the only window the protocol has
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val finalDir = new org.apache.hadoop.fs.Path(
      SnapshotTable.snapDir(t, 2L))
    val staged = new org.apache.hadoop.fs.Path(
      SnapshotTable.stagingDir(t, 2L, "w1"))
    assert(fs.rename(finalDir, staged))
    assert(!fs.exists(finalDir))
    // any entry point recovers: the read sees the COMPLETE snapshot
    assert(rowsOf(SnapshotTable.readCurrent(spark, t).get._2)
      === Set(1L -> "a", 2L -> "b"))
    assert(fs.exists(finalDir))
    // and a subsequent commit proceeds normally on top
    assert(SnapshotTable.commit(df(3L -> "c"), t, "w1") === 3L)
  }

  test("expire retains the newest snapshots and head survives") {
    val t = tmpTable()
    (1 to 4).foreach(i => SnapshotTable.commit(df(i.toLong -> "x"), t, "w"))
    SnapshotTable.expire(spark, t, keep = 2)
    assert(SnapshotTable.snapshots(spark, t) === Seq(3L, 4L))
    assert(SnapshotTable.currentId(spark, t) === 4L)
    intercept[IllegalArgumentException] {
      SnapshotTable.readSnapshot(spark, t, 1L)
    }
    assert(rowsOf(SnapshotTable.readSnapshot(spark, t, 4L)) === Set(4L -> "x"))
  }

  test("snapshot_diff reads the retained pair: both versions exist as " +
      "time-travelable snapshots after the operator runs") {
    val out = sources.Ingest.snapshotDiff(spark, sfDir)
    assert(out.count() > 0)
    val scratch = s"${sys.props("java.io.tmpdir")}/graft_snapdiff_" +
      java.lang.Integer.toHexString(sfDir.hashCode)
    assert(SnapshotTable.snapshots(spark, scratch) === Seq(1L, 2L))
    val v1 = SnapshotTable.readSnapshot(spark, scratch, 1L)
    val v2 = SnapshotTable.readSnapshot(spark, scratch, 2L)
    // the retained pair really is (documents, mutated documents)
    assert(v1.count() === Tables.documents(spark, sfDir).count())
    assert(v2.filter(col("text").endsWith(" [rev2]")).count() > 0)
  }
}
