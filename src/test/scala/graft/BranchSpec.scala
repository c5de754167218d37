package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LakeTable

/** Shallow-clone deletion-vector pinning and branch/WAP lifecycle. */
class BranchSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val root = s"${operators.Lakehouse.scratch}/spec_branch"

  test("shallow clone of a MOR table pins deletion-vector state (deleted rows stay deleted)") {
    val src = s"$root/dvclone_src"
    val dst = s"$root/dvclone_dst"
    LakeTable.create(spark, src, spark.range(100).toDF("k"))
    LakeTable.deleteMor(spark, src, col("k") % 2 === 0) // 50 live
    assert(LakeTable.read(spark, src).count() == 50L)
    LakeTable.shallowClone(spark, src, dst)
    // the clone must see the MOR-deleted state, not the raw files
    assert(LakeTable.read(spark, dst).count() == 50L,
      "clone resurrected MOR-deleted rows")
    // and further source deletes must NOT leak into the pinned clone
    LakeTable.deleteMor(spark, src, col("k") === 1L)
    assert(LakeTable.read(spark, src).count() == 49L)
    assert(LakeTable.read(spark, dst).count() == 50L)
  }

  test("MOR delete on a clone marks shared absolute-dir files without touching the source") {
    val src = s"$root/dvclone_src2"
    val dst = s"$root/dvclone_dst2"
    LakeTable.create(spark, src, spark.range(100).toDF("k"))
    val cloneV = LakeTable.shallowClone(spark, src, dst)
    LakeTable.deleteMor(spark, dst, col("k") < 10)
    assert(LakeTable.read(spark, dst).count() == 90L)
    assert(LakeTable.read(spark, src).count() == 100L, "clone MOR delete leaked into source")
    // clone time travel (to the clone commit) still sees pre-delete state
    assert(LakeTable.read(spark, dst, Some(cloneV)).count() == 100L)
  }
}
