package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.Deletes

class DeletesSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("delvec").toString + "/t"
    spark.range(0, 1000)
      .select($"id", ($"id" % 10).as("bucket"), ($"id" * 3).as("v"))
      .repartition(4).write.parquet(dir)
    dir
  }

  private def dataFileStamps(dir: String): Map[String, (Long, Long)] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(dir)).filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> (s.getLen, s.getModificationTime)).toMap
  }

  test("deleteWhere thins the live view without touching data files") {
    val dir = freshTable()
    val before = dataFileStamps(dir)
    val n = Deletes.deleteWhere(spark, dir, col("bucket") === 3)
    assert(n == 100)
    assert(Deletes.readApplyingDeletes(spark, dir).count() == 900)
    assert(Deletes.readApplyingDeletes(spark, dir)
      .filter($"bucket" === 3).count() == 0)
    // the deletion-vector contract: every data file byte-identical
    assert(dataFileStamps(dir) == before)
    // untouched rows keep their values
    assert(Deletes.readApplyingDeletes(spark, dir)
      .agg(sum($"v")).as[Long].head() ==
      (0L until 1000L).filter(_ % 10 != 3).map(_ * 3).sum)
  }

  test("stacked deletes accumulate; replayed predicates are no-ops") {
    val dir = freshTable()
    assert(Deletes.deleteWhere(spark, dir, col("bucket") === 3) == 100)
    assert(Deletes.deleteWhere(spark, dir, col("id") < 50) == 45) // 5 already gone
    assert(Deletes.deleteWhere(spark, dir, col("bucket") === 3) == 0) // replay
    assert(Deletes.deletedCount(spark, dir) == 145)
    assert(Deletes.readApplyingDeletes(spark, dir).count() == 855)
  }

  test("materializeDeletes folds the log in and retires it") {
    val dir = freshTable()
    Deletes.deleteWhere(spark, dir, col("bucket") === 3)
    val survivors = Deletes.materializeDeletes(spark, dir)
    assert(survivors == 900)
    // plain read (no delete application) now equals the live view
    assert(spark.read.parquet(dir).count() == 900)
    assert(spark.read.parquet(dir).filter($"bucket" === 3).count() == 0)
    assert(Deletes.deletedCount(spark, dir) == 0)
    // and the table is still deletable afterwards
    assert(Deletes.deleteWhere(spark, dir, col("bucket") === 4) == 100)
    assert(Deletes.readApplyingDeletes(spark, dir).count() == 800)
  }

  test("mid-swap crash recovery: missing table dir promotes the original") {
    val dir = freshTable()
    Deletes.deleteWhere(spark, dir, col("bucket") === 3)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: table renamed aside, tmp never promoted
    require(fs.rename(new Path(dir), new Path(dir + "__mat_old")))
    val survivors = Deletes.materializeDeletes(spark, dir)
    assert(survivors == 900)
    assert(spark.read.parquet(dir).count() == 900)
  }

  test("read of an undeleted table is a plain scan") {
    val dir = freshTable()
    assert(Deletes.readApplyingDeletes(spark, dir).count() == 1000)
    assert(Deletes.deletedCount(spark, dir) == 0)
  }
}
