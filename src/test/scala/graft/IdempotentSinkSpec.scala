package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Exactly-once output under the at-least-once sink contract: replaying a
  * micro-batch must not duplicate rows, and a checkpointed restart must
  * deliver precisely the union of both runs' inputs.
  */
class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  test("replaying a batch leaves output identical (idempotent writes)") {
    val root = java.nio.file.Files.createTempDirectory("idem_out").toString + "/t"
    val batch = Seq(1L, 2L, 3L).toDF("v")
    graft.streaming.IdempotentSink.writeBatch(batch, root, 7L)
    graft.streaming.IdempotentSink.writeBatch(batch, root, 7L) // replay
    val rows = spark.read.parquet(root).select("v").as[Long].collect().sorted
    assert(rows.toSeq == Seq(1L, 2L, 3L), s"replay duplicated rows: ${rows.toSeq}")
  }

  test("checkpointed restart emits each input exactly once across runs") {
    val root = java.nio.file.Files.createTempDirectory("idem_out2").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("idem_ckpt").toString
    val src = MemoryStream[Long](spark)

    val q1 = graft.streaming.IdempotentSink.start(src.toDF(), root, ckpt)
    src.addData(1L to 5L: _*)
    q1.processAllAvailable()
    q1.stop()

    val q2 = graft.streaming.IdempotentSink.start(src.toDF(), root, ckpt)
    src.addData(6L to 10L: _*)
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(root).select("value").as[Long].collect().sorted
    assert(rows.toSeq == (1L to 10L), s"expected exactly 1..10, got ${rows.toSeq}")
    // The partition column is readable for incremental consumption.
    assert(spark.read.parquet(root).select("batch_id").distinct().count() >= 2)
  }
}
