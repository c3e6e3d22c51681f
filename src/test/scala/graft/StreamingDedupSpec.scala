package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  test("dropSeen keeps the first occurrence of each key across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, String)] // (doc_id, text)
    val out = StreamingDedup.dropSeen(in.toDS())(key = _._2, order = _._1)
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // batch 1: two docs share text "x" — the id-minimal one survives
      in.addData(("a2", "x"), ("a1", "x"), ("b1", "y"))
      q.processAllAvailable()
      val b1 = spark.sql("select * from dedup_stream").as[(String, String)].collect().toSet
      assert(b1 == Set("a1" -> "x", "b1" -> "y"))
      // batch 2: "x" is already seen (state survives batches); "z" is new
      in.addData(("c1", "x"), ("d1", "z"))
      q.processAllAvailable()
      val b2 = spark.sql("select * from dedup_stream").as[(String, String)].collect().toSet
      assert(b2 == Set("a1" -> "x", "b1" -> "y", "d1" -> "z"))
    } finally q.stop()
  }

  test("dropSeen over content hashes dedups a document stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    case class Doc(id: Long, text: String)
    val in = MemoryStream[(Long, String)]
    val out = StreamingDedup.dropSeen(in.toDS())(
      key = d => java.util.Base64.getEncoder.encodeToString(
        graft.url.Signatures.md5(d._2.getBytes("UTF-8"))),
      order = d => f"${d._1}%019d")
    val q = out.writeStream.format("memory").queryName("dedup_hash_stream")
      .outputMode("append").start()
    try {
      in.addData((3L, "same body"), (1L, "same body"), (2L, "other"))
      q.processAllAvailable()
      in.addData((9L, "same body"), (10L, "third"))
      q.processAllAvailable()
      val ids = spark.sql("select * from dedup_hash_stream")
        .as[(Long, String)].collect().map(_._1).toSet
      assert(ids == Set(1L, 2L, 10L))
    } finally q.stop()
  }
}
