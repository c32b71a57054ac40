package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("documents corpus is pure ASCII (precondition of the mm_frame_hashes oracle)") {
    // The Spark side slices the binary payload by BYTES; the DuckDB oracle
    // slices VARCHAR by CHARACTERS (no blob slicing in DuckDB). They agree
    // iff the corpus is ASCII — this test turns a corpus change into a loud
    // failure instead of a silent frame-boundary divergence.
    val d = Tables.documents(spark, SfDir)
    val nonAscii = d.where(length(col("text")) =!= octet_length(col("text"))).count()
    assert(nonAscii == 0, s"$nonAscii non-ASCII docs — byte/char frame slicing diverges")
  }

  test("frame sampling covers every payload byte exactly once") {
    val withP = Multimodal.withPayload(Tables.documents(spark, SfDir).limit(50))
    val frames = Multimodal.frameHashes(withP, frameBytes = 256)
    val perDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"), first("n_bytes").as("n_bytes"))
      .collect()
    perDoc.foreach { r =>
      val expected = math.ceil(r.getLong(2).toDouble / 256).toLong
      assert(r.getLong(1) == expected)
    }
  }
}
