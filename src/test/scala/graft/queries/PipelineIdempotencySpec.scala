package graft.queries

import graft.SparkSpec

/** "Each ETL step is an atomic operation" + idempotent re-runs
  * (README.md:30 of the reference): running the composed merge twice over
  * the same inputs must land the byte-identical table — the swap maps are
  * append-only, the dedup deterministic, and the CTAS replace atomic.
  */
class PipelineIdempotencySpec extends SparkSpec {

  test("merge_full_pipeline re-run lands the identical table") {
    val d = "/root/testdata/sf0.001"
    val once = PipelineQueries.mergeFullPipeline(spark, d).collect().toSeq
    val twice = PipelineQueries.mergeFullPipeline(spark, d).collect().toSeq
    assert(once.nonEmpty)
    assert(once == twice)
  }

  test("event_apply_columns re-run is deterministic end to end") {
    val d = "/root/testdata/sf0.001"
    val once = PipelineQueries.eventApplyColumns(spark, d).collect().toSeq
    val twice = PipelineQueries.eventApplyColumns(spark, d).collect().toSeq
    assert(once.nonEmpty)
    assert(once == twice)
  }
}
