package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.ingest.{GraftConfig, Status}

/** The Kafka binding's canonicalization, exercised WITHOUT a broker:
  * crafted rows in the connector's exact wire shape (binary key/value,
  * topic/partition/offset/timestamp/timestampType) go through
  * [[KafkaSourceAdapter.canonicalize]] and then end-to-end into the
  * [[TableStateStore]] through the same `startBulkIngestFrom` pipeline
  * the spool test drives — after this, only the broker CONNECTION
  * itself remains unexercisable in the sandbox (see SourceAdapter
  * scaladoc).
  */
class KafkaAdapterSpec extends SparkSuite {

  // the connector's per-record output shape, as a crafted tuple
  private type Wire = (Array[Byte], Array[Byte], String, Int, Long,
    java.sql.Timestamp, Int)

  private def rec(off: Long, value: String): Wire = (
    s"key-$off".getBytes("UTF-8"),
    if (value == null) null else value.getBytes("UTF-8"),
    "ingest-requests", (off % 3).toInt, off,
    new java.sql.Timestamp(1700000000000L + off), 0)

  private def wireFrame(ms: MemoryStream[Wire]): DataFrame =
    ms.toDF().toDF("key", "value", "topic", "partition", "offset",
      "timestamp", "timestampType")

  test("crafted frame matches the connector wire schema field-for-field") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Wire]
    val got = wireFrame(ms).schema.map(f => (f.name, f.dataType))
    val want = KafkaSourceAdapter.wireSchema.map(f => (f.name, f.dataType))
    assert(got == want,
      "the spec's crafted rows drifted from the Kafka connector shape")
  }

  test("Kafka-shaped rows canonicalize and land in the table store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Wire]
    val adapter = new SourceAdapter {
      override def name: String = "kafka-crafted"
      override def requests(s: SparkSession): DataFrame =
        KafkaSourceAdapter.canonicalize(wireFrame(ms))
    }
    val engine = new IngestEngine(GraftConfig.bench, SystemSleeper)
    val proc = new StreamingProcessor(spark, engine)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-state-kafka").toString
    val store = new TableStateStore(spark, s"$stateDir/state", buckets = 8)
    val query = proc.startBulkIngestFrom(adapter, store)
    try {
      ms.addData(
        rec(0, """{"ingestion_id":"ing-k1","ids":[1,2,3,4,5,6,7],"priority":"HIGH","created_at":42}"""),
        // invalid payload: negative id — validate must drop it
        rec(1, """{"ingestion_id":"bad","ids":[-1],"priority":"LOW","created_at":44}"""),
        // tombstone: null value bytes (Kafka log-compaction delete)
        rec(2, null),
        // corrupt value bytes: PERMISSIVE from_json nulls the row
        // instead of killing the stream
        rec(3, "NOT { JSON ]["))
      query.processAllAvailable()
      val doc = store.statusOf("ing-k1").get
      assert(doc.batches.map(_.ids) ==
        Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L)),
        "canonicalized request must chunk exactly like every transport")
      assert(doc.status == Status.YetToStart)
      assert(store.statusOf("bad").isEmpty,
        "invalid payload must be filtered, same as the memory/spool paths")
      // the tombstone and the corrupt record produced NO state at all
      assert(store.latestBatches().select("ingestion_id").distinct()
        .collect().map(_.getString(0)).toSet == Set("ing-k1"))
      // a later micro-batch (new offsets) is consumed without restart
      ms.addData(rec(4,
        """{"ingestion_id":"ing-k2","ids":[9],"priority":"LOW","created_at":43}"""))
      query.processAllAvailable()
      assert(store.statusOf("ing-k2").get.batches.map(_.ids) ==
        Seq(Seq(9L)))
      // priority order holds across transports
      val top = store.pendingView()
        .select("ingestion_id").limit(1).head.getString(0)
      assert(top == "ing-k1")
    } finally query.stop()
  }
}
