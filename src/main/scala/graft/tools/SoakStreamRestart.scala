package graft.tools

import org.apache.spark.sql.functions._

/** Scratch soak: the kill/resume durability proof at events-table scale —
  * r11 gated `stream_restart_recovery` at 1× only (its fixture is 32 doc
  * files); this replays the same mechanics against the FULL amplified
  * events table: N parquet source files drained through a checkpointed
  * Structured Streaming query (AvailableNow, bounded files/trigger), a
  * poison row injected mid-drain KILLS the stream, late files arrive
  * during the outage, the disarmed restart resumes from the checkpoint —
  * and the sink (read through its transaction log) must hold EXACTLY the
  * batch answer: same row count, same order-free content fingerprint,
  * zero loss, zero duplication. Numbers land in SCALE.md; not part of
  * the library surface.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.SoakStreamRestart
  */
object SoakStreamRestart {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/soakdata/sfa3")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-soak")
    val src = tmp.resolve("src").toString
    val sink = tmp.resolve("sink").toString
    val ck = tmp.resolve("ck").toString

    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    // 56 pre-outage files + 8 written during the outage
    val t0 = System.nanoTime()
    ev.filter(pmod(col("event_id"), lit(8)) =!= 7).repartition(56)
      .write.parquet(src)
    val late = ev.filter(pmod(col("event_id"), lit(8)) === 7).repartition(8)
    val nTotal = ev.count()
    val tPrep = (System.nanoTime() - t0) / 1e9

    val schema = spark.read.parquet(src).schema
    // poison: one real source file, hit mid-drain (sorted-order file #40)
    val poisonFile = new java.io.File(src).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).sorted.apply(40)

    def run() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 8).parquet(src)
      .withColumn("uri", input_file_name())
      .withColumn("etype", graft.streaming.StreamingIngest
        .poisonCheck(col("uri"), col("event_type")))
      .select(col("event_id"), col("user_id"), col("etype"),
        unix_micros(col("ts")).as("ts_us"))
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

    val t1 = System.nanoTime()
    graft.streaming.StreamingIngest.poisonUri = Some(poisonFile)
    val crashed =
      try { run().awaitTermination(); false }
      catch {
        case t: Throwable if Iterator.iterate(t)(_.getCause)
          .takeWhile(_ != null).take(16)
          .exists(c => Option(c.getMessage).exists(_.contains("injected crash at"))) =>
          true
        case t: Throwable => throw t
      }
    require(crashed, "poison must kill the first drain")
    graft.streaming.StreamingIngest.poisonUri = None
    late.write.mode("append").parquet(src) // arrivals during the outage
    run().awaitTermination()
    val tDrain = (System.nanoTime() - t1) / 1e9

    def fingerprint(df: org.apache.spark.sql.DataFrame) = {
      // bit_xor: order-free, overflow-free (ANSI default would throw on
      // a 30M-row Long SUM); count catches cardinality drift xor cannot
      val r = df.agg(count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(event_id, user_id, etype, ts_us))").as("fp")).head
      (r.getLong(0), r.getLong(1))
    }
    val streamed = fingerprint(spark.read.parquet(sink))
    val batch = fingerprint(ev.select(col("event_id"), col("user_id"),
      col("event_type").as("etype"),
      unix_micros(col("ts")).as("ts_us")))
    println(f"[stream-soak] events=$nTotal crashedMidDrain=$crashed " +
      f"prep=$tPrep%.1fs drain=$tDrain%.1fs " +
      f"streamed=(${streamed._1},${streamed._2}) batch=(${batch._1},${batch._2}) " +
      f"exact=${streamed == batch}")
    require(streamed == batch, "kill/resume drain lost or duplicated rows")
    spark.stop()
  }
}
