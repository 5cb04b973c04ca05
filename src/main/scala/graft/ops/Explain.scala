package graft.ops

import graft.{Registry, Sessions}

/** Diagnostic main: print the formatted physical plan of one or more
  * registered queries, plus a ReusedExchange / Exchange / PushedFilters
  * summary — the feedback loop for "explain and iterate until it's the
  * plan you'd want".
  *
  * Usage: runMain graft.ops.Explain <sfDir> <queryName> [<queryName> ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Registry.all.keys.toSeq.sorted
    val spark = Sessions.local()
    try names.foreach { n =>
      Registry.all.get(n) match {
        case None => println(s"== $n: not registered ==")
        case Some(q) =>
          // eager operators (persist/localCheckpoint pipelines) do real work
          // at construction time — time it separately from the final action
          val tc = System.nanoTime()
          val df = q.fn(spark, sfDir)
          val consSec = (System.nanoTime() - tc) / 1e9
          // execute first: under AQE, exchange/stage reuse only shows in the
          // FINAL adaptive plan, not the initial one (collect drives THIS
          // QueryExecution to its final plan; a write would plan a new one)
          val t0 = System.nanoTime()
          df.collect()
          val sec = (System.nanoTime() - t0) / 1e9
          val s = df.queryExecution.executedPlan.toString
          println(s"\n==== $n (final adaptive plan) ====")
          println(s)
          val exchanges = s.linesIterator.count(_.contains("Exchange"))
          val reused = s.linesIterator.count(_.contains("Reused"))
          println(f"[explain] $n exchanges=$exchanges reused=$reused construct=$consSec%.3f exec=$sec%.3f")
      }
    } finally spark.stop()
  }
}
