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
          val df = q.fn(spark, sfDir)
          // execute first: under AQE, exchange/stage reuse only shows in the
          // FINAL adaptive plan, not the initial one (collect drives THIS
          // QueryExecution to its final plan; a write would plan a new one)
          df.collect()
          val s = df.queryExecution.executedPlan.toString
          println(s"\n==== $n (final adaptive plan) ====")
          println(s)
          val exchanges = s.linesIterator.count(_.contains("Exchange"))
          val reused = s.linesIterator.count(_.contains("Reused"))
          println(s"[explain] $n exchanges=$exchanges reused=$reused")
      }
    } finally spark.stop()
  }
}
