package graft

/** Key-at-a-time bench server (r12, the r11 verdict's item 5): the
  * Spark half of the INTERLEAVED paired ledger. Two rounds in a row
  * needed a "host weather" paragraph because the Spark sweep and the
  * DuckDB sweep ran in different minutes and the paired ratio absorbed
  * ±30% of window drift — so tools/bench_paired.py now drives both
  * engines per-key in lockstep: it asks this server to time key k
  * (same warmed session + min-of-2 discipline as [[Bench]]), then times
  * DuckDB's oracle SQL for k immediately after, within the same
  * seconds of the same host window.
  *
  * Protocol (line-oriented over stdin/stdout, JSON out):
  *   → (after warmup) {"ready":true,"warm_fails":N,"keys":[...]}
  *   ← <key>\n        → {"key":"<key>","sec":T} or {...,"err":"Cls"}
  *   ← EXIT\n         → session stops, process exits 0.
  */
object BenchServer {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir, warmFails) = Bench.warmedSession()
    val keys = SparkEntry.queries.keys.toSeq.sorted
    val keyList = keys.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"ready":true,"warm_fails":$warmFails,"sf":"$sfDir","keys":$keyList}""")
    Console.out.flush()
    var line = scala.io.StdIn.readLine()
    while (line != null && line.trim != "EXIT") {
      val key = line.trim
      if (key.nonEmpty) {
        SparkEntry.queries.get(key) match {
          case None =>
            println(s"""{"key":"$key","err":"unknown_key"}""")
          case Some(fn) =>
            val (t, e) = Bench.timeKey(spark, sfDir, fn)
            val es = e.map(c => s""","err":"$c"""").getOrElse("")
            println(s"""{"key":"$key","sec":$t$es}""")
        }
        Console.out.flush()
      }
      line = scala.io.StdIn.readLine()
    }
    spark.stop()
  }
}
