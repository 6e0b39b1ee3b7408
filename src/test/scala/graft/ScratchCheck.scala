package graft

/** Throwaway local gate check: run named queries and their VALUES-literal
  * oracles both in Spark and diff. Not part of the suite.
  */
object ScratchCheck {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq("multimodal_audio_formats")
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      val got = q(spark, dir).collect().map(_.toString).sorted
      SparkEntry.oracleSql.get(n) match {
        case Some(sql) =>
          Tables.register(spark, dir)
          val want = spark.sql(sql).collect().map(_.toString).sorted
          val ok = got.sameElements(want)
          println(s"== $n: ${if (ok) "MATCH" else "MISMATCH"}")
          if (!ok) {
            println("-- got:");  got.foreach(println)
            println("-- want:"); want.foreach(println)
          }
        case None => println(s"== $n: no oracle; rows=${got.length}")
      }
    }
    spark.stop()
  }
}
