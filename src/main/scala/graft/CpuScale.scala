package graft
import org.apache.spark.sql.SparkSession
object CpuScale {
  def session(cores: Int) = {
    val s = SparkSession.builder().master(s"local[$cores]").appName(s"cpu-$cores")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  def work(spark: SparkSession): Double = {
    import spark.implicits._
    val t0 = System.nanoTime()
    spark.range(0, 8000000000L, 1, 128).map { i =>
      var x = i * 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x ^ (x >>> 27)
    }.filter(_ == 42L).count()
    (System.nanoTime() - t0) / 1e9
  }
  def main(args: Array[String]): Unit = {
    val w = session(32); work(w); w.stop()
    for (c <- Seq(2, 8, 2, 8)) {
      val s = session(c); println(f"[cpu] local[$c]: ${work(s)}%.2f s"); s.stop()
    }
  }
}
