package graft.tools

import org.apache.spark.sql.functions._

/** One-off diagnostic: cross-family perceptual pairs at a given SF —
  * the m05 family-min oracle's validity boundary. */
object M05Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.core.GraftSession.local("m05probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val img = graft.multimodal.Multimodal.imageNeardup(spark, dir)
      .filter(shiftRight(col("media_a"), 2) =!= shiftRight(col("media_b"), 2))
    val aud = graft.multimodal.Multimodal.audioNeardup(spark, dir)
      .filter(shiftRight(col("media_a"), 2) =!= shiftRight(col("media_b"), 2))
    // video families are the coarser doc_id/8 partition (r16 geometry)
    val vid = graft.multimodal.Multimodal.videoNeardup(spark, dir)
      .filter(shiftRight(col("media_a"), 3) =!= shiftRight(col("media_b"), 3))
    println(s"[m05probe] cross-family image pairs: ${img.count()}")
    img.show(10, false)
    println(s"[m05probe] cross-family audio pairs: ${aud.count()}")
    aud.show(10, false)
    println(s"[m05probe] cross-family video pairs: ${vid.count()}")
    vid.show(10, false)
    spark.stop()
  }
}
