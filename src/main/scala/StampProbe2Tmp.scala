package graft
object StampProbe2Tmp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("stamp-probe3")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    def md(i: Long) = new MetadataBuilder().putLong("parquet.field.id", i).build()
    val dir = java.nio.file.Files.createTempDirectory("sp3").toString
    def footer(p: String): String = {
      val conf = spark.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
      val f = fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try rd.getFileMetaData.getSchema.toString.replace("\n", " | ")
      finally rd.close()
    }
    // rows incl. a NULL parent struct
    val df = Seq((1L, Some(("de", 10L))), (2L, None))
      .toDF("doc_id", "m")
      .select(col("doc_id"),
        when(col("m").isNotNull,
          struct(col("m._1").as("lang"), col("m._2").as("n")))
          .as("meta"))
    // recursive alias-stamped rebuild with null-parent guard
    val built = struct(
      col("meta.lang").as("lang", md(3)),
      col("meta.n").as("n", md(4)))
    val stamped = df.select(
      col("doc_id").as("doc_id", md(1)),
      when(col("meta").isNotNull, built)
        .otherwise(lit(null).cast(df.schema("meta").dataType))
        .as("meta", md(2)))
    stamped.write.parquet(s"$dir/p")
    println("[sp3] footer=" + footer(s"$dir/p"))
    val back = spark.read.parquet(s"$dir/p").orderBy("doc_id").collect()
    println("[sp3] rows=" + back.map(r => (r.getLong(0),
      Option(r.getStruct(1)).map(_.toString))).mkString(";"))
    spark.stop()
  }
}
