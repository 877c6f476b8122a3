package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-probe (r17): decompose where lshKnn/ivfKnn wall goes on a
  * LARGE synthesized corpus (they measured ~100× brute force at 200k
  * vectors in the --core-law run). Arg 1 = corpus dir holding
  * embeddings.parquet (default /tmp/scaleprobe/hundredx).
  */
object AnnCoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scaleprobe/hundredx")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ann-probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    println(s"[ann-probe] corpus rows = ${emb.count()}")
    val e = emb.select(col("vec_id"),
      Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    t("norm projection")(noop(e))
    t("brute force knn")(noop(
      Similarity.bruteForceKnn(emb, col("vec_id") < 5, k = 10)))
    // the ivf cell-assign projection alone (the corpus-sized map)
    val cents: Array[(Long, Seq[Double], Double)] = emb
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("h", graft.operators.Corpus.portableHash(col("vec_id")))
      .orderBy(col("h")).limit(64)
      .select(col("vec_id"), col("v")).collect()
      .map { r =>
        val v = r.getSeq[Double](1)
        (r.getLong(0), v, math.sqrt(v.iterator.map(x => x * x).sum))
      }
    def cellScores(v: org.apache.spark.sql.Column,
        nrm: org.apache.spark.sql.Column) = array(cents.map {
      case (cid, cv, cnrm) =>
        struct(Similarity.cosine(v, typedLit(cv).cast("array<double>"),
          nrm, lit(cnrm)).as("score"), lit(cid).as("cid"))
    }.toIndexedSeq: _*)
    t("ivf cell-assign projection")(noop(
      e.withColumn("cell",
        array_max(cellScores(col("v"), col("nrm"))).getField("cid"))
        .select(col("vec_id"), col("cell"))))
    t("ivf knn full")(noop(
      Similarity.ivfKnn(emb, col("vec_id") < 5, k = 10)))
    // lsh: bucket projection, candidate count, full chain
    t("lsh bucket projection")(noop(
      e.select(col("vec_id"),
        Similarity.lshBucket(col("v"), 4, 64, 0).as("b"))))
    t("lsh knn full")(noop(
      Similarity.lshKnn(emb, col("vec_id") < 5, k = 10)))
    spark.stop()
  }
}

/** r17 scratch: A/B the ivfPqKnn INDEX projection spellings (inline
  * literal-dot cellScores vs lut-staged) on one corpus. Arg 1 = dir with
  * embeddings.parquet.
  */
object IvfPqIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Similarity
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
    val emb = if (emb0.columns.contains("vec_id")) emb0
      else emb0.withColumnRenamed("id", "vec_id")
    println(s"[ivfpq-probe] rows = ${emb.count()}")
    val cells = 64; val m = 8; val codebookSize = 256
    val sample = emb
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h")).limit(math.max(cells, codebookSize))
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val sub = sample.head._2.size / m
    val books = Array.tabulate(m, codebookSize)((s, c) =>
      sample(c)._2.slice(s * sub, (s + 1) * sub))
    val booksLit = typedLit(books.iterator.flatMap(_.iterator.flatMap(_.iterator)).toSeq)
      .cast("array<double>")
    val e = emb.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val cents = sample.take(cells).map { case (cid, v) =>
      (cid, v, math.sqrt(v.iterator.map(x => x * x).sum)) }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfpq-probe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def cellScoresOld(v: Column, nrm: Column): Column = array(cents.map {
      case (cid, cv, cnrm) => struct(
        Similarity.cosine(v, typedLit(cv).cast("array<double>"), nrm, lit(cnrm)).as("score"),
        lit(cid).as("cid"))
    }.toIndexedSeq: _*)
    val dimV = sample.head._2.size
    val centsFlat = typedLit(cents.toSeq.flatMap(_._2)).cast("array<double>")
    val cellLut = call_function("graft_pqlut", col("v"), centsFlat,
      lit(dimV), lit(cents.length))
    def cellScoresNew(lut: Column, nrm: Column): Column =
      array(cents.zipWithIndex.map { case ((cid, _, cnrm), c) =>
        struct((element_at(lut, lit(c + 1)) / (nrm * lit(cnrm))).as("score"),
          lit(cid).as("cid"))
      }.toIndexedSeq: _*)
    for (_ <- 1 to 2) {
      t("index OLD inline cells+pqencode")(noop(e.select(col("vec_id"),
        array_max(cellScoresOld(col("v"), col("nrm"))).getField("cid").as("cell"),
        call_function("graft_pqencode", col("v"), booksLit, lit(sub),
          lit(codebookSize)).as("codes"))))
      t("index NEW lut cells+pqencode")(noop(e.withColumn("_clut", cellLut)
        .select(col("vec_id"),
          array_max(cellScoresNew(col("_clut"), col("nrm"))).getField("cid").as("cell"),
          call_function("graft_pqencode", col("v"), booksLit, lit(sub),
            lit(codebookSize)).as("codes"))))
      t("cells only OLD")(noop(e.select(col("vec_id"),
        array_max(cellScoresOld(col("v"), col("nrm"))).getField("cid").as("cell"))))
      t("cells only NEW")(noop(e.withColumn("_clut", cellLut)
        .select(col("vec_id"),
          array_max(cellScoresNew(col("_clut"), col("nrm"))).getField("cid").as("cell"))))
      t("pqencode only")(noop(e.select(col("vec_id"),
        call_function("graft_pqencode", col("v"), booksLit, lit(sub),
          lit(codebookSize)).as("codes"))))
    }
    spark.stop()
  }
}
