package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{Dedup, Vectors}

/** Stage-level timings for embed_neardup_lsh and neardup_pairs at sf0.1 —
  * the two bench hot spots. Each stage timed twice (min) after a warmup. */
object ProfileEmbedLsh {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-embed-lsh")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label: ${ts.min}%.2f s")
    }

    val emb = GraftSession.table(spark, dir, "embeddings")
    println("[prof] n_vectors=" + emb.count())

    val buckets = emb.select(col("vec_id"),
      Vectors.lshBucket(col("embedding"), 64, 4, 0).as("b0"))
    time("buckets 1 table")(buckets.write.format("noop").mode("overwrite").save())

    // full multi-table bucket frame via the private path: replicate inline
    val tb = emb.select(col("vec_id"),
      explode(array((0 until 8).map { t =>
        struct(lit(t).as("tbl"),
          Vectors.lshBucket(col("embedding"), 64, 4, t).as("bucket"))
      }: _*)).as("tb"))
      .select(col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"), col("vec_id"))
    time("buckets 8 tables")(tb.write.format("noop").mode("overwrite").save())

    val pairs = tb.join(tb.withColumnRenamed("vec_id", "id_b"), Seq("tbl", "bucket"))
      .filter(col("vec_id") < col("id_b"))
      .select(col("vec_id").as("id_a"), col("id_b"))
    time("candidate pairs (no distinct)")(
      println("pairs=" + pairs.count()))
    time("candidate pairs distinct")(
      println("distinct pairs=" + pairs.distinct().count()))
    time("full embeddingNearDups")(
      Vectors.embeddingNearDups(emb, 64, 0.45)
        .write.format("noop").mode("overwrite").save())

    val docs = GraftSession.table(spark, dir, "documents")
    println("[prof] n_docs=" + docs.count())
    time("shingleSets (no persist)")(
      Dedup.shingleSets(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
    time("signatures")(
      Dedup.signatures(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
    time("lshCandidates")(
      println("cands=" + Dedup.lshCandidates(docs, "doc_id", "text").count()))
    time("nearDupPairs (persist path)")(
      Dedup.nearDupPairs(docs, "doc_id", "text", 0.7)
        .write.format("noop").mode("overwrite").save())

    time("containment: full query")(
      graft.SparkEntry.queries("neardup_containment")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
