package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class OpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin: inner join result-identical to the plain join") {
    val li = GraftSession.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val ord = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = SkewJoin.saltedJoin(li, ord, Seq("l_orderkey"), salts = 8)
    val plain = li.join(ord, Seq("l_orderkey"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin: left join preserves unmatched rows exactly once") {
    val spark2 = spark
    import spark2.implicits._
    val large = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "v")
    val small = Seq((1, "x"), (2, "y")).toDF("k", "w")
    val salted = SkewJoin.saltedJoin(large, small, Seq("k"), salts = 4,
      joinType = "left")
    val plain = large.join(small, Seq("k"), "left")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.filter($"k" === 3).count() == 1, "unmatched row exactly once")
  }

  test("saltedJoin: rejects semantics-breaking join types") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(df, df, Seq("k"), joinType = "full_outer")
    }
  }

  test("provenance headers: user/producer/host as utf-8 binary structs") {
    val spark2 = spark
    import spark2.implicits._
    val out = Provenance.withHeaders(Seq(("a", 1)).toDF("name", "x"))
    val headers = out.select(explode(col("headers")).as("h"))
      .select($"h.key", $"h.value").as[(String, Array[Byte])].collect()
      .map { case (k, v) => k -> new String(v, "UTF-8") }.toMap
    assert(headers.keySet == Set("user", "producer", "host"))
    assert(headers("producer") == "graft-effective-processor")
    assert(headers("user").nonEmpty && headers("host").nonEmpty)
  }
}
