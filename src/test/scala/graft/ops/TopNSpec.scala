package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TopNSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("partitionTopN: survivors are a superset of the global per-group top-n") {
    // Deterministic pseudo-random rows over 4 groups, spread across many
    // partitions so per-partition pruning actually has something to prune.
    val rows = (1L to 5000L).map { i =>
      val g = "g" + (i % 4)
      val v = (i * 2654435761L) % 100003L // splay values deterministically
      (g, i, v)
    }
    val ds = spark.createDataset(rows).repartition(16)
    implicit val ord: Ordering[(String, Long, Long)] = Ordering.by(t => (-t._3, t._2))
    val surv = TopN.partitionTopN(ds, 7)(_._1).collect().toSet
    val want = rows.groupBy(_._1).values.flatMap(_.sorted(ord).take(7)).toSet
    assert(want.subsetOf(surv), "global top-7 per group must survive phase 1")
    // Ranking the survivors equals ranking the full data.
    val fromSurv = surv.toSeq.groupBy(_._1).values.flatMap(_.sorted(ord).take(7)).toSet
    assert(fromSurv == want)
    // And phase 1 is genuinely bounded: <= n * groups * partitions.
    assert(surv.size <= 7 * 4 * 16)
  }

  test("partitionTopN property: ranking survivors == ranking full data, any input/partitioning") {
    // ScalaCheck over random row sets, group counts, n, and partition
    // counts: the phase-1 survivors must always reproduce the exact
    // global per-group top-n. Duplicate values included (ties broken by
    // the unique row id in the ordering, keeping it total).
    import org.scalacheck.{Gen, Prop}
    val genCase = for {
      rows <- Gen.choose(0, 400)
      groups <- Gen.choose(1, 6)
      n <- Gen.choose(1, 10)
      parts <- Gen.choose(1, 12)
      vals <- Gen.listOfN(rows, Gen.choose(0L, 50L)) // dense => many ties
    } yield (vals.zipWithIndex.map { case (v, i) => (s"g${i % groups}", i.toLong, v) }, n, parts)
    val prop = Prop.forAll(genCase) { case (data, n, parts) =>
      implicit val ord: Ordering[(String, Long, Long)] = Ordering.by(t => (-t._3, t._2))
      val ds = spark.createDataset(data).repartition(parts)
      val surv = TopN.partitionTopN(ds, n)(_._1).collect().toSeq
      val fromSurv = surv.groupBy(_._1).values.flatMap(_.sorted(ord).take(n)).toSet
      val want = data.groupBy(_._1).values.flatMap(_.sorted(ord).take(n)).toSet
      fromSurv == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("partitionTopN: fewer rows than n passes everything through") {
    val ds = spark.createDataset(Seq(("a", 1L, 5L), ("a", 2L, 3L), ("b", 3L, 9L)))
    implicit val ord: Ordering[(String, Long, Long)] = Ordering.by(t => (-t._3, t._2))
    assert(TopN.partitionTopN(ds, 10)(_._1).collect().toSet ==
      Set(("a", 1L, 5L), ("a", 2L, 3L), ("b", 3L, 9L)))
  }
}
