package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY.md §5.2 #5): generated corpora with
  * violations injected at KNOWN ids — engine recall/precision must be exact,
  * and `pass + distinct-violating-rows == totalRows` per bucket.
  * (ScalaCheck generators driven manually: the scalatest-plus bridge isn't
  * on the offline classpath.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val suite = ConstraintSuite("doc_id", Seq(
    Range("n_tok", 1, 100),
    EnumIn("source", Seq("web", "books"))))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("exact recall/precision on injected violations; pass+fail==rows per bucket") {
    val genRows = Gen.listOfN(200, for {
      id <- Gen.choose(0, 1000000)
      bad <- Gen.frequency(8 -> false, 2 -> true)
      nTok <- if (bad) Gen.oneOf(Gen.choose(-50, 0), Gen.choose(101, 500)) else Gen.choose(1, 100)
      src <- Gen.oneOf("web", "books")
    } yield (s"doc-$id", nTok, src))

    for (rows <- samples(genRows, 10)) {
      val distinctRows = rows.distinctBy(_._1) // unique ids: known ground truth
      val df = distinctRows.toDF("doc_id", "n_tok", "source")
      val compiled = suite.compile(df.schema).toOption.get
      val r = compiled.run(df)
      val expected = distinctRows.filter(x => x._2 < 1 || x._2 > 100).map(_._1).toSet
      val got = r.violations.select("doc_id").as[String].collect().toSet
      assert(got === expected) // exact recall AND precision
      val rep = r.report.collect()
      assert(rep.forall(x => x.getAs[Long]("pass") + x.getAs[Long]("fail") === x.getAs[Long]("rows")))
      assert(rep.map(_.getAs[Long]("rows")).sum === distinctRows.size)
    }
  }

  test("violation count is exactly the number of failing constraints per row") {
    val gen = Gen.listOfN(100, for {
      id <- Gen.choose(0, 1000000)
      nTok <- Gen.choose(-200, 300)
      src <- Gen.oneOf("web", "books", "spam", "junk")
    } yield (s"d-$id", nTok, src))
    for (rows <- samples(gen, 10)) {
      val d = rows.distinctBy(_._1)
      val df = d.toDF("doc_id", "n_tok", "source")
      val compiled = suite.compile(df.schema).toOption.get
      val expected = d.map { case (_, n, s) =>
        (if (n < 1 || n > 100) 1 else 0) + (if (s != "web" && s != "books") 1 else 0)
      }.sum
      assert(compiled.run(df).violations.count() === expected)
    }
  }
}
