package graft

import java.nio.file.Files
import java.util.Comparator

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.quality.Quality

/** ScalaCheck: the quality operators run against REAL parquet corpus
  * dirs built from random word-soup documents, and their outputs must
  * agree with direct Scala recomputation (catches split/div/HOF
  * expression-semantics bugs the fixed test corpus can't reach). */
object QualityProps extends Properties("Quality") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  // small vocabulary so word/bigram repeats actually occur
  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "the", "a", "zz")
  private val doc = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val docs = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, doc))

  /** Write a documents.parquet corpus dir, run `f` over it, clean up. */
  private def withDocsDir(ds: List[String])(f: String => Boolean): Boolean = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-quality-prop")
    ds.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try f(dir.toString)
    finally Files.walk(dir).sorted(Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { Files.deleteIfExists(p); () })
  }

  private def words(t: String): Array[String] =
    t.split("\\s+").filter(_.nonEmpty)

  property("repetition scoring matches Scala histogram arithmetic") =
    Prop.forAll(docs) { ds =>
      withDocsDir(ds) { dir =>
        val rows = Quality.qQualityRepetition(spark, dir).collect()
          .map(r => r.getAs[Long]("doc_id") -> r).toMap
        ds.zipWithIndex.forall { case (t, i) =>
          val ws = words(t)
          if (ws.isEmpty) !rows.contains(i.toLong)
          else {
            val r = rows(i.toLong)
            val bigrams = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
            r.getAs[Long]("n_words") == ws.length.toLong &&
              r.getAs[Long]("n_distinct_words") == ws.distinct.length.toLong &&
              r.getAs[Long]("top_word_n") ==
                ws.groupBy(identity).values.map(_.length).max.toLong &&
              r.getAs[Long]("n_bigrams") == bigrams.length.toLong &&
              r.getAs[Long]("n_dup_bigrams") ==
                (bigrams.length - bigrams.distinct.length).toLong
          }
        }
      }
    }

  property("gopher gate counts match Scala recomputation") =
    Prop.forAll(docs) { ds =>
      withDocsDir(ds) { dir =>
        val stop = Set("the", "a", "of", "to", "and", "in", "is", "on")
        val rows = Quality.qQualityGopher(spark, dir).collect()
          .map(r => r.getAs[Long]("doc_id") -> r).toMap
        ds.zipWithIndex.forall { case (t, i) =>
          val ws = words(t)
          val r = rows(i.toLong)
          r.getAs[Long]("n_words") == ws.length.toLong &&
            r.getAs[Long]("sum_wlen") == ws.map(_.length).sum.toLong &&
            r.getAs[Long]("stop_hits") == ws.count(stop).toLong &&
            r.getAs[Long]("mean_wlen_permille") ==
              (if (ws.isEmpty) 0L else ws.map(_.length).sum.toLong * 1000 / ws.length)
        }
      }
    }

  property("canonicalization dedup: same normal form ⇒ same group, min id canonical") =
    Prop.forAll(docs) { ds =>
      withDocsDir(ds) { dir =>
        val rows = Quality.qDedupNorm(spark, dir).collect()
        val norm = (t: String) =>
          t.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll("\\s+", " ").trim
        val groups = ds.zipWithIndex.groupBy { case (t, _) => norm(t) }
        rows.length == groups.size &&
          rows.forall { r =>
            val canon = r.getAs[Long]("canonical_doc_id")
            val grp = groups.values.find(_.exists(_._2.toLong == canon)).get
            r.getAs[Long]("n_docs") == grp.length.toLong &&
              canon == grp.map(_._2.toLong).min
          }
      }
    }
}
