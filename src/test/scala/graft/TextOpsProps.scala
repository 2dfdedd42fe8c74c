package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

/** ScalaCheck: the SQL-expression implementations of the text/dedup
  * primitives must agree with direct Scala reimplementations on random
  * word-soup documents (catches expression-semantics bugs: split
  * behavior, div vs /, hex indexing, shingle windows). */
object TextOpsProps extends Properties("TextOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(8))
  private val doc = Gen.chooseNum(3, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val docs = Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, doc))

  private def scalaShingles(text: String): Set[String] = {
    val t = text.split(" ", -1)
    if (t.length < 3) Set.empty
    else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
  }

  property("token and stopword counts match plain Scala") =
    Prop.forAll(docs) { ds =>
      import spark.implicits._
      val df = ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .withColumn("toks", split($"text", " "))
        .select($"doc_id",
          size($"toks").cast("long").as("n_tokens"),
          size(filter($"toks", t => t.isin("the", "a"))).cast("long").as("stop_cnt"))
      val got = df.collect().map(r =>
        r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_tokens"), r.getAs[Long]("stop_cnt"))).toMap
      ds.zipWithIndex.forall { case (t, i) =>
        val toks = t.split(" ", -1)
        got(i.toLong) == (toks.length.toLong, toks.count(w => w == "the" || w == "a").toLong)
      }
    }

  property("pairwise shingle Jaccard matches Scala set arithmetic") =
    Prop.forAll(docs) { ds =>
      import spark.implicits._
      val df = ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .withColumn("toks", split($"text", " "))
        .withColumn("sh", array_distinct(expr(
          "CASE WHEN size(toks) < 3 THEN CAST(array() AS array<string>) " +
            "ELSE transform(sequence(1, size(toks) - 2), " +
            "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2))) END")))
      val a = df.select($"doc_id".as("ia"), $"sh".as("sa"))
      val b = df.select($"doc_id".as("ib"), $"sh".as("sb"))
      val pairs = a.crossJoin(b).filter($"ia" < $"ib")
        .select($"ia", $"ib",
          size(array_intersect($"sa", $"sb")).cast("long").as("inter"),
          size(array_union($"sa", $"sb")).cast("long").as("uni"))
        .collect()
      pairs.forall { r =>
        val sa = scalaShingles(ds(r.getAs[Long]("ia").toInt))
        val sb = scalaShingles(ds(r.getAs[Long]("ib").toInt))
        r.getAs[Long]("inter") == sa.intersect(sb).size.toLong &&
          r.getAs[Long]("uni") == sa.union(sb).size.toLong
      }
    }

  property("marker counts match plain Scala substring counting") =
    Prop.forAll(doc, Gen.oneOf("a", "th", "ab ", " a ")) { (text, marker) =>
      import spark.implicits._
      val got = Seq(text).toDF("text")
        .select(graft.text.TextAnalysis.markerCount(marker).as("c"))
        .head.getAs[Long]("c")
      val expected = {
        var count = 0; var idx = text.indexOf(marker)
        while (idx >= 0) { count += 1; idx = text.indexOf(marker, idx + marker.length) }
        count.toLong
      }
      // replace-length counting removes non-overlapping occurrences
      // left-to-right, exactly like indexOf stepping by marker length
      got == expected
    }

  property("chunking reconstructs the document from stride-aligned pieces") =
    Prop.forAll(docs) { ds =>
      import spark.implicits._
      val df = ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .withColumn("toks", split($"text", " "))
        .select($"doc_id", $"toks",
          posexplode(expr("sequence(1, greatest(size(toks), 1), 40)")))
        .select($"doc_id", $"pos".cast("long").as("chunk_id"),
          expr("slice(toks, col, 50)").as("chunk_toks"))
        .collect()
      ds.zipWithIndex.forall { case (t, i) =>
        val toks = t.split(" ", -1).toSeq
        val chunks = df.filter(_.getAs[Long]("doc_id") == i.toLong)
          .sortBy(_.getAs[Long]("chunk_id"))
          .map(_.getAs[scala.collection.Seq[String]]("chunk_toks").toSeq)
          .toSeq
        // every chunk equals the direct slice, and stride-prefixes
        // (last chunk whole) reassemble the document exactly
        val expected = (0 until math.max(1, (toks.length + 39) / 40))
          .map(k => toks.slice(k * 40, k * 40 + 50))
        chunks == expected &&
          chunks.zipWithIndex.flatMap { case (c, k) =>
            if (k == chunks.length - 1) c else c.take(40)
          } == toks
      }
    }

  property("packing offsets are the running sum mod/div the budget") =
    Prop.forAll(docs) { ds =>
      import spark.implicits._
      val w = org.apache.spark.sql.expressions.Window.orderBy($"doc_id")
      val rows = ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .withColumn("n", size(split($"text", " ")).cast("long"))
        .withColumn("cum", sum($"n").over(w))
        .select($"doc_id", $"n",
          expr("(cum - n) div 64").as("pack_id"),
          expr("(cum - n) % 64").as("pack_offset"))
        .collect().sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      rows.forall { r =>
        val ok = r.getAs[Long]("pack_id") == cum / 64 &&
          r.getAs[Long]("pack_offset") == cum % 64
        cum += r.getAs[Long]("n")
        ok
      }
    }

  property("bigram LM scores match direct Scala recomputation") =
    Prop.forAll(docs) { ds =>
      import spark.implicits._
      val df = ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.text.TextAnalysis.bigramLm(df).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (if (r.isNullAt(r.fieldIndex("n_bigrams"))) None
           else Some((r.getAs[Long]("n_bigrams"),
             r.getAs[Long]("avg_p_e6"), r.getAs[Long]("min_p_e6"))))).toMap
      // direct recomputation with plain Scala maps
      val allPairs = ds.flatMap { t =>
        val w = t.split(" ", -1); w.init.zip(w.tail)
      }
      val c12 = allPairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = allPairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      ds.zipWithIndex.forall { case (t, i) =>
        val w = t.split(" ", -1)
        val ps = w.init.zip(w.tail).map(p => c12(p) * 1000000L / c1(p._1))
        if (ps.isEmpty) got(i.toLong).isEmpty
        else got(i.toLong).contains((ps.length.toLong, ps.sum / ps.length, ps.min))
      }
    }

  // narrow alphabet forces pair collisions and repeated-char runs
  // ("aaa") that stress the replace's left-to-right non-overlap rule
  private val bpeWord = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))).map(_.mkString)
  private val bpeDoc = Gen.chooseNum(5, 30)
    .flatMap(n => Gen.listOfN(n, bpeWord)).map(_.mkString(" "))
  private val bpeDocs = Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, bpeDoc))

  property("bm25 scoring expressions equal a direct Scala replay") =
    Prop.forAll(docs) { ds =>
      import spark.implicits._
      val frame = ds.zipWithIndex.flatMap { case (t, i) =>
        t.split(" ", -1).filter(_.nonEmpty).map(w => (i.toLong, w))
      }
      if (frame.isEmpty) true
      else {
        val tfm = frame.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val dlm = tfm.groupBy(_._1._1).map { case (d, m) => d -> m.values.sum }
        val dfm = tfm.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
        val nDocs = dlm.size.toLong
        val avgdl = dlm.values.sum * 1000L / nDocs
        val rows = tfm.toSeq.map { case ((d, w), tf) =>
          (d, w, tf, dfm(w), dlm(d), nDocs, avgdl)
        }
        val scored = graft.text.TextAnalysis.withBm25Score(
          rows.toDF("doc_id", "token", "tf", "df", "dl", "n_docs", "avgdl_x1000"))
          .select($"doc_id", $"token", $"score_term").collect()
          .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
        val want = rows.map { case (d, w, tf, df, dl, n, av) =>
          val idf = n * 1000L / df
          val norm = 250L + 750L * dl * 1000L / av
          (d, w) -> tf * 2200L * idf / (tf * 1000L + 1200L * norm / 1000L)
        }.toMap
        scored == want
      }
    }

  /** Direct Scala replay of the N-round trainer: per-token symbol
    * strings, tf-weighted pair counts, lexicographic-tiebreak best
    * pair, java String.replace (= the left-to-right non-overlapping
    * rule Spark's and DuckDB's replace() apply). Returns the top-5
    * rows per round AND the final per-token symbol strings after all
    * N learned merges (exhausted rounds apply the identity). */
  private def replayBpe(ds: Seq[String], rounds: Int)
      : (Seq[(Long, Long, String, String, Long)], Map[String, String]) = {
    val tf: Map[String, Long] = ds.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def pairCounts(seqs: Map[String, String]): Map[(String, String), Long] =
      seqs.toSeq.flatMap { case (tok, syms) =>
        val arr = syms.trim.split(" ", -1)
        if (arr.length < 2) Nil
        else arr.init.zip(arr.tail).map(p => p -> tf(tok))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def top5(c: Map[(String, String), Long], round: Long) =
      c.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.take(5).zipWithIndex
        .map { case (((a, b), n), i) => (round, (i + 1).toLong, a, b, n) }
    var seqs: Map[String, String] =
      tf.keys.map(tok => tok -> (" " + tok.toCharArray.mkString(" ") + " ")).toMap
    val tops = Vector.newBuilder[(Long, Long, String, String, Long)]
    for (r <- 0 until rounds) {
      val c = pairCounts(seqs)
      tops ++= top5(c, r.toLong)
      if (c.nonEmpty) {
        val (ba, bb) = c.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head._1
        seqs = seqs.map { case (tok, syms) =>
          tok -> syms.replace(s" $ba $bb ", s" $ba$bb ")
        }
      }
    }
    (tops.result(), seqs)
  }

  property("bpe training rounds equal a direct N-round Scala replay") =
    Prop.forAll(bpeDocs) { ds =>
      import spark.implicits._
      val df = ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.text.TextAnalysis.bpeTrain(df).collect()
        .map(r => (r.getAs[Long]("round"), r.getAs[Long]("rank"),
          r.getAs[String]("sym_a"), r.getAs[String]("sym_b"),
          r.getAs[Long]("pair_count"))).toSeq
      got == replayBpe(ds, graft.text.TextAnalysis.BpeRounds)._1
    }

  property("bpe encoding equals a direct Scala replay of the N merges") =
    Prop.forAll(bpeDocs) { ds =>
      import spark.implicits._
      val df = ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.text.TextAnalysis.bpeEncode(df).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_symbols_char"), r.getAs[Long]("n_symbols_bpe"),
          r.getAs[Long]("compression_permille"))).toSeq.sortBy(_._1)
      val sN = replayBpe(ds, graft.text.TextAnalysis.BpeRounds)._2
      val symCount: Map[String, Long] =
        sN.map { case (tok, syms) => tok -> syms.trim.split(" ", -1).length.toLong }
      val expected = ds.zipWithIndex.map { case (t, i) =>
        val toks = t.split(" ", -1).filter(_.nonEmpty)
        val chars = toks.map(_.length.toLong).sum
        val bpe = toks.map(symCount).sum
        (i.toLong, toks.length.toLong, chars, bpe, bpe * 1000 / chars)
      }.filter(_._2 > 0).sortBy(_._1)
      got == expected
    }

  property("bpe merge rounds monotonically reduce total symbol count") =
    Prop.forAll(bpeDocs) { ds =>
      val tf: Map[String, Long] = ds.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      def total(seqs: Map[String, String]): Long =
        seqs.map { case (tok, syms) =>
          tf(tok) * syms.trim.split(" ", -1).length }.sum
      // corpus-wide symbol mass after k merges, via the replay whose
      // equality to the engine the two properties above pin: strictly
      // decreasing while a merge was learned, flat once exhausted
      val totals = (0 to graft.text.TextAnalysis.BpeRounds).map {
        k => if (k == 0) {
          val s0 = tf.keys.map(t => t -> (" " + t.toCharArray.mkString(" ") + " ")).toMap
          total(s0)
        } else total(replayBpe(ds, k)._2)
      }
      val learned = replayBpe(ds, graft.text.TextAnalysis.BpeRounds)._1
        .count(_._2 == 1L) // rank-1 rows = merges actually learned
      totals.sliding(2).zipWithIndex.forall { case (Seq(a, b), k) =>
        if (k < learned) b < a else b == a
      }
    }

  private val sortedDistinctLongs: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted.toSeq)

  property("sorted_intersect_count equals set-intersection cardinality") =
    Prop.forAll(sortedDistinctLongs, sortedDistinctLongs) { (a, b) =>
      import spark.implicits._
      val got = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .select(graft.functions.SortedIntersectCount
          .sorted_intersect_count(col("a"), col("b")).as("c"))
        .head.getLong(0)
      got == (a.toSet & b.toSet).size.toLong
    }
}
