package graft.queries

import graft.testkit.SparkSpec

/** Property checks for the block-pair all-pairs kernels (s02, d05): the
  * distributed formulation must return EXACTLY the pairs a local O(n²)
  * reference finds, on random inputs — exercising empty blocks, singleton
  * blocks, cross-block and within-block pairs, and id gaps that the fixed
  * oracle corpus can't. */
class BlockPairSpec extends SparkSpec {

  test("property: s02 block-pair near-dup == local all-pairs on random vectors") {
    import org.scalacheck.Gen
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(0, 30)
      ids <- Gen.listOfN(n, Gen.chooseNum(0L, 200L)).map(_.distinct)
      vecs <- Gen.listOfN(ids.size, Gen.listOfN(4, Gen.chooseNum(-5, 5).map(_.toDouble)))
    } yield ids.zip(vecs.map(_.toArray)).filter(_._2.exists(_ != 0.0))
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    graft.testkit.Props.forAllN(gen, n = 12) { docs =>
      if (docs.nonEmpty) {
        // local reference
        val local = (for {
          i <- docs.indices; j <- i + 1 until docs.length
          (ida, va) = docs(i)
          (idb, vb) = docs(j)
          c = dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
          if c >= SimilarityQueries.NearDupThreshold
        } yield (math.min(ida, idb), math.max(ida, idb))).toSet
        // distributed: write a temp embeddings table and run the real query
        val dir = java.nio.file.Files.createTempDirectory("s02-prop").toString
        docs.map { case (id, v) => (id, v.map(_.toFloat)) }
          .toDF("vec_id", "embedding")
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        val got = SimilarityQueries.s02EmbedNearDup(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == local, s"ids=${docs.map(_._1)}")
      }
    }
  }

  test("x02 two-level prefix sum == global running sum across shard borders") {
    // sf0.01 spans one shard; force many shards with gappy ids and check
    // the sharded decomposition against a local global prefix sum
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 300).map { i =>
      val id = i * 7L + (if (i % 3 == 0) 1 else 0) // gaps, crosses many 1000-shards? use wide ids
      (id * 13L, if (i % 2 == 0) "en" else "de", "w " * (rnd.nextInt(80) + 1))
    }
    val dir = java.nio.file.Files.createTempDirectory("x02-prop").toString
    docs.map { case (id, lang, text) => (id, lang, text.trim, 0L) }
      .toDF("doc_id", "lang", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.x02PackBins(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    // local reference: global per-language prefix sum in doc_id order
    val byLang = docs.map { case (id, lang, text) =>
      (id, lang, text.trim.split(' ').length.toLong)
    }.groupBy(_._2)
    val expected = byLang.flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        val bin = cum / TextQueries.PackBudget
        cum += n
        id -> bin
      }
    }
    assert(got == expected)
    // ids span many shards, so the cross-shard offset path really ran
    assert(docs.map(_._1 / TextQueries.PackShardDocs).distinct.size > 3)
  }

  test("x01 empty token array yields exactly one empty window (oracle-pinned edge)") {
    // The tokenizer can't produce an empty array (split('', ' ') = [""] on
    // both engines), so inject one directly: the greatest(...,0) clamp must
    // emit exactly ONE window with chunk_text '' and n_tokens 0 — the same
    // row the DuckDB oracle's generate_series(0, greatest(...,0)) +
    // coalesce(array_to_string(...), '') formulation produces (verified by
    // hand against DuckDB 1.0: bare array_to_string([], ' ') is NULL there,
    // hence the coalesce in SparkEntry's x01 SQL).
    import spark.implicits._
    val tok = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq.fill(TextQueries.WindowTokens + 1)("w"))
    ).toDF("doc_id", "toks")
    val got = TextQueries.x01From(tok)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val empt = got.filter(_._1 == 1L)
    assert(empt.toSeq == Seq((1L, 0L, "", 0L)))
    // the non-empty doc spills into a second overlapping window
    val full = got.filter(_._1 == 2L)
    assert(full.length == 2 && full(0)._4 == TextQueries.WindowTokens)
  }

  test("property: d05 block-pair jaccard == local all-pairs on random token sets") {
    import org.scalacheck.Gen
    import spark.implicits._
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val gen = for {
      n <- Gen.chooseNum(0, 25)
      ids <- Gen.listOfN(n, Gen.chooseNum(0L, 120L)).map(_.distinct)
      langs <- Gen.listOfN(ids.size, Gen.oneOf("en", "de"))
      toks <- Gen.listOfN(ids.size, Gen.someOf(words).map(_.toVector))
    } yield ids.lazyZip(langs).lazyZip(toks).toList.filter(_._3.nonEmpty)
    graft.testkit.Props.forAllN(gen, n = 12) { docs =>
      if (docs.nonEmpty) {
        val local = (for {
          i <- docs.indices; j <- i + 1 until docs.length
          (ida, la, ta) = docs(i)
          (idb, lb, tb) = docs(j)
          if la == lb
          sa = ta.toSet; sb = tb.toSet
          inter = (sa & sb).size
          jac = inter.toDouble / (sa.size + sb.size - inter)
          if jac >= TextQueries.JaccardThreshold
        } yield (math.min(ida, idb), math.max(ida, idb))).toSet
        val dir = java.nio.file.Files.createTempDirectory("d05-prop").toString
        docs.map { case (id, lang, ts) => (id, lang, ts.distinct.mkString(" "), 0L) }
          .toDF("doc_id", "lang", "text", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val got = TextQueries.d05JaccardPairs(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == local, s"docs=$docs")
      }
    }
  }
}
