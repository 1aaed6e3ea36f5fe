package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The trainable BPE tokenizer ([[Bpe]]): deterministic merge learning,
 * lossless rank-replay segmentation, parquet round-trip bit-identity,
 * the tokensCol budgeting hook, and stream parity of the stateless
 * encode pass.
 */
class BpeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def E = Bpe.Eow

  test("trainMerges: the classic Sennrich dictionary learns the expected first merges") {
    // low x5, lower x2, newest x6, widest x3 — the paper's worked
    // example shape. Highest pair mass: ('e','s') and ('s','t') and
    // ('t','</w>') each appear in newest+widest = 9; ties break
    // lexicographically ascending, so ('e','s') merges first, then
    // ('es','t') at 9, then ('est','</w>') at 9.
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainMerges(wc, numMerges = 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", E)), s"$merges")
    // Determinism: the same dictionary in any order learns the same list.
    assert(Bpe.trainMerges(wc.reverse, 3) == merges)
    // Early stop: a dictionary with no repeated pair learns nothing.
    assert(Bpe.trainMerges(Seq(("ab", 1L)), 5).isEmpty)
  }

  test("encodeWord: lossless rank replay; unseen characters stay single tokens") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val model = Seq.tabulate(8)(identity)
      .foldLeft(Bpe.trainMerges(wc, 8))((m, _) => m)
    val ranks = model.zipWithIndex.toMap
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "", "zzz")) {
      val toks = Bpe.encodeWord(ranks, w)
      // Losslessness: concatenating the tokens reconstructs word + EOW.
      assert(toks.mkString == w + E, s"$w -> ${toks.toSeq}")
      assert(toks.nonEmpty && toks.length <= w.length + 1)
    }
    // 'newest' fully merges through the learned chain ('est' family);
    // a word of never-seen characters stays chars + EOW.
    assert(Bpe.encodeWord(ranks, "zzz").toSeq == Seq("z", "z", "z", E))
    // Appending MORE merges never increases a word's token count (the
    // earlier replay is unchanged; extra merges only apply after it).
    val more = Bpe.trainMerges(wc, 20).zipWithIndex.toMap
    for (w <- Seq("low", "lower", "newest", "widest", "lowest")) {
      assert(Bpe.encodeWord(more, w).length <= Bpe.encodeWord(ranks, w).length)
    }
  }

  test("bpeTrain + bpeEncode: corpus pass matches per-word replay; empty doc is one sentinel") {
    val docs = Seq(
      (1L, "low low lower newest"),
      (2L, "newest newest widest low"),
      (3L, "  Low\tLOWER  newest "), // normalization: case + whitespace
      (4L, ""))
      .toDF("doc_id", "text")
    val model = Bpe.bpeTrain(docs, "text", numMerges = 6)
    val ranks = model.ranks
    val got = Bpe.bpeEncode(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0),
        r.getSeq[String](1).toSeq, r.getLong(2))).sortBy(_._1)
    for ((id, toks, n) <- got) {
      assert(toks.length.toLong == n, s"count drifted for $id")
    }
    // Per-word replay mirror (the oracle's construction).
    val expected1 = Seq("low", "low", "lower", "newest")
      .flatMap(w => Bpe.encodeWord(ranks, w))
    assert(got(0)._2 == expected1, s"${got(0)}")
    // Normalization parity with TextFunctions.words: doc 3 tokenizes as
    // (low, lower, newest).
    val expected3 = Seq("low", "lower", "newest")
      .flatMap(w => Bpe.encodeWord(ranks, w))
    assert(got(2)._2 == expected3, s"${got(2)}")
    // The empty doc is ONE word ("") -> the sentinel alone.
    assert(got(3)._2 == Seq(E) && got(3)._3 == 1L, s"${got(3)}")
    // bpeCount is the same pass projected.
    val counts = Bpe.bpeCount(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == got.map(g => g._1 -> g._3).toMap)
  }

  test("TokenizerModel: parquet round trip is bit-identical (merges AND encodings)") {
    val docs = Seq(
      (1L, "low low lower newest widest"),
      (2L, "newest newest widest low lower lowest"))
      .toDF("doc_id", "text")
    val model = Bpe.bpeTrain(docs, "text", numMerges = 10)
    val dir = java.nio.file.Files.createTempDirectory("bpe-model-").toString
    model.write(dir)
    val loaded = Bpe.TokenizerModel.read(spark, dir)
    assert(loaded.mergeList == model.mergeList,
      "merge table drifted through parquet")
    val live = Bpe.bpeEncode(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
    val stored = Bpe.bpeEncode(docs, "doc_id", "text", loaded)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
    assert(live == stored, "stored-model encoding drifted from live")
    // Training is deterministic across invocations (the oracle's
    // train-twice assumption).
    assert(Bpe.bpeTrain(docs, "text", numMerges = 10).mergeList ==
      model.mergeList)
  }

  test("incremental trainer agrees with the naive rescan merge-for-merge") {
    // The determinism yardstick: trainMerges (incremental pair stats +
    // lazy-deletion heap) must reproduce trainMergesNaive's full merge
    // sequence — same argmax, same lexicographic ties, same early stop
    // — on every alphabet. Fixtures: the classic dictionary driven to
    // exhaustion, and a seeded pseudo-random 500-word Zipf dictionary
    // deep enough to churn the heap through thousands of count updates.
    val classic = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    for (m <- Seq(1, 3, 8, 50)) {
      assert(Bpe.trainMerges(classic, m) == Bpe.trainMergesNaive(classic, m),
        s"classic dict diverged at numMerges=$m")
    }
    val rng = new scala.util.Random(7)
    val letters = "abcdef" // narrow alphabet -> heavy pair collisions
    val zipf = (0 until 500).map { rank =>
      val w = (0 until (3 + rng.nextInt(8)))
        .map(_ => letters(rng.nextInt(letters.length))).mkString
      (w + rank, 10000L / (rank + 1) + 1L)
    }
    for (byteLevel <- Seq(false, true); m <- Seq(10, 100, 300)) {
      val inc = Bpe.trainMerges(zipf, m, byteLevel)
      val naive = Bpe.trainMergesNaive(zipf, m, byteLevel)
      assert(inc == naive,
        s"byteLevel=$byteLevel numMerges=$m: first divergence at rank " +
          s"${inc.zip(naive).indexWhere(p => p._1 != p._2)}")
    }
    // Early stop parity on a no-repeats dictionary.
    assert(Bpe.trainMerges(Seq(("ab", 1L)), 5).isEmpty &&
      Bpe.trainMergesNaive(Seq(("ab", 1L)), 5).isEmpty)
    // Depth: a 2000-word dictionary driven through 1000 merges — enough
    // heap churn (count rises, falls to zero, ties at every level) to
    // exercise the stale-entry discipline far past the fixtures above;
    // naive cost here is ~20M pair visits, still spec-speed.
    val rng2 = new scala.util.Random(13)
    val deep = (0 until 2000).map { rank =>
      val w = (0 until (3 + rng2.nextInt(9)))
        .map(_ => letters(rng2.nextInt(letters.length))).mkString
      (w + (rank % 97), 20000L / (rank + 1) + 1L) // repeated suffixes -> deep tie chains
    }
    val incDeep = Bpe.trainMerges(deep, 1000)
    val naiveDeep = Bpe.trainMergesNaive(deep, 1000)
    assert(incDeep == naiveDeep,
      s"deep dict diverged at rank " +
        s"${incDeep.zip(naiveDeep).indexWhere(p => p._1 != p._2)} " +
        s"(inc ${incDeep.length}, naive ${naiveDeep.length})")
  }

  test("byte alphabet: UTF-8 symbols, lossless reconstruction, byte counts differ from char on non-ASCII") {
    def utf8Chars(w: String): String =
      w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => (b & 0xff).toChar).mkString
    val wc = Seq(("café", 5L), ("naïve", 3L), ("a😀b", 4L), ("zz", 2L))
    for (m <- Seq(0, 2, 10)) {
      val ranks = Bpe.trainMerges(wc, m, byteLevel = true).zipWithIndex.toMap
      for (w <- Seq("café", "naïve", "a😀b", "", "zz", "日本")) {
        val toks = Bpe.encodeWord(ranks, w, byteLevel = true)
        // Losslessness: concatenation reconstructs the UTF-8 byte
        // string + EOW; decoding the byte-chars back yields the word.
        assert(toks.mkString == utf8Chars(w) + E,
          s"merges=$m word=$w -> ${toks.toSeq}")
        val body = toks.mkString.stripSuffix(E)
        val decoded = new String(body.toCharArray.map(_.toByte),
          java.nio.charset.StandardCharsets.UTF_8)
        assert(decoded == w, s"UTF-8 round trip broke for '$w'")
      }
    }
    // With NO merges, byte-level counts each UTF-8 byte (+1 EOW) where
    // char-level counts UTF-16 units (+1): 'café' = 5 bytes vs 4 chars.
    val none = Map.empty[(String, String), Int]
    assert(Bpe.encodeWord(none, "café", byteLevel = true).length == 6)
    assert(Bpe.encodeWord(none, "café").length == 5)
    // An emoji is 4 UTF-8 bytes but 2 UTF-16 units.
    assert(Bpe.encodeWord(none, "😀", byteLevel = true).length == 5)
    assert(Bpe.encodeWord(none, "😀").length == 3)
  }

  test("alphabet marker: byte model round-trips through parquet; malformed meta and bogus alphabet fail loud; markerless reads as char") {
    val docs = Seq(
      (1L, "low low lower newest café"),
      (2L, "newest newest café widest low"))
      .toDF("doc_id", "text")
    val model = Bpe.bpeTrain(docs, "text", numMerges = 8,
      alphabet = Bpe.AlphabetByte)
    assert(model.alphabet == Bpe.AlphabetByte)
    val dir = java.nio.file.Files.createTempDirectory("bpe-byte-").toString
    model.write(dir)
    val loaded = Bpe.TokenizerModel.read(spark, dir)
    assert(loaded.alphabet == Bpe.AlphabetByte,
      "the alphabet marker did not survive the parquet round trip")
    val live = Bpe.bpeCount(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stored = Bpe.bpeCount(docs, "doc_id", "text", loaded)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(live == stored, s"stored byte-model counts drifted: $live $stored")
    // Malformed marker (two rows): loud, never guessed. (The commit
    // marker is hand-planted so the malformed-META check is what
    // fires, not the missing-commit one.)
    val badDir = java.nio.file.Files.createTempDirectory("bpe-bad-").toString
    model.merges.write.mode("overwrite").parquet(badDir + "/merges")
    Seq("char", "byte").toDF("alphabet")
      .write.mode("overwrite").parquet(badDir + "/meta")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(
      badDir, Bpe.TokenizerModel.CommitMarker))
    val e = intercept[IllegalArgumentException] {
      Bpe.TokenizerModel.read(spark, badDir)
    }
    assert(e.getMessage.contains("alphabet marker"), s"$e")
    // Meta WITHOUT the commit marker = a crashed write(): loud — a new
    // marker over old merges would otherwise be a silently mislabeled
    // model (the in-place-overwrite hazard).
    val crashDir = java.nio.file.Files.createTempDirectory("bpe-crash-").toString
    model.merges.write.mode("overwrite").parquet(crashDir + "/merges")
    Seq("byte").toDF("alphabet").write.mode("overwrite")
      .parquet(crashDir + "/meta")
    val ec = intercept[IllegalArgumentException] {
      Bpe.TokenizerModel.read(spark, crashDir)
    }
    assert(ec.getMessage.contains(Bpe.TokenizerModel.CommitMarker), s"$ec")
    // A marker-less artifact (the pre-marker layout) is char-level.
    val oldDir = java.nio.file.Files.createTempDirectory("bpe-old-").toString
    model.merges.write.mode("overwrite").parquet(oldDir + "/merges")
    assert(Bpe.TokenizerModel.read(spark, oldDir).alphabet ==
      Bpe.AlphabetChar)
    // A mislabeled model is rejected at construction.
    val e2 = intercept[IllegalArgumentException] {
      Bpe.TokenizerModel(model.merges, "utf32")
    }
    assert(e2.getMessage.contains("unknown alphabet"), s"$e2")
    intercept[IllegalArgumentException] {
      Bpe.bpeTrain(docs, "text", 4, alphabet = "utf32")
    }
  }

  test("maxTrainWords ceiling is loud (the driver-collect contract)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.bpeTrain(docs, "text", 4, maxTrainWords = Bpe.MaxTrainWords + 1)
    }
    assert(e.getMessage.contains("frequency truncation"), s"$e")
    // The cap itself is accepted (boundary).
    assert(Bpe.MaxTrainWords == (1 << 20))
  }

  test("memo cap: counts stay exact past MaxMemoWords distinct words in one partition") {
    // High-uniqueness text (the ADVICE regime): one partition, more
    // distinct words than the memo holds — the overflow falls back to
    // direct encodeWord calls, so the count must not change.
    val nWords = Bpe.MaxMemoWords + 500
    val text = (0 until nWords).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text").coalesce(1)
    val model = Bpe.bpeTrain(docs, "text", numMerges = 12)
    val ranks = model.ranks
    val expected = (0 until nWords)
      .map(i => Bpe.encodeWord(ranks, s"w$i").length.toLong).sum
    val got = Bpe.bpeCount(docs, "doc_id", "text", model)
      .head.getLong(1)
    assert(got == expected, s"memo-capped count drifted: $got vs $expected")
  }

  test("encodeWord stays lossless on non-BMP input (surrogate pairs split, concat reconstructs)") {
    // UTF-16 code units are the alphabet: an emoji starts as two
    // half-surrogate symbols. Whatever merges apply, concatenating the
    // tokens must reconstruct word + EOW byte-for-byte — budgeting
    // correctness does not depend on tokens being valid strings.
    val wc = Seq(("a😀b", 5L), ("a😀", 3L), ("zz", 2L))
    for (m <- Seq(0, 2, 8)) {
      val ranks = Bpe.trainMerges(wc, m).zipWithIndex.toMap
      for (w <- Seq("a😀b", "😀😀", "", "zz")) {
        val toks = Bpe.encodeWord(ranks, w)
        assert(toks.mkString == w + E, s"merges=$m word=$w -> ${toks.toSeq}")
      }
    }
  }

  test("withBpeCount: in-place column matches bpeCount; passthrough intact; collision loud") {
    val docs = Seq(
      (1L, "low lower newest", "a"), (2L, "widest low", "b"), (3L, "", "c"))
      .toDF("doc_id", "text", "src")
    val model = Bpe.bpeTrain(docs, "text", numMerges = 6)
    val got = Bpe.withBpeCount(docs, "text", model)
    assert(got.columns.toSeq == Seq("doc_id", "text", "src", "n_tokens_bpe"),
      s"passthrough columns lost: ${got.columns.toSeq}")
    val inPlace = got.collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    val joined = Bpe.bpeCount(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inPlace.map { case (k, (_, n)) => k -> n } == joined,
      s"in-place counts drifted from bpeCount: $inPlace vs $joined")
    assert(inPlace(1L)._1 == "a" && inPlace(3L)._2 == 1L, s"$inPlace")
    val e = intercept[IllegalArgumentException] {
      Bpe.withBpeCount(docs.withColumnRenamed("src", "n_tokens_bpe"),
        "text", model)
    }
    assert(e.getMessage.contains("already exists"), s"$e")
  }

  test("fertilityReport: per-group masses and ratios match a naive reference; null group loud") {
    val docs = Seq(
      (1L, "low lower newest", "en"), (2L, "widest low", "en"),
      (3L, "", "de"), (4L, null: String, "de"), (5L, "newest newest", "fr"))
      .toDF("doc_id", "text", "lang")
    val model = Bpe.bpeTrain(docs, "text", numMerges = 6)
    val perDoc = Bpe.bpeCount(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = docs.collect().map { r =>
      val t = Option(r.getString(1)).getOrElse("")
      val norm = t.toLowerCase.replaceAll("\\s+", " ").trim
      (r.getString(2), norm.split(" ", -1).length.toLong,
        norm.length.toLong, perDoc(r.getLong(0)))
    }
    val want = raw.groupBy(_._1).map { case (lang, rs) =>
      val (nw, nc, nt) = (rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum)
      lang -> ((rs.length.toLong, nw, nt, nc,
        if (nw == 0) 0.0 else nt.toDouble / nw,
        if (nt == 0) 0.0 else nc.toDouble / nt))
    }
    val got = Bpe.fertilityReport(docs, "text", "lang", model)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got == want, s"$got vs $want")
    // The empty/null-doc group: 1 sentinel word + 1 sentinel token each.
    assert(got("de") == ((2L, 2L, 2L, 0L, 1.0, 0.0)), s"${got("de")}")
    val e = intercept[Exception] {
      Bpe.fertilityReport(
        docs.withColumn("lang",
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("doc_id") === 5L, null)
            .otherwise(org.apache.spark.sql.functions.col("lang"))),
        "text", "lang", model).collect()
    }
    assert(e.getMessage.contains("null lang"), s"$e")
  }

  test("loud contracts: bad arguments, malformed model, oversized dictionary") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Bpe.bpeTrain(docs, "text", 0) }
    intercept[IllegalArgumentException] {
      Bpe.bpeTrain(docs, "text", Bpe.MaxMerges + 1)
    }
    intercept[IllegalArgumentException] {
      Bpe.bpeTrain(docs, "text", 4, maxTrainWords = 0)
    }
    // A merge table with duplicate ranks is ambiguous replay — loud.
    val bad = Bpe.TokenizerModel(
      Seq((0, "a", "b"), (0, "b", "c")).toDF("rank", "lhs", "rhs"))
    val e = intercept[IllegalArgumentException] { bad.mergeList }
    assert(e.getMessage.contains("0..n-1"), s"$e")
    // Literal rendering is bounded and loud past maxWords.
    val model = Bpe.bpeTrain(docs, "text", 4)
    val e2 = intercept[IllegalArgumentException] {
      Bpe.wordEncodingsSqlValues(model, docs, "text", maxWords = 2)
    }
    assert(e2.getMessage.contains("model-sized"), s"$e2")
  }

  test("seqPack tokensCol hook: layout budgets in caller counts; null/negative fail loud") {
    val docs = Seq(
      (1L, "ignored text", 10L), (2L, "ignored", 20L), (3L, "x", 5L))
      .toDF("doc_id", "text", "n_model")
    val packed = graft.ops.TrainShuffle.seqPack(
        docs, "doc_id", "text", numShards = 1, budget = 16,
        tokensCol = "n_model")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(packed == Map(1L -> 10L, 2L -> 20L, 3L -> 5L),
      s"caller counts must flow through verbatim: $packed")
    // Layout arithmetic rides the caller counts: total mass = 35 + 3
    // separators = 38 tokens -> 3 sequences of budget 16.
    val rep = graft.ops.TrainShuffle.packReport(
      graft.ops.TrainShuffle.seqPack(
        docs, "doc_id", "text", numShards = 1, budget = 16,
        tokensCol = "n_model"),
      budget = 16).collect()
    assert(rep.length == 1 && rep(0).getLong(2) == 35L, s"${rep.toSeq}")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val withNull = Seq((1L, "t", Some(10L)), (2L, "t", None))
      .toDF("doc_id", "text", "n_model")
    val e = intercept[Exception] {
      graft.ops.TrainShuffle.seqPack(withNull, "doc_id", "text", 1,
        budget = 16, tokensCol = "n_model").collect()
    }
    assert(msgs(e).exists(_.contains("null/negative")), s"$e")
    val withNeg = Seq((1L, "t", 10L), (2L, "t", -1L))
      .toDF("doc_id", "text", "n_model")
    val e2 = intercept[Exception] {
      graft.ops.TrainShuffle.seqPack(withNeg, "doc_id", "text", 1,
        budget = 16, tokensCol = "n_model").collect()
    }
    assert(msgs(e2).exists(_.contains("null/negative")), s"$e2")
  }

  test("bpeCount is stream-native: per-record parity with the batch pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val rows = Seq(
      (1L, "low lower newest"), (2L, "widest low"), (3L, ""))
    val model = Bpe.bpeTrain(rows.toDF("doc_id", "text"), "text", 6)
    val ms = MemoryStream[(Long, String)]
    val out = Bpe.bpeCount(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
    val q = out.writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("bpe_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = Bpe.bpeCount(rows.toDF("doc_id", "text"),
          "doc_id", "text", model)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch && batch.size == 3,
        s"stream drifted from batch: $streamed vs $batch")
    } finally q.stop()
  }

  test("vocab: deterministic id order (unk, symbols asc, merges by rank), dense after dedup, parquet round trip") {
    val docs = Seq(
      (1L, "low low lower newest widest"),
      (2L, "newest newest widest low lower lowest"))
      .toDF("doc_id", "text")
    val model = Bpe.bpeTrain(docs, "text", numMerges = 10)
    val v = model.vocab
    // id 0 is always unk; base symbols follow in ascending order.
    assert(v.head == Bpe.UnkToken)
    val base = model.baseSymbols.get.distinct.sorted
    assert(v.slice(1, 1 + base.length) == base.toIndexedSeq,
      s"base block out of order: ${v.take(base.length + 1)}")
    // Merge tokens follow in rank order (modulo first-wins dedup).
    val mergeToks = model.mergeList.map { case (l, r) => l + r }
    val tail = v.drop(1 + base.length)
    assert(tail == mergeToks.filterNot(
      (Bpe.UnkToken +: base).contains).distinct.toIndexedSeq, s"$tail")
    // Dense, collision-free ids.
    assert(v.distinct.length == v.length)
    assert(model.tokenToId.values.toSeq.sorted == v.indices.toSeq)
    // The whole vocab survives the parquet round trip bit-identically.
    val dir = java.nio.file.Files.createTempDirectory("bpe-vocab-").toString
    model.write(dir)
    val loaded = Bpe.TokenizerModel.read(spark, dir)
    assert(loaded.vocab == v, "vocab drifted through parquet")
    assert(loaded.pretok == Bpe.PretokWords)
  }

  test("bpeEncodeIds: ids are exactly the string encode mapped through the vocab; unseen symbols -> unk id 0") {
    val docs = Seq(
      (1L, "low lower newest"), (2L, "widest low"), (3L, ""))
      .toDF("doc_id", "text")
    val model = Bpe.bpeTrain(docs, "text", numMerges = 8)
    val strs = Bpe.bpeEncode(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val ids = Bpe.bpeEncodeIds(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Int](1).toSeq, r.getLong(2))).toList
    ids.foreach { case (d, seq, n) =>
      assert(seq.length.toLong == n)
      assert(seq == strs(d).map(model.tokenToId.getOrElse(_, 0)),
        s"doc $d id sequence diverges from the string encode")
    }
    // A char the char-level model never trained on maps to unk id 0
    // (and ONLY that symbol does).
    val oov = Seq((9L, "low élow")).toDF("doc_id", "text")
    val got = Bpe.bpeEncodeIds(oov, "doc_id", "text", model)
      .collect().map(r => r.getSeq[Int](1).toSeq).head
    assert(got.contains(0), s"unseen char must hit unk: $got")
    val dec = model.decodeIds(got)
    assert(dec.contains(Bpe.UnkToken), s"unk decodes to its marker: $dec")
  }

  test("decodeIds: inverts bpeEncodeIds back to the normalized text on BOTH alphabets; loud on out-of-range and dangling") {
    val rows = Seq(
      (1L, "Low lower NEWEST café"), (2L, "widest low café zz"),
      (3L, ""))
    val docs = rows.toDF("doc_id", "text")
    for (alphabet <- Seq(Bpe.AlphabetChar, Bpe.AlphabetByte)) {
      val model = Bpe.bpeTrain(docs, "text", numMerges = 12,
        alphabet = alphabet)
      val enc = Bpe.bpeEncodeIds(docs, "doc_id", "text", model)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      rows.foreach { case (d, text) =>
        val want = TextFunctions.normalizeScala(text)
        assert(model.decodeIds(enc(d)) == want,
          s"[$alphabet] doc $d: ids do not decode back to '$want'")
      }
      // Out-of-range id: loud.
      val e = intercept[IllegalArgumentException] {
        model.decodeIds(Seq(model.vocab.length))
      }
      assert(e.getMessage.contains("outside vocab"), s"$e")
      // A truncated sequence (word not closed by an EOW token): loud.
      val open = model.tokenToId("l")
      val e2 = intercept[IllegalArgumentException] {
        model.decodeIds(Seq(open))
      }
      assert(e2.getMessage.contains("dangling"), s"$e2")
    }
  }

  test("pretok split: case-preserving letter/digit/symbol runs; recorded in meta; empty text is zero tokens") {
    assert(Bpe.pretokensOf("Hello, World2!  x", Bpe.PretokSplit).toSeq ==
      Seq("Hello", ",", "World", "2", "!", "x"))
    assert(Bpe.pretokensOf("", Bpe.PretokSplit).isEmpty)
    assert(Bpe.pretokensOf(null, Bpe.PretokSplit).isEmpty)
    // words mode is unchanged: lowercase, punctuation glued.
    assert(Bpe.pretokensOf("Hello, World2!", Bpe.PretokWords).toSeq ==
      Seq("hello,", "world2!"))
    val docs = Seq((1L, "Tick-tock, Tick-tock!"), (2L, ""))
      .toDF("doc_id", "text")
    val model = Bpe.bpeTrain(docs, "text", numMerges = 6,
      pretok = Bpe.PretokSplit)
    assert(model.pretok == Bpe.PretokSplit)
    // Case survives into the merge table ("Tick" repeats; "tick" from
    // the lowercased words mode would not exist).
    assert(model.vocab.exists(_.contains("T")),
      s"case erased: ${model.vocab}")
    // The mode survives the parquet round trip and drives encode.
    val dir = java.nio.file.Files.createTempDirectory("bpe-pretok-").toString
    model.write(dir)
    val loaded = Bpe.TokenizerModel.read(spark, dir)
    assert(loaded.pretok == Bpe.PretokSplit, "pretok marker lost")
    val live = Bpe.bpeCount(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stored = Bpe.bpeCount(docs, "doc_id", "text", loaded)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(live == stored && live(2L) == 0L,
      s"split-mode empty doc must be ZERO tokens: $live vs $stored")
    // decodeIds in split mode reconstructs the pretoken concatenation.
    val ids = Bpe.bpeEncodeIds(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(model.decodeIds(ids(1L)) == "Tick-tock,Tick-tock!")
    // Bogus mode: loud at train and at construction.
    val e = intercept[IllegalArgumentException] {
      Bpe.bpeTrain(docs, "text", 4, pretok = "bogus")
    }
    assert(e.getMessage.contains("pretokenizer"), s"$e")
    intercept[IllegalArgumentException] {
      Bpe.TokenizerModel(model.merges, Bpe.AlphabetChar, "bogus")
    }
  }

  test("pre-vocab char artifact: string tokens still work, ids fail loud; byte artifact synthesizes the canonical base") {
    val docs = Seq((1L, "low lower low")).toDF("doc_id", "text")
    val model = Bpe.bpeTrain(docs, "text", numMerges = 4)
    // Simulate the round-13 layout: merges + meta + commit, NO symbols.
    val dir = java.nio.file.Files.createTempDirectory("bpe-legacy-").toString
    model.merges.write.mode("overwrite").parquet(dir + "/merges")
    Seq("char").toDF("alphabet").write.mode("overwrite")
      .parquet(dir + "/meta")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(
      dir, Bpe.TokenizerModel.CommitMarker))
    val loaded = Bpe.TokenizerModel.read(spark, dir)
    // Counts: unaffected.
    assert(Bpe.bpeCount(docs, "doc_id", "text", loaded).count() == 1)
    // Ids: loud, with the retrain guidance.
    val e = intercept[IllegalArgumentException] { loaded.vocab }
    assert(e.getMessage.contains("symbol table"), s"$e")
    // Byte-level models never need a persisted symbol frame: the
    // canonical 256+sentinel base is data-independent.
    val byteDir = java.nio.file.Files.createTempDirectory("bpe-bytev-").toString
    val bm = Bpe.bpeTrain(docs, "text", numMerges = 4,
      alphabet = Bpe.AlphabetByte)
    bm.merges.write.mode("overwrite").parquet(byteDir + "/merges")
    Seq("byte").toDF("alphabet").write.mode("overwrite")
      .parquet(byteDir + "/meta")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(
      byteDir, Bpe.TokenizerModel.CommitMarker))
    val bLoaded = Bpe.TokenizerModel.read(spark, byteDir)
    assert(bLoaded.vocab == bm.vocab,
      "byte model vocab must not depend on the persisted symbol frame")
  }
}
