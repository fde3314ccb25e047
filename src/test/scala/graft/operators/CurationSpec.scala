package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class CurationSpec extends AnyFunSuite with Matchers with SparkSpec {

  import org.apache.spark.sql.functions._

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("deterministicSplit: stable across runs, covers all rows, roughly honors weights") {
    val s = spark
    import s.implicits._
    val df = (1L to 10000L).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curation.deterministicSplit(df, "doc_id", splits)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    counts.values.sum shouldBe 10000L
    counts("train").toDouble shouldBe 8000.0 +- 300
    counts("val").toDouble shouldBe 1000.0 +- 150
    counts("test").toDouble shouldBe 1000.0 +- 150

    // byte-identical on a re-run (the whole point vs rand())
    val again = Curation.deterministicSplit(df, "doc_id", splits)
      .orderBy("doc_id").collect().map(_.getString(1))
    out.orderBy("doc_id").collect().map(_.getString(1)) shouldBe again
  }

  test("deterministicSplit: appending rows never moves existing assignments") {
    val s = spark
    import s.implicits._
    val splits = Seq("train" -> 0.9, "test" -> 0.1)
    val small = Curation.deterministicSplit((1L to 500L).toDF("doc_id"),
      "doc_id", splits).orderBy("doc_id").collect().map(_.getString(1))
    val grown = Curation.deterministicSplit((1L to 1000L).toDF("doc_id"),
      "doc_id", splits).filter(col("doc_id") <= 500)
      .orderBy("doc_id").collect().map(_.getString(1))
    grown shouldBe small
  }

  test("shard: complete positions per shard, append-stable assignment, salts draw new orders") {
    val s = spark
    import s.implicits._
    val df = (1L to 800L).toDF("doc_id")
    val sharded = Curation.shard(df, nShards = 4, idCol = "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    sharded.length shouldBe 800
    sharded.map(_._2).distinct.sorted shouldBe Array(0, 1, 2, 3)
    // positions within each shard are exactly 1..n — a gap or dup would
    // corrupt the training order
    sharded.groupBy(_._2).foreach { case (_, rows) =>
      rows.map(_._3).sorted shouldBe (1L to rows.length).toArray
    }
    // appending rows never moves an existing doc's shard (hash of id only)
    val grownShard = Curation.shard((1L to 1600L).toDF("doc_id"), 4, "doc_id")
      .filter(col("doc_id") <= 800)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    sharded.foreach { case (id, sh, _) => grownShard(id) shouldBe sh }
    // a different salt is a different epoch order
    val other = Curation.shard(df, 4, "doc_id", salt = "epoch2")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val base = sharded.map(t => t._1 -> ((t._2, t._3))).toMap
    base should not equal other
  }

  test("samplePerGroup: exact n per group, deterministic, different salts differ") {
    val s = spark
    import s.implicits._
    val df = (1 to 900).map(i => (i.toLong, s"g${i % 3}")).toDF("doc_id", "g")
    val sampled = Curation.samplePerGroup(df, Seq("g"), 10, "doc_id")
    sampled.groupBy("g").count().collect()
      .map(_.getLong(1)).toSeq shouldBe Seq(10L, 10L, 10L)

    val ids1 = sampled.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val ids2 = Curation.samplePerGroup(df, Seq("g"), 10, "doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    ids1 shouldBe ids2
    val other = Curation.samplePerGroup(df, Seq("g"), 10, "doc_id", salt = "other")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    ids1 should not be other
  }

  test("sampleStratified: exact budget, proportional quotas, largest-remainder ties, determinism") {
    val s = spark
    import s.implicits._
    // skewed strata: 600/250/100/50 of 1000 — a 97-row budget forces
    // fractional quotas (58.2/24.25/9.7/4.85 → floors 58/24/9/4 = 95,
    // two leftover seats go to the largest remainders .85 (g3) and .7 (g2))
    val df = (1 to 1000).map { i =>
      val g = if (i <= 600) "g0" else if (i <= 850) "g1"
        else if (i <= 950) "g2" else "g3"
      (i.toLong, g)
    }.toDF("doc_id", "g")
    val out = Curation.sampleStratified(df, Seq("g"), 97L, "doc_id")
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byG shouldBe Map("g0" -> 58L, "g1" -> 24L, "g2" -> 10L, "g3" -> 5L)
    // exact budget, deterministic draw
    out.count() shouldBe 97L
    val ids1 = out.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val ids2 = Curation.sampleStratified(df, Seq("g"), 97L, "doc_id")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    ids1 shouldBe ids2
    // a budget above the corpus returns everything (quotas cap at size)
    Curation.sampleStratified(df, Seq("g"), 2000L, "doc_id")
      .count() shouldBe 1000L
  }

  test("contamination finds the planted copy and ignores disjoint docs") {
    val shared = (1 to 30).map(i => s"tok$i").mkString(" ")
    val train = docs((1L, shared), (2L, "completely different training text here"))
    val test = docs(
      (10L, shared),                                   // full copy
      (11L, (5 to 12).map(i => s"tok$i").mkString(" ")), // partial overlap
      (12L, "nothing in common with anything at all zz"))
    val out = Curation.contamination(train, test).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(10L) shouldBe 28L // 30 tokens → 28 distinct 3-shingles
    out(11L) shouldBe 6L  // 8 tokens → 6 shingles, all inside the copy
    out.contains(12L) shouldBe false
  }

  test("groupedSplit: duplicate clusters land whole in one split; singletons keep their solo fate") {
    val s = spark
    import s.implicits._
    // ids 1..60 as singleton docs plus a 3-member duplicate cluster
    val d = (1L to 60L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val groups = Seq((10L, 10L), (25L, 10L), (40L, 10L)).toDF("id", "group_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curation.groupedSplit(d, groups, "doc_id", splits).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    out should have size 60
    // the whole cluster shares member 10's fate
    out(25L) shouldBe out(10L)
    out(40L) shouldBe out(10L)
    // ungrouped docs are split exactly as the plain splitter would
    val solo = Curation.deterministicSplit(d, "doc_id", splits).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    (1L to 60L).filterNot(Set(25L, 40L)).foreach { i =>
      out(i) shouldBe solo(i)
    }
  }

  test("contaminationFuzzy flags the edited near-copy exact overlap would dilute; modes agree") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    // last token edited: Jaccard vs base ≈ 36/41 distinct shingles ≈ 0.88
    val edited = (1 to 40).map(i => if (i == 40) "changed" else s"tok$i").mkString(" ")
    val train = docs(
      (2L, edited),
      (4L, "completely different training text goes right here"))
    val test = docs(
      (11L, base),
      (13L, "nothing in common with anything at all zz yy"))
    val out = Curation.contaminationFuzzy(train, test, threshold = 0.5,
        numHashes = 64, bands = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.map(_._1).toSet shouldBe Set(2L)
    val (_, nMatches, bestId, bestJ) = out.head
    nMatches shouldBe 1L
    bestId shouldBe 11L
    bestJ should be > 0.8
    bestJ should be < 1.0
    // the portable md5 mode agrees through the same function
    val p = Curation.contaminationFuzzy(train, test, threshold = 0.5,
        numHashes = 64, bands = 32, portable = true, maxId = 300L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    p shouldBe out
  }

  test("chunkDocuments: stride windows with overlap, short docs are one chunk") {
    val d = docs(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"))                                    // short: single chunk
    // maxTokens=4, overlap=1 → stride 3 → starts 0,3,6,9
    val out = Curation.chunkDocuments(d, maxTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
    val c1 = out.filter(_.getLong(0) == 1L)
    c1.map(_.getLong(1)).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    c1.map(_.getString(2)).toSeq shouldBe Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10")
    c1.map(_.getInt(3)).toSeq shouldBe Seq(4, 4, 4, 1)
    val c2 = out.filter(_.getLong(0) == 2L)
    c2.map(r => (r.getLong(1), r.getString(2), r.getInt(3))).toSeq shouldBe
      Seq((0L, "a b", 2))
  }

  test("packSequences: greedy bins respect the budget; oversized docs get their own bin") {
    val s = spark
    import s.implicits._
    // shard 0 (ids 0..9): tokens 60,60,60 → bins (0)(1)(2)? greedy:
    // 60 → bin0(60); +60 > 100 → bin1(60); +60 > 100 → bin2.
    // then 30,30 → bin2 had 60, +30=90 ok, +30 > 100 → bin3.
    // id 5: 250 > budget alone → closes bin3, own bin4.
    val d = Seq(
      (0L, 60L), (1L, 60L), (2L, 60L), (3L, 30L), (4L, 30L), (5L, 250L),
      (100L, 10L), (101L, 10L)) // separate shard restarts at bin 0
      .toDF("doc_id", "tok")
    val out = Curation.packSequences(d, tokenCol = col("tok"),
        budget = 100, shardSize = 100L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 2L), (4L, 0L, 3L),
      (5L, 0L, 4L), (100L, 1L, 0L), (101L, 1L, 0L))
    // no bin over budget except single-doc oversize bins
    val sums = d.withColumn("shard", (col("doc_id") / 100).cast("long"))
      .join(Curation.packSequences(d, tokenCol = col("tok"),
        budget = 100, shardSize = 100L), Seq("doc_id", "shard"))
      .groupBy("shard", "bin")
      .agg(sum("tok").as("t"), count(lit(1)).as("n")).collect()
    sums.foreach { r =>
      assert(r.getLong(2) <= 100 || r.getLong(3) == 1L,
        s"overfull multi-doc bin: $r")
    }
  }

  test("dsirSelect: target look-alikes outrank aliens, bigram order matters, " +
      "target docs never selected, weights match an independent reference") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta alpha", true),
      (10L, "alpha beta alpha beta", false), // verbatim target look-alike
      (11L, "beta alpha beta alpha", false), // same unigrams, scrambled bigrams
      (12L, "alpha beta gamma delta", false), // half in-domain
      (13L, "gamma delta gamma delta", false)) // alien
    val df = rows.toDF("doc_id", "text", "is_t")
    val out = Curation.dsirSelect(df, col("is_t"), n = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList

    // only raw-pool docs are selected
    out.map(_._1).sorted shouldBe List(10L, 11L, 12L, 13L)

    // independent reference: unigram+bigram models with add-1 smoothing,
    // floor(ln·1e6) longs, integer doc sums
    def feats(text: String): Seq[String] = {
      val w = text.toLowerCase.trim.split("\\s+").toSeq
      (w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
        .filter(_.nonEmpty)
    }
    val tgt = rows.filter(_._3).flatMap(r => feats(r._2))
    val raw = rows.filterNot(_._3).flatMap(r => feats(r._2))
    val ct = tgt.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = raw.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = (ct.keySet ++ cr.keySet).size.toLong
    def fl(x: Double): Long = math.floor(math.log(x) * 1e6).toLong
    def wMil(t: String): Long =
      fl((ct.getOrElse(t, 0L) + 1).toDouble / (tgt.size + v)) -
        fl((cr.getOrElse(t, 0L) + 1).toDouble / (raw.size + v))
    val expected = rows.filterNot(_._3).map { r =>
      val fs = feats(r._2)
      (r._1, fs.map(wMil).sum, fs.size.toLong)
    }.sortBy(t => (-t._2, t._1))
      .zipWithIndex.map { case ((id, w, nf), i) => (id, w, nf, i + 1L) }
    out shouldBe expected

    val rankOf = out.map(t => t._1 -> t._4).toMap
    rankOf(10L) shouldBe 1L // the verbatim look-alike wins
    rankOf(10L) should be < rankOf(11L) // bigram order sensitivity
    rankOf(13L) shouldBe 4L // the alien loses

    // n truncates the ranked take
    Curation.dsirSelect(df, col("is_t"), n = 2)
      .collect().map(_.getLong(0)).toList shouldBe
      out.take(2).map(_._1)
  }

  test("dsirSelectHashed: collision-free bucket space reproduces the exact " +
      "selection in both hash modes; tiny bucket space still selects n") {
    val s = spark
    import s.implicits._
    // small-vocabulary corpus: ~60 distinct unigram+bigram features into
    // 10k buckets — if no two features collide, bucket counts equal term
    // counts, v (observed buckets) equals the vocabulary size, and the
    // hashed pipeline must land on EXACTLY the exact-model selection.
    // Collision-freedom is asserted, not assumed, so the equality check
    // can never silently weaken.
    val rows = (1L to 40L).map { i =>
      val words = Seq("alpha", "beta", "gamma", "delta", "eps")
      val text = (0 until 6).map(j => words(((i + j) % 5).toInt)).mkString(" ")
      (i, text + (if (i % 4 == 0) " omega" else ""), i % 3 == 0)
    }
    val df = rows.toDF("doc_id", "text", "is_t")
    def ids(out: org.apache.spark.sql.DataFrame): List[(Long, Long, Long, Long)] =
      out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toList.sortBy(_._1)

    val feats = df.select(explode(concat(
        split(lower(trim(col("text"))), "\\s+"),
        expr("""transform(sequence(2, size(split(lower(trim(text)), '\\s+'))),
          i -> concat(element_at(split(lower(trim(text)), '\\s+'), i - 1), ' ',
                      element_at(split(lower(trim(text)), '\\s+'), i)))""")))
        .as("term")).distinct()
    Seq(
      pmod(xxhash64(col("term")), lit(10000L)),
      pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"),
        lit(10000L))).foreach { bucket =>
      val nTerms = feats.count()
      val nBuckets = feats.select(bucket).distinct().count()
      nBuckets shouldBe nTerms // collision-free premise, asserted
    }

    val exact = ids(Curation.dsirSelect(df, col("is_t"), n = 15))
    ids(Curation.dsirSelectHashed(df, col("is_t"), n = 15,
      numBuckets = 10000)) shouldBe exact
    ids(Curation.dsirSelectHashed(df, col("is_t"), n = 15,
      numBuckets = 10000, hashMode = "md5")) shouldBe exact

    // graceful degradation: a bucket space far smaller than the
    // vocabulary (the 100 TB regime in miniature) still yields a full,
    // deterministic top-n of raw-pool docs — the weight model is bounded
    // by numBuckets, never by the corpus
    val tiny = Curation.dsirSelectHashed(df, col("is_t"), n = 15,
      numBuckets = 8).collect()
    tiny.length shouldBe 15
    tiny.map(_.getLong(3)).sorted.toList shouldBe (1L to 15L).toList
    val rawIds = rows.filterNot(_._3).map(_._1).toSet
    tiny.map(_.getLong(0)).foreach(id => assert(rawIds.contains(id)))
  }

  test("hashed and string contamination agree on the real corpus") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = d.filter(col("doc_id") % 2 === 0)
    val test = d.filter(col("doc_id") % 2 =!= 0)
    val hashed = Curation.contamination(train, test, hashShingles = true)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val strings = Curation.contamination(train, test, hashShingles = false)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    hashed shouldBe strings
  }
}
