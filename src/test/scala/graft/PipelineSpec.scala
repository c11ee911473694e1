package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the approximate pipeline operators (the ones without
  * a SQL oracle): SimHash locality and LSH-ANN recall vs brute force.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("minhash near-dup finds pairs and they all verify >= 0.8 jaccard") {
    val pairs = SparkEntry.queries("p03_minhash_neardup")(spark, sf).collect()
    assert(pairs.nonEmpty, "sf0.001 documents contain planted near-dups")
    assert(pairs.forall(_.getDouble(2) >= 0.8))
  }

  test("simhash: near-dup pairs have small hamming distance, random pairs large") {
    val sim = SparkEntry.queries("p04_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDups = SparkEntry.queries("p03_minhash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dupDist = nearDups.map { case (a, b) => hamming(sim(a), sim(b)) }
    val rnd = new scala.util.Random(1)
    val ids = sim.keys.toArray
    val randDist = Seq.fill(200) {
      val (a, b) = (ids(rnd.nextInt(ids.length)), ids(rnd.nextInt(ids.length)))
      hamming(sim(a), sim(b))
    }
    assert(dupDist.max < 16, s"near-dup hamming too large: ${dupDist.toSeq}")
    assert(randDist.sum.toDouble / randDist.size > dupDist.sum.toDouble / dupDist.size,
      "random pairs should be farther apart than near-dups on average")
  }

  test("simhash token hash equals the DuckDB oracle's md5 hex-digit fold") {
    // single-token doc: every bit votes exactly once, so the fingerprint
    // IS the token hash — pin it against the fold the oracle SQL spells
    // out (first 15 hex digits of md5, folded a*16+digit), so a kernel
    // refactor can't silently break engine parity without DuckDB present
    for (tok <- Seq("hello", "x", "the quick", "émoji½")) {
      val word = tok.split(' ').head
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(word.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val folded = hex.take(15).foldLeft(0L)((a, c) =>
        a * 16 + java.lang.Long.parseLong(c.toString, 16))
      assert(queries.MinHashing.simhash(word) === folded,
        s"portable hash diverged from the oracle formula for '$word'")
    }
  }

  test("LSH ANN: deterministic, reranked, recall vs brute force") {
    val brute = SparkEntry.queries("p06_ann_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh1 = SparkEntry.queries("p07_ann_lsh")(spark, sf).collect()
    val lsh2 = SparkEntry.queries("p07_ann_lsh")(spark, sf).collect()
    assert(lsh1.map(_.toString).toSeq === lsh2.map(_.toString).toSeq, "must be deterministic")
    // per-query cosine must be non-increasing (reranked)
    lsh1.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val cs = rs.map(_.getDouble(2)).toSeq
      assert(cs === cs.sorted.reverse)
    }
    val hits = lsh1.map(r => (r.getLong(0), r.getLong(1))).count(brute)
    assert(hits.toDouble / brute.size >= 0.2,
      s"LSH recall vs brute force too low: $hits/${brute.size}")
  }

  test("IVF ANN: deterministic, reranked, recall vs brute force") {
    val brute = SparkEntry.queries("p06_ann_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf1 = SparkEntry.queries("p22_ann_ivf")(spark, sf).collect()
    val ivf2 = SparkEntry.queries("p22_ann_ivf")(spark, sf).collect()
    assert(ivf1.map(_.toString).toSeq === ivf2.map(_.toString).toSeq, "must be deterministic")
    ivf1.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val cs = rs.map(_.getDouble(2)).toSeq
      assert(cs === cs.sorted.reverse, "per-query cosine must be reranked")
    }
    val hits = ivf1.map(r => (r.getLong(0), r.getLong(1))).count(brute)
    assert(hits.toDouble / brute.size >= 0.2,
      s"IVF recall vs brute force too low: $hits/${brute.size}")
  }

  test("IVF ANN: sampled Lloyd training beats the first-N seed quantizer") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // (a) the k-means objective (mean nearest-centroid squared L2 over the
    // training sample, in the quantized integer space) must strictly
    // decrease — Lloyd iterations descend it by construction (up to the
    // ±0.5 centroid rounding, which is orders of magnitude below the
    // improvement at this data scale)
    val objSeed = graft.queries.IvfAnn.quantizerObjective(spark, sf, trained = false)
    val objTrained = graft.queries.IvfAnn.quantizerObjective(spark, sf, trained = true)
    assert(objTrained < objSeed,
      s"training must lower the quantizer objective: $objTrained !< $objSeed")
    // (b) recall at the entry's NProbe on UNBIASED queries (vec_id 100-119;
    // the default queries 0-4 are themselves seed centroids, so the seed
    // quantizer is accidentally overfit to them): trained must not lose.
    val e = graft.Tables.df(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    val unbiasedBrute = broadcast(q).join(e, col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        graft.functions.CosineSimilarity(spark, col("qe"), col("embedding")).as("cos"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 3)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(trained: Boolean): Int =
      graft.queries.IvfAnn.query(spark, sf, trained, queryRange = (100L, 120L))
        .collect().map(r => (r.getLong(0), r.getLong(1))).count(unbiasedBrute)
    val (seedR, trainedR) = (recall(trained = false), recall(trained = true))
    assert(trainedR >= seedR,
      s"trained recall $trainedR/${unbiasedBrute.size} regressed vs seed $seedR")
  }

  test("embedding near-dup: LSH candidates reach full recall at a permissive threshold") {
    // brute-force pairs at cos >= 0.4 on real data (some exist, none >= 0.9)
    val e = Tables.df(spark, sf, "embeddings")
    val brute = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("vb"), col("embedding").as("eb")))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        graft.functions.CosineSimilarity(spark, col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "data should contain some moderately-similar pairs")
    val lsh = graft.queries.Pipeline.embeddingNearDupPairs(spark, sf, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH output must be exact-verified")
    // theory for 8 tables x 6 hyperplanes at cos>=0.4: recall ~= 0.41; the
    // dedup-relevant regime (cos>=0.95) is >=0.9999. Assert above the
    // theoretical floor with margin.
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.35, s"candidate recall too low: ${lsh.size}/${brute.size}")
  }

  test("margin-probe recall: the corpus-scaled extra-planes path finds every dedup pair") {
    // no gate SF reaches the extra-planes branch (sf0.01 sits at the
    // 6-plane minimum), so pin it here at a FORCED 8 planes — the count a
    // 10x corpus gets — on the test corpus: margin-directed single-probe
    // candidates must still contain every exact pair at the dedup
    // threshold. Theory at cos>=0.9, 8 planes x 8 tables: no-probe recall
    // ~0.94, full-Hamming-1 ~0.9999, margin-probe sits in between at a
    // ninth of the full probe's candidate volume.
    val e = Tables.df(spark, sf, "embeddings")
    val thresh = 0.9
    val brute = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("vb"), col("embedding").as("eb")))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        graft.functions.CosineSimilarity(spark, col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= thresh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.queries.Pipeline
      .embeddingNearDupPairsAt(spark, e, planes = 8, thresh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "margin-probe output must be exact-verified")
    assert(lsh == brute,
      s"margin-probe missed dedup pairs: found ${lsh.size} of ${brute.size}")
  }

  test("LSH plane count scales with corpus size, clamped") {
    import graft.queries.Pipeline.lshPlanesFor
    assert(lshPlanesFor(500) === 6, "small corpora keep the minimum")
    assert(lshPlanesFor(128 * 1024) === 10)
    assert(lshPlanesFor(1000000000L) === 20, "clamped at the maximum")
    // monotone non-decreasing over a broad sweep
    val sizes = Seq(100L, 1000L, 10000L, 100000L, 1000000L, 100000000L)
    val planes = sizes.map(lshPlanesFor)
    assert(planes === planes.sorted)
  }

  test("LSH buckets stay bounded on a skew-heavy synthetic corpus") {
    import spark.implicits._
    // lognormal-ish skew: clustered directions + heavy-tailed magnitudes
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(4, 64)(rnd.nextGaussian())
    val n = 8192
    val vecs = (0 until n).map { i =>
      val c = centers(rnd.nextInt(4))
      val scale = math.exp(rnd.nextGaussian()).toFloat
      (i.toLong, c.map(x => ((x + 0.3 * rnd.nextGaussian()) * scale).toFloat))
    }
    val planes = graft.queries.Pipeline.lshPlanesFor(n) // 8192/128 -> 6 bits... at least min
    val df = vecs.toDF("vec_id", "embedding")
    val sizes = df.select(
      graft.queries.Pipeline.lshBucket(spark, col("embedding"), 0, planes).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    val expected = n.toDouble / (1 << planes)
    // clustered data concentrates buckets, but the derived plane count must
    // keep the worst bucket within a small multiple of the target
    assert(sizes.max <= 16 * expected,
      s"max bucket ${sizes.max} vs expected $expected at $planes planes")
  }

  test("ngram banding: near-identical docs collide, trigram kernel is exact") {
    import graft.queries.MinHashing._
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = a.replace("today", "todaz") // tiny edit: trigram jaccard ~0.95
    val c = "completely different content with other words entirely here now"
    val Some((gsA, mhA)) = ngramSignature(a)
    val Some((gsB, mhB)) = ngramSignature(b)
    val Some((_, mhC)) = ngramSignature(c)
    assert(gsA.length === trigramSet(a).length, "one hash per distinct trigram")
    assert(gsA.toSeq === gsA.toSeq.sorted, "hash set must be sorted")
    assert(gsA.length === gsA.toSet.size, "trigram hash set must be distinct")
    // hashed-set jaccard equals string-set jaccard (no collisions here)
    val sim = gsA.toSet.intersect(gsB.toSet).size.toDouble / gsA.toSet.union(gsB.toSet).size
    val simStr = trigramSet(a).toSet.intersect(trigramSet(b).toSet).size.toDouble /
      trigramSet(a).toSet.union(trigramSet(b).toSet).size
    assert(sim === simStr)
    def bandHits(x: Array[Long], y: Array[Long]): Int =
      (0 until NgramHashes / NgramBandRows).count { band =>
        (0 until NgramBandRows).forall(r =>
          x(band * NgramBandRows + r) == y(band * NgramBandRows + r))
      }
    assert(bandHits(mhA, mhB) > 0, "near-identical docs must share a band")
    assert(bandHits(mhA, mhC) === 0, "unrelated docs must not")
  }

  test("multimodal decode stub: byte lengths and brightness bounds hold") {
    val out = SparkEntry.queries("p08_multimodal")(spark, sf)
    val expect = Tables.df(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).as("expect"))
    val mismatches = out.select("doc_id", "byte_len")
      .join(expect, "doc_id")
      .filter(col("byte_len") =!= col("expect")).count()
    assert(mismatches === 0, "ascii text: byte length == char length")
    assert(out.filter(col("brightness") < 0 || col("brightness") > 1).count() === 0)
  }

  test("near-dup purge keeps exactly one representative per near-dup cluster") {
    val docs = Tables.df(spark, sf, "documents").select("doc_id")
    val survivors = SparkEntry.queries("p19_neardup_purge")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val pairs = SparkEntry.queries("p03_minhash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // every pair lost at least one side; the one kept is the cluster min
    pairs.foreach { case (a, b) =>
      assert(!(survivors(a) && survivors(b)), s"pair ($a,$b) both survived")
    }
    // survivors + purged partition the corpus
    val total = docs.count()
    val purged = pairs.flatMap { case (a, b) => Seq(a, b) }.toSet -- survivors
    assert(survivors.size + purged.size === total)
  }

  test("stratified sample is deterministic and rebalances languages") {
    val s1 = SparkEntry.queries("p17_stratified_sample")(spark, sf).collect()
    val s2 = SparkEntry.queries("p17_stratified_sample")(spark, sf).collect()
    assert(s1.map(_.toString).toSeq === s2.map(_.toString).toSeq, "hash rule is deterministic")
    val perLang = s1.groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length }
    // Bernoulli at rate target/cnt: expected 40 per lang, allow 3-sigma slack
    perLang.foreach { case (l, n) =>
      assert(n > 10 && n < 80, s"lang $l sampled $n docs, expected ~40")
    }
  }

  test("decontaminate drops exactly the docs sharing an 8-gram with the eval set") {
    val out = SparkEntry.queries("p18_decontaminate")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(t: String): Set[String] =
      t.split(' ').sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    val bench = docs.filter(_._2 == "src0").flatMap(d => grams(d._3)).toSet
    docs.filter(_._2 != "src0").foreach { case (id, _, text) =>
      val contaminated = grams(text).exists(bench)
      assert(out(id) === !contaminated, s"doc $id contamination=$contaminated survived=${out(id)}")
    }
  }

  test("bloom decontaminate flags exactly the complement of p18's survivors") {
    // p24 (bloom prefilter + exact confirm) and p18 (plain broadcast
    // semi-join) implement the same contamination rule from opposite ends:
    // flagged(p24) must equal corpus \ survivors(p18), which proves the
    // bloom pass lost nothing (no false negatives) and the confirm join
    // killed every false positive.
    val flagged = SparkEntry.queries("p24_bloom_decontaminate")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val survivors = SparkEntry.queries("p18_decontaminate")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val corpus = Tables.df(spark, sf, "documents")
      .filter(col("source") =!= "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(flagged === (corpus -- survivors))
    assert((flagged & survivors).isEmpty)
  }

  test("chunk overlap: geometry covers every token and md5s chain correctly") {
    val chunks = SparkEntry.queries("p25_chunk_overlap")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val docs = Tables.df(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, rs) =>
      val toks = docs(id).split(' ')
      val sorted = rs.sortBy(_._2)
      // starts advance by the stride, first at 0, and every token is covered
      assert(sorted.head._3 === 0L)
      sorted.foreach { case (_, idx, st, n, m) =>
        assert(st === idx * 192)
        assert(n === math.min(256, toks.length - st).toLong)
        val expect = toks.slice(st.toInt, st.toInt + 256).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(expect.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(m === md, s"doc $id chunk $idx content mismatch")
      }
      assert(sorted.last._3 + sorted.last._4 === toks.length.toLong,
        s"doc $id chunks must cover the tail")
    }
  }

  test("keyword extract: rarity weighting prefers rarer terms at equal tf") {
    val rows = SparkEntry.queries("p26_keyword_extract")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.length <= 3)
      val scores = rs.sortBy(_._2).map(_._6)
      assert(scores === scores.sorted.reverse, s"doc $id ranks out of score order")
    }
    // the score formula itself: tf x (N - df)
    val n = Tables.df(spark, sf, "documents").count()
    rows.foreach { case (_, _, _, tf, df, score) =>
      assert(score === tf * (n - df))
    }
  }

  test("PQ encode: deterministic, codes in range, exact recon error") {
    val e1 = SparkEntry.queries("p27_pq_encode")(spark, sf).collect()
    val e2 = SparkEntry.queries("p27_pq_encode")(spark, sf).collect()
    assert(e1.map(_.toString).toSeq === e2.map(_.toString).toSeq, "must be deterministic")
    val total = Tables.df(spark, sf, "embeddings").count()
    assert(e1.length.toLong === total, "every vector gets a code word")
    e1.foreach { r =>
      // codes ship as the comma-joined string (driver-sortable; see p27 doc)
      val codes = r.getString(1).split(",").map(_.toInt).toSeq
      assert(codes.length === 8, "8 subspaces")
      assert(codes.forall(c => c >= 0 && c < 16), "4-bit codes")
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("PQ training: sampled Lloyd lowers reconstruction error vs the seed codebook") {
    val seed = graft.queries.PqAnn.sampleObjective(spark, sf, trained = false)
    val trained = graft.queries.PqAnn.sampleObjective(spark, sf, trained = true)
    assert(trained <= seed,
      s"k-means monotonicity violated on the training sample: $trained > $seed")
    assert(trained < seed, s"training should strictly improve here: $trained vs $seed")
  }

  test("PQ ADC search: deterministic, reranked, recall vs brute force") {
    val brute = SparkEntry.queries("p06_ann_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq1 = SparkEntry.queries("p28_ann_pq")(spark, sf).collect()
    val pq2 = SparkEntry.queries("p28_ann_pq")(spark, sf).collect()
    assert(pq1.map(_.toString).toSeq === pq2.map(_.toString).toSeq, "must be deterministic")
    pq1.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val cs = rs.map(_.getDouble(2)).toSeq
      assert(cs === cs.sorted.reverse, "per-query cosine must be reranked")
    }
    val hits = pq1.map(r => (r.getLong(0), r.getLong(1))).count(brute)
    assert(hits.toDouble / brute.size >= 0.2,
      s"PQ-ADC recall vs brute force too low: $hits/${brute.size}")
  }

  test("IVF-PQ: deterministic, reranked, candidates within probed cells only") {
    val r1 = SparkEntry.queries("p29_ann_ivfpq")(spark, sf).collect()
    val r2 = SparkEntry.queries("p29_ann_ivfpq")(spark, sf).collect()
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq, "must be deterministic")
    assert(r1.nonEmpty)
    r1.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val cs = rs.map(_.getDouble(2)).toSeq
      assert(cs === cs.sorted.reverse, "per-query cosine must be reranked")
    }
    // composing IVF routing over the PQ scorer can only shrink the candidate
    // set vs full-corpus ADC: every IVF-PQ hit at equal shortlist should be
    // one the unrouted ADC search (p28) could also reach or better — so
    // recall vs brute force stays in the same regime
    val brute = SparkEntry.queries("p06_ann_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = r1.map(r => (r.getLong(0), r.getLong(1))).count(brute)
    assert(hits.toDouble / brute.size >= 0.2,
      s"IVF-PQ recall vs brute force too low: $hits/${brute.size}")
  }

  test("simhash banding is EXACT for hamming <= 3 (pigeonhole vs all-pairs)") {
    val banded = SparkEntry.queries("p48_simhash_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over every pair of fingerprints — feasible at test SF
    val sh = SparkEntry.queries("p04_simhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- sh; (idb, sb) <- sh if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ida, idb, h)).toSet
    assert(banded === brute,
      s"banded pair set must equal all-pairs exactly " +
        s"(banded=${banded.size}, brute=${brute.size})")
    assert(brute.nonEmpty, "corpus must contain simhash near-dups to exercise this")
  }

  test("budgetSelect equals the naive global-window cut at every edge budget") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // tie-heavy scores: 7 distinct n_chars buckets shared by ~30 docs each,
    // so bucket boundaries (the only nontrivial branch) are exercised; tok
    // varies within a bucket to catch any key/order mixup
    val docs = (1L to 200L).map { id =>
      val nc = 10 + (id % 7) * 5
      (id, nc, nc / 4 + id % 3)
    }.toDF("doc_id", "n_chars", "tok").repartition(8).cache()
    val total = docs.agg(sum("tok")).as[Long].head()
    // bucket cumulative edges in (n_chars DESC) order: the budgets where
    // the boundary bucket flips — test one below, exactly at, one above
    val edges = docs.groupBy("n_chars").agg(sum("tok").as("btok"))
      .orderBy(col("n_chars").desc).select("btok").as[Long].collect()
      .scanLeft(0L)(_ + _).drop(1)
    val budgets = (Seq(0L, 1L, total / 2, total, total + 100) ++
      edges.flatMap(e => Seq(e - 1, e, e + 1))).distinct
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for (b <- budgets) {
      val naive = docs.withColumn("cum", sum(col("tok")).over(w))
        .filter(col("cum") <= b).select("doc_id").as[Long].collect().toSet
      val fast = graft.queries.Corpus.budgetSelect(docs, Seq(b).toDF("budget"))
        .select("doc_id").as[Long].collect().toSet
      assert(fast == naive,
        s"budget $b: two-phase selected ${fast.size}, naive ${naive.size}")
    }
  }
}
