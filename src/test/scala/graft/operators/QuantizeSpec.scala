package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Symmetric int8 quantization semantics + reconstruction audit. */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codes are half-up floored, scale is max abs, zero vectors survive") {
    val vecs = Seq(
      (1L, Array(2.0f, -1.0f, 0.5f)), // scale 2: codes 127, -63 (floor(-63.0)), 32 (floor 32.25+?)
      (2L, Array(0.0f, 0.0f, 0.0f))   // all-zero: scale 0, codes 0
    ).toDF("vec_id", "embedding")
    val out = Quantize.int8(vecs, "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getSeq[Int](3)))).toMap
    assert(out(1L)._1 == 2.0)
    // x*127/scale + 0.5 floored: 2.0 -> 127.5 -> 127; -1.0 -> -63.0 -> -63;
    // 0.5 -> 32.25 -> 32
    assert(out(1L)._2 == Seq(127, -63, 32))
    assert(out(2L)._1 == 0.0 && out(2L)._2 == Seq(0, 0, 0))
  }

  test("audit reports exact reconstruction for representable values") {
    // values that are exact multiples of scale/127 reconstruct exactly
    val vecs = Seq((1L, Array(127.0f, -64.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Quantize.int8Audit(vecs, "vec_id", "embedding").collect().head
    assert(r.getDouble(1) == 127.0) // scale
    assert(r.getDouble(2) == 0.0)   // max_err: codes 127, -64, 0 exact
    assert(r.getDouble(3) == 0.0)
  }

  test("audit bounds error by half a quantization step") {
    val vecs = Seq((1L, Array.tabulate(64)(i => (math.sin(i) * 3).toFloat)))
      .toDF("vec_id", "embedding")
    val r = Quantize.int8Audit(vecs, "vec_id", "embedding").collect().head
    val scale = r.getDouble(1)
    assert(r.getDouble(2) <= scale / 127 / 2 + 1e-12) // half-step bound
    assert(r.getDouble(3) <= r.getDouble(2))
  }

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("pqEncode: m codes in [0, k); codebook rows encode to themselves") {
    val m = 4
    val every = 25
    val k = emb.filter(org.apache.spark.sql.functions.col("vec_id") % every === 0)
      .count().toInt
    val out = Quantize.pqEncode(emb, "vec_id", "embedding", m, every)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out.size == emb.count())
    assert(out.values.forall(c => c.length == m && c.forall(e => e >= 0 && e < k)))
    // self-consistency: a codebook row's own subvectors are at distance 0
    // from its own entry, so every subspace code must be its dense rank
    val sampleIds = emb.filter(org.apache.spark.sql.functions.col("vec_id") % every === 0)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    sampleIds.zipWithIndex.foreach { case (id, rank) =>
      assert(out(id) == Seq.fill(m)(rank.toLong),
        s"codebook row $id (rank $rank) does not encode to itself: ${out(id)}")
    }
    // determinism
    val again = Quantize.pqEncode(emb, "vec_id", "embedding", m, every)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again == out)
  }

  test("plan: the PQ encoder evaluates ONCE per corpus row — no " +
    "pq_codes inside a Filter condition") {
    // the codes.isNotNull guard used to substitute the full m-subspace
    // encoder below the projection (2x per row; 3x behind the q83
    // explode) — the pinned alias keeps filters on the attribute
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (k, subDim, flat) =
      Quantize.pqCodebook(emb, "vec_id", "embedding", m = 4, every = 20)
    for (df <- Seq(
      Quantize.pqAdcTopKWith(emb, "vec_id", "embedding", queryId = 0L,
        kNN = 5, m = 4, k = k, subDim = subDim, flat = flat),
      Quantize.pqAdcTopKBatchWith(emb, emb.filter(
        org.apache.spark.sql.functions.col("vec_id") < 3),
        "vec_id", "embedding", kNN = 5, m = 4, k = k, subDim = subDim,
        flat = flat))) {
      val bad = df.queryExecution.optimizedPlan.toString.linesIterator
        .filter(l => l.trim.stripPrefix("+- ").stripPrefix(":- ")
          .startsWith("Filter ") && l.contains("pq_codes"))
        .toSeq
      assert(bad.isEmpty, s"PQ encoder duplicated into a filter:\n$bad")
    }
  }

  test("pqEncode: malformed vectors carry NULL codes, rows survive") {
    val bad = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),  // subsample row: dim 4, m=2 ok
      (7L, Array(1.0f, 2.0f))               // wrong dimension -> NULL
    ).toDF("vec_id", "embedding")
    val out = Quantize.pqEncode(bad, "vec_id", "embedding", m = 2, every = 2)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(0L).nonEmpty && out(7L).isEmpty)
  }

  test("IVF-PQ index: full-probe indexed ADC equals the direct operator; " +
    "small probe prunes to exactly nprobe partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val m = 4
    val every = 25
    Quantize.pqWriteIndex(emb, "vec_id", "embedding", dir, m, every,
      centroidEvery = 50)
    // layout: cell partitions on disk, no vector column in the data
    val cellDirs = new java.io.File(s"$dir/data").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs == 10) // 500 rows / centroidEvery 50
    val dataCols = spark.read.parquet(s"$dir/data").columns.toSet
    assert(dataCols == Set("vec_id", "codes", "cell"),
      s"index must store codes, not vectors: $dataCols")
    assert(spark.read.parquet(s"$dir/data").count() == emb.count())

    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    // probing EVERY cell makes the indexed ADC exact-equal to the direct
    // operator (modulo the query row, which the direct operator excludes
    // and the index does not — drop it before comparing)
    val indexed = Quantize.pqAdcTopKIndexed(spark, dir, "vec_id", q,
      kNN = 11, nprobe = cellDirs)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .filter(_._1 != 0L).take(10).toSeq
    val direct = Quantize.pqAdcTopK(emb, "vec_id", "embedding", queryId = 0L,
      kNN = 10, m = m, every = every)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed == direct)

    // pruning: a 2-cell probe opens exactly 2 partition directories
    val res = Quantize.pqAdcTopKIndexed(spark, dir, "vec_id", q,
      kNN = 5, nprobe = 2)
    res.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(qs.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    val parts = scans(res.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("data")))
      .map(_.selectedPartitions.partitionCount)
    assert(parts.nonEmpty && parts.forall(_ == 2), s"scanned $parts")
  }

  test("pqAdcTopK matches a driver-side brute-force ADC re-ranking") {
    val m = 4
    val every = 25
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val cb = rows.filter(_._1 % every == 0).sortBy(_._1).map(_._2)
    val k = cb.length
    val subDim = 64 / m
    val q = rows.find(_._1 == 0L).get._2
    def sub(v: Array[Double], j: Int) = v.slice(j * subDim, (j + 1) * subDim)
    def d2(a: Array[Double], b: Array[Double]) = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val want = rows.filter(_._1 != 0L).map { case (id, v) =>
      val dist = (0 until m).map { j =>
        val code = (0 until k).minBy(e => (d2(sub(v, j), sub(cb(e), j)), e))
        d2(sub(q, j), sub(cb(code), j))
      }.reduce(_ + _)
      (id, dist)
    }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSeq
    val got = Quantize.pqAdcTopK(emb, "vec_id", "embedding", queryId = 0L,
      kNN = 10, m = m, every = every)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("lloyd: deterministic, separates clear clusters, ties to lowest index") {
    // two tight blobs far apart — Lloyd's from the stride init must land
    // one centroid in each and average its members
    val blobA = Array.tabulate(10)(i => Array(10.0 + i * 0.01, 0.0))
    val blobB = Array.tabulate(10)(i => Array(-10.0 - i * 0.01, 5.0))
    val pts = blobA ++ blobB
    val cents = Quantize.lloyd(pts, 2, 8)
    assert(cents.length == 2)
    val (nearA, nearB) = (cents.find(_(0) > 0).get, cents.find(_(0) < 0).get)
    assert(math.abs(nearA(0) - 10.045) < 1e-9 && nearA(1) == 0.0)
    assert(math.abs(nearB(0) + 10.045) < 1e-9 && nearB(1) == 5.0)
    // pure driver arithmetic, no RNG: bitwise repeatable
    val again = Quantize.lloyd(pts, 2, 8)
    assert(cents.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // k > n degrades to n singleton centroids, not a crash
    assert(Quantize.lloyd(blobA.take(3), 8, 4).length == 3)
  }

  test("kmeansStep: one distributed Lloyd update reduces the quantization " +
    "objective; shape and coverage pins") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val every = 50
    val out = Quantize.kmeansStep(emb, "vec_id", "embedding", every)
      .collect()
    // shape: every emitted cent_id is a stride centroid; pos covers the
    // full dimension range 1..64 per cell; n_assigned constant across a
    // cell's coordinates
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) % every == 0))
    val byCell = out.groupBy(_.getLong(0))
    byCell.foreach { case (c, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 64L),
        s"cell $c pos coverage broken")
      assert(rows.map(_.getLong(2)).distinct.length == 1,
        s"cell $c n_assigned varies across coordinates")
    }
    // coverage: assignments partition the corpus
    val n = emb.count()
    assert(byCell.values.map(_.head.getLong(2)).sum == n)
    // Lloyd monotonicity: with the SAME assignment, the mean is the
    // L2-optimal cell representative, so the summed squared distance to
    // the NEW centroids cannot exceed the distance to the OLD ones
    // (rounding to 6 decimals perturbs each coordinate by <= 5e-7 —
    // absorbed by the strict improvement on this fixture)
    import org.apache.spark.sql.functions._
    val base = emb.select(col("vec_id"),
      Similarity.vecD(col("embedding")).as("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val oldCents = base.view.filterKeys(_ % every == 0).toMap
    val newCents = byCell.map { case (c, rows) =>
      c -> rows.sortBy(_.getLong(1)).map(_.getDouble(3)).toArray
    }
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assignTo(v: Array[Double], cents: Map[Long, Array[Double]]): Long =
      cents.toSeq.sortBy(_._1).minBy { case (id, c) => (sq(v, c), id) }._1
    val objOld = base.values.map(v =>
      sq(v, oldCents(assignTo(v, oldCents)))).sum
    val objNew = base.values.map(v =>
      sq(v, newCents(assignTo(v, newCents)))).sum
    info(f"objective: $objOld%.4f -> $objNew%.4f")
    assert(objNew < objOld,
      f"k-means step did not reduce the objective: $objNew%.4f >= $objOld%.4f")
  }

  test("kmeansTrain: whole-corpus distributed training is monotone in the " +
    "objective, keeps stride ids, and iters=0 is the stride codebook") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val every = 50
    import org.apache.spark.sql.functions._
    def centMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val base = emb.select(col("vec_id"),
      Similarity.vecD(col("embedding")).as("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def obj(cents: Map[Long, Array[Double]]): Double =
      base.values.map { v =>
        cents.toSeq.sortBy(_._1).map { case (_, c) => sq(v, c) }.min
      }.sum
    val c0 = centMap(Quantize.kmeansTrain(emb, "vec_id", "embedding", every, iters = 0))
    // iters=0: exactly the stride vectors, under their stride ids
    val stride = base.view.filterKeys(_ % every == 0).toMap
    assert(c0.keySet == stride.keySet)
    c0.foreach { case (id, c) => assert(c.toSeq == stride(id).toSeq) }
    val c1 = centMap(Quantize.kmeansTrain(emb, "vec_id", "embedding", every, iters = 1))
    val c3 = centMap(Quantize.kmeansTrain(emb, "vec_id", "embedding", every, iters = 3))
    val (o0, o1, o3) = (obj(c0), obj(c1), obj(c3))
    info(f"objective: stride $o0%.4f -> 1 iter $o1%.4f -> 3 iters $o3%.4f")
    assert(o1 < o0, "one training round did not improve the objective")
    assert(o3 <= o1, "objective not monotone across rounds")
    // composes with the IVF probe unchanged
    val res = Similarity.ivfTopKCents(emb, "vec_id", "embedding",
      Quantize.kmeansTrain(emb, "vec_id", "embedding", every, iters = 2),
      queryId = 0L, k = 5, nprobe = 2)
    assert(res.count() == 5)
  }

  test("kmeansTrainExact: the ordered-fold (oracle-replayable) trainer " +
    "equals the partial-agg production trainer within 1e-9/coordinate at " +
    "q97's knobs, and warm-start init is honored") {
    // same data, same assignment, same math — ONLY the per-cell mean's
    // summation order differs (sorted sequential fold vs partitioned
    // partial aggregation), so the codebooks must agree to fp-noise;
    // this is the cross-implementation pin that lets q97's oracle row
    // stand in for the production trainer's semantics
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    def centMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val exact = centMap(Quantize.kmeansTrainExact(
      emb, "vec_id", "embedding", every = 50, iters = 3))
    val prod = centMap(Quantize.kmeansTrain(
      emb, "vec_id", "embedding", every = 50, iters = 3))
    assert(exact.keySet == prod.keySet)
    val maxDiff = exact.toSeq.flatMap { case (id, c) =>
      c.zip(prod(id)).map { case (a, b) => math.abs(a - b) }.toSeq }.max
    info(f"max per-coordinate trainer divergence: $maxDiff%.2e")
    assert(maxDiff < 1e-9,
      f"trainers diverged beyond summation-order noise: $maxDiff%.2e")
    // warm start from an explicit codebook: iters=0 returns it verbatim
    val seed = Quantize.kmeansTrain(emb, "vec_id", "embedding", every = 50,
      iters = 1)
    val warm = centMap(Quantize.kmeansTrain(emb, "vec_id", "embedding",
      every = 50, iters = 0, init = Some(seed)))
    val seedMap = centMap(seed)
    assert(warm.keySet == seedMap.keySet)
    warm.foreach { case (id, c) => assert(c.toSeq == seedMap(id).toSeq,
      s"warm start with iters=0 must return the init codebook (cent $id)") }
  }

  test("trained PQ codebook strictly beats the stride codebook on " +
    "reconstruction error") {
    // same m and k isolate codebook QUALITY — the spec-level adjudicator
    // for the trained tier (the oracle keeps the stride codebook: Lloyd's
    // is data-dependent iteration, not SQL-expressible)
    val emb01 = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val m = 4
    val (ks, _, flatS) = Quantize.pqCodebook(emb01, "vec_id", "embedding",
      m, every = 25)
    val (kt, _, flatT) = Quantize.pqCodebookTrained(emb01, "vec_id", "embedding",
      m, k = ks, iters = 10)
    assert(kt == ks, s"trained codebook size $kt != stride $ks")
    def meanErr(k: Int, flat: IndexedSeq[Double]) =
      Quantize.pqError(emb01, "embedding", m, k, flat)
        .agg(org.apache.spark.sql.functions.avg("pq_err")).head().getDouble(0)
    val (errS, errT) = (meanErr(ks, flatS), meanErr(kt, flatT))
    info(f"stride $errS%.4f trained $errT%.4f (${errS / errT}%.2fx)")
    assert(errT < errS,
      f"trained codebook did not reduce reconstruction error: $errT%.4f >= $errS%.4f")
  }

  test("pqAdcRerankTopK: cand = corpus size degenerates to brute cosine " +
    "top-k; tight cand returns a re-ranked subset of the ADC candidates") {
    val n = emb.count().toInt
    // full-candidate control: when every row survives the ADC cut, the
    // exact re-rank IS the brute ranking — the control that validates the
    // two-stage composition itself
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10).select("vec_id").collect().map(_.getLong(0)).toSeq
    val full = Quantize.pqAdcRerankTopK(emb, "vec_id", "embedding",
      queryId = 0L, kNN = 10, cand = n, m = 4, every = 25)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full == brute)
    // tight cut: results ⊆ the ADC top-50, ordered by exact cosine
    val adc50 = Quantize.pqAdcTopK(emb, "vec_id", "embedding", queryId = 0L,
      kNN = 50, m = 4, every = 25)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val rer = Quantize.pqAdcRerankTopK(emb, "vec_id", "embedding",
      queryId = 0L, kNN = 10, cand = 50, m = 4, every = 25)
      .select("vec_id", "cos_r").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rer.map(_._1).toSet.subsetOf(adc50))
    assert(rer.map(_._2) == rer.map(_._2).sorted.reverse) // cosine-descending
  }

  test("kmeansTrainExact: the per-cell vector fold is bit-identical to " +
    "the former per-(cell, pos) scalar fold on adversarial magnitudes") {
    // the fold-order claim itself: summing member vectors with zip_with
    // in id order must replay, per coordinate, the EXACT IEEE sequence
    // the exploded (cell, pos) formulation produced -- pinned on values
    // where float addition is maximally order-sensitive
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (0L, 1L, Seq(1e16, 1.0, -1.0)),
      (0L, 2L, Seq(1.0, 1e16, 3.3333333333)),
      (0L, 3L, Seq(-1e16, -1e16, 1e-8)),
      (1L, 4L, Seq(0.1, 0.2, 0.3)),
      (1L, 5L, Seq(-0.1, 2e7, -0.3)))
    val df = rows.toDF("cell", "id", "vecd")
    val oldFold = df.select(col("cell"), col("id"),
        posexplode(col("vecd")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(aggregate(
        transform(sort_array(collect_list(struct(col("id"), col("x")))),
          s => s.getField("x")),
        lit(0.0), (acc, x) => acc + x).as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val newFold = df.groupBy("cell")
      .agg(aggregate(
        transform(sort_array(collect_list(struct(col("id"), col("vecd")))),
          s => s.getField("vecd")),
        array_repeat(lit(0.0), 3),
        (acc, v) => zip_with(acc, v, (a, x) => a + x)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    newFold.foreach { case (cell, vec) =>
      vec.zipWithIndex.foreach { case (v, i) =>
        val o = oldFold((cell, i))
        assert(java.lang.Double.doubleToRawLongBits(v) ==
          java.lang.Double.doubleToRawLongBits(o),
          s"cell $cell pos $i: $v != $o")
      }
    }
  }
}
