package graft

import org.apache.spark.sql.functions._

import graft.ext.Cluster

/** Specs for trained k-means coarse quantization (exact int64 Lloyd's)
  * and the SemDeDup within-cluster near-dup pairs built on it. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight, well-separated 4-d blobs around (1,1,0,0) and (0,0,1,1). */
  private def blobs = Seq(
    (1L, Array(1.0f, 1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 1.0f, 0.1f, 0.0f)),
    (3L, Array(1.0f, 0.9f, 0.0f, 0.1f)),
    (4L, Array(0.0f, 0.0f, 1.0f, 1.0f)),
    (5L, Array(0.1f, 0.0f, 0.9f, 1.0f)),
    (6L, Array(0.0f, 0.1f, 1.0f, 0.9f))
  ).toDF("vec_id", "embedding")

  test("kmeansAssign separates two blobs; labels are blob-pure") {
    val got = Cluster.kmeansAssign(blobs, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // seeds are vec_id 1 and 2 (both blob A) but one Lloyd round must
    // pull a centroid over to blob B: the partition is blob-pure
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(4L), got(5L), got(6L)).size == 1)
    assert(got(1L) != got(4L))
  }

  test("sparse vec_id space: residue-class pool collapse falls back to the lowest-id pool") {
    // 600 rows > SeedPool=256, so stride = ceil(600/256) = 3, and ids
    // 0, 4, 7, 10, … (3i+1 except the anchor) leave ONLY the minimum
    // id in the residue class (id % 3 == 1 for every other row).
    // Without the fallback the seed pool is one vector -> one seed ->
    // one cell; the lowest-id pool restores >= k seeds. Vectors cycle
    // through 4 well-separated one-hot blobs, so k=4 must land 4
    // distinct, blob-pure cells.
    val df = spark.range(600).select(
      when(col("id") === 0, 0L).otherwise(col("id") * 3 + 1).as("vec_id"),
      expr("transform(sequence(1, 4), d -> CAST(CASE WHEN d - 1 = id % 4 THEN 1.0 ELSE 0.0 END AS FLOAT))")
        .as("embedding"))
    val got = Cluster.kmeansAssign(df, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(got.length == 600)
    assert(got.map(_._2).distinct.length == 4,
      s"expected 4 cells, got ${got.map(_._2).distinct.toSeq.sorted}")
    // blob-pure: every vec assigned with its one-hot peers
    val byBlob = got.groupBy { case (id, _) =>
      (if (id == 0L) 0L else (id - 1) / 3) % 4
    }.map { case (b, xs) => b -> xs.map(_._2).distinct }
    byBlob.foreach { case (b, cells) =>
      assert(cells.length == 1, s"blob $b split across cells $cells")
    }
  }

  test("kmeansCentroids: exact component sums and IEEE means, long form") {
    val cen = Cluster.kmeansCentroids(blobs, k = 2, iters = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(cen.size == 8) // 2 non-empty cells x 4 dims
    // every (s, n, mean) triple satisfies mean == s/n bit-for-bit and
    // the exact-sum bound |s| <= 127 * n
    cen.foreach { case ((_, _), (s, n, mean)) =>
      assert(mean == s.toDouble / n.toDouble)
      assert(math.abs(s) <= 127L * n)
    }
    // blob means mirror each other across the dim pairs: cell of blob A
    // has high dims 1-2, low 3-4 (and vice versa)
    val byCell = cen.groupBy(_._1._1).map { case (c, m) =>
      c -> (1 to 4).map(d => m((c, d))._3)
    }
    assert(byCell.size == 2)
    val Seq(a, b) = byCell.values.toSeq.sortBy(-_.head)
    assert(a(0) > a(2) && a(1) > a(3))
    assert(b(2) > b(0) && b(3) > b(1))
  }

  test("maximin seeding strictly beats first-k seeding on within-cluster SSE") {
    // The failure mode maximin exists for: the k lowest vec_ids are one
    // source's duplicates, so first-k seeding plants every seed on the
    // same point — ties send all members to the lowest cell and Lloyd
    // can never fully unstick the stranded seeds. Maximin's greedy
    // farthest-point pass spreads seeds across the occupied space and
    // recovers the three-blob partition.
    val blobs3 = Seq(
      (1L, Array(2.0f, 0.0f, 0.0f, 0.0f)), // blob A: triplicate head ids
      (2L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 2.0f, 0.0f, 0.0f)), // blob B
      (5L, Array(0.1f, 2.0f, 0.0f, 0.0f)),
      (6L, Array(0.0f, 1.9f, 0.1f, 0.0f)),
      (7L, Array(0.0f, 0.0f, 2.0f, 0.1f)), // blob C
      (8L, Array(0.0f, 0.1f, 2.0f, 0.0f)),
      (9L, Array(0.0f, 0.0f, 1.9f, 0.0f))
    )
    val df = blobs3.toDF("vec_id", "embedding")
    val vecs = blobs3.map { case (id, e) => id -> e.map(_.toDouble) }.toMap
    def sse(asg: Map[Long, Int]): Double =
      asg.groupBy(_._2).values.map { members =>
        val pts = members.keys.map(vecs).toSeq
        val mean = pts.transpose.map(c => c.sum / c.size).toArray
        pts.map(p => p.zip(mean).map { case (a, b) => (a - b) * (a - b) }.sum).sum
      }.sum
    def asgOf(res: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      res.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val maximin = asgOf(Cluster.kmeansAssign(df, k = 3, iters = 2))
    val firstK = asgOf(Cluster.kmeansAssignFirstKSeeds(df, k = 3, iters = 2))
    val (sseMax, sseFirst) = (sse(maximin), sse(firstK))
    assert(sseMax < sseFirst,
      s"maximin SSE $sseMax not strictly below first-k SSE $sseFirst")
    // and the maximin partition is the true one: blob-pure, all 3 cells used
    val cells = Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L, 8L, 9L))
      .map(ids => ids.map(maximin).toSet)
    assert(cells.forall(_.size == 1) && cells.flatten.toSet.size == 3,
      s"maximin partition not blob-pure: $maximin")
  }

  test("kmeans result is invariant under repartitioning (exact arithmetic)") {
    val once = Cluster.kmeansCentroids(blobs, k = 2, iters = 2)
      .orderBy("cell", "dim").collect().toSeq
    val spread = Cluster.kmeansCentroids(blobs.repartition(5), k = 2, iters = 2)
      .orderBy("cell", "dim").collect().toSeq
    assert(once == spread)
  }

  test("empty cluster keeps its previous centroid between rounds") {
    // k=3 over the two blobs: seeds 1,2,3 all sit in blob A; after round
    // one at most two cells have members — the run must not throw and
    // the final assignment still uses 2 distinct labels
    val labels = Cluster.kmeansAssign(blobs, k = 3, iters = 3)
      .select("cell").distinct().as[Int].collect().toSet
    assert(labels.size >= 2)
  }

  test("all-zero and empty inputs yield empty frames with the contract schema") {
    val zero = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Cluster.kmeansAssign(zero).isEmpty)
    assert(Cluster.kmeansCentroids(zero).columns.toSeq ==
      Seq("cell", "dim", "s", "n", "mean"))
    assert(Cluster.semanticDedup(zero).isEmpty)
    val empty = spark.emptyDataset[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
    assert(Cluster.kmeansAssign(empty).isEmpty)
  }

  /** Deterministic 64-d embeddings (Sim's arithmetic-hash family). */
  private def wideEmbeddings(n: Int) =
    spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 64), i -> " +
        "CAST(pmod(id * 2654435761 + i * 40503, 1000003) / 1000003.0 - 0.5 AS FLOAT))")
        .as("embedding"))

  test("assignment survives codegen-only mode at coarse-quantizer width (k=64, d=64)") {
    // CODEGEN_ONLY turns any expression-codegen fallback (method-size
    // blowup, janino failure) into a hard error — the regression this
    // guards is the old k·d literal-tree argmin, which stops compiling
    // near k≈10². KMeansArgmin must codegen-compile at real
    // coarse-quantizer width and stay inside a whole-stage span.
    val df = wideEmbeddings(128)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val assigned = Cluster.kmeansAssign(df, k = 64, iters = 2)
      assert(assigned.count() == 128)
      // "*(n)" is the rendered WholeStageCodegen marker: the argmin
      // projection must sit inside a codegen span, not fall out of it
      val plan = assigned.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains("*(") && l.contains("graft_kmeans_argmin")),
        s"argmin not in a codegen span:\n$plan")
      assert(Cluster.kmeansCentroids(df, k = 64, iters = 2).count() > 0)
    } finally prev.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
      spark.conf.set("spark.sql.codegen.factoryMode", _))
  }

  test("ragged embedding input fails fast instead of silently mis-clustering") {
    val ragged = Seq(
      (1L, Array(1.0f, 1.0f, 0.0f)),
      (2L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Cluster.kmeansAssign(ragged, k = 2, iters = 1).collect()
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("semanticDedup maxCluster bounds a degenerate one-cluster corpus") {
    // 40 IDENTICAL vectors: every score ties, every tie breaks to the
    // lowest cell — Lloyd collapses the corpus into ONE cell, the
    // adversarial case where uncapped blocking goes quadratic.
    val n = 40
    val df = (1 to n).map(i => (i.toLong, Array(1.0f, 1.0f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val labels = Cluster.kmeansAssign(df, k = 2, iters = 2)
      .select("cell").distinct().count()
    assert(labels == 1L) // the scenario IS degenerate
    val uncapped = Cluster.semanticDedup(df, k = 2, iters = 2,
      threshold = -1.0, maxCluster = n).count()
    assert(uncapped == n.toLong * (n - 1) / 2) // quadratic without the cap
    val capped = Cluster.semanticDedup(df, k = 2, iters = 2,
      threshold = -1.0, maxCluster = 8).count()
    // ceil(40/8) = 5 affine-hash chunks: pairs collapse from C(40,2)=780
    // to the sum of per-chunk C(size,2) — bounded by n·maxCluster even
    // with hash imbalance, and far below quadratic in practice
    assert(capped > 0 && capped < uncapped)
    assert(capped <= n.toLong * 8)
    // determinism: the affine subkey is content-derived, not partition-derived
    val again = Cluster.semanticDedup(df.repartition(7), k = 2, iters = 2,
      threshold = -1.0, maxCluster = 8).count()
    assert(again == capped)
  }

  test("pqCodes: m=1 degenerates to kmeansAssign; subspaces are independent") {
    // m=1 runs the identical seeded Lloyd recursion over the full grid,
    // so the single-subspace code IS the cluster label — bit-for-bit
    val asg = Cluster.kmeansAssign(blobs, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pq1 = Cluster.pqCodes(blobs, m = 1, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(pq1.forall(_._2 == 0))
    assert(pq1.map(t => t._1 -> t._3).toMap == asg)
    // m=2 over the 4-d blobs: dims 1-2 separate blob A internally, dims
    // 3-4 blob B — every vector gets exactly one code per subspace
    val pq2 = Cluster.pqCodes(blobs, m = 2, k = 2, iters = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(pq2.keySet == (1L to 6L).flatMap(id => Seq((id, 0), (id, 1))).toSet)
    // codes are deterministic under repartitioning (exact arithmetic)
    val again = Cluster.pqCodes(blobs.repartition(5), m = 2, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(again == pq2)
    // width must divide into subspaces
    val e = intercept[IllegalArgumentException] {
      Cluster.pqCodes(blobs, m = 3, k = 2, iters = 2)
    }
    assert(e.getMessage.contains("divisible"))
  }

  test("residual codebook: exact sums/counts, determinism, zero-residual degeneracy") {
    // blobs, m=2 subspaces of 2 dims: every subspace partitions all 6
    // vectors; sums are exact residual-grid integers with mean == s/n
    val cb = Cluster.pqCodebookResidual(blobs, m = 2, kSub = 2, iters = 2, coarseK = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    (0 to 1).foreach { s =>
      val dims = cb.keys.filter(_._1 == s).map(_._3).toSet
      assert(dims == Set(1, 2), s"subspace $s dims $dims")
      val nTotal = cb.collect { case ((`s`, _, 1), (_, n, _)) => n }.sum
      assert(nTotal == 6L, s"subspace $s members $nTotal != 6")
    }
    cb.foreach { case (k, (sSum, n, mean)) =>
      assert(mean == sSum.toDouble / n.toDouble, s"$k mean drifted")
      assert(math.abs(sSum) <= 127L * n, s"$k sum $sSum exceeds residual-grid bound")
    }
    // determinism under repartitioning (exact int64 state end-to-end)
    val again = Cluster.pqCodebookResidual(blobs.repartition(5),
      m = 2, kSub = 2, iters = 2, coarseK = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(again == cb)
    // every-vector-is-its-centroid corpus: residuals are exactly zero,
    // rscale degenerates to 0, and the guarded path emits all-zero codes
    // (one cell 0 per subspace, zero sums) instead of 0/0
    val twoPoints = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val degen = Cluster.pqCodebookResidual(twoPoints, m = 2, kSub = 2, iters = 2, coarseK = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5))))
    assert(degen.map(_._1).toSet == Set((0, 0, 1), (0, 0, 2), (1, 0, 1), (1, 0, 2)),
      s"degenerate cells ${degen.map(_._1).toSet}")
    assert(degen.forall { case (_, (sSum, n, mean)) => sSum == 0L && n == 2L && mean == 0.0 },
      s"degenerate state $degen")
  }

  test("sampled residual codebook: sample-trained state, full-corpus occupancy") {
    // sampleMod=2 trains both quantizers on even vec_ids {2,4,6} only;
    // the occupancy output must still cover ALL 6 vectors per subspace
    val cb = Cluster.pqCodebookResidualSampled(blobs, m = 2, kSub = 2, iters = 2,
      coarseK = 2, sampleMod = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    (0 to 1).foreach { s =>
      val nTotal = cb.collect { case ((`s`, _, 1), (_, n, _)) => n }.sum
      assert(nTotal == 6L, s"subspace $s occupancy $nTotal != 6 (full corpus)")
    }
    cb.foreach { case (k, (sSum, n, mean)) =>
      assert(mean == sSum.toDouble / n.toDouble, s"$k mean drifted")
    }
    // NOTE deliberately NOT asserted: sampleMod=1 ≡ pqCodebookResidual.
    // The unsampled query reports the TRAINING-final grouping (s_a2)
    // while this one reports the deploy RE-ENCODE occupancy against the
    // final codebooks — the same training-assignment-vs-shipped-
    // quantizer distinction the coarse a3 pass exists for, and the two
    // groupings legitimately differ for boundary vectors.
    // determinism under repartitioning
    val again = Cluster.pqCodebookResidualSampled(blobs.repartition(5),
      m = 2, kSub = 2, iters = 2, coarseK = 2, sampleMod = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(again == cb)
  }

  test("gridScale contract: explicit sample scale routes identically when grids coincide") {
    // sampleMod=1 trains on everything, so the sample grid IS the full
    // grid — the explicit-gridScale path must reproduce the derived-
    // scale path bit-for-bit (proves the Some(scale) plumbing feeds the
    // same quantization the default derivation would)
    val cen = Cluster.kmeansCentroidsSampled(blobs, k = 2, iters = 2, sampleMod = 1)
    val explicitScale = Cluster.sampledGridScale(blobs, 1)
    assert(explicitScale.isDefined)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val viaExplicit = rows(graft.ext.Sim.ivfTopKTrained(blobs, cen, 2, 2, explicitScale))
    val viaDerived = rows(graft.ext.Sim.ivfTopKTrained(blobs, cen, 2, 2))
    assert(viaExplicit == viaDerived, s"$viaExplicit != $viaDerived")
    assert(viaExplicit.nonEmpty)
  }

  test("centroidState round-trips kmeansCentroids exactly") {
    val cens = Cluster.centroidState(Cluster.kmeansCentroids(blobs, k = 2, iters = 2))
    assert(cens.map(_.cell) == cens.map(_.cell).sorted)
    val byCell = Cluster.kmeansCentroids(blobs, k = 2, iters = 2).collect()
      .groupBy(_.getInt(0))
    cens.foreach { c =>
      val rows = byCell(c.cell)
      assert(rows.head.getLong(3) == c.n)
      rows.foreach(r => assert(c.s(r.getInt(1) - 1) == r.getLong(2)))
    }
  }

  test("centroidState fails fast on filtered/truncated/conflicting frames") {
    val good = Cluster.kmeansCentroids(blobs, k = 2, iters = 2)
    // a filtered frame (one dim row dropped) must not silently zero-fill
    val holed = intercept[IllegalArgumentException] {
      Cluster.centroidState(good.filter(!(col("cell") === 0 && col("dim") === 2)))
    }
    assert(holed.getMessage.contains("non-contiguous"))
    // a truncated frame (top dim rows dropped from ONE cell) leaves
    // cells disagreeing on width
    val truncated = intercept[IllegalArgumentException] {
      Cluster.centroidState(good.filter(!(col("cell") === 0 && col("dim") === 4)))
    }
    assert(truncated.getMessage.contains("width"))
    // conflicting member counts inside one cell
    val conflicted = intercept[IllegalArgumentException] {
      Cluster.centroidState(good.withColumn("n",
        when(col("dim") === 1, col("n") + 1).otherwise(col("n"))))
    }
    assert(conflicted.getMessage.contains("member counts"))
  }

  test("nProbe clamps to the non-empty cell count on a collapsed clustering") {
    // identical vectors collapse Lloyd into ONE cell; nProbe=3 must
    // degrade to probing that single cell (the oracle's rk<=nProbe
    // semantics), not throw
    val flat = (1 to 10).map(i => (i.toLong, Array(1.0f, 1.0f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val hits = Cluster.semanticContamination(
      flat.filter(col("vec_id") % 2 =!= 0), flat.filter(col("vec_id") % 2 === 0),
      k = 2, iters = 2, threshold = 0.9, nProbe = 3)
    assert(hits.count() == 25L) // 5 probes x 5 evals, all cosine 1.0
    val knn = graft.ext.Sim.ivfTopKTrained(flat,
      Cluster.kmeansCentroids(flat, k = 2, iters = 2), k = 3, nProbe = 3)
    assert(knn.count() > 0)
  }

  test("kmeansCentroidsSampled: trains on the residue class, assigns everything") {
    // 128 deterministic vectors; sampleMod=4 trains on the 32 vectors
    // with vec_id % 4 == 0 and assigns all 128
    val df = wideEmbeddings(128)
    val cen = Cluster.kmeansCentroidsSampled(df, k = 4, iters = 2, sampleMod = 4)
      .collect()
    assert(cen.nonEmpty)
    // full-corpus occupancy: member counts across cells sum to n (every
    // vector assigned), counted once per cell (64 dim rows per cell)
    val byCell = cen.groupBy(_.getInt(0))
    assert(byCell.values.map(_.head.getLong(3)).sum == 128L)
    byCell.values.foreach(rows => assert(rows.length == 64))
    // sampleMod=1 trains on everything but the contract still ENCODES
    // the corpus against the final trained state (one extra assignment —
    // the FAISS train-then-encode split), so it is NOT bit-identical to
    // kmeansCentroids' final-round aggregate; it must still cover all n
    val modOne = Cluster.kmeansCentroidsSampled(df, k = 4, iters = 2, sampleMod = 1)
      .collect()
    assert(modOne.groupBy(_.getInt(0)).values.map(_.head.getLong(3)).sum == 128L)
    // deterministic under repartitioning (exact arithmetic end-to-end)
    val again = Cluster.kmeansCentroidsSampled(df.repartition(7), k = 4,
      iters = 2, sampleMod = 4).orderBy("cell", "dim").collect().toSeq
    assert(again == Cluster.kmeansCentroidsSampled(df, k = 4, iters = 2,
      sampleMod = 4).orderBy("cell", "dim").collect().toSeq)
    // the sample grid is the search grid: ivfTopKTrained over the full
    // corpus with the sampled centroids + sampledGridScale runs clean
    val scale = Cluster.sampledGridScale(df, 4)
    assert(scale.nonEmpty)
    val knn = graft.ext.Sim.ivfTopKTrained(df,
      Cluster.kmeansCentroidsSampled(df, k = 4, iters = 2, sampleMod = 4),
      k = 3, nProbe = 2, gridScale = scale)
    assert(knn.count() > 0)
  }

  test("|s|^2 >= 2^53 centroid state fails loudly instead of silently rounding") {
    // craft a centroid frame whose component sums break the exact-double
    // scoring bound: 64 dims x (2^27)^2 = 2^60 >> 2^53
    val huge = spark.range(2).selectExpr(
      "CAST(id AS INT) AS cell",
      "explode(sequence(1, 64)) AS dim")
      .selectExpr("cell", "dim", "CAST(134217728 AS BIGINT) AS s",
        "CAST(1000000 AS BIGINT) AS n",
        "CAST(134217728 AS DOUBLE) / 1000000.0 AS mean")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Sim.ivfTopKTrained(blobs, huge, k = 2, nProbe = 1).collect()
    }
    assert(e.getMessage.contains("2^53"))
  }

  test("semanticDedup pairs only within a cluster, above threshold, a<b") {
    val got = Cluster.semanticDedup(blobs, k = 2, iters = 2, threshold = 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val labels = Cluster.kmeansAssign(blobs, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (a, b, cos) =>
      assert(a < b)
      assert(labels(a) == labels(b)) // the cluster is the blocking key
      assert(cos >= 0.9)
    }
    // cross-blob pairs can never appear even at threshold 0
    val all = Cluster.semanticDedup(blobs, k = 2, iters = 2, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.forall { case (a, b) => labels(a) == labels(b) })
  }
}
