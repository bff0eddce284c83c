package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two paths (SURVEY.md §2B X16):
  *  - `topK`: brute-force cosine top-k — the correctness baseline; a single
  *    broadcast of the query vector + TakeOrderedAndProject, so even this
  *    "brute force" streams at full scan speed with no shuffle.
  *  - `annTopK`: random-hyperplane LSH bucketing; only the query's bucket is
  *    scanned exactly. The hyperplanes come from a deterministic LCG so the
  *    DuckDB oracle reproduces the same buckets bit-for-bit.
  *
  * Background: incremental top-k similarity (EDBT 2020,
  * /root/repo/PAPERS.md:7) and distributed top-k with local reference
  * structures (REPOSE, ICDE 2021, PAPERS.md:8) — the bucket-then-rescore
  * decomposition here is the degenerate single-probe variant.
  */
object Similarity {

  /** LCG-derived hyperplane weights, exactly reproducible in SQL:
    * w(k,d) = ((1103515245·(k·64+d) + 12345) mod 2³¹) / 2³¹ − 0.5. */
  def lshWeights(bit: Int, dim: Int = 64): Seq[Double] =
    (0 until dim).map { d =>
      ((1103515245L * (bit * dim + d) + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5
    }

  /** LSH bucket id: bit k set iff the projection onto hyperplane k is ≥ 0. */
  def bucket(v: Column, nBits: Int): Column =
    (0 until nBits).map { k =>
      when(VectorOps.dotConst(v, lshWeights(k)) >= 0, 1L << k).otherwise(0L)
    }.reduce(_ + _)

  /** Brute-force cosine top-k against the vector with id `queryId`. */
  def topK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryId)
      .select(col("embedding").as("q_vec"))
    emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        round(VectorOps.cosine(col("embedding"), col("q_vec")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-label centroids — the IVF coarse-quantizer build step (assign →
    * average per cell). Emitted as (label, pos, cval) rows rather than
    * re-assembled arrays: posexplode → one partial+final average per
    * (label, dimension), fully distributed, and directly joinable as a
    * quantizer table. */
  def labelCentroids(emb: DataFrame): DataFrame =
    centroidCells(emb).orderBy("label", "pos")

  /** Unordered centroid build (the sort is presentation-only; the vector
    * re-assembly in [[centroidVectors]] shuffles again anyway). Values are
    * rounded to 6 decimals: averaging is the one summation whose order
    * differs across engines, so the quantizer is pinned to the rounded
    * values — every downstream dot product over them is then bit-exact. */
  private def centroidCells(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg(col("v").cast("double")), 6).as("cval"))

  /** Centroids re-assembled as vectors: (cell, cvec array<double>). The
    * seed partition is the `label` column (any coarse partition works as a
    * quantizer seed — at scale, a k-means pass over a sample); cell quality
    * affects ANN recall, never correctness, because verification inside a
    * cell is exact. */
  def centroidVectors(emb: DataFrame): DataFrame =
    centroidCells(emb)
      .groupBy(col("label").as("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cval")))).as("pc"))
      .select(col("cell"), transform(col("pc"), p => p.getField("cval")).as("cvec"))

  /** IVF assignment: each vector goes to its nearest centroid by cosine
    * (argmax; ties broken toward the lowest cell id so both engines agree).
    * One broadcast cross join + one map-side-combined groupBy — the scored
    * N×K relation never shuffles, only the N reduced rows do.
    *
    * Scale bound: the centroid table is K·dim doubles — with K ≈ √N = 10⁵
    * cells at 64 dims that is ~50 MB, the practical broadcast ceiling;
    * beyond it, shuffle-join the assignment on a pre-partitioned centroid
    * table instead of broadcasting. */
  def assignCells(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cell"),
        round(VectorOps.cosine(col("embedding"), col("cvec")), 6).as("c_sim"))
      .groupBy("vec_id")
      .agg(
        max_by(col("cell"), struct(col("c_sim"), (-col("cell")).as("nc"))).as("cell"),
        first(col("embedding")).as("embedding"))

  /** Multi-probe cell assignment: each vector lands in its `probes` nearest
    * cells (cosine desc, ties to the lower cell id), emitting `probes` rows
    * per vector. `probes = 1` reproduces [[assignCells]] exactly (same
    * ordering rule), so consumers can dial recall vs candidate volume with
    * one knob. The ranking window partitions by vec_id over the K broadcast
    * centroids — bounded K-row groups, no corpus-wide sort. */
  def assignCellsMulti(emb: DataFrame, cents: DataFrame, probes: Int): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cell"),
        round(VectorOps.cosine(col("embedding"), col("cvec")), 6).as("c_sim"))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("c_sim").desc, col("cell"))))
      .where(col("pr") <= probes)
      .select(col("vec_id"), col("embedding"), col("cell"))

  /** X193: embedding-outlier curation — per label, the k vectors LEAST
    * similar to their own label centroid (the CLIP-score/embedding-filter
    * shape: a vector far from its class center is a mislabel or junk
    * candidate; negative cosines here are exactly the near-random junk
    * planted in the synthetic table). Centroids are the oracle-pinned
    * rounded quantizer from [[centroidVectors]], so the fixed-order
    * cosine is bit-exact cross-engine; scores quantize to ⌊cos·10⁶⌋
    * integers so ranking never compares raw doubles.
    *
    * Scale shape: K centroid rows broadcast against the N-row scan (one
    * codegen'd dot per row, no shuffle for scoring); the only shuffle is
    * the per-label ranking window — bounded per label, and at 100 TB the
    * same rank runs as a per-label top-k heap aggregate (X52) instead of
    * a full window sort. */
  def labelOutliers(emb: DataFrame, k: Int): DataFrame = {
    val cents = centroidVectors(emb)
    emb.join(broadcast(cents), col("label") === col("cell"))
      .select(col("vec_id"), col("label"),
        floor(VectorOps.dot(col("embedding"), col("cvec")) /
          (VectorOps.norm(col("embedding")) * VectorOps.norm(col("cvec")))
          * 1000000.0).cast("long").as("cos_e6"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("label").orderBy(col("cos_e6"), col("vec_id")))
        .cast("long"))
      .where(col("rk") <= k)
      .select(col("label"), col("rk"), col("vec_id"), col("cos_e6"))
      .orderBy("label", "rk")
  }

  /** Product-quantization codebooks (the PQ half of IVF-PQ, the standard
    * billion-scale ANN layout): the 64-dim space splits into `m`
    * subspaces of `subDim` dims; each subspace gets its own codebook from
    * label-partition averages (the same seed-partition argument as the
    * IVF coarse quantizer — codebook quality affects distortion, never
    * correctness). Values rounded to 6dp pin the quantizer cross-engine.
    * Output: (s, code, cvec) — one row per sub-centroid. */
  def pqCodebooks(emb: DataFrame, m: Int = 4, subDim: Int = 16): DataFrame =
    emb.select(col("label"),
        posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
          .as(Seq("pos", "v")))
      .select(col("label"), expr(s"pos div $subDim").as("s"),
        expr(s"pos % $subDim").as("sp"), col("v"))
      .groupBy("label", "s", "sp").agg(round(avg("v"), 6).as("cval"))
      .groupBy(col("s"), col("label").as("code"))
      .agg(array_sort(collect_list(struct(col("sp"), col("cval")))).as("pc"))
      .select(col("s"), col("code"),
        transform(col("pc"), p => p.getField("cval")).as("cvec"))

  /** PQ encoding: per (vector, subspace) the nearest sub-centroid by L2 —
    * argmin ‖x_s−c‖² ≡ argmax 2·x_s·c − ‖c‖² (‖x_s‖² is constant within
    * the argmin), so each subspace costs one fixed-order dot product per
    * codeword. A 64-dim float vector compresses to m codebook indices
    * (here 4 × 4 bits): ~64× smaller, the memory layout that lets a
    * billion-vector index live in RAM. One broadcast cross join + one
    * map-side max_by — the N×(m·K) scored relation never shuffles. */
  def pqEncode(emb: DataFrame, m: Int = 4, subDim: Int = 16): DataFrame =
    pqEncodeWith(emb, pqCodebooks(emb, m, subDim), subDim)

  /** [[pqEncode]] against a PREBUILT codebook relation — the split that
    * lets a session registry (or a persisted table at scale) supply the
    * codebooks instead of rebuilding them per query. */
  def pqEncodeWith(emb: DataFrame, cb: DataFrame, subDim: Int = 16): DataFrame = {
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .crossJoin(broadcast(cb))
      .select(col("vec_id"), col("s"), col("code"),
        round(VectorOps.dot(expr(s"slice(v, s * $subDim + 1, $subDim)"),
          col("cvec")) * 2 - VectorOps.dot(col("cvec"), col("cvec")), 6)
          .as("score"))
      .groupBy("vec_id", "s")
      .agg(max_by(col("code"),
        struct(col("score"), (-col("code")).as("nc"))).as("code"))
  }

  /** Symmetric int8 quantization per vector: q_i = floor(v_i · 127 /
    * max|v|) — the ANN memory-compression step (4× smaller than float32,
    * 8× smaller than the float64 working form). Pure per-row array
    * expressions; `floor` instead of `round` because floor of an IEEE
    * division is engine-exact while double `round` half-way behavior is
    * not. All-zero vectors quantize to zeros (guarded division). */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val maxabs = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    emb.select(col("vec_id"), col("embedding"), maxabs.as("max_abs"))
      .withColumn("qvec",
        when(col("max_abs") > 0.0,
          transform(col("embedding"), x =>
            floor(x.cast("double") * 127.0 / col("max_abs")).cast("int")))
          .otherwise(transform(col("embedding"), _ => lit(0))))
      .select(col("vec_id"), round(col("max_abs"), 6).as("max_abs_r"),
        array_min(col("qvec")).as("q_min"), array_max(col("qvec")).as("q_max"),
        md5(concat_ws(",", transform(col("qvec"), _.cast("string")))).as("q_fp"))
      .orderBy("vec_id")
  }

  /** X260: EXACT maximum-inner-product search (MIPS) with norm-bound cell
    * pruning — WAND's upper-bound skip (X225) applied to vectors:
    * Cauchy–Schwarz bounds every inner product in a cell by ‖q‖·max‖x‖,
    * so cells whose bound cannot reach the threshold θ are skipped BEFORE
    * exact scoring. θ seeds from exact-scoring the query's OWN cell (its
    * k-th best is a valid lower bound on the global k-th best — X225's
    * disjunctive-seed rule); when fewer than k seeds exist or θ ≤ 0, no
    * cell prunes (a non-positive threshold bounds nothing — the safety
    * rule), and the prune comparison carries a 10⁻³ slack so 6-dp score
    * rounding can never promote a pruned vector into the rounded top-k.
    * The ORACLE scores every vector exhaustively — the hash match proves
    * pruning is lossless. MIPS (not cosine) is the recommendation-serving
    * score: large-norm items legitimately dominate, and the per-cell
    * max-norm table is its classic exact accelerator. Data plane: seed =
    * one cell's members (k-row driver scalar, the WAND control-plane
    * discipline), bounds = one map-side-combined aggregate over the
    * session assignment artifact (K rows), final scoring touches ONLY
    * surviving cells' members. */
  def mipsTopK(asg: DataFrame, queryId: Long, k: Int): DataFrame =
    mipsCore(asg, queryId, k)._1

  private[graft] def mipsCore(asg: DataFrame, queryId: Long, k: Int)
      : (DataFrame, DataFrame) = {
    val q = asg.where(col("vec_id") === queryId)
      .select(col("cell").as("qcell"), col("embedding").as("qv"))
    val seed = asg.crossJoin(broadcast(q))
      .where(col("cell") === col("qcell") && col("vec_id") =!= queryId)
      .select(round(VectorOps.dot(col("embedding"), col("qv")), 6).as("ip"))
      .orderBy(col("ip").desc).limit(k).collect()
    val theta =
      if (seed.length == k) seed.last.getDouble(0) else Double.NegativeInfinity
    val bounds = asg.groupBy("cell")
      .agg(max(VectorOps.dot(col("embedding"), col("embedding"))).as("mx2"))
    val survivors =
      if (theta <= 0.0) bounds.select("cell")
      else bounds.crossJoin(broadcast(q))
        .where(sqrt(col("mx2") * VectorOps.dot(col("qv"), col("qv")))
          >= lit(theta) - lit(0.001))
        .select("cell")
    val res = asg.join(broadcast(survivors), "cell")
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(VectorOps.dot(col("embedding"), col("qv")), 6).as("ip"))
      .orderBy(col("ip").desc, col("vec_id")).limit(k)
    (res, survivors)
  }

  /** IVF ANN top-k: assign the corpus to centroid cells, probe the query's
    * `nProbe` nearest cells, rescore exactly inside them. Multi-probe is
    * the recall lever: a query near a cell boundary finds its true
    * neighbors in the second-nearest cell, which single-probe misses —
    * recall rises with nProbe while scanned volume stays nProbe·N/K. */
  def annTopKIvf(emb: DataFrame, queryId: Long, k: Int, nProbe: Int = 2): DataFrame = {
    // tiny (K rows); feeds probes + assignment — localCheckpoint, not
    // cache, so callers hold no cached plan to unpersist
    val cents = centroidVectors(emb).localCheckpoint(true)
    annTopKIvfCore(emb, cents, assignCells(emb, cents), queryId, k, nProbe)
  }

  /** [[annTopKIvf]] against PREBUILT centroid/assignment relations (the
    * session-index serving path — at scale these are persisted tables). */
  def annTopKIvfCore(emb: DataFrame, cents: DataFrame, assigned: DataFrame,
      queryId: Long, k: Int, nProbe: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryId).select(col("embedding").as("q_vec"))
    val probes = q.crossJoin(cents)
      .select(col("q_vec"), col("cell"),
        round(VectorOps.cosine(col("q_vec"), col("cvec")), 6).as("c_sim"))
      .orderBy(col("c_sim").desc, col("cell"))
      .limit(nProbe)
      .select(col("cell").as("q_cell"), col("q_vec"))
    assigned.join(broadcast(probes),
        col("cell") === col("q_cell") && col("vec_id") =!= queryId)
      .select(col("vec_id"), col("cell"),
        round(VectorOps.cosine(col("embedding"), col("q_vec")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** X250: BATCHED multi-probe IVF ANN — the serving shape ([[annTopKIvf]]
    * answers one query; real retrieval answers thousands per plan). Each
    * query row assigns to its nProbe nearest cells against the broadcast
    * K-row centroid table (map-side, a per-query rank window over K rows);
    * corpus vectors keep their single primary cell; candidates are the
    * probed cells' members, exact-cosine re-ranked per query with the
    * (cos desc, vec_id) tie-break. Pair volume Q·nProbe·N/K vs Q·N brute
    * force, and the per-query ranking window partitions by q_id — Q
    * bounded groups, no global sort. */
  def annTopKBatch(emb: DataFrame, nQueries: Long, k: Int,
      nProbe: Int = 2): DataFrame = {
    val cents = centroidVectors(emb).localCheckpoint(true)
    annTopKBatchCore(emb, cents, assignCells(emb, cents), nQueries, k, nProbe)
  }

  /** [[annTopKBatch]] against prebuilt centroid/assignment relations. */
  def annTopKBatchCore(emb: DataFrame, cents: DataFrame, assigned: DataFrame,
      nQueries: Long, k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val probes = q.crossJoin(cents)
      .select(col("q_id"), col("q_vec"), col("cell"),
        round(VectorOps.cosine(col("q_vec"), col("cvec")), 6).as("c_sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("c_sim").desc, col("cell"))))
      .where(col("rk") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("cell").as("q_cell"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    assigned.join(broadcast(probes),
        col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorOps.cosine(col("embedding"), col("q_vec")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** X251: IVF × PQ composed ANN serving — the actual billion-vector
    * layout the pieces were built for (IVF coarse cells from
    * [[centroidVectors]], PQ codes from [[pqEncode]], ADC scoring from the
    * query's per-subspace lookup tables, exact rescoring only on the
    * shortlist).
    *
    * Scan model at scale: the persisted index is `(cell, vec_id, s, code)`
    * — PQ codes partitioned by their IVF cell. A query reads nProbe cells'
    * code stripes (nProbe·N/K rows of m 4-bit codes, never the floats),
    * scores each with m table lookups, and only the `depth`-row shortlist
    * ever touches full-precision vectors. The shortlist here is the
    * ADC-ordered top `depth` with the (adc desc, vec_id) tie-break, so
    * both engines cut identically. */
  def ivfPqShortlist(emb: DataFrame, queryId: Long, nProbe: Int, depth: Int): DataFrame = {
    val cents = centroidVectors(emb).localCheckpoint(true)
    // the persisted IVF-PQ index: per-cell stripes of PQ codes
    val index = pqEncode(emb)
      .join(assignCells(emb, cents).select(col("vec_id"), col("cell")), Seq("vec_id"))
    ivfPqShortlistCore(emb, cents, pqCodebooks(emb), index, queryId, nProbe, depth)
  }

  /** [[ivfPqShortlist]] against prebuilt centroids, codebooks, and the
    * (cell, vec_id, s, code) index relation. */
  def ivfPqShortlistCore(emb: DataFrame, cents: DataFrame, cb: DataFrame,
      index: DataFrame, queryId: Long, nProbe: Int, depth: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryId)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
    val probes = q.crossJoin(cents)
      .select(col("cell"),
        round(VectorOps.cosine(col("qv"), col("cvec")), 6).as("c_sim"))
      .orderBy(col("c_sim").desc, col("cell")).limit(nProbe)
      .select(col("cell").as("q_cell"))
    val tables = cb.crossJoin(broadcast(q))
      .select(col("s"), col("code"),
        round(VectorOps.dot(expr("slice(qv, s * 16 + 1, 16)"), col("cvec")), 6).as("t"))
    index.join(broadcast(probes), col("cell") === col("q_cell"))
      .where(col("vec_id") =!= queryId)
      .join(broadcast(tables), Seq("s", "code"))
      .groupBy("vec_id")
      .agg(max(when(col("s") === 0, col("t"))).as("t0"),
        max(when(col("s") === 1, col("t"))).as("t1"),
        max(when(col("s") === 2, col("t"))).as("t2"),
        max(when(col("s") === 3, col("t"))).as("t3"))
      .select(col("vec_id"),
        round(col("t0") + col("t1") + col("t2") + col("t3"), 6).as("adc"))
      .orderBy(col("adc").desc, col("vec_id")).limit(depth)
  }

  /** IVF×PQ top-k: ADC shortlist (see [[ivfPqShortlist]]) exact-rescored
    * by true cosine — the original floats are fetched only for the
    * `rescoreDepth` shortlist rows, the single full-precision read in the
    * whole query. */
  def annTopKIvfPq(emb: DataFrame, queryId: Long, k: Int, nProbe: Int = 2,
      rescoreDepth: Int = 20): DataFrame =
    rescoreShortlist(emb, ivfPqShortlist(emb, queryId, nProbe, rescoreDepth),
      queryId, k)

  /** Exact rescore of an ADC shortlist: fetch original floats ONLY for the
    * shortlist rows, rank by true cosine. */
  def rescoreShortlist(emb: DataFrame, short: DataFrame, queryId: Long,
      k: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryId).select(col("embedding").as("q_vec"))
    emb.join(broadcast(short), Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("adc"),
        round(VectorOps.cosine(col("embedding"), col("q_vec")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** ANN top-k: exact rescoring restricted to the query's LSH bucket. At
    * scale the bucket column is a partition key, so a query touches one
    * partition instead of the full corpus.
    *
    * Recall trade-off: this is the SINGLE-probe variant — with `nBits`
    * hyperplanes a true neighbor lands in the query's bucket only when all
    * `nBits` signs agree (for cosine similarity cos θ, each hyperplane
    * agrees with probability 1 − θ/π), so recall decays as that probability
    * to the nBits-th power. The multi-probe extension — also scan the
    * buckets at Hamming distance 1, or the IVF variant [[annTopKIvf]] with
    * nProbe > 1 — buys recall at proportional scan cost. */
  def annTopK(emb: DataFrame, queryId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val bucketed = emb.withColumn("bucket", bucket(col("embedding"), nBits))
    val q = bucketed.where(col("vec_id") === queryId)
      .select(col("embedding").as("q_vec"), col("bucket").as("q_bucket"))
    bucketed.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= queryId)
      .select(col("vec_id"), col("bucket"),
        round(VectorOps.cosine(col("embedding"), col("q_vec")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
