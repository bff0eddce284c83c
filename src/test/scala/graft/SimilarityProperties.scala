package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.llm.Similarity

/** Property proofs for the PQ/ADC algebra on ARBITRARY embedding tables:
  *
  *  1. The ADC identity — the whole point of asymmetric distance
  *     computation: the table-lookup score of an encoded vector equals the
  *     dot product of the query against the vector's CODEBOOK
  *     RECONSTRUCTION (Σ_s q_s·c_{s,code_s} = q · concat(c)). If the
  *     lookup pipeline ever scored anything else, PQ would be broken even
  *     with perfect codebooks.
  *  2. Rescore safety: the IVF×PQ top-k is exactly the exact-cosine
  *     ordering RESTRICTED to the ADC shortlist — rescoring may only
  *     reorder the shortlist, never invent or lose candidates.
  *
  * The planted keys show the operators running; these show the algebra
  * holds off the happy path. */
object SimilarityProperties extends Properties("PqAdc") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 64
  private val SubDim = 16
  private val M = 4

  private val embGen: Gen[List[(Long, Long, Array[Float])]] = for {
    n <- Gen.choose(6, 14)
    rows <- Gen.listOfN(n,
      Gen.listOfN(Dim, Gen.choose(-1.0, 1.0).map(_.toFloat)))
  } yield rows.zipWithIndex.map { case (v, i) =>
    ((i + 1).toLong, (i % 3).toLong, v.toArray)
  }

  // each sample runs several Spark jobs — algebra, not fuzz volume
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(6)

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  property("ADC lookup score == query · codebook-reconstruction") =
    Prop.forAll(embGen) { rows =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val emb = rows.toDF("vec_id", "label", "embedding")
      val cb = Similarity.pqCodebooks(emb, M, SubDim)
      val enc = Similarity.pqEncodeWith(emb, cb, SubDim)
      val books = cb.collect().map { r =>
        (r.getAs[Number]("s").intValue, r.getAs[Number]("code").longValue) ->
          r.getSeq[Double](2)
      }.toMap
      val codes = enc.collect().map { r =>
        (r.getAs[Number]("vec_id").longValue, r.getAs[Number]("s").intValue) ->
          r.getAs[Number]("code").longValue
      }.toMap
      val q = rows.head._3.map(_.toDouble).toSeq
      // pipeline ADC: per-subspace lookup tables, pivot, fixed-order sum
      val tables = cb.crossJoin(broadcast(
          emb.where(col("vec_id") === rows.head._1)
            .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))))
        .select(col("s"), col("code"),
          round(graft.functions.VectorOps.dot(
            expr(s"slice(qv, s * $SubDim + 1, $SubDim)"), col("cvec")), 6).as("t"))
      val adc = enc.join(broadcast(tables), Seq("s", "code"))
        .groupBy("vec_id")
        .agg(max(when(col("s") === 0, col("t"))).as("t0"),
          max(when(col("s") === 1, col("t"))).as("t1"),
          max(when(col("s") === 2, col("t"))).as("t2"),
          max(when(col("s") === 3, col("t"))).as("t3"))
        .select(col("vec_id"),
          (col("t0") + col("t1") + col("t2") + col("t3")).as("adc"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // reference: reconstruct each vector from its codes, one dot per
      // subspace against the query slice, rounded like the pipeline's t
      rows.forall { case (id, _, _) =>
        val ref = (0 until M).map { s =>
          val cvec = books((s, codes((id, s))))
          val t = dot(q.slice(s * SubDim, (s + 1) * SubDim), cvec)
          BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }.sum
        math.abs(adc(id) - ref) < 1e-9
      } :| s"adc=${adc.toSeq.sorted} vs reconstruction"
    }

  property("MIPS norm-bound pruning never changes the exact top-k") =
    Prop.forAll(embGen) { rows =>
      import spark.implicits._
      val emb = rows.toDF("vec_id", "label", "embedding")
      val asg = Similarity.assignCells(emb, Similarity.centroidVectors(emb))
      val qId = rows.head._1
      val k = 3
      val got = Similarity.mipsCore(asg, qId, k)._1
        .collect().map(_.getLong(0)).toSeq
      val q = rows.find(_._1 == qId).get._3.map(_.toDouble).toSeq
      val expect = rows.filter(_._1 != qId)
        .map { case (id, _, v) =>
          (id, BigDecimal(dot(v.map(_.toDouble).toSeq, q))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (id, ip) => (-ip, id) }.take(k).map(_._1)
      (got == expect) :| s"got=$got expect=$expect"
    }

  property("IVF-PQ top-k == exact cosine over the ADC shortlist") =
    Prop.forAll(embGen) { rows =>
      import spark.implicits._
      val emb = rows.toDF("vec_id", "label", "embedding")
      val qId = rows.head._1
      val k = 3
      val short = Similarity.ivfPqShortlist(emb, qId, nProbe = 2, depth = 5)
        .collect().map(_.getLong(0)).toSet
      val got = Similarity.annTopKIvfPq(emb, qId, k, nProbe = 2, rescoreDepth = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      val byId = rows.map(r => r._1 -> r._3.map(_.toDouble).toSeq).toMap
      val q = byId(qId)
      def cos(v: Seq[Double]): Double =
        dot(v, q) / (math.sqrt(dot(v, v)) * math.sqrt(dot(q, q)))
      val refOrder = short.toSeq
        .map(id => (id, BigDecimal(cos(byId(id)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (id, c) => (-c, id) }
        .take(k)
      val subset = got.map(_._1).forall(short.contains)
      val ordered = got.map(_._2).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b
        case _ => true
      }
      val agrees = got.map(_._1).toSeq == refOrder.map(_._1)
      (subset :| "returned ids must come from the shortlist") &&
        (ordered :| "cos_sim must be non-increasing") &&
        (agrees :| s"got=${got.toSeq} ref=$refOrder")
    }
}
