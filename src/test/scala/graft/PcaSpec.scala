package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Distributed PCA: one-pass moments, driver-side Jacobi eigen,
  * codegen projection. Algebraic goldens pin the double-precision
  * path the fixed-point oracle row (ns_embed_gram) cannot see.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobi eigen: reconstructs a known symmetric matrix, values descending") {
    val a = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, 0.25),
      Array(0.5, 0.25, 2.0))
    val (vals, vecs) = Pca.jacobiEigen(a)
    assert(vals.sliding(2).forall(p => p(0) >= p(1)), vals.mkString(","))
    // trace and Frobenius norm are rotation invariants
    assert(math.abs(vals.sum - 9.0) < 1e-9)
    // A·v = λ·v for every pair
    for (c <- vals.indices) {
      val v = vecs(c)
      val av = a.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
      av.zip(v).foreach { case (got, x) =>
        assert(math.abs(got - vals(c) * x) < 1e-9,
          s"eigenpair $c: A·v=${av.mkString(",")} λv=${vals(c)}·${v.mkString(",")}")
      }
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "unit vector")
    }
    // orthogonality
    assert(math.abs(vecs(0).zip(vecs(1)).map { case (x, y) => x * y }.sum) < 1e-9)
  }

  test("fit recovers a planted dominant direction; projection matches driver math") {
    // synthetic: points spread along u = (1,2,0,...)/√5 with small
    // noise in a second direction — the first component must align
    // with u and capture most variance
    val d = 8
    val rnd = new scala.util.Random(18)
    val u = Array(1.0, 2.0, 0, 0, 0, 0, 0, 0).map(_ / math.sqrt(5.0))
    val w = Array(0.0, 0, 1, 0, 0, 0, 0, 0)
    val rows = (1 to 400).map { _ =>
      val a = rnd.nextGaussian() * 10
      val b = rnd.nextGaussian() * 0.5
      Array.tabulate(d)(j => (a * u(j) + b * w(j) + 3.0).toFloat).toSeq
    }
    val df = rows.toDF("embedding")
    val model = Pca.fit(df, "embedding", d, k = 2)
    assert(model.variance(0) > 50 && model.variance(0) > 20 * model.variance(1),
      model.variance.mkString(","))
    val dot = math.abs(model.components(0).zip(u)
      .map { case (x, y) => x * y }.sum)
    assert(dot > 0.999, s"first component must align with planted u: $dot")
    // codegen projection == driver-side math, row for row
    val projected = Pca.project(df, "embedding", model, "pc")
      .select("embedding", "pc")
      .as[(Seq[Float], Seq[Double])].collect()
    projected.foreach { case (x, pc) =>
      val flat = model.components.flatten
      val expect = Pca.projectOne(x.map(_.toDouble).toArray,
        model.mean, flat, 2, d)
      pc.zip(expect).foreach { case (got, e) =>
        assert(math.abs(got - e) < 1e-9, s"$got vs $e")
      }
    }
    // the projection is the native expression (no UDF). On a local
    // relation Catalyst constant-folds the whole projection into a
    // LocalTableScan (fine — that IS the interpreted eval the row
    // comparison above already verified); a datasource-backed frame
    // keeps it in the physical plan where whole-stage codegen
    // compiles it.
    val tmp = java.nio.file.Files.createTempDirectory("graft-pca-").toString
    df.write.mode("overwrite").parquet(tmp)
    val onDisk = Pca.project(spark.read.parquet(tmp), "embedding", model, "pc")
    assert(onDisk.queryExecution.executedPlan.toString
      .contains("graft_pca_project"), onDisk.queryExecution.executedPlan)
    val codegenSum =
      onDisk.select(sum(element_at(col("pc"), 1))).as[Double].head()
    assert(math.abs(codegenSum - projected.map(_._2.head).sum) < 1e-6,
      s"codegen projection sum $codegenSum")
  }

  test("short input arrays project identically in interpreted and codegen paths") {
    // d=4 model, inputs of length 2: terms beyond the input's length
    // are SKIPPED in both paths (ADVICE r18 — interpreted eval used to
    // zero-pad and subtract mean for all d, codegen stopped at
    // numElements, so the same row projected differently depending on
    // whether whole-stage codegen fired)
    val d = 4
    val mean = Array(1.0, 2.0, 3.0, 4.0)
    val comps = Array(Array(0.5, -0.25, 0.125, 1.0),
      Array(-1.0, 0.75, 2.0, -0.5))
    val model = Pca.PcaModel(mean, comps, Array(2.0, 1.0))
    val expect = Array.tabulate(2)(c =>
      comps(c)(0) * (10.0 - mean(0)) + comps(c)(1) * (20.0 - mean(1)))
    // interpreted: Expression.eval on a literal input
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val flat = comps.flatten
    val interp = graft.operators.Pca.PcaProjectExpr(
        Literal.create(Seq(10.0, 20.0),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, false)),
        mean, flat, 2, d)
      .eval(null).asInstanceOf[ArrayData].toDoubleArray()
    // codegen: datasource-backed frame keeps the expression physical
    val tmp = java.nio.file.Files.createTempDirectory("graft-pca-short-")
      .toString
    Seq(Seq(10.0f, 20.0f)).toDF("embedding").write
      .mode("overwrite").parquet(tmp)
    val viaDf = Pca.project(spark.read.parquet(tmp), "embedding", model, "pc")
      .select("pc").as[Seq[Double]].head().toArray
    for (c <- 0 until 2) {
      assert(math.abs(interp(c) - expect(c)) < 1e-12,
        s"interpreted c=$c: ${interp(c)} vs ${expect(c)}")
      assert(math.abs(viaDf(c) - expect(c)) < 1e-12,
        s"codegen c=$c: ${viaDf(c)} vs ${expect(c)}")
    }
  }

  test("moments merge == global: partitioning cannot change the fixed-point gram") {
    val d = 4
    val rows = (1 to 200).map(i =>
      Seq.tabulate(d)(j => ((i * 31 + j * 17) % 13 - 6).toFloat / 3f))
    val one = rows.toDF("e").repartition(1)
    val many = rows.toDF("e").repartition(13)
    def g(df: org.apache.spark.sql.DataFrame) =
      Pca.gramFixedPoint(df, "e", d)
        .as[(Int, Int, Long)].collect().toSet
    assert(g(one) == g(many), "fixed-point gram must be partition-invariant")
    // and it matches the brute-force driver sum exactly
    val brute = (for (i <- 0 until d; j <- 0 until d) yield (i, j,
      rows.map(r => math.floor(r(i).toDouble * r(j).toDouble * 1e6).toLong)
        .sum)).toSet
    assert(g(one) == brute)
  }
}
