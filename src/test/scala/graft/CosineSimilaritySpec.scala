package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity
import graft.functions.GraftFunctions

/** The native codegen expression must agree with the declarative
  * higher-order-function path on real embeddings, and handle edge cases. */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = { GraftFunctions.register(SparkTestSession.spark); SparkTestSession.spark }

  test("matches the declarative dot/norm formula on the embeddings table") {
    val emb = graft.io.Sources.embeddings(spark, "/root/testdata/sf0.001")
    val a = emb.limit(50).select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = emb.limit(50).select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ida") < col("idb"))
    val checked = pairs.select(
        expr("cosine_similarity(va, vb)").as("native"),
        (Similarity.dot(col("va"), col("vb")) /
          (Similarity.norm(col("va")) * Similarity.norm(col("vb")))).as("declarative"))
      .withColumn("diff", abs(col("native") - col("declarative")))
    val maxDiff = checked.agg(max("diff")).head.getDouble(0)
    // BIT-exact, not just close: ext/Similarity swaps the HOF formula for
    // this expression in the sim1-3 hot paths, and the oracle hash gate
    // (cround to 6 decimals) tolerates zero drift on tie-adjacent values.
    // Both paths accumulate dot and norm terms in index order, so exact
    // equality is the expected result, not a lucky one.
    assert(maxDiff == 0.0, s"max diff $maxDiff")
  }

  test("edge cases: identical, orthogonal, zero-norm, null input") {
    val row = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS same,
        |  cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS ortho,
        |  cosine_similarity(array(0.0D, 0.0D), array(1.0D, 1.0D)) AS zero,
        |  cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS nul,
        |  cosine_similarity(array(1.0D, 2.0D), array(1.0D)) AS mismatched
        |""".stripMargin).head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-15)
    assert(math.abs(row.getDouble(1)) < 1e-15)
    assert(row.isNullAt(2) && row.isNullAt(3))
    assert(row.isNullAt(4), "dimension mismatch must be null, not a prefix score")
  }

  test("survives both codegen and interpreted evaluation") {
    val emb = graft.io.Sources.embeddings(spark, "/root/testdata/sf0.001").limit(10)
    val viaSql = emb.selectExpr("cosine_similarity(embedding, embedding) AS c")
      .agg(min("c"), max("c")).head
    // self-similarity is exactly 1 for nonzero vectors
    assert(math.abs(viaSql.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(viaSql.getDouble(1) - 1.0) < 1e-9)
  }

  test("mat_vec_mul: known product, identity, mismatch null") {
    // the OPQ rotation kernel: flat row-major matrix x vector -> float[]
    val row = spark.sql(
      """SELECT
        |  mat_vec_mul(array(1.0D, 2.0D, 3.0D, 4.0D), array(10.0D, 100.0D)) AS m22,
        |  mat_vec_mul(array(1.0D, 0.0D, 0.0D, 1.0D), array(7.0D, -3.0D)) AS ident,
        |  mat_vec_mul(array(2.0D, 4.0D, 6.0D), array(0.5D, 0.5D)) AS badshape,
        |  mat_vec_mul(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS nul
        |""".stripMargin).head
    assert(row.getSeq[Float](0) === Seq(210.0f, 430.0f))
    assert(row.getSeq[Float](1) === Seq(7.0f, -3.0f))
    assert(row.isNullAt(2), "matrix length not divisible by vec -> null")
    assert(row.isNullAt(3))
  }

  test("mat_vec_mul: null elements in either argument contribute 0") {
    // the SQL-registered function is callable on arbitrary arrays — null
    // matrix cells must get the same skip guard as null vector cells
    // (round-12 ADVICE: getDouble on a null slot is undefined and the
    // interpreted and codegen paths could disagree)
    val row = spark.sql(
      """SELECT
        |  mat_vec_mul(array(1.0D, CAST(NULL AS DOUBLE), 3.0D, 4.0D),
        |              array(10.0D, 100.0D)) AS mnull,
        |  mat_vec_mul(array(1.0D, 2.0D, 3.0D, 4.0D),
        |              array(10.0D, CAST(NULL AS DOUBLE))) AS vnull
        |""".stripMargin).head
    // row 0: 1*10 + skip = 10; row 1: 3*10 + 4*100 = 430
    assert(row.getSeq[Float](0) === Seq(10.0f, 430.0f))
    // null vector cell skips column 1 in every row: 10, 30
    assert(row.getSeq[Float](1) === Seq(10.0f, 30.0f))
  }

  test("mat_vec_mul rotation preserves norms on real embeddings") {
    val emb = graft.io.Sources.embeddings(spark, "/root/testdata/sf0.001").limit(20)
    val rot = Similarity.opqRotation(
      graft.io.Sources.embeddings(spark, "/root/testdata/sf0.001"))
    // rotation preserves norms (orthonormal rows): |Rv| == |v| up to the
    // float round of each output coordinate
    val diffs = emb.select(col("vec_id"), Similarity.norm(col("embedding")).as("n"))
      .join(Similarity.rotate(emb, rot)
        .select(col("vec_id"), Similarity.norm(col("embedding")).as("rn")), "vec_id")
      .select(abs(col("n") - col("rn")).as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(diffs < 1e-3, s"rotation distorted norms by $diffs")
  }
}
