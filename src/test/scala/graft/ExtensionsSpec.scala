package graft

/** SQL-surface registration of the native expressions (public
  * SparkSessionExtensions hook + runtime registrar). */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate the native kernels") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT token_hit_count('Fast slow FAST', 'fast', 'slow') AS hits,
        |  simhash('a b c') AS sh,
        |  size(minhash_sig('a b c d e')) AS mlen,
        |  round(ngram_jaccard('a b c d', 'a b c d'), 4) AS jself,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  tagged_grams('a b') AS tg,
        |  sign_band_keys(array(1.0d, -2.0d, 0.5d), 8, 16) AS sbk,
        |  int8_audit(array(1.0d, -1.0d, 0.5d)) AS i8,
        |  shingles('a b c d', 3) AS shg,
        |  size(shingle_hashes('a b c d', 3)) AS shn,
        |  size(span_gram_hashes('a b a b', 2)) AS spn,
        |  quality_score('the cat sat') AS qs""".stripMargin)
      .head
    assert(r.getAs[Int]("hits") == 3)
    assert(r.getAs[Long]("sh") == graft.functions.HashKernels.simhash(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c"), 48))
    assert(r.getAs[Int]("mlen") == 16)
    assert(r.getAs[Double]("jself") == 1.0)
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getAs[scala.collection.Seq[String]]("tg").toSeq ==
      Seq("t:a", "t:b", "b:a b"))
    val sbkKernel = graft.functions.HashKernels.signBandKeys(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(1.0, -2.0, 0.5)), 8, 16)
    assert(r.getAs[scala.collection.Seq[Long]]("sbk").toSeq ==
      sbkKernel.toLongArray().toSeq)
    val i8Kernel = graft.functions.HashKernels.int8Audit(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(1.0, -1.0, 0.5)))
    assert(r.getAs[scala.collection.Seq[Long]]("i8").toSeq ==
      i8Kernel.toLongArray().toSeq)
    assert(r.getAs[scala.collection.Seq[String]]("shg").toSeq ==
      Seq("a b c", "b c d"))
    assert(r.getAs[Int]("shn") == 2)
    // positional (non-distinct): 'a b a b' has 3 bigram positions
    assert(r.getAs[Int]("spn") == 3)
    val qsKernel = graft.functions.HashKernels.qualityScore(
      org.apache.spark.unsafe.types.UTF8String.fromString("the cat sat"),
      graft.functions.TokenHitCount.buildSet(
        graft.operators.TextAnalysis.Stopwords))
    assert(r.getAs[Double]("qs") == qsKernel)
  }

  test("extensions class wires the same descriptions (injectFunction contract)") {
    // the class is instantiable and exposes every registered function
    val names = GraftExtensions.descriptions.map(_._1.funcName).toSet
    assert(names == Set("token_hit_count", "minhash_sig", "simhash",
      "ngram_jaccard", "dot_product", "tagged_grams", "sign_band_keys",
      "int8_audit", "shingles", "shingle_hashes", "span_gram_hashes",
      "quality_score"))
    new GraftExtensions() // must construct cleanly for spark.sql.extensions
  }

  test("non-literal lexicon argument fails analysis cleanly") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT token_hit_count('a', text) FROM VALUES ('x') t(text)")
        .collect()
    }
    assert(e.getMessage.contains("string literal") ||
      e.getMessage.toLowerCase.contains("failure"), e.getMessage)
  }
}
