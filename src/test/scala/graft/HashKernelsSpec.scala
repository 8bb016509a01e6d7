package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{HashExpressions, TextHash}

/** Native hash kernels must be bit-equivalent to the HOF reference
  * formulations in TextHash / the zip_with dot product. */
class HashKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def gen: Gen[String] = {
    val piece = Gen.oneOf("aa", "bb", "cc", "dd", "ümlaut", "好好", "", " ")
    Gen.listOf(piece).map(_.mkString(" "))
  }
  private def texts(n: Int): Seq[String] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq("", " ", "a", "a b", "a b c", "a  b c d", "x y z x y z x y z")

  test("native minhash == HOF minhash(shingles) on generated texts") {
    val df = texts(200).toDF("text").select(
      HashExpressions.minhashSig(col("text")).as("native"),
      TextHash.minhashSignature(TextHash.shingles(col("text"))).as("hof"))
    val bad = df.collect().filterNot(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(bad.isEmpty, s"${bad.length} signature mismatches")
  }

  test("native simhash == HOF simhash on generated texts") {
    val df = texts(200).toDF("text").select(
      HashExpressions.simhash(col("text")).as("native"),
      TextHash.simhash("text").as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("native tagged grams == HOF concat/zip_with formulation on generated texts") {
    val df = texts(200).toDF("text").select(
      HashExpressions.taggedGrams(col("text")).as("native"),
      graft.operators.TextAnalysis.taggedGramsHof(col("text")).as("hof"))
    val bad = df.collect().filterNot(r =>
      r.getSeq[String](0) == r.getSeq[String](1))
    assert(bad.isEmpty, s"${bad.length} tagged-gram mismatches")
  }

  test("native span gram hashes == positional HOF formulation on generated texts") {
    val n = 3
    val t = TextHash.tokens(col("text"))
    val hof = when(size(t) < n, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => TextHash.h1(concat_ws(" ", slice(t, i + lit(1), lit(n))))))
    val df = texts(200).toDF("text").select(
      HashExpressions.spanGramHashes(col("text"), n).as("native"), hof.as("hof"))
    val bad = df.collect().filterNot(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(bad.isEmpty, s"${bad.length} span-gram mismatches")
    // positional length contract: exactly max(ntok - n + 1, 0) entries
    val lens = texts(50).toDF("text").select(
      size(HashExpressions.spanGramHashes(col("text"), n)).as("m"),
      size(t).as("ntok")).collect()
    lens.foreach(r => assert(r.getInt(0) == math.max(r.getInt(1) - n + 1, 0)))
  }

  test("native gram stats == driver multiset recomputation on generated texts") {
    for (n <- Seq(2, 3)) {
      val rows = texts(200).toDF("text").select(col("text"),
        HashExpressions.gramStats(col("text"), n).as("st")).collect()
      rows.foreach { r =>
        val toks = r.getString(0).toLowerCase.split(" ", -1).toSeq
        val grams = toks.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
        val st = r.getSeq[Long](1)
        assert(st.length == 3)
        assert(st(0) == grams.size.toLong, s"n_grams for '${r.getString(0)}'")
        assert(st(1) == counts.size.toLong, s"n_distinct for '${r.getString(0)}'")
        assert(st(2) == (if (counts.isEmpty) 0L else counts.values.max.toLong),
          s"top_count for '${r.getString(0)}'")
      }
    }
  }

  test("native mattr == driver sliding-window recomputation on generated texts") {
    for (w <- Seq(3, 25)) {
      val rows = texts(200).toDF("text").select(col("text"),
        HashExpressions.mattrBp(col("text"), w).as("m")).collect()
      rows.foreach { r =>
        val toks = r.getString(0).toLowerCase.split(" ", -1).toSeq
        val expected =
          if (toks.length < w) -1L
          else {
            val wins = toks.sliding(w).filter(_.length == w).toSeq
            wins.map(_.distinct.length.toLong).sum * 10000 /
              (wins.length.toLong * w)
          }
        assert(r.getLong(1) == expected, s"w=$w text='${r.getString(0)}'")
      }
    }
  }

  test("native sign band keys == per-plane expression tree on real embeddings") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("embedding").cast("array<double>").as("v"))
    val df = e.select(
      HashExpressions.signBandKeys(col("v"), 8, 16).as("native"),
      graft.operators.Similarity.bandKeysHof(col("v")).as("hof"))
    val bad = df.collect().filterNot(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(bad.isEmpty, s"${bad.length} band-key mismatches")
    // sign boundary: the zero vector has every dot == 0 (NOT > 0) → all keys 0
    val zero = Seq(Seq.fill(64)(0.0)).toDF("v").select(
      HashExpressions.signBandKeys(col("v").cast("array<double>"), 8, 16).as("k"))
    assert(zero.head.getSeq[Long](0) == Seq.fill(8)(0L))
  }

  test("native int8 audit == HOF round/clamp/fold chain on real embeddings") {
    val df = Tables.embeddings(spark, sf0001)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(
        HashExpressions.int8Audit(col("v")).as("native"),
        graft.operators.Similarity.quantizationAuditHof(col("v")).as("hof"))
    val bad = df.collect().filterNot(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(bad.isEmpty, s"${bad.length} audit mismatches")
    // edge cases: zero vector (scale guard), exact ±absmax saturation,
    // negative half-way values (HALF_UP rounds away from zero)
    val edges = Seq(Seq.fill(16)(0.0), Seq(1.0, -1.0, 0.5, -0.5),
      Seq(127.0, -127.0, 63.5, -63.5)).toDF("v")
      .select(HashExpressions.int8Audit(col("v").cast("array<double>")).as("native"),
        graft.operators.Similarity.quantizationAuditHof(col("v")).as("hof"))
    edges.collect().foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // null elements: sse_micro goes NULL (the additive fold poisons),
    // n_sat counts only non-null elements, scale from non-null absmax —
    // the bit-equivalence contract holds on null-BEARING arrays too
    val nulls = Seq(
      Seq[java.lang.Double](1.0, null, -2.0, 2.0),  // mixed: null sse, sat from non-null
      Seq[java.lang.Double](null, null),            // all-null: null sse, 0 sat
      Seq[java.lang.Double]()                       // empty: [0, 0] both sides
    ).toDF("v")
      .select(HashExpressions.int8Audit(col("v").cast("array<double>")).as("native"),
        graft.operators.Similarity.quantizationAuditHof(col("v")).as("hof"))
    nulls.collect().foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1),
        s"null-bearing mismatch: native=${r.getSeq[Any](0)} hof=${r.getSeq[Any](1)}")
    }
  }

  test("native dot == HOF zip_with/aggregate fold, bit-exact") {
    val vecs = (0 until 50).map { i =>
      (Seq.tabulate(8)(j => math.sin(i * 8 + j)), Seq.tabulate(8)(j => math.cos(i * 8 + j)))
    }
    val df = vecs.toDF("a", "b").select(
      HashExpressions.dotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
    // bitwise equality, not tolerance — fold order must be identical
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("native ngram jaccard == array_intersect formulation on text pairs") {
    val ts = texts(80)
    val pairs = ts.zip(ts.reverse)
    val df = pairs.toDF("a", "b").select(
      HashExpressions.ngramJaccard(col("a"), col("b")).as("native"),
      {
        val sa = TextHash.shingles(col("a"))
        val sb = TextHash.shingles(col("b"))
        val inter = size(array_intersect(sa, sb)).cast("double")
        (inter / ((size(sa) + size(sb)).cast("double") - inter)).as("hof")
      })
    // both-empty shingle sets: HOF Divide(0,0) is NULL and the kernel
    // returns NULL too (a NaN would wrongly pass >= filters under
    // Spark's nan-safe ordering)
    val bad = df.collect().filterNot { r =>
      (r.isNullAt(0) && r.isNullAt(1)) ||
        (!r.isNullAt(0) && !r.isNullAt(1) && r.getDouble(0) == r.getDouble(1))
    }
    assert(bad.isEmpty, s"${bad.length} jaccard mismatches")
    // the degenerate case must actually be exercised and be NULL
    val degenerate = Seq(("hi", "yo")).toDF("a", "b")
      .select(HashExpressions.ngramJaccard(col("a"), col("b")).as("j"))
    assert(degenerate.head.isNullAt(0), "sub-n-token pair must yield NULL")
  }

  test("native shingle hashes == HOF transform(shingles, h1), in order") {
    val df = texts(150).toDF("text").select(
      HashExpressions.shingleHashes(col("text")).as("native"),
      transform(TextHash.shingles(col("text")), g => TextHash.h1(g)).as("hof"))
    val bad = df.collect().filterNot(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(bad.isEmpty, s"${bad.length} shingle-hash mismatches")
  }

  test("native shingle strings == HOF split/slice/array_join chain, in order") {
    val df = texts(150).toDF("text").select(
      HashExpressions.shingles(col("text")).as("native"),
      TextHash.shingles(col("text")).as("hof"))
    val bad = df.collect().filterNot(r => r.getSeq[String](0) == r.getSeq[String](1))
    assert(bad.isEmpty, s"${bad.length} shingle-string mismatches")
    // and on the real corpus, both gram orders and texts agree
    val corpus = Tables.documents(spark, sf0001).select(
      HashExpressions.shingles(col("text"), 5).as("native"),
      TextHash.shingles(col("text"), 5).as("hof"))
    val badC = corpus.collect().filterNot(r => r.getSeq[String](0) == r.getSeq[String](1))
    assert(badC.isEmpty, s"${badC.length} corpus shingle-string mismatches")
  }

  test("native quality score == four-term HOF chain, bit-exact") {
    val hof = graft.operators.TextAnalysis.qualityScoreHof(col("text"))
    val native = graft.operators.TextAnalysis.qualityScore(col("text"))
    val gen = texts(150).toDF("text")
      .select(native.as("n"), hof.as("h")).collect()
      .filterNot(r => r.getDouble(0) == r.getDouble(1))
    assert(gen.isEmpty, s"${gen.length} generated-text mismatches")
    val corpus = Tables.documents(spark, sf0001)
      .select(native.as("n"), hof.as("h")).collect()
      .filterNot(r => java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
    assert(corpus.isEmpty, s"${corpus.length} corpus mismatches")
  }

  test("kernels ride whole-stage codegen on a real scan") {
    val plan = Tables.documents(spark, sf0001)
      .select(HashExpressions.minhashSig(col("text")).as("mh"),
        HashExpressions.simhash(col("text")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen:\n$plan")
    val vplan = Tables.embeddings(spark, sf0001)
      .select(HashExpressions.int8Audit(
        col("embedding").cast("array<double>")).as("a"))
      .queryExecution.executedPlan.toString
    assert(vplan.contains("*(1) Project"), s"expected codegen:\n$vplan")
  }
}
