package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the dedup/similarity hot paths.
  *
  * Each expression is the bit-exact twin of a higher-order-function
  * formulation in [[TextHash]]/[[graft.operators.Similarity]] (kept there
  * as the reference semantics; HashKernelsSpec asserts equivalence row by
  * row, and the unchanged DuckDB oracles re-prove it per round). The HOFs
  * are CodegenFallback — per-row ArrayData allocation and interpreted
  * lambdas; these kernels do one pass over the UTF-8 bytes / double
  * arrays inside whole-stage codegen.
  *
  * Determinism contract: identical md5-hex-nibble arithmetic
  * (x1 = hex chars 1-15, x2 = chars 17-31, family (x1%P + i·x2%P)%P),
  * identical shingle strings (adjacent split tokens joined by ' ' equal
  * the source substring, including empty tokens), identical sequential
  * float fold order for dot products.
  */
object HashKernels {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** (x1, x2): values of md5-hex nibbles [0,15) and [16,31) — exactly
    * conv(substr(hex,1,15),16,10) and conv(substr(hex,17,15),16,10). */
  def md5Halves(bytes: Array[Byte], off: Int, len: Int): (Long, Long) = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var x1 = 0L
    var i = 0
    while (i < 15) {
      val nib = if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf else d(i >> 1) & 0xf
      x1 = (x1 << 4) | nib
      i += 1
    }
    var x2 = 0L
    i = 16
    while (i < 31) {
      val nib = if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf else d(i >> 1) & 0xf
      x2 = (x2 << 4) | nib
      i += 1
    }
    (x1, x2)
  }

  /** Token boundaries of `bytes` split on single 0x20 bytes — identical to
    * split(s, " ") including empty tokens. Returns flat [start0, end0,
    * start1, end1, …]. NB TokenHitCount.count keeps its own fused
    * single-pass variant of this loop (no bounds array in its hot path);
    * both are pinned to the same split(lower(s), " ") contract by their
    * equivalence specs (HashKernelsSpec / TokenHitCountSpec), which is
    * what guards against the two copies drifting. */
  private def tokenBounds(bytes: Array[Byte]): Array[Int] = {
    // Two passes, zero boxing: split on single 0x20 bytes always yields
    // (#spaces + 1) tokens (empties included), so the exact bound count
    // is known up front — one right-sized int[] per row, no ArrayList
    // of boxed Integers churning garbage in the per-row hot path.
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) spaces += 1; i += 1 }
    val out = new Array[Int](2 * (spaces + 1))
    var m = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        out(m) = start; out(m + 1) = i
        m += 2
        start = i + 1
      }
      i += 1
    }
    out
  }

  /** MinHash signature: k running minima of the (x1 + i·x2) mod P family
    * over DISTINCT word n-gram shingles. Empty result set → all-P
    * signature (the HOF aggregate's init), matching
    * TextHash.minhashSignature(shingles(text)). */
  def minhash(s: UTF8String, n: Int, k: Int): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, TextHash.P)
    if (nTok >= n) {
      // adjacent tokens are separated by exactly one space, so the n-gram
      // joined with ' ' IS the source substring [start(i), end(i+n-1))
      val seen = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i <= nTok - n) {
        val from = bounds(2 * i)
        val until = bounds(2 * (i + n - 1) + 1)
        if (seen.add(UTF8String.fromBytes(bytes, from, until - from))) {
          val (x1, x2) = md5Halves(bytes, from, until - from)
          val a = x1 % TextHash.P
          val b = x2 % TextHash.P
          var j = 0
          while (j < k) {
            val h = (a + j * b) % TextHash.P
            if (h < sig(j)) sig(j) = h
            j += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** 48-bit SimHash over ALL split tokens (empties included — the HOF
    * hashes every token of split(lower(s), " ")). */
  def simhash(s: UTF8String, bits: Int): Long = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val bounds = tokenBounds(bytes)
    val sums = new Array[Int](bits)
    var t = 0
    while (t < bounds.length) {
      val (x1, _) = md5Halves(bytes, bounds(t), bounds(t + 1) - bounds(t))
      var j = 0
      while (j < bits) {
        sums(j) += (((x1 >> j) & 1L).toInt << 1) - 1
        j += 1
      }
      t += 2
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** Distinct word n-gram shingle HASHES (60-bit md5 halves, first-
    * occurrence order) — twin of transform(shingles(text,n), g -> h1(g)).
    * Insertion-ordered so the result is element-equal to the HOF form,
    * not just set-equal. */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    while (i <= nTok - n) {
      val from = bounds(2 * i)
      val until = bounds(2 * (i + n - 1) + 1)
      if (seen.add(UTF8String.fromBytes(bytes, from, until - from))) {
        val (x1, _) = md5Halves(bytes, from, until - from)
        out.add(x1)
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct word n-gram shingle STRINGS, first-occurrence order — twin
    * of TextHash.shingles (split/slice/array_join HOF chain). The gram
    * text is the literal source substring between the first and last
    * token's bounds, which equals the join-with-single-space form because
    * split cuts on exactly one space (empty tokens at double spaces are
    * zero-width in both). One pass, no per-gram string building. */
  def shingleStrings(s: UTF8String, n: Int): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i <= nTok - n) {
      val from = bounds(2 * i)
      val until = bounds(2 * (i + n - 1) + 1)
      val g = UTF8String.fromBytes(bytes, from, until - from)
      if (seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** POSITIONAL word n-gram hashes (60-bit md5 halves), one per start
    * position, NO dedup — element i is h1 of the gram starting at token
    * i (0-based). The exact-substring span-scrub accounting (q105) needs
    * every occurrence because its rule is "a span is duplicated if the
    * same n tokens appear anywhere else in the corpus, including earlier
    * in the same document" — the distinct shingle tables above erase the
    * within-doc repeats that rule counts. Twin of
    * transform(positional-gram HOF, g -> h1(g)); pinned bit-equal by
    * HashKernelsSpec. */
  def spanGramHashes(s: UTF8String, n: Int): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    val m = math.max(nTok - n + 1, 0)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val from = bounds(2 * i)
      val until = bounds(2 * (i + n - 1) + 1)
      val (x1, _) = md5Halves(bytes, from, until - from)
      out(i) = x1
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Moving-average type-token ratio (MATTR) in integer basis points:
    * the mean distinct-token count over every w-token sliding window,
    * scaled — Σ_windows distinct(window) · 10000 / (n_windows · w).
    * ONE pass with an incremental count map (add the entering token,
    * retire the leaving one), O(n) per row regardless of w. Returns −1
    * for documents shorter than w tokens (no window — callers filter).
    * The length-bias-free diversity score (plain TTR decays with doc
    * length by Heaps' law; MATTR holds the window fixed). */
  def mattrBp(s: UTF8String, w: Int): Long = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    if (nTok < w) return -1L
    def tok(i: Int): UTF8String =
      UTF8String.fromBytes(bytes, bounds(2 * i), bounds(2 * i + 1) - bounds(2 * i))
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var distinct = 0
    var i = 0
    while (i < w) {
      val t = tok(i)
      val prev = counts.get(t)
      if (prev == null) { counts.put(t, 1); distinct += 1 }
      else counts.put(t, prev.intValue() + 1)
      i += 1
    }
    var sumDistinct = distinct.toLong
    while (i < nTok) {
      val in = tok(i)
      val pin = counts.get(in)
      if (pin == null) { counts.put(in, 1); distinct += 1 }
      else counts.put(in, pin.intValue() + 1)
      val out = tok(i - w)
      val pout = counts.get(out).intValue()
      if (pout == 1) { counts.remove(out); distinct -= 1 }
      else counts.put(out, pout - 1)
      sumDistinct += distinct
      i += 1
    }
    val nWin = (nTok - w + 1).toLong
    sumDistinct * 10000L / (nWin * w)
  }

  /** Per-row positional n-gram multiset statistics in ONE pass:
    * [n_grams, n_distinct, top_count] (total occurrences, distinct gram
    * strings, the most-repeated gram's occurrence count). Keys are the
    * gram STRINGS (zero-copy byte slices, no hashing ambiguity), so the
    * counts are exact — the per-document repetition kernel (q157) that
    * replaces an explode + corpus-wide (doc, gram) shuffle with a
    * map-side projection. */
  def gramStats(s: UTF8String, n: Int): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var total = 0L
    var top = 0L
    var i = 0
    while (i <= nTok - n) {
      val from = bounds(2 * i)
      val until = bounds(2 * (i + n - 1) + 1)
      val g = UTF8String.fromBytes(bytes, from, until - from)
      val prev = counts.get(g)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(g, Integer.valueOf(c))
      if (c > top) top = c.toLong
      total += 1
      i += 1
    }
    new GenericArrayData(Array(total, counts.size.toLong, top))
  }

  /** Fused heuristic quality score — twin of the four-term HOF chain in
    * TextAnalysis.qualityScoreHof, ONE pass over the tokens instead of
    * four (split + array_distinct + lexicon filter + length): 0.25·each
    * of length prior, type-token ratio, 1−stopword ratio, avg-token-
    * length prior. The double arithmetic is written in the exact
    * association order of the Column tree so results are bit-identical.
    * Empty tokens (double spaces) count toward ntok and distinct exactly
    * as split() produces them; they are never stopword members. */
  def qualityScore(s: UTF8String, stop: java.util.HashSet[UTF8String]): Double = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    val seen = new java.util.HashSet[UTF8String](math.max(nTok * 2, 8))
    var stops = 0
    var i = 0
    while (i < nTok) {
      val from = bounds(2 * i)
      val len = bounds(2 * i + 1) - from
      val tok = UTF8String.fromBytes(bytes, from, len)
      seen.add(tok)
      if (len > 0 && stop.contains(tok)) stops += 1
      i += 1
    }
    val ntok = nTok.toDouble
    val ttr = seen.size.toDouble / ntok
    val stopRatio = stops.toDouble / ntok
    val avgLen = (s.numChars().toDouble - (ntok - 1.0)) / ntok
    0.25 * math.min(ntok / 50.0, 1.0) +
      0.25 * ttr +
      0.25 * (1.0 - stopRatio) +
      0.25 * math.min(avgLen / 6.0, 1.0)
  }

  /** Distinct word n-gram shingles as zero-copy byte-slice UTF8Strings. */
  def shingleSet(s: UTF8String, n: Int): java.util.HashSet[UTF8String] = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    val out = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i <= nTok - n) {
      val from = bounds(2 * i)
      val until = bounds(2 * (i + n - 1) + 1)
      out.add(UTF8String.fromBytes(bytes, from, until - from))
      i += 1
    }
    out
  }

  /** Exact n-gram Jaccard between two texts — twin of
    * size(array_intersect(shA, shB)) / (size(shA)+size(shB)-inter) with
    * the same double arithmetic. Both-empty → NULL, matching Spark's
    * Divide(0,0) and DuckDB's 0.0/0.0 (both NULL, both dropped by a
    * threshold filter — a NaN here would instead COMPARE TRUE under
    * Spark's nan-safe ordering and emit bogus pairs). */
  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): java.lang.Double = {
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    if (sa.isEmpty && sb.isEmpty) return null
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    val i = inter.toDouble
    java.lang.Double.valueOf(i / ((sa.size + sb.size).toDouble - i))
  }

  /** Sequential-fold dot product — same order as aggregate(zip_with(...)).
    * Returns null (boxed) exactly when the HOF would: length mismatch
    * (zip_with pads with null) or a null element — so the "bit-exact
    * twin" contract holds on malformed input too. */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    var acc = 0.0
    i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  /** Deterministic ±1 hyperplane matrix, cached per (count, dim): seed-42
    * scala.util.Random, row-major. THE single source of truth —
    * Similarity.Hyperplanes reads this (no second RNG stream to drift),
    * and [[signBandKeys]] consumes it directly in the fused kernel. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  def planesFor(count: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((count, dim), { case (c, d) =>
      val rng = new scala.util.Random(42)
      Array.fill(c)(Array.fill(d)(if (rng.nextBoolean()) 1.0 else -1.0))
    })

  /** All `bands` sign-LSH band keys of `v` in one fused pass: key b has
    * bit i set iff v · plane_{b·bandPlanes+i} > 0, with the dot folded in
    * the same sequential order as [[dotOrNull]]/the DotProduct kernel —
    * bit-identical keys to the 128-expression HOF tree it replaces,
    * without 128 per-row kernel calls and ArrayData round-trips. */
  def signBandKeys(v: ArrayData, bands: Int, bandPlanes: Int): ArrayData = {
    val x = v.toDoubleArray()
    val planes = planesFor(bands * bandPlanes, x.length)
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var i = 0
      while (i < bandPlanes) {
        val w = planes(b * bandPlanes + i)
        var acc = 0.0
        var j = 0
        while (j < x.length) { acc += x(j) * w(j); j += 1 }
        if (acc > 0) key |= (1L << i)
        i += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Spark's `round(x, 0)` for doubles, exactly: shortest-decimal
    * BigDecimal (valueOf) + HALF_UP, NaN/Inf passed through — the kernel
    * must reproduce the built-in bit-for-bit or the oracle twins drift. */
  private def roundHalfUp(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Fused int8 scalar-quantization audit of one vector: absmax scale,
    * per-element round-half-up + clamp to ±127, squared reconstruction
    * error folded SEQUENTIALLY, result as exact integer micro-units plus
    * the saturated-component count — `[sse_micro, n_sat]`. Bit-identical
    * to the HOF chain (array_max/transform/zip_with/aggregate/filter with
    * Spark `round`) it replaces, in one pass with no per-row ArrayData
    * tree interpretation. */
  def int8Audit(v: ArrayData): ArrayData = {
    val n = v.numElements()
    // Null elements follow the HOF twin (quantizationAuditHof) exactly:
    // array_max SKIPS nulls, one null term poisons the additive SSE fold
    // (acc + NULL = NULL), and filter() skips null quantized elements —
    // so sse_micro is NULL iff any element is null, n_sat counts only
    // non-null elements, and the absmax scale comes from the non-null
    // ones. Previously toDoubleArray() silently coerced nulls to 0.0,
    // breaking the declared bit-equivalence on null-bearing arrays.
    var anyNull = false
    var nonNull = 0
    var amax = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) anyNull = true
      else {
        nonNull += 1
        val a = math.abs(v.getDouble(i)); if (a > amax) amax = a
      }
      i += 1
    }
    var nSat = 0L
    var sse = 0.0
    if (nonNull > 0) {
      // all-null arrays leave array_max NULL → scale NULL → every
      // quantized element NULL → filter() keeps nothing (nSat = 0)
      val scale = if (amax == 0.0) 1.0 else amax / 127.0
      i = 0
      while (i < n) {
        if (!v.isNullAt(i)) {
          val x = v.getDouble(i)
          var q = roundHalfUp(x / scale)
          if (q < -127.0) q = -127.0
          if (q > 127.0) q = 127.0
          if (math.abs(q) == 127.0) nSat += 1
          val e = x - q * scale
          sse += e * e
        }
        i += 1
      }
    }
    // primitive fast path for the common null-free case (no boxing)
    if (!anyNull)
      new GenericArrayData(Array(roundHalfUp(sse * 1000000.0).toLong, nSat))
    else
      new GenericArrayData(Array[Any](null, java.lang.Long.valueOf(nSat)))
  }

  /** Tagged grams for repetition scoring: "t:"+token for every token of
    * split(lower(s), " ") (empties included), then "b:"+tok_i+' '+tok_i+1
    * for every adjacent pair — tokens first, bigrams second, matching the
    * HOF concat order. One pass over the UTF-8 bytes; the bigram body is
    * the literal source substring between the two token bounds. */
  def taggedGrams(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    val out = new Array[AnyRef](nTok + math.max(0, nTok - 1))
    var i = 0
    while (i < nTok) {
      val from = bounds(2 * i)
      val len = bounds(2 * i + 1) - from
      val buf = new Array[Byte](2 + len)
      buf(0) = 't'; buf(1) = ':'
      System.arraycopy(bytes, from, buf, 2, len)
      out(i) = UTF8String.fromBytes(buf)
      i += 1
    }
    i = 0
    while (i < nTok - 1) {
      val from = bounds(2 * i)
      val len = bounds(2 * (i + 1) + 1) - from
      val buf = new Array[Byte](2 + len)
      buf(0) = 'b'; buf(1) = ':'
      System.arraycopy(bytes, from, buf, 2, len)
      out(nTok + i) = UTF8String.fromBytes(buf)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native fused sign-LSH band-key expression (twin of the per-plane
  * when(dot > 0, …) tree in Similarity.bandKeysHof). */
case class SignBandKeys(child: Expression, bands: Int, bandPlanes: Int)
    extends UnaryExpression {
  require(bands > 0 && bandPlanes > 0 && bandPlanes < 64,
    s"sign_band_keys needs 0 < bandPlanes < 64 and bands > 0 (got $bands, $bandPlanes)")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_band_keys needs array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_band_keys"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.signBandKeys(input.asInstanceOf[ArrayData], bands, bandPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.signBandKeys($c, $bands, $bandPlanes)")
  override protected def withNewChildInternal(newChild: Expression): SignBandKeys =
    copy(child = newChild)
}

/** Native fused int8-quantization-audit expression (twin of the HOF
  * chain in Similarity.quantizationAuditHof): `[sse_micro, n_sat]`. */
case class Int8Audit(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_audit needs array<double>, got $other")
  }
  // sse_micro is NULL for null-bearing input arrays (matching the HOF
  // twin's null propagation), so the result element type is nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "int8_audit"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.int8Audit(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.int8Audit($c)")
  override protected def withNewChildInternal(newChild: Expression): Int8Audit =
    copy(child = newChild)
}

/** Native tagged-gram expression (twin of the HOF formulation in
  * TextAnalysis.repetitionSummary: concat of "t:"-prefixed tokens and
  * "b:"-prefixed adjacent bigrams of split(lower(s), " "), empties
  * included). One byte pass; adjacent tokens are separated by exactly
  * one space, so each bigram joined with ' ' IS the source substring. */
case class TaggedGrams(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"tagged_grams needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tagged_grams"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.taggedGrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.taggedGrams($c)")
  override protected def withNewChildInternal(newChild: Expression): TaggedGrams =
    copy(child = newChild)
}

/** Native MinHash signature expression (twin of
  * TextHash.minhashSignature(TextHash.shingles(text))). */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n > 0 && k > 0, s"minhash_sig needs n > 0 and k > 0 (got n=$n, k=$k)")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"minhash_sig needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.minhash(input.asInstanceOf[UTF8String], n, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhash($c, $n, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native distinct-shingle-hash expression (twin of
  * transform(TextHash.shingles(text, n), g => TextHash.h1(g))). */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingle_hashes needs n > 0 (got $n)")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"shingle_hashes needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Positional (non-distinct) n-gram hash array — the q105 span-scrub
  * gram stream; see [[HashKernels.spanGramHashes]]. */
case class SpanGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"span_gram_hashes needs n > 0 (got $n)")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"span_gram_hashes needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_gram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.spanGramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.spanGramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): SpanGramHashes =
    copy(child = newChild)
}

/** Moving-average TTR in basis points (−1 below w tokens) — the q170
  * diversity kernel; see [[HashKernels.mattrBp]]. */
case class MattrBp(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"mattr_bp needs w > 0 (got $w)")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"mattr_bp needs string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "mattr_bp"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.mattrBp(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.mattrBp($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): MattrBp =
    copy(child = newChild)
}

/** Per-row n-gram multiset stats [n_grams, n_distinct, top_count] — the
  * q157 intra-document repetition kernel; see [[HashKernels.gramStats]]. */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"gram_stats needs n > 0 (got $n)")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"gram_stats needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_stats"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.gramStats(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.gramStats($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

/** Native distinct-shingle-string expression (twin of
  * TextHash.shingles — the gram text itself, for consumers that output
  * grams rather than hashes, e.g. the q73 duplicated-n-gram detector). */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingles needs n > 0 (got $n)")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"shingles needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.shingleStrings(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.shingleStrings($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Native fused quality-score expression (twin of
  * TextAnalysis.qualityScoreHof — one token pass instead of four HOF
  * evaluations; bit-identical double arithmetic). */
case class QualityScore(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"quality_score needs string, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"
  @transient private lazy val stopSet: java.util.HashSet[UTF8String] =
    TokenHitCount.buildSet(stopwords)
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.qualityScore(input.asInstanceOf[UTF8String], stopSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.qualityScore($c, $setRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}

/** Native SimHash expression (twin of TextHash.simhash). */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 63, s"simhash needs 0 < bits <= 63 (got $bits)")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash needs string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhash(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Native sequential dot product over two array<double> columns (twin of
  * aggregate(zip_with(a, b, _*_), 0.0, _+_)). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  private def ok(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<double>, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("graftDot")
      s"""
      java.lang.Double $tmp = graft.functions.HashKernels.dotOrNull($a, $b);
      if ($tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $tmp.doubleValue();
      }"""
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native exact n-gram Jaccard over two raw text columns (twin of the
  * array_intersect formulation over shingle arrays — avoids materializing
  * and shuffling the shingle arrays entirely). */
case class NGramJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  require(n > 0, s"ngram_jaccard needs n > 0 (got $n)")
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_jaccard needs strings, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.ngramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("graftJac")
      s"""
      java.lang.Double $tmp = graft.functions.HashKernels.ngramJaccard($a, $b, $n);
      if ($tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $tmp.doubleValue();
      }"""
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NGramJaccard =
    copy(left = newLeft, right = newRight)
}

object HashExpressions {
  def minhashSig(text: Column, n: Int = 3, k: Int = 16): Column =
    bridge.column(MinHashSig(bridge.expression(text), n, k))
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column =
    bridge.column(NGramJaccard(bridge.expression(a), bridge.expression(b), n))
  def shingleHashes(text: Column, n: Int = 3): Column =
    bridge.column(ShingleHashes(bridge.expression(text), n))
  def shingles(text: Column, n: Int = 3): Column =
    bridge.column(Shingles(bridge.expression(text), n))
  def spanGramHashes(text: Column, n: Int = 3): Column =
    bridge.column(SpanGramHashes(bridge.expression(text), n))
  def gramStats(text: Column, n: Int): Column =
    bridge.column(GramStats(bridge.expression(text), n))
  def mattrBp(text: Column, w: Int): Column =
    bridge.column(MattrBp(bridge.expression(text), w))
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    bridge.column(QualityScore(bridge.expression(text), stopwords))
  def simhash(text: Column, bits: Int = 48): Column =
    bridge.column(SimHash(bridge.expression(text), bits))
  def dotProduct(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))
  def taggedGrams(text: Column): Column =
    bridge.column(TaggedGrams(bridge.expression(text)))
  def signBandKeys(v: Column, bands: Int, bandPlanes: Int): Column =
    bridge.column(SignBandKeys(bridge.expression(v), bands, bandPlanes))

  def int8Audit(v: Column): Column =
    bridge.column(Int8Audit(bridge.expression(v)))
}
