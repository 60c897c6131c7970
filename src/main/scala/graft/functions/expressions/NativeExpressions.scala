package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the signature/similarity hot paths.
  *
  * The composed higher-order-function forms (zip_with/aggregate/transform)
  * are semantically identical but evaluate lambdas interpreted, one
  * closure dispatch per element per hash — at 50k docs x 150 shingles x 64
  * hashes that is ~500M interpreted evaluations. These expressions do the
  * same math in tight JVM loops over ArrayData, which measured ~20x
  * faster on the minhash path.
  *
  * All of them implement `doGenCode`, so they participate in whole-stage
  * codegen: the generated code makes ONE static call per row into
  * [[NativeOps]] with the unboxed ArrayData/UTF8String operands (no
  * CodegenFallback row boxing, no WSCG break). Interpreted eval delegates
  * to the SAME helpers, so both paths are bit-identical by construction.
  *
  * Float discipline: CosineSim accumulates in double, strictly
  * left-to-right — bit-identical to the sequential aggregate() fold it
  * replaces, so oracle-checked rank outputs are unchanged.
  */

/** Shared kernels for the signature expressions. Top-level object →
  * scalac emits static forwarders, so janino-generated code can call
  * `NativeOps.minhashSignature(...)` directly. */
object NativeOps {

  /** For each seed j in [0, numHashes): min XXH64 over the string
    * elements (MaxValue sentinel for empty arrays). */
  def minhashSignature(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash as 4x16-bit chunks: bit i = sign of the sum over tokens of
    * ±1, sign bit-derived from XXH64(token, i). */
  def simhashChunks(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var b = 0
        while (b < 64) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, b.toLong)
          sums(b) += (if (h > 0) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    val chunks = new Array[Long](4)
    var c = 0
    while (c < 4) {
      var v = 0L
      var j = 0
      while (j < 16) {
        v = v * 2 + (if (sums(c * 16 + j) > 0) 1L else 0L)
        j += 1
      }
      chunks(c) = v
      c += 1
    }
    new GenericArrayData(chunks)
  }

  /** Distinct word n-grams joined by single spaces, insertion-ordered
    * (matches the transform+array_distinct composition it replaces). */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val count = arr.numElements() - (n - 1)
    if (count < 1) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(UTF8String.fromString(" "), parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** ALL word n-grams in position order (duplicates kept) — the
    * positional variant of wordShingles, for span-level dedup and
    * repetition stats where every occurrence counts. */
  def wordShinglesAll(arr: ArrayData, n: Int): ArrayData = {
    val count = arr.numElements() - (n - 1)
    if (count < 1) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Binary-search membership in an ASCENDING-sorted int array —
    * O(log n) per probe vs array_contains' linear scan; the per-token
    * kernel under x151's in-row excision filter (a fully-contaminated
    * doc probes |w| times against a |w|-sized position set: linear
    * membership is |w|² there, this is |w| log |w|). Caller contract:
    * sorted ascending, no null elements (sort_array over a collect_set
    * of non-null ints — exactly how x151 builds it). */
  def sortedContains(arr: ArrayData, key: Int): Boolean = {
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = arr.getInt(mid)
      if (v == key) return true
      if (v < key) lo = mid + 1 else hi = mid - 1
    }
    false
  }

  /** Canonical text image for dedup/fingerprinting: NFC-normalize
    * (composed forms — "Café" typed either way compares equal),
    * lowercase codepoint-by-codepoint (`Character.toLowerCase` — the
    * SIMPLE, context-free Unicode case mapping; `String.toLowerCase`
    * would be context-SENSITIVE, mapping a trailing Greek Σ to final
    * sigma ς where DuckDB's utf8proc `lower` — also a simple per-
    * codepoint map — produces σ, so the twins would diverge on Greek
    * text), collapse runs of RE2-`\s` whitespace ([\t\n\f\r ] — matched
    * exactly so the DuckDB regexp twin agrees byte-for-byte) to one
    * space, trim. */
  def normalizeText(s: UTF8String): UTF8String = {
    val norm = java.text.Normalizer
      .normalize(s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(norm.length)
    var i = 0
    var pendingSpace = false
    while (i < norm.length) {
      val cp = norm.codePointAt(i)
      // lowercase first is safe either way: no codepoint lowercases
      // INTO the \s class, and \s chars are caseless
      val lc = Character.toLowerCase(cp)
      if (lc == ' ' || lc == '\t' || lc == '\n' || lc == '\f' || lc == '\r') {
        pendingSpace = sb.length() > 0
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(lc)
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Top-k calendar selection for the broadcast interval join: walk the
    * day range [ud0, ud1] clamped to the calendar, insertion-select the
    * k best (score desc, key asc) entries across the covered days.
    * Day arrays are per-day top-k already, so the scan touches at most
    * days × k candidates. Output: ARRAY<STRUCT<pt_key, score>> best
    * first. */
  def intervalTopK(ud0: Int, ud1: Int, ptKeys: Array[Array[Long]],
                   scores: Array[Array[Double]], minUd: Int, k: Int): ArrayData = {
    val selK = new Array[Long](k)
    val selS = new Array[Double](k)
    var n = 0
    var d = if (ud0 > minUd) ud0 else minUd
    val maxUd = minUd + ptKeys.length - 1
    val dEnd = if (ud1 < maxUd) ud1 else maxUd
    while (d <= dEnd) {
      val pk = ptKeys(d - minUd)
      val sc = scores(d - minUd)
      var i = 0
      while (i < pk.length) {
        val s = sc(i)
        val key = pk(i)
        var pos = n
        while (pos > 0 && (s > selS(pos - 1) ||
            (s == selS(pos - 1) && key < selK(pos - 1)))) pos -= 1
        if (pos < k) {
          val last = if (n < k) n else k - 1
          var j = last
          while (j > pos) { selS(j) = selS(j - 1); selK(j) = selK(j - 1); j -= 1 }
          selS(pos) = s
          selK(pos) = key
          if (n < k) n += 1
        }
        i += 1
      }
      d += 1
    }
    val rows = new Array[Any](n)
    var j = 0
    while (j < n) {
      rows(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](selK(j), selS(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  /** Distinct character n-grams, codepoint-aware via UTF8String. */
  def charShingles(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      seen.add(s.substring(i, i + n))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Integer dot product of two int8-quantized vectors. Null (boxed) on
    * length mismatch or a null element — same degenerate-input contract
    * as dotProduct. Accumulates in long: 64 * 127 * 127 is far inside
    * range. */
  def dotBytes(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }

  /** Morton (Z-order) interleave of two bucket ordinals, `bits` bits
    * each: bit i of a lands at position 2i, bit i of b at 2i+1. Inputs
    * are expected in [0, 2^bits); out-of-range bits are masked. */
  def interleaveBits(a: Int, b: Int, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Number of patterns occurring in s, each counted at most once. */
  def substringHits(s: UTF8String, pats: Array[UTF8String]): Int = {
    var hits = 0
    var i = 0
    while (i < pats.length) {
      if (s.contains(pats(i))) hits += 1
      i += 1
    }
    hits
  }

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Dot product with HOF (zip_with+aggregate) null semantics: null when
    * the lengths differ or any element is null; boxed Double otherwise. */
  def dotProduct(a: ArrayData, b: ArrayData,
                 aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += elem(a, i, aFloat) * elem(b, i, bFloat)
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  /** Cosine similarity with cosineHof's exact semantics: null element on
    * either side → null; zero denominator (either norm 0) → 0.0; length
    * mismatch with nonzero norms → null (the HOF dot of mismatched arrays
    * is null); else dot/denom. Each accumulator folds strictly
    * left-to-right, bit-identical to the sequential aggregate() it
    * replaces. */
  def cosineSim(a: ArrayData, b: ArrayData,
                aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var sa = 0.0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) return null
      val x = elem(a, i, aFloat)
      sa += x * x
      i += 1
    }
    var sb = 0.0
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) return null
      val y = elem(b, j, bFloat)
      sb += y * y
      j += 1
    }
    val denom = math.sqrt(sa) * math.sqrt(sb)
    if (denom == 0.0) return java.lang.Double.valueOf(0.0)
    if (na != nb) return null
    var dot = 0.0
    var k = 0
    while (k < na) {
      dot += elem(a, k, aFloat) * elem(b, k, bFloat)
      k += 1
    }
    java.lang.Double.valueOf(dot / denom)
  }

  /** All sign-LSH bucket ids of a vector in one pass: for table t, bit i,
    * the sign of dot(vec, planes[t*bits+i]) sets bit i of bucket t.
    * `planes` is flattened [table][bit][dim] row-major. Bit-exact with the
    * composed form it fuses (see LshBuckets) on well-formed vectors;
    * degenerate input (length != dim, or a null element) FAILS LOUDLY
    * instead of reproducing the composed form's silent all-zero buckets —
    * every such vector would otherwise collide in bucket 0 of every
    * table, collapsing LSH blocking into a quadratic self-join. Raising
    * here (not in a driver-side pre-check) covers every call site — the
    * Scala operators, SQL `lsh_buckets` users, and streaming plans —
    * with zero extra jobs. */
  def lshBuckets(vec: ArrayData, planes: Array[Double], nTables: Int,
                 bits: Int, dim: Int, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"lsh_buckets: input vector has $n elements but the blocking is configured " +
        s"for dim=$dim — a mismatched vector would hash to bucket 0 of every table " +
        "(degenerate quadratic blocking); set dim to the embedding dimension")
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) throw new IllegalArgumentException(
        s"lsh_buckets: null element at position $i — null-bearing vectors would all " +
          "collide in bucket 0; filter or impute them before blocking")
      v(i) = elem(vec, i, isFloat)
      i += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    var off = 0
    while (t < nTables) {
      var bkt = 0L
      var b = 0
      while (b < bits) {
        var d = 0.0
        var j = 0
        while (j < dim) { d += v(j) * planes(off + j); j += 1 }
        if (d >= 0) bkt |= (1L << b)
        off += dim
        b += 1
      }
      out(t) = bkt
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Johnson-Lindenstrauss random projection: out_k = (1/√outDim) ·
    * Σ_j v_j · g_kj with g the seeded Gaussian plane stream — the
    * dimensionality-reduction kernel that shrinks an embedding before
    * indexing. Same strictness as [[lshBuckets]]: mismatched length or
    * null elements fail loudly (a silently zero-padded vector would
    * project to a wrong but plausible point). */
  def jlProject(vec: ArrayData, planes: Array[Double], outDim: Int,
                dim: Int, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"jl_project: input vector has $n elements but the projection is " +
        s"configured for dim=$dim — set dim to the embedding dimension")
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) throw new IllegalArgumentException(
        s"jl_project: null element at position $i — filter or impute " +
          "null-bearing vectors before projecting")
      v(i) = elem(vec, i, isFloat)
      i += 1
    }
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var k = 0
    var off = 0
    while (k < outDim) {
      var d = 0.0
      var j = 0
      while (j < dim) { d += v(j) * planes(off + j); j += 1 }
      out(k) = d * scale
      off += dim
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Ids of the `nProbe` best centroids for a vector by exact cosine,
    * ordered best-first (ties: smaller centroid id). Per-centroid cosine
    * keeps NativeOps.cosineSim's exact semantics — the composed form this
    * fuses scored `cosine(vec, cvec_literal)` per centroid — but hoists
    * the vector-norm accumulation out of the per-centroid loop and takes
    * the centroid norms precomputed (both bit-identical: same operations,
    * same order). A zero-norm side still scores 0.0 (before any length
    * check — cosineSim's exact order). Degenerate input — a null element,
    * or a length mismatch against a nonzero-norm centroid — FAILS LOUDLY:
    * the composed form's null scores would silently funnel every such
    * vector into the lowest-id centroid's list (one giant quadratic
    * probe list), the IVF analogue of LSH's bucket-0 collapse. */
  def topCentroids(vec: ArrayData, cids: Array[Int], cvecs: Array[Array[Double]],
                   cnormSqrts: Array[Double], nProbe: Int, isFloat: Boolean): ArrayData = {
    val nc = cids.length
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) throw new IllegalArgumentException(
        s"top_centroids: null element at position $i — null-bearing vectors would all " +
          "be assigned to one centroid list; filter or impute them before indexing")
      v(i) = elem(vec, i, isFloat)
      i += 1
    }
    var sa = 0.0
    var k = 0
    while (k < n) { sa += v(k) * v(k); k += 1 }
    val saSqrt = math.sqrt(sa)
    val sims = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val cv = cvecs(c)
      val denom = saSqrt * cnormSqrts(c)
      if (denom == 0.0) sims(c) = 0.0
      else if (cv.length != n) throw new IllegalArgumentException(
        s"top_centroids: input vector has $n elements but centroid ${cids(c)} has " +
          s"${cv.length} — heterogeneous dimensions cannot be indexed together")
      else {
        var dot = 0.0
        var j = 0
        while (j < n) { dot += v(j) * cv(j); j += 1 }
        sims(c) = dot / denom
      }
      c += 1
    }
    val order = new Array[Integer](nc)
    var o = 0
    while (o < nc) { order(o) = Integer.valueOf(o); o += 1 }
    java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
      override def compare(x: Integer, y: Integer): Int = {
        val bySim = java.lang.Double.compare(sims(y.intValue()), sims(x.intValue()))
        if (bySim != 0) bySim
        else Integer.compare(cids(x.intValue()), cids(y.intValue()))
      }
    })
    val m = math.min(nProbe, nc)
    val out = new Array[Int](m)
    var p = 0
    while (p < m) { out(p) = cids(order(p).intValue()); p += 1 }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Sampling.hashBucket replicated in the JVM: the unsigned 32-bit
    * value of the first 8 hex chars (= first 4 bytes) of
    * md5(key + ":" + salt), exactly what
    * conv(substring(md5(k || ':' || salt), 1, 8), 16, 10) yields. */
  private def hashBucketJvm(key: String, salt: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(':'.toByte)
    md.update(salt.getBytes)
    val d = md.digest()
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) | ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  /** One-loop mask/span-corruption rewrite shared by x142 (spanLen=1,
    * numbered=false: every hit token becomes "[MASK]") and x166
    * (spanLen=L, numbered=true: a hit cell's start becomes
    * "<extra_id_k>", its other tokens are dropped). Cell s of a doc is
    * hit iff hashBucket(docId + ":" + s, salt) < rate * 2^32 — the
    * exact keepAtRate arithmetic (cast and compare in double). Returns
    * (n_tokens, n_spans, n_masked, out) where out is the rewritten
    * token stream joined by single spaces. */
  def spanMaskRewrite(toks: ArrayData, docId: Long, spanLen: Int,
                      rate: Double, salt: UTF8String,
                      numbered: Boolean): InternalRow = {
    val n = toks.numElements()
    val threshold = rate * 4294967296.0
    val pieces = new java.util.ArrayList[UTF8String](n)
    var masked = 0L
    var spans = 0L
    var k = 0L
    var hit = false
    var i = 0
    while (i < n) {
      if (i % spanLen == 0) { // cell start: one hash decides the cell
        hit = hashBucketJvm(java.lang.Long.toString(docId) + ":" + i, salt)
          .toDouble < threshold
        if (hit) {
          spans += 1
          if (numbered) {
            pieces.add(UTF8String.fromString("<extra_id_" + k + ">")); k += 1
          } else pieces.add(MaskSentinel)
        }
      } else if (hit && !numbered) pieces.add(MaskSentinel)
      if (hit) masked += 1
      if (!hit) pieces.add(toks.getUTF8String(i))
      i += 1
    }
    val out = UTF8String.concatWs(SpaceSep,
      pieces.toArray(new Array[UTF8String](pieces.size())): _*)
    InternalRow(n.toLong, spans, masked, out)
  }

  private val MaskSentinel = UTF8String.fromString("[MASK]")
  private val SpaceSep = UTF8String.fromString(" ")

  /** Gopher token stats in one pass: (n_alpha, n_stop) where n_alpha
    * counts tokens containing an ASCII letter (identical to
    * `rlike("[A-Za-z]")` — [A-Za-z] are single UTF-8 bytes and
    * multi-byte sequences always have the high bit set, so a byte scan
    * cannot false-positive) and n_stop counts DISTINCT stop words
    * present (identical to size(array_intersect(array_distinct(toks),
    * stops)) — each stop counted at most once). */
  def gopherTokenStats(toks: ArrayData, stops: Array[UTF8String]): InternalRow = {
    val n = toks.numElements()
    var alpha = 0L
    val seen = new Array[Boolean](stops.length)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val b = t.getBytes
        var j = 0
        var has = false
        while (j < b.length && !has) {
          val c = b(j)
          has = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
          j += 1
        }
        if (has) alpha += 1
        var s = 0
        while (s < stops.length) {
          if (!seen(s) && stops(s).equals(t)) seen(s) = true
          s += 1
        }
      }
      i += 1
    }
    var nStop = 0L
    var s = 0
    while (s < seen.length) { if (seen(s)) nStop += 1; s += 1 }
    InternalRow(alpha, nStop)
  }
}

/** MinHash signature: for each seed j in [0, numHashes), the min XXH64
  * over the string elements. Empty/absent arrays yield MaxValue sentinels
  * (same as array_min over empty = null handled upstream by size>0 guard). */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.minhashSignature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.minhashSignature($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash as 4x16-bit chunks over string tokens: bit i = sign of the sum
  * over tokens of ±1 where the sign is bit-derived from XXH64(token, i). */
case class SimHashChunks(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.simhashChunks(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.simhashChunks($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-grams from a token array, joined by single spaces —
  * the shingle generator for MinHash / n-gram dedup. One pass, one
  * LinkedHashSet (insertion-ordered, matching the transform+array_distinct
  * composition it replaces); the HOF form re-built each gram via
  * interpreted concat_ws + element_at lambdas. */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.wordShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All word n-grams of a token array in position order, duplicates
  * kept — the positional twin of WordShingles for span-level dedup
  * (every occurrence of a duplicated gram is a span to count) and
  * within-document repetition statistics. */
case class WordShinglesAll(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.wordShinglesAll(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.wordShinglesAll($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct character n-grams of a string (language-ID / char-level
  * near-dup signal). Codepoint-aware via UTF8String substring. */
/** Per-row top-k selection over a broadcast day-calendar (the x61
  * kernel): children are the interval's [unix_date(d0), unix_date(d1)];
  * the per-day top-k candidate lists ride as reference objects (the
  * TopCentroids discipline — bounded days × k data, never per-row
  * literals), and the whole selection is one JVM call inside
  * whole-stage codegen — no join, no shuffle, no interpreted
  * higher-order functions (a transform/array_sort composition of the
  * same logic is CodegenFallback and measured ~10x slower). */
case class IntervalTopK(left: Expression, right: Expression,
                        ptKeys: IndexedSeq[IndexedSeq[Long]],
                        scores: IndexedSeq[IndexedSeq[Double]],
                        minUd: Int, k: Int)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pt_key", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "interval_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) =>
        if (k >= 1 && ptKeys.length == scores.length) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires k >= 1 and aligned calendars")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (INT, INT) day bounds, got $other")
    }

  @transient private lazy val pkArr: Array[Array[Long]] =
    ptKeys.map(_.toArray).toArray
  @transient private lazy val scArr: Array[Array[Double]] =
    scores.map(_.toArray).toArray

  override def nullSafeEval(a: Any, b: Any): Any =
    NativeOps.intervalTopK(a.asInstanceOf[Int], b.asInstanceOf[Int],
      pkArr, scArr, minUd, k)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode = {
    val pkRef = ctx.addReferenceObj("ptKeys", pkArr, "long[][]")
    val scRef = ctx.addReferenceObj("scores", scArr, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.NativeOps.intervalTopK(" +
        s"$a, $b, $pkRef, $scRef, $minUd, $k);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Canonical text normalization (NFC + casefold + whitespace collapse)
  * — the projection a corpus runs before exact/near dedup so trivially
  * different encodings of one document collapse. One JVM kernel call
  * per row inside whole-stage codegen. */
case class NormalizeText(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.normalizeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.normalizeText($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CharShingles(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.charShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.charShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product over int8-quantized vectors (ARRAY<TINYINT>) —
  * the scoring kernel for quantized similarity search: 4x narrower
  * vectors through every broadcast and shuffle, integer multiply-adds
  * in the hot loop. Null on length mismatch or null elements (the
  * dot_product contract). */
case class DotProductBytes(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_bytes"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<TINYINT> on both sides, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    NativeOps.dotBytes(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotb")
      s"""
         |java.lang.Long $tmp = graft.functions.expressions.NativeOps.dotBytes($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Membership probe into an ASCENDING-sorted ARRAY<INT> via binary
  * search ([[NativeOps.sortedContains]]) — array_contains' semantics at
  * O(log n) per probe, for hot in-row filters over a presorted set
  * (x151's excision filter). Null if either side is null; the sortedness
  * contract is the CALLER's (an unsorted array silently misses). */
case class SortedArrayContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_array_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<INT>, INT), got $other")
    }

  override def nullSafeEval(arr: Any, key: Any): Any =
    NativeOps.sortedContains(arr.asInstanceOf[ArrayData], key.asInstanceOf[Int])

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.functions.expressions.NativeOps.sortedContains($a, $k);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Morton (Z-order) bit interleave of two bucket ordinals — the curve
  * value behind multi-dimensional layout clustering (see
  * operators.Layout). Null if either side is null. */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  // 31 bits/dim is the Int-shift ceiling and 2*31 bits fill the Long;
  // beyond that the JVM shift widths wrap and the curve value is garbage
  require(bits >= 1 && bits <= 31,
    s"interleave_bits requires 1 <= bits <= 31, got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (INT, INT), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    NativeOps.interleaveBits(a.asInstanceOf[Int], b.asInstanceOf[Int], bits)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.NativeOps.interleaveBits($a, $b, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Number of `patterns` occurring in the input string (each counted at
  * most once) — the language-ID profile-hit counter. One pass per
  * pattern with UTF8String.contains; replaces building a per-row
  * distinct-n-gram set plus an array_intersect per profile. */
case class SubstringHits(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "substring_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.sql}")
  }

  @transient private lazy val pats: Array[UTF8String] =
    patterns.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    NativeOps.substringHits(input.asInstanceOf[UTF8String], pats)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode = {
    // the compiled pattern array rides along as a reference object
    val patsRef = ctx.addReferenceObj("pats", pats,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.substringHits($c, $patsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity over float/double arrays; 0.0 when either norm is 0.
  * Null semantics match the HOF twin `cosineHof` exactly: null element on
  * either side → null, length mismatch (with nonzero norms) → null — see
  * NativeOps.cosineSim. Full doGenCode: ONE static kernel call per row
  * inside whole-stage codegen. */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def okVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okVec(left.dataType) && okVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> on both sides, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val leftFloat = elemIsFloat(left)
  @transient private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any =
    NativeOps.cosineSim(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cos")
      s"""
         |java.lang.Double $tmp = graft.functions.expressions.NativeOps.cosineSim(
         |  $a, $b, $leftFloat, $rightFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product (double), same accumulation discipline as CosineSim; null
  * semantics match the HOF twin `dotHof` (null on length mismatch or null
  * element — see NativeOps.dotProduct). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def okVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okVec(left.dataType) && okVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> on both sides, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val leftFloat = elemIsFloat(left)
  @transient private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any =
    NativeOps.dotProduct(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.expressions.NativeOps.dotProduct(
         |  $a, $b, $leftFloat, $rightFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All sign-LSH bucket ids of an embedding in ONE pass: element i of the
  * result is the vector's bucket in hyperplane table i (bit b = sign of
  * the dot against plane b of that table, packed little-endian).
  *
  * Fuses the composed form — nTables x bits separate
  * `when(dot_product(vec, plane_literal) >= 0, 1L << b)` columns OR-reduced
  * per table — into a single kernel call per row: the planes ride along as
  * one flat double[] reference object instead of nTables*bits*dim literal
  * expressions, and the vector is unpacked from ArrayData once instead of
  * once per plane. Bit-identical outputs (same Gaussian stream, same
  * left-to-right double accumulation; asserted in ExtrasSpec).
  *
  * Plane generation is deterministic from (seed): the same
  * scala.util.Random Gaussian stream, filled [table][bit][dim], that the
  * composed form drew. */
case class LshBuckets(child: Expression, nTables: Int, bits: Int, dim: Int, seed: Long)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Flattened [table][bit][dim] planes — the exact Gaussian stream of the
    * composed form (Similarity.planes). */
  @transient private lazy val planes: Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nTables * bits * dim)(rnd.nextGaussian())
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.lshBuckets(input.asInstanceOf[ArrayData], planes, nTables, bits, dim, isFloat)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.lshBuckets(" +
        s"$c, $planesRef, $nTables, $bits, $dim, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Johnson-Lindenstrauss projection of a float/double vector to `outDim`
  * dimensions: ARRAY<DOUBLE> with out_k = (1/√outDim)·dot(vec, plane_k),
  * planes the deterministic seeded Gaussian stream (the [[LshBuckets]]
  * generator without the sign quantization — LSH IS this projection's
  * 1-bit extreme). One kernel call per row; the outDim×dim plane matrix
  * rides as a reference object. */
case class JlProject(child: Expression, outDim: Int, dim: Int, seed: Long)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "jl_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Flattened [outDim][dim] planes — the LshBuckets Gaussian stream. */
  @transient private lazy val planes: Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(outDim * dim)(rnd.nextGaussian())
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.jlProject(input.asInstanceOf[ArrayData], planes, outDim, dim, isFloat)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.jlProject(" +
        s"$c, $planesRef, $outDim, $dim, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ids of the nProbe nearest centroids (exact cosine, best first, ties to
  * the smaller id) against a driver-collected codebook.
  *
  * Fuses the composed IVF scoring — transform over a literal
  * array<struct<sim,negid>> then array_max (assignment) or
  * slice(reverse(array_sort(...))) (probing) — into one kernel call: the
  * codebook travels as reference objects (ids, pre-widened vectors,
  * precomputed norms) rather than a nCentroids x dim literal tree, the
  * query norm is computed once instead of once per centroid, and no
  * intermediate struct array is materialized. Same ranking, bit-identical
  * (asserted in ExtrasSpec). Not SQL-registered: the codebook is runtime
  * driver data, not a literal a SQL text form could carry. */
case class TopCentroids(child: Expression, centroids: Seq[(Int, IndexedSeq[Float])],
                        nProbe: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (nProbe >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires nProbe >= 1, got $nProbe")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val cids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val cvecs: Array[Array[Double]] =
    centroids.map(_._2.map(_.toDouble).toArray).toArray
  /** sqrt of each centroid's self-dot, accumulated left-to-right — the
    * same `sqrt(sb)` factor cosineSim computes per call. */
  @transient private lazy val cnormSqrts: Array[Double] =
    cvecs.map { cv =>
      var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(input: Any): Any =
    NativeOps.topCentroids(input.asInstanceOf[ArrayData], cids, cvecs, cnormSqrts,
      nProbe, isFloat)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
    val cvecsRef = ctx.addReferenceObj("cvecs", cvecs, "double[][]")
    val cnormsRef = ctx.addReferenceObj("cnorms", cnormSqrts, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.topCentroids(" +
        s"$c, $cidsRef, $cvecsRef, $cnormsRef, $nProbe, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-loop deterministic mask/span-corruption rewrite (x142/x166): the
  * composed form — per-token keepAtRate hash + an interpreted aggregate()
  * fold (x166) or a posexplode + per-token hash + collect_list + sort
  * reassembly (x142) — pays one lambda dispatch (and for x166 one
  * quadratic string concat) per token. This does the identical
  * arithmetic (md5-bucket per CELL, not per token) in one JVM pass per
  * row. Returns struct(n_tokens, n_spans, n_masked, out). */
case class SpanMaskRewrite(tokens: Expression, docId: Expression,
                           spanLen: Int, rate: Double, salt: String,
                           numbered: Boolean)
  extends BinaryExpression {

  require(spanLen > 0, s"span_mask_rewrite: spanLen=$spanLen")
  require(rate >= 0 && rate <= 1, s"span_mask_rewrite: rate=$rate")

  override def left: Expression = tokens
  override def right: Expression = docId
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_spans", LongType, nullable = false),
    StructField("n_masked", LongType, nullable = false),
    StructField("out", StringType, nullable = false)))
  override def prettyName: String = "span_mask_rewrite"

  override def checkInputDataTypes(): TypeCheckResult = (tokens.dataType, docId.dataType) match {
    case (ArrayType(StringType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (t, d) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<STRING>, BIGINT), got (${t.sql}, ${d.sql})")
  }

  @transient private lazy val saltU8: UTF8String = UTF8String.fromString(salt)

  override def nullSafeEval(toks: Any, id: Any): Any =
    NativeOps.spanMaskRewrite(toks.asInstanceOf[ArrayData],
      id.asInstanceOf[Long], spanLen, rate, saltU8, numbered)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", saltU8,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, (t, d) =>
      s"${ev.value} = graft.functions.expressions.NativeOps.spanMaskRewrite(" +
        s"$t, $d, $spanLen, $rate, $saltRef, $numbered);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(tokens = newLeft, docId = newRight)
}

/** One-pass gopher token stats (x147/x163/x168): replaces the
  * interpreted per-token `filter(toks, _.rlike("[A-Za-z]"))` lambda and
  * the array_distinct + array_intersect allocation for the stop-word
  * count with a single JVM loop. Returns struct(n_alpha, n_stop). */
case class GopherTokenStats(tokens: Expression, stops: Seq[String])
  extends UnaryExpression {

  require(stops.nonEmpty, "gopher_token_stats: empty stop list")

  override def child: Expression = tokens
  override def dataType: DataType = StructType(Seq(
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  override def prettyName: String = "gopher_token_stats"

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
  }

  @transient private lazy val stopsU8: Array[UTF8String] =
    stops.map(UTF8String.fromString).toArray

  override def nullSafeEval(toks: Any): Any =
    NativeOps.gopherTokenStats(toks.asInstanceOf[ArrayData], stopsU8)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopsU8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NativeOps.gopherTokenStats(" +
        s"$c, $stopsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)
}

object NativeExpressions {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  // Direct Column construction (session-independent — works from any
  // SparkSession). GraftExtensions additionally registers the same
  // expressions under SQL names for spark.sql users.
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(shingles), numHashes))
  def wordShingles(tokens: Column, n: Int): Column =
    column(WordShingles(expression(tokens), n))
  def wordShinglesAll(tokens: Column, n: Int): Column =
    column(WordShinglesAll(expression(tokens), n))
  def charShingles(text: Column, n: Int): Column =
    column(CharShingles(expression(text), n))
  def normalizeText(text: Column): Column =
    column(NormalizeText(expression(text)))
  def intervalTopK(ud0: Column, ud1: Column, ptKeys: Array[Array[Long]],
                   scores: Array[Array[Double]], minUd: Int, k: Int): Column =
    column(IntervalTopK(expression(ud0), expression(ud1),
      ptKeys.map(_.toIndexedSeq).toIndexedSeq,
      scores.map(_.toIndexedSeq).toIndexedSeq, minUd, k))
  def substringHits(text: Column, patterns: Seq[String]): Column =
    column(SubstringHits(expression(text), patterns))
  def spanMaskRewrite(tokens: Column, docId: Column, spanLen: Int,
                      rate: Double, salt: String, numbered: Boolean): Column =
    column(SpanMaskRewrite(expression(tokens), expression(docId),
      spanLen, rate, salt, numbered))
  def gopherTokenStats(tokens: Column, stops: Seq[String]): Column =
    column(GopherTokenStats(expression(tokens), stops))
  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    column(InterleaveBits(expression(a), expression(b), bits))
  def sortedArrayContains(arr: Column, key: Column): Column =
    column(SortedArrayContains(expression(arr), expression(key)))
  def dotProductBytes(a: Column, b: Column): Column =
    column(DotProductBytes(expression(a), expression(b)))
  def simhashChunks(tokens: Column): Column =
    column(SimHashChunks(expression(tokens)))
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def jlProject(vec: Column, outDim: Int, dim: Int, seed: Long): Column =
    column(JlProject(expression(vec), outDim, dim, seed))
  def lshBuckets(vec: Column, nTables: Int, bits: Int, dim: Int, seed: Long): Column =
    column(LshBuckets(expression(vec), nTables, bits, dim, seed))
  def topCentroids(vec: Column, centroids: Array[(Int, Array[Float])], nProbe: Int): Column =
    column(TopCentroids(expression(vec),
      centroids.map { case (id, v) => (id, v.toIndexedSeq) }.toIndexedSeq, nProbe))

  /** Spark's own runtime-filter bloom aggregate as a user-callable
    * Column: one mergeable sketch per group over LONG inputs (feed it
    * `xxhash64(key)` exactly as `InjectRuntimeFilter` does). The result
    * is a binary column probed with [[mightContain]] — the same pair of
    * internal expressions the optimizer injects for join pruning, here
    * exposed for explicit semi-join prefilters (e.g. bloom-gated
    * decontamination, Dedup.decontaminateBloom). */
  def bloomFilterAgg(hashed: Column, estimatedNumItems: Long, numBits: Long): Column =
    column(new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      expression(hashed),
      org.apache.spark.sql.catalyst.expressions.Literal(estimatedNumItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** `might_contain(<scalar subquery>, xxhash64(key))` — the probe side
    * of the pair. `bloomScalar` must be a 1-row 1-column frame (the
    * [[bloomFilterAgg]] aggregate); it rides into the plan as a
    * ScalarSubquery, the exact shape `InjectRuntimeFilter` emits (the
    * expression's analysis rule REJECTS a plain column input — the
    * sketch must be a constant or scalar subquery so it evaluates once,
    * not per row). No false negatives, so a downstream exact join sees
    * every true match; false positives only cost wasted probe rows. */
  def mightContainOf(bloomScalar: org.apache.spark.sql.DataFrame, hashed: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        bloomScalar.queryExecution.analyzed),
      expression(hashed)))
}
