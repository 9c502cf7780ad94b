package graft.functions

/** Primitive-loop vector kernels for embedding math.
  *
  * Catalyst's higher-order array functions (`aggregate`/`zip_with`) evaluate
  * a lambda expression tree per element — ~40µs per 64-dim cosine pair,
  * which dominates all-pairs similarity ops. These JVM while-loops are the
  * same computation at ~0.1µs/pair. Summation is left-to-right in double
  * with per-element float→double casts (exact), so results are bit-identical
  * to both the higher-order-function form and the DuckDB oracle's
  * `list_sum(list_transform(...))` — the IEEE reduction order never changes.
  *
  * Fixed-width numeric kernels are the one case where a tight JVM loop
  * beats the codegen'd expression tree (the same trade MLlib's BLAS
  * wrappers make); they are invoked from the native expressions
  * ([[CosineSimilarity]], [[LshBucket]], [[Simhash60]]) and from the
  * broadcast-block pair loops — never as ScalaUDFs.
  */
object VectorMath {

  def dotD(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  def normD(a: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(acc)
  }

  /** cosine(a, b) — NaN-free for zero vectors is NOT guaranteed; corpus
    * vectors are non-zero by construction.
    */
  def cosineD(a: Array[Float], b: Array[Float]): Double =
    dotD(a, b) / (normD(a) * normD(b))

  /** Fail loudly on null array elements: the parquet schema declares
    * `array<float>` with `containsNull = true`, and `ArrayData.getFloat`
    * on a null slot silently reads 0.0f — a wrong-answer mode the old
    * `Array[Float]`-typed UDFs surfaced as an NPE at decode time. One
    * predictable-branch scan per vector (~64 bit-checks) before the
    * arithmetic loops.
    */
  private def requireNoNulls(v: org.apache.spark.sql.catalyst.util.ArrayData,
                             fn: String): Unit = {
    var i = 0
    val n = v.numElements()
    while (i < n) {
      if (v.isNullAt(i)) throw new IllegalArgumentException(
        s"$fn: null element at index $i — embedding vectors must be null-free")
      i += 1
    }
  }

  /** cosine over Catalyst ArrayData in place (no array materialization) —
    * called from both the interpreted and generated code of
    * [[CosineSimilarity]]. Same reduction order as [[cosineD]].
    */
  def cosineArrayData(a: org.apache.spark.sql.catalyst.util.ArrayData,
                      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    requireNoNulls(a, "graft_cosine")
    requireNoNulls(b, "graft_cosine")
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < a.numElements()) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.numElements()) { val y = b.getFloat(i).toDouble; nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Equal-position count of two long arrays over ArrayData in place —
    * called from both the interpreted and generated code of
    * [[SigMatchCount]]. The minhash signature-agreement kernel: one
    * branch-free loop, no intermediate array, evaluated once per LSH
    * candidate pair.
    */
  def sigMatchCount(a: org.apache.spark.sql.catalyst.util.ArrayData,
                    b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    requireNoNulls(a, "graft_sig_match")
    requireNoNulls(b, "graft_sig_match")
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1L; i += 1 }
    c
  }

  /** First band (of `rowsPerBand` consecutive positions) where two
    * fixed-width signatures fully agree; -1 if none — called from both
    * the interpreted and generated code of [[FirstBandMatch]].
    */
  def firstBandMatch(a: org.apache.spark.sql.catalyst.util.ArrayData,
                     b: org.apache.spark.sql.catalyst.util.ArrayData,
                     rowsPerBand: Int): Int = {
    requireNoNulls(a, "graft_first_band_match")
    requireNoNulls(b, "graft_first_band_match")
    require(rowsPerBand > 0, "graft_first_band_match: rowsPerBand must be > 0")
    val n = math.min(a.numElements(), b.numElements())
    val bands = n / rowsPerBand
    var band = 0
    while (band < bands) {
      var eq = true
      var i = band * rowsPerBand
      val end = i + rowsPerBand
      while (eq && i < end) { eq = a.getLong(i) == b.getLong(i); i += 1 }
      if (eq) return band
      band += 1
    }
    -1
  }

  /** 60-bit md5-prefix token hash — the per-token form of
    * [[graft.functions.PortableHash.hash60]]'s contract: the integer
    * value of the first 15 md5 hex digits of the token's UTF-8 bytes,
    * reproducible in DuckDB as
    * `CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)`. This is what
    * makes [[simhash60]] — and through it the whole simhash near-dup /
    * graph family — oracle-checkable. First 8 digest bytes big-endian,
    * shifted right 4 = first 15 hex digits.
    */
  def tokenHash60(s: String): Long = {
    val d = md5Digest.get()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (bytes(j) & 0xFFL); j += 1 }
    h >>> 4
  }

  // digest() resets the instance, so one per thread serves every call —
  // the per-token JCA provider lookup + allocation would otherwise be
  // the dominant cost of the simhash kernel's hottest loop
  private val md5Digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Rademacher ±1 hyperplane component for (plane, dim) — sign LSH.
    * Derived from the portable md5-prefix hash (bit 0 of
    * [[tokenHash60]] over the "plane#dim" rendering) rather than a
    * JVM-private mix, so the sign-LSH bucket of any vector — and the
    * whole banded embedding near-dup / ANN family built on it —
    * reproduces bit-for-bit in the DuckDB oracle
    * (`('0x' || substr(md5(b || '#' || i), 1, 15))::BIGINT & 1`).
    * Rows memoize (one md5 per (plane, dim) EVER, grown on demand), so
    * the per-vector codegen loop reads a primitive double array.
    */
  def planeComponent(plane: Int, dim: Int): Double =
    planeRow(plane, dim + 1)(dim)

  private val planeRows =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

  private def planeRow(plane: Int, minLen: Int): Array[Double] = {
    val cached = planeRows.get(plane)
    if (cached != null && cached.length >= minLen) cached
    else planeRows.compute(plane, (_, old) =>
      if (old != null && old.length >= minLen) old
      else Array.tabulate(math.max(minLen, 64)) { i =>
        if ((tokenHash60(plane + "#" + i) & 1L) == 1L) 1.0 else -1.0
      })
  }

  /** LSH bucket over Catalyst ArrayData in place (no array
    * materialization) — called from both the interpreted and generated
    * code of [[LshBucket]]. Same arithmetic and plane derivation as
    * [[lshBucket]].
    */
  def lshBucketArrayData(v: org.apache.spark.sql.catalyst.util.ArrayData,
                         nBits: Int): Int = {
    requireNoNulls(v, "graft_lsh_bucket")
    var bucket = 0
    var b = 0
    val n = v.numElements()
    while (b < nBits) {
      val row = planeRow(b, n)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getFloat(i).toDouble * row(i); i += 1 }
      if (acc > 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** Sign-LSH bucket of a vector under `nBits` derived hyperplanes. */
  def lshBucket(v: Array[Float], nBits: Int): Int = {
    var bucket = 0
    var b = 0
    while (b < nBits) {
      val row = planeRow(b, v.length)
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += v(i).toDouble * row(i); i += 1 }
      if (acc > 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** 60-bit simhash over whitespace tokens (±1 per bit per token
    * OCCURRENCE — multiset semantics; empty tokens from doubled spaces
    * are skipped). Token hashes are [[tokenHash60]] (md5-prefix) rather
    * than a JVM-private hash, so the fingerprint — and every pair set
    * and graph built on it — reproduces bit-for-bit in the DuckDB
    * oracle; 60 of 64 bits is the widest md5 prefix that parses into a
    * signed BIGINT on both engines. The 4×16-bit chunk banding in
    * `LlmOps.computeSimhashPairs` is unaffected (the top chunk simply
    * carries 12 live bits), and the Hamming≤3 pigeonhole guarantee
    * holds for any bit width.
    */
  def simhash60(text: String): Long = {
    val counts = new Array[Int](60)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val h = tokenHash60(text.substring(start, i))
          var b = 0
          while (b < 60) {
            counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}
