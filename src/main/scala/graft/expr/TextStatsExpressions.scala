package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token-array statistics behind the text-analysis hot path.
  *
  * Motivation (same measured cliff as [[ParseTableIds]]): higher-order
  * functions (`transform`/`filter`/`aggregate`) evaluate per-element
  * lambdas OUTSIDE whole-stage codegen, and Catalyst additionally places
  * per-doc scalar projections above any Generate, re-evaluating them per
  * exploded row. The quality-filter stage of the c9 pipeline measured
  * ~560 µs/document in HOF form at sf0.1 — these expressions generate one
  * static call per row instead (~µs/doc), with semantics pinned to the
  * HOF formulation they replace (ExprSpec cross-checks both forms).
  */
object TextStatsHelper {

  /** Distinct-token count and max word-bigram multiplicity in one pass.
    * Bigram semantics mirror `transform(sequence(1, greatest(L-1, 1)),
    * i -> array_join(slice(t, i, 2), ' '))`: a 0/1-token doc degenerates
    * to one "bigram" (count 1). Tokens are space-split, so the joined
    * pair string is a bijective pair encoding and equal-count-safe.
    */
  def repStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val distinct = new java.util.HashSet[UTF8String](Math.max(8, n * 2))
    var i = 0
    while (i < n) {
      distinct.add(arr.getUTF8String(i))
      i += 1
    }
    var maxBigram = 1L
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Integer](n * 2)
      i = 0
      while (i < n - 1) {
        val k = arr.getUTF8String(i).toString + " " + arr.getUTF8String(i + 1)
        val c = counts.merge(k, 1, (a, b) => a + b)
        if (c > maxBigram) maxBigram = c.toLong
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](distinct.size.toLong, maxBigram))
  }

  /** Count of elements contained in `set` (the `size(filter(t, x -> x IN
    * (...)))` shape: stopword hits, language-profile hits).
    */
  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) c += 1L
      i += 1
    }
    c
  }

  /** Base-31 polynomial rolling hash mod 1e9+7 over the string's code
    * points — exactly the `aggregate(split(s, ''), 0L, (acc, ch) =>
    * (acc*31 + ascii(ch)) % 1000000007)` fold: Spark's `split("")` emits
    * one element per code point (surrogate pairs stay whole) and `ascii`
    * returns the full code point, probed empirically; the empty string
    * folds one ascii('') = 0 step, so both forms yield 0.
    */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Hashed-feature dot product: left-to-right Σ weights[rollingHash(tok)
    * mod weights.length] over the token array (the feature-hashing trick;
    * collisions are part of the model, exactly as in training).
    */
  def hashedTfDot(arr: ArrayData, weights: Array[Double]): Double = {
    val n = arr.numElements()
    val d = weights.length
    var s = 0.0
    var i = 0
    while (i < n) {
      s += weights((rollingHash(arr.getUTF8String(i)) % d).toInt)
      i += 1
    }
    s
  }

  /** Symmetric int8 quantization of a float vector: scale = max|x|/127,
    * code_i = clamp(⌊x_i/scale + 0.5⌋, -127, 127) (round-half-up, the
    * floor form both engines evaluate identically on identical doubles);
    * an all-zero vector quantizes to scale 0 with all-zero codes. One
    * pass, returns (scale, codes).
    */
  def quantizeI8(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = Math.abs(arr.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val codes = new Array[Byte](n)
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        val q = Math.floor(arr.getFloat(i).toDouble / scale + 0.5)
        codes(i) = Math.max(-127.0, Math.min(127.0, q)).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale,
      new GenericArrayData(codes.map(b => b: Any))))
  }

  /** Exact integer dot of two int8 code arrays (min length governs). */
  def dotI8(a: ArrayData, b: ArrayData): Long = {
    val n = Math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    s
  }

  /** The full Gopher repetition suite (Rae et al. 2021, Table A1's
    * n-gram rows) in ONE pass over the token array, all-integer output:
    *
    *  - `total_chars`: Σ token char lengths in CODE POINTS (the SQL
    *    `length` collation; separators excluded, so the number is
    *    whitespace-normalization-invariant);
    *  - `top{2,3,4}_chars`: occurrences × token-char-length of the MOST
    *    FREQUENT word n-gram (ties broken count DESC, char-length DESC,
    *    gram string ASC — the same three-key order a SQL `row_number`
    *    spells, so both engines pick the identical gram);
    *  - `dup{5..10}_chars`: token chars covered by the UNION of all
    *    occurrences of n-grams appearing ≥ 2 times (overlapping spans
    *    counted once — the union-of-spans coverage the published filter
    *    family uses, same discipline as [[SetExpressions]]' coverage
    *    sweep). A doc shorter than n tokens has no n-gram → 0.
    *
    * Emitting raw integer numerators (fractions are numerator/total
    * cross-multiplications downstream) keeps every derived keep-decision
    * exact and engine-portable — no float ratio ever exists.
    * Memory is O(L) per n (a gram-string table + count map), time
    * O(Σ n·L) char work — embarrassingly parallel per document.
    */
  def gopherRepStats(arr: ArrayData): InternalRow = {
    val L = arr.numElements()
    val toks = new Array[String](L)
    val cps = new Array[Int](L) // code-point lengths (SQL `length` collation)
    var total = 0L
    var i = 0
    while (i < L) {
      toks(i) = arr.getUTF8String(i).toString
      cps(i) = toks(i).codePointCount(0, toks(i).length)
      total += cps(i)
      i += 1
    }
    val out = new Array[Any](10)
    out(0) = total
    val sb = new java.lang.StringBuilder(64)
    var n = 2
    while (n <= 10) {
      val m = L - n + 1 // n-gram count; <= 0 means no gram of this size
      var result = 0L
      if (m >= 1) {
        val grams = new Array[String](m)
        val counts = new java.util.HashMap[String, Integer](m * 2)
        var s = 0
        while (s < m) {
          sb.setLength(0)
          var j = s
          while (j < s + n) {
            if (j > s) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          grams(s) = sb.toString
          counts.merge(grams(s), 1, (a, b) => a + b)
          s += 1
        }
        if (n <= 4) {
          // most frequent gram: count DESC, code-point length DESC, gram
          // ASC in UTF-8 byte order (= code-point order, the SQL binary
          // collation) — the identical three-key order the oracle's
          // row_number spells, so both engines pick the same gram
          var bc = 0L; var bl = 0L; var bg: UTF8String = null
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue.toLong
            val k = e.getKey
            val l = (k.codePointCount(0, k.length) - (n - 1)).toLong
            if (c > bc || (c == bc && (l > bl || (l == bl &&
                UTF8String.fromString(k).compareTo(bg) < 0)))) {
              bc = c; bl = l; bg = UTF8String.fromString(k)
            }
          }
          result = bc * bl
        } else {
          val covered = new Array[Boolean](L)
          var s2 = 0
          while (s2 < m) {
            if (counts.get(grams(s2)) >= 2) {
              var p = s2
              while (p < s2 + n) { covered(p) = true; p += 1 }
            }
            s2 += 1
          }
          var p = 0
          while (p < L) {
            if (covered(p)) result += cps(p)
            p += 1
          }
        }
      }
      // slots: 1..3 = top2..top4, 4..9 = dup5..dup10
      out(n - 1) = result
      n += 1
    }
    new GenericInternalRow(out)
  }

  /** Greedy longest-match subword token count over a fixed vocabulary
    * with a 1-code-point fallback — the exact semantics of
    * `size(regexp_extract_all(text, "(?:v1|v2|…|[^ ])"))` with the
    * vocabulary ordered longest-first: `Matcher.find` scans positions
    * left to right, alternation is leftmost-FIRST, so each match is the
    * longest vocabulary entry anchored at that position (ASCII space
    * matches nothing and is skipped; any other code point — including
    * `\n`, which a negated class does match — falls back to one
    * code-point, surrogate pairs whole). `byFirst` indexes the
    * vocabulary by first char (ASCII only — multi-char entries are all
    * ASCII; a single-char non-ASCII entry consumes one code point
    * exactly like the fallback), each bucket sorted longest-first.
    * ~µs/doc vs the ~300 µs/doc the 165-branch java.util.regex
    * alternation measured at sf0.1 (r20 optimization).
    */
  def bpeTokenCount(s: UTF8String, byFirst: Array[Array[String]]): Long = {
    val str = s.toString
    val n = str.length
    var i = 0
    var c = 0L
    while (i < n) {
      val ch = str.charAt(i)
      if (ch == ' ') i += 1
      else {
        var matched = 0
        if (ch < 128) {
          val cands = byFirst(ch)
          if (cands != null) {
            var k = 0
            while (k < cands.length && matched == 0) {
              val w = cands(k)
              if (w.length <= n - i && str.regionMatches(i, w, 0, w.length))
                matched = w.length
              k += 1
            }
          }
        }
        if (matched == 0) matched = Character.charCount(str.codePointAt(i))
        c += 1L
        i += matched
      }
    }
    c
  }

  /** Distinct word n-gram shingles in FIRST-OCCURRENCE order — exactly
    * `array_distinct(transform(sequence(1, greatest(L-n+1, 1)), i ->
    * array_join(slice(t, i, n), ' ')))`, including the shorter-than-n
    * truncated single shingle. Order is load-bearing downstream (PPJoin's
    * positional prefix filter indexes into this array).
    */
  def ngrams(arr: ArrayData, n: Int): ArrayData = {
    val L = arr.numElements()
    val m = Math.max(L - n + 1, 1)
    val out = new java.util.LinkedHashSet[UTF8String](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = i
      val end = Math.min(i + n, L)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(arr.getUTF8String(j).toString)
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val res = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    new GenericArrayData(res)
  }
}

private[expr] trait StringArrayInput { self: UnaryExpression =>
  def prettyName: String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.sql}")
  }
}

/** Codegen'd struct<n_distinct, max_bigram> over a token array. */
case class RepStats(child: Expression)
    extends UnaryExpression with StringArrayInput {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_bigram", LongType, nullable = false)))
  override def prettyName: String = "graft_rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsHelper.repStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextStatsHelper.repStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd struct of the full Gopher repetition suite: total token
  * chars, top-{2,3,4}-gram repeated chars, duplicated-{5..10}-gram
  * union-of-spans covered chars — one pass, all-integer, so every
  * downstream keep-decision is an exact cross-multiplication.
  */
case class GopherRepStats(child: Expression)
    extends UnaryExpression with StringArrayInput {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(
    StructField("total_chars", LongType, nullable = false) +:
      (2 to 4).map(n => StructField(s"top${n}_chars", LongType, nullable = false)) ++:
      (5 to 10).map(n => StructField(s"dup${n}_chars", LongType, nullable = false)))
  override def prettyName: String = "graft_gopher_rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsHelper.gopherRepStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextStatsHelper.gopherRepStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd membership count of a token array against a fixed word set. */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression with StringArrayInput {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TextStatsHelper.countInSet(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextStatsHelper.countInSet($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd symmetric int8 vector quantization (vector-store serving
  * prep): one pass computing the max-abs scale and the clamped
  * round-half-up codes — per-element work that would be an interpreted
  * HOF cliff at corpus scale in `transform` form.
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "graft_quantize_i8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextStatsHelper.quantizeI8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextStatsHelper.quantizeI8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd exact integer dot product of two int8 code arrays (the
  * serve-time kernel over [[QuantizeI8]] output) — a long accumulator
  * never overflows (127²·len ≪ 2⁶³) and integer sums are exact in any
  * order, so every derived score is engine-portable by construction.
  */
case class DotProductI8(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<tinyint> arguments, got ${l.sql} and ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextStatsHelper.dotI8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expr.TextStatsHelper.dotI8($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd base-31 rolling hash mod 1e9+7 (the engine's portable
  * content fingerprint — X-hash for sampling, splits, temperature
  * acceptance, t4). One static call per row instead of a per-character
  * interpreted `aggregate` fold.
  */
case class RollingHash31(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextStatsHelper.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextStatsHelper.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd hashed-feature dot product: Σ_tokens weights[h(tok) mod D]
  * where h is the portable base-31 rolling hash — the inference kernel of
  * a feature-hashing linear classifier (fastText-style quality scoring).
  * Left-to-right accumulation in token order, so the double sum is
  * deterministic and mirrors a SQL `list_sum` fold exactly.
  */
case class HashedTfDot(child: Expression, weights: Seq[Double])
    extends UnaryExpression with StringArrayInput {
  require(weights.nonEmpty, "weights must be non-empty")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hashed_tf_dot"

  @transient private lazy val w: Array[Double] = weights.toArray

  override protected def nullSafeEval(input: Any): Any =
    TextStatsHelper.hashedTfDot(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", w, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextStatsHelper.hashedTfDot($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd greedy longest-match subword token count — the exact
  * equivalent of `size(regexp_extract_all(text, longestFirstAlternation))`
  * (see [[TextStatsHelper.bpeTokenCount]]) without the per-char regex
  * backtracking that made the 165-branch alternation the hot path of
  * every tokenizer-calibrated budget query (r20 optimization).
  */
case class BpeTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty, "vocab must be non-empty")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  // first-char index, each bucket longest-first (the alternation's
  // order); non-ASCII single-char entries need no bucket — they consume
  // one code point exactly like the [^ ] fallback
  @transient private lazy val byFirst: Array[Array[String]] = {
    val a = new Array[Array[String]](128)
    vocab.distinct.filter(_.head < 128)
      .groupBy(_.head).foreach { case (c, ws) =>
        a(c) = ws.sortBy(w => (-w.length, w)).toArray
      }
    a
  }

  override protected def nullSafeEval(input: Any): Any =
    TextStatsHelper.bpeTokenCount(input.asInstanceOf[UTF8String], byFirst)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("bpeVocabByFirst", byFirst,
      "java.lang.String[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextStatsHelper.bpeTokenCount($c, $vRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd distinct n-gram shingles (first-occurrence order). */
case class NGrams(child: Expression, n: Int)
    extends UnaryExpression with StringArrayInput {
  require(n >= 2, "NGrams requires n >= 2 (n=1 is array_distinct, a builtin)")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsHelper.ngrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextStatsHelper.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsExpressions {
  /** struct(n_distinct, max_bigram) of a token-array column, one pass. */
  def repStats(tokens: Column): Column =
    Bridge.column(RepStats(Bridge.expression(tokens)))

  /** Full Gopher repetition suite of a token-array column, one pass. */
  def gopherRepStats(tokens: Column): Column =
    Bridge.column(GopherRepStats(Bridge.expression(tokens)))

  /** Count of tokens belonging to the fixed `words` set. */
  def countInSet(tokens: Column, words: Seq[String]): Column =
    Bridge.column(CountInSet(Bridge.expression(tokens), words))

  /** Distinct n-gram shingles of a token array, first-occurrence order. */
  def ngrams(tokens: Column, n: Int): Column =
    Bridge.column(NGrams(Bridge.expression(tokens), n))

  /** Greedy longest-match subword count of a string column against a
    * fixed vocabulary, 1-code-point fallback (see [[BpeTokenCount]]).
    */
  def bpeTokenCount(text: Column, vocab: Seq[String]): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text), vocab))

  /** Base-31 rolling hash mod 1e9+7 of a string column. */
  def rollingHash(text: Column): Column =
    Bridge.column(RollingHash31(Bridge.expression(text)))

  /** Σ weights[rollingHash(tok) mod D] over a token-array column. */
  def hashedTfDot(tokens: Column, weights: Seq[Double]): Column =
    Bridge.column(HashedTfDot(Bridge.expression(tokens), weights))

  /** struct(scale, codes) int8 quantization of a float-vector column. */
  def quantizeI8(embedding: Column): Column =
    Bridge.column(QuantizeI8(Bridge.expression(embedding)))

  /** Exact integer dot of two int8 code-array columns. */
  def dotI8(a: Column, b: Column): Column =
    Bridge.column(DotProductI8(Bridge.expression(a), Bridge.expression(b)))
}
