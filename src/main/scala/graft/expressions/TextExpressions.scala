package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the SimHash hot loop: per-bit sign
  * votes over a token-hash array folded into a `bits`-wide fingerprint,
  * as ONE codegen'd primitive double loop.
  *
  * Semantics exactly match the HOF formulation it replaces (one
  * `aggregate` per bit of `acc + ((h >> j) & 1) * 2 - 1`, bit j set iff
  * its vote sum is positive) and the DuckDB oracle mirror
  * (`list_sum(list_transform(hs, h -> ((h >> j) % 2) * 2 - 1)) > 0`) —
  * pure integer arithmetic, so bit-identical across engines. The HOF
  * version evaluates interpreted (higher-order functions are
  * CodegenFallback) with per-element boxing: on a 5k-doc corpus the
  * swap cut fingerprinting from seconds to tens of milliseconds.
  *
  * Null elements count as hash 0 (a -1 vote on every bit); token-hash
  * arrays never contain nulls by construction. A null array yields
  * null (UnaryExpression null-intolerance).
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  // 63, not 64: the fingerprint lives in a signed long and the DuckDB
  // oracle mirrors it via CAST('0x…' AS BIGINT), which rejects values
  // past 2^63-1 — bit 63 would also flip the sign on comparisons.
  require(bits >= 1 && bits <= 63, "simhash supports 1..63 bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"simhash expects array<bigint> input, got ${t.simpleString}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val votes = new Array[Long](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sh |= 1L << j
      j += 1
    }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val sh = ctx.freshName("sh")
      s"""
         |int $n = $a.numElements();
         |long[] $votes = new long[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $votes[$j] += (($h >> $j) & 1L) * 2L - 1L;
         |  }
         |}
         |long $sh = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($votes[$j] > 0) $sh |= 1L << $j;
         |}
         |${ev.value} = $sh;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "simhash"
}


/** Native Catalyst expression for the text-quality hot loop: the count
  * of punctuation CODEPOINTS — characters outside `[a-zA-Z0-9\s]` —
  * as one branch-per-byte pass over the UTF8String, no regex engine,
  * no string rebuild, inside whole-stage codegen.
  *
  * Replaces `length(text) - length(regexp_replace(text,
  * '[^a-zA-Z0-9\\s]', ''))`, which at 500k docs dominated the quality
  * scan (~8 ms CPU/doc: two full-text regex rebuilds per row under the
  * filter+projection double evaluation). Value-identical: both count
  * codepoints outside the class (a multi-byte codepoint counts once —
  * only UTF-8 lead bytes are inspected, and any non-ASCII codepoint is
  * outside `[a-zA-Z0-9\s]` by definition), and the DuckDB oracle's
  * RE2 formulation agrees codepoint-for-codepoint.
  *
  * Whitespace matches Java regex `\s` = `[ \t\n\x0B\f\r]`, the set the
  * regexp_replace form used on the Spark side.
  */
case class PunctCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"punct_count expects a string input, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0x80) != 0) {
        // UTF-8 continuation bytes (10xxxxxx) belong to an already
        // counted lead byte; any non-ASCII codepoint is punct
        if ((b & 0xC0) != 0x80) cnt += 1
      } else if (!PunctCount.isKeptAscii(b)) cnt += 1
      i += 1
    }
    cnt
  }

  // NOTE for every template below: no emitted line may BEGIN with '|'
  // (e.g. a wrapped '||'). Catalyst code blocks are stripMargin'd again
  // downstream of doGenCode, so a leading '||' loses its margin chars,
  // the operator vanishes, and janino then mis-parses the adjacent
  // parenthesized operands as a cast — the whole projection silently
  // drops to interpreted eval. Operators go at END of line when
  // wrapping. Pinned by TextExpressionsSpec's fallback-disabled test.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $c.numBytes();
         |long $cnt = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $b = $c.getByte($i);
         |  if (($b & 0x80) != 0) {
         |    if (($b & 0xC0) != 0x80) $cnt++;
         |  } else if (!(($b >= 'a' && $b <= 'z') || ($b >= 'A' && $b <= 'Z') ||
         |      ($b >= '0' && $b <= '9') || $b == ' ' || $b == '\\t' ||
         |      $b == '\\n' || $b == 0x0B || $b == '\\f' || $b == '\\r')) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "punct_count"
}

object PunctCount {
  /** ASCII bytes KEPT by the `[a-zA-Z0-9\s]` class (Java `\s`). */
  def isKeptAscii(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == ' ' || b == '\t' || b == '\n' ||
      b == 0x0B || b == '\f' || b == '\r'
}

/** Native count of BPE-ish subword matches: maximal `[A-Za-z0-9]+`
  * runs plus one per other non-whitespace codepoint — exactly the
  * match count of `regexp_extract_all(text,
  * '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')` (which the DuckDB oracle keeps),
  * without materializing the match array or running a regex engine.
  * One byte pass: an ASCII alnum byte counts iff the previous
  * codepoint was not ASCII alnum (start of a run); any other
  * non-whitespace codepoint counts once (only UTF-8 lead bytes are
  * inspected, and every non-ASCII codepoint falls in the
  * one-per-character branch of the alternation). */
case class SubwordCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"subword_count expects a string input, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0L
    var prevAlnum = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0x80) != 0) {
        if ((b & 0xC0) != 0x80) { cnt += 1; prevAlnum = false }
      } else {
        val alnum = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9')
        val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r'
        if (alnum) { if (!prevAlnum) cnt += 1 }
        else if (!ws) cnt += 1
        prevAlnum = alnum
      }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt")
      val prev = ctx.freshName("prevAlnum")
      val alnum = ctx.freshName("alnum")
      val ws = ctx.freshName("ws")
      s"""
         |int $n = $c.numBytes();
         |long $cnt = 0L;
         |boolean $prev = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $b = $c.getByte($i);
         |  if (($b & 0x80) != 0) {
         |    if (($b & 0xC0) != 0x80) { $cnt++; $prev = false; }
         |  } else {
         |    boolean $alnum = ($b >= 'a' && $b <= 'z') ||
         |      ($b >= 'A' && $b <= 'Z') || ($b >= '0' && $b <= '9');
         |    boolean $ws = $b == ' ' || $b == '\\t' || $b == '\\n' ||
         |      $b == 0x0B || $b == '\\f' || $b == '\\r';
         |    if ($alnum) { if (!$prev) $cnt++; }
         |    else if (!$ws) { $cnt++; }
         |    $prev = $alnum;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "subword_count"
}

/** Native fused tokenize-and-hash: lowercase -> whitespace tokens ->
  * per-token md5-prefix hash, one pass, no regex engine, no 32-char
  * hex strings, no intermediate token array — the hot loop under the
  * whole MinHash/SimHash dedup family (signatures, bands, repetition
  * ratio, rolling fingerprints all start here).
  *
  * Value-identical to the composed chain it replaces, element for
  * element:
  *  - tokens: `filter(split(lower(text), "\\s+"), length > 0)` —
  *    Java regex `\s` is exactly the six ASCII bytes checked here
  *    (space, \t, \n, \x0B, \f, \r; none can appear inside a UTF-8
  *    multibyte sequence), empty tokens vanish identically, and
  *    lowercasing uses the same `UTF8String.toLowerCase`;
  *  - hash: `conv(substring(md5(t), 1, W), 16, 10)` for W = 8
  *    (`wide=false`, 32-bit value) or W = 15 (`wide=true`, 60-bit) —
  *    the first W hex chars of the digest read as big-endian nibbles,
  *    taken straight from the digest bytes without the hex round-trip.
  * The DuckDB oracle mirrors (`thSql`, 15-char SimHash variant) are
  * unchanged — they mirror the VALUES, which are identical.
  */
case class TokenHashes(child: Expression, wide: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_hashes expects a string input, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TokenHashes.compute(input.asInstanceOf[UTF8String], wide)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TokenHashes.compute($c, $wide);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "token_hashes"
}

object TokenHashes {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
      b == '\r'

  /** Static entry shared by eval and generated code. */
  def compute(s: UTF8String, wide: Boolean): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes // may copy; one allocation per row
    val n = bytes.length
    val md = digests.get()
    val out = new java.util.ArrayList[java.lang.Long](16)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val v =
          if (!wide) {
            // first 8 hex chars = digest bytes 0-3, unsigned
            ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
              ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
          } else {
            // first 15 hex chars = bytes 0-6 plus byte 7's high nibble
            var w = 0L
            var k = 0
            while (k < 7) { w = (w << 8) | (d(k) & 0xFFL); k += 1 }
            (w << 4) | ((d(7) & 0xFFL) >>> 4)
          }
        out.add(v)
      }
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

object TextExpressions {
  /** Column wrapper: codegen'd SimHash fingerprint over token hashes. */
  def simHashF(th: Column, bits: Int): Column =
    GraftSqlBridge.column(SimHash(GraftSqlBridge.expression(th), bits))

  /** Column wrapper: codegen'd punctuation-codepoint count. */
  def punctCountF(text: Column): Column =
    GraftSqlBridge.column(PunctCount(GraftSqlBridge.expression(text)))

  /** Column wrapper: codegen'd subword-match count. */
  def subwordCountF(text: Column): Column =
    GraftSqlBridge.column(SubwordCount(GraftSqlBridge.expression(text)))

  /** Column wrapper: fused tokenize + md5-prefix hashes from raw text
    * (32-bit values; `wide = true` for the 60-bit SimHash variant). */
  def tokenHashesF(text: Column, wide: Boolean = false): Column =
    GraftSqlBridge.column(TokenHashes(GraftSqlBridge.expression(text), wide))
}
