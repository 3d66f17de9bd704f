package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY §2.11: C13 is the designated
  * custom-Expression candidate — pure string/math, hot enough to deserve
  * codegen instead of a black-box UDF).
  *
  * `DmsToDecimal` parses GPS DMS strings (`38 deg 55' 58.80" N`,
  * reference /root/reference/analysis/preview_data.ipynb:cell-8) to signed
  * decimal degrees. Advantages over the regexp_extract×4 formulation in
  * graft.functions.Gps: one pass over the string instead of four regex
  * matches, and `doGenCode` emits a static call so the expression stays
  * inside whole-stage codegen with no interpreted boundary.
  */
object DmsParse {
  /** One-pass DMS parse; returns NaN for malformed input (mapped to null by
    * the expression — NaN is the in-band sentinel because a static helper
    * can't return SQL null). */
  def parse(s: UTF8String): Double = {
    if (s == null) return Double.NaN
    val str = s.toString
    // expected shape: "<deg> deg <min>' <sec>\" <N|S|E|W>"
    val degIdx = str.indexOf(" deg ")
    if (degIdx <= 0) return Double.NaN
    val minIdx = str.indexOf('\'', degIdx + 5)
    if (minIdx < 0) return Double.NaN
    val secIdx = str.indexOf('"', minIdx + 1)
    if (secIdx < 0 || secIdx + 2 > str.length) return Double.NaN
    try {
      val deg = java.lang.Double.parseDouble(str.substring(0, degIdx).trim)
      val min = java.lang.Double.parseDouble(str.substring(degIdx + 5, minIdx).trim)
      val sec = java.lang.Double.parseDouble(str.substring(minIdx + 1, secIdx).trim)
      val dir = str.substring(secIdx + 1).trim
      val unsigned = deg + min / 60.0 + sec / 3600.0
      dir match {
        case "N" | "E" => unsigned
        case "S" | "W" => -unsigned
        case _         => Double.NaN
      }
    } catch { case _: NumberFormatException => Double.NaN }
  }
}

case class DmsToDecimal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dms_to_decimal expects STRING, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = DmsParse.parse(input.asInstanceOf[UTF8String])
    if (v.isNaN) null else java.lang.Double.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DmsParse.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // freshName: two dms_to_decimal calls in one projection must not collide
    // (a fixed local name fails Janino when the child is non-nullable and
    // nullSafeCodeGen emits the block unbraced)
    val parsed = ctx.freshName("parsed")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |double $parsed = $cls.parse($c);
         |if (Double.isNaN($parsed)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $parsed;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DmsToDecimal =
    copy(child = newChild)

  override def prettyName: String = "dms_to_decimal"
}

/** Static kernel behind [[HtmlPostText]]: the tolerant single-pass HTML
  * scanner ([[graft.functions.Html.postText]]) bridged to UTF8String.
  * The scanner itself stays plain JVM code (a stateful character walk
  * gains nothing from codegen); what the expression buys over the old UDF
  * is the BOUNDARY — no Scala-UDF serialization shim, and the projection
  * that calls it stays inside whole-stage codegen, so an extract →
  * tokenize → filter pipeline (q30/q79 shape) compiles to one loop. */
object HtmlPostTextKernel {
  def postText(s: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.functions.Html.postText(if (s == null) null else s.toString))
}

/** `html_post_text(html)` as a native expression. Contract matches the
  * reference converter and the previous UDF exactly: never null — a null
  * or wrapper-less page extracts to the empty string
  * (htmlConverter.py:18-19), so the output is a total function of the
  * input and downstream non-empty filters do the dropping.
  * ImplicitCastInputTypes keeps the UDF's coercion: a SQL NULL literal
  * (NullType) or castable argument is cast to string at analysis, not
  * rejected. */
case class HtmlPostText(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  // type inferred: AbstractDataType is private[sql], but the inherited
  // signature accepts Seq(StringType) by inference
  override def inputTypes = Seq(StringType)

  // override eval, not nullSafeEval: null INPUT produces a VALUE ("")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HtmlPostTextKernel.postText(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cls = HtmlPostTextKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} = $cls.postText(
          ${childGen.isNull} ? null : ${childGen.value});
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlPostText =
    copy(child = newChild)

  override def prettyName: String = "html_post_text"
}

/** Static kernel behind [[DsirBuckets]]/[[DsirWeight]] (q105): one pass
  * over the text that tokenizes (the exact `TextFns.tokens` semantics:
  * Java-regex `\s` whitespace runs as separators, leading/trailing
  * whitespace trimmed) and md5-hashes each adjacent-token bigram to its
  * bucket byte. The HOF formulation (`transform` + `md5` + `conv` inside
  * `aggregate`) evaluates every per-gram expression interpreted — measured
  * 13 s warm at sf0.1 on q105; this kernel does the same math in compiled
  * JVM code with a thread-local digest and no per-gram allocation beyond
  * the token bytes. Bigram hashing reuses the previous token's UTF-8
  * bytes, so each token is materialized once. */
object DsirMath {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // Java regex \s (no UNICODE_CHARACTER_CLASS): exactly these six chars —
  // the tokenizer must match TextFns.tokens / the DuckDB oracle bit-for-bit
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Walk tokens; invoke `f(bucket)` for each bigram's md5 first byte. */
  private def eachBigramBucket(str: String)(f: Int => Unit): Unit = {
    val md = digests.get()
    val n = str.length
    var i = 0
    var start = -1
    var prevBytes: Array[Byte] = null
    while (i <= n) {
      val atWs = i == n || isWs(str.charAt(i))
      if (!atWs && start < 0) start = i
      else if (atWs && start >= 0) {
        val cur = str.substring(start, i)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (prevBytes != null) {
          md.reset()
          md.update(prevBytes)
          md.update(' '.toByte)
          md.update(cur)
          f(md.digest()(0) & 0xff)
        }
        prevBytes = cur
        start = -1
      }
      i += 1
    }
  }

  /** Bucket-index array for one document (null text → empty). */
  def buckets(s: UTF8String): ArrayData = {
    if (s == null)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyIntArray)
    val out = scala.collection.mutable.ArrayBuilder.make[Int]
    eachBigramBucket(s.toString)(out += _)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out.result())
  }

  /** Fused serve path: `[n_grams, Σ slots(bucket)]` for one document. */
  def weight(s: UTF8String, slots: Array[Long]): ArrayData = {
    var nGrams = 0L
    var w = 0L
    if (s != null)
      eachBigramBucket(s.toString) { b => nGrams += 1; w += slots(b) }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(nGrams, w))
  }
}

/** `dsir_buckets(text)` — the hashed-bigram bucket stream as a native
  * expression (q105's fit path: explode + count). Never null: empty or
  * null text yields an empty array, matching the Column formulation's
  * `when(size >= 2, ...).otherwise(array())`. */
case class DsirBuckets(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dsir_buckets expects STRING, got ${child.dataType.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    DsirMath.buckets(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cls = DsirMath.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.buckets(${childGen.isNull} ? null : ${childGen.value});
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)

  override def prettyName: String = "dsir_buckets"
}

/** `dsir_weight(text)` — q105's fused serve kernel: `[n_grams, w_micro]`
  * under the fitted 256-slot model (carried as a reference object, not a
  * child — it is configuration, not data). One compiled pass per document;
  * the caller derives its output columns from the pair. */
case class DsirWeight(child: Expression, slots: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dsir_weight expects STRING, got ${child.dataType.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    DsirMath.weight(child.eval(input).asInstanceOf[UTF8String], slots)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cls = DsirMath.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val slotsRef = ctx.addReferenceObj("dsirSlots", slots, "long[]")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.weight(${childGen.isNull} ? null : ${childGen.value}, $slotsRef);
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DsirWeight =
    copy(child = newChild)

  override def prettyName: String = "dsir_weight"
}

/** Static kernel behind [[CosineSim]]. Reads `ArrayData` directly — no
  * array materialization, no boxing — and fuses the three accumulators in
  * one pass. Each accumulator sums in index order, so results are
  * bit-identical to the separate-fold HOF form (`Vectors.cosine`) and the
  * DuckDB double-math oracle. NaN is the in-band null sentinel (mismatched
  * lengths, null elements, empty or zero-norm vectors — a static helper
  * can't return SQL null; genuine cosines of non-degenerate vectors are
  * always finite). */
object CosineMath {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return Double.NaN
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dp += x * y; na += x * x; nb += y * y
      i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Native cosine similarity over two `array<float>` columns — the hot-path
  * pair-similarity primitive as a codegen'd Catalyst expression. Unlike the
  * UDF kernel (`Vectors.cosineKernel`, which forces a deserialize-to-
  * `Array[Float]` boundary and drops the projection out of whole-stage
  * codegen), `doGenCode` emits a static call on `ArrayData`, so a
  * broadcast-join + cosine + filter pipeline stays in ONE generated loop.
  * Null semantics: null in → null out; malformed pairs (length mismatch,
  * null elements, zero-norm) → null rather than a wrong number. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = CosineMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (v.isNaN) null else java.lang.Double.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CosineMath.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val cos = ctx.freshName("cos")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |double $cos = $cls.cosine($a, $b);
         |if (Double.isNaN($cos)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $cos;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}
