package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting as ONE Aho-Corasick pass — the
  * contamination / denylist / brand-safety screen a corpus pipeline
  * runs with a dictionary of K phrases. The naive plan is K `locate`
  * passes (or a K-way explode-and-join against a phrase table): K
  * scans of every document. This expression is the textbook fix
  * (Aho & Corasick 1975): compile the phrase set into a goto/fail
  * automaton ONCE at plan time, then every document is scanned in
  * O(bytes + matches) — K drops out of the per-row cost entirely, the
  * only shape that survives a 10⁵-phrase denylist at 100 TB.
  *
  * The automaton is part of the expression (patterns are plan-time
  * literals, the UnicodeNormalize discipline), built lazily once per
  * (de)serialized instance and handed to generated code as a
  * referenced object, so whole-stage codegen stays unbroken — the
  * per-row call is one virtual dispatch into a tight byte loop over a
  * dense, failure-pre-applied DFA table.
  *
  * Matching is BYTE-level over the UTF8String (no decode): exact for
  * ASCII patterns (an ASCII byte never occurs inside a multi-byte
  * UTF-8 sequence), and counts EVERY match end position — overlapping
  * occurrences included, which equals the greedy non-overlapping count
  * exactly when no pattern has a border (a proper prefix that is also
  * a suffix) and no pattern is a substring of another; MultiMatchSpec
  * pins both regimes. Returns a LONG array of per-pattern counts,
  * index-aligned with the pattern literal array.
  */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${child.dataType.sql}")
    else if (patterns.isEmpty || patterns.exists(_.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a non-empty list of non-empty patterns")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_match"

  @transient private lazy val automaton = new AcAutomaton(patterns.toArray)

  override protected def nullSafeEval(v: Any): Any =
    automaton.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "acAutomaton", automaton, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, s => s"$ref.count($s)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiMatch = copy(child = newChild)
}

/** The compiled automaton. `next` is the failure-pre-applied DFA
  * transition table (states × 256 ints — the scan loop never chases
  * fail links), `emits(st)` the pattern ids whose occurrence ends at
  * state st (own end plus everything inherited through the suffix
  * chain, precomputed in BFS order). Only the pattern array ships in
  * the serialized plan; tables rebuild lazily per executor.
  */
final class AcAutomaton(patterns: Array[String]) extends Serializable {

  @transient private lazy val built: (Array[Int], Array[Array[Int]]) = {
    val pats = patterns.map(UTF8String.fromString(_).getBytes)
    val cap = 1 + pats.map(_.length).sum
    val goto = Array.fill(cap * 256)(-1)
    val end = Array.fill(cap)(-1)
    var nStates = 1
    for (pid <- pats.indices) {
      var st = 0
      for (b <- pats(pid)) {
        val c = b & 0xff
        if (goto(st * 256 + c) < 0) {
          goto(st * 256 + c) = nStates
          nStates += 1
        }
        st = goto(st * 256 + c)
      }
      end(st) = pid
    }
    val fail = new Array[Int](nStates)
    val emits = new Array[Array[Int]](nStates)
    emits(0) = Array.empty
    val queue = new java.util.ArrayDeque[Integer]()
    var c = 0
    while (c < 256) {
      val s = goto(c)
      if (s < 0) goto(c) = 0
      else { fail(s) = 0; queue.add(s) }
      c += 1
    }
    while (!queue.isEmpty) {
      val r: Int = queue.poll()
      // fail(r) is shallower, so its emit list is already final
      emits(r) =
        if (end(r) >= 0) end(r) +: emits(fail(r)) else emits(fail(r))
      var c2 = 0
      while (c2 < 256) {
        val u = goto(r * 256 + c2)
        if (u < 0) goto(r * 256 + c2) = goto(fail(r) * 256 + c2)
        else { fail(u) = goto(fail(r) * 256 + c2); queue.add(u) }
        c2 += 1
      }
    }
    (goto, emits)
  }

  def count(s: UTF8String): ArrayData = {
    val (next, emits) = built
    val counts = new Array[Long](patterns.length)
    val bytes = s.getBytes
    var st = 0
    var i = 0
    while (i < bytes.length) {
      st = next(st * 256 + (bytes(i) & 0xff))
      val em = emits(st)
      var e = 0
      while (e < em.length) { counts(em(e)) += 1; e += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object MultiMatch {

  /** Shared by [[register]] and GraftExtensions' injectFunction. */
  private[graft] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "graft_multi_match takes (string, array-of-string literal)")
    val pats = exprs(1) match {
      case l if l.foldable =>
        l.eval(null).asInstanceOf[ArrayData]
          .toObjectArray(StringType)
          .map {
            case null => throw new IllegalArgumentException(
              "graft_multi_match patterns must not contain NULL")
            case x => x.toString
          }
          .toSeq
      case _ => throw new IllegalArgumentException(
        "graft_multi_match patterns must be a literal array")
    }
    // Duplicate patterns would share a trie end state and the later
    // duplicate's id would overwrite the earlier one's, silently
    // reporting 0 for it — reject instead of guessing intent.
    val dupes = pats.groupBy(identity).collect {
      case (p, occ) if occ.length > 1 => p
    }
    if (dupes.nonEmpty)
      throw new IllegalArgumentException(
        s"graft_multi_match patterns must be distinct; duplicated: " +
          dupes.mkString("'", "', '", "'"))
    MultiMatch(exprs.head, pats)
  }

  /** Registers `graft_multi_match(s, array('p1', 'p2', …))`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_multi_match", builder, "built-in")
}
