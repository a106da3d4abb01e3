package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern matching (SURVEY §2.10 X138) — the
  * blocklist primitive content filtering needs at corpus scale: test a
  * document against THOUSANDS of phrases in ONE left-to-right pass
  * (Aho & Corasick 1975), instead of |patterns| separate contains()
  * scans. At 100 TB the difference is |patterns|× on the hottest
  * filter in the pipeline; per-pattern `contains` chains also blow up
  * codegen's method limits long before a real blocklist size.
  *
  * The automaton builds once per (pattern set) per executor — a
  * goto/fail/output trie over chars — and is shared via a keyed cache;
  * the expression ships only the pattern array. Matching is exact
  * case-sensitive substring semantics (callers lowercase both sides
  * for case-folding — same contract as the tokenizers here).
  */
object MultiMatch {

  /** Immutable automaton — only the flat arrays survive construction
    * (the mutable trie builders are locals of the build block), so a
    * cached Ac costs its final tables, nothing more.
    */
  final class Ac(val patterns: Array[String]) extends Serializable {
    private val (gotoArr, outArr, fail)
        : (Array[Map[Char, Int]], Array[Array[Int]], Array[Int]) = {
      // trie over exact chars; nodes in breadth-first layout
      val gotoMaps =
        scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.Map.empty[Char, Int])
      val out =
        scala.collection.mutable.ArrayBuffer(List.empty[Int])
      patterns.zipWithIndex.foreach { case (p, pi) =>
        var s = 0
        p.foreach { ch =>
          s = gotoMaps(s).getOrElseUpdate(ch, {
            gotoMaps += scala.collection.mutable.Map.empty[Char, Int]
            out += Nil
            gotoMaps.size - 1
          })
        }
        if (p.nonEmpty) out(s) = pi :: out(s)
      }
      val fl = new Array[Int](gotoMaps.size)
      // BFS failure links; outputs accumulate along them
      val queue = scala.collection.mutable.Queue.empty[Int]
      gotoMaps(0).values.foreach { s => fl(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        gotoMaps(r).foreach { case (ch, s) =>
          queue += s
          var f = fl(r)
          while (f != 0 && !gotoMaps(f).contains(ch)) f = fl(f)
          fl(s) = gotoMaps(f).getOrElse(ch, 0)
          if (fl(s) == s) fl(s) = 0
          out(s) = out(s) ++ out(fl(s))
        }
      }
      (gotoMaps.map(_.toMap).toArray, out.map(_.toArray).toArray, fl)
    }

    private def step(state: Int, ch: Char): Int = {
      var s = state
      while (s != 0 && !gotoArr(s).contains(ch)) s = fail(s)
      gotoArr(s).getOrElse(ch, 0)
    }

    def containsAny(text: String): Boolean = {
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        if (outArr(s).nonEmpty) return true
        i += 1
      }
      false
    }

    /** Redact every occurrence with LEFTMOST-LONGEST semantics: scan
      * left to right; at each match end, the longest pattern ending
      * there wins unless it overlaps an already-committed replacement
      * (earlier-starting matches are committed first). Deterministic:
      * the same text and pattern set always splice identically.
      */
    def redact(text: String, mask: String): String = {
      // index matches by START, keeping the LONGEST end per start
      val starts = new java.util.TreeMap[Int, Int]() // start -> max end
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val o = outArr(s)
        var j = 0
        while (j < o.length) {
          val start = i + 1 - patterns(o(j)).length
          val prev = starts.get(start)
          if (prev == null || i + 1 > prev) starts.put(start, i + 1)
          j += 1
        }
        i += 1
      }
      if (starts.isEmpty) return text
      // commit left to right: the earliest start wins, its longest
      // match claims the span, overlapped later starts are skipped
      val sb = new java.lang.StringBuilder
      var pos = 0
      val it = starts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val (st, en) = (e.getKey.intValue(), e.getValue.intValue())
        if (st >= pos) {
          sb.append(text, pos, st).append(mask)
          pos = en
        }
      }
      sb.append(text, pos, text.length).toString
    }

    /** Distinct matched patterns, in pattern-list order. */
    def matched(text: String): Array[Int] = {
      val seen = new java.util.BitSet(patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val o = outArr(s)
        var j = 0
        while (j < o.length) { seen.set(o(j)); j += 1 }
        i += 1
      }
      val b = Array.newBuilder[Int]
      var pi = seen.nextSetBit(0)
      while (pi >= 0) { b += pi; pi = seen.nextSetBit(pi + 1) }
      b.result()
    }
  }

  /** Per-JVM automaton cache, crudely bounded: distinct pattern sets
    * beyond the cap flush the cache (rebuilding an automaton is cheap
    * next to scanning even one partition) — a long-lived executor
    * cycling through many tenant blocklists cannot grow memory
    * without bound. The size check → clear() is racy by design: a
    * concurrent insert between the check and the clear at worst drops
    * a fresh entry, costing one rebuild — never a wrong result.
    *
    * The expressions below do NOT hit this cache per row: each
    * expression instance ships a slim [[AcRef]] (pattern list + a
    * transient resolved slot — never the built automaton, which would
    * cost a multi-MB deserialization per task), the codegen path
    * hoists `acRef.get` into operator INIT via `addMutableState`, and
    * every row reads a field. So matching costs O(|text|) per row
    * with no per-row `Seq[String].hashCode` — which is O(|patterns|)
    * and would erode exactly the |patterns|× win the automaton buys
    * at real blocklist sizes.
    */
  private val MaxCached = 64
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Ac]()
  def automaton(patterns: Seq[String]): Ac = {
    if (cache.size > MaxCached) cache.clear()
    cache.computeIfAbsent(patterns, p => new Ac(p.toArray))
  }

  /** What the plan SHIPS: the pattern list plus a transient slot for
    * the resolved automaton. Serializing the built [[Ac]] itself into
    * task binaries would pay a multi-MB deserialization PER TASK at
    * real blocklist sizes and bypass the executor cache; this holder
    * deserializes as just the strings, resolves through [[automaton]]
    * ONCE (per task at worst — the codegen path hoists the resolved
    * Ac into operator init, the interpreted path memoizes in the
    * field), and every row after that is a plain field read.
    */
  final class AcRef(val patterns: Seq[String]) extends Serializable {
    @transient private[this] var resolved: Ac = _
    def get: Ac = {
      if (resolved == null) resolved = automaton(patterns)
      resolved
    }
  }

  // static kernels for codegen — take the RESOLVED automaton, so the
  // generated code carries no per-row pattern-list lookup
  def containsAnyKernel(text: UTF8String, ac: Ac): Boolean =
    ac.containsAny(text.toString)
  def redactKernel(text: UTF8String, ac: Ac,
                   mask: UTF8String): UTF8String =
    UTF8String.fromString(ac.redact(text.toString, mask.toString))
  def matchedKernel(text: UTF8String, ac: Ac): ArrayData =
    new GenericArrayData(ac.matched(text.toString)
      .map(i => UTF8String.fromString(ac.patterns(i))))

  /** `contains_any(text)`: true iff any pattern occurs in `text`. */
  case class ContainsAny(child: Expression, patterns: Seq[String])
      extends UnaryExpression {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "need at least one non-empty pattern")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType}")
    override def dataType: DataType = BooleanType
    override def prettyName: String = "contains_any"
    @transient private lazy val acRef = new AcRef(patterns)
    override def nullSafeEval(input: Any): Any =
      containsAnyKernel(input.asInstanceOf[UTF8String], acRef.get)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("acRef", acRef,
        "graft.expr.MultiMatch.AcRef")
      // resolved ONCE at operator init; per-row code reads a field
      val ac = ctx.addMutableState("graft.expr.MultiMatch.Ac", "ac",
        v => s"$v = $ref.get();")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expr.MultiMatch.containsAnyKernel($c, $ac);")
    }
    override protected def withNewChildInternal(c: Expression)
        : ContainsAny = copy(child = c)
  }

  /** `matched_terms(text)`: the distinct patterns occurring in `text`,
    * in pattern-list order — the audit trail a filter decision needs.
    */
  case class MatchedTerms(child: Expression, patterns: Seq[String])
      extends UnaryExpression {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "need at least one non-empty pattern")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType}")
    override def dataType: DataType = ArrayType(StringType, false)
    override def prettyName: String = "matched_terms"
    @transient private lazy val acRef = new AcRef(patterns)
    override def nullSafeEval(input: Any): Any =
      matchedKernel(input.asInstanceOf[UTF8String], acRef.get)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("acRef", acRef,
        "graft.expr.MultiMatch.AcRef")
      val ac = ctx.addMutableState("graft.expr.MultiMatch.Ac", "ac",
        v => s"$v = $ref.get();")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expr.MultiMatch.matchedKernel($c, $ac);")
    }
    override protected def withNewChildInternal(c: Expression)
        : MatchedTerms = copy(child = c)
  }

  /** `redact_any(text)`: every blocklist occurrence spliced out with
    * leftmost-longest semantics ("hers" wins over "he"/"hers" at the
    * same site; committed spans never overlap) and replaced by
    * `mask` — the enforcement half behind [[ContainsAny]]'s gate and
    * [[MatchedTerms]]'s audit trail.
    */
  case class RedactAny(child: Expression, patterns: Seq[String],
                       mask: String)
      extends UnaryExpression {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "need at least one non-empty pattern")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType}")
    override def dataType: DataType = StringType
    override def prettyName: String = "redact_any"
    private lazy val maskU = UTF8String.fromString(mask)
    @transient private lazy val acRef = new AcRef(patterns)
    override def nullSafeEval(input: Any): Any =
      redactKernel(input.asInstanceOf[UTF8String], acRef.get, maskU)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("acRef", acRef,
        "graft.expr.MultiMatch.AcRef")
      val ac = ctx.addMutableState("graft.expr.MultiMatch.Ac", "ac",
        v => s"$v = $ref.get();")
      val mref = ctx.addReferenceObj("mask", maskU,
        "org.apache.spark.unsafe.types.UTF8String")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expr.MultiMatch.redactKernel($c, $ac, $mref);")
    }
    override protected def withNewChildInternal(c: Expression)
        : RedactAny = copy(child = c)
  }

  def contains_any(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(ContainsAny(ColumnBridge.expression(text),
      patterns))
  def matched_terms(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MatchedTerms(ColumnBridge.expression(text),
      patterns))
  def redact_any(text: Column, patterns: Seq[String],
                 mask: String = "<BLOCKED>"): Column =
    ColumnBridge.column(RedactAny(ColumnBridge.expression(text),
      patterns, mask))
}
