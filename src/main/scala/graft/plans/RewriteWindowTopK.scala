package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

import graft.llmops.CollectTopK

/** Optimizer rule that closes the rank-window top-k scale trap at the
  * planner level.
  *
  * `row_number().over(partitionBy(g).orderBy(score.desc, id))` filtered
  * to `rk <= k` is the natural way to write per-group top-k, and the
  * classic way to melt a cluster: every scored row shuffles into
  * |groups| reducers (the round-1 review's finding against the
  * brute-force cosine query). The safe plan — a bounded-heap aggregate
  * with map-side partial combine ([[CollectTopK]]) — exists as the
  * explicit API ([[graft.llmops.TopK.topK]]), but a user who reaches
  * for the window form shouldn't need to know that. This rule rewrites
  *
  * {{{
  * Filter(rk <= k)
  *   Window([row_number() over (partition by p… order by s desc, i)] rk)
  *     child                                  -- output exactly {p…, s, i}
  * }}}
  *
  * into `Aggregate(p…, collect_top_k(i, s, k)) → posexplode → Project`,
  * reusing the original attribute ids so parents bind unchanged.
  * Results are identical (top-k of a union is the top-k of per-part
  * top-ks; [[CollectTopK]] reproduces Spark's null/NaN/-0.0 ordering) —
  * only the physical shape changes: the exchange carries
  * ≤ partitions·|groups|·k slim entries instead of every scored row.
  *
  * The rewrite deliberately fires only on the exact scale-trap shape:
  *  - single row_number window expression, ordered `(double desc,
  *    long asc)` with default null ordering — the similarity re-rank
  *    signature;
  *  - the window child's output is exactly the partition keys + the
  *    two order columns (after Catalyst's column pruning this is the
  *    common case; anything wider means the caller needs payload
  *    columns the aggregate would drop);
  *  - a conjunct bounding the rank by a literal `k ≤ maxK`; other
  *    conjuncts stay as a residual Filter above (filtering after
  *    ranking commutes with taking the top-k).
  *
  * Session-scoped via [[graft.GraftExtensions]]; disable with
  * `spark.graft.rewriteWindowTopK=false`.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] with PredicateHelper {

  private val flag = "spark.graft.rewriteWindowTopK"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flag, "true").toBoolean) plan
    else plan.transformUp {
      case f @ Filter(cond, w: Window) => tryRewrite(cond, w).getOrElse(f)
    }

  /** k such that `pred` ⇔ `rk <= k`, if it has that form. */
  private def rankLimit(pred: Expression, rk: Attribute): Option[Int] =
    pred match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
          if a.semanticEquals(rk) => Some(v)
      case LessThan(a: Attribute, Literal(v: Int, IntegerType))
          if a.semanticEquals(rk) => Some(v - 1)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rk) => Some(v)
      case GreaterThan(Literal(v: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rk) => Some(v - 1)
      case EqualTo(a: Attribute, Literal(v: Int, IntegerType))
          if v == 1 && a.semanticEquals(rk) => Some(1)
      case _ => None
    }

  private def tryRewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(al @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, Seq(
            SortOrder(score: Attribute, Descending, NullsLast, _),
            SortOrder(id: Attribute, Ascending, NullsFirst, _)), _)), _))
          if score.dataType == DoubleType && id.dataType == LongType =>
        val rk = al.toAttribute
        val partAttrs = w.partitionSpec.collect { case a: Attribute => a }
        val conjuncts = splitConjunctivePredicates(cond)
        val (rankPreds, residual) =
          conjuncts.partition(rankLimit(_, rk).isDefined)
        val eligible =
          partAttrs.size == w.partitionSpec.size &&
          partAttrs.map(_.exprId).distinct.size == partAttrs.size &&
          rankPreds.size == 1 &&
          !residual.exists(_.references.contains(rk)) &&
          !partAttrs.exists(p =>
            p.semanticEquals(id) || p.semanticEquals(score)) &&
          !id.semanticEquals(score) &&
          w.child.outputSet == AttributeSet(partAttrs ++ Seq(id, score))
        val k = rankPreds.headOption.flatMap(rankLimit(_, rk)).getOrElse(0)
        if (!eligible || k < 1 || k > CollectTopK.maxK) None
        else {
          val topkAlias = Alias(
            CollectTopK(id, score, k).toAggregateExpression(), "graft_topk")()
          val agg = Aggregate(partAttrs, partAttrs :+ topkAlias, w.child)
          val posAttr =
            AttributeReference("graft_pos", IntegerType, nullable = false)()
          val entryAttr = AttributeReference("graft_entry",
            CollectTopK.resultType.asInstanceOf[ArrayType].elementType,
            nullable = false)()
          val gen = Generate(PosExplode(topkAlias.toAttribute),
            unrequiredChildIndex = Seq(partAttrs.size), outer = false,
            qualifier = None, generatorOutput = Seq(posAttr, entryAttr), agg)
          val idOut =
            Alias(GetStructField(entryAttr, 0, Some("_1")), id.name)(
              exprId = id.exprId)
          val scoreOut =
            Alias(GetStructField(entryAttr, 1, Some("_2")), score.name)(
              exprId = score.exprId)
          val rkOut =
            Alias(Add(posAttr, Literal(1)), rk.name)(exprId = rk.exprId)
          val projList: Seq[NamedExpression] = w.child.output.map {
            case a if a.exprId == id.exprId => idOut
            case a if a.exprId == score.exprId => scoreOut
            case a => a
          } :+ rkOut
          val proj = Project(projList, gen)
          Some(if (residual.isEmpty) proj
               else Filter(residual.reduce(And), proj))
        }
      case _ => None
    }
}
