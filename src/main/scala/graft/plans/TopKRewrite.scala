package graft.plans

import graft.functions.TopKAgg

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: plan the top-k-per-group idiom
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(g).orderBy(o)))
  *      .filter($"rn" <= k) }}}
  *
  * as a bounded [[TopKAgg]] aggregate instead of a window sort. The
  * window formulation shuffles and sorts EVERY row of every group; the
  * aggregate runs map-side partials, so at most k rows per group per
  * partition cross the shuffle — on a 100 TB fact the difference between
  * a full-data sort and a bounded ObjectHashAggregate. (The reference's
  * "latest record" pattern, `/root/reference/Clustering_Analysis.py:29-34`
  * `ORDER BY lastupdate DESC LIMIT 1`, is exactly this idiom with k = 1.)
  *
  * Each window sort key becomes two ascending struct fields: a null-rank
  * byte reproducing the SortOrder's null placement, then the key itself —
  * negated (numerics; dates/timestamps via their epoch integers) when the
  * direction is descending. Non-grouping output columns ride along as
  * payload fields, and rows are rebuilt with posexplode, re-deriving rn
  * from the array position.
  *
  * The rewrite bails (leaves the plan untouched) unless it is provably
  * safe: single row_number window expression, rn compared to a literal
  * 1..[[MaxK]], plain-attribute partition keys, deterministic orderable
  * sort keys (descending only for types with an order-reversing
  * transform), and orderable payload types. Like any row_number plan
  * change, row identity under sort-key TIES may differ from the window
  * formulation — both are valid answers; only a total ordering pins the
  * result, in either formulation.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** Beyond this the per-group heap stops being "bounded" in spirit. */
  private val MaxK = 1024

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) => rewrite(f, cond, w).getOrElse(f)
  }

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
    case _ => None
  }

  /** cond ≡ (rn ≤ k) for a literal k, in any spelling. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, l) if a.exprId == rn.exprId => intLit(l)
    case LessThan(a: Attribute, l) if a.exprId == rn.exprId => intLit(l).map(_ - 1)
    case EqualTo(a: Attribute, l) if a.exprId == rn.exprId => intLit(l).filter(_ == 1)
    case GreaterThanOrEqual(l, a: Attribute) if a.exprId == rn.exprId => intLit(l)
    case GreaterThan(l, a: Attribute) if a.exprId == rn.exprId => intLit(l).map(_ - 1)
    case EqualTo(l, a: Attribute) if a.exprId == rn.exprId => intLit(l).filter(_ == 1)
    case _ => None
  }

  /** An expression whose ASCENDING order equals `e`'s DESCENDING order.
    * Integrals widen to long first so negation cannot wrap (the lone
    * unfixable edge, Long.MinValue, keeps the window plan).
    */
  private def invert(e: Expression): Option[Expression] = e.dataType match {
    case ByteType | ShortType | IntegerType =>
      Some(UnaryMinus(Cast(e, LongType), failOnError = false))
    case LongType | FloatType | DoubleType | _: DecimalType =>
      Some(UnaryMinus(e, failOnError = false))
    case DateType => Some(UnaryMinus(UnixDate(e), failOnError = false))
    case TimestampType => Some(UnaryMinus(UnixMicros(e), failOnError = false))
    case TimestampNTZType
        // ntz -> instant reads the wall clock in the session zone, which
        // only preserves order when that zone never shifts (no DST folds)
        if java.time.ZoneId.of(conf.sessionLocalTimeZone).getRules.isFixedOffset =>
      Some(UnaryMinus(
        UnixMicros(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))),
        failOnError = false))
    case _ => None
  }

  private def rewrite(f: Filter, cond: Expression, w: Window): Option[LogicalPlan] =
    w match {
      case Window(
            Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            part, order, child, _) =>
        val rn = alias.toAttribute
        val partAttrs = part.collect { case a: Attribute => a }
        val safe =
          partAttrs.size == part.size &&
            order.nonEmpty &&
            order.forall(o => o.child.deterministic && RowOrdering.isOrderable(o.child.dataType)) &&
            child.output.forall(a => RowOrdering.isOrderable(a.dataType))
        if (!safe) return None
        val k = limitOf(cond, rn).getOrElse(return None)
        if (k < 1 || k > MaxK) return None

        // sort keys -> (null-rank, orderable value) ascending field pairs
        val sortFields: Seq[(Expression, Expression)] = order.map { o =>
          val value =
            if (o.direction == Ascending) o.child
            else invert(o.child).getOrElse(return None)
          val (nullR, nonNullR) = if (o.nullOrdering == NullsFirst) (0, 1) else (1, 0)
          val nullRank = If(IsNull(o.child), Literal(nullR), Literal(nonNullR))
          // the value field of a null row never decides the order (the
          // null-rank already did) but must be non-null for the struct
          // ordering, so park a type-default there
          val guarded = If(IsNull(value), Literal.default(value.dataType), value)
          (nullRank, guarded)
        }
        val payload = child.output.filterNot(a => partAttrs.exists(_.exprId == a.exprId))
        val fields: Seq[Expression] =
          sortFields.zipWithIndex.flatMap { case ((r, v), i) =>
            Seq(Literal(s"r$i"), r, Literal(s"v$i"), v)
          } ++
            payload.zipWithIndex.flatMap { case (a, i) => Seq(Literal(s"p$i"), a) }
        val packed = CreateNamedStruct(fields)
        val topk = Alias(
          AggregateExpression(TopKAgg(packed, Literal(k)), Complete, isDistinct = false),
          "graft_topk")()
        val agg = Aggregate(partAttrs, partAttrs :+ topk, child, None)

        val posAttr = AttributeReference("graft_pos", IntegerType, nullable = false)()
        val colAttr = AttributeReference(
          "graft_row", packed.dataType.asInstanceOf[StructType], nullable = false)()
        val gen = Generate(
          PosExplode(topk.toAttribute),
          unrequiredChildIndex = Seq(partAttrs.size), // the array itself
          outer = false,
          qualifier = None,
          generatorOutput = Seq(posAttr, colAttr),
          agg)

        val nSort = sortFields.size * 2
        val out: Seq[NamedExpression] = f.output.map { a =>
          if (a.exprId == rn.exprId)
            Alias(Add(posAttr, Literal(1)), alias.name)(exprId = a.exprId)
          else
            partAttrs.find(_.exprId == a.exprId).getOrElse {
              val idx = payload.indexWhere(_.exprId == a.exprId)
              if (idx < 0) return None // rn aliased oddly / unknown attr
              // the name hint must be the STRUCT FIELD's name — downstream
              // generator pruning (GeneratorNestedColumnAliasing) re-extracts
              // fields by it
              Alias(GetStructField(colAttr, nSort + idx, Some(s"p$idx")), a.name)(exprId = a.exprId)
            }
        }
        Some(Project(out, gen))
      case _ => None
    }
}
