package graft.olist

import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Column-level lineage, derived from the ANALYZED logical plan — the
  * "which upstream columns can influence this output column" map that
  * impact analysis, PII propagation tracking, and docs tooling consume
  * (dbt-core stops at node-level `depends_on`; column lineage is the
  * natural next rung, and with compiled transforms the resolved plan is
  * the ground truth — there is no SQL text to parse).
  *
  * The walk propagates attribute provenance bottom-up by `ExprId`:
  *   - a dep enters as `SubqueryAlias <depName>` over a leaf (exactly how
  *     Catalog.placeholderDeps stages dependencies), rooting every column
  *     at `<depName>.<column>`;
  *   - Project / Aggregate / Window map each named output expression to
  *     the union of its referenced attributes' roots — both value and
  *     grouping references count (lineage is "can influence", not "is
  *     copied from");
  *   - Generate roots every generator output at the generator's inputs;
  *     Expand (cube / rollup / grouping sets) unions each output
  *     position's expressions across projections;
  *   - Union merges by position across children;
  *   - everything else (Filter, Join, Sort, Limit, aliasing) passes
  *     attributes through untouched, which the ExprId map gives for free.
  *
  * Purely structural — no execution, no data read; cost is one plan
  * traversal, so it can run at docs-generation time for every model.
  */
object Lineage {

  /** Map each output column of `plan` to the sorted upstream roots
    * (`dep.column`) it derives from. Columns with no named-leaf ancestry
    * (literals, synthetic ids) map to an empty list.
    */
  def columnLineage(plan: LogicalPlan): Map[String, Seq[String]] = {
    val roots = walk(plan)
    plan.output.map(a =>
      a.name -> roots.getOrElse(a.exprId, Set.empty[String]).toSeq.sorted
    ).toMap
  }

  private def walk(p: LogicalPlan): Map[ExprId, Set[String]] = p match {
    case SubqueryAlias(ident, child) =>
      // The alias roots every column of the aliased relation that is not
      // already rooted deeper (a `.as(name)` re-alias over an already
      // traced subtree must not re-root it). `toDF(...)` inserts a
      // renaming Project under the alias, so rooting keys off the
      // CHILD'S OUTPUT names, not the leaf's.
      val childMap = walk(child)
      childMap ++ child.output.collect {
        case a if childMap.getOrElse(a.exprId, Set.empty).isEmpty =>
          a.exprId -> Set(s"${ident.name}.${a.name}")
      }
    case leaf: LeafNode =>
      leaf.output.map(a => a.exprId -> Set.empty[String]).toMap
    case u: Union =>
      val childMaps = u.children.map(walk)
      val merged = childMaps.foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
      val perChild = u.children.map(_.output)
      val own = u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> perChild.flatMap(out =>
          merged.getOrElse(out(i).exprId, Set.empty[String])).toSet
      }.toMap
      merged ++ own
    case _ =>
      val fromChildren = p.children.map(walk)
        .foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
      def refs(e: Expression): Set[String] =
        e.references.toSeq.flatMap(a =>
          fromChildren.getOrElse(a.exprId, Set.empty[String])).toSet
      def named(exprs: Seq[NamedExpression]): Map[ExprId, Set[String]] =
        exprs.map(ne => ne.exprId -> refs(ne)).toMap
      val own: Map[ExprId, Set[String]] = p match {
        case Project(exprs, _)      => named(exprs)
        case Aggregate(_, aggs, _, _) => named(aggs)
        case w: Window              => named(w.windowExpressions)
        case g: Generate =>
          val gr = refs(g.generator)
          g.generatorOutput.map(a => a.exprId -> gr).toMap
        case e: Expand =>
          e.output.zipWithIndex.map { case (a, i) =>
            a.exprId -> e.projections.flatMap(row => refs(row(i))).toSet
          }.toMap
        case _ => Map.empty
      }
      fromChildren ++ own
  }
}
