package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage with weighted field agreement — the
  * Fellegi–Sunter workhorse shape for STRUCTURED entity resolution,
  * complementing the text-dedup family (MinHash/SimHash/edit distance
  * work on prose; this scores field-by-field agreement between two
  * record sets: customer↔CRM snapshot, supplier↔vendor master).
  *
  * Design, and why it scales:
  *  - candidate pairs come from an EQUI-join on a blocking key (never
  *    a cross join): only same-block records are compared, the classic
  *    n² → Σ|block|² cut;
  *  - the agreement score is a SUM of INTEGER weights over
  *    field-equality tests — integer arithmetic keeps the score
  *    engine- and partitioning-exact (the float-logit version of
  *    Fellegi–Sunter orders pairs identically when weights are scaled
  *    to integers);
  *  - comparators are plain Column predicates, so everything stays in
  *    whole-stage codegen.
  *
  * Skewed blocks (one giant block) are the operator's hazard; the
  * caller picks a finer blocking key or salts it (operators/Skew) —
  * same remedy as any skewed join.
  */
object RecordLinkage {

  /** A field comparator: predicate over (left, right) plus its
    * agreement weight. */
  final case class Rule(name: String, agree: (Column, Column) => Column,
                        weight: Int)

  /** Exact-equality rule (null-safe: null never agrees). */
  def eq(name: String, weight: Int): Rule =
    Rule(name, (l, r) => l === r, weight)

  /** Score all same-block pairs: (left id, right id, score BIGINT).
    * `fields` maps rule name → (left column, right column). */
  def scorePairs(left: DataFrame, right: DataFrame,
                 leftId: String, rightId: String,
                 leftBlock: Column, rightBlock: Column,
                 rules: Seq[Rule],
                 fields: Map[String, (Column, Column)]): DataFrame = {
    require(rules.nonEmpty && rules.forall(r => fields.contains(r.name)))
    val l = left.select(col(leftId).as("id_l") +: leftBlock.as("blk") +:
      rules.map(r => fields(r.name)._1.as(s"l_${r.name}")): _*)
    val r = right.select(col(rightId).as("id_r") +: rightBlock.as("blk2") +:
      rules.map(ru => fields(ru.name)._2.as(s"r_${ru.name}")): _*)
    val score = rules.map(ru =>
      when(ru.agree(col(s"l_${ru.name}"), col(s"r_${ru.name}")),
        lit(ru.weight.toLong)).otherwise(lit(0L))).reduce(_ + _)
    l.join(r, col("blk") === col("blk2"))
      .select(col("id_l"), col("id_r"), score.as("score"))
  }
}
