package graft.cluster

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Iterative DataFrame connected components: min-label propagation to a
 * fixpoint (SURVEY.md §2.4 JN4 — replaces the reference's sequential
 * `parent_bug_id` star assignment, `app/services/duplicate_detector.py:80-94`,
 * with an order-independent equivalent).
 *
 * Why plain propagation and not large-star/small-star: dedup clusters are
 * shallow (stars and short chains around an anchor — diameter 2-4), so the
 * iteration count is bounded by the cluster diameter, not log(n); each
 * round is one shuffle (join + groupBy min). `localCheckpoint` truncates the
 * lineage each round so plans stay flat at any iteration count; a hard
 * `maxIter` guard backstops pathological inputs.
 *
 * Only vertices that appear in an edge participate in the loop — singletons
 * (the overwhelming majority at web scale) never enter the shuffle and get
 * their own id as cluster label via the final left join.
 */
object ConnectedComponents {

  /**
   * @param vertices one string-id column named `id`
   * @param edges    (src, dst) string-id pairs
   * @return (id, cluster_id) — cluster_id = min id in the component
   */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark: SparkSession = vertices.sparkSession

    val sym = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))

    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val msgs = sym.join(labels, sym("a") === labels("id"))
        .select(col("b").as("id"), col("label"))
      val next = labels.select("id", "label").union(msgs)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .where(col("n.label") =!= col("o.label"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }

    vertices.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster_id"))
  }
}
