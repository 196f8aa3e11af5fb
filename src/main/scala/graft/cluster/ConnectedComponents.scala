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

    // lazy localCheckpoint: materialization rides the hashSum job below, so
    // each round costs ONE job (checkpoint + convergence check together)
    // instead of two
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)

    // convergence via label-hash sum: labels only ever DECREASE per vertex
    // (min propagation), so the multiset of labels is unchanged iff no
    // vertex changed — comparing one aggregated hash sum per round replaces
    // a join + count action (collision-cancellation odds ~2^-64)
    // decimal(38,0) so ANSI mode can't overflow the sum of 2^63-scale hashes
    def hashSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.select(coalesce(sum(xxhash64(col("label")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("h"))
        .collect()(0).getDecimal(0)

    var iter = 0
    var converged = false
    // no pre-loop hashSum: iteration 1 always changes a label when any
    // edge exists (initial labels are own ids, so the larger endpoint of
    // some edge must drop), so the first comparison point is iteration 1's
    // sum — one driver job and one sync fewer per run
    var prevSum: java.math.BigDecimal = null
    while (iter < maxIter && !converged) {
      val msgs = sym.join(labels, sym("a") === labels("id"))
        .select(col("b").as("id"), col("label"))
      val next = labels.select("id", "label").union(msgs)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(false)
      val nextSum = hashSum(next)
      labels = next
      converged = prevSum != null && nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }

    vertices.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster_id"))
  }
}
