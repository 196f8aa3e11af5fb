package graft.sig

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) coarse quantizer over an embedding column — the scale
 * path the reference names for its own vector store: "Use IndexIVFFlat
 * instead of IndexFlatIP for large datasets"
 * (/root/reference/PRODUCTION.md:520; the upgrade note also sits inline at
 * app/utils/vector_store.py:45). FAISS IVF = train k centroids, assign every
 * vector to its nearest centroid's posting list, and scan only `nprobe`
 * lists per query. Re-expressed Spark-first:
 *
 *  - `train` is the FAISS `index.train()` analog: an OFFLINE index-build
 *    action (deterministic seed pick + a few spherical-Lloyd rounds, one
 *    groupBy job each), returning a driver-side k×dim array — the same
 *    "small derived object" class as LSH plane count or band count. It is
 *    never called inside an operator's lazy plan.
 *  - assignment/probing are pure codegen'd Column expressions (literal
 *    centroid arrays + `zip_with`/`aggregate` dot products — the same
 *    literal-plan shape as `Engine.hyperplane`), so the query side stays
 *    inside whole-stage codegen with no UDF.
 *  - the posting-list "scan" is an ordinary equi-join on the cell id:
 *    probe(qid, cell) ⋈ assign(nid, cell). Candidates per query ≈
 *    nprobe·n/k. A hot cell is a skewed *shuffle-join* key — splittable by
 *    AQE skew handling (unlike a window) — and k-means cells are
 *    size-balanced to first order, unlike LSH buckets under boilerplate
 *    captions, which is exactly why IVF is the right structure when the
 *    *embedding* space (not the caption text) is the skewed axis.
 *
 * Sizing at scale: k ≈ sqrt(n) (FAISS guidance), nprobe ≈ k/4 for
 * recall ≥ 0.9 at cos ≥ 0.9; train on a fixed hash-sample of the corpus
 * (`pmod(xxhash64(id), trainMod) = 0`) — Lloyd needs thousands of points
 * per centroid, not the corpus.
 */
object Ivf {

  /** Array of the k centroid dot products for vector column `u`
    * (both sides L2-normalized ⇒ dot = cosine). */
  def dotsCol(u: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.toIndexedSeq.map { c =>
      aggregate(zip_with(u, array(c.toIndexedSeq.map(lit): _*), (x, w) => x * w),
        lit(0.0), (a, x) => a + x)
    }: _*)

  /** Top-`nprobe` cell ids for `u`, nearest first. Ties break on the lower
    * cell id (struct sort: (-dot asc, i asc)) — deterministic. */
  def probeCol(u: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val ranked = sort_array(zip_with(
      dotsCol(u, centroids),
      array(centroids.indices.map(lit): _*),
      (d, i) => struct((-d).as("nd"), i.as("i"))))
    transform(slice(ranked, 1, nprobe), s => s.getField("i"))
  }

  /**
   * Spherical k-means training: deterministic hash-ordered seed pick, then
   * `iters` Lloyd rounds. Each round is ONE distributed aggregation
   * (posexplode → groupBy(cell, pos) sum/count) collecting k×dim cell sums
   * to the driver — bytes proportional to the INDEX (k·dim·8), never the
   * corpus. Centroids are renormalized per round (spherical variant — the
   * metric is cosine, matching the reference's IndexFlatIP inner-product
   * space over L2-normalized embeddings, vector_store.py:49-69). Cells that
   * lose every member keep their previous centroid.
   *
   * `e` must have columns (id: long, u: array<double> L2-normalized).
   */
  def train(e: DataFrame, k: Int, iters: Int = 2): Array[Array[Double]] = {
    val seeds = e.orderBy(xxhash64(col("id")), col("id")).limit(k)
      .select(col("u")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.length == k, s"corpus has fewer than k=$k rows")
    var cents = seeds
    var it = 0
    while (it < iters) {
      val sums = e.select(posexplode(Ivf.probeCol(col("u"), cents, 1)).as(Seq("_p", "cell")), col("u"))
        .select(col("cell"), posexplode(col("u")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("m"))
        .collect()
      val next = cents.map(_.clone())
      sums.groupBy(_.getInt(0)).foreach { case (cell, rows) =>
        val dim = cents(cell).length
        val v = new Array[Double](dim)
        rows.foreach(r => v(r.getInt(1)) = r.getLong(3).toDouble match {
          case m if m > 0 => r.getDouble(2) / m
          case _          => 0.0
        })
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n > 0) next(cell) = v.map(_ / n)
      }
      cents = next
      it += 1
    }
    cents
  }
}
