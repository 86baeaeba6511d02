package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), Spark-native: the dot product is `zip_with` +
  * `aggregate` (codegen'd HOFs — no UDF), candidate generation is either
  * brute-force (baseline) or IVF cells (scale path).
  */
object Similarity {

  /** Cosine similarity between two float/double arrays, computed in double —
    * a native fused-loop Catalyst expression with codegen. The pure-HOF
    * formulation (`aggregate(zip_with(...))` for dot plus two norm passes)
    * walks the arrays three times through interpreted lambda eval; the
    * native loop is ~10× faster per pair.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosineSim(a, b)

  /** Brute-force top-k cosine neighbors for every query vector: the exact
    * baseline. queries ⨯ corpus via broadcast of the (small) query side —
    * Catalyst broadcasts automatically below the threshold; at scale, cap the
    * query batch instead of growing the broadcast.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("corpus_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine")
  }

  /** IVF (inverted-file) ANN: assign every vector to its nearest of
    * `nCells` centroids (deterministic centroid choice: the vectors whose
    * xxhash64(id) is smallest — a seeded sample without an RNG), then search
    * only within the query's `nProbe` nearest cells.
    *
    * At 100 TB the cell assignment is one broadcast-join map pass and the
    * search shuffle is bounded by cell size, not corpus size.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("corpus_vec"))

    // deterministic "sampled" centroids
    val centroids = c.withColumn("h", xxhash64(col("corpus_id")))
      .orderBy(col("h")).limit(nCells)
      .select(monotonically_increasing_id().as("cell_id"), col("corpus_vec").as("centroid"))
    val cent = broadcast(centroids)

    // assign corpus vectors to their nearest centroid
    val assignW = Window.partitionBy(col("corpus_id")).orderBy(col("sim").desc, col("cell_id"))
    val assigned = c.join(cent)
      .select(col("corpus_id"), col("corpus_vec"), col("cell_id"),
        cosine(col("corpus_vec"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select("corpus_id", "corpus_vec", "cell_id")

    // queries probe their nProbe nearest cells
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cell_id"))
    val probes = q.join(cent)
      .select(col("query_id"), col("query_vec"), col("cell_id"),
        cosine(col("query_vec"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .select("query_id", "query_vec", "cell_id")

    val scored = assigned.join(probes, Seq("cell_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine")
  }
}
