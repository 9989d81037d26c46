package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor (SURVEY.md §2 C7b):
  * a k-means coarse quantizer splits the corpus into nList cells; each
  * probe scores only the vectors in its nProbe nearest cells.
  *
  * Scale shape: training samples a tiny fraction of the corpus once;
  * cell assignment is a map-side argmin against broadcast centroids
  * (no shuffle); the probe-cell equi-join replaces the all-pairs scan.
  * Compared with hyperplane LSH (Similarity.lshTopK), IVF adapts to the
  * data distribution — cells follow density, so recall at equal cost is
  * usually higher on clustered embeddings.
  */
object IvfIndex {

  final case class Model(centroids: Seq[Seq[Double]]) {
    def nList: Int = centroids.size
  }

  /** Train the coarse quantizer (deterministic under the seed). At
    * 100 TB you'd train on a deterministicSample of the corpus; the
    * model is a few KB regardless of corpus size.
    */
  def train(vecs: DataFrame, nList: Int = 16, seed: Long = 42L,
            vecCol: String = "embedding"): Model = {
    val feats = vecs.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val km = new KMeans().setK(nList).setSeed(seed).setMaxIter(10)
    val model = km.fit(feats)
    Model(model.clusterCenters.toSeq.map(_.toArray.toSeq))
  }

  /** Squared L2 distance to one centroid, sequential fold. */
  private def dist2(vec: Column, centroid: Seq[Double]): Column =
    aggregate(
      zip_with(vec, typedlit(centroid),
        (x, c) => { val dd = x.cast("double") - c; dd * dd }),
      lit(0.0), (acc, v) => acc + v)

  /** Index of the nearest centroid (map-side, codegen'd). */
  def assignCell(vec: Column, model: Model): Column = {
    val dists = array(model.centroids.map(c => dist2(vec, c)): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** The nProbe nearest cells of a probe vector, as an array column. */
  def probeCells(vec: Column, model: Model, nProbe: Int): Column = {
    val dists = array(model.centroids.map(c => dist2(vec, c)): _*)
    slice(
      transform(
        array_sort(
          zip_with(dists, typedlit(model.centroids.indices.toList),
            (dd, i) => struct(dd.as("d"), i.as("i")))),
        s => s.getField("i")),
      1, nProbe)
  }

  /** Approximate top-k: probes scan only their nProbe cells. */
  def topK(corpus: DataFrame, probes: DataFrame, model: Model,
           k: Int, nProbe: Int = 2,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      assignCell(col(vecCol), model).as("cell"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
        explode(probeCells(col(vecCol), model, nProbe)).as("cell"))
    val scored = c.join(broadcast(p),
        c("cell") === p("cell") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        Similarity.cosine(col("probe_vec"), col("vec")).as("cos"))
    scored.groupBy("probe_id")
      .agg(graft.functions.TopK.topk(k)(col("cos"), col("vec_id")).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(col("probe_id"), col("col._2").as("vec_id"),
        col("col._1").as("cos"), (col("pos") + 1).cast("long").as("rk"))
  }
}
