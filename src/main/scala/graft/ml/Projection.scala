package graft.ml

import org.apache.spark.ml.feature.{PCA, PCAModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature projection (reference "Feature Projection" section,
  * README.md:395-422): the reference's RDD `RowMatrix
  * .computePrincipalComponents(k)` + `multiply(pc)` becomes
  * `ml.feature.PCA` on a vector column — same covariance-PCA family,
  * but staying in DataFrame-land so Catalyst manages the pipeline.
  */
object Projection {

  /** Fit PCA(k) on an `array<float>` embedding column and project.
    * Returns (df + `pca` array<double> column, model). */
  def pca(df: DataFrame, vecCol: String, k: Int): (DataFrame, PCAModel) = {
    val withVec = df.withColumn("__mlvec", array_to_vector(col(vecCol)))
    val model = new PCA().setK(k).setInputCol("__mlvec").setOutputCol("__pca")
      .fit(withVec)
    val projected = model.transform(withVec)
      .withColumn("pca", vector_to_array(col("__pca")))
      .drop("__mlvec", "__pca")
    (projected, model)
  }
}
