package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Streaming side of the ANN stack: incremental IVF coarse-assignment.
  *
  * A production vector index is never built once — new embeddings arrive
  * continuously and must land in the right IVF bucket before the next
  * query probes it. The batch assignment ([[Similarity.assignClustersL2]])
  * computes an argmin WINDOW over (vector × centroid) scores, which is
  * illegal on a stream (non-time window). The streaming form restates the
  * argmin as a PER-ROW fold instead: the trained centroids — small by
  * construction, K·dim — are packed into ONE static row holding an
  * array<struct<cv,cid>>, broadcast under every micro-batch, and each
  * arriving vector takes `array_min` over `transform`-computed
  * `(distance, centroid_id)` structs. Struct ordering is lexicographic,
  * so the min IS the batch tie-break (nearest distance, then lowest
  * centroid id) — no shuffle, no state, append-mode legal.
  *
  * Exactness: the same micro-quantized integer squared-L2 as the batch
  * path ([[Similarity.quantVectors]] / [[Similarity.intL2]]), so stream
  * output is row-for-row IDENTICAL to the batch assignment of the same
  * vectors — proven in StreamingSpec and gated end-to-end by the
  * `streaming_ivf_assign` oracle query.
  *
  * Scale posture: stateless map over the stream (state size zero; the
  * only non-stream data is the broadcast centroid row), so throughput is
  * partition-parallel and watermark-free. At 100 TB/day of new vectors
  * this is the shape you want: the expensive part (centroid TRAINING)
  * stays a periodic batch job ([[Similarity.kmeansTrain]]); ingestion
  * only folds over K centroids per row.
  */
object StreamingAnn {

  /** Assign each streamed vector to its nearest trained centroid by
    * integer squared L2 (exact argmin, centroid-id tie-break). `vecs`
    * may be a streaming OR batch frame; `centroids` must be batch.
    * Output: (idCol, cluster, d2).
    */
  def ivfAssignStream(vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val centRow = Similarity.quantVectors(centroids, idCol, embCol, "centroid_id")
      .agg(collect_list(struct(col("__qv").as("cv"),
        col("centroid_id").as("cid"))).as("__cents"))
    Similarity.quantVectors(vecs, idCol, embCol, idCol)
      .crossJoin(broadcast(centRow))
      .withColumn("__best", array_min(transform(col("__cents"),
        c => struct(Similarity.intL2(col("__qv"), c.getField("cv")).as("d2"),
          c.getField("cid").as("cid")))))
      .select(col(idCol), col("__best.cid").as("cluster"),
        col("__best.d2").as("d2"))
  }

  /** Streaming PQ encode: each arriving vector's `subspaces` codes in
    * one stateless pass — the streaming twin of
    * [[Similarity.pqCodes]]'s explode + argmin-window chain. The
    * sub-codebook (subspaces × centroids sub-vectors) is packed into
    * ONE static array row and broadcast; per row, a `transform` over
    * subspace ordinals takes `array_min` over that subspace's book
    * entries (struct ordering = distance, then code id — the batch
    * tie-break), and `posexplode` unrolls the per-subspace results to
    * the (id, subspace, code) layout. Same micro-quantized integer L2
    * and the same loud width guard as the batch path.
    */
  def pqEncodeStream(vecs: DataFrame, codebook: DataFrame,
      subspaces: Int = 4, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(subspaces > 0)
    Similarity.pqCodeTuple(vecs, codebook, subspaces, idCol, embCol)
      .select(col(idCol), posexplode(col("__ck")).as(Seq("subspace", "code")))
      .select(col(idCol), col("subspace").cast("long").as("subspace"), col("code"))
  }

  /** The full streaming index-ingest: coarse IVF assignment AND the PQ
    * codes for every arriving vector in one stateless pass — everything
    * the serving-side ADC search ([[Similarity.ivfPqTopK]]) needs to
    * know about a vector, so a stream of new embeddings becomes
    * immediately searchable without re-encoding the corpus. Output:
    * (idCol, cluster, subspace, code), `subspaces` rows per vector.
    */
  def ivfPqIngestStream(vecs: DataFrame, centroids: DataFrame,
      codebook: DataFrame, subspaces: Int = 4, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val centRow = Similarity.quantVectors(centroids, idCol, embCol, "centroid_id")
      .agg(collect_list(struct(col("__qv").as("cv"),
        col("centroid_id").as("cid"))).as("__cents"))
    val bookRow = Similarity.pqSubVectors(codebook, subspaces, idCol, embCol, "cs")
      .agg(collect_list(struct(col("subspace"),
        col(idCol).as("code"), col("cs"))).as("__book"))
    val q = Similarity.quantVectors(vecs, idCol, embCol, idCol)
      .withColumn("__qv", Similarity.pqWidthGuarded(col("__qv"), subspaces))
    val width = (size(col("__qv")) / subspaces).cast("int")
    q.crossJoin(broadcast(centRow.crossJoin(bookRow)))
      .withColumn("cluster", array_min(transform(col("__cents"),
        c => struct(Similarity.intL2(col("__qv"), c.getField("cv")).as("d2"),
          c.getField("cid").as("cid")))).getField("cid"))
      .select(col(idCol), col("cluster"),
        posexplode(transform(sequence(lit(0), lit(subspaces - 1)), s => {
          val sub = slice(col("__qv"), s.cast("int") * width + 1, width)
          array_min(transform(
            filter(col("__book"), b => b.getField("subspace") === s),
            b => struct(Similarity.intL2(sub, b.getField("cs")).as("d2"),
              b.getField("code").as("code")))).getField("code")
        })).as(Seq("subspace", "code")))
      .select(col(idCol), col("cluster"),
        col("subspace").cast("long").as("subspace"), col("code"))
  }
}
