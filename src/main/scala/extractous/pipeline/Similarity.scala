package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the query set is broadcast (small side), the corpus side
  * stays partitioned — brute-force top-k is a broadcast-nested-loop with a
  * per-partition running top-k reduced by a window; the IVF variant prunes the
  * corpus side to the probed centroid cells before the expensive dot products
  * (the standard inverted-file ANN layout, here expressed relationally so
  * Catalyst/AQE own the physical plan).
  */
object Similarity {

  /** Dot product of two numeric array columns (codegen'd HOFs, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Brute-force cosine top-k: every query vs every corpus vector.
    * `queries` is broadcast; ties break on neighbor id (deterministic).
    *
    * Physical shape: a bounded map-side top-k aggregate
    * ([[extractous.spark.TopKByScore]]) — each map partition reduces its
    * |Q|·|partition| scored rows to |Q|·k before the exchange. The obvious
    * `row_number() OVER (PARTITION BY query)` alternative shuffles and sorts
    * the ENTIRE |Q|·|C| cross product, which is the scale killer at corpus
    * size.
    */
  def bruteKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .groupBy(col("query_id"))
      .agg(extractous.spark.topk.topk_by_score(col("sim"), col("neighbor_id").cast("long"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"), col("neighbor_id"))
  }

  /** IVF centroids by element-wise mean per cell. Seeded deterministically by
    * an existing coarse key (here: the label column — at production scale this
    * would be a k-means output; the inverted-file mechanics are identical).
    */
  def centroids(corpus: DataFrame, cellCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    corpus
      .select(col(cellCol).as("cell"), posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos")).agg(avg(col("v")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))
  }

  /** IVF top-k: assign corpus vectors to their true nearest centroid, probe
    * the `nprobe` closest cells per query, brute-force only inside those cells.
    */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label"): DataFrame = {
    val cents = broadcast(centroids(corpus, cellCol, vecCol))

    // invert: every vector assigned to its nearest centroid cell
    val wAssign = Window.partitionBy(col("vid")).orderBy(col("csim").desc, col("cell").asc)
    val assigned = corpus.select(col(idCol).as("vid"), col(vecCol).as("cv"))
      .join(cents)
      .withColumn("csim", cosine(col("cv"), col("centroid")))
      .withColumn("r", row_number().over(wAssign)).filter(col("r") === 1)
      .select(col("vid"), col("cv"), col("cell"))

    // probe list: nprobe closest cells per query
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("qsim").desc, col("cell").asc)
    val probes = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .join(cents)
        .withColumn("qsim", cosine(col("qv"), col("centroid")))
        .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nprobe)
        .select(col("query_id"), col("qv"), col("cell")))

    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vid").asc)
    probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vid").as("neighbor_id"))
  }

  /** Exact near-duplicate pairs by cosine ≥ threshold (brute force — the
    * verification-grade baseline).
    */
  def nearDupPairsExact(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Random-hyperplane LSH bucketing (the scale path for near-dup cosine):
    * `nbits` deterministic hyperplanes → sign bits → bucket key; candidates
    * share a bucket, then exact-verify. Trades recall for pruning; recall is
    * measured against [[nearDupPairsExact]] in the test suite.
    */
  def nearDupPairsLsh(corpus: DataFrame, threshold: Double, nbits: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // deterministic hyperplane components in [-1, 1]
    val planes: Seq[Seq[Double]] = (0 until nbits).map(bi =>
      (0 until dim).map(d => (mix(bi.toLong * 131 + d).toDouble / Long.MaxValue)))
    val vd = col(vecCol).cast("array<double>")
    val bucket = concat((0 until nbits).map { bi =>
      val proj = aggregate(zip_with(vd, array(planes(bi).map(lit): _*), (x, p) => x * p),
        lit(0.0), (s, v) => s + v)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)
    val withB = corpus.select(col(idCol).as("id"), col(vecCol).as("v"), bucket.as("bucket"))
    withB.as("a").join(withB.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", cosine(col("a.v"), col("b.v")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }
}
