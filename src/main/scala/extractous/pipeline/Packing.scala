package extractous.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: concatenate the corpus in id order and chunk
  * it into fixed-length training sequences (the GPT-style "pack then split
  * at seqLen boundaries" layout — Brown et al. 2020 §2.3 describe packing
  * documents into 2048-token contexts; documents may straddle a boundary).
  * For each document this emits where its tokens land:
  * `(id, n_tokens, seq_id_first, seq_off_first, seq_id_last)`.
  *
  * The underlying primitive is a GLOBAL prefix sum of token counts in id
  * order. The textbook formulation — `sum(n) over (order by id)` — is a
  * single-partition Window: at 10¹² rows one task would stream the whole
  * corpus. This implements the classic two-level scan instead:
  *
  *  1. split the id domain into `blocks` contiguous ranges by a CLOSED-FORM
  *     rule (block = id ⌞/⌟ ⌈(maxId+1)/blocks⌉ — no sampling, so the
  *     assignment is deterministic and identical across re-executions,
  *     unlike `repartitionByRange`'s sampled bounds);
  *  2. per-block running sums via a Window PARTITIONED by block (parallel,
  *     one hash exchange);
  *  3. per-block totals via ONE metadata-sized aggregation (`blocks` rows),
  *     prefix-summed on the driver and broadcast-joined back.
  *
  * Only `blocks` rows ever reach the driver; the corpus crosses exactly one
  * exchange. Skew note: blocks are uniform over the id RANGE, so the plan
  * assumes ids are roughly uniformly dense (true for sequential ingest
  * ids); for adversarially sparse ids raise `blocks` — correctness is
  * unaffected, only balance.
  *
  * All arithmetic is exact integers (token counts, truncating division on
  * non-negative cumulative sums), so the DuckDB oracle — deliberately the
  * textbook single-window formulation — replays it bit-identically.
  */
object Packing {

  /** Pack `df` into `seqLen`-token sequences in `idCol` order. A document
    * with zero tokens occupies no positions: its `seq_id_first`/`seq_off_first`
    * mark where it would start and `seq_id_last` = `seq_id_first`.
    *
    * `blocks = 0` (the default) AUTO-SCALES the block count to
    * `max(32, 4 × input partitions)`: a fixed default (the round-4 value was
    * a constant 32) caps the per-block Window sort at N/32 rows in ONE task —
    * at 10¹² documents that is ~3×10¹⁰ rows per window partition, a
    * scale-killer for any caller who takes the default. Deriving from the
    * scan's own partition count keeps each window partition at ~¼ of an input
    * split regardless of corpus size, while the driver prefix scan stays
    * metadata-sized (`blocks` longs). Blocks don't affect results — only
    * balance — so the oracle is unchanged.
    */
  def pack(df: DataFrame, idCol: String, textCol: String, seqLen: Int,
      blocks: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(blocks >= 0, "blocks must be non-negative (0 = auto)")
    val blockCount = if (blocks > 0) blocks else math.max(32, 4 * df.rdd.getNumPartitions)
    packWithBlocks(df, idCol, textCol, seqLen, blockCount)
  }

  private def packWithBlocks(df: DataFrame, idCol: String, textCol: String, seqLen: Int,
      blocks: Int): DataFrame = {
    // internal fixed name: expr() below must not re-parse a caller-supplied
    // column name (spaces, dots, reserved words would mis-resolve)
    val counted = df.select(col(idCol).as("_id"),
      TextStats.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val maxRow = counted.agg(max(col("_id"))).head
    val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val blockSize = math.max(1L, (maxId + blocks.toLong) / blocks.toLong) // ceil((maxId+1)/blocks)
    val withBlock = counted.withColumn("_blk", expr(s"_id div $blockSize"))
    // per-block totals → driver prefix scan (≤ `blocks` rows)
    val totals = withBlock.groupBy(col("_blk")).agg(sum(col("n_tokens")).as("_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = (b, acc); acc += t; o }
    val offDf = df.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("_blk", "_off")
    // per-block running sum, exclusive of the current row
    val w = Window.partitionBy(col("_blk")).orderBy(col("_id"))
    withBlock
      .withColumn("_local", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .join(broadcast(offDf), "_blk")
      .withColumn("_cum", col("_off") + col("_local"))
      .select(col("_id").as(idCol), col("n_tokens"),
        expr(s"_cum div $seqLen").as("seq_id_first"),
        (col("_cum") % seqLen).as("seq_off_first"),
        expr(s"(_cum + greatest(n_tokens, 1) - 1) div $seqLen").as("seq_id_last"))
  }
}
