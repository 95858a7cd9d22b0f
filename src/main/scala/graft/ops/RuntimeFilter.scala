package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.GraftFunctions

/** Explicit runtime join filtering — the bloom-prefiltered semi-join.
  *
  * The 100 TB problem: a semi/inner join's big side shuffles ENTIRELY,
  * even when only a sliver of it has a partner — the dominant cost of
  * decontaminating a corpus against a benchmark id set, or loading a
  * delta against a key watermark. Catalyst's InjectRuntimeFilter attacks
  * this automatically but only for shuffle-join patterns that pass its
  * creation-side thresholds; this operator is the same idea as an
  * explicit, guaranteed step:
  *
  *  1. build a [[BloomFilter]] over the small side's keys (distributed
  *     aggregate; only the ~MB sketch reaches the driver — an
  *     index-build action, same contract as the ANN codebook collects);
  *  2. probe it per big-side row inside whole-stage codegen
  *     ([[graft.functions.BloomMightContain]]) BEFORE the shuffle — at
  *     false-positive rate p and match selectivity s, shuffle volume
  *     drops to (s + p·(1−s)) of the table;
  *  3. finish with the exact semi-join over the survivors — bloom
  *     filters have NO false negatives, so the result is row-for-row
  *     the plain semi-join (spec-pinned), and the join also evicts the
  *     false positives.
  */
object RuntimeFilter {

  /** Serialize a filter for embedding as a plan literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Build the small side's key filter: a distributed sketch aggregate
    * (`DataFrameStatFunctions.bloomFilter`). The bit budget comes from
    * `expectedItems` at `fpp` (~1.2 MB per million keys at 1%);
    * undersizing degrades fpp — never correctness, but a 5×-undersized
    * sketch can quietly keep most of the big side and turn the operator
    * into pure overhead. Default: COUNT the small side first — one
    * cheap job over the side that is small by contract — so the sketch
    * is sized to the data, not to a guess. */
  def bloomFor(small: DataFrame, key: String,
               expectedItems: Option[Long] = None,
               fpp: Double = 0.01): Array[Byte] = {
    val n = expectedItems.getOrElse(math.max(small.count(), 64L))
    serialize(small.stat.bloomFilter(key, n, fpp))
  }

  /** The codegen'd probe column over pre-built filter bytes. */
  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    GraftFunctions.mightContainBloom(key, filterBytes)

  /** Bloom-prefiltered LEFT SEMI join: exactly
    * `big.join(small, bigKey === smallKey, "left_semi")`, with the big
    * side cut down by the sketch before it shuffles. Null big-side keys
    * never match (semi-join semantics; the probe is null-rejecting). */
  def semiJoinWithBloom(big: DataFrame, small: DataFrame,
                        bigKey: String, smallKey: String,
                        expectedItems: Option[Long] = None,
                        fpp: Double = 0.01): DataFrame = {
    val bytes = bloomFor(small, smallKey, expectedItems, fpp)
    big.filter(mightContain(col(bigKey), bytes))
      .join(small, col(bigKey) === small(smallKey), "left_semi")
  }
}
