package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column faces over Spark's own runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair
  * Catalyst's InjectRuntimeFilter plants for row-level join
  * filtering). Spark registers neither under a public SQL name, so a
  * library that wants an EXPLICIT bloom semi-join prefilter — build a
  * filter over the small side's keys once, screen the 100 TB side
  * with a codegen'd bitset probe, confirm survivors with the exact
  * join — has to construct the expressions directly. Both sides must
  * feed the SAME long key (here: a 64-bit content hash — the
  * aggregate puts longs, the probe tests longs).
  */
object BloomFunctions {

  /** Aggregate: a serialized bloom filter (binary) over a LONG key
    * column. `expectedItems` sizes the hash count, `numBits` the
    * bitset — fpp ≈ (1 - e^(-kn/m))^k with k chosen from m/n. State
    * is `numBits/8` bytes regardless of input size: a dial, not a
    * function of the corpus. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(key),
        ColumnBridge.expression(org.apache.spark.sql.functions.lit(expectedItems)),
        ColumnBridge.expression(org.apache.spark.sql.functions.lit(numBits))
      ).toAggregateExpression())

  /** Probe: true iff `key` (long) might be in the serialized filter.
    * NEVER false for a key the aggregate saw (no false negatives);
    * true for an absent key with probability ≈ fpp. */
  def mightContain(bloom: Column, key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(key)))
}
