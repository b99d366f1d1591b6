package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/**
 * Ordered per-group state machines — the engine's home for the
 * reference's genuinely sequential logic (SURVEY §2.9): the
 * base-runner state machine (reference
 * `processors/pbp_parser/columns.py:332-529`) and the pitcher queue
 * (`processors/names/names.py:40-97`), and generically any
 * "fold rows in event order, carrying state" computation.
 *
 * Two execution shapes, both cluster-safe:
 *
 *  1. [[flatMapGroupsSorted]] — `groupByKey` + in-memory sort of ONE
 *     group. Right when a single group (a game, a user's day) is
 *     bounded; 100 TB of games is fine because no executor ever holds
 *     more than one game.
 *  2. [[foldPartitions]] — `repartition(key).sortWithinPartitions
 *     (key, order)` + streaming `mapPartitions` that resets state on
 *     key change. Never materializes a group at all, so it also
 *     survives pathological groups; this is the shape to prefer for
 *     skew-prone keys.
 */
object StatefulFold {

  /** Shape 1: sort each group in memory, then fold it. */
  def flatMapGroupsSorted[I: Encoder: scala.reflect.ClassTag, K: Encoder, O: Encoder, B: Ordering](
      ds: Dataset[I])(key: I => K, order: I => B)(
      fold: (K, Iterator[I]) => Iterator[O]): Dataset[O] =
    ds.groupByKey(key).flatMapGroups { (k: K, it: Iterator[I]) =>
      fold(k, it.toArray.sortBy(order).iterator)
    }

  /**
   * Shape 2: streaming fold over sorted partitions. `step` receives
   * the running state (fresh from `init` whenever the key columns
   * change) and emits zero or more output rows per input row.
   */
  def foldPartitions[S](
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      outSchema: StructType,
      alreadyPartitioned: Boolean = false)(
      init: Row => S,
      step: (S, Row) => (S, Iterator[Row])): DataFrame = {

    val keyIdx = keyCols.map(df.schema.fieldIndex)
    // `alreadyPartitioned = true` skips the shuffle: the CALLER asserts
    // every row of a key group is already in one partition (e.g. the
    // pbp chain, where an upstream window exchange hash-partitioned on
    // the same key and nothing reshuffled since). The local sort still
    // runs — only the exchange of the full-width rows is saved.
    val clustered =
      if (alreadyPartitioned) df else df.repartition(keyCols.map(col): _*)
    val sorted = clustered
      .sortWithinPartitions(keyCols.map(col) ++ orderCols: _*)

    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val keyIdxArr = keyIdx.toArray
    sorted.mapPartitions { rows =>
      // per-row key compare without a Seq allocation (hot path: the
      // fold runs per play; boxing the key tuple per row showed up in
      // the sf0.1 profile)
      var currentKey: Array[Any] = null
      var state: S = null.asInstanceOf[S]
      rows.flatMap { row =>
        var changed = currentKey == null
        if (!changed) {
          var i = 0
          while (i < keyIdxArr.length && !changed) {
            if (row.get(keyIdxArr(i)) != currentKey(i)) changed = true
            i += 1
          }
        }
        if (changed) {
          val k = new Array[Any](keyIdxArr.length)
          var i = 0
          while (i < keyIdxArr.length) { k(i) = row.get(keyIdxArr(i)); i += 1 }
          currentKey = k
          state = init(row)
        }
        val (s2, out) = step(state, row)
        state = s2
        out
      }
    }
  }
}
