package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators over `KeyValueGroupedDataset` — the
  * record-at-a-time generalization of the reference's event-log → entity
  * state pattern (`1_ods_core/00_subscription.sql:62-92` runs it as a
  * daily batch; here the same state is maintained continuously with
  * `mapGroupsWithState`).
  *
  * State size is O(keys), partitioned by the grouping key — the same
  * shuffle contract as the batch `pivotEvents`, so the operator scales the
  * way the batch path does.
  */
object Stateful {

  /** Per-entity running state derived from an event log. */
  final case class EntityEvent(
      entityId: Long,
      eventType: String,
      ts: java.sql.Timestamp,
      value: Double)

  final case class EntityState(
      entityId: Long,
      nEvents: Long,
      lastEventType: String,
      lastTs: java.sql.Timestamp,
      totalValue: Double)

  implicit val eventEnc: Encoder[EntityEvent] = Encoders.product[EntityEvent]
  implicit val stateEnc: Encoder[EntityState] = Encoders.product[EntityState]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Fold events into per-entity running state. Works identically on a
    * streaming Dataset (continuous state via mapGroupsWithState) and a
    * batch Dataset (one-shot fold) — the same API contract Spark gives
    * `KeyValueGroupedDataset`.
    */
  def entityState(events: Dataset[EntityEvent]): Dataset[EntityState] =
    events
      .groupByKey(_.entityId)
      .mapGroupsWithState[EntityState, EntityState](GroupStateTimeout.NoTimeout) {
        (id: Long, batch: Iterator[EntityEvent], state: GroupState[EntityState]) =>
          val prev = state.getOption.getOrElse(
            EntityState(id, 0L, "", new java.sql.Timestamp(Long.MinValue / 2), 0.0))
          // fold deterministically in event-time order within the batch
          val next = batch.toSeq.sortBy(e => (e.ts.getTime, e.eventType)).foldLeft(prev) {
            (s, e) =>
              EntityState(
                id,
                s.nEvents + 1,
                e.eventType,
                if (e.ts.after(s.lastTs)) e.ts else s.lastTs,
                s.totalValue + e.value)
          }
          state.update(next)
          next
      }

  /** Streaming query wiring for [[entityState]] (update-mode sink). */
  def entityStateQuery(
      events: Dataset[EntityEvent],
      checkpointDir: String,
      queryName: String): org.apache.spark.sql.streaming.DataStreamWriter[EntityState] =
    entityState(events).writeStream
      .outputMode(OutputMode.Update())
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .format("memory")
}
