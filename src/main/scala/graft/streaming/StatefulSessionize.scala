package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the streaming face of
  * TimeSeries.sessionize, built on
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — per-user state
  * carries (last event time, session counter) across micro-batches, a
  * gap > `gapSec` starts a new session.
  *
  * Semantics note: events are sessionized in event-time order WITHIN
  * each micro-batch (sorted per group); cross-batch late data would
  * need a watermark + event-time timeout to fully match the batch
  * operator — documented limitation, fine for in-order sources like
  * the candump file stream.
  */
object StatefulSessionize {

  final case class Event(user_id: Long, event_id: Long, tsMicros: Long)
  final case class SessionState(lastTs: Long, sessionId: Long)
  final case class Sessionized(user_id: Long, event_id: Long, session_id: Long)

  def sessionize(events: Dataset[Event], gapSec: Long): Dataset[Sessionized] = {
    import events.sparkSession.implicits._
    val gapUs = gapSec * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Sessionized](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
          val out = sorted.map { e =>
            val isNew = st.sessionId == 0L || e.tsMicros - st.lastTs > gapUs
            st = SessionState(e.tsMicros,
              if (isNew) st.sessionId + 1 else st.sessionId)
            Sessionized(user, e.event_id, st.sessionId)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Adapt a decoded/event DataFrame (user_id, event_id, ts) to the
    * typed stream. */
  def fromDF(df: DataFrame): Dataset[Event] = {
    import df.sparkSession.implicits._
    df.selectExpr("user_id", "event_id", "unix_micros(ts) as tsMicros")
      .as[Event]
  }
}
