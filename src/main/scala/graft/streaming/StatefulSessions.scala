package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for stateful sessionization. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Open-session state carried between micro-batches. */
case class OpenSession(sessionId: Long, startTs: Long, lastTs: Long,
    nEvents: Long, sumValue: Double)

/** A closed session emitted downstream. */
case class ClosedSession(user_id: Long, session_id: Long, n_events: Long,
    session_start: Long, session_value: Double)

/** §2.10 extension: custom streaming state via
  * `flatMapGroupsWithState` — the stateful counterpart of
  * [[EventStream.sessionize]]'s batch window formulation. Each user's open
  * session lives in the state store; a session closes (and is emitted) when
  * an event arrives more than `gapMinutes` after the previous one. State is
  * per-key and partitioned by `user_id` — at 100 TB the state store scales
  * horizontally with executors, and per-batch work is proportional to
  * arriving events, not history. */
object StatefulSessions {
  val GapSeconds: Long = 30 * 60

  def sessionize(events: Dataset[SessionEvent],
      gapSeconds: Long = GapSeconds): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) => {
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var open = state.getOption
          val closed = Seq.newBuilder[ClosedSession]
          sorted.foreach { e =>
            val sec = e.ts.getTime / 1000
            open match {
              case Some(s) if sec - s.lastTs <= gapSeconds =>
                open = Some(s.copy(lastTs = sec, nEvents = s.nEvents + 1,
                  sumValue = s.sumValue + e.value))
              case Some(s) =>
                closed += ClosedSession(uid, s.sessionId, s.nEvents, s.startTs, s.sumValue)
                open = Some(OpenSession(s.sessionId + 1, sec, sec, 1, e.value))
              case None =>
                open = Some(OpenSession(1, sec, sec, 1, e.value))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
        })
  }
}
