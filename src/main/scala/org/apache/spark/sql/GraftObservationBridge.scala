package org.apache.spark.sql

/** Bridge to [[Observation.getOrEmpty]] (`private[sql]`): a short timed
  * wait that returns empty when the metrics haven't arrived yet,
  * instead of [[Observation.get]]'s unbounded park. graft.llm.Pipeline
  * polls it against a deadline, so a lost listener-bus event costs a
  * bounded wait on the calling thread — no sacrificial blocked thread,
  * no permanent hang. */
object GraftObservationBridge {
  def getOrEmpty(o: Observation): Map[String, Any] = o.getOrEmpty
}
