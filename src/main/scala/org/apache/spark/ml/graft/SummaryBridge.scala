package org.apache.spark.ml.graft

import org.apache.spark.ml.util.HasTrainingSummary

/** Drops the training summary a just-fit Spark-ML model carries.
  *
  * `HasTrainingSummary.setSummary` is `private[ml]`, hence this
  * one-line bridge living inside the `org.apache.spark.ml` namespace
  * (the [[org.apache.spark.sql.graft.ColumnBridge]] pattern). No
  * Spark internals are modified.
  *
  * Why it exists: the summary holds the fitting frame AND its
  * SparkSession, and `model.transform`'s scoring UDF closes over the
  * model — so every scored partition serializes the whole chain into
  * its task closure. That is wasted closure bytes at best, and a hard
  * `NotSerializableException` as soon as anything in the session has
  * touched `Dataset.observe` (the session's lazy `ObservationManager`
  * initializes and is not serializable — java-serializing that
  * SparkSession fails from then on). A keep/drop scoring pass over
  * 100 TB must ship the weight vector, not a session. Callers that
  * need training diagnostics read them BEFORE dropping. */
object SummaryBridge {
  def dropSummary[M <: HasTrainingSummary[_]](m: M): M = {
    m.setSummary(None)
    m
  }
}
