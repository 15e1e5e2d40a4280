package org.apache.spark

/** Private-API bridge (same documented pattern as GraftSqlBridge for
  * org.apache.spark.sql): `TaskContext.setTaskContext` is private[spark],
  * but a helper thread that consumes a partition iterator on behalf of a
  * task MUST carry that task's context — upstream operator code under the
  * iterator may acquire execution memory or update metrics through it.
  * Spark's own PythonRunner writer thread does exactly this. */
object GraftSparkBridge {
  def setTaskContext(tc: TaskContext): Unit = TaskContext.setTaskContext(tc)
}
