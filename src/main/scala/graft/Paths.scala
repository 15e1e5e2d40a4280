package graft

/** Scratch-space root shared by the zarr queries and streaming staging.
  * Resolved absolute once per JVM (so behavior does not drift if a task
  * later changes CWD) but derived from the launch directory rather than
  * a hardcoded checkout location; overridable for deployments whose
  * scratch space lives elsewhere. */
object GraftPaths {
  lazy val tmpRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_TMP",
      new java.io.File(sys.props("user.dir"), "target/tmp").getAbsolutePath)
}
