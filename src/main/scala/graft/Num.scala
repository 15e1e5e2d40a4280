package graft

/** Numeric rules shared by every model-producing op (PCA, IVF, PQ). */
object Num {
  /** The determinism grid: 6dp HALF_UP — exactly where Spark's
    * `round(x, 6)` lands — with +0.0 collapsing IEEE −0.0. Model
    * parameters rounded here are bit-stable across engines, partition
    * orders, and driver/executor computation sites; keeping ONE
    * definition means PCA and IVF/PQ models can never drift onto
    * different grids. */
  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
}
