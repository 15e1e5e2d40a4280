package graft.array

/** Driver-side agglomerative average linkage (UPGMA) over a
  * parameter-sized distance matrix — the scipy.cluster.hierarchy half of
  * scanpy `sc.tl.dendrogram`. scanpy feeds linkage `1 − corr` of the
  * per-group pseudobulk profiles; the distributed half (the correlation
  * matrix itself) is `arr_group_corr` / [[ZMatrix.corrCols]], and THIS
  * runs on its collected output: the matrix is groups², a model-sized
  * parameter, never data-sized — the same driver/cluster split as
  * [[Pca]] (fit parameters driver-side, data passes distributed).
  *
  * Leaves are 0..n−1; merge k creates cluster id n+k (scipy's linkage
  * contract). Each merge row is (a, b, dist, size) with a < b and
  * deterministic tie-breaking: the smallest distance wins, ties → the
  * lexicographically smallest (a, b). Cluster–cluster distance is the
  * unweighted leaf-pair average: d(A∪B, C) = (|A|·d(A,C) + |B|·d(B,C))
  * / (|A|+|B|).
  */
object Linkage {

  final case class Merge(a: Int, b: Int, dist: Double, size: Int)

  def average(n: Int, dist: Map[(Int, Int), Double]): Seq[Merge] = {
    require(n >= 1, "need at least one leaf")
    val d = scala.collection.mutable.Map.empty[(Int, Int), Double]
    def key(a: Int, b: Int) = (math.min(a, b), math.max(a, b))
    for (a <- 0 until n; b <- a + 1 until n)
      d(key(a, b)) = dist.getOrElse((a, b), dist.getOrElse((b, a),
        throw new IllegalArgumentException(s"missing distance for pair ($a,$b)")))
    val size = scala.collection.mutable.Map((0 until n).map(i => i -> 1): _*)
    var active = (0 until n).toSet
    val merges = Seq.newBuilder[Merge]
    var next = n
    while (active.size > 1) {
      val (a, b) = active.toSeq.sorted
        .combinations(2).map { case Seq(x, y) => (x, y) }
        .minBy { case (x, y) => (d(key(x, y)), x, y) }
      val md = d(key(a, b))
      val sz = size(a) + size(b)
      merges += Merge(a, b, md, sz)
      active -= a; active -= b
      active.foreach { c =>
        d(key(next, c)) =
          (size(a) * d(key(a, c)) + size(b) * d(key(b, c))) / sz
      }
      size(next) = sz
      active += next
      next += 1
    }
    merges.result()
  }
}
