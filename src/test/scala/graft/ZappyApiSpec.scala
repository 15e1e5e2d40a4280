package graft

import org.scalatest.funsuite.AnyFunSuite

/** The zappy-named facade (graft.api.Zappy): every reference entry point
  * resolves and composes — the mechanical-port seam a zappy user crosses. */
class ZappyApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("from_ndarray → ufunc → to_zarr → from_zarr → asndarray roundtrip") {
    import graft.api.Zappy
    val dense = Array.tabulate(6, 4)((i, j) => (i * 4 + j).toDouble)
    val m = Zappy.from_ndarray(spark, dense)
    val store = "/root/repo/target/tmp/zappy_api_roundtrip"
    graft.zarr.Zarr.delete(store, recursive = true)
    Zappy.to_zarr(m.log1p_, store, 6, 4, 3, 2)
    val back = Zappy.asndarray(Zappy.from_zarr(spark, store), 6, 4)
    for (i <- 0 until 6; j <- 0 until 4)
      assert(math.abs(back(i)(j) - math.log1p(dense(i)(j))) < 1e-12)
  }

  test("zeros/ones constructors carry the zappy shape semantics") {
    import graft.api.Zappy
    val z = Zappy.asndarray(Zappy.zeros(spark, 3, 3), 3, 3)
    val o = Zappy.asndarray(Zappy.ones(spark, 3, 3), 3, 3)
    assert(z.flatten.forall(_ == 0.0) && o.flatten.forall(_ == 1.0))
  }

  test("group-member open: from_zarr(store, key) reads an anndata layout") {
    import graft.api.Zappy
    val store = "/root/repo/target/tmp/zappy_api_group"
    graft.zarr.Zarr.delete(store, recursive = true)
    val m = Zappy.from_ndarray(spark, Array.tabulate(4, 2)((i, j) => (i + j).toDouble))
    Zappy.to_zarr(m, s"$store#X", 4, 2, 2, 2)
    val back = Zappy.asndarray(Zappy.from_zarr(spark, store, "X"), 4, 2)
    assert(back(3)(1) == 4.0)
  }
}
